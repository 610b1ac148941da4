"""Banded Jaccard near-dup: exactness vs the all-pairs form, first-match
dedup (no duplicate pairs), and subquadratic candidate volume — the
test discipline of tests/test_ann.py applied to the q18 scale path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.dedup import BANDS, _band_bits, jaccard_neardup_banded

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def masked(spark):
    import __spark_entry__ as entrymod

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.select(
        "doc_id", "lang", entrymod._letter_mask_col().alias("mask")
    ).persist()


def _all_pairs(masked):
    a = masked.select(F.col("doc_id").alias("a"), "lang", F.col("mask").alias("ma"))
    b = masked.select(F.col("doc_id").alias("b"), "lang", F.col("mask").alias("mb"))
    inter = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    union = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
    j1000 = F.floor((inter * F.lit(1000)) / union).cast("long")
    return (
        a.join(b, "lang")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", j1000.alias("j1000"))
        .where(F.col("j1000") >= 900)
    )


def test_banded_equals_all_pairs(spark, masked):
    got = sorted(map(tuple, jaccard_neardup_banded(masked).collect()))
    want = sorted(map(tuple, _all_pairs(masked).collect()))
    assert len(want) > 0
    assert got == want


def test_no_duplicate_pairs(spark, masked):
    rows = jaccard_neardup_banded(masked).collect()
    keys = [(r["a"], r["b"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_candidate_volume_is_subquadratic(spark, masked):
    """The exact-check stage runs over distinct-mask representative
    pairs, whose count is bounded by distinct masks (<= 2^26 per group,
    independent of document count) — it must be a small fraction of the
    per-doc all-pairs volume."""
    from ariadne_spark.operators.dedup import rep_candidate_pairs

    cand = rep_candidate_pairs(masked, "lang", "mask").count()
    per_lang = masked.groupBy("lang").count().collect()
    all_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in per_lang)
    assert cand < 0.1 * all_pairs, f"{cand} rep pairs vs {all_pairs} doc pairs"
    # and the candidate count is bounded by distinct-mask pair volume
    per_lang_masks = (
        masked.select("lang", "mask").distinct().groupBy("lang").count().collect()
    )
    rep_all = sum(r["count"] * (r["count"] - 1) // 2 for r in per_lang_masks)
    assert cand <= rep_all


def test_threshold_guard():
    """Thresholds that admit >2 differing bits must be rejected (3-band
    pigeonhole recall would no longer be exact)."""
    # a threshold of 800 admits floor(26*0.2)=5 differing bits
    with pytest.raises(AssertionError):
        jaccard_neardup_banded(None, threshold_milli=800)
