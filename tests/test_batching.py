"""Aspect-ratio bucketing + deterministic batch assembly
(`operators/batching.py`): integer-exact bucket choice vs a python
oracle, full-batch invariants, parallelism invariance, and the
ladder-sized (never per-batch) cutoff join shape.
"""

import collections

import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.batching import (
    DEFAULT_LADDER,
    aspect_buckets,
    bucket_batches,
)


def py_bucket(w: int, h: int, ladder=DEFAULT_LADDER) -> int:
    d = [abs(w * bh - h * bw) for bw, bh in ladder]
    return d.index(min(d))


ROWS = [
    (f"i{k:04d}", w, h)
    for k, (w, h) in enumerate(
        [
            (100, 100), (99, 100), (101, 100),   # square-ish
            (400, 300), (403, 300),              # 4:3
            (300, 400),                          # 3:4
            (160, 90), (1920, 1080),             # 16:9
            (90, 160),
            (210, 100), (100, 210),              # ~2:1 / 1:2
            (7, 5),                              # between 4:3 and 3:2
            (1, 1000), (1000, 1),                # extreme
        ]
        * 5
    )
]


@pytest.fixture(scope="module")
def dims_df(spark):
    return spark.createDataFrame(ROWS, "image_id string, w int, h int")


def test_bucket_assignment_matches_python_oracle(spark, dims_df):
    got = {
        r["image_id"]: (r["bucket"], r["bucket_w"], r["bucket_h"])
        for r in aspect_buckets(dims_df).collect()
    }
    for iid, w, h in ROWS:
        b = py_bucket(w, h)
        assert got[iid] == (b, *DEFAULT_LADDER[b]), (iid, w, h)
    # ties break to the LOWEST ladder index: 100x100 fits (1,1) exactly
    assert got["i0000"][0] == 0


def test_bucket_batches_oracle_and_invariants(spark, dims_df):
    bs = 4
    got = sorted(
        (r["image_id"], r["bucket"], r["batch_id"], r["slot"])
        for r in bucket_batches(dims_df, batch_size=bs).collect()
    )
    byb = collections.defaultdict(list)
    for iid, w, h in ROWS:
        byb[py_bucket(w, h)].append(iid)
    want = []
    for bk, ids in byb.items():
        ids.sort()
        for i, iid in enumerate(ids[: len(ids) // bs * bs]):
            want.append((iid, bk, bk * (1 << 40) + i // bs, i % bs))
    assert got == sorted(want)
    # every emitted batch is exactly full, slots 0..bs-1 once each
    per_batch = collections.defaultdict(list)
    for _iid, _bk, bid, slot in got:
        per_batch[bid].append(slot)
    assert all(sorted(s) == list(range(bs)) for s in per_batch.values())
    # keep_partial=True covers every input row exactly once
    assert bucket_batches(dims_df, bs, keep_partial=True).count() == len(ROWS)


def test_bucket_batches_parallelism_invariance(spark, dims_df):
    a = sorted(map(tuple, bucket_batches(dims_df, 3).collect()))
    b = sorted(map(tuple, bucket_batches(dims_df.repartition(17), 3).collect()))
    assert a == b and a


def test_cutoff_join_broadcasts(spark, dims_df):
    """The full-batch cutoff must join a LADDER-sized side (broadcast),
    never a per-batch-id table — the difference between O(1) and
    O(n/batch) broadcast payload at corpus scale."""
    plan = bucket_batches(dims_df, 4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_synth_images_bucket_cleanly(spark, images_df):
    """Real synth corpus: every image lands in exactly one bucket and
    full batches slice it without loss beyond the per-bucket tail."""
    bs = 8
    full = bucket_batches(images_df.select("image_id", "w", "h"), bs)
    tail = (
        aspect_buckets(images_df.select("image_id", "w", "h"))
        .groupBy("bucket")
        .agg((F.count(F.lit(1)) % bs).alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert full.count() == images_df.count() - tail
