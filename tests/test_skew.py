"""Skew tooling tests: histogram salt choice + adaptive resolution split
verified against a pure-numpy oracle on the deterministic fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadne_spark.functions import cells
from ariadne_spark.operators.skew import (
    adaptive_split,
    cell_histogram,
    choose_salt,
    split_histogram,
)

BASE_RES, MAX_RES, THRESHOLD = 3, 7, 200


def oracle_split(lon_u, lat_u, base_res, max_res, threshold):
    """Per-row expected split_cell, straight from the definition."""
    def enc(res):
        x = (lon_u.astype(np.int64) * (1 << res)) // cells.LON_SPAN
        y = (lat_u.astype(np.int64) * (1 << res)) // cells.LAT_SPAN
        return (np.int64(res) << cells.RES_SHIFT) | (x << cells.X_SHIFT) | y

    assigned = np.full(len(lon_u), -1, dtype=np.int64)
    alive = np.ones(len(lon_u), dtype=bool)
    for res in range(base_res, max_res):
        anc = enc(res)
        uniq, inv = np.unique(anc[alive], return_inverse=True)
        counts = np.bincount(inv)
        dense = set(uniq[counts > threshold].tolist())
        stop = alive & ~np.isin(anc, list(dense))
        assigned[stop] = anc[stop]
        alive &= ~stop
    assigned[alive] = enc(max_res)[alive]
    return assigned


def test_adaptive_split_matches_oracle(spark, images_df, images_np):
    got = {
        r["image_id"]: r["split_cell"]
        for r in adaptive_split(
            images_df.drop("bytes"), BASE_RES, MAX_RES, THRESHOLD
        )
        .select("image_id", "split_cell")
        .collect()
    }
    exp = oracle_split(
        images_np["lon_u"], images_np["lat_u"], BASE_RES, MAX_RES, THRESHOLD
    )
    for i, img_id in enumerate(images_np["image_id"]):
        assert got[img_id] == exp[i], img_id


def test_adaptive_split_rerun_overwrites_not_duplicates(spark, images_df):
    """Re-running adaptive_split on an already-split frame (re-tuning
    threshold) must REPLACE split_cell — withColumn semantics, like the
    base_res==max_res path — never append a second column of the same
    name (which would make any later F.col('split_cell') ambiguous)."""
    base = images_df.drop("bytes")
    once = adaptive_split(base, BASE_RES, MAX_RES, THRESHOLD)
    again = adaptive_split(once, BASE_RES, MAX_RES, THRESHOLD * 4)
    assert again.columns.count("split_cell") == 1
    fresh = adaptive_split(base, BASE_RES, MAX_RES, THRESHOLD * 4)
    got = sorted(
        (r["image_id"], r["split_cell"])
        for r in again.select("image_id", "split_cell").collect()
    )
    exp = sorted(
        (r["image_id"], r["split_cell"])
        for r in fresh.select("image_id", "split_cell").collect()
    )
    assert got == exp
    # degenerate path too (base_res == max_res projection)
    flat = adaptive_split(once, BASE_RES, BASE_RES, THRESHOLD)
    assert flat.columns.count("split_cell") == 1


def test_split_bounds_partition_sizes(spark, images_df):
    out = adaptive_split(images_df.drop("bytes"), BASE_RES, MAX_RES, THRESHOLD)
    hist = split_histogram(out).collect()
    for r in hist:
        # every non-floor key is bounded; floor cells may stay dense
        if r["res"] < MAX_RES:
            parent_was_dense = r["res"] > BASE_RES
            if not parent_was_dense:
                assert r["n"] <= max(THRESHOLD, 1) or r["res"] == BASE_RES
    # the hotspot fixture must actually trigger refinement
    assert any(r["res"] > BASE_RES for r in hist)
    # and sparse areas must stay coarse
    assert any(r["res"] == BASE_RES for r in hist)


def test_split_deterministic_across_partitionings(spark, images_df):
    a = adaptive_split(
        images_df.drop("bytes").repartition(3), BASE_RES, MAX_RES, THRESHOLD
    )
    b = adaptive_split(
        images_df.drop("bytes").repartition(17, "phash"), BASE_RES, MAX_RES, THRESHOLD
    )
    ha = sorted((r["split_cell"], r["n"]) for r in split_histogram(a).collect())
    hb = sorted((r["split_cell"], r["n"]) for r in split_histogram(b).collect())
    assert ha == hb


def test_choose_salt():
    assert choose_salt({}, 100) == 1
    assert choose_salt({1: 99}, 100) == 1
    assert choose_salt({1: 100, 2: 350}, 100) == 4
    assert choose_salt({1: 100_001}, 100_000) == 2


def test_cell_histogram_totals(spark, images_df):
    hist = cell_histogram(images_df.drop("bytes"), 4)
    assert sum(hist.values()) == images_df.count()
    # hotspot skew exists at res 4
    assert max(hist.values()) > 10 * (sum(hist.values()) / len(hist))


def test_salted_knn_equals_unsalted(spark, images_df):
    from ariadne_spark.operators.knn import knn_edges

    meta = images_df.drop("bytes")
    plain = {
        (r["src_image_id"], r["dst_image_id"], r["hamming"], r["rank"])
        for r in knn_edges(meta, k=3, max_hamming=16).collect()
    }
    hist = cell_histogram(meta, 5)
    salt = choose_salt(hist, target_rows=300)
    assert salt > 1  # fixture hotspots force a real salt factor
    salted = {
        (r["src_image_id"], r["dst_image_id"], r["hamming"], r["rank"])
        for r in knn_edges(meta, k=3, max_hamming=16, salt=salt).collect()
    }
    assert salted == plain
    auto = {
        (r["src_image_id"], r["dst_image_id"], r["hamming"], r["rank"])
        for r in knn_edges(meta, k=3, max_hamming=16, salt="auto", salt_target_rows=300).collect()
    }
    assert auto == plain


def test_adaptive_split_max_res_14_no_driver_dependency(spark, images_df, images_np):
    """The round-4 contract: the split decision is computed in-plan, so
    a max_res=14 request works with NO driver-size dependency (the
    round-3 version collected the floor histogram and clamped at res
    10). Assignment must match the per-row numpy oracle at the full
    requested depth, and keys finer than res 10 must actually appear
    when the fixture's hotspots stay dense that deep."""
    meta = images_df.drop("bytes")
    got = {
        r["image_id"]: r["split_cell"]
        for r in adaptive_split(meta, BASE_RES, 14, THRESHOLD)
        .select("image_id", "split_cell")
        .collect()
    }
    exp = oracle_split(
        images_np["lon_u"], images_np["lat_u"], BASE_RES, 14, THRESHOLD
    )
    for i, img_id in enumerate(images_np["image_id"]):
        assert got[img_id] == exp[i], img_id


def test_choose_salt_distributed_matches_dict_form(spark, images_df):
    """The in-plan salt decision (one scalar row to the driver) equals
    the dict-based twin over the collected histogram, at several
    resolutions and targets."""
    from ariadne_spark.operators.skew import choose_salt_distributed

    meta = images_df.drop("bytes")
    for res, target in ((4, 300), (5, 300), (5, 50), (6, 10_000)):
        hist = cell_histogram(meta, res)
        assert choose_salt_distributed(meta, res, target) == choose_salt(
            hist, target
        ), (res, target)


def test_adaptive_split_keeps_null_geo_rows(spark):
    """adaptive_split only ADDS a column: a row with NULL lon_u/lat_u
    must survive (NULL split_cell), not vanish through the mapping
    join."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [{"image_id": f"i{i}", "lon_u": i * 1000, "lat_u": i * 500}
            for i in range(50)]
    rows.append({"image_id": "null_geo", "lon_u": None, "lat_u": None})
    df = spark.createDataFrame(
        pd.DataFrame(rows), "image_id string, lon_u long, lat_u long"
    )
    out = adaptive_split(df, base_res=2, max_res=5, threshold=8)
    assert out.count() == 51
    ng = out.where(F.col("image_id") == "null_geo").collect()
    assert len(ng) == 1 and ng[0]["split_cell"] is None
