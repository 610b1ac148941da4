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


def test_adaptive_split_clamps_driver_histogram(spark, images_df):
    """Requesting max_res beyond HIST_RES_CAP must NOT collect a
    4^max_res-sized histogram: the refinement floor clamps to the cap
    (the knn.py res>10 guard's analog), so max_res=12 produces exactly
    the same assignment as max_res=HIST_RES_CAP — and the collected
    histogram the driver saw is the bounded res-10 one."""
    from ariadne_spark.operators.skew import HIST_RES_CAP

    meta = images_df.drop("bytes")
    wild = {
        r["image_id"]: r["split_cell"]
        for r in adaptive_split(meta, BASE_RES, 12, THRESHOLD)
        .select("image_id", "split_cell")
        .collect()
    }
    capped = {
        r["image_id"]: r["split_cell"]
        for r in adaptive_split(meta, BASE_RES, HIST_RES_CAP, THRESHOLD)
        .select("image_id", "split_cell")
        .collect()
    }
    assert wild == capped
    # no key finer than the cap exists
    assert all(
        (v >> cells.RES_SHIFT) <= HIST_RES_CAP for v in wild.values()
    )
