"""Bucketed tables: the co-location contract, pinned.

Three properties that only matter at scale, asserted on real plans:
(1) a bucketed-bucketed equi-join has ZERO Exchange (no shuffle of
either fact table), (2) a point filter on the bucket key scans one
bucket (`SelectedBucketsCount: 1 out of n`), (3) results are identical
to the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_spark.sources.bucketed import colocated_join, write_bucketed
from tests.test_plans import plan

SF_DIR = "/root/testdata/sf0.01"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders",
        str(d / "orders"),
        N_BUCKETS,
        "orderkey",
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem",
        str(d / "lineitem"),
        N_BUCKETS,
        "orderkey",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    l, r = bucketed_tables
    p = plan(colocated_join(spark, l, r, "orderkey"))
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join over raw parquet shuffles both sides —
    the bucketed layout is what removes the Exchange, not the data."""
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumnRenamed("o_orderkey", "orderkey")
    )
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("orderkey"), "l_quantity")
    )
    p = plan(o.hint("merge").join(li, "orderkey"))
    assert "Exchange" in p


def test_one_file_per_bucket_enables_sortfree_merge(spark, bucketed_tables):
    """The pre-write repartition aligns writer tasks to buckets, so each
    bucket is ONE file and readers trust the on-disk order (session conf
    spark.sql.legacy.bucketedTableScan.outputOrdering, session.py): no
    Sort node above either scan."""
    import re

    l, r = bucketed_tables
    p = plan(colocated_join(spark, l, r, "orderkey"))
    assert re.search(r"\(\d+\) Sort\b", p) is None, p


def test_bucket_pruning_on_point_filter(spark, bucketed_tables):
    """A point lookup on the bucket key reads 1/n of the files. The
    autoBucketedScan rule would turn the bucketed scan off for a plain
    filter (no downstream partitioning consumer), hiding the pruning —
    a point-lookup-heavy deployment pins it on, as here."""
    l, _ = bucketed_tables
    some_key = spark.table(l).agg(F.min("orderkey")).collect()[0][0]
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        p = plan(spark.table(l).where(F.col("orderkey") == some_key))
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in p, p


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    l, r = bucketed_tables
    got = (
        colocated_join(spark, l, r, "orderkey")
        .groupBy("orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        )
    )
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumnRenamed("o_orderkey", "orderkey")
    )
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("orderkey"), "l_quantity")
    )
    want = (
        o.join(li, "orderkey")
        .groupBy("orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
