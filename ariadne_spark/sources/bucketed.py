"""Bucketed parquet tables: shuffle-free co-located joins + bucket pruning.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
BOTH sides. Spark's table bucketing removes it: write each side hash-
partitioned (Murmur3 pmod n_buckets — the same function `repartition`
uses) and sorted within buckets, and `EnsureRequirements` recognizes the
bucket spec as a satisfied `HashPartitioning`, planning a SortMergeJoin
with ZERO Exchange on either side; with one file per bucket the within-
bucket sort order is trusted too, so the per-bucket Sort disappears as
well. A point filter on the bucket key prunes the scan to a single
bucket (`SelectedBucketsCount: 1 out of n`) without any partition
columns. This is the persisted-index analog of ariadne's
`DefinitionRegistry` hash index (`packages/core/src/registries/
definition.ts:26` — symbols pre-bucketed by file so re-resolution never
rescans the project): maintain the layout once at write time, and every
later join/lookup is local.

Catalog note: bucket metadata lives in the session catalog. This
sandbox uses Spark's in-memory catalog, so the spec survives for the
session; a production deployment backs the same `saveAsTable` call with
a persistent metastore (HMS / Iceberg bucket transform) — the write and
read paths here are unchanged by that swap.

Sizing at scale: pick n_buckets so one bucket of the LARGER table fits
an executor core's working set (~n_rows * row_bytes / 256 MB), and use
the same n_buckets for every table that joins on the key — equal bucket
counts are required for the shuffle-free plan (Spark joins n-bucket to
n-bucket; mismatched counts shuffle the smaller side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    n_buckets: int,
    key: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as an external parquet table bucketed+sorted by key.

    The pre-write `repartition(n_buckets, key)` uses the identical hash
    as the bucket spec, so every bucket's rows land in exactly one task
    => ONE file per bucket => readers trust the sort order and plan
    sort-free merge joins. Without it, k writer tasks produce up to k
    files per bucket and Spark re-sorts at read time.
    """
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or [key]))
        .option("path", path)
        .saveAsTable(name)
    )


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    The 'merge' hint pins SortMergeJoin (on 100 TB fact-fact joins the
    planner picks it anyway; at test-fixture size it would broadcast,
    hiding the property under test). With both sides bucketed on `on`
    the plan carries no Exchange — verified by
    tests/test_bucketed.py::test_colocated_join_has_no_exchange.
    """
    left = spark.table(left_name)
    right = spark.table(right_name)
    return left.hint("merge").join(right, on, how)
