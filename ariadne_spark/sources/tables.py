"""Parquet table loaders for the driver-provided testdata star schema.

The analog of ariadne's source discovery (`find_source_files`,
`packages/core/src/project/file_loading.ts:7-43`): the "filesystem
scan" is a parquet scan with Catalyst pushing filters/column pruning
into the reader — assert via .explain() that PushedFilters/ReadSchema
reflect the query, the Spark equivalent of extension filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
