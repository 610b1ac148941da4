"""Approximate nearest neighbors over embeddings — LSH-bucketed cosine.

Brute-force cosine top-k (driver contract `q21_embedding_topk`) is the
exactness baseline; it is O(n^2) and only viable per-partition. This is
the scale path: random-hyperplane LSH (Charikar's SimHash for cosine
similarity) — each of `n_tables` hash tables maps a vector to a bucket
by the sign pattern of `n_planes` random projections; candidates are
pairs sharing a bucket in ANY table; exact cosine re-ranks.

Physical plan mirrors the phash kNN operator (`operators/knn.py`):
bucket ids computed in ONE Arrow-batched pandas UDF (matrix multiply
per batch — no per-row Python), explode by table, sort-merge self-join
on (table, bucket), first-match-table dedup (zero extra shuffles),
exact-score filter, deterministic top-k window. Collision probability
for vectors at angle theta: 1 - (1 - (1-theta/pi)^n_planes)^n_tables.

Reference analog: the multi-candidate call resolution with confidence
grades (`packages/core/src/resolve_references/call_resolver.ts:391-463`)
— here "confidence" is the exact cosine score re-ranking the
LSH-generated candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

SEED = 1729


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = SEED) -> np.ndarray:
    """(n_tables, n_planes, dim) deterministic Gaussian hyperplanes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _bucket_udf(planes: np.ndarray):
    n_tables, n_planes, dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, dim)
    powers = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        proj = mat @ flat.T  # (batch, n_tables*n_planes)
        bits = (proj > 0).reshape(len(mat), n_tables, n_planes)
        ids = (bits * powers).sum(axis=2)  # (batch, n_tables)
        return pd.Series(list(ids))

    return buckets


def ann_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
    seed: int = SEED,
) -> DataFrame:
    """-> (src, dst, dot_q, rank): approximate top-k cosine neighbors.

    Scores are the SAME quantized integer dot product as the exact
    baseline (`q21`): round(x*1000) per component, summed as int64 —
    deterministic and engine-independent, so ANN results are directly
    comparable (recall = overlap of (src,dst) sets).
    """
    if dim is None:
        dim = len(embeddings.select("embedding").first()["embedding"])
    planes = hyperplanes(dim, n_planes, n_tables, seed)
    buckets = _bucket_udf(planes)

    qv = F.transform(F.col("embedding"), lambda x: F.round(x * 1000).cast("long"))
    # candidate generation ships ONLY (vec_id, table_id, bucket) through
    # the bucket self-join — the full int64 vectors (dim×8 B each) are
    # joined back AFTER pair dedup, cutting candidate-shuffle bytes by
    # ~2·dim·8 per pair
    bucketed = embeddings.select(
        F.col("vec_id"),
        F.posexplode(buckets(F.col("embedding"))).alias("table_id", "bucket"),
    )
    a = bucketed.select(F.col("vec_id").alias("src"), "table_id", "bucket")
    b = bucketed.select(F.col("vec_id").alias("dst"), "table_id", "bucket")

    # dedup pairs colliding in multiple tables via min(table_id) — a
    # groupBy on the pair key with map-side partial agg (deterministic;
    # the table id itself is then dropped). Candidate sets are LSH-small,
    # so this shuffle is bounded by collisions, not n^2.
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("table_id").alias("first_table"))
        .drop("first_table")
    )

    vecs = embeddings.select("vec_id", qv.alias("q"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    ranked = (
        cand.join(
            vecs.select(F.col("vec_id").alias("src"), F.col("q").alias("qa")), "src"
        )
        .join(
            vecs.select(F.col("vec_id").alias("dst"), F.col("q").alias("qb")), "dst"
        )
        .select("src", "dst", dot.alias("dot_q"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("dot_q"), F.col("dst"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def brute_force_topk(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """Exact baseline (same contract as driver query q21)."""
    qv = F.transform(F.col("embedding"), lambda x: F.round(x * 1000).cast("long"))
    base = embeddings.select("vec_id", qv.alias("q"))
    a = base.select(F.col("vec_id").alias("src"), F.col("q").alias("qa"))
    b = base.select(F.col("vec_id").alias("dst"), F.col("q").alias("qb"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = a.crossJoin(b).where(F.col("src") != F.col("dst")).select(
        "src", "dst", dot.alias("dot_q")
    )
    w = Window.partitionBy("src").orderBy(F.desc("dot_q"), F.col("dst"))
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
