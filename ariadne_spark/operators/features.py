"""Feature hashing (Weinberger et al. 2009, "hashing trick"): turn raw
text into fixed-dim integer vectors with NO trained model — the
deterministic featurizer that makes the embedding-consuming operators
(SemDeDup, IVF/PQ ANN, exact cosine, alignment gates) self-contained
on corpora that arrive without precomputed embeddings.

Each whitespace token hashes to (bucket, sign) via the repo's shared
integer mix over the rolling string fingerprint (ASCII contract — see
`rolling_fp_col`); a document's vector is the signed token-count sum
per bucket. Everything is exact integer arithmetic, so vectors are
bit-identical across runs, partitionings, cluster sizes, AND engines:
the corpus-grain per-bucket sums are DuckDB-oracle-checked verbatim
(q38 kind='hashfeat' rows).

SCALE: one explode over tokens + two hash aggregations — linear in
total token count, no UDF, no shuffle wider than (doc, bucket). The
dense-vector assembly is map_from_entries over <= dim entries per doc
(order-independent), so a 10^12-doc corpus featurizes in one pass and
feeds the banded/bucketed similarity paths directly.

Reference analog: ariadne's identifier -> symbol-table feature
extraction that folds every occurrence into fixed per-symbol counters
(`packages/core/src/index_single_file/index_single_file.ts:98-120`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sketch import mix_col, mix_sql, rolling_fp_col, rolling_fp_sql


def _token_hash(token: Column) -> Column:
    """Shared token -> [0, 2^31) integer (mix over the rolling fp)."""
    return mix_col(rolling_fp_col(token))


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("token"),
    )


def hash_features(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc signed-count feature vector: (id_col, vec array<long>).
    vec[b] = sum over tokens hashing to bucket b of sign(token), where
    sign = ((h >> 1) & 1) * 2 - 1. Empty/whitespace-only docs yield the
    zero vector (left join keeps them)."""
    t = _tokens(docs, text_col, id_col)
    h = _token_hash(F.col("token"))
    per = (
        t.select(
            "__id",
            (h % F.lit(dim)).cast("int").alias("bucket"),
            ((F.shiftright(h, 1).bitwiseAND(F.lit(1))) * 2 - 1).alias("sign"),
        )
        .groupBy("__id", "bucket")
        .agg(F.sum("sign").cast("long").alias("v"))
    )
    dense = per.groupBy("__id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))
        ).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)).cast("long"),
    )
    out = dense.select("__id", vec.alias("vec"))
    zero = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0).cast("long"))
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(out, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("vec"), zero).alias("vec"),
        )
    )


def bucket_sums(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-grain per-bucket accounting — the driver-checkable face
    of the featurizer: (bucket, n_tokens, sum_sign). Any change to the
    tokenizer, hash, bucket map, or sign rule moves these sums."""
    t = _tokens(docs, text_col, id_col)
    h = _token_hash(F.col("token"))
    return (
        t.select(
            (h % F.lit(dim)).alias("bucket"),
            ((F.shiftright(h, 1).bitwiseAND(F.lit(1))) * 2 - 1).alias("sign"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("sign").cast("long").alias("sum_sign"),
        )
    )


def bucket_sums_sql(dim: int = 32, table: str = "documents") -> str:
    """DuckDB twin of `bucket_sums` (same fp -> mix -> bucket/sign)."""
    hv = mix_sql(rolling_fp_sql("token"))
    return f"""
        WITH toks AS (
          SELECT unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS token
          FROM {table}),
        h AS (SELECT ({hv}) AS hv FROM toks)
        SELECT hv % {dim} AS bucket,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(((hv >> 1) & 1) * 2 - 1) AS BIGINT) AS sum_sign
        FROM h GROUP BY 1
    """
