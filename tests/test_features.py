"""Feature hashing: per-doc vectors vs a pure-python twin, corpus
bucket sums vs python AND DuckDB, parallelism invariance, zero-vector
edge cases, and the identical-text => identical-vector law."""

import duckdb
import numpy as np

from ariadne_spark.functions.sketch import M31, mix_np
from ariadne_spark.operators.features import (
    bucket_sums,
    bucket_sums_sql,
    hash_features,
)

DIM = 16

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the the",
    "",
    "   ",
    "one",
    "repeated words repeated words repeated",
    "the quick brown fox jumps over the lazy dog",  # exact dup of doc 0
    "punct, heavy! tokens? (mixed) [brackets] end.",
]


def _fp_py(s: str, n: int = 16) -> int:
    fp = 0
    for i in range(n):
        fp = (fp * 31 + (ord(s[i]) if i < len(s) else 0)) % M31
    rev = s[::-1]
    for i in range(n):
        fp = (fp * 31 + (ord(rev[i]) if i < len(rev) else 0)) % M31
    return (fp * 31 + len(s)) % M31


def _hash_py(token: str) -> int:
    return int(mix_np(np.array([_fp_py(token)], dtype=np.int64))[0])


def _vec_py(text: str, dim: int) -> list:
    v = [0] * dim
    for t in text.split(" "):
        if not t:
            continue
        h = _hash_py(t)
        v[h % dim] += ((h >> 1) & 1) * 2 - 1
    return v


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_vectors_match_python_twin(spark):
    got = {
        r["doc_id"]: list(r["vec"])
        for r in hash_features(_docs(spark), dim=DIM).collect()
    }
    assert len(got) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        assert got[i] == _vec_py(t, DIM), (i, t)
    # empty + whitespace-only docs present as zero vectors
    assert got[2] == [0] * DIM and got[3] == [0] * DIM
    # identical texts => identical vectors (the SemDeDup feed property)
    assert got[0] == got[6] and any(x != 0 for x in got[0])


def test_vectors_parallelism_invariant(spark):
    a = {r["doc_id"]: list(r["vec"]) for r in hash_features(_docs(spark), DIM).collect()}
    b = {
        r["doc_id"]: list(r["vec"])
        for r in hash_features(_docs(spark).repartition(11), DIM).collect()
    }
    assert a == b


def test_bucket_sums_three_way(spark):
    # python truth
    exp = {}
    for t in TEXTS:
        for tok in t.split(" "):
            if not tok:
                continue
            h = _hash_py(tok)
            b = h % DIM
            n, s = exp.get(b, (0, 0))
            exp[b] = (n + 1, s + ((h >> 1) & 1) * 2 - 1)
    got = {
        int(r["bucket"]): (int(r["n_tokens"]), int(r["sum_sign"]))
        for r in bucket_sums(_docs(spark), dim=DIM).collect()
    }
    assert got == exp
    # DuckDB twin on the same rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
        + ") AS v(doc_id, text)"
    )
    o = con.execute(bucket_sums_sql(dim=DIM)).df()
    duck = {
        int(r["bucket"]): (int(r["n_tokens"]), int(r["sum_sign"]))
        for _, r in o.iterrows()
    }
    assert duck == exp


def test_vectors_feed_exact_cosine(spark):
    """End-to-end with the existing similarity stack: exact duplicate
    docs reach cosine == 1 (integer cross-multiplication exact)."""
    vecs = hash_features(_docs(spark), dim=DIM)
    rows = {r["doc_id"]: np.array(r["vec"], dtype=np.int64) for r in vecs.collect()}
    a, b = rows[0], rows[6]
    dot = int(a @ b)
    assert dot * dot == int(a @ a) * int(b @ b) and dot > 0  # cos == 1
    c = rows[1]
    dc = int(a @ c)
    assert dc * dc < int(a @ a) * int(c @ c)  # distinct docs: cos < 1


def test_text_to_semdedup_end_to_end(spark):
    """The self-contained curation path: raw text -> hash_features ->
    unit-normalize -> SemDeDup, no precomputed embeddings anywhere.
    Planted exact duplicates must land in one dup cluster with exactly
    one keeper; the distinct filler docs must all survive."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.semdedup import semdedup

    texts = [
        " ".join(f"tok{i}x{j}" for j in range(8)) for i in range(20)
    ]  # fully disjoint vocabularies per filler doc
    texts += ["the planted duplicate body text"] * 3  # ids 20,21,22
    docs = _docs(spark, texts)
    vecs = hash_features(docs, dim=64)
    norm = F.sqrt(
        F.aggregate(
            "vec", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    emb = (
        vecs.where(norm > 0)
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform("vec", lambda x: x.cast("double") / norm).alias("embedding"),
        )
    )
    out = {r["vec_id"]: (r["dup_cluster_id"], r["keep"]) for r in
           semdedup(emb, threshold_q=990_000, n_centroids=4).collect()}
    assert len(out) == 23
    # planted dups: one component rooted at min id 20, single keeper
    assert out[20] == (20, 1) and out[21] == (20, 0) and out[22] == (20, 0)
    # every distinct filler doc is its own kept singleton
    for i in range(20):
        assert out[i] == (i, 1), i
