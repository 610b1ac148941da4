"""Sparse BM25 retrieval tests: the milli-integer formula against a
pure-python oracle (edge cases: repeated terms, empty text, single
word, query tf > 1), the DuckDB twin byte-for-byte, parallelism
invariance, and the max_df stopword gate. Cross-engine parity of the
full q21 retrieval suite at sf0.01 is covered by
tests/test_entry_contract.py."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.retrieval import bm25_sql, bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "one two"),
    (2, "a b c d"),
    (3, "spam spam spam spam spam spam spam spam"),
    (4, "the quick brown fox jumps over a sleeping cat"),
    (5, "totally unrelated words appear in this document here"),
    (6, "x"),
    (7, ""),  # split('') -> [''], dl = 1
    (8, "fox fox fox dog"),  # tf saturation: 3x fox must not score 3x
]
QUERY_IDS = [0, 4, 8]


def py_bm25(docs, qids, k=3, k1=1200, b=750, max_df_pm=1000, self_ok=False):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl_m = sum(len(w) for w in toks.values()) * 1000 // n
    tfs = {i: Counter(w) for i, w in toks.items()}
    df = Counter()
    for c in tfs.values():
        for t in c:
            df[t] += 1
    out = []
    for q in qids:
        scores: dict[int, int] = {}
        for t in set(toks[q]):
            if df[t] * 1000 > max_df_pm * n:
                continue
            for d, c in tfs.items():
                if t not in c or (d == q and not self_ok):
                    continue
                tf, dl = c[t], len(toks[d])
                dlr_m = dl * 1_000_000 // avgdl_m
                norm_m = 1000 - b + (b * dlr_m) // 1000
                denom = tf * 1000 + (k1 * norm_m) // 1000
                tfc_m = (tf * (k1 + 1000) * 1000) // denom
                scores[d] = scores.get(d, 0) + (n * 1000 // df[t] * tfc_m) // 1000
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out += [(q, d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return sorted(out)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries_df(docs_df):
    return docs_df.where(F.col("doc_id").isin(QUERY_IDS)).select(
        F.col("doc_id").alias("query_id"), "text"
    )


def _run(docs_df, queries_df, **kw):
    return sorted(
        map(tuple, bm25_topk(docs_df, queries_df, k=3, **kw).collect())
    )


def test_matches_python_oracle(docs_df, queries_df):
    got = _run(docs_df, queries_df, exclude_self=True)
    assert got == py_bm25(DOCS, QUERY_IDS)
    assert len(got) > 0


def test_duckdb_twin_byte_identical(docs_df, queries_df):
    got = _run(docs_df, queries_df, exclude_self=True)
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS t(doc_id, text)"
    )
    ids = ", ".join(map(str, QUERY_IDS))
    want = sorted(
        map(
            tuple,
            duck.execute(
                bm25_sql(
                    "SELECT doc_id AS query_id, text FROM documents"
                    f" WHERE doc_id IN ({ids})",
                    k=3,
                    exclude_self=True,
                )
            ).fetchall(),
        )
    )
    assert got == want


def test_self_match_ranks_first_when_not_excluded(docs_df, queries_df):
    got = _run(docs_df, queries_df, exclude_self=False)
    assert got == py_bm25(DOCS, QUERY_IDS, self_ok=True)
    # a query doc shares every term with itself at full tf: rank 1
    by_query = {q: d for q, d, s, r in got if r == 1}
    assert by_query[0] == 0 and by_query[4] == 4


def test_max_df_gate_drops_stopwords(docs_df, queries_df):
    # 'the' appears in 2/9 docs; at max_df_permille=200 it is gated and
    # scores change exactly as the python oracle predicts
    got = _run(docs_df, queries_df, exclude_self=True, max_df_permille=200)
    assert got == py_bm25(DOCS, QUERY_IDS, max_df_pm=200)
    assert got != py_bm25(DOCS, QUERY_IDS)  # the gate did something


def test_parallelism_invariance(spark, docs_df, queries_df):
    one = _run(docs_df.coalesce(1), queries_df, exclude_self=True)
    many = _run(docs_df.repartition(7), queries_df, exclude_self=True)
    assert one == many == py_bm25(DOCS, QUERY_IDS)


def test_tf_saturation_sublinear(spark):
    # two docs of identical length, tf(fox)=1 vs tf(fox)=3: BM25's
    # saturation keeps the score ratio well under the linear 3x
    corpus = [
        (0, "fox a b c"),
        (1, "fox fox fox c"),
        (2, "d e f g"),
        (10, "fox"),
    ]
    d = spark.createDataFrame(corpus, "doc_id long, text string")
    q = d.where("doc_id = 10").selectExpr("doc_id AS query_id", "text")
    got = {r["doc_id"]: r["score_q"] for r in bm25_topk(d, q, k=3).collect()}
    assert got[1] > got[0]  # more occurrences still score higher
    assert got[1] < 2 * got[0]  # but sublinearly (3x tf < 2x score)
    assert got == {d: s for _, d, s, _ in py_bm25(corpus, [10], self_ok=True)}


# ------------------------------------------------------- fusion + eval

R_A = [  # (query_id, doc_id, rank) — system A
    (1, 10, 1), (1, 11, 2), (1, 12, 3),
    (2, 20, 1), (2, 21, 2),
]
R_B = [  # system B: overlaps A on (1,11) and (2,20), disjoint otherwise
    (1, 11, 1), (1, 13, 2),
    (2, 22, 1), (2, 20, 2), (2, 23, 3),
    (3, 30, 1),  # query only B knows
]


def py_rrf(rankings, k0=60, k=3):
    from collections import defaultdict

    s = defaultdict(int)
    for r in rankings:
        for q, d, rk in r:
            s[(q, d)] += 1000000 // (k0 + rk)
    out = {}
    byq = defaultdict(list)
    for (q, d), sc in s.items():
        byq[q].append((-sc, d))
    for q, lst in byq.items():
        for i, (nsc, d) in enumerate(sorted(lst), 1):
            if i <= k:
                out[(q, d)] = (-nsc, i)
    return out


def test_rrf_fuse_python_oracle_and_duckdb(spark):
    import duckdb

    from ariadne_spark.operators.retrieval import rrf_fuse, rrf_sql

    a = spark.createDataFrame(R_A, "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(R_B, "query_id long, doc_id long, rank long")
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_micro"], r["rank"])
        for r in rrf_fuse([a, b], k0=60, k=3).collect()
    }
    assert got == py_rrf([R_A, R_B])
    # shared docs outrank single-system docs at equal single ranks
    assert got[(1, 11)][1] == 1  # in both systems -> fused top
    con = duckdb.connect()
    import pandas as pd

    con.register("ra", pd.DataFrame(R_A, columns=["query_id", "doc_id", "rank"]))
    con.register("rb", pd.DataFrame(R_B, columns=["query_id", "doc_id", "rank"]))
    o = con.execute(
        rrf_sql(["SELECT * FROM ra", "SELECT * FROM rb"], k0=60, k=3)
    ).fetchdf()
    oracle = {
        (r.query_id, r.doc_id): (r.rrf_micro, r.rank) for r in o.itertuples()
    }
    assert oracle == got


def test_eval_topk_python_oracle_and_duckdb(spark):
    import duckdb
    import pandas as pd

    from ariadne_spark.operators.retrieval import eval_sql, eval_topk

    truth = spark.createDataFrame(R_A, "query_id long, doc_id long, rank long")
    system = spark.createDataFrame(R_B, "query_id long, doc_id long, rank long")
    got = {
        r["query_id"]: (
            r["n_truth"], r["hits"], r["recall_permille"], r["mrr_micro"]
        )
        for r in eval_topk(system, truth, k=3).collect()
    }
    # q1: truth {10,11,12}, system hits {11} at rank 1 -> mrr 10^6
    # q2: truth {20,21}, system hits {20} at rank 2 -> mrr 500000
    # q3: not in truth -> absent (truth-driven)
    assert got == {
        1: (3, 1, 333, 1000000),
        2: (2, 1, 500, 500000),
    }
    con = duckdb.connect()
    con.register("ra", pd.DataFrame(R_A, columns=["query_id", "doc_id", "rank"]))
    con.register("rb", pd.DataFrame(R_B, columns=["query_id", "doc_id", "rank"]))
    o = con.execute(
        eval_sql("SELECT * FROM rb", "SELECT * FROM ra", k=3)
    ).fetchdf()
    oracle = {
        r.query_id: (r.n_truth, r.hits, r.recall_permille, r.mrr_micro)
        for r in o.itertuples()
    }
    assert oracle == got


def test_eval_topk_zero_hit_query(spark):
    from ariadne_spark.operators.retrieval import eval_topk

    truth = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank long")
    system = spark.createDataFrame([(1, 99, 1)], "query_id long, doc_id long, rank long")
    [r] = eval_topk(system, truth, k=3).collect()
    assert (r["hits"], r["recall_permille"], r["mrr_micro"]) == (0, 0, 0)


def test_rrf_fuse_parallelism_invariance(spark):
    from ariadne_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(R_A, "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(R_B, "query_id long, doc_id long, rank long")
    base = sorted(map(tuple, rrf_fuse([a, b]).collect()))
    for n in (1, 7):
        again = sorted(
            map(
                tuple,
                rrf_fuse([a.repartition(n), b.repartition(n)]).collect(),
            )
        )
        assert again == base, n


def test_hard_negatives_python_oracle_and_duckdb(spark):
    import duckdb
    import pandas as pd

    from ariadne_spark.operators.retrieval import (
        hard_negatives,
        hard_negatives_sql,
    )

    cands = [
        # query 1: 10 is a positive -> negatives re-rank to 11,12
        (1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4),
        # query 2: no positive among candidates
        (2, 20, 1), (2, 21, 2),
        # query 3: ALL candidates are positives -> no rows
        (3, 30, 1),
    ]
    pos = [(1, 10), (1, 50), (2, 99), (3, 30)]
    c = spark.createDataFrame(cands, "query_id long, doc_id long, rank long")
    p = spark.createDataFrame(pos, "query_id long, doc_id long")
    got = sorted(
        map(tuple, hard_negatives(c, p, k_neg=2).collect())
    )
    # q1: negs (11,1),(12,2) x pos {10,50}; q2: negs (20,1),(21,2) x {99}
    want = sorted([
        (1, 10, 11, 1), (1, 50, 11, 1), (1, 10, 12, 2), (1, 50, 12, 2),
        (2, 99, 20, 1), (2, 99, 21, 2),
    ])
    assert got == want
    con = duckdb.connect()
    con.register("c", pd.DataFrame(cands, columns=["query_id", "doc_id", "rank"]))
    con.register("p", pd.DataFrame(pos, columns=["query_id", "doc_id"]))
    o = sorted(
        map(
            tuple,
            con.execute(
                hard_negatives_sql("SELECT * FROM c", "SELECT * FROM p", k_neg=2)
            ).fetchall(),
        )
    )
    assert o == want


def test_hard_negatives_parallelism_invariance(spark):
    from ariadne_spark.operators.retrieval import hard_negatives

    c = spark.createDataFrame(
        [(q, d, r) for q in range(5) for r, d in enumerate(range(q, q + 6), 1)],
        "query_id long, doc_id long, rank long",
    )
    p = spark.createDataFrame(
        [(q, q + 1) for q in range(5)], "query_id long, doc_id long"
    )
    base = sorted(map(tuple, hard_negatives(c, p, k_neg=3).collect()))
    for n in (1, 7):
        got = sorted(
            map(
                tuple,
                hard_negatives(c.repartition(n), p.repartition(n), k_neg=3).collect(),
            )
        )
        assert got == base, n
