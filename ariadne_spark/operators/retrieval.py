"""Sparse lexical retrieval: distributed BM25-family top-k.

The missing retrieval half next to the dense paths (exact_sim block
matmul, ann LSH/IVF/IVF-PQ): score documents against keyword queries
through an inverted-postings relation — the operator a RAG pipeline
uses for lexical recall and a training pipeline uses for hard-negative
mining next to its embedding index.

Scoring is the BM25 shape with ALL arithmetic in scaled integers
(milli units, floor division), so scores — and therefore the kept
top-k SET — are bit-identical across engines, partitionings, and
cluster sizes: the same determinism-as-correctness contract as the
sketches. The idf factor uses the rank-preserving integer surrogate
``idf_s = (N*1000)//df`` (monotone in the true ln((N-df+.5)/(df+.5))
for df < N/2, strictly monotone in df everywhere) instead of a float
log; the tf saturation is the genuine BM25 Robertson form

    tf_comp = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

evaluated in milli-integers. Every division is floor division on
non-negative longs, identical in Spark (``idiv``) and DuckDB (``//``).

Overflow envelope (int64): ``idf_s <= N*1000`` (1e15 at N=1e12 docs),
``tf_comp_m <= (k1_m+1000)`` (~2200), so a per-term contribution is
<= 2.2e15 and a 1000-term query sum stays < 2^63. The intermediate
``tf*(k1_m+1000)*1000`` is <= 2.2e6*dl — safe to dl ~ 1e12 tokens.

Scale shape (100 TB corpus): postings build is one explode + hash
aggregation, linear in corpus tokens. The query side broadcasts
(distinct query terms, then (query_id, term) pairs), so the only
postings that ever shuffle are those whose term appears in some query
— candidate volume is sum of matched postings, never pairwise in the
corpus. Stopword-dense queries are bounded by ``max_df_permille``
(drop terms present in more than that fraction of docs — the classic
inverted-index stopword guard), which caps the worst posting list.
Final ranking is one (query_id, doc_id) hash aggregation plus a
per-query top-k window.

Reference analog: ariadne's multi-candidate call resolution scores
several candidate definitions for one reference and keeps the ranked
best (packages/core/src/resolve_references/call_resolver.ts:391-463);
here the "reference" is a keyword query, the candidates are documents
sharing its terms, and the rank is BM25 instead of scope proximity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _idivc(a: Column, b: Column) -> Column:
    """Exact floor division of non-negative long Columns (matches
    DuckDB //). Unlike cells.idiv (double path, exact only < 2^53),
    this divides in decimal(38,0): (a - a%b) is exactly divisible by
    b, so the decimal quotient is integral and BigDecimal division is
    exact at any int64 magnitude — idf products here reach ~2.2e18 at
    N=1e12 docs, past double's 53-bit mantissa."""
    d = lambda c: c.cast("decimal(38,0)")
    return (d(a - (a % b)) / d(b)).cast("decimal(38,0)").cast("long")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 3,
    k1_milli: int = 1200,
    b_milli: int = 750,
    max_df_permille: int = 1000,
    exclude_self: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """-> (query_id, doc_id, score_q, rank): integer-exact BM25 top-k
    documents per query, deterministic tie-break on doc_id.

    Terms are whitespace tokens (the corpus-wide tokenizer contract);
    each DISTINCT query term contributes once (standard BM25 query
    side). ``exclude_self=True`` drops doc_id == query_id rows before
    ranking, for queries drawn from the corpus itself. Formula (all
    floor divisions, milli-scaled):

        avgdl_m = (total_tokens*1000) // N
        dlr_m   = (dl*1000000) // avgdl_m
        norm_m  = 1000 - b + (b*dlr_m)//1000
        denom   = tf*1000 + (k1*norm_m)//1000
        tfc_m   = (tf*(k1+1000)*1000) // denom
        idf_s   = (N*1000) // df
        score_q = sum over matched terms of (idf_s*tfc_m)//1000
    """
    assert 1 <= k and 0 < k1_milli and 0 <= b_milli <= 1000
    assert 1 <= max_df_permille <= 1000

    ws = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("dl"),
        F.explode(ws).alias("term"),
    )
    postings = base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )

    stats = docs.select(F.size(ws).cast("long").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot")
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.split(F.col(query_text_col), " ")).alias("term"),
        )
        .distinct()
    )
    term_set = qterms.select("term").distinct()

    lit = lambda v: F.lit(int(v)).cast("long")

    # Only postings whose term some query mentions ever leave the map
    # side; df is counted AFTER this filter but over ALL docs of each
    # surviving term (the filter is term-complete), so it is exact.
    matched = postings.join(F.broadcast(term_set), "term")
    # df per term as a map-side-combinable aggregate + broadcast join,
    # NOT Window.partitionBy(term): the window form hash-partitions the
    # matched postings by term and sorts each partition — a stopword
    # query term concentrates its entire postings list (millions of
    # rows at corpus scale) on ONE task. The aggregate partial-combines
    # per mapper and the result is bounded by |distinct query terms|,
    # so it always broadcasts. The max_df stopword gate then prunes
    # terms BEFORE the postings ever join anything wide.
    dfs = (
        matched.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(stats))
    )
    if max_df_permille < 1000:
        dfs = dfs.where(
            F.col("df_t") * lit(1000) <= lit(max_df_permille) * F.col("n_docs")
        )
    cand = matched.join(F.broadcast(dfs), "term")
    avgdl_m = _idivc(F.col("tot") * lit(1000), F.col("n_docs"))
    dlr_m = _idivc(F.col("dl") * lit(1_000_000), avgdl_m)
    norm_m = lit(1000 - b_milli) + _idivc(lit(b_milli) * dlr_m, lit(1000))
    denom = F.col("tf") * lit(1000) + _idivc(lit(k1_milli) * norm_m, lit(1000))
    tfc_m = _idivc(F.col("tf") * lit(k1_milli + 1000) * lit(1000), denom)
    idf_s = _idivc(F.col("n_docs") * lit(1000), F.col("df_t"))
    contrib = _idivc(idf_s * tfc_m, lit(1000))

    scored = (
        cand.select("term", "doc_id", contrib.alias("contrib"))
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score_q"))
    )
    if exclude_self:
        scored = scored.where(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_q", "rank")
    )


def bm25_sql(
    queries_sql: str,
    k: int = 3,
    k1_milli: int = 1200,
    b_milli: int = 750,
    max_df_permille: int = 1000,
    exclude_self: bool = False,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin of bm25_topk over the documents view.

    ``queries_sql`` must yield (query_id, text). Identical milli-
    integer formula, `//` floor division (all operands non-negative),
    same tie-break — byte-identical (query_id, doc_id, score_q, rank).
    """
    self_f = "AND c.doc_id <> q.query_id" if exclude_self else ""
    df_f = (
        f"WHERE df_t * 1000 <= {max_df_permille} * n_docs"
        if max_df_permille < 1000
        else ""
    )
    return f"""
        WITH src AS ({docs_sql}),
        docs_t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM src),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(len(ws)) AS BIGINT) AS tot
                  FROM docs_t),
        postings AS (
          SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
                       unnest(ws) AS term
                FROM docs_t)
          GROUP BY doc_id, dl, term),
        qt AS (SELECT DISTINCT query_id, unnest(string_split(text, ' ')) AS term
               FROM ({queries_sql})),
        cand0 AS (
          SELECT p.*, CAST(count(*) OVER (PARTITION BY p.term) AS BIGINT) AS df_t
          FROM postings p
          WHERE p.term IN (SELECT term FROM qt)),
        cand AS (
          SELECT c.*, s.n_docs, s.tot,
                 ((c.dl * 1000000) // ((s.tot * 1000) // s.n_docs)) AS dlr_m
          FROM cand0 c CROSS JOIN stats s),
        gated AS (SELECT * FROM cand {df_f}),
        contribs AS (
          SELECT term, doc_id,
                 ((((n_docs * 1000) // df_t)
                   * ((tf * {k1_milli + 1000} * 1000)
                      // (tf * 1000
                          + ({k1_milli} * (1000 - {b_milli}
                                           + ({b_milli} * dlr_m) // 1000))
                            // 1000)))
                  // 1000) AS contrib
          FROM gated),
        scored AS (
          SELECT q.query_id, c.doc_id,
                 CAST(sum(c.contrib) AS BIGINT) AS score_q
          FROM contribs c JOIN qt q USING (term)
          WHERE TRUE {self_f}
          GROUP BY q.query_id, c.doc_id),
        ranked AS (
          SELECT query_id, doc_id, score_q,
                 CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank
          FROM scored)
        SELECT query_id, doc_id, score_q, rank FROM ranked WHERE rank <= {k}
    """


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    k0: int = 60,
    k: int = 3,
) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (Cormack et al., SIGIR
    2009): fuse N per-query rankings — each (query, doc, rank) — into
    one by summing 10^6 // (k0 + rank) per (query, doc), micro-integer
    so distinct ranks always score distinctly (the milli scale
    collides: 1000//61 == 1000//62) and the fused order is
    bit-identical across engines. -> (query, doc, rrf_micro, rank),
    top-k per query, ties broken on doc.

    Scale shape: one union (no join between systems), one hash agg on
    (query, doc), one per-query top-k window — linear in the total
    size of the input rankings, which are already top-k-bounded, so
    the fusion costs O(queries·k·n_systems) however big the corpus
    behind the rankings was.
    """
    u = rankings[0].select(query_col, doc_col, "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select(query_col, doc_col, "rank"))
    scored = u.groupBy(query_col, doc_col).agg(
        F.sum(_idivc(F.lit(1000000), F.lit(k0) + F.col("rank")))
        .cast("long")
        .alias("rrf_micro")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_micro"), F.asc(doc_col)
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)


def rrf_sql(
    ranking_sqls: list[str], k0: int = 60, k: int = 3
) -> str:
    """DuckDB twin of rrf_fuse: each fragment must yield
    (query_id, doc_id, rank)."""
    union = " UNION ALL ".join(
        f"SELECT query_id, doc_id, rank FROM ({s})" for s in ranking_sqls
    )
    return f"""
        SELECT query_id, doc_id, rrf_micro,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
        FROM (SELECT query_id, doc_id,
                     CAST(sum(1000000 // ({k0} + rank)) AS BIGINT) AS rrf_micro
              FROM ({union}) GROUP BY query_id, doc_id)
        QUALIFY rank <= {k}
    """


def eval_topk(
    system: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Retrieval evaluation: per-query recall@k and MRR of a `system`
    ranking against a `truth` ranking (both (query, doc, rank)) — the
    metric relation an ANN/hybrid pipeline gates its index builds on
    (e.g. approximate top-k scored against the exact top-k).

    -> (query, n_truth, hits, recall_permille, mrr_micro), integer-
    exact: recall = 1000·hits // n_truth, mrr = 10^6 // (system rank
    of the first truth doc), 0 when no truth doc is retrieved. Queries
    are driven from the truth side, so a system that misses a query
    entirely still yields its zero row.

    Scale shape: both sides are top-k-bounded; one (query, doc) equi
    join + one per-query hash agg — O(queries·k), corpus-independent.
    """
    t = truth.where(F.col("rank") <= k).select(query_col, doc_col)
    s = system.where(F.col("rank") <= k).select(query_col, doc_col, "rank")
    j = t.join(s, [query_col, doc_col], "left")
    agg = j.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.count("rank").cast("long").alias("hits"),
        F.min("rank").alias("_minr"),
    )
    return agg.select(
        query_col,
        "n_truth",
        "hits",
        _idivc(F.col("hits") * F.lit(1000), F.col("n_truth")).alias(
            "recall_permille"
        ),
        F.when(
            F.col("_minr").isNotNull(),
            _idivc(F.lit(1000000), F.col("_minr")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mrr_micro"),
    )


def eval_sql(system_sql: str, truth_sql: str, k: int = 3) -> str:
    """DuckDB twin of eval_topk: fragments yield (query_id, doc_id,
    rank)."""
    return f"""
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS n_truth,
               CAST(count(s.rank) AS BIGINT) AS hits,
               (CAST(count(s.rank) AS BIGINT) * 1000) // count(*)
                   AS recall_permille,
               CAST(coalesce(1000000 // min(s.rank), 0) AS BIGINT)
                   AS mrr_micro
        FROM (SELECT query_id, doc_id FROM ({truth_sql}) WHERE rank <= {k}) t
        LEFT JOIN (SELECT query_id, doc_id, rank FROM ({system_sql})
                   WHERE rank <= {k}) s
          ON t.query_id = s.query_id AND t.doc_id = s.doc_id
        GROUP BY t.query_id
    """


def hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    k_neg: int = 2,
) -> DataFrame:
    """Hard-negative mining for retriever training (the RocketQA /
    ANCE recipe): for each query, take the top-ranked `candidates`
    from a (different or earlier-generation) retriever that are NOT
    known positives — documents a model finds plausible but wrong, the
    highest-signal negatives for contrastive training. -> one row per
    (query, positive, negative): (query, pos_id, neg_id, neg_rank),
    re-ranked 1..k_neg after the positive filter so a downstream
    sampler can cut at any depth.

    `candidates`: (query, doc, rank) from any ranking operator here
    (bm25_topk, exact_topk, ann_*, rrf_fuse). `positives`:
    (query, doc) ground truth. Deterministic: candidate order is the
    input's rank with doc tie-break; the pos x neg fanout is bounded
    by k_pos*k_neg per query.

    Scale shape: positives anti-join (both sides top-k/label-bounded)
    + one per-query window + one per-query equi-join — corpus size
    never appears; mining cost is O(queries * k).
    """
    pos = positives.select(query_col, doc_col)
    negs = (
        candidates.select(query_col, doc_col, "rank")
        .join(pos, [query_col, doc_col], "left_anti")
    )
    w = Window.partitionBy(query_col).orderBy(F.asc("rank"), F.asc(doc_col))
    negs = (
        negs.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= k_neg)
        .select(
            query_col,
            F.col(doc_col).alias("neg_id"),
            "neg_rank",
        )
    )
    return negs.join(
        pos.select(query_col, F.col(doc_col).alias("pos_id")), query_col
    ).select(query_col, "pos_id", "neg_id", "neg_rank")


def hard_negatives_sql(
    candidates_sql: str, positives_sql: str, k_neg: int = 2
) -> str:
    """DuckDB twin of hard_negatives: fragments yield
    (query_id, doc_id, rank) and (query_id, doc_id)."""
    return f"""
        WITH hn_pos AS (SELECT query_id, doc_id FROM ({positives_sql})),
        hn_negs AS (
          SELECT c.query_id, c.doc_id,
                 CAST(row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY c.rank, c.doc_id) AS BIGINT) AS neg_rank
          FROM ({candidates_sql}) c
          ANTI JOIN hn_pos p
            ON c.query_id = p.query_id AND c.doc_id = p.doc_id)
        SELECT n.query_id, p.doc_id AS pos_id, n.doc_id AS neg_id, n.neg_rank
        FROM hn_negs n JOIN hn_pos p ON n.query_id = p.query_id
        WHERE n.neg_rank <= {k_neg}
    """
