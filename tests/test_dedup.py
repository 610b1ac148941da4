"""Banded Jaccard near-dup: exactness vs the all-pairs form, first-match
dedup (no duplicate pairs), and subquadratic candidate volume — the
test discipline of tests/test_ann.py applied to the q18 scale path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.dedup import BANDS, _band_bits, jaccard_neardup_banded

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def masked(spark):
    import __spark_entry__ as entrymod

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.select(
        "doc_id", "lang", entrymod._letter_mask_col().alias("mask")
    ).persist()


def _all_pairs(masked):
    a = masked.select(F.col("doc_id").alias("a"), "lang", F.col("mask").alias("ma"))
    b = masked.select(F.col("doc_id").alias("b"), "lang", F.col("mask").alias("mb"))
    inter = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    union = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
    j1000 = F.floor((inter * F.lit(1000)) / union).cast("long")
    return (
        a.join(b, "lang")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", j1000.alias("j1000"))
        .where(F.col("j1000") >= 900)
    )


def test_banded_equals_all_pairs(spark, masked):
    got = sorted(map(tuple, jaccard_neardup_banded(masked).collect()))
    want = sorted(map(tuple, _all_pairs(masked).collect()))
    assert len(want) > 0
    assert got == want


def test_no_duplicate_pairs(spark, masked):
    rows = jaccard_neardup_banded(masked).collect()
    keys = [(r["a"], r["b"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_candidate_volume_is_subquadratic(spark, masked):
    """The exact-check stage runs over distinct-mask representative
    pairs, whose count is bounded by distinct masks (<= 2^26 per group,
    independent of document count) — it must be a small fraction of the
    per-doc all-pairs volume."""
    from ariadne_spark.operators.dedup import rep_candidate_pairs

    cand = rep_candidate_pairs(masked, "lang", "mask").count()
    per_lang = masked.groupBy("lang").count().collect()
    all_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in per_lang)
    assert cand < 0.1 * all_pairs, f"{cand} rep pairs vs {all_pairs} doc pairs"
    # and the candidate count is bounded by distinct-mask pair volume
    per_lang_masks = (
        masked.select("lang", "mask").distinct().groupBy("lang").count().collect()
    )
    rep_all = sum(r["count"] * (r["count"] - 1) // 2 for r in per_lang_masks)
    assert cand <= rep_all


def test_threshold_guard():
    """Thresholds that admit >2 differing bits must be rejected (3-band
    pigeonhole recall would no longer be exact)."""
    # a threshold of 800 admits floor(26*0.2)=5 differing bits
    with pytest.raises(AssertionError):
        jaccard_neardup_banded(None, threshold_milli=800)


# ---------------------------------------------------------------------------
# dup_clusters — connected components over near-dup pairs
# ---------------------------------------------------------------------------


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.fixture(scope="module")
def chain_pairs(spark):
    """Transitive chains + a cycle + singleton pairs: 0-1-2-3-4 (path,
    so A~C is NEVER a pair — the transitivity case), 10-11-12-10
    (cycle), 20-21, and a long path 30..39."""
    rows = (
        [(i, i + 1) for i in range(4)]
        + [(10, 11), (11, 12), (12, 10)]
        + [(20, 21)]
        + [(i, i + 1) for i in range(30, 39)]
    )
    return spark.createDataFrame(rows, "a long, b long")


def test_dup_clusters_match_union_find(spark, chain_pairs):
    from ariadne_spark.operators.dedup import dup_clusters

    got = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(chain_pairs).collect()
    }
    exp = _union_find_oracle([(r["a"], r["b"]) for r in chain_pairs.collect()])
    assert got == exp
    # transitivity: endpoints of the 0..4 path share a cluster
    assert got[0] == got[4] == 0
    assert got[30] == got[39] == 30


def test_dup_clusters_match_duckdb_recursive_cte(spark, chain_pairs, tmp_path):
    """Cross-engine twin: DuckDB WITH RECURSIVE closure (UNION dedup
    guarantees termination over the cycle), min reachable node."""
    import duckdb

    from ariadne_spark.operators.dedup import dup_clusters

    p = str(tmp_path / "pairs.parquet")
    chain_pairs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW pairs AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = dict(
        con.execute(
            """
        WITH RECURSIVE edges AS (
          SELECT a AS u, b AS v FROM pairs
          UNION SELECT b AS u, a AS v FROM pairs),
        reach(src, node) AS (
          SELECT u AS src, u AS node FROM edges
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u)
        SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY src
        """
        ).fetchall()
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(chain_pairs).collect()}
    assert got == want


def test_dup_clusters_parallelism_invariant(spark, chain_pairs):
    from ariadne_spark.operators.dedup import dup_clusters

    a = sorted(map(tuple, dup_clusters(chain_pairs.repartition(1)).collect()))
    b = sorted(map(tuple, dup_clusters(chain_pairs.repartition(16)).collect()))
    assert a == b


def test_dup_clusters_on_real_neardup_pairs(spark, masked):
    """End-to-end: banded q18 pairs -> clusters == union-find over the
    same pairs (the curation-pipeline composition)."""
    from ariadne_spark.operators.dedup import dup_clusters

    pairs = jaccard_neardup_banded(masked).select("a", "b")
    got = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    exp = _union_find_oracle([(r["a"], r["b"]) for r in pairs.collect()])
    assert got == exp and len(got) > 0


# ---------------------------------------------------------------------------
# canonicalize — one representative per cluster
# ---------------------------------------------------------------------------


def test_canonicalize_keeps_one_per_cluster(spark, chain_pairs):
    from ariadne_spark.operators.dedup import canonicalize, dup_clusters

    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id long, quality long"
    )
    clusters = dup_clusters(chain_pairs)
    kept = canonicalize(docs, clusters)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # clustered ids collapse to the min member; everyone else survives
    exp_clustered = {0, 10, 20, 30}  # min of each component in chain_pairs
    clustered_members = {r["doc_id"] for r in clusters.collect()}
    exp = sorted((set(range(50)) - clustered_members) | exp_clustered)
    assert ids == exp
    assert kept.columns == ["doc_id", "quality"]


def test_canonicalize_prefer_quality(spark, chain_pairs):
    """prefer=[("quality", False)] keeps the max-quality member, doc_id
    asc breaking quality ties."""
    from ariadne_spark.operators.dedup import canonicalize, dup_clusters

    docs = spark.createDataFrame(
        [(i, (i * 13) % 5) for i in range(50)], "doc_id long, quality long"
    )
    clusters = dup_clusters(chain_pairs)
    kept = {r["doc_id"] for r in canonicalize(docs, clusters, prefer=[("quality", False)]).collect()}
    lab = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in lab.items():
        members[c].append(d)
    for c, ms in members.items():
        want = min(ms, key=lambda d: (-((d * 13) % 5), d))
        assert want in kept and all(m not in kept for m in ms if m != want)


def test_canonicalize_tolerates_preexisting_cluster_id_column(spark, chain_pairs):
    """The natural upstream of canonicalize is a frame ALREADY annotated
    with dup_clusters labels; a df carrying its own cluster_id column
    must not collide with the label join (the label now joins under a
    private name). The user column passes through untouched."""
    from ariadne_spark.operators.dedup import canonicalize, dup_clusters

    clusters = dup_clusters(chain_pairs)
    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id long, quality long"
    ).join(clusters, "doc_id", "left")  # df now HAS a cluster_id column
    kept = canonicalize(docs, clusters)
    assert kept.columns == ["doc_id", "quality", "cluster_id"]
    ids = sorted(r["doc_id"] for r in kept.collect())
    clustered_members = {r["doc_id"] for r in clusters.collect()}
    exp = sorted((set(range(50)) - clustered_members) | {0, 10, 20, 30})
    assert ids == exp


def test_canonicalize_parallelism_invariant(spark, chain_pairs):
    from ariadne_spark.operators.dedup import canonicalize, dup_clusters

    docs = spark.createDataFrame(
        [(i, (i * 7) % 3) for i in range(50)], "doc_id long, quality long"
    )
    clusters = dup_clusters(chain_pairs)
    a = sorted(map(tuple, canonicalize(docs.repartition(1), clusters, prefer=[("quality", False)]).collect()))
    b = sorted(map(tuple, canonicalize(docs.repartition(16), clusters, prefer=[("quality", False)]).collect()))
    assert a == b


# ---------------------------------------------------------- delta_neardup

SIG_SCHEMA = "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long"
MH_BANDS = [["mh0", "mh1"], ["mh2", "mh3"]]


def _full_pairs(rows, bands=MH_BANDS):
    """Pure-python full banded recompute: all a<b pairs, first matching
    band — the ground truth delta_neardup must reproduce."""
    cols = ["mh0", "mh1", "mh2", "mh3"]
    sig = {r[0]: dict(zip(cols, r[1:])) for r in rows}
    out = {}
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for bi, band in enumerate(bands):
                if all(sig[a][c] == sig[b][c] for c in band):
                    out[(a, b)] = bi
                    break
    return out


CORPUS = [
    # clusters by shared bands: 1&2 share band0, 2&3 share band1,
    # 4 isolated, 5&6 share BOTH bands (first-match -> band0)
    (1, 10, 11, 900, 901),
    (2, 10, 11, 800, 801),
    (3, 30, 31, 800, 801),
    (4, 40, 41, 940, 941),
    (5, 50, 51, 950, 951),
    (6, 50, 51, 950, 951),
]
DELTA = [
    (100, 10, 11, 777, 778),   # joins 1&2 via band0
    (101, 60, 61, 800, 801),   # joins 2&3 via band1
    (102, 50, 51, 950, 951),   # joins 5&6 via BOTH bands -> band0
    (103, 70, 71, 970, 971),   # isolated
    (104, 70, 71, 980, 981),   # delta-delta pair with 103 via band0
]


def test_delta_neardup_equals_full_recompute_restricted(spark):
    from ariadne_spark.operators.dedup import delta_neardup

    c = spark.createDataFrame(CORPUS, SIG_SCHEMA)
    d = spark.createDataFrame(DELTA, SIG_SCHEMA)
    got = {
        (r["a"], r["b"]): r["band"]
        for r in delta_neardup(c, d, MH_BANDS).collect()
    }
    delta_ids = {r[0] for r in DELTA}
    want = {
        p: b
        for p, b in _full_pairs(CORPUS + DELTA).items()
        if p[0] in delta_ids or p[1] in delta_ids
    }
    assert got == want
    # sanity on the fixture: corpus-delta, delta-delta, both-band
    # first-match, and isolation are all exercised
    assert (1, 100) in got and (103, 104) in got
    assert got[(6, 102)] == 0 and got[(3, 101)] == 1
    assert not any(103 in p and 104 not in p for p in got)


def test_delta_neardup_rounds_accumulate_to_full(spark):
    """Three ingest rounds: accumulated delta pairs == one full banded
    recompute over everything (every pair touches some round's delta
    because the corpus starts empty)."""
    from ariadne_spark.operators.dedup import delta_neardup

    rounds = [CORPUS, DELTA, [(200, 10, 11, 950, 951), (201, 40, 41, 333, 334)]]
    acc: dict = {}
    seen: list = []
    for batch in rounds:
        c = spark.createDataFrame(
            seen or [(-(10**9), -1, -2, -3, -4)], SIG_SCHEMA
        )  # empty-corpus stand-in that matches nothing
        d = spark.createDataFrame(batch, SIG_SCHEMA)
        for r in delta_neardup(c, d, MH_BANDS).collect():
            acc[(r["a"], r["b"])] = r["band"]
        seen = seen + batch
    want = _full_pairs(seen)
    want.pop((-(10**9), -1), None)
    assert acc == {p: b for p, b in want.items() if p[0] >= 0}


def test_delta_neardup_parallelism_invariance(spark):
    from ariadne_spark.operators.dedup import delta_neardup

    c = spark.createDataFrame(CORPUS, SIG_SCHEMA)
    d = spark.createDataFrame(DELTA, SIG_SCHEMA)
    base = sorted(map(tuple, delta_neardup(c, d, MH_BANDS).collect()))
    for n in (1, 7):
        again = sorted(
            map(
                tuple,
                delta_neardup(
                    c.repartition(n), d.repartition(n), MH_BANDS
                ).collect(),
            )
        )
        assert again == base, n


def test_delta_neardup_probe_side_is_the_delta(spark):
    """Plan shape: the per-band joins must not re-derive or re-shuffle
    the corpus into a pairwise form — no cartesian, and candidate
    volume stays 0 when the delta shares no band bucket."""
    from ariadne_spark.operators.dedup import delta_neardup

    c = spark.createDataFrame(CORPUS, SIG_SCHEMA)
    lonely = spark.createDataFrame([(300, 1, 2, 3, 4)], SIG_SCHEMA)
    out = delta_neardup(c, lonely, MH_BANDS)
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_dup_clusters_chain_converges_in_log_rounds(spark):
    """The scale property that motivated the large-star/small-star
    rewrite: a PATH graph (the chain-shaped duplicate-family worst
    case, e.g. templated text) has diameter n, so the old min-label
    propagation needed ~n rounds; star contraction must finish in
    O(log n). 1000-node path: assert rounds <= 2*log2(n) + 4 and the
    labeling still equals union-find."""
    import math

    from ariadne_spark.operators.dedup import dup_clusters

    n = 1000
    rows = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(rows, "a long, b long")
    labels, rounds = dup_clusters(pairs, return_rounds=True)
    bound = 2 * math.log2(n) + 4
    assert rounds <= bound, f"{rounds} rounds > {bound} on a {n}-path"
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_dup_clusters_string_ids(spark):
    """Callers pass string ids (image_id); min-id labeling must hold
    under lexicographic order too."""
    from ariadne_spark.operators.dedup import dup_clusters

    rows = [("img3", "img1"), ("img1", "img2"), ("img9", "img8")]
    pairs = spark.createDataFrame(rows, "a string, b string")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {
        "img1": "img1", "img2": "img1", "img3": "img1",
        "img8": "img8", "img9": "img8",
    }
