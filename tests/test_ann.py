"""ANN tests: LSH-bucketed cosine top-k vs the exact brute-force
baseline on the driver's embeddings table (label-clustered, unit-norm).
Recall is measured as overlap of (src, dst) top-k pairs."""

from __future__ import annotations

import pytest

from ariadne_spark.operators.ann import ann_topk, brute_force_topk

SF_DIR = "/root/testdata/sf0.01"
K = 3


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(600).persist()


def test_ann_recall_vs_brute_force(spark, emb):
    """Small-corpus recall-tuned parameters (explicit 4x8): the near-
    quadratic candidate budget buys >=0.6 recall on this weakly-
    clustered fixture. These are NOT the scale defaults — see
    test_ann_auto_params_* for the log2-scaled behavior."""
    exact = {
        (r["src"], r["dst"]) for r in brute_force_topk(emb, k=K).collect()
    }
    approx = {
        (r["src"], r["dst"])
        for r in ann_topk(emb, k=K, n_planes=4, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_ann_auto_params_recall_floor(spark, emb):
    """Auto (log2-scaled) LSH params trade top-k recall for a
    subquadratic candidate budget — the documented division of labor
    (IVF is the top-k scale path; LSH is the candidate-diversity /
    high-similarity path). The floor pins the tradeoff from drifting:
    measured 0.449 at n=500 (planes=6, tables=12)."""
    exact = {
        (r["src"], r["dst"]) for r in brute_force_topk(emb, k=K).collect()
    }
    approx = {(r["src"], r["dst"]) for r in ann_topk(emb, k=K).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall {recall:.2f}"


def test_ann_scores_match_exact_for_shared_pairs(spark, emb):
    exact = {
        (r["src"], r["dst"]): r["dot_q"] for r in brute_force_topk(emb, k=K).collect()
    }
    for r in ann_topk(emb, k=K).collect():
        key = (r["src"], r["dst"])
        if key in exact:
            assert r["dot_q"] == exact[key], key  # same quantized arithmetic


def test_ann_deterministic(spark, emb):
    a = sorted(map(tuple, ann_topk(emb, k=K).collect()))
    b = sorted(map(tuple, ann_topk(emb, k=K).collect()))
    assert a == b


def test_ann_candidate_volume_is_subquadratic(spark, emb):
    """With the auto (log2-scaled) parameters the LSH candidate set is
    GENUINELY subquadratic — <6*n^1.5, not merely <n^2/2 (the round-2
    bar, which a constant-factor reduction could pass). Measured
    4.2*n^1.5 at n=500 (planes=6, tables=12)."""
    from ariadne_spark.operators.ann import _bucket_udf, hyperplanes, lsh_params
    from pyspark.sql import functions as F

    n = emb.count()
    n_planes, n_tables = lsh_params(n)
    dim = len(emb.select("embedding").first()["embedding"])
    buckets = _bucket_udf(hyperplanes(dim, n_planes, n_tables))
    base = emb.select(
        "vec_id", F.posexplode(buckets(F.col("embedding"))).alias("t", "b")
    )
    a = base.select(F.col("vec_id").alias("src"), "t", "b")
    bb = base.select(F.col("vec_id").alias("dst"), "t", "b")
    cand = (
        a.join(bb, ["t", "b"]).where(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct().count()
    )
    assert cand < 6 * n**1.5, f"{cand} vs 6*n^1.5={6 * n**1.5:.0f}"


def test_param_choosers_scale_subquadratically():
    """Pure formula law: lsh_params keeps per-table buckets >= sqrt(n)
    (expected occupancy <= sqrt(n), so candidates/table <= n^1.5 under
    the uniform model) and ivf_params keeps n_probe/n_centroids *
    n^2 <= 5.5*n^1.5 — at EVERY corpus size, not just the fixture."""
    from ariadne_spark.operators.ann import ivf_params, lsh_params

    for n in (10**3, 10**6, 10**9, 10**12):
        n_planes, n_tables = lsh_params(n)
        assert 2**n_planes >= n**0.5, (n, n_planes)
        assert n_tables <= 4 * n_planes
        n_centroids, n_probe = ivf_params(n)
        assert n_probe / n_centroids * n**2 <= 5.5 * n**1.5, (n, n_centroids)


def test_exact_topk_matches_brute_force(spark, emb):
    """Distributed block-matmul == single-pass brute force, exactly
    (rows, scores, ranks) — the q21 scale path keeps exact semantics."""
    from ariadne_spark.operators.exact_sim import exact_topk

    a = sorted(
        (r["src"], r["dst"], r["dot_q"], r["rank"])
        for r in exact_topk(emb, k=K).collect()
    )
    b = sorted(
        (r["src"], r["dst"], r["dot_q"], r["rank"])
        for r in brute_force_topk(emb, k=K).collect()
    )
    assert a == b


def test_exact_topk_block_count_invariant(spark, emb):
    """Results are identical for any (p_blocks, c_blocks) — block ids
    are data-derived, so parallelism never changes the answer."""
    from ariadne_spark.operators.exact_sim import exact_topk

    a = sorted(map(tuple, exact_topk(emb, k=K, p_blocks=2, c_blocks=3).collect()))
    b = sorted(map(tuple, exact_topk(emb, k=K, p_blocks=8, c_blocks=8).collect()))
    assert a == b


def test_exact_neardup_pairs_once_each(spark, emb):
    """Every qualifying pair appears exactly once, oriented a<b, and
    matches a brute-force threshold filter."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.exact_sim import exact_neardup_pairs

    # low threshold so the fixture yields a non-trivial pair set (the
    # production 900k threshold matches nothing at sf0.01)
    THRESH = 200_000
    got = [(r["a"], r["b"], r["dot_q"]) for r in
           exact_neardup_pairs(emb, threshold=THRESH, p_blocks=3, c_blocks=2).collect()]
    assert len(got) > 0
    assert len(got) == len(set((a, b) for a, b, _ in got))
    assert all(a < b for a, b, _ in got)
    want = {
        (r["src"], r["dst"], r["dot_q"])
        for r in brute_force_topk(emb, k=10_000).where(
            (F.col("dot_q") >= THRESH) & (F.col("src") < F.col("dst"))
        ).collect()
    }
    assert set(got) == want


def test_ivf_recall_vs_brute_force(spark, emb):
    from ariadne_spark.operators.ann import ann_ivf

    exact = {(r["src"], r["dst"]) for r in brute_force_topk(emb, k=K).collect()}
    approx = {(r["src"], r["dst"]) for r in ann_ivf(emb, k=K).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_ivf_scores_exact_and_deterministic(spark, emb):
    from ariadne_spark.operators.ann import ann_ivf

    exact = {
        (r["src"], r["dst"]): r["dot_q"] for r in brute_force_topk(emb, k=K).collect()
    }
    a = sorted(map(tuple, ann_ivf(emb, k=K).collect()))
    b = sorted(map(tuple, ann_ivf(emb, k=K).collect()))
    assert a == b  # deterministic end-to-end (sampled centroids + int sums)
    for src, dst, dot_q, _ in a:
        if (src, dst) in exact:
            assert dot_q == exact[(src, dst)]


def test_ivf_candidate_volume_is_subquadratic(spark, emb):
    """With auto params (n_centroids ~ sqrt(2n)) the measured candidate
    volume is genuinely subquadratic — <6*n^1.5, not merely <n^2/2.
    Measured 5.1*n^1.5 at n=500 (31 centroids, probe 7)."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.ann import (
        _centroids,
        _ivf_assign_udf,
        _kmeans_refine,
        ivf_params,
    )

    n = emb.count()
    n_centroids, n_probe = ivf_params(n)
    cents = _kmeans_refine(emb, _centroids(emb, n_centroids), 2)
    assign = _ivf_assign_udf(cents, n_probe)
    assigned = emb.select("vec_id", assign(F.col("embedding")).alias("a"))
    q = assigned.select(F.explode("a.probe_cells").alias("cell"))
    c = assigned.select(F.col("a.own_cell").alias("cell"))
    per_cell_q = q.groupBy("cell").count().withColumnRenamed("count", "nq")
    per_cell_c = c.groupBy("cell").count().withColumnRenamed("count", "nc")
    cand = (
        per_cell_q.join(per_cell_c, "cell")
        .agg(F.sum(F.col("nq") * F.col("nc")))
        .first()[0]
    )
    assert cand < 6 * n**1.5, f"{cand} vs 6*n^1.5={6 * n**1.5:.0f}"
