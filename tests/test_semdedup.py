"""SemDeDup tests: within-cluster exactness (precision 1.0 vs the
exact all-pairs oracle — identical quantized-int arithmetic), recall
on planted near-dup pairs, one-representative-per-component keep
semantics, and cross-parallelism determinism."""

from __future__ import annotations

import numpy as np
import pytest

from ariadne_spark.operators.exact_sim import exact_neardup_pairs
from ariadne_spark.operators.semdedup import semdedup, semdedup_pairs

THRESH = 850_000  # quantized ~cos 0.85 (x1e3 per side)
N_BASE = 120
N_DUP = 40  # base vectors that get a planted near-copy
DIM = 24


def _planted() -> list[tuple[int, list[float]]]:
    """Deterministic unit vectors + near-copies of the first N_DUP.
    Base vectors are far apart in 24-d (max base-base quantized dot
    628k < THRESH at this seed — asserted via the oracle fixture);
    copies are tiny perturbations (cos > 0.99 with their base)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(N_BASE)]
    for i in range(N_DUP):
        v = base[i] + rng.normal(size=DIM) * 0.02
        v /= np.linalg.norm(v)
        rows.append((1000 + i, v.astype(np.float32).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _planted(), "vec_id long, embedding array<float>"
    ).persist()


@pytest.fixture(scope="module")
def exact_pairs(emb):
    return {
        (r["a"], r["b"]) for r in exact_neardup_pairs(emb, THRESH).collect()
    }


def test_precision_is_exact(spark, emb, exact_pairs):
    got = {(r["a"], r["b"]) for r in semdedup_pairs(emb, THRESH).collect()}
    assert got <= exact_pairs, f"false pairs: {sorted(got - exact_pairs)[:5]}"


def test_recall_on_planted_pairs(spark, emb, exact_pairs):
    got = {(r["a"], r["b"]) for r in semdedup_pairs(emb, THRESH).collect()}
    planted = {(i, 1000 + i) for i in range(N_DUP)}
    assert planted <= exact_pairs  # sanity: the oracle sees every plant
    # sanity: no coincidental base-base pairs — every exact pair
    # involves a planted copy, so "all bases kept" below is sound
    assert all(b >= 1000 for _a, b in exact_pairs)
    recall = len(got & planted) / len(planted)
    # cross-cluster misses are SemDeDup's documented approximation;
    # with sqrt(n) centroids on well-separated plants recall stays high
    assert recall >= 0.9, f"recall {recall:.2f}"


def test_keep_semantics(spark, emb):
    out = semdedup(emb, THRESH)
    rows = out.collect()
    assert len(rows) == N_BASE + N_DUP  # every input row labeled
    # exactly one keeper per component, and it is the min member id
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["dup_cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["keep"] == 1]
        assert len(keepers) == 1, f"cluster {cid}"
        assert keepers[0]["vec_id"] == min(m["vec_id"] for m in members) == cid
    # bases always outrank their planted copies (1000+i > i)
    kept = {r["vec_id"] for r in rows if r["keep"] == 1}
    assert set(range(N_BASE)) <= kept


def test_parallelism_invariance(spark, emb):
    a = sorted(map(tuple, semdedup(emb.repartition(1), THRESH).collect()))
    b = sorted(map(tuple, semdedup(emb.repartition(13), THRESH).collect()))
    assert a == b


def test_no_global_allpairs_plan(spark, emb):
    """The pair stage groups by k-means cell — the physical plan must
    contain no cartesian/nested-loop join (the global all-pairs shape
    lives only in the exact_sim oracle)."""
    plan = semdedup_pairs(emb, THRESH)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_custom_column_names(spark, emb):
    """id_col/vec_col are honored all the way through the shared ann
    helpers (which key on vec_id/embedding internally) — renamed input
    columns must give the identical pair set."""
    renamed = emb.withColumnRenamed("vec_id", "doc_id").withColumnRenamed(
        "embedding", "emb"
    )
    a = {
        (r["a"], r["b"], r["dot_q"])
        for r in semdedup_pairs(emb, THRESH).collect()
    }
    b = {
        (r["a"], r["b"], r["dot_q"])
        for r in semdedup_pairs(
            renamed, THRESH, id_col="doc_id", vec_col="emb"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_blocked_pair_scoring_equals_single_block(spark, monkeypatch):
    """The memory-capped blocked scorer must return the identical pair
    set as one full-matrix pass — forced multi-block via tiny block
    knobs (the giant-cluster path the 24M stress identified as the
    RSS hazard)."""
    import numpy as np
    import pandas as pd

    from ariadne_spark.operators import semdedup as S

    rng = np.random.default_rng(9)
    n = 150
    pdf = pd.DataFrame({
        "vec_id": rng.permutation(1000)[:n].astype(np.int64),
        "embedding": [rng.normal(0, 0.3, 8).tolist() for _ in range(n)],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")

    def pairs():
        # single cluster: one centroid so every row lands together
        out = S.semdedup_pairs(df, threshold_q=200_000, n_centroids=2,
                               kmeans_iters=0)
        return {(r["a"], r["b"], r["dot_q"]) for r in out.collect()}

    base = pairs()
    assert base, "fixture should produce some near pairs"
    monkeypatch.setattr(S, "_PAIR_BLOCK_ELEMS", 64)
    monkeypatch.setattr(S, "_PAIR_BLOCK_MIN_ROWS", 16)
    assert pairs() == base
