"""PQ tests: codebook training determinism (bit-exact across
parallelism — the integer partial-sum contract), encode validity,
ADC recall vs the exact baseline on clustered data, and the
compression shape (m ints per row)."""

from __future__ import annotations

import numpy as np
import pytest

from ariadne_spark.operators.ann import brute_force_topk
from ariadne_spark.operators.pq import pq_encode, pq_topk, pq_train

N_CLUSTERS = 8
PER_CLUSTER = 40
DIM = 16
M = 4


def _clustered() -> list[tuple[int, list[float]]]:
    """Deterministic cluster mixture: 8 well-separated unit centers,
    40 members each with small within-cluster spread — the shape PQ
    codebooks are built for (real embedding corpora are clustered)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci in range(N_CLUSTERS):
        pts = centers[ci] + rng.normal(size=(PER_CLUSTER, DIM)) * 0.25
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for j in range(PER_CLUSTER):
            rows.append((ci * 1000 + j, pts[j].astype(np.float32).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _clustered(), "vec_id long, embedding array<float>"
    ).persist()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=M, k=64, iters=2)


def test_train_shape_and_parallelism_invariance(spark, emb, books):
    assert books.shape == (M, 64, DIM // M)
    again = pq_train(emb.repartition(7), m=M, k=64, iters=2)
    assert np.array_equal(books, again)  # bit-exact, not just close


def test_encode_codes_valid_and_deterministic(spark, emb, books):
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == N_CLUSTERS * PER_CLUSTER
    for r in rows:
        assert len(r["codes"]) == M
        assert all(0 <= c < 64 for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb.repartition(5), books).collect()}
    assert {r["vec_id"]: r["codes"] for r in rows} == again


def test_adc_recall_at_10(spark, emb, books):
    """The PQ paper's own metric (recall@R): the EXACT top-1 neighbor
    appears in the ADC top-10. Quantization can shuffle near-tied
    within-cluster ranks (that is the accepted distortion), but the
    true nearest neighbor must stay near the top of the ADC ordering.
    Floor pins the measured value (numpy sim: 0.93 on this fixture)."""
    exact1 = {
        r["src"]: r["dst"] for r in brute_force_topk(emb, k=1).collect()
    }
    codes = pq_encode(emb, books)
    top10 = {}
    for r in pq_topk(emb, codes, books, k=10).collect():
        top10.setdefault(r["src"], set()).add(r["dst"])
    hits = sum(1 for s, d in exact1.items() if d in top10.get(s, set()))
    recall = hits / len(exact1)
    assert recall >= 0.85, f"recall@10 {recall:.3f}"


def test_adc_cluster_containment(spark, emb, books):
    """Coarse structure survives quantization: ADC top-3 neighbors
    come from the query's own cluster (ids share the //1000 prefix)
    at >= 0.9 — the property a curation pipeline relies on when it
    groups by PQ neighborhoods."""
    codes = pq_encode(emb, books)
    got = [
        (r["src"], r["dst"]) for r in pq_topk(emb, codes, books, k=3).collect()
    ]
    same = sum(1 for s, d in got if s // 1000 == d // 1000)
    assert same / len(got) >= 0.9, f"cluster containment {same / len(got):.3f}"


def test_compression_shape(spark, emb, books):
    """The scale claim: m ints per row replaces dim floats (the
    physical schema carries array<int> of length m — 4 codes vs 16
    floats here, 32x at dim=32/m=4 with byte-packed storage)."""
    codes = pq_encode(emb, books)
    assert dict(codes.dtypes)["codes"] == "array<int>"
    assert codes.selectExpr("max(size(codes)) AS s").first()["s"] == M


def test_ivf_pq_recall_and_determinism(spark, emb):
    """The joint IVF-PQ shape: candidate pruning (cells) composed with
    ADC scoring (codes). Recall@10 of the exact top-1 on the clustered
    fixture, and bit-identical output across parallelism."""
    from ariadne_spark.operators.pq import ivf_pq_topk

    exact1 = {
        r["src"]: r["dst"] for r in brute_force_topk(emb, k=1).collect()
    }
    out = ivf_pq_topk(emb, k=10, m=M, k_codes=64, n_centroids=16, n_probe=4)
    top10 = {}
    for r in out.collect():
        top10.setdefault(r["src"], set()).add(r["dst"])
    hits = sum(1 for s, d in exact1.items() if d in top10.get(s, set()))
    recall = hits / len(exact1)
    assert recall >= 0.8, f"ivf-pq recall@10 {recall:.3f}"

    again = ivf_pq_topk(
        emb.repartition(9), k=10, m=M, k_codes=64, n_centroids=16, n_probe=4
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_ivf_pq_candidates_are_cell_bounded(spark, emb):
    """No cross-join shape anywhere: the candidate join is an equi-join
    on the coarse cell (CartesianProduct appears only in pq_topk's
    deliberate full-ADC-scan form)."""
    from ariadne_spark.operators.pq import ivf_pq_topk

    plan = (
        ivf_pq_topk(emb, k=3, m=M, k_codes=64, n_centroids=16, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_ivf_pq_rerank_exact_scores(spark, emb):
    """rerank=True: surviving pairs carry the EXACT q21-scale dot_q —
    every returned (src, dst, dot_q) matches the brute-force score,
    and top-1 agreement with exact search is near-total (re-ranking
    restores exact order among the ADC survivors)."""
    from ariadne_spark.operators.pq import ivf_pq_topk

    out = ivf_pq_topk(
        emb, k=3, m=M, k_codes=64, n_centroids=16, n_probe=4, rerank=True
    ).collect()
    assert {r["dot_q"] is not None for r in out} == {True}
    exact = {
        (r["src"], r["dst"]): r["dot_q"]
        for r in brute_force_topk(emb, k=PER_CLUSTER).collect()
    }
    for r in out:
        key = (r["src"], r["dst"])
        if key in exact:  # brute force truncated at k=PER_CLUSTER
            assert exact[key] == r["dot_q"], key
    top1 = {r["src"]: r["dst"] for r in out if r["rank"] == 1}
    exact1 = {r["src"]: r["dst"] for r in brute_force_topk(emb, k=1).collect()}
    agree = sum(1 for s, d in exact1.items() if top1.get(s) == d) / len(exact1)
    assert agree >= 0.85, f"top-1 agreement {agree:.3f}"


def test_custom_column_names(spark, emb):
    """vec_col/id_col are honored through _centroids/_kmeans_refine:
    renamed inputs must train identical codebooks and rank identical
    top-k."""
    from ariadne_spark.operators.pq import ivf_pq_topk

    renamed = emb.withColumnRenamed("vec_id", "doc_id").withColumnRenamed(
        "embedding", "emb"
    )
    b1 = pq_train(emb, m=4, k=16, iters=1)
    b2 = pq_train(renamed, m=4, k=16, iters=1, vec_col="emb", id_col="doc_id")
    np.testing.assert_array_equal(b1, b2)
    t1 = {
        (r["src"], r["dst"], r["rank"])
        for r in ivf_pq_topk(
            emb, k=2, n_centroids=8, n_probe=2, books=b1
        ).collect()
    }
    t2 = {
        (r["src"], r["dst"], r["rank"])
        for r in ivf_pq_topk(
            renamed, k=2, n_centroids=8, n_probe=2, books=b2,
            vec_col="emb", id_col="doc_id",
        ).collect()
    }
    assert t1 == t2 and len(t1) > 0


def test_q_round_half_up_matches_spark_round(spark):
    """The numpy quantizer used by ANN/PQ/SemDeDup kernels must agree
    with F.round (HALF_UP, away from zero) AT THE .5 BOUNDARY, where
    np.round (banker's half-to-even) diverges."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.ann import q_round

    vals = [0.0625, -0.0625, 0.0615, -0.0615, 0.5114999999, 1.0, -1.0, 0.0]
    got = q_round(np.array(vals), 1000)
    expected = [
        r["q"]
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round(F.col("v") * 1000).cast("long").alias("q"))
        .collect()
    ]
    assert got.tolist() == expected
    # np.round would get the first two wrong (62, -62)
    assert got[0] == 63 and got[1] == -63
