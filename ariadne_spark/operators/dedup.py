"""Banded set-Jaccard near-dup pairs — the subquadratic scale path for
bitmask-set similarity (driver query q18's semantics).

Two-level plan:

1. **Mask-equivalence classes.** Docs with identical (group, mask) are
   interchangeable for set-Jaccard, so the similarity search runs over
   DISTINCT masks only — at most 2^26 representatives per group *no
   matter how many documents exist*. On natural text masks saturate
   (every English doc contains most letters), so distinct masks are
   few and this collapses the quadratic blowup the naive per-doc
   banding suffers.
2. **Pigeonhole banding over representatives.** Masks with
   floor(1000*|A∩B|/|A∪B|) >= 900 satisfy 10*|A∩B| >= 9*|A∪B|, so
   their symmetric difference is at most floor(26/10) = 2 bits. Split
   the 26 bits into 3 disjoint bands (9/9/8): <=2 differing bits
   cannot touch all 3 bands, so every qualifying mask pair shares at
   least one band verbatim — the equi-join on (group, band_id,
   band_bits) has 100% recall. Multi-band collisions are deduped
   zero-shuffle first-match (both masks ride the row, so "an earlier
   band matched too" is recomputable JVM-side — same trick as
   `operators/knn.py`).

Qualifying mask pairs then expand to id pairs via two equi-joins on
(group, mask); same-mask classes emit their internal pairs directly at
j1000 = 1000 (defined only for non-empty masks — empty-mask pairs have
0/0 Jaccard = NULL and are excluded, matching the all-pairs form).
Total cost: O(n) scan + O(distinct_masks^2 / bands) candidate checks +
O(answer) expansion — the expansion join is sized by the OUTPUT, which
is the information-theoretic floor.

Reference analog: candidate generation then exact re-check mirrors the
two-phase method-call resolution (receiver narrows candidates, member
lookup re-checks exactly — `packages/core/src/resolve_references/
call_resolution/method_call.ts:56-85`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# disjoint cover of bits 0..25: (shift, width)
BANDS = ((0, 9), (9, 9), (18, 8))
# ceil(26 * (1 - threshold/1000)) must stay <= len(BANDS)-1 for recall
MAX_DIFF_BITS = len(BANDS) - 1


def _band_bits(mask: F.Column, shift: int, width: int) -> F.Column:
    return F.shiftright(mask, shift).bitwiseAND(F.lit((1 << width) - 1))


def rep_candidate_pairs(masked: DataFrame, group_col: str, mask_col: str) -> DataFrame:
    """-> (grp, ma, mb) with ma < mb: distinct-mask candidate pairs from
    the banded self-join, first-match-band deduped (exposed separately
    so tests can gate candidate volume)."""
    reps = masked.select(
        F.col(group_col).alias("grp"), F.col(mask_col).alias("mask")
    ).distinct()
    exploded = reps.select(
        "grp",
        "mask",
        F.posexplode(
            F.array(*[_band_bits(F.col("mask"), s, w) for s, w in BANDS])
        ).alias("band", "bits"),
    )
    a = exploded.select("grp", F.col("mask").alias("ma"), "band", "bits")
    b = exploded.select("grp", F.col("mask").alias("mb"), "band", "bits")
    pairs = a.join(b, ["grp", "band", "bits"]).where(F.col("ma") < F.col("mb"))

    # first-match-band dedup: keep the pair only at its earliest
    # matching band (earlier bands must differ)
    first_match = F.lit(True)
    for i in range(len(BANDS)):
        earlier_differs = F.lit(True)
        for s2, w2 in BANDS[:i]:
            earlier_differs = earlier_differs & (
                _band_bits(F.col("ma"), s2, w2) != _band_bits(F.col("mb"), s2, w2)
            )
        first_match = F.when(F.col("band") == i, earlier_differs).otherwise(
            first_match
        )
    return pairs.where(first_match).select("grp", "ma", "mb")


def jaccard_neardup_banded(
    masked: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    mask_col: str = "mask",
    threshold_milli: int = 900,
) -> DataFrame:
    """-> (a, b, j1000) with a < b, same group, and
    floor(1000*|A∩B|/|A∪B|) >= threshold_milli.

    `masked` must carry (id_col, group_col, mask_col:long). Row set is
    identical to the all-pairs O(n^2) form whenever the threshold
    admits at most MAX_DIFF_BITS differing bits — asserted below for
    the 26-bit letter mask."""
    assert (26 * (1000 - threshold_milli)) // 1000 <= MAX_DIFF_BITS, (
        "threshold too low for 3-band exact recall"
    )
    ids = masked.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(mask_col).alias("mask"),
    )

    inter = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    union = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
    # integer DIV, not floor(double /): exact by construction at any
    # mask width (the double form was provably exact for 26-bit masks
    # but reopens the float-vs-integer-floor divergence class if reused
    # on wider signatures); DIV by the 0/0 empty-mask pair yields NULL,
    # matching the all-pairs oracle, and the where() drops it
    qual = (
        rep_candidate_pairs(masked, group_col, mask_col)
        .select(
            "grp",
            "ma",
            "mb",
            (inter * F.lit(1000)).alias("_i1000"),
            union.alias("_u"),
        )
        .select(
            "grp", "ma", "mb", F.expr("_i1000 DIV _u").cast("long").alias("j1000")
        )
        .where(F.col("j1000") >= threshold_milli)
    )
    # expand qualifying mask pairs to id pairs (cost == answer size)
    cross = (
        qual.join(
            ids.select(F.col("id").alias("ia"), "grp", F.col("mask").alias("ma")),
            ["grp", "ma"],
        )
        .join(
            ids.select(F.col("id").alias("ib"), "grp", F.col("mask").alias("mb")),
            ["grp", "mb"],
        )
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "j1000",
        )
    )
    # same-mask classes: every internal pair qualifies at j1000 = 1000
    # (non-empty masks only: 0/0 Jaccard is NULL in the all-pairs form)
    if threshold_milli <= 1000:
        same = (
            ids.where(F.col("mask") != 0)
            .select("grp", "mask", F.col("id").alias("ia"))
            .join(
                ids.select("grp", "mask", F.col("id").alias("ib")), ["grp", "mask"]
            )
            .where(F.col("ia") < F.col("ib"))
            .select(
                F.col("ia").alias("a"),
                F.col("ib").alias("b"),
                F.lit(1000).cast("long").alias("j1000"),
            )
        )
        cross = cross.unionByName(same)
    return cross


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
    return_rounds: bool = False,
):
    """-> (doc_id, cluster_id): connected components over near-dup
    pairs, cluster_id = min doc id in the component — the step between
    pair generation (q18/q37/q38, `jaccard_neardup_banded`) and
    canonical-document selection in a curation pipeline: transitive
    duplicates (A~B, B~C) must land in ONE cluster even when (A,C) was
    never emitted as a pair.

    Algorithm: alternating large-star/small-star contraction (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    O(log n) rounds on ANY topology, which matters at web scale because
    duplicate families from templated/boilerplate text are often
    chain-shaped: the round-3 min-label propagation needed O(component
    diameter) rounds (thousands of driver-loop iterations on a long
    path), while this converges on a 1000-node path in ~2·log2(n)
    rounds (pinned in tests/test_dedup.py). Each round:

    - large-star: every node links each LARGER neighbor to the minimum
      of its neighborhood (incl. itself) — long chains fold onto local
      minima in parallel;
    - small-star: every node links its smaller-or-equal neighbors and
      itself to the neighborhood minimum — stars flatten.

    Both steps preserve connectivity and never raise any node's
    reachable minimum; the fixpoint is the star set {(node, component
    min)}. Convergence is detected by an order-independent edge-set
    fingerprint (count + split xxhash64 sum — one tiny aggregate per
    round); non-convergence within `max_iters` raises rather than
    returning partial labels. Per-round cost: two edge-sized groupBy
    joins, shuffles bounded by |E| — never pairwise, no per-term/
    per-component concentration (each node's star is its own group).
    `localCheckpoint` truncates plan lineage per round — same pattern
    as `api.reach_counts`.

    Deterministic: min() is order-independent, so the labeling is
    identical at any parallelism or cluster size. Works on any
    orderable id type (long or string).

    `return_rounds=True` additionally returns the number of
    large+small rounds executed (for convergence tests).

    Reference analog: resolving transitive re-export chains to their
    origin definition — `packages/core/src/resolve_references/
    registries/export.ts:319+` (`resolve_export_chain` follows edges to
    a fixpoint and every alias maps to one canonical symbol).
    """
    # edge invariant throughout: stored once as (x, y) with y < x
    E = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("x"),
            F.least(F.col(a_col), F.col(b_col)).alias("y"),
        )
        .where(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint()
    )

    def _fingerprint(e: DataFrame) -> tuple:
        h = F.xxhash64("x", "y")
        # decimal(38,0) half-sums: plain long sums overflow (and throw
        # under Spark 4's default ANSI mode) past ~2^31 edges — the
        # regime the docstring claims; same fix as df_fingerprint /
        # store.partition_summary
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.shiftrightunsigned(h, 32).cast("decimal(38,0)")).alias("hi"),
            F.sum(h.bitwiseAND(F.lit(0xFFFFFFFF)).cast("decimal(38,0)")).alias("lo"),
        ).collect()[0]
        return (r["n"], int(r["hi"] or 0), int(r["lo"] or 0))

    prev = _fingerprint(E)
    rounds = 0
    converged = prev[0] == 0  # no edges: already the (empty) fixpoint
    while not converged and rounds < max_iters:
        # large-star: symmetric closure keyed by u; every neighbor
        # v > u re-links to m = min(Γ(u) ∪ {u}) (≤ u < v, so the
        # y < x invariant is preserved and no self-loop can appear)
        sym = E.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
            E.select(F.col("y").alias("u"), F.col("x").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        large = (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: keyed by the larger endpoint u; its smaller
        # neighbors N (all y of its edges) and u itself re-link to
        # m = min(N) (< u); drop the self-loop (m, m)
        mins2 = large.groupBy("x").agg(F.min("y").alias("m"))
        E = (
            large.join(mins2, "x")
            .where(F.col("y") != F.col("m"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
            .unionByName(mins2.select(F.col("x"), F.col("m").alias("y")))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        cur = _fingerprint(E)
        converged = cur == prev
        prev = cur
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} "
            "large-star/small-star rounds (expected ~2*log2(n))"
        )
    # fixpoint is a star set: non-roots appear exactly once as x
    # (pointing at the component min), roots only as y
    labels = (
        E.select(F.col("x").alias("doc_id"), F.col("y").alias("cluster_id"))
        .unionByName(
            E.select(F.col("y").alias("doc_id"), F.col("y").alias("cluster_id"))
        )
        .distinct()
    )
    return (labels, rounds) if return_rounds else labels


def canonicalize(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    prefer: list[tuple[str, bool]] | None = None,
) -> DataFrame:
    """Keep ONE representative row per dup cluster — the final stage of
    the dedup pipeline (pairs -> `dup_clusters` -> canonicalize). Rows
    absent from `clusters` are singletons and pass through untouched.

    prefer: [(column, ascending), ...] ranks rows WITHIN a cluster
    (e.g. [("quality", False)] keeps the highest-quality duplicate);
    `id_col` ascending is always appended as the final tie-break, so
    the choice is deterministic at any parallelism and cluster size.

    Cost: one left join on id (broadcastable when the dup set is small
    relative to the corpus, the common case) + one window partitioned
    by cluster — no pairwise work; singleton rows get their own id as
    cluster_id so the window never concentrates them on one key.

    Reference analog: collapsing an import alias chain onto its single
    canonical definition before emitting edges
    (`packages/core/src/resolve_references/registries/export.ts:319+`).
    """
    from pyspark.sql import Window

    order = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in (prefer or [])
    ] + [F.col(id_col).asc()]
    # the label joins under a private name so a df that ALREADY carries
    # a cluster_id column (the natural upstream: a frame annotated by
    # dup_clusters) never collides — joining the label in as
    # 'cluster_id' would make the coalesce below ambiguous and raise
    lab = df.join(
        clusters.select(
            F.col("doc_id").alias(id_col), F.col("cluster_id").alias("_cl")
        ),
        id_col,
        "left",
    ).withColumn("_cl", F.coalesce("_cl", F.col(id_col)))
    w = Window.partitionBy("_cl").orderBy(*order)
    return (
        lab.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "_cl")
    )


def delta_neardup(
    corpus_sigs: DataFrame,
    delta_sigs: DataFrame,
    bands: list[list[str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidate pairs for an INGEST BATCH against an already-
    indexed corpus — the continuous-ingestion form of banded LSH: a
    pipeline that re-banded the whole corpus per batch would pay
    O(corpus) every batch; this probes only the delta, so each batch
    costs O(|delta| + matched candidates) and the signature index is
    reused as-is.

    `corpus_sigs` / `delta_sigs`: (id, sig columns...); `bands` lists
    the signature-column groups (a pair is a candidate if ANY band's
    columns all match — e.g. [["mh0","mh1"],["mh2","mh3"]], the same
    banding as driver query q37). The two id sets must be disjoint.

    Emits exactly the pairs a FULL re-run would emit restricted to
    pairs touching a delta id (the equality the tests pin):
    delta x corpus and delta x delta, each once, `a < b`, under its
    FIRST matching band (earlier-band matches are recomputed JVM-side
    from the signature columns riding the row — the zero-extra-shuffle
    dedup of `operators/knn.py`).

    Scale shape: one equi-join per band with the DELTA on the probe
    side; the corpus side streams from its stored signature table
    (never re-derived from text), so candidate volume is bounded by
    the delta's band-bucket occupancy, independent of corpus size.
    Reference analog: the reference re-resolves only the references of
    a changed file against the persisted definition registry instead
    of re-indexing the project (`packages/core/src/project/
    project.ts:402-467`).
    """
    sig_cols = [c for c in corpus_sigs.columns if c != id_col]
    build = corpus_sigs.select(
        F.col(id_col).alias("a_id"),
        F.lit(False).alias("a_is_delta"),
        *[F.col(c).alias(f"a_{c}") for c in sig_cols],
    ).unionByName(
        delta_sigs.select(
            F.col(id_col).alias("a_id"),
            F.lit(True).alias("a_is_delta"),
            *[F.col(c).alias(f"a_{c}") for c in sig_cols],
        )
    )
    probe = delta_sigs.select(
        F.col(id_col).alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in sig_cols],
    )

    def band_eq(i: int):
        cond = F.lit(True)
        for c in bands[i]:
            cond = cond & (F.col(f"a_{c}") == F.col(f"b_{c}"))
        return cond

    out = None
    for i in range(len(bands)):
        earlier = F.lit(False)
        for j in range(i):
            earlier = earlier | band_eq(j)
        p = (
            build.join(probe, band_eq(i))
            # delta-delta pairs appear from both members' probes: keep
            # the orientation where the build side is the smaller id
            # (a corpus build side never collides — ids are disjoint)
            .where(
                (F.col("a_id") != F.col("b_id"))
                & (~F.col("a_is_delta") | (F.col("a_id") < F.col("b_id")))
                & ~earlier
            )
            .select(
                F.least(F.col("a_id"), F.col("b_id")).alias("a"),
                F.greatest(F.col("a_id"), F.col("b_id")).alias("b"),
                F.lit(i).alias("band"),
            )
        )
        out = p if out is None else out.unionByName(p)
    return out
