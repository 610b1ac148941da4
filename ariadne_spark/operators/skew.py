"""Skew handling: data-decided salting + adaptive resolution split.

The reference never faces skew (files are uniformly small); the north
rule makes it first-class: "skew from dense cells (urban hotspots) is
handled by explicit salting + adaptive repartition on H3 resolution
split". Both decisions are DATA-derived and deterministic (identical at
any parallelism or cluster size), and since round 4 both are computed
IN-PLAN: the only thing the driver ever receives is one scalar (the
salt factor) — no histogram collect at any resolution, so there is no
driver-size dependency however fine the split (the round-3 version
collected the floor histogram and was clamped at res 10 for that
reason; the clamp is gone).

Two tools:

- `choose_salt_distributed` (and the dict-based `choose_salt` twin for
  tests/inspection): pick the salt factor S so the largest (cell)
  bucket splits to <= `target_rows` rows — the explicit version of
  AQE's skew-join split, applied BEFORE the shuffle so the kNN
  candidate join key becomes (band, cell, salt). The max-bucket count
  is one hash aggregation; exactly ONE scalar row reaches the driver.
- `adaptive_split`: assign each row a `split_cell` at `base_res`, or at
  progressively finer resolutions for cells whose every coarser
  ancestor's population exceeds `threshold` — the H3-resolution-split
  analog of ariadne attaching deep scopes only where code actually
  nests. The result is a partition key whose per-key cardinality is
  bounded above by ~threshold (except at `max_res`, the floor), so
  `repartition` on it yields balanced partitions no matter how hot the
  hotspots are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cells


def cell_histogram(images: DataFrame, res: int) -> dict[int, int]:
    """cell id -> row count at resolution `res`, collected to a python
    dict — an INSPECTION/TEST helper (bounded by 4^res rows). Planner
    decisions use `choose_salt_distributed` / `adaptive_split`, which
    never collect a histogram."""
    rows = (
        images.select(
            cells.cell_encode(F.col("lon_u"), F.col("lat_u"), res).alias("cell")
        )
        .groupBy("cell")
        .count()
        .collect()
    )
    return {int(r["cell"]): int(r["count"]) for r in rows}


def choose_salt(hist: dict[int, int], target_rows: int = 100_000) -> int:
    """Smallest salt factor bounding the largest bucket at target_rows
    (pure function over a dict — the python twin of
    `choose_salt_distributed`, kept for tests and offline inspection)."""
    if not hist:
        return 1
    worst = max(hist.values())
    return max(1, -(-worst // target_rows))  # ceil div


def choose_salt_distributed(
    images: DataFrame, res: int, target_rows: int = 100_000
) -> int:
    """Salt factor decided IN-PLAN: the per-cell max bucket count is a
    two-level hash aggregation (map-side partial combine, then a global
    max), and exactly ONE scalar row reaches the driver — no histogram
    collect, so the decision has no driver-size dependency at any
    resolution or row count. Deterministic: max() over data only."""
    row = (
        images.groupBy(
            cells.cell_encode(F.col("lon_u"), F.col("lat_u"), res).alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("worst"))
        .collect()[0]
    )
    worst = int(row["worst"] or 0)
    return max(1, -(-worst // target_rows))  # ceil div


def _floor_cell_ancestor(c: Column, floor_res: int, res: int) -> Column:
    """Ancestor of a floor-resolution cell id at `res` — closed-form
    column math (cells.cell_parent specialised to a constant step)."""
    return cells.cell_parent(c, floor_res - res)


def adaptive_split(
    images: DataFrame,
    base_res: int,
    max_res: int,
    threshold: int,
    hist_col: str = "split_cell",
) -> DataFrame:
    """Add `split_cell`: the row's cell at base_res, refined to child
    resolutions wherever every coarser ancestor's population exceeds
    `threshold`. Per-key cardinality is thus bounded at ~threshold
    everywhere except refinement-floor cells, so a
    `repartition(hist_col)` is balanced no matter how hot the hotspots.

    Physical shape (all distributed — nothing but job scheduling
    touches the driver): ONE aggregation of the input to the occupied
    floor-resolution cells (shuffle volume = distinct occupied cells,
    partial-agg'd map-side; `localCheckpoint` so the per-level rollups
    below never rescan the input), then per level base_res..max_res-1
    a rollup aggregate + a broadcast-sized join building the DENSE
    chain (cells over threshold whose every coarser ancestor is also
    dense), a flag join assigning each floor cell its stop resolution,
    and finally ONE equi-join of the input against the (floor cell ->
    split_cell) mapping. The level count is max_res - base_res — a
    static plan, never data-dependent driver control flow. The round-3
    version collected the floor histogram to the driver (clamped at
    res 10 to bound the collect) and compiled the dense sets into
    literal isin() lists — a plan-size liability at 10^5+ dense cells;
    both limits are gone: max_res=14 works with no driver-size
    dependency (pinned in tests/test_skew.py).

    Deterministic: depends only on the data, never on partitioning —
    required for cross-cluster-size result equality.
    """
    assert max_res >= base_res
    # overwrite semantics on re-runs (e.g. re-tuning threshold on an
    # already-split frame): the base_res==max_res path's withColumn
    # REPLACES an existing hist_col, so the refinement path must too —
    # without this drop, the final join would append a second column of
    # the same name and any later F.col(hist_col) raises
    # AMBIGUOUS_REFERENCE. drop() on an absent column is a no-op.
    images = images.drop(hist_col)
    if max_res == base_res:
        return images.withColumn(
            hist_col, cells.cell_encode(F.col("lon_u"), F.col("lat_u"), base_res)
        )
    floor_res = max_res
    # occupied floor cells + counts, materialized ONCE (distributed)
    flo = (
        images.groupBy(
            cells.cell_encode(F.col("lon_u"), F.col("lat_u"), floor_res).alias("c")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )

    remaining = flo.select("c")
    assigned: DataFrame | None = None
    dense_prev: DataFrame | None = None  # (cell) frame at res-1
    for res in range(base_res, floor_res):
        cnt_r = (
            flo.groupBy(_floor_cell_ancestor(F.col("c"), floor_res, res).alias("cell"))
            .agg(F.sum("n").alias("cnt"))
        )
        dense_r = cnt_r.where(F.col("cnt") > threshold).select("cell")
        if dense_prev is not None:
            # chain rule: dense at res requires the res-1 ancestor dense
            dense_r = dense_r.join(
                F.broadcast(
                    dense_prev.select(F.col("cell").alias("__p"))
                ),
                cells.cell_parent(F.col("cell"), 1) == F.col("__p"),
                "left_semi",
            )
        anc = _floor_cell_ancestor(F.col("c"), floor_res, res).alias("__a")
        flagged = remaining.select("c", anc).join(
            F.broadcast(
                dense_r.select(F.col("cell").alias("__a"), F.lit(1).alias("__d"))
            ),
            "__a",
            "left",
        )
        stop = flagged.where(F.col("__d").isNull()).select(
            "c", F.col("__a").alias(hist_col)
        )
        assigned = stop if assigned is None else assigned.unionByName(stop)
        remaining = flagged.where(F.col("__d").isNotNull()).select("c")
        dense_prev = dense_r
    # floor cells whose whole ancestor chain is dense keep floor grain
    mapping = assigned.unionByName(
        remaining.select("c", F.col("c").alias(hist_col))
    )
    # no broadcast hint: the mapping has one row per occupied floor
    # cell (worst case ~n at a fine floor), so AQE must stay free to
    # pick shuffle-hash when it outgrows the broadcast threshold; the
    # dense frames above are bounded by n/threshold and DO broadcast
    key = cells.cell_encode(F.col("lon_u"), F.col("lat_u"), floor_res)
    # LEFT join: every occupied floor cell is in the mapping, so the
    # join is 1:1 for geocoded rows — but a NULL lon_u/lat_u row has a
    # NULL key and an inner join would silently DROP it, making the
    # operator row-count-changing. Left keeps it with a NULL
    # split_cell, matching the base_res==max_res projection path.
    return (
        images.withColumn("__c", key)
        .join(mapping.withColumnRenamed("c", "__c"), "__c", "left")
        .drop("__c")
    )


def split_histogram(images_split: DataFrame, hist_col: str = "split_cell") -> DataFrame:
    """(res, split_cell, n) — inspection/verification helper."""
    return (
        images_split.groupBy(hist_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.shiftright(F.col(hist_col), cells.RES_SHIFT).alias("res"),
            F.col(hist_col),
            "n",
        )
    )
