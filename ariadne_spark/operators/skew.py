"""Skew handling: histogram-driven salting + adaptive resolution split.

The reference never faces skew (files are uniformly small); the north
rule makes it first-class: "skew from dense cells (urban hotspots) is
handled by explicit salting + adaptive repartition on H3 resolution
split". Both decisions are driver-side Python over a collected cell
histogram — deliberately mirroring how ariadne picks strategies in code
rather than via an optimizer (SURVEY.md §4.2): the histogram is tiny
(≤ 4^res rows), the decision is deterministic, and determinism is what
keeps results reproducible across cluster sizes.

Two tools:

- `cell_histogram` / `choose_salt`: pick the salt factor S so the
  largest (cell) bucket splits to ≤ `target_rows` rows — the explicit
  version of AQE's skew-join split, applied BEFORE the shuffle so the
  kNN candidate join key becomes (band, cell, salt).
- `adaptive_split`: assign each row a `split_cell` at `base_res`, or at
  progressively finer resolutions for cells whose population exceeds
  `threshold` — the H3-resolution-split analog of ariadne attaching
  deep scopes only where code actually nests. The result is a
  partition key whose per-key cardinality is bounded above by
  ~threshold (except at `max_res`, the floor), so `repartition` on it
  yields balanced partitions no matter how hot the hotspots are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cells


def cell_histogram(images: DataFrame, res: int) -> dict[int, int]:
    """cell id -> row count at resolution `res` (collected; ≤ 4^res)."""
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
    """Smallest salt factor bounding the largest bucket at target_rows."""
    if not hist:
        return 1
    worst = max(hist.values())
    return max(1, -(-worst // target_rows))  # ceil div


# the refinement histogram is collected driver-side; its row count is
# the occupied-cell count at the aggregation resolution (<= 4^res, so
# res 12 could mean 16M rows to the driver). Clamp that resolution —
# the `knn.py` res>10 collect guard's analog — so the collect stays
# bounded at ~1M cells worst case. Hotspots still denser than
# `threshold` at the clamped floor are bounded by composing with
# `choose_salt` (split to the floor, salt the remaining hot keys).
HIST_RES_CAP = 10


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

    Physical shape: ONE aggregation of the input at the refinement
    floor (shuffle volume = distinct occupied cells, partial-agg'd
    map-side), pulled to the driver, rolled up level-by-level in numpy;
    the row assignment is then a single chained-when projection against
    the (small) dense sets — no per-level rescans of the input. The
    floor is min(max_res, HIST_RES_CAP): the driver collect is bounded
    AUTOMATICALLY at ~4^10 rows however fine a split is requested
    (requests beyond the cap refine to the cap; compose with
    `choose_salt` to bound any cells still hot there).

    Deterministic: depends only on the data, never on partitioning —
    required for cross-cluster-size result equality.
    """
    assert max_res >= base_res
    import numpy as np

    floor_res = min(max_res, max(base_res, HIST_RES_CAP))
    pdf = (
        images.groupBy(
            cells.cell_encode(F.col("lon_u"), F.col("lat_u"), floor_res).alias("c")
        )
        .count()
        .toPandas()
    )
    c = pdf["c"].to_numpy(dtype=np.int64)
    n = pdf["count"].to_numpy(dtype=np.int64)
    x = (c >> cells.X_SHIFT) & cells.XY_MASK
    y = c & cells.XY_MASK

    dense_sets: dict[int, np.ndarray] = {}
    alive = np.ones(len(c), dtype=bool)
    for res in range(base_res, floor_res):
        shift = floor_res - res
        anc = (
            (np.int64(res) << cells.RES_SHIFT)
            | ((x >> shift) << cells.X_SHIFT)
            | (y >> shift)
        )
        uniq, inv = np.unique(anc[alive], return_inverse=True)
        counts = np.bincount(inv, weights=n[alive]).astype(np.int64)
        dense = uniq[counts > threshold]
        if len(dense) == 0:
            break
        dense_sets[res] = dense
        alive &= np.isin(anc, dense)

    expr = cells.cell_encode(F.col("lon_u"), F.col("lat_u"), floor_res)
    for res in sorted(dense_sets, reverse=True):
        anc_col = cells.cell_encode(F.col("lon_u"), F.col("lat_u"), res)
        expr = F.when(~anc_col.isin(*[int(v) for v in dense_sets[res]]), anc_col).otherwise(
            expr
        )
    if not dense_sets:
        expr = cells.cell_encode(F.col("lon_u"), F.col("lat_u"), base_res)
    return images.withColumn(hist_col, expr)


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
