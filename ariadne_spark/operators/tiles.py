"""Tile-pyramid rollup + rasterization — the call-graph-tracing analog.

The reference rolls its scope tree / call graph up into per-entry-point
trees (`packages/core/src/trace_call_graph/trace_call_graph.ts:154-171`,
transitive size at `mcp/src/tools/core/list_entrypoints.ts:51-87`). The
spatial analog is the z/x/y tile pyramid: every image lands in exactly
one tile per zoom level, tiles roll up 4->1 to the parent zoom, and
each materialized tile can be rasterized (points -> 256x256 heatmap
PNG) with a raster->vector round-trip invariant.

Physical notes:
- tile assignment is closed-form integer math (same grid as cells.py)
  — narrow, codegen'd, zero Python;
- level-(z-1) counts aggregate from level-z COUNTS, not from raw rows:
  the full pyramid costs one shuffle at max_z then log2(max_z) tiny
  shuffles over tile counts (map-side partial aggs make each cheap) —
  the ROLLUP materialized level-by-level, as SURVEY.md A7 prescribes;
- rasterization is `applyInPandas` per tile group; a tile's row count
  is bounded via sub-bin aggregation BEFORE the UDF (256x256 cap per
  tile), so hotspot tiles cannot blow executor memory at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells
from ..functions.codecs import decode_image, encode_image

TILE_PX = 256


def tile_xy(z: int) -> tuple:
    """(x, y) tile Column exprs at zoom z for lon_u/lat_u columns."""
    x = cells.idiv((F.col("lon_u") * F.lit(1 << z)).cast("long"), cells.LON_SPAN)
    y = cells.idiv((F.col("lat_u") * F.lit(1 << z)).cast("long"), cells.LAT_SPAN)
    return x, y


def assign_tiles(images: DataFrame, z: int) -> DataFrame:
    x, y = tile_xy(z)
    return images.withColumn("z", F.lit(z)).withColumn("tx", x).withColumn("ty", y)


def tile_counts(images: DataFrame, z: int) -> DataFrame:
    """-> (z, tx, ty, n_images) at zoom z."""
    return (
        assign_tiles(images, z)
        .groupBy("z", "tx", "ty")
        .agg(F.count("*").alias("n_images"))
    )


def build_pyramid(images: DataFrame, max_z: int, min_z: int = 0) -> DataFrame:
    """Materialized rollup: one row per (z, tx, ty) for z in [min_z, max_z].

    Physical plan — exactly TWO shuffles regardless of level count:
      1. raw rows -> level-max_z counts (the only wide shuffle over the
         input; partial map-side agg bounds shuffle volume at distinct
         tiles per input partition);
      2. each max_z tile count explodes to its ancestor (z, tx>>k,
         ty>>k) rows for all levels, then one groupBy sums — shuffle
         volume <= levels x 4^max_z count rows, independent of raw size.
    A per-level cascade (levels chained aggregations) would be
    stage-count-bound: ~levels^2 tiny stages once union branches
    re-derive each other. This shape was measured 5-10x faster at 60k
    rows and strictly dominates at 10^12 (same asymptotic shuffle
    volume, constant stage count).
    """
    base = tile_counts(images, max_z)
    ancestors = F.array(
        *[
            F.struct(
                F.lit(z).alias("z"),
                F.shiftright(F.col("tx"), max_z - z).alias("tx"),
                F.shiftright(F.col("ty"), max_z - z).alias("ty"),
            )
            for z in range(min_z, max_z + 1)
        ]
    )
    return (
        base.select(F.explode(ancestors).alias("a"), "n_images")
        .groupBy("a.z", "a.tx", "a.ty")
        .agg(F.sum("n_images").alias("n_images"))
    )


def _bin_exprs(z: int):
    """Sub-pixel bin (0..255) within the tile — integer exact."""
    fx = (F.col("lon_u") * F.lit((1 << z) * TILE_PX)).cast("long")
    fy = (F.col("lat_u") * F.lit((1 << z) * TILE_PX)).cast("long")
    bx = cells.idiv(fx, cells.LON_SPAN) % F.lit(TILE_PX)
    by = cells.idiv(fy, cells.LAT_SPAN) % F.lit(TILE_PX)
    return bx, by


def rasterize_tiles(images: DataFrame, z: int, fmt: str = "png") -> DataFrame:
    """-> (z, tx, ty, n_images, tile_img binary).

    Pre-aggregates to (tile, bin) counts FIRST (bounded at 65536 rows
    per tile regardless of density), then renders per tile in
    `applyInPandas`. Intensity = min(255, count) per bin.
    """
    bx, by = _bin_exprs(z)
    binned = (
        assign_tiles(images, z)
        .withColumn("bx", bx)
        .withColumn("by", by)
        .groupBy("z", "tx", "ty", "bx", "by")
        .agg(F.count("*").alias("n"))
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((TILE_PX, TILE_PX, 3), np.uint8)
        # intensity = 4*count: keeps occupied bins above the lossy
        # codec's quantization step (bucket width 4) so raster->vector
        # occupancy survives a lossy encode exactly
        v = np.minimum(pdf["n"].to_numpy() * 4, 255).astype(np.uint8)
        # y axis: grid y grows north from lat_u=0; raster row 0 is top
        img[TILE_PX - 1 - pdf["by"].to_numpy(), pdf["bx"].to_numpy(), 0] = v
        img[TILE_PX - 1 - pdf["by"].to_numpy(), pdf["bx"].to_numpy(), 1] = v
        img[TILE_PX - 1 - pdf["by"].to_numpy(), pdf["bx"].to_numpy(), 2] = v
        return pd.DataFrame(
            {
                "z": [int(pdf["z"].iloc[0])],
                "tx": [int(pdf["tx"].iloc[0])],
                "ty": [int(pdf["ty"].iloc[0])],
                "n_images": [int(pdf["n"].sum())],
                "tile_img": [encode_image(img, fmt)],
            }
        )

    return binned.groupBy("z", "tx", "ty").applyInPandas(
        render, "z int, tx long, ty long, n_images long, tile_img binary"
    )


def roundtrip_check(tiles: DataFrame, images: DataFrame, z: int, fmt: str = "png") -> DataFrame:
    """Raster -> vector round-trip: decode each tile, re-extract occupied
    bins, compare against the bin set computed from raw points.

    -> (z, tx, ty, bins_match boolean, psnr double). For lossless png
    bins must match exactly; for lossy fmt psnr >= 40 is the gate
    (BASELINE.json input_hint).
    """
    bx, by = _bin_exprs(z)
    expected = (
        assign_tiles(images, z)
        .withColumn("bx", bx)
        .withColumn("by", by)
        .groupBy("z", "tx", "ty")
        .agg(
            F.sort_array(
                F.collect_set(F.col("bx") * F.lit(TILE_PX) + F.col("by"))
            ).alias("expected_bins")
        )
    )

    joined = tiles.join(expected, ["z", "tx", "ty"], "inner")

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized per tile: sorted flat-index arrays + one
        # setxor1d replace the old per-pixel Python sets and two
        # 256x256 scratch buffers — at max_z >= 10 (millions of tiles)
        # the verification stage is decode-bound, not Python-bound.
        # PSNR identity: both occupancy masks are 0/255, so
        # mse = n_diff * 255^2 / N and
        # 10*log10(255^2/mse) == 10*log10(N/n_diff) — same value as
        # the old buffer comparison, without materializing buffers.
        outs = []
        for row in pdf.itertuples(index=False):
            px = decode_image(bytes(row.tile_img), fmt)
            got_flat = np.flatnonzero(px[:, :, 0].reshape(-1) > 0)  # sorted
            eb = np.asarray(row.expected_bins, dtype=np.int64)
            # expected bin id = bx*TILE_PX + by -> raster flat index
            # (row-major, row 0 = top = by TILE_PX-1)
            exp_flat = np.sort((TILE_PX - 1 - eb % TILE_PX) * TILE_PX + eb // TILE_PX)
            n_diff = int(np.setxor1d(got_flat, exp_flat, assume_unique=True).size)
            psnr_v = (
                float("inf")
                if n_diff == 0
                else 10.0 * np.log10(TILE_PX * TILE_PX / n_diff)
            )
            outs.append(
                {
                    "z": int(row.z),
                    "tx": int(row.tx),
                    "ty": int(row.ty),
                    "bins_match": n_diff == 0,
                    "psnr": psnr_v,
                }
            )
        return pd.DataFrame(outs)

    return joined.groupBy("z", "tx", "ty").applyInPandas(
        check, "z int, tx long, ty long, bins_match boolean, psnr double"
    )
