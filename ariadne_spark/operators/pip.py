"""Point-in-polygon join with deepest-region-wins semantics.

This is the engine's central join — the analog of ariadne's
`get_scope_id` containment lookup: find the deepest scope whose
location contains a capture's location, error on a depth tie
(`packages/core/src/index_single_file/scopes/scopes.ts:275-303`,
tie-error at `:293-299`).

Physical strategy (explicit, per join cardinality): the region table is
small relative to the image table (like scopes per file), so it is
**broadcast** as a driver-built cell-bucketed envelope index — each
region is registered under every coarse grid cell its envelope touches.
Executors probe the index per Arrow batch inside `mapInPandas`:
group points by coarse cell, vectorized ray-cast against only that
cell's candidate polygons. No shuffle at all on the image side — the
join is narrow (scan -> mapInPandas), which is the plan you want at
10^12 rows: cost is O(points x candidates-in-cell), and candidate
lists stay tiny because the envelope index prunes by locality.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions import cells
from ..functions.geometry import envelope, parse_wkt, points_in_polygon

DEFAULT_INDEX_RES = 6

PIP_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("region_id", StringType()),
        StructField("depth", IntegerType()),
    ]
)


class RegionIndex:
    """Cell-bucketed envelope index over region polygons (broadcast side).

    The analog of ariadne's eagerly-maintained registry hash indexes
    (`packages/core/src/resolve_references/registries/definition.ts:26-90`):
    built once on the driver, probed O(1)-ish per point batch.
    """

    def __init__(self, regions: list[dict], index_res: int = DEFAULT_INDEX_RES):
        self.index_res = index_res
        self.polys: list[np.ndarray] = []
        self.envs: list[tuple[float, float, float, float]] = []
        self.region_ids: list[str] = []
        self.depths: list[int] = []
        self.by_cell: dict[int, list[int]] = defaultdict(list)
        n = 1 << index_res
        for r in regions:
            idx = len(self.polys)
            poly = parse_wkt(r["wkt"])
            self.polys.append(poly)
            env = envelope(poly)
            self.envs.append(env)
            self.region_ids.append(r["region_id"])
            self.depths.append(int(r["depth"]))
            # polygons must live inside the lon_u domain [0, LON_SPAN]:
            # probe points never wrap across the lon=0 seam, so a
            # seam-crossing polygon (negative or >span vertices) would
            # register under wrapped cells its ray-cast can never match
            # — refuse loudly instead of silently losing containment
            # rows (split such a polygon at the seam upstream)
            assert 0.0 <= env[0] and env[2] <= cells.LON_SPAN, (
                f"region {r['region_id']} envelope x=[{env[0]}, {env[2]}] "
                f"outside the lon_u domain [0, {cells.LON_SPAN}]: "
                "antimeridian-crossing polygons must be pre-split at "
                "the seam"
            )
            x0 = int(env[0] * n // cells.LON_SPAN)
            x1 = int(env[2] * n // cells.LON_SPAN)
            y0 = int(env[1] * n // cells.LAT_SPAN)
            y1 = int(env[3] * n // cells.LAT_SPAN)
            for cx in range(max(x0, 0), min(x1, n - 1) + 1):
                for cy in range(max(y0, 0), min(y1, n - 1) + 1):
                    cell = (index_res << cells.RES_SHIFT) | (cx << cells.X_SHIFT) | cy
                    self.by_cell[cell].append(idx)
        self.by_cell = dict(self.by_cell)

    def probe_batch(
        self,
        image_ids: np.ndarray,
        lon_u: np.ndarray,
        lat_u: np.ndarray,
        cell: np.ndarray,
        deepest_only: bool = False,
    ) -> pd.DataFrame:
        """Containment rows for a batch.

        Key locality fact: every region containing point p is registered
        under p's coarse cell (the region's envelope covers p's cell), so
        p's ENTIRE containment chain is discovered inside this one batch.
        That lets deepest-wins + tie-error run batch-locally — the whole
        PIP join is a narrow plan (scan -> mapInPandas), zero shuffles.
        """
        out_img: list[np.ndarray] = []
        out_reg: list[str] = []
        out_dep: list[int] = []
        px = lon_u.astype(np.float64)
        py = lat_u.astype(np.float64)
        for c in np.unique(cell):
            cand = self.by_cell.get(int(c))
            if not cand:
                continue
            mask = cell == c
            bx, by, bi = px[mask], py[mask], image_ids[mask]
            for ridx in cand:
                e = self.envs[ridx]
                near = (bx >= e[0]) & (bx <= e[2]) & (by >= e[1]) & (by <= e[3])
                if not near.any():
                    continue
                inside = points_in_polygon(bx[near], by[near], self.polys[ridx])
                hit_ids = bi[near][inside]
                if len(hit_ids):
                    out_img.append(hit_ids)
                    out_reg.extend([self.region_ids[ridx]] * len(hit_ids))
                    out_dep.extend([self.depths[ridx]] * len(hit_ids))
        if not out_img:
            return pd.DataFrame({"image_id": [], "region_id": [], "depth": []}).astype(
                {"image_id": "object", "region_id": "object", "depth": "int32"}
            )
        out = pd.DataFrame(
            {
                "image_id": np.concatenate(out_img),
                "region_id": np.array(out_reg, dtype=object),
                "depth": np.array(out_dep, dtype=np.int32),
            }
        )
        if not deepest_only:
            return out
        # deepest-wins with tie-error, batch-local (see docstring):
        # sort by (image_id, -depth, region_id); first row per image wins;
        # a second row at equal max depth is ambiguous containment.
        order = np.lexsort(
            (out["region_id"].to_numpy(), -out["depth"].to_numpy(), out["image_id"].to_numpy())
        )
        s = out.iloc[order].reset_index(drop=True)
        first = np.ones(len(s), dtype=bool)
        first[1:] = s["image_id"].to_numpy()[1:] != s["image_id"].to_numpy()[:-1]
        tie = (~first[1:]) & (s["depth"].to_numpy()[1:] == s["depth"].to_numpy()[:-1]) & first[:-1]
        if tie.any():
            bad = s["image_id"].to_numpy()[1:][tie][0]
            raise ValueError(
                f"ambiguous containment: image {bad} matched >1 region at equal "
                "max depth (overlapping siblings) — analog of ariadne's "
                "get_scope_id tie error (scopes.ts:293-299)"
            )
        return s[first]


def pip_join(
    images: DataFrame,
    regions: list[dict],
    index_res: int = DEFAULT_INDEX_RES,
    deepest_only: bool = True,
) -> DataFrame:
    """images (image_id, lon_u, lat_u) x region polygons -> containment rows.

    deepest_only=True reproduces `get_scope_id` semantics: one row per
    contained image, the deepest containing region; a tie at max depth
    raises (mirrors scopes.ts:293-299). deepest_only=False returns the
    full containment chain (image x every enclosing region), the analog
    of the scope ancestor path.
    """
    spark = images.sparkSession
    index = RegionIndex(regions, index_res)
    bc = spark.sparkContext.broadcast(index)
    res = index_res

    src = images.select(
        "image_id",
        "lon_u",
        "lat_u",
        cells.cell_encode(F.col("lon_u"), F.col("lat_u"), res).alias("_cell"),
    )

    def probe(iterator):
        ridx: RegionIndex = bc.value
        for pdf in iterator:
            yield ridx.probe_batch(
                pdf["image_id"].to_numpy(),
                pdf["lon_u"].to_numpy(),
                pdf["lat_u"].to_numpy(),
                pdf["_cell"].to_numpy(),
                deepest_only=deepest_only,
            )

    return src.mapInPandas(probe, PIP_SCHEMA)
