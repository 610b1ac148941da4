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
from ..functions.geometry import envelope, parse_wkt_rings, points_in_rings

DEFAULT_INDEX_RES = 6

PIP_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("region_id", StringType()),
        StructField("depth", IntegerType()),
    ]
)


def _envelope_cells(env, index_res: int, region_id: str = "?") -> list[int]:
    """Covering cells of a polygon envelope at index_res — the ONE copy
    of the registration rule, shared by the broadcast RegionIndex and
    the partitioned join's region-explode stage (two copies would let
    the two paths silently register different cells). Refuses
    antimeridian-crossing envelopes (probe points never wrap) with a
    real ValueError — not `assert`, which `python -O` strips, silently
    re-enabling malformed registration. An envelope whose right edge
    sits exactly ON the seam (env[2] == LON_SPAN) is legal and clamps
    to the last column x = n-1; it does NOT also register the wrapped
    x = 0 column (probe points satisfy lon_u < LON_SPAN, so no probe
    in column 0 can fall inside such an envelope)."""
    n = 1 << index_res
    if not (0.0 <= env[0] and env[2] <= cells.LON_SPAN):
        raise ValueError(
            f"region {region_id} envelope x=[{env[0]}, {env[2]}] "
            f"outside the lon_u domain [0, {cells.LON_SPAN}]: "
            "antimeridian-crossing polygons must be pre-split at the seam"
        )
    x0 = int(env[0] * n // cells.LON_SPAN)
    x1 = int(env[2] * n // cells.LON_SPAN)
    y0 = int(env[1] * n // cells.LAT_SPAN)
    y1 = int(env[3] * n // cells.LAT_SPAN)
    return [
        (index_res << cells.RES_SHIFT) | (cx << cells.X_SHIFT) | cy
        for cx in range(max(x0, 0), min(x1, n - 1) + 1)
        for cy in range(max(y0, 0), min(y1, n - 1) + 1)
    ]


class RegionIndex:
    """Cell-bucketed envelope index over region polygons (broadcast side).

    The analog of ariadne's eagerly-maintained registry hash indexes
    (`packages/core/src/resolve_references/registries/definition.ts:26-90`):
    built once on the driver, probed O(1)-ish per point batch.
    """

    def __init__(self, regions: list[dict], index_res: int = DEFAULT_INDEX_RES):
        self.index_res = index_res
        self.polys: list[list[np.ndarray]] = []  # ring lists (even-odd)
        self.envs: list[tuple[float, float, float, float]] = []
        self.region_ids: list[str] = []
        self.depths: list[int] = []
        self.by_cell: dict[int, list[int]] = defaultdict(list)
        for r in regions:
            idx = len(self.polys)
            poly = parse_wkt_rings(r["wkt"])  # holes + MULTIPOLYGON
            self.polys.append(poly)
            env = envelope(poly)
            self.envs.append(env)
            self.region_ids.append(r["region_id"])
            self.depths.append(int(r["depth"]))
            for cell in _envelope_cells(env, index_res, r["region_id"]):
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
                inside = points_in_rings(bx[near], by[near], self.polys[ridx])
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


def pip_join_partitioned(
    images: DataFrame,
    regions_df: DataFrame,
    index_res: int = DEFAULT_INDEX_RES,
    deepest_only: bool = True,
) -> DataFrame:
    """`pip_join`'s SCALE PATH for region sets too large to broadcast.

    The broadcast form ships every polygon to every executor inside a
    driver-built index — correct while the region table is dim-sized
    (like scopes per file), wrong when regions number in the millions
    (continent-scale cadastral/parcel data): the index no longer fits
    the driver or the task broadcast budget. This variant keeps BOTH
    sides distributed:

      1. region side: one Arrow pass explodes each polygon to the
         covering cells of its envelope at `index_res` — the SAME
         registration rule as RegionIndex (`_envelope_cells`, shared),
         fanout = envelope cell count;
      2. point side: cell = cell_encode(lon, lat, index_res);
      3. candidates: a plain cell equi-join — both sides shuffle once
         on the cell key and Catalyst picks the strategy (sort-merge /
         shuffled-hash, spill-capable); NO broadcast of the region
         side anywhere in the plan (pinned in tests/test_plans.py);
      4. exact ray-cast per candidate in an Arrow batch (polygons
         parsed once per region per batch, points grouped per region
         and tested vectorized);
      5. deepest-wins + tie-error as a window over image_id — the
         candidate rows for one point share its cell and therefore one
         shuffle partition, but may span Arrow batches, so the
         batch-local trick of the broadcast path becomes a window; the
         tie ERROR (scopes.ts:293-299) fires at action time through
         `assert_true`, exactly like the broadcast path's raise.

    Cost shape at 10^12 points x 10^7 regions: shuffle volume is
    points + region-envelope-fanout (each a single Exchange), per-cell
    work is points_in_cell x regions_touching_cell — the same locality
    bound as the broadcast index, now paid with cluster parallelism
    instead of driver memory. Dense hotspot cells skew the join like
    any key skew; AQE skew-split applies (uniform cells, standard
    remedy), and `index_res` tunes fanout vs candidate selectivity.

    Same output contract as `pip_join` (PIP_SCHEMA; equality pinned in
    tests/test_operators.py on the shared fixtures).
    """
    res = index_res

    def reg_cells(iterator):
        for pdf in iterator:
            out = {"cell": [], "region_id": [], "depth": [], "wkt": []}
            for rid, dep, wkt in zip(
                pdf["region_id"], pdf["depth"], pdf["wkt"]
            ):
                env = envelope(parse_wkt_rings(wkt))
                for c in _envelope_cells(env, res, rid):
                    out["cell"].append(c)
                    out["region_id"].append(rid)
                    out["depth"].append(int(dep))
                    out["wkt"].append(wkt)
            yield pd.DataFrame(out)

    reg = regions_df.select("region_id", "depth", "wkt").mapInPandas(
        reg_cells, "cell long, region_id string, depth int, wkt string"
    )
    pts = images.select(
        "image_id",
        "lon_u",
        "lat_u",
        cells.cell_encode(F.col("lon_u"), F.col("lat_u"), res).alias("cell"),
    )
    # explicit shuffled-hash, building on the region side per cell: this
    # operator IS the regions-too-big-to-broadcast regime, so the
    # strategy is pinned rather than left to size estimates (Catalyst
    # would happily broadcast a small test fixture, which is the other
    # operator's plan) — same explicit-per-cardinality rule as knn
    cand = pts.join(reg.hint("shuffle_hash"), "cell")

    def exact(iterator):
        empty = pd.DataFrame(
            {"image_id": [], "region_id": [], "depth": []}
        ).astype({"image_id": "object", "region_id": "object", "depth": "int32"})
        for pdf in iterator:
            if pdf.empty:
                yield empty
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf["lon_u"].to_numpy().astype(np.float64)
            py = pdf["lat_u"].to_numpy().astype(np.float64)
            rids = pdf["region_id"].to_numpy()
            for rid in pd.unique(pdf["region_id"]):
                m = rids == rid
                poly = parse_wkt_rings(pdf["wkt"].to_numpy()[m][0])
                keep[m] = points_in_rings(px[m], py[m], poly)
            yield pdf.loc[
                keep, ["image_id", "region_id", "depth"]
            ].astype({"depth": "int32"})

    hits = cand.mapInPandas(exact, PIP_SCHEMA)
    if not deepest_only:
        return hits

    from pyspark.sql.window import Window

    w = Window.partitionBy("image_id")
    mx = F.max("depth").over(w)
    n_max = F.sum(
        F.when(F.col("depth") == F.max("depth").over(w), 1).otherwise(0)
    ).over(w)
    deep = (
        hits.withColumn("_mx", mx)
        .withColumn("_n", n_max)
        .where(F.col("depth") == F.col("_mx"))
    )
    # tie -> runtime error, mirroring the broadcast path's raise; the
    # filter on isNull() FORCES evaluation (a dropped projection would
    # be pruned away by Catalyst and never checked)
    guard = F.assert_true(
        F.col("_n") == 1,
        F.concat(
            F.lit("ambiguous containment: image "),
            F.col("image_id"),
            F.lit(
                " matched >1 region at equal max depth (overlapping "
                "siblings) — analog of ariadne's get_scope_id tie error "
                "(scopes.ts:293-299)"
            ),
        ),
    )
    return deep.where(guard.isNull()).select("image_id", "region_id", "depth")
