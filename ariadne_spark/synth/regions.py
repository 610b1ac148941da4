"""Deterministic region-polygon tree generator (FIXTURES.md T2).

The region tree is the analog of ariadne's scope tree
(`packages/types/src/scopes.ts:26-33`: ScopeNode.parent_id / child_ids;
strict containment guaranteed by construction at
`packages/core/src/index_single_file/scopes/scopes.ts:363-400`).
Children are strictly contained in parents (convex parent scaled about
an interior anchor), siblings at equal depth are disjoint by
construction — EXCEPT when `with_overlap_error=True`, which plants an
overlapping sibling pair: the engine must raise on a point matched by
two regions of equal depth, mirroring the tie-error in
`scopes/scopes.ts:293-299`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.geometry import regular_polygon, to_wkt
from .images import CENTERS, SEED

MAX_DEPTH = 3


def _center_micro(idx: int) -> tuple[float, float]:
    lon, lat = CENTERS[idx % len(CENTERS)]
    return (lon + 180.0) * 1e6, (lat + 90.0) * 1e6


def generate_regions(with_overlap_error: bool = False) -> list[dict]:
    """Region rows: region_id, parent_region_id, depth, wkt (microdeg units)."""
    rng = np.random.default_rng(SEED)
    rows: list[dict] = []
    counter = [0]

    def add(parent_id: str | None, depth: int, cx: float, cy: float, radius: float):
        rid = f"reg_{counter[0]}"
        counter[0] += 1
        n_vert = int(rng.integers(5, 9))
        phase = float(rng.uniform(0, 2 * np.pi))
        poly = regular_polygon(cx, cy, radius, n_vert, phase)
        rows.append(
            {
                "region_id": rid,
                "parent_region_id": parent_id,
                "depth": depth,
                "wkt": to_wkt(poly),
            }
        )
        if depth < MAX_DEPTH:
            n_children = int(rng.integers(2, 4))
            # place children on a small orbit; orbit + child radius stays
            # well inside the parent's inradius (cos(pi/5) ~ 0.81 of R)
            inradius = radius * 0.78
            child_r = inradius * 0.33
            orbit = inradius * 0.45
            for c in range(n_children):
                ang = 2 * np.pi * c / n_children + float(rng.uniform(0, 0.6))
                add(rid, depth + 1, cx + orbit * np.cos(ang), cy + orbit * np.sin(ang), child_r)
        return rid

    for k in range(len(CENTERS)):
        cx, cy = _center_micro(k)
        add(None, 0, cx, cy, 900_000.0)  # ~0.9 deg radius root

    if with_overlap_error:
        # two overlapping depth-0 siblings far from real centers
        cx, cy = 10_000_000.0, 100_000_000.0
        for j in range(2):
            poly = regular_polygon(cx + j * 100_000.0, cy, 400_000.0, 6, 0.1 * j)
            rows.append(
                {
                    "region_id": f"reg_overlap_{j}",
                    "parent_region_id": None,
                    "depth": 0,
                    "wkt": to_wkt(poly),
                }
            )
    return rows


def write_regions(path: str, with_overlap_error: bool = False) -> None:
    rows = generate_regions(with_overlap_error)
    pq.write_table(
        pa.table(
            {
                "region_id": pa.array([r["region_id"] for r in rows], pa.string()),
                "parent_region_id": pa.array(
                    [r["parent_region_id"] for r in rows], pa.string()
                ),
                "depth": pa.array([r["depth"] for r in rows], pa.int32()),
                "wkt": pa.array([r["wkt"] for r in rows], pa.string()),
            }
        ),
        path,
        compression="zstd",
    )
