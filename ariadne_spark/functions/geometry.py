"""Vectorized planar geometry — point-in-polygon, envelopes, WKT.

The reference's core geometric predicate is 1-D interval containment
(`location_contains`, used by the deepest-scope lookup at
`packages/core/src/index_single_file/scopes/scopes.ts:154-168,275-303`).
The spatial analog is 2-D point-in-polygon. No shapely in this
container, so the engine ships a numpy ray-casting test: one call
evaluates ALL points of an Arrow batch against one polygon — O(N*M)
flops, zero Python-level loops over points.

Coordinate space: integer-microdegree axes as doubles
(lon_u in [0, 360e6), lat_u in [0, 180e6)) — the same space the grid in
`cells.py` indexes, so polygons and cell ids never need reprojection.
WKT strings are in these units too (documented engine convention).
"""

from __future__ import annotations

import numpy as np


def to_wkt(coords: np.ndarray) -> str:
    """Nx2 vertex array (not closed) -> WKT POLYGON string."""
    ring = np.vstack([coords, coords[:1]])
    body = ", ".join(f"{x:.1f} {y:.1f}" for x, y in ring)
    return f"POLYGON (({body}))"


def parse_wkt(wkt: str) -> np.ndarray:
    """WKT POLYGON (outer ring only) -> Nx2 float64 array (closed ring dropped)."""
    inner = wkt[wkt.index("((") + 2 : wkt.rindex("))")]
    pts = np.array([[float(v) for v in pair.split()] for pair in inner.split(",")])
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    return pts


def envelope(poly: np.ndarray) -> tuple[float, float, float, float]:
    """(min_x, min_y, max_x, max_y)."""
    return (
        float(poly[:, 0].min()),
        float(poly[:, 1].min()),
        float(poly[:, 0].max()),
        float(poly[:, 1].max()),
    )


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Ray-casting containment for many points vs one polygon.

    px, py: float64 arrays of length N; poly: Mx2 vertices (unclosed).
    Returns bool[N]. Crossing rule: half-open edge [y1, y2) so a ray
    through a vertex counts exactly once — deterministic for points not
    exactly on an edge (fixture generators avoid on-edge points).
    """
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(poly[:, 0], -1), np.roll(poly[:, 1], -1)
    px = px[:, None]
    py = py[:, None]
    crosses = (y1[None, :] <= py) != (y2[None, :] <= py)
    # x coordinate of the edge at height py (safe: where crosses, y2 != y1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (py - y1[None, :]) / (y2[None, :] - y1[None, :])
        xint = x1[None, :] + t * (x2[None, :] - x1[None, :])
    hits = crosses & (px < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def regular_polygon(cx: float, cy: float, radius: float, n: int, phase: float) -> np.ndarray:
    ang = phase + 2 * np.pi * np.arange(n) / n
    return np.column_stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)])
