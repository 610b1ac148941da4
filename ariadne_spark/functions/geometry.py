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


def _ring_body(coords: np.ndarray) -> str:
    ring = np.vstack([coords, coords[:1]])
    return "(" + ", ".join(f"{x:.1f} {y:.1f}" for x, y in ring) + ")"


def to_wkt(coords: np.ndarray, holes: list[np.ndarray] | None = None) -> str:
    """Outer ring (Nx2, not closed) + optional hole rings -> WKT
    POLYGON string."""
    parts = [_ring_body(coords)] + [_ring_body(h) for h in (holes or [])]
    return f"POLYGON ({', '.join(parts)})"


def to_wkt_multi(polys: list[tuple[np.ndarray, list[np.ndarray]]]) -> str:
    """[(outer, [holes...]), ...] -> WKT MULTIPOLYGON string."""
    parts = [
        "(" + ", ".join([_ring_body(o)] + [_ring_body(h) for h in hs]) + ")"
        for o, hs in polys
    ]
    return f"MULTIPOLYGON ({', '.join(parts)})"


def parse_wkt_rings(wkt: str) -> list[np.ndarray]:
    """WKT POLYGON (with optional hole rings) or MULTIPOLYGON -> list
    of Nx2 float64 rings (closing vertices dropped). The containment
    predicate is EVEN-ODD parity over all rings, under which outer
    rings, holes, islands-in-holes and disjoint multipolygon parts
    all compose by flat concatenation — no ring-role bookkeeping
    (valid WKT nests holes properly, which is all even-odd needs)."""
    import re

    head = wkt[: wkt.index("(")].strip().upper()
    if head not in ("POLYGON", "MULTIPOLYGON"):
        raise ValueError(f"unsupported WKT geometry {head!r}")
    rings = []
    for m in re.finditer(r"\(([^()]+)\)", wkt):
        pts = np.array(
            [[float(v) for v in pair.split()] for pair in m.group(1).split(",")]
        )
        if len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
            pts = pts[:-1]
        rings.append(pts)
    if not rings:
        raise ValueError(f"no rings in WKT: {wkt[:60]!r}")
    return rings


def parse_wkt(wkt: str) -> np.ndarray:
    """Back-compat single-ring view: the FIRST ring of the geometry
    (the outer ring of a plain POLYGON). Containment callers use
    `parse_wkt_rings` + `points_in_rings`, which see holes and all
    multipolygon parts."""
    return parse_wkt_rings(wkt)[0]


def envelope(poly) -> tuple[float, float, float, float]:
    """(min_x, min_y, max_x, max_y) of a ring or a list of rings (a
    multipolygon's envelope covers every part; holes lie inside the
    outer rings so including them never widens it)."""
    pts = np.vstack(poly) if isinstance(poly, list) else poly
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
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


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd containment over a ring list (`parse_wkt_rings`
    output): XOR of per-ring ray-cast parities — a point inside an
    outer ring and a hole has even total crossings (outside), inside
    an island-in-a-hole odd again (inside), and disjoint multipolygon
    parts contribute independently. One vectorized pass per ring."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_polygon(px, py, ring)
    return inside


def regular_polygon(cx: float, cy: float, radius: float, n: int, phase: float) -> np.ndarray:
    ang = phase + 2 * np.pi * np.arange(n) / n
    return np.column_stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)])
