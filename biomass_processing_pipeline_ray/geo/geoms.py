"""Geometry kernels over WKB polygons — pure numpy (no shapely here).

Covers the reference's geometry utility surface (SURVEY.md §2.2 M1–M5,
``/root/reference/src/utils/geometry_utils_v1.py``):

- M1 ``validate_polygon`` / ``fix_polygon``   (:17-53  validate/make_valid)
- M2 ``area_acres``                            (:55-83  cos(lat)-scaled area)
- M3 ``centroid``                              (:85-101)
- M4 ``simplify`` (Douglas–Peucker) / ``buffer_convex`` (:120-160)
- M5 ``bounds_intersect``                      (:162-185 bbox overlap)

All functions take (N, 2) float64 rings (see :mod:`.wkb`); the batched
stage entry point is :func:`geometry_stats_batch`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import wkb as _wkb

M_PER_DEG = 111320.0          # reference geometry_utils_v1.py:72 scale
ACRES_PER_M2 = 0.000247105    # reference crop_analyzer_v3.py:175


# -- M1: validity -------------------------------------------------------------


def _segments_intersect(p, q, r, s) -> bool:
    """Proper intersection of segments pq and rs (shared endpoints ok)."""
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    o1, o2 = orient(p, q, r), orient(p, q, s)
    o3, o4 = orient(r, s, p), orient(r, s, q)
    return (o1 * o2 < 0) and (o3 * o4 < 0)


def validate_ring(ring: np.ndarray) -> tuple[bool, str]:
    """(is_valid, reason).  Checks closure, point count, degenerate area,
    and pairwise self-intersection (counties are small; O(n²) is fine —
    the reference delegates the same checks to shapely ``is_valid``)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 4:
        return False, "too_few_points"
    if not np.array_equal(ring[0], ring[-1]):
        return False, "not_closed"
    if abs(shoelace_area(ring)) < 1e-18:
        return False, "zero_area"
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # first and last share the closure vertex
            if _segments_intersect(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return False, "self_intersection"
    return True, "ok"


def fix_ring(ring: np.ndarray) -> np.ndarray:
    """make_valid-lite: drop consecutive duplicate vertices, close the
    ring, normalize winding to CCW (positive signed area)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    if len(ring) >= 4 and shoelace_area(ring) < 0:
        ring = ring[::-1].copy()
    return ring


# -- M2/M3: area + centroid ---------------------------------------------------


def shoelace_area(ring: np.ndarray) -> float:
    """Signed area in squared degrees (CCW positive)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y1 - x1 * y) * 0.5)


def centroid(ring: np.ndarray) -> tuple[float, float]:
    """Polygon centroid (shoelace-weighted); falls back to the vertex
    mean for degenerate rings."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = np.sum(cross) * 0.5
    if abs(a) < 1e-18:
        return float(ring[:-1, 0].mean()), float(ring[:-1, 1].mean())
    cx = float(np.sum((x + x1) * cross) / (6.0 * a))
    cy = float(np.sum((y + y1) * cross) / (6.0 * a))
    return cx, cy


def area_acres(ring: np.ndarray) -> float:
    """Approximate WGS84 acres: deg² area × (111320 m/deg)² × cos(lat₀),
    the reference's flat-earth scaling (geometry_utils_v1.py:55-83)."""
    a = abs(shoelace_area(ring))
    _, cy = centroid(ring)
    return a * M_PER_DEG * M_PER_DEG * np.cos(np.radians(cy)) * ACRES_PER_M2


# -- M4: simplify + buffer ----------------------------------------------------


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker on the open ring, closure re-appended — the
    topology-preserving simplify analog (geometry_utils_v1.py:120-138)."""
    pts = np.asarray(ring, dtype=np.float64)[:-1]
    if len(pts) <= 3:
        return np.vstack([pts, pts[:1]])

    def dp(lo: int, hi: int, keep: np.ndarray) -> None:
        if hi <= lo + 1:
            return
        a, b = pts[lo], pts[hi]
        ab = b - a
        seg = pts[lo + 1 : hi] - a
        denom = float(ab @ ab)
        if denom == 0.0:
            d = np.linalg.norm(seg, axis=1)
        else:
            t = np.clip((seg @ ab) / denom, 0.0, 1.0)
            d = np.linalg.norm(seg - t[:, None] * ab, axis=1)
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            keep[lo + 1 + imax] = True
            dp(lo, lo + 1 + imax, keep)
            dp(lo + 1 + imax, hi, keep)

    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    dp(0, len(pts) - 1, keep)
    out = pts[keep]
    if len(out) < 3:
        out = pts[:3]
    return np.vstack([out, out[:1]])


def buffer_convex(ring: np.ndarray, dist_deg: float) -> np.ndarray:
    """Degree buffer of a CONVEX ring: offset each edge outward by
    ``dist_deg`` and re-intersect adjacent edges (miter join).  Documented
    convex-only analog of shapely ``buffer`` (geometry_utils_v1.py:140-160);
    county zones here are convex quads."""
    r = fix_ring(ring)  # CCW
    pts = r[:-1]
    n = len(pts)
    edges = np.roll(pts, -1, axis=0) - pts
    # outward normal of a CCW edge is (dy, -dx) normalized... for CCW the
    # interior is to the LEFT, so outward is to the right: (dy, -dx)
    norm = np.stack([edges[:, 1], -edges[:, 0]], axis=1)
    norm /= np.maximum(np.linalg.norm(norm, axis=1, keepdims=True), 1e-30)
    a_off = pts + norm * dist_deg          # offset edge start points
    out = []
    for i in range(n):
        j = (i - 1) % n
        # intersect offset edge j (through a_off[j], dir edges[j]) with
        # offset edge i (through a_off[i], dir edges[i])
        d1, d2 = edges[j], edges[i]
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-30:
            out.append(a_off[i])
            continue
        diff = a_off[i] - a_off[j]
        t = (diff[0] * d2[1] - diff[1] * d2[0]) / denom
        out.append(a_off[j] + t * d1)
    out = np.asarray(out)
    return np.vstack([out, out[:1]])


# -- M5: bbox ops -------------------------------------------------------------


def clip_ring_to_box(
    ring: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed CONVEX ring to an axis-
    aligned box: four successive half-plane passes, each keeping inside
    vertices and inserting edge/boundary intersections.  Returns a
    CLOSED ring (first point repeated) or an empty (0, 2) array.

    Area-exact for convex subjects (the jittered county quads are
    convex by construction — corner jitter < half a cell keeps every
    vertex outside the opposite diagonal); a CONCAVE subject that exits
    and re-enters the box can pick up same-orientation overlapping
    boundary bridges and over-count area — don't use it for those.

    The verification twin (pipelines/oracles.ensure_overlap_oracle)
    computes the same region by an independent construction — candidate
    vertex set + angular ordering — so agreement is algorithmic, not
    shared code."""
    pts = [tuple(p) for p in np.asarray(ring, dtype=np.float64)[:-1]]

    def clip_half(points, inside, intersect):
        out = []
        m = len(points)
        for i in range(m):
            a, b = points[i], points[(i + 1) % m]
            ia, ib = inside(a), inside(b)
            if ia:
                out.append(a)
                if not ib:
                    out.append(intersect(a, b))
            elif ib:
                out.append(intersect(a, b))
        return out

    def ix_v(x):  # intersection with vertical line x = const
        def f(a, b):
            t = (x - a[0]) / (b[0] - a[0])
            return (x, a[1] + t * (b[1] - a[1]))

        return f

    def ix_h(y):  # intersection with horizontal line y = const
        def f(a, b):
            t = (y - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), y)

        return f

    pts = clip_half(pts, lambda p: p[0] >= x0, ix_v(x0))
    if pts:
        pts = clip_half(pts, lambda p: p[0] <= x1, ix_v(x1))
    if pts:
        pts = clip_half(pts, lambda p: p[1] <= y1, ix_h(y1))
    if pts:
        pts = clip_half(pts, lambda p: p[1] >= y0, ix_h(y0))
    if not pts:
        return np.zeros((0, 2), dtype=np.float64)
    arr = np.asarray(pts, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


def ring_bounds(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def bounds_intersect(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Vectorized bbox overlap: b1 (N,4) vs b2 (M,4) → (N,M) bool.
    Columns are (min_lon, min_lat, max_lon, max_lat)."""
    b1 = np.atleast_2d(np.asarray(b1, dtype=np.float64))
    b2 = np.atleast_2d(np.asarray(b2, dtype=np.float64))
    return (
        (b1[:, None, 0] <= b2[None, :, 2])
        & (b1[:, None, 2] >= b2[None, :, 0])
        & (b1[:, None, 1] <= b2[None, :, 3])
        & (b1[:, None, 3] >= b2[None, :, 1])
    )


# -- batched stage ------------------------------------------------------------


def geometry_stats_batch(batch: pa.Table, wkb_col: str = "geometry_wkb") -> pa.Table:
    """map_batches body: per-polygon validity, area, centroid, bounds."""
    bufs = batch[wkb_col].to_pylist()
    n = len(bufs)
    valid = np.empty(n, dtype=bool)
    acres = np.empty(n, dtype=np.float64)
    cx = np.empty(n, dtype=np.float64)
    cy = np.empty(n, dtype=np.float64)
    npts = np.empty(n, dtype=np.int64)
    for i, buf in enumerate(bufs):
        ring = _wkb.wkb_to_rings(buf)[0]
        valid[i], _ = validate_ring(ring)
        if not valid[i]:
            ring = fix_ring(ring)
        acres[i] = area_acres(ring)
        cx[i], cy[i] = centroid(ring)
        npts[i] = len(ring) - 1
    out = batch.drop_columns([wkb_col])
    out = out.append_column("is_valid", pa.array(valid))
    out = out.append_column("area_acres", pa.array(acres))
    out = out.append_column("centroid_lon", pa.array(cx))
    out = out.append_column("centroid_lat", pa.array(cy))
    return out.append_column("n_points", pa.array(npts))
