"""Distributed per-group convex hull over the integer tile lattice.

The reference ships county extents (``ST_Extent`` bounding boxes,
``/root/reference/src/core/database_manager_v3.py`` county-bounds
queries); the hull is the exact-geometry upgrade every spatial-coverage
report wants (footprint area / perimeter of the tiles actually present
per county, not their bounding box).

Scale design — the hot path never runs a hull:

1. **Per-batch candidate reduction (vectorized, distributive).**  Every
   convex-hull vertex of a point set is, for its x-column, either the
   minimum-y or maximum-y point.  So per batch we reduce each
   ``(group, kx)`` to ``(min ky, max ky)`` with one lexsort +
   ``reduceat`` — a distributive aggregate that shrinks a block of any
   size to at most ``2 × x-span`` candidate rows per group.
2. **One bounded shuffle.**  Partials group by ``group`` (at most
   ``groups × x-span × blocks`` tiny rows move; min/max re-merge is
   associative so late/duplicate partials are harmless).
3. **Per-group chain on ≤ 2·x-span candidates.**  Andrew's monotone
   chain with STRICT turns (collinear points dropped) over int64
   lattice coords — every orientation test is an exact integer cross
   product (coords < 2^13 ⇒ cross < 2^27), so the hull is deterministic
   regardless of how candidates were batched.  Correctness of the
   reduction: a point that is not the y-extreme of its x-column lies on
   the open segment between the extremes, hence inside the hull of the
   others, hence never a strict hull vertex.

Outputs are integer-exact (vertex count, twice-area in lattice cells²
via the shoelace sum) plus a perimeter in degrees computed in one fixed
CCW vertex order (both engine and oracle hypot/sum the identical vertex
array, so the float is bit-stable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Strict convex hull (CCW, starting at the lexicographic minimum)
    of unique int64 lattice points sorted by (x, y).  Returns the
    (k, 2) vertex array; k ≤ 2 passes through unchanged."""
    n = len(pts)
    if n <= 2:
        return pts

    def half(seq):
        h: list[np.ndarray] = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def hull_metrics(hull: np.ndarray, sx: float, sy: float):
    """(n_vertices, shoelace int64 twice-area, perimeter) for a CCW
    hull; ``sx``/``sy`` scale lattice steps to output units.  The
    perimeter is ``np.sum(np.hypot(...))`` over the fixed CCW order —
    the oracle runs the identical expression on the identical array."""
    k = len(hull)
    if k < 2:
        return k, 0, 0.0
    x, y = hull[:, 0], hull[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    area2 = int(np.sum(x * yn - xn * y)) if k >= 3 else 0
    perim = float(np.sum(np.hypot((xn - x) * sx, (yn - y) * sy)))
    return k, area2, perim


def _minmax_partial(b: pa.Table, grp: str) -> pa.Table:
    """Vectorized per-batch (grp, kx) → min/max ky reduction."""
    g = b[grp].to_numpy(zero_copy_only=False)
    kx = b["kx"].to_numpy()
    ky = b["ky"].to_numpy()
    order = np.lexsort((ky, kx, g))
    g, kx, ky = g[order], kx[order], ky[order]
    gx_change = np.r_[
        True, (g[1:] != g[:-1]) | (kx[1:] != kx[:-1])
    ]
    starts = np.flatnonzero(gx_change)
    ends = np.r_[starts[1:], len(g)] - 1
    return pa.table(
        {
            grp: pa.array(g[starts]),
            "kx": pa.array(kx[starts], pa.int64()),
            "ky_min": pa.array(ky[starts], pa.int64()),
            "ky_max": pa.array(ky[ends], pa.int64()),
        }
    )


def grouped_hull(ds, grp: str, sx: float, sy: float, round_fn):
    """Per-``grp`` strict convex hull of the (kx, ky) lattice points in
    ``ds``.  Returns (grp, n_vertices, area2_cells, perim_deg)."""

    def per_group(gdf: pd.DataFrame) -> pa.Table:
        key = gdf[grp].iloc[0]
        kx = gdf["kx"].to_numpy()
        lo = gdf["ky_min"].to_numpy()
        hi = gdf["ky_max"].to_numpy()
        # re-merge partials: min/max per x-column (associative)
        order = np.argsort(kx, kind="mergesort")
        kx, lo, hi = kx[order], lo[order], hi[order]
        starts = np.flatnonzero(np.r_[True, kx[1:] != kx[:-1]])
        mlo = np.minimum.reduceat(lo, starts)
        mhi = np.maximum.reduceat(hi, starts)
        ux = kx[starts]
        pts = np.unique(
            np.concatenate(
                [np.stack([ux, mlo], 1), np.stack([ux, mhi], 1)]
            ),
            axis=0,
        ).astype(np.int64)
        hull = monotone_chain(pts)
        k, area2, perim = hull_metrics(hull, sx, sy)
        return pa.table(
            {
                grp: pa.array([key]),
                "n_vertices": pa.array([k], pa.int64()),
                "area2_cells": pa.array([area2], pa.int64()),
                "perim_deg": pa.array([round_fn(perim)], pa.float64()),
            }
        )

    partials = ds.map_batches(
        lambda b: _minmax_partial(b, grp), batch_format="pyarrow"
    )
    return partials.groupby(grp).map_groups(per_group, batch_format="pandas")
