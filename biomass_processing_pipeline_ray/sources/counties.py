"""Synthetic county (zone) polygon fixtures — the small side of the PIP join.

Two deterministic flavors (FIXTURES.md §2):

- ``rect_counties``     — the COUNTY_NX × COUNTY_NY rectangular partition of
  the georef domain.  Its PIP result is mirror-computable with floor
  arithmetic in DuckDB, making it the SQL-oracle zone layer.
- ``jittered_counties`` — the same grid with interior corners jittered
  deterministically, producing non-axis-aligned convex quads that still
  partition the domain; exercises real ray-cast PIP in pytest against a
  brute-force oracle.

Counties are the analog of the reference's county/parcel polygon layer
(``/root/reference/README.md:148-154``); ~3,143 at national scale, so
always broadcast (ray.put), never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import georef as G
from ..geo import wkb as _wkb


def _fips(cx: int, cy: int) -> str:
    return f"{G.FIPS_BASE + cy * G.COUNTY_NX + cx:05d}"


def rect_counties() -> pa.Table:
    fips, wkbs, bbox = [], [], []
    for cy in range(G.COUNTY_NY):
        for cx in range(G.COUNTY_NX):
            x0 = G.LON0 + cx * G.COUNTY_W
            x1 = G.LON0 + (cx + 1) * G.COUNTY_W
            y0 = G.LAT0 + cy * G.COUNTY_H
            y1 = G.LAT0 + (cy + 1) * G.COUNTY_H
            fips.append(_fips(cx, cy))
            wkbs.append(_wkb.rect_wkb(x0, y0, x1, y1))
            bbox.append((x0, y0, x1, y1))
    bbox = np.asarray(bbox)
    return pa.table(
        {
            "county_fips": pa.array(fips, pa.string()),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "min_lon": bbox[:, 0],
            "min_lat": bbox[:, 1],
            "max_lon": bbox[:, 2],
            "max_lat": bbox[:, 3],
            "area_m2": (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1]) * 111320.0**2,
        }
    )


def detailed_counties(
    n_sub: int = 10, amp_frac: float = 0.12, seed: int = 7
) -> pa.Table:
    """Rect counties with each edge subdivided into ``n_sub`` segments
    and interior subdivision points offset perpendicular by a
    deterministic amplitude — wiggly ~4·n_sub-vertex rings that give the
    Douglas–Peucker simplify (M4) something real to remove."""
    rng = np.random.Generator(np.random.PCG64(seed))
    fips, wkbs, bbox = [], [], []
    for cy in range(G.COUNTY_NY):
        for cx in range(G.COUNTY_NX):
            x0 = G.LON0 + cx * G.COUNTY_W
            x1 = G.LON0 + (cx + 1) * G.COUNTY_W
            y0 = G.LAT0 + cy * G.COUNTY_H
            y1 = G.LAT0 + (cy + 1) * G.COUNTY_H
            corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
            pts = []
            for e in range(4):
                ax, ay = corners[e]
                bx, by = corners[e + 1]
                ex, ey = bx - ax, by - ay
                ln = float(np.hypot(ex, ey))
                nx, ny = -ey / ln, ex / ln  # unit normal
                for s in range(n_sub):
                    t = s / n_sub
                    off = (
                        0.0
                        if s == 0
                        else float(rng.uniform(-amp_frac, amp_frac))
                        * min(G.COUNTY_W, G.COUNTY_H)
                    )
                    pts.append((ax + ex * t + nx * off, ay + ey * t + ny * off))
            ring = np.asarray(pts + [pts[0]], dtype=np.float64)
            fips.append(_fips(cx, cy))
            wkbs.append(_wkb.polygon_to_wkb([ring]))
            bbox.append(
                (ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max())
            )
    bbox = np.asarray(bbox)
    return pa.table(
        {
            "county_fips": pa.array(fips, pa.string()),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "min_lon": bbox[:, 0],
            "min_lat": bbox[:, 1],
            "max_lon": bbox[:, 2],
            "max_lat": bbox[:, 3],
            "area_m2": (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1]) * 111320.0**2,
        }
    )


def jittered_counties(seed: int = 42, jitter_frac: float = 0.3) -> pa.Table:
    """Grid with deterministically jittered interior corners → convex quads."""
    nx, ny = G.COUNTY_NX, G.COUNTY_NY
    xs = G.LON0 + np.arange(nx + 1) * G.COUNTY_W
    ys = G.LAT0 + np.arange(ny + 1) * G.COUNTY_H
    cx, cy = np.meshgrid(xs, ys, indexing="ij")
    rng = np.random.Generator(np.random.PCG64(seed))
    jx = rng.uniform(-jitter_frac, jitter_frac, cx.shape) * G.COUNTY_W
    jy = rng.uniform(-jitter_frac, jitter_frac, cy.shape) * G.COUNTY_H
    # corners on the domain boundary stay on it so the union still covers it
    jx[0, :] = jx[-1, :] = 0.0
    jy[:, 0] = jy[:, -1] = 0.0
    px = cx + jx
    py = cy + jy
    fips, wkbs, bbox = [], [], []
    for gy in range(ny):
        for gx in range(nx):
            ring = np.asarray(
                [
                    [px[gx, gy], py[gx, gy]],
                    [px[gx + 1, gy], py[gx + 1, gy]],
                    [px[gx + 1, gy + 1], py[gx + 1, gy + 1]],
                    [px[gx, gy + 1], py[gx, gy + 1]],
                    [px[gx, gy], py[gx, gy]],
                ]
            )
            fips.append(_fips(gx, gy))
            wkbs.append(_wkb.polygon_to_wkb([ring]))
            bbox.append((ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()))
    bbox = np.asarray(bbox)
    return pa.table(
        {
            "county_fips": pa.array(fips, pa.string()),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "min_lon": bbox[:, 0],
            "min_lat": bbox[:, 1],
            "max_lon": bbox[:, 2],
            "max_lat": bbox[:, 3],
            "area_m2": (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1]) * 111320.0**2,
        }
    )
