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
