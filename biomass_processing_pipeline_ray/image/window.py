"""Pixel-window math + polygon rasterization for raster↔vector ops.

Covers the reference's windowed-read and clip-to-geometry surface
(SURVEY.md §2.2 M13/M14):

- :func:`pixel_window` — geometry bbox → raster row/col window with a
  pixel buffer, clipped to the tile (``blob_manager_v3.py:1337-1447``
  ``_calculate_pixel_window`` semantics, minus the Azure range-request
  bookkeeping).
- :func:`rasterize_ring` — even-odd mask of pixel CENTERS inside a
  polygon ring (``rasterio.mask.mask`` analog used at
  ``blob_manager_v3.py:800-845`` / ``landcover_analyzer_v3.py:370-379``).
- :func:`masked_stats` — the per-parcel masked zonal reduction (G1/G3
  shape: counts + mean over valid pixels).

Tile georeferencing convention: ``bounds = (min_lon, min_lat, max_lon,
max_lat)``; row 0 is the NORTH edge (image convention), pixel (r, c)
center at ``lon = min_lon + (c + 0.5) * dx``, ``lat = max_lat -
(r + 0.5) * dy``.
"""

from __future__ import annotations

import numpy as np


def pixel_window(
    bounds: tuple[float, float, float, float],
    bbox: tuple[float, float, float, float],
    h: int,
    w: int,
    buffer_px: int = 2,
) -> tuple[int, int, int, int] | None:
    """(r0, r1, c0, c1) half-open window covering ``bbox`` (+buffer),
    clipped to the tile; None when there is no overlap."""
    min_lon, min_lat, max_lon, max_lat = bounds
    bx0, by0, bx1, by1 = bbox
    if bx1 < min_lon or bx0 > max_lon or by1 < min_lat or by0 > max_lat:
        return None
    dx = (max_lon - min_lon) / w
    dy = (max_lat - min_lat) / h
    c0 = int(np.floor((bx0 - min_lon) / dx)) - buffer_px
    c1 = int(np.ceil((bx1 - min_lon) / dx)) + buffer_px
    r0 = int(np.floor((max_lat - by1) / dy)) - buffer_px
    r1 = int(np.ceil((max_lat - by0) / dy)) + buffer_px
    r0, c0 = max(r0, 0), max(c0, 0)
    r1, c1 = min(r1, h), min(c1, w)
    if r1 <= r0 or c1 <= c0:
        return None
    return r0, r1, c0, c1


def pixel_centers(
    bounds: tuple[float, float, float, float],
    h: int,
    w: int,
    window: tuple[int, int, int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) 2-D arrays of pixel centers (optionally windowed)."""
    min_lon, min_lat, max_lon, max_lat = bounds
    dx = (max_lon - min_lon) / w
    dy = (max_lat - min_lat) / h
    r0, r1, c0, c1 = window if window else (0, h, 0, w)
    lon = min_lon + (np.arange(c0, c1, dtype=np.float64) + 0.5) * dx
    lat = max_lat - (np.arange(r0, r1, dtype=np.float64) + 0.5) * dy
    return np.broadcast_to(lon[None, :], (r1 - r0, c1 - c0)), np.broadcast_to(
        lat[:, None], (r1 - r0, c1 - c0)
    )


def points_in_ring(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd test of points against one closed ring."""
    x = np.asarray(px, dtype=np.float64).ravel()
    y = np.asarray(py, dtype=np.float64).ravel()
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    # edge straddles the horizontal ray through y
    straddle = (y0[None, :] > y[:, None]) != (y1[None, :] > y[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (y[:, None] - y0[None, :]) / (y1 - y0)[None, :] * (
            x1 - x0
        )[None, :]
    crossings = (straddle & (x[:, None] < xint)).sum(axis=1)
    return (crossings % 2 == 1).reshape(np.shape(px))


def rasterize_ring(
    ring: np.ndarray,
    bounds: tuple[float, float, float, float],
    h: int,
    w: int,
    window: tuple[int, int, int, int] | None = None,
) -> np.ndarray:
    """Boolean mask of pixel centers inside ``ring`` (windowed)."""
    lon, lat = pixel_centers(bounds, h, w, window)
    return points_in_ring(lon, lat, np.asarray(ring, dtype=np.float64))


def masked_stats(values: np.ndarray, mask: np.ndarray) -> dict:
    """Zonal reduction over the masked window: count / sum / mean."""
    sel = np.asarray(values, dtype=np.float64)[mask]
    n = int(mask.sum())
    return {
        "n_pixels": n,
        "sum": float(sel.sum()) if n else 0.0,
        "mean": float(sel.mean()) if n else float("nan"),
    }
