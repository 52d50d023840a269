"""Minimal WKB polygon codec (little-endian), pure python/numpy.

Shapely is unavailable here, so county polygons travel as standard WKB
``binary`` columns (ISO WKB Polygon / MultiPolygon, byte order 01) and
this module converts them to flat numpy ring arrays for the vectorized
PIP kernel.  Mirrors the role of GeoJSON/WKT geometry payloads in the
reference (``/root/reference/src/core/database_manager_v3.py:208-221``).
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode one polygon (outer ring + optional holes) as WKB.

    Each ring is an (N, 2) float64 array; rings are closed automatically
    (first point appended if missing).
    """
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_to_rings(buf: bytes) -> list[np.ndarray]:
    """Decode WKB Polygon or MultiPolygon → list of (N,2) rings.

    For MultiPolygon, all member polygons' rings are concatenated (the
    PIP kernel treats even-odd crossing counts, so holes behave
    correctly as long as rings don't cross).
    """
    rings: list[np.ndarray] = []
    _parse(memoryview(buf), 0, rings)
    return rings


def _parse(mv: memoryview, off: int, rings: list[np.ndarray]) -> int:
    byte_order = mv[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", mv, off + 1)
    gtype &= 0xFF  # strip SRID/Z flags if any
    off += 5
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", mv, off)
        off += 4
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
            rings.append(np.array(arr))  # copy out of the buffer
            off += npts * 16
        return off
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from("<I", mv, off)
        off += 4
        for _ in range(npoly):
            off = _parse(mv, off, rings)
        return off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def rect_wkb(min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> bytes:
    ring = np.asarray(
        [
            [min_lon, min_lat],
            [max_lon, min_lat],
            [max_lon, max_lat],
            [min_lon, max_lat],
            [min_lon, min_lat],
        ]
    )
    return polygon_to_wkb([ring])
