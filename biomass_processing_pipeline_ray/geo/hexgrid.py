"""H3-style hexagonal cell index, pure numpy, fully vectorized.

The real H3 library is unavailable in this environment, so this module
implements an aperture-7-style hierarchy of pointy-top hexagons on an
equirectangular (lon/lat degrees) plane.  It plays the role H3 plays in
the design (SURVEY.md §2.2 M9/M10: the reference's MGRS tile math,
``/root/reference/src/core/coordinate_utils_v3.py:250-358``): a
deterministic cell id per centroid, cell boundaries, and ``grid_disk``
neighbor rings used as the kNN prefilter.

Cell ids pack (res, q, r) into a non-negative int64 so they survive a
round-trip through Arrow/DuckDB BIGINT:

    id = res << 56 | (q + 2^27) << 28 | (r + 2^27)

Edge length at resolution R is ``BASE_EDGE_DEG * 7^(-R/2)`` degrees
(aperture 7 halves-ish linearly like H3).  Resolution 7 ≈ 0.0011° ≈
120 m at this latitude — comparable to H3 res 9/10 tile granularity.

Hex rounding uses ``floor(x + 0.5)`` (half-up) rather than banker's
rounding so the arithmetic can be mirrored exactly in DuckDB SQL for
the correctness oracle (see ``sql_hex_cell``).
"""

from __future__ import annotations

import numpy as np

BASE_EDGE_DEG = 10.0
SQRT3 = 1.7320508075688772  # float64 literal, mirrored in SQL
SQRT3_3 = 0.5773502691896257  # sqrt(3)/3
ONE_3 = 0.3333333333333333
TWO_3 = 0.6666666666666666

_OFFSET = 1 << 27
_MASK28 = (1 << 28) - 1

# axial neighbor directions, pointy-top
DIRECTIONS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def edge_deg(res: int) -> float:
    return BASE_EDGE_DEG * (7.0 ** (-res / 2.0))


def _axial_frac(lon: np.ndarray, lat: np.ndarray, a: float):
    q = (SQRT3_3 * lon - ONE_3 * lat) / a
    r = (TWO_3 * lat) / a
    return q, r


def _hex_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-round with half-up rounding; mirrored in SQL."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    c1 = (dx > dy) & (dx > dz)
    c2 = (~c1) & (dy > dz)
    q = np.where(c1, -ry - rz, rx)
    r = np.where(c1 | c2, rz, -rx - ry)
    return q.astype(np.int64), r.astype(np.int64)


def latlng_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized centroid → hex cell id (analog of h3.latlng_to_cell)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    a = edge_deg(res)
    qf, rf = _axial_frac(lon, lat, a)
    q, r = _hex_round(qf, rf)
    return pack_cell(res, q, r)


def pack_cell(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(56))
        | ((q + _OFFSET).astype(np.int64) << np.int64(28))
        | (r + _OFFSET).astype(np.int64)
    )


def unpack_cell(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(56)).astype(np.int64)
    q = ((cell >> np.int64(28)) & np.int64(_MASK28)) - _OFFSET
    r = (cell & np.int64(_MASK28)) - _OFFSET
    return res, q, r


def cell_to_latlng(cell: np.ndarray):
    """Cell center (lon, lat) — analog of h3.cell_to_latlng."""
    res, q, r = unpack_cell(cell)
    a = BASE_EDGE_DEG * (7.0 ** (-res.astype(np.float64) / 2.0))
    lon = a * (SQRT3 * q + SQRT3 / 2.0 * r)
    lat = a * (1.5 * r)
    return lon, lat


def cell_to_boundary(cell: int) -> np.ndarray:
    """6 corner (lon, lat) pairs of one cell — analog of h3.cell_to_boundary."""
    lon, lat = cell_to_latlng(np.asarray([cell]))
    res, _, _ = unpack_cell(np.asarray([cell]))
    a = edge_deg(int(res[0]))
    ang = np.deg2rad(30.0 + 60.0 * np.arange(6))
    return np.stack([lon[0] + a * np.cos(ang), lat[0] + a * np.sin(ang)], axis=1)


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within k rings (analog of h3.grid_disk); includes center."""
    res, q0, r0 = unpack_cell(np.asarray([cell]))
    res, q0, r0 = int(res[0]), int(q0[0]), int(r0[0])
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            qs.append(q0 + dq)
            rs.append(r0 + dr)
    return pack_cell(res, np.asarray(qs, dtype=np.int64), np.asarray(rs, dtype=np.int64))


def polygon_to_cells(ring_lonlat: np.ndarray, res: int) -> np.ndarray:
    """Cells whose centers fall inside the polygon ring (h3.polygon_to_cells
    semantics: center containment). ``ring_lonlat`` is (N,2) closed or open.
    """
    from .pip import points_in_ring

    a = edge_deg(res)
    lon_min, lat_min = ring_lonlat.min(axis=0)
    lon_max, lat_max = ring_lonlat.max(axis=0)
    # candidate axial range from bbox corners with margin of one cell
    corners_lon = np.asarray([lon_min - 2 * a, lon_max + 2 * a])
    corners_lat = np.asarray([lat_min - 2 * a, lat_max + 2 * a])
    qf, rf = _axial_frac(
        np.repeat(corners_lon, 2), np.tile(corners_lat, 2), a
    )
    q_lo, q_hi = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r_lo, r_hi = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qq, rr = np.meshgrid(
        np.arange(q_lo, q_hi + 1, dtype=np.int64),
        np.arange(r_lo, r_hi + 1, dtype=np.int64),
        indexing="ij",
    )
    cand = pack_cell(res, qq.ravel(), rr.ravel())
    clon, clat = cell_to_latlng(cand)
    inside = points_in_ring(clon, clat, ring_lonlat)
    return cand[inside]


# ---------------------------------------------------------------------------
# SQL mirror (DuckDB) of latlng_to_cell for the correctness oracle.
# ---------------------------------------------------------------------------

def sql_hex_cell(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB SQL computing the identical hex cell id (bit-for-bit)."""
    a = repr(edge_deg(res))
    qf = f"(({SQRT3_3!r} * {lon_expr} - {ONE_3!r} * {lat_expr}) / {a})"
    rf = f"(({TWO_3!r} * {lat_expr}) / {a})"
    # yf = -qf - rf
    yf = f"(-{qf} - {rf})"
    rx = f"FLOOR({qf} + 0.5)"
    ry = f"FLOOR({yf} + 0.5)"
    rz = f"FLOOR({rf} + 0.5)"
    dx = f"ABS({rx} - {qf})"
    dy = f"ABS({ry} - {yf})"
    dz = f"ABS({rz} - {rf})"
    qi = (
        f"CAST(CASE WHEN ({dx} > {dy}) AND ({dx} > {dz}) THEN -{ry} - {rz} "
        f"ELSE {rx} END AS BIGINT)"
    )
    ri = (
        f"CAST(CASE WHEN (({dx} > {dy}) AND ({dx} > {dz})) OR ({dy} > {dz}) "
        f"THEN {rz} ELSE -{rx} - {ry} END AS BIGINT)"
    )
    return (
        f"((CAST({res} AS BIGINT) << 56) | (({qi} + {_OFFSET}) << 28) | ({ri} + {_OFFSET}))"
    )
