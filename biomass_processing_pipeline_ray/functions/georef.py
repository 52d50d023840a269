"""Deterministic georeferencing derived from integer ids.

The reference derives tile bounds from the tile id (MGRS grid math,
``/root/reference/src/core/coordinate_utils_v3.py:360-389``).  We mirror
that idea: a tile's centroid is a pure arithmetic function of its
integer id, so the engine (numpy) and the DuckDB oracle SQL compute the
*bit-identical* float64 coordinates with the same operation order.

Every constant here is exactly representable in binary so the float ops
are reproducible: LON_STEP = 4/4096, LAT_STEP = 5.5/4096 are exact.

Domain: an Illinois-like box lon ∈ [-91.5, -87.5], lat ∈ [37.0, 42.5]
(cf. FIXTURES.md §1).  Points sit at half-step offsets so they can never
fall exactly on a county-grid boundary (multiples of GRID_NX/NY cells).
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative hash constant (public domain, 2^32 * golden ratio).
MULT = 2654435761
MOD32 = 4294967296  # 2**32
GRID = 4096

LON0 = -91.5
LAT0 = 37.0
LON_SPAN = 4.0
LAT_SPAN = 5.5
LON_STEP = LON_SPAN / GRID  # 0.0009765625, exact binary
LAT_STEP = LAT_SPAN / GRID  # 11/8192, exact binary

# Rectangular county grid over the domain (SQL-oracle-compatible zones).
COUNTY_NX = 8
COUNTY_NY = 8
COUNTY_W = LON_SPAN / COUNTY_NX  # 0.5 exact
COUNTY_H = LAT_SPAN / COUNTY_NY  # 0.6875 exact
FIPS_BASE = 17000


def derive_key(ids: np.ndarray) -> np.ndarray:
    """32-bit multiplicative hash of an int64 id column."""
    ids = np.asarray(ids, dtype=np.int64)
    return (ids * MULT) % MOD32


def derive_lonlat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """id → (lon, lat) float64, bit-identical to :func:`sql_lonlat`."""
    key = derive_key(ids)
    kx = (key % GRID).astype(np.float64)
    ky = ((key // GRID) % GRID).astype(np.float64)
    lon = LON0 + (kx + 0.5) * LON_STEP
    lat = LAT0 + (ky + 0.5) * LAT_STEP
    return lon, lat


def derive_value(ids: np.ndarray) -> np.ndarray:
    """Per-tile scalar value used by the IDW stitch (SQL-mirrored)."""
    key = derive_key(ids)
    return (key % 1000).astype(np.float64) * 0.001


def derive_biomass(ids: np.ndarray) -> np.ndarray:
    """Arithmetic stand-in biomass (SQL-mirrored).

    The pixel-derived biomass (NDVI-style band algebra, see
    ``stages/decode.py``) is validated by pytest; this arithmetic twin
    lets DuckDB act as the oracle for the zonal-aggregation shuffle.
    """
    key = derive_key(ids)
    _, lat = derive_lonlat(ids)
    return (1.0 + (key % 1000).astype(np.float64) * 0.001) * (
        10.0 + (lat - 37.0)
    ) * 10.0


def derive_county_xy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rect-grid county cell of a point (floor arithmetic, SQL-mirrored)."""
    cx = np.floor((lon - LON0) / COUNTY_W).astype(np.int64)
    cy = np.floor((lat - LAT0) / COUNTY_H).astype(np.int64)
    cx = np.clip(cx, 0, COUNTY_NX - 1)
    cy = np.clip(cy, 0, COUNTY_NY - 1)
    return cx, cy


def county_fips_from_xy(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    code = FIPS_BASE + cy * COUNTY_NX + cx
    return np.char.zfill(code.astype("int64").astype(str), 5)


# ---------------------------------------------------------------------------
# SQL fragments (DuckDB) — MUST stay in lockstep with the numpy above.
# ---------------------------------------------------------------------------

SQL_KEY = f"(({{id}} * {MULT}) % {MOD32})"


def sql_lonlat(id_expr: str) -> tuple[str, str]:
    key = SQL_KEY.format(id=id_expr)
    lon = f"({LON0!r} + ((CAST({key} % {GRID} AS DOUBLE)) + 0.5) * ({LON_SPAN!r} / {GRID}))"
    lat = f"({LAT0!r} + ((CAST(({key} // {GRID}) % {GRID} AS DOUBLE)) + 0.5) * ({LAT_SPAN!r} / {GRID}))"
    return lon, lat


def sql_value(id_expr: str) -> str:
    key = SQL_KEY.format(id=id_expr)
    return f"(CAST({key} % 1000 AS DOUBLE) * 0.001)"


def sql_biomass(id_expr: str) -> str:
    key = SQL_KEY.format(id=id_expr)
    _, lat = sql_lonlat(id_expr)
    return (
        f"((1.0 + CAST({key} % 1000 AS DOUBLE) * 0.001) * (10.0 + ({lat} - 37.0)) * 10.0)"
    )


def sql_county_fips(lon_expr: str, lat_expr: str) -> str:
    cx = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} - {LON0!r}) / {COUNTY_W!r}) AS BIGINT), 0), {COUNTY_NX - 1})"
    )
    cy = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} - {LAT0!r}) / {COUNTY_H!r}) AS BIGINT), 0), {COUNTY_NY - 1})"
    )
    return f"LPAD(CAST({FIPS_BASE} + {cy} * {COUNTY_NX} + {cx} AS VARCHAR), 5, '0')"
