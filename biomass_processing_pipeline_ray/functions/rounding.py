"""Rounding that matches DuckDB's ROUND(double, n) bit-for-bit.

DuckDB rounds doubles half-away-from-zero (std::round of the scaled
value).  numpy's ``np.round`` is half-even, which diverges on exact
binary halfway cases, so every rounded column the correctness gate
hashes must go through :func:`round_away` on the engine side while the
oracle SQL uses plain ``ROUND(x, n)``.
"""

from __future__ import annotations

import numpy as np


SNAP_SCALE = 1048576.0  # 2^20


def snap_binary(x):
    """Quantize to the 2^-20 binary lattice: floor(x * 2^20) / 2^20.

    Values on this lattice with magnitude < 2^33 sum EXACTLY in float64
    in any order, so parallel partial aggregates (Ray) and sequential
    sums (DuckDB) produce bit-identical totals — the foundation of the
    correctness gate's value-hash equality for float aggregates.  The
    oracle applies the same ``FLOOR(x * 1048576.0) / 1048576.0``.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.floor(x * SNAP_SCALE) / SNAP_SCALE


def sql_snap(expr: str) -> str:
    """DuckDB mirror of :func:`snap_binary`."""
    return f"(FLOOR(({expr}) * 1048576.0) / 1048576.0)"


def round_away(x, ndigits: int):
    """Round half away from zero, elementwise, matching DuckDB ROUND().

    Works on numpy arrays or scalars of float64.  The scale factor and
    the add-0.5-floor are computed in float64 exactly as DuckDB computes
    ``std::round(value * 10^n) / 10^n``.
    """
    x = np.asarray(x, dtype=np.float64)
    p = np.float64(10.0 ** ndigits)
    scaled = x * p
    out = np.where(
        np.isfinite(scaled),
        np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)) / p,
        x,
    )
    return out
