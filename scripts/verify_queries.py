"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, sorts columns
by name and rows by all columns, and compares values exactly (floats
bitwise; report max abs diff on mismatch).  Usage:

    python scripts/verify_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pandas
    import pyarrow as pa

    if isinstance(res, pandas.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"]
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        return [f"row count: {len(g)} vs {len(e)}"]
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            gv = gv.astype(np.float64)
            ev = ev.astype(np.float64)
            eq = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
            if not eq.all():
                bad = ~eq
                problems.append(
                    f"col {c}: {bad.sum()}/{len(gv)} mismatch, "
                    f"max abs diff {np.max(np.abs(gv[bad] - ev[bad])):.3e}"
                )
        else:
            if not (gv.astype(str) == ev.astype(str)).all():
                n = (gv.astype(str) != ev.astype(str)).sum()
                problems.append(f"col {c}: {n}/{len(gv)} mismatch (non-float)")
    return problems


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: engine raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(got)} ({dt:.1f}s, rows-only)")
            continue
        exp = con.sql(oracles[name]).df()
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"ok    {name}: rows={len(got)} ({dt:.1f}s, hash-equal)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
