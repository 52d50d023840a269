"""Two-table diff by bucketed signatures: prune identical key ranges,
row-compare only dirty buckets.

The snapshot-sync shape the reference handles by re-running full
UPSERT batches (``production_processor_v3.py`` result writer: delete +
re-insert per county): here the CURRENT and PREVIOUS snapshots are
compared by a constant-size signature per key RANGE first, and only
ranges whose (count, checksum) disagree pay the row-level comparison.
At 100 TB with localized churn (the realistic case — late partitions,
one bad day re-ingested) the drill pass touches a few buckets while
the signature pass is a pure column-pruned scan + one tiny aggregate.

Scale contract:
  - signature pass: one scan per side, per-batch combiner partials,
    ONE bounded shuffle of (bucket, side) rows — state per task O(#
    buckets in batch).
  - dirty-bucket set: built distributed, only DIRTY bucket ids reach
    the driver (the semi-join key-set pattern, queries.py
    ``_big_order_custkeys``) — the pull is bounded by the churn, not
    the table.
  - drill pass: both sides filter to dirty buckets BEFORE the
    exchange; per-bucket compare is one lexsort + vectorized
    run-length logic (no per-key dispatch).  Keys must be unique per
    side (primary key) — documented assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_H_MUL = 2654435761  # Knuth multiplicative constant, matches orders_checksum
_H_MOD = 2147483648  # per-row hash < 2^31: exact int64 sums to ~4e9 rows/bucket


def _row_sig(key: np.ndarray, vbits: np.ndarray) -> np.ndarray:
    """Deterministic per-row hash < 2^31 over (key, value-bits)."""
    return (key * _H_MUL + vbits % 2147483647) % _H_MOD


def _sig_partial(side: int, key_col: str, val_col: str, shift: int):
    def partial(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy().astype(np.int64)
        vbits = b[val_col].to_numpy().astype(np.float64).view(np.int64)
        g = (
            pd.DataFrame({"bucket": k >> shift, "h": _row_sig(k, vbits)})
            .groupby("bucket", as_index=False)
            .agg(sig=("h", "sum"), cnt=("h", "size"))
        )
        return pa.table(
            {
                "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
                "sig_a": pa.array(g["sig"].to_numpy(np.int64) * (1 - side)),
                "cnt_a": pa.array(g["cnt"].to_numpy(np.int64) * (1 - side)),
                "sig_b": pa.array(g["sig"].to_numpy(np.int64) * side),
                "cnt_b": pa.array(g["cnt"].to_numpy(np.int64) * side),
            }
        )

    return partial


def dirty_buckets(ds_a, ds_b, key_col: str, val_col: str, shift: int) -> np.ndarray:
    """Bucket ids whose (count, signature) differ between the sides.

    Both sides' partials union into ONE grouped sum (side-conditional
    columns, so a single exchange carries both signatures); only the
    differing bucket ids are pulled — bounded by churn."""
    from ray.data.aggregate import Sum

    from .zonal import combine_partials

    pa_ = ds_a.map_batches(_sig_partial(0, key_col, val_col, shift),
                           batch_format="pyarrow")
    pb_ = ds_b.map_batches(_sig_partial(1, key_col, val_col, shift),
                           batch_format="pyarrow")
    merged = combine_partials(
        pa_.union(pb_),
        ["bucket"],
        [Sum(c, alias_name=c) for c in ("sig_a", "cnt_a", "sig_b", "cnt_b")],
    )

    def dirty_only(b: pa.Table) -> pa.Table:
        neq = pc.or_(
            pc.not_equal(b["sig_a"], b["sig_b"]),
            pc.not_equal(b["cnt_a"], b["cnt_b"]),
        )
        return pa.table({"bucket": b.filter(neq)["bucket"]})

    ids = merged.map_batches(dirty_only, batch_format="pyarrow").unique("bucket")
    return np.asarray(sorted(ids), dtype=np.int64)


def table_diff(ds_a, ds_b, key_col: str, val_col: str, shift: int = 8,
               n_coarse: int = 64):
    """Diff two keyed datasets → rows ``(key, change)`` with change in
    {'added', 'removed', 'changed'} (added = in A only, removed = in B
    only, changed = same key, different ``val_col`` bits).

    Two passes: bucket signatures prune clean key ranges (``shift``
    sets the range width 2^shift), then only dirty buckets co-shuffle
    for the exact row-level merge."""
    dirty = dirty_buckets(ds_a, ds_b, key_col, val_col, shift)

    def keep_dirty(side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = b[key_col].to_numpy().astype(np.int64)
            mask = np.isin(k >> shift, dirty)
            k = k[mask]
            vbits = (
                b[val_col].to_numpy().astype(np.float64).view(np.int64)[mask]
            )
            return pa.table(
                {
                    "key": pa.array(k, pa.int64()),
                    "vbits": pa.array(vbits, pa.int64()),
                    "side": pa.array(np.full(len(k), side, np.int64)),
                    "coarse": pa.array((k >> shift) % n_coarse),
                }
            )

        return fn

    both = ds_a.map_batches(keep_dirty(0), batch_format="pyarrow").union(
        ds_b.map_batches(keep_dirty(1), batch_format="pyarrow")
    )

    def compare(g: pd.DataFrame) -> pa.Table:
        k = g["key"].to_numpy()
        v = g["vbits"].to_numpy()
        s = g["side"].to_numpy()
        order = np.lexsort((s, k))
        k, v, s = k[order], v[order], s[order]
        n = len(k)
        is_start = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(is_start)
        sizes = np.diff(np.r_[starts, n])
        out_k: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        single = starts[sizes == 1]
        if len(single):
            out_k.append(k[single])
            # side 0 only -> added in A; side 1 only -> removed
            out_c.append(np.where(s[single] == 0, "added", "removed"))
        pair = starts[sizes == 2]
        if len(pair):
            diff = v[pair] != v[pair + 1]
            out_k.append(k[pair][diff])
            out_c.append(np.full(int(diff.sum()), "changed", dtype=object))
        if not out_k:
            return pa.table(
                {"key": pa.array([], pa.int64()), "change": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "key": pa.array(np.concatenate(out_k), pa.int64()),
                "change": pa.array(
                    np.concatenate(out_c).astype(str), pa.string()
                ),
            }
        )

    return both.groupby("coarse").map_groups(compare, batch_format="pandas")
