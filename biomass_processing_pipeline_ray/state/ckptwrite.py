"""Generic checkpointed partition writer — resumable output for ANY
Dataset, not just the biomass flagship.

Generalizes the salted per-key write of
``pipelines/biomass.biomass_zonal_checkpointed`` (reference analog: the
``processing_checkpoints`` upsert+resume protocol,
``database_manager_v3.py:529-614``) into a reusable operator:

    summary = checkpointed_partition_write(
        ds, out_dir, key_cols=["event_type"], salt_col="salt",
        summary_sums={"value_sum": "value"}, sort_by=["event_id"],
    )

Contract (identical to the flagship's, kill-tested there and here):

- partition id = ``<key1>[_<key2>…]_s<salt>``; each partition writes an
  idempotent parquet (``<key>=<v>/part-<salt>.parquet``) and then its
  atomic lineage marker — markers are the resume source of truth.
- a completed partition is SKIPPED on re-run (its summary row is
  recovered from lineage), so re-running after a kill recomputes only
  missing partitions and returns the identical summary frame.
- ``completed_partitions(out_dir)`` lets callers ALSO push the skip
  upstream (the flagship filters completed partitions before decode —
  do the same when the partition key is derivable before the expensive
  stage).
- ``salt_col`` is the north-rule skew defuser: a hot key becomes
  ``n_salts`` parallel groups.  The caller provides the column (e.g.
  ``id % n_salts``) so the salt is deterministic under resume.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from .checkpoint import CheckpointStore


def partition_id(key_vals: list, salt: int) -> str:
    return "_".join(str(v) for v in key_vals) + f"_s{int(salt)}"


def completed_partitions(out_dir: str) -> set[str]:
    """Completed partition ids (for upstream pre-filtering)."""
    return CheckpointStore(out_dir).completed()


def checkpointed_partition_write(
    ds,
    out_dir: str,
    key_cols: list[str],
    salt_col: str | None = None,
    summary_sums: dict[str, str] | None = None,
    sort_by: list[str] | None = None,
    resume: bool = True,
) -> pd.DataFrame:
    """Write ``ds`` as salted per-key checkpointed partitions; return
    the per-key summary frame (fresh + recovered), deterministic under
    resume.

    ``summary_sums``: output-name → source-column sums recorded in each
    partition's lineage summary (plus ``row_count`` always).
    ``sort_by``: within-partition deterministic order before writing.
    """
    store = CheckpointStore(out_dir, key_name=key_cols[0])
    done = store.completed() if resume else set()
    sums = summary_sums or {}
    group_cols = list(key_cols) + ([salt_col] if salt_col else [])

    def _summary_table(rows: list[dict]) -> pa.Table:
        cols: dict = {}
        for c in key_cols:
            cols[c] = pa.array([str(r[c]) for r in rows], pa.string())
        cols["salt"] = pa.array([r["salt"] for r in rows], pa.int64())
        cols["row_count"] = pa.array([r["row_count"] for r in rows], pa.int64())
        for out in sums:
            cols[out] = pa.array([r[out] for r in rows], pa.float64())
        return pa.table(cols)

    def write_part(group: pd.DataFrame) -> pa.Table:
        key_vals = [group[c].iloc[0] for c in key_cols]
        salt = int(group[salt_col].iloc[0]) if salt_col else 0
        part = partition_id(key_vals, salt)
        if part in done:
            # belt-and-braces: upstream pre-filtering should have
            # removed completed partitions; idempotent either way
            return _summary_table([])
        t0 = time.time()
        if sort_by:
            group = group.sort_values(sort_by, kind="mergesort")
        summary = {c: key_vals[i] for i, c in enumerate(key_cols)}
        summary["salt"] = salt
        summary["row_count"] = int(len(group))
        for out, src in sums.items():
            summary[out] = float(group[src].to_numpy().sum())
        store.write_partition(
            part,
            pa.Table.from_pandas(group, preserve_index=False),
            {
                "rows": int(len(group)),
                "summary": summary,
                "metrics": {"write_sec": time.time() - t0},
                "stage": "checkpointed_partition_write",
            },
            subdir=str(key_vals[0]),
            filename=f"part-{salt}.parquet",
        )
        return _summary_table([summary])

    fresh = (
        ds.groupby(group_cols)
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    recovered = []
    for part in sorted(done):
        rec = store.lineage(part)
        if rec and "summary" in rec:
            recovered.append(rec["summary"])
    subs = (
        pd.concat([fresh, pd.DataFrame(recovered)], ignore_index=True)
        if recovered
        else fresh
    )
    # deterministic merge order so full == resumed bit-wise
    subs = subs.sort_values(list(key_cols) + ["salt"], kind="mergesort")
    for c in key_cols:
        subs[c] = subs[c].astype(str)
    agg = {"row_count": ("row_count", "sum")}
    for out in sums:
        agg[out] = (out, "sum")
    out = subs.groupby(list(key_cols), as_index=False).agg(**agg)
    out["row_count"] = out["row_count"].astype(np.int64)
    out = out.sort_values(list(key_cols)).reset_index(drop=True)
    store.finalize_manifest()
    return out
