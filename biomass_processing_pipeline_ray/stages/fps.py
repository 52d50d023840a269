"""Farthest-point sampling (k-center greedy) over an embedding column —
the coreset / diversity-selection primitive (Gonzalez 1985 2-approx
k-center; "FPS" in the point-cloud and data-pruning literature): pick
the point farthest from everything chosen so far, k times.  Complements
``semdedup``/``prototype_select`` (which PRUNE redundancy) by SELECTING
a maximally-spread subset — the seed-set builder for active learning
and for diversity-quota curation.

Round shape (×k, deterministic by construction — the same exemplar
contract as ``stages/kmeans.py``):

- state (vec_id, snapped row, running max-sim) lives as Arrow block
  refs in the object store; each round launches ONE raw Ray task per
  block that folds the round's new center into the per-point
  max-similarity — incremental, so round r costs n·d, not n·r·d
  (recompute) — and returns (new-block ref, 3-field argmin partial).
  Raw tasks, not a Dataset pass: the Dataset API pays a full
  dataset-execution barrier per round (~0.4 s — 12.9 s at k=32 on
  5k vectors; the task loop runs the same rounds in task-launch
  latency).  This is the repo's designated raw-Ray use case: shared
  iterative state the Dataset API can't express without replay.
- the driver sees k × n_blocks tiny partials (min max-sim, tie →
  lowest vec_id, winner's row riding along) — never the data.

Bit-exact parity with the sequential oracle (no tolerance):

- rows L2-normalized then 2⁻²⁰-lattice-snapped (`kmeans.prep_rows`);
- similarities via the BLAS-free fixed-order `kmeans.dots` kernel
  (reduction order a function of d only, batch-shape-invariant);
- max(old, new) per point is order-free; argmin ties break to the
  lowest vec_id on both sides.

Reference analog: none (beyond-reference training-data operator); the
closest structural cousin in-repo is the Lloyd loop, with max-fold
state instead of partial sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import dots, prep_rows

_SENTINEL = -2.0  # below any cosine; rank-0 pick reports this


def _init_state(batch: pa.Table) -> pa.Table:
    from .ann import embedding_matrix

    ids, mat = embedding_matrix(batch)
    ids, mat = prep_rows(ids, mat)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "row": pa.array(list(mat), pa.list_(pa.float64())),
            "maxsim": pa.array(np.full(len(ids), _SENTINEL), pa.float64()),
        }
    )


def _state_mat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    col = batch["row"].combine_chunks() if isinstance(
        batch["row"], pa.ChunkedArray
    ) else batch["row"]
    flat = col.values.to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1)
    return ids, mat, batch["maxsim"].to_numpy()


def _fold_argmin(tbl: pa.Table, center, chosen: frozenset):
    """One round on one state block: fold the new center into maxsim,
    return (updated block, partial argmin tuple or None).  Pure — runs
    as a raw Ray task per block (`ray.remote` wrapper in fps_select)."""
    ids, mat, ms = _state_mat(tbl)
    if center is not None:
        sims = dots(mat, center[None, :])[:, 0]
        ms = np.maximum(ms, sims)
        tbl = pa.table(
            {
                "vec_id": tbl["vec_id"],
                "row": tbl["row"],
                "maxsim": pa.array(ms, pa.float64()),
            }
        )
    keep = np.asarray([i not in chosen for i in ids], dtype=bool)
    if not keep.any():
        return tbl, None
    ids_k, ms_k = ids[keep], ms[keep]
    j = np.lexsort((ids_k, ms_k))[0]
    src = np.flatnonzero(keep)[j]
    return tbl, (float(ms_k[j]), int(ids_k[j]), mat[src].copy())


def fps_select(ds, k: int):
    """embeddings Dataset → (rank, vec_id, sim_at_pick) pyarrow Table.

    ``sim_at_pick`` is the point's max cosine to the previously-chosen
    set at selection time (−2.0 sentinel for rank 0) — monotonically
    NON-decreasing in rank, the coverage-radius curve of the sample.

    The k-round loop runs as RAW Ray tasks over the state's Arrow
    block refs (one task per block per round, two returns: new-state
    ref + tiny partial) — the Dataset API cannot express an iterative
    fold without paying a full dataset-execution barrier per round
    (measured 0.4 s/round → 12.9 s at k=32; raw tasks cut the round
    to task-launch latency).  State blocks never leave the object
    store; the driver sees k × n_blocks 3-field partials only."""
    import ray

    state = ds.map_batches(_init_state, batch_format="pyarrow").materialize()
    refs = state.to_arrow_refs()
    fold_task = ray.remote(num_returns=2)(_fold_argmin)

    center = None
    picks: list[tuple[int, int, float]] = []
    chosen: frozenset = frozenset()
    # round 0 folds nothing (center=None): maxsim is the −2.0 sentinel
    # everywhere, so the argmin reduce seeds on the lowest vec_id
    for rank in range(k):
        outs = [fold_task.remote(r, center, chosen) for r in refs]
        refs = [o[0] for o in outs]
        partials = [p for p in ray.get([o[1] for o in outs]) if p is not None]
        win = min(partials, key=lambda p: (p[0], p[1]))
        picks.append((rank, win[1], win[0]))
        center = win[2]
        chosen = frozenset(p[1] for p in picks)

    return pa.table(
        {
            "rank": pa.array([p[0] for p in picks], pa.int64()),
            "vec_id": pa.array([p[1] for p in picks], pa.int64()),
            "sim_at_pick": pa.array([p[2] for p in picks], pa.float64()),
        }
    )
