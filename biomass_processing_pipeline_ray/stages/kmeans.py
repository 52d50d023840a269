"""Distributed Lloyd k-means over an embedding column.

The full-data trainer for IVF coarse quantizers: ``stages/ann.py``
trains on a bounded hashed sample (fine for nlist≪n), but at 10⁹+
vectors the E-step itself must be distributed — this stage is that
path, and doubles as the engine's iterative-algorithm exemplar
(fixpoint loop ↔ per-round broadcast + combiner aggregate).

Round shape (×`n_iters`, fixed — deterministic by construction):

- centroids broadcast once per round (`ray.put`, k×d doubles);
- E-step + partial M-step fused in ONE `map_batches` pass: each batch
  assigns its rows (argmax cosine) and emits k partial rows
  (per-centroid vector sum + count) — the combiner pattern, so the
  shuffle moves k rows per batch, never the data;
- a k-group merge sums partials; k final rows reach the driver (a
  bounded pull), which forms the new centroids.

Bit-exact parity with the sequential oracle (no tolerance in the gate):

- rows are L2-normalized then snapped to the 2⁻²⁰ binary lattice →
  partial vector sums are EXACT in float64 in ANY summation order
  (|m|<2²⁰ per row, n·2²⁰ ≪ 2⁵³), so distributed == sequential sums;
- similarities use an explicit multiply+reduce kernel (`_dots`) whose
  reduction order depends only on d — BLAS matmul blocking varies with
  batch shape and is NOT bit-stable across row counts;
- argmax ties break to the lowest centroid index on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import georef as G
from ..functions.rounding import snap_binary
from .ann import _normalize, embedding_matrix


def dots(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) cosine sims with a fixed element-order reduction (numpy
    pairwise sum over axis 2, split points a function of d only) —
    bit-identical for any row batching, unlike BLAS ``mat @ cents.T``."""
    return (mat[:, None, :] * cents[None, :, :]).sum(axis=2)


def prep_rows(ids: np.ndarray, mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Normalize + lattice-snap: the exact-summable row representation."""
    return np.asarray(ids, dtype=np.int64), snap_binary(_normalize(mat))


def init_centroids(ds, k: int) -> np.ndarray:
    """Deterministic seed: the k rows with the smallest Knuth-hash of
    vec_id (id-decorrelated, shard-unbiased), in hash-ascending order,
    pulled via distributed partial top-k — k rows per batch reach the
    driver, never the table."""
    from .relational import topk

    def add_skey(b: pa.Table) -> pa.Table:
        skey = G.derive_key(b["vec_id"].to_numpy())
        return b.append_column("skey", pa.array(skey, pa.int64()))

    seed = topk(
        ds.map_batches(add_skey, batch_format="pyarrow"),
        by="skey",
        k=k,
        descending=False,
    )
    mat = np.asarray(list(seed["embedding"]), dtype=np.float64)
    _, cents = prep_rows(np.zeros(len(mat)), mat)
    return cents


def kmeans_fit(ds, k: int, n_iters: int = 4) -> np.ndarray:
    """Fixed-round distributed Lloyd fit → (k, d) centroids."""
    import ray

    cents = init_centroids(ds, k)
    d = cents.shape[1]

    for _ in range(n_iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            ids, mat = embedding_matrix(batch)
            _, mat = prep_rows(ids, mat)
            assign = np.argmax(dots(mat, c), axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, mat)  # lattice rows: exact any order
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums)),
                }
            )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            s = np.stack(g["s"].to_numpy()).sum(axis=0)  # lattice: exact
            return pd.DataFrame(
                {
                    "cid": [np.int64(g["cid"].iloc[0])],
                    "n": [np.int64(g["n"].sum())],
                    "s": [s],
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cid")
            .map_groups(merge, batch_format="pandas")
            .take_all()
        )  # k rows — bounded driver pull
        new = cents.copy()
        for r in rows:
            if r["n"] > 0:
                new[int(r["cid"])] = np.asarray(r["s"], dtype=np.float64) / np.float64(
                    r["n"]
                )
        _, cents = prep_rows(np.zeros(k), new)
    return cents


def kmeans_assign(ds, cents: np.ndarray):
    """Final E-step: (vec_id, centroid, cos) per row."""
    import ray

    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids, mat = embedding_matrix(batch)
        ids, mat = prep_rows(ids, mat)
        sims = dots(mat, c)
        best = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "centroid": pa.array(best.astype(np.int64)),
                "cos": pa.array(sims[np.arange(len(best)), best]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
