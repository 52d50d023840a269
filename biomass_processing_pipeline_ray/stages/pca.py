"""Distributed PCA over the embedding column — the
whitening / dimensionality-reduction step every embedding-heavy
curation pipeline runs before clustering or indexing (reference has no
analog; the nearest public pattern is scikit-learn's covariance-eigh
PCA solver, computed here from exact integer moments instead).

Scale design:

- **One streaming pass of exact integer Gram partials.**  Each batch
  quantizes its vectors to fixed-point int64 (``Q = 2^20``; the
  synthetic embeddings live in (-1, 1)) and emits ONE bounded row —
  ``n``, the d component sums, and the d(d+1)/2 upper-triangle Gram
  sums.  Per-batch products stay under 2^52 for batches ≤ 4096 rows,
  so the partial row is overflow-free int64.
- **Arbitrary-precision merge.**  Cross-batch Gram sums exceed int64
  beyond ~10⁶ rows × 2^40-scale products, so the bounded partial rows
  (one per batch) merge on the driver with Python ints — exact at any
  row count; the merged state is d(d+1)/2 integers, independent of n.
- **Bounded driver eigendecomposition.**  The exact centered scatter
  ``M = n·G − S·Sᵀ`` (Python ints) converts to the float64 covariance
  with ONE canonical expression (``float(M_ij) / (n·n·Q·Q)``), so the
  oracle reproduces the matrix bit-identically and ``np.linalg.eigh``
  (same LAPACK, same input) returns bit-identical eigenvectors.  Sign
  is fixed deterministically (largest-|component| entry positive) and
  the top-k eigenvectors quantize to int64 (``VQ = 2^20``).
- **Second streaming pass projects every row** through the broadcast
  quantized eigenbasis: an int64 matmul (exact in any order) plus the
  canonical centering expression, so engine and oracle agree bitwise
  before the 6-dp rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_away
from .ann import embedding_matrix

Q = float(1 << 20)   # embedding fixed-point quantum
VQ = float(1 << 20)  # eigenvector fixed-point quantum


def quantize(emb: np.ndarray) -> np.ndarray:
    return round_away(emb * Q, 0).astype(np.int64)


def gram_partials(ds, d: int):
    """n / Σx / upper-triangle Σxxᵀ as ONE bounded int64 row per batch."""
    iu, ju = np.triu_indices(d)

    def partial(b: pa.Table) -> pa.Table:
        _, emb = embedding_matrix(b)
        if emb.shape[1] != d:
            raise ValueError(f"dim {emb.shape[1]} != {d}")
        xq = quantize(emb)
        g = xq.T @ xq
        return pa.table(
            {
                "n": pa.array([len(xq)], pa.int64()),
                "s": pa.array([xq.sum(axis=0).tolist()], pa.list_(pa.int64())),
                "g": pa.array([g[iu, ju].tolist()], pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)


def fit_eigenbasis(partials_df, d: int, k: int):
    """Merge bounded partial rows (Python-int exact) and eigh the
    canonical covariance.  Returns (vq int64 (d,k), svq list[int],
    n, eigvals desc)."""
    n = int(sum(int(x) for x in partials_df["n"]))
    if n < 2:
        raise ValueError("need >= 2 rows")
    s = [0] * d
    m = d * (d + 1) // 2
    g = [0] * m
    for srow, grow in zip(partials_df["s"], partials_df["g"]):
        for i, v in enumerate(srow):
            s[i] += int(v)
        for i, v in enumerate(grow):
            g[i] += int(v)

    iu, ju = np.triu_indices(d)
    denom = float(n) * float(n) * Q * Q
    cov = np.zeros((d, d), dtype=np.float64)
    for t in range(m):
        i, j = int(iu[t]), int(ju[t])
        cov[i, j] = cov[j, i] = float(n * g[t] - s[i] * s[j]) / denom

    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    vecs = v[:, order]
    for c in range(vecs.shape[1]):
        if vecs[np.argmax(np.abs(vecs[:, c])), c] < 0:
            vecs[:, c] = -vecs[:, c]
    vq = round_away(vecs * VQ, 0).astype(np.int64)
    svq = [int(sum(s[i] * int(vq[i, c]) for i in range(d))) for c in range(k)]
    return vq, svq, n, w[order]


def project(ds, vq: np.ndarray, svq: list[int], n: int):
    """Exact-int projection + canonical centering; 6-dp rounded."""
    k = vq.shape[1]
    nd = float(n)
    scale = Q * VQ
    svqd = [float(x) for x in svq]

    def proj(b: pa.Table) -> pa.Table:
        ids, emb = embedding_matrix(b)
        p2 = quantize(emb) @ vq  # int64, exact in any order
        cols: dict[str, pa.Array] = {"vec_id": pa.array(ids, pa.int64())}
        for c in range(k):
            pc = (p2[:, c].astype(np.float64) - svqd[c] / nd) / scale
            cols[f"pc{c + 1}"] = pa.array(round_away(pc, 6), pa.float64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow")
