"""Similarity search over the embedding column (list<float>).

- ``cosine_topk``: brute-force cosine top-k per query — numpy matmul per
  batch against a broadcast query matrix (the baseline the prompt asks
  for).  Exact, deterministic (score desc, id asc).
- ``embedding_neardup_pairs``: near-dup pairs above a cosine threshold,
  co-partitioned by ``label`` (groupby) so each group is a small dense
  matmul — the LSH-bucketed scale path in miniature.

Scale note: at 10^9+ vectors the scale path is IVF — k-means-ish coarse
cells as the partition key (same shuffle skeleton as ``label`` here),
probing n nearest cells per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(n, 1e-30)


def embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, emb


class CosineTopK:
    """Actor: holds the (broadcast) query matrix; per batch one matmul."""

    def __init__(self, queries_ref=None, queries: dict | None = None, k: int = 10):
        if queries is None:
            import ray

            queries = ray.get(queries_ref)
        self.qids = np.asarray(queries["qid"], dtype=np.int64)
        self.qmat = _normalize(np.asarray(queries["mat"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = embedding_matrix(batch)
        emb = _normalize(emb)
        sims = self.qmat @ emb.T  # (nq, nbatch)
        qcol, vcol, scol = [], [], []
        for qi in range(len(self.qids)):
            s = sims[qi]
            mask = ids != self.qids[qi]  # exclude the query itself
            qcol.append(np.full(mask.sum(), self.qids[qi], dtype=np.int64))
            vcol.append(ids[mask])
            scol.append(s[mask])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qcol)),
                "vec_id": pa.array(np.concatenate(vcol)),
                "cos": pa.array(np.concatenate(scol)),
            }
        )


def cosine_topk(ds, queries_ref, k: int = 10):
    """Per-query exact top-k: per-batch partial top-k → final top-k.

    Partial top-k inside map_batches keeps the shuffle tiny (k rows per
    query per batch), then one small groupby finishes.
    """
    class PartialTopK(CosineTopK):
        def __call__(self, batch: pa.Table) -> pa.Table:
            full = super().__call__(batch)
            df = full.to_pandas()
            df = df.sort_values(
                ["query_id", "cos", "vec_id"], ascending=[True, False, True]
            )
            return pa.Table.from_pandas(
                df.groupby("query_id").head(k), preserve_index=False
            )

    partial = ds.map_batches(
        PartialTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_neardup_pairs(ds, threshold: float = 0.3):
    """Cosine-similar pairs within the same label group."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        emb = _normalize(np.asarray(list(g["embedding"]), dtype=np.float64))
        sims = emb @ emb.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] > threshold
        return pd.DataFrame(
            {
                "label": g["label"].iloc[0],
                "a": ids[ii][keep],
                "b": ids[jj][keep],
            }
        )

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")
