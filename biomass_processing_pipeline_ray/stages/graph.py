"""Iterative graph algorithms over edge Datasets (power iteration).

PageRank-style rank propagation expressed as per-iteration
co-partitioned exchanges — the same union-tag → coarse-bucket →
vectorized in-bucket merge dataflow as ``cluster.connected_components``
(no driver-side adjacency, no broadcast of the rank vector): each
iteration is (1) attach ranks to out-edges by co-bucketing edges on
``src`` with rank rows on ``node``, emitting lattice-snapped
contributions keyed by ``dst``; (2) co-bucket contributions with the
node universe and sum, producing the next rank table.  Rank values are
snapped to the 2^-20 lattice (``functions/rounding.snap_binary``) so
partial sums are order-free exact and the result hash-equals the
sequential DuckDB mirror.

Scale notes: the rank table is node-sized and stays distributed; both
hops shuffle only (edges + nodes) rows per iteration, bucketed by the
same coarse hash so group count stays ≫ cores but bounded.  At a real
10⁹-node graph the bucket count comes from ``cluster._adaptive_buckets``
sizing; iterations are a fixed small constant (power iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import snap_binary
from .cluster import _bucket_of


def _tag(key: np.ndarray, side: int, aux: np.ndarray | None,
         r: np.ndarray | None, nb: int) -> pa.Table:
    n = len(key)
    return pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "side": pa.array(np.full(n, side, dtype=np.int8), pa.int8()),
            "aux": pa.array(
                aux if aux is not None else np.zeros(n, dtype=np.int64), pa.int64()
            ),
            "r": pa.array(
                r if r is not None else np.zeros(n, dtype=np.float64), pa.float64()
            ),
            "bk": pa.array(_bucket_of(key, nb), pa.int64()),
        }
    )


def pagerank(edges, nodes, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85, teleport: float = 0.15,
             out_deg: int = 8, nb: int = 64):
    """(node, rank) after ``iters`` damped power iterations.

    ``edges``: Dataset of (src, dst) with CONSTANT out-degree
    ``out_deg`` per source (the kNN graph shape — each node emits
    exactly k edges), so the per-edge contribution is rank/out_deg with
    no per-node degree join.  ``nodes``: Dataset with a ``node`` int64
    column (the full universe; nodes without in-edges decay to the
    teleport term).  r₀ = 1.0.
    """

    def edge_rows(b: pa.Table) -> pa.Table:
        s = np.asarray(b[src].to_numpy(), dtype=np.int64)
        d = np.asarray(b[dst].to_numpy(), dtype=np.int64)
        return _tag(key=s, side=0, aux=d, r=None, nb=nb)

    def node_rows(b: pa.Table) -> pa.Table:
        k = np.asarray(b["node"].to_numpy(), dtype=np.int64)
        return _tag(key=k, side=1, aux=None, r=None, nb=nb)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()
    node_tagged = nodes.map_batches(node_rows, batch_format="pyarrow").materialize()

    def init_rank(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("r"),
            "r",
            pa.array(np.ones(len(b), dtype=np.float64), pa.float64()),
        )

    ranks = node_tagged.map_batches(init_rank, batch_format="pyarrow")

    # NOTE: ``teleport`` is a separate literal, NOT computed as
    # 1.0 - damping — the float64 results differ in the last bit and the
    # oracle SQL writes the literal; division by out_deg (not
    # multiplication by a reciprocal) likewise mirrors the SQL op.
    deg = float(out_deg)

    for _ in range(iters):
        # hop 1: edges(key=src) ⋈ ranks(key=node) → contributions keyed dst
        def contribute(g: pd.DataFrame) -> pa.Table:
            rmap = g[g["side"] == 1].set_index("key")["r"]
            e = g[g["side"] == 0]
            c = snap_binary(rmap.reindex(e["key"].to_numpy()).to_numpy() / deg)
            dst_ids = e["aux"].to_numpy(np.int64)
            # arrow output: unions with the arrow-blocked node/edge tables
            return pa.table(
                {
                    "key": pa.array(dst_ids, pa.int64()),
                    "side": pa.array(np.zeros(len(e), dtype=np.int8), pa.int8()),
                    "aux": pa.array(np.zeros(len(e), dtype=np.int64), pa.int64()),
                    "r": pa.array(c, pa.float64()),
                    "bk": pa.array(_bucket_of(dst_ids, nb), pa.int64()),
                }
            )

        contribs = (
            edge_tagged.union(ranks)
            .groupby("bk")
            .map_groups(contribute, batch_format="pandas")
        )

        # hop 2: contributions(key=dst) + node universe → next ranks
        def accumulate(g: pd.DataFrame) -> pa.Table:
            nodes_g = g[g["side"] == 1]["key"].to_numpy(np.int64)
            c = g[g["side"] == 0]
            s = (
                c.groupby("key")["r"].sum().reindex(nodes_g).fillna(0.0).to_numpy()
            )
            r_new = snap_binary(teleport + damping * s)
            return pa.table(
                {
                    "key": pa.array(nodes_g, pa.int64()),
                    "side": pa.array(np.ones(len(nodes_g), dtype=np.int8), pa.int8()),
                    "aux": pa.array(np.zeros(len(nodes_g), dtype=np.int64), pa.int64()),
                    "r": pa.array(r_new, pa.float64()),
                    "bk": pa.array(_bucket_of(nodes_g, nb), pa.int64()),
                }
            )

        # materialize each iteration: measured 3-4× FASTER than letting
        # the three iterations chain into one lazy DAG (stacked
        # union+groupby plans re-plan poorly; 17-27 s vs 72 s at n=4000)
        ranks = (
            contribs.union(node_tagged)
            .groupby("bk")
            .map_groups(accumulate, batch_format="pandas")
            .materialize()
        )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["key"], "rank": b["r"]})

    return ranks.map_batches(finish, batch_format="pyarrow")


# broadcast-rank threshold: ids + ranks = 16 B/node, 4M nodes = 64 MB —
# comfortably ray.put-able; beyond this the co-partitioned exchange
# path above is the design (a 10⁹-node rank vector cannot broadcast).
BROADCAST_NODE_LIMIT = 4_000_000


def pagerank_broadcast(edges, node_ids: np.ndarray, src: str = "src",
                       dst: str = "dst", iters: int = 3,
                       damping: float = 0.85, teleport: float = 0.15,
                       out_deg: int = 8, nb: int = 64):
    """Broadcast-rank power iteration — bit-identical to :func:`pagerank`
    (same snapped contributions, same op order), ONE bounded exchange
    per iteration instead of two:

    - the rank vector rides to every edge task via ``ray.put`` (no
      rank-side shuffle for the src join);
    - each edge batch pre-sums snapped contributions per ``dst``
      (combiner — lattice sums are order-free exact), so the single
      grouped aggregate moves ≤ distinct-dst rows per batch;
    - the node-sized aggregate lands on the driver (bounded by the same
      broadcast threshold) where the damping update is one vector op.

    Valid while the rank vector fits ``BROADCAST_NODE_LIMIT``; the
    caller (:func:`pagerank_auto`) switches paths on node count.
    """
    import ray

    from .zonal import bucketed_agg

    node_ids = np.sort(np.asarray(node_ids, dtype=np.int64))
    ids_ref = ray.put(node_ids)
    deg = float(out_deg)
    r = np.ones(len(node_ids), dtype=np.float64)

    edges_only = edges.map_batches(
        lambda b: pa.table(
            {
                "src": pa.array(b[src].to_numpy().astype(np.int64)),
                "dst": pa.array(b[dst].to_numpy().astype(np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        r_ref = ray.put(r)

        def contribute(b: pa.Table, _r=r_ref) -> pd.DataFrame:
            ids = ray.get(ids_ref)
            rv = ray.get(_r)
            s = b["src"].to_numpy()
            c = snap_binary(rv[np.searchsorted(ids, s)] / deg)
            g = (
                pd.DataFrame({"key": b["dst"].to_numpy(), "c": c})
                .groupby("key", as_index=False)["c"]
                .sum()
            )
            return g

        agg = bucketed_agg(
            edges_only.map_batches(contribute, batch_format="pyarrow"),
            ["key"],
            {"c": ("c", "sum")},
            nb=nb,
        ).to_pandas()
        s = (
            agg.set_index("key")["c"].reindex(node_ids).fillna(0.0).to_numpy()
        )
        r = snap_binary(teleport + damping * s)

    return pd.DataFrame({"node": node_ids, "rank": r})


def pagerank_auto(edges, nodes, **kw):
    """Dispatch: broadcast-rank fast path when the node universe fits
    the broadcast budget, co-partitioned exchanges otherwise.  Both
    paths are hash-identical (pytest-asserted)."""
    n = nodes.count()
    if n <= BROADCAST_NODE_LIMIT:
        ids = np.asarray(
            nodes.to_pandas()["node"].to_numpy(), dtype=np.int64
        )
        return pagerank_broadcast(edges, ids, **kw)
    return pagerank(edges, nodes, **kw)
