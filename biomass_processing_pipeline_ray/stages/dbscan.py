"""Grid-bucketed distributed DBSCAN over 2-D points — density
clustering (Ester et al., KDD '96) with deterministic tie rules so the
result is oracle-comparable:

- **core** point: ≥ ``minpts`` points in its CLOSED eps-disk
  (including itself);
- **cluster** = connected component of the core-core ≤ eps graph,
  labeled by the component's minimum point id;
- **border** (non-core within eps of ≥ 1 core) joins the MINIMUM
  cluster label among its in-range cores (classic DBSCAN is
  visit-order-dependent here; min-label makes it deterministic);
- everything else is noise, ``cluster = -1``.

Scale design: points land in square grid cells of side ``cell ≥ eps``
and replicate to their 3×3 cell neighborhood (bounded 9× fan-out), so
every eps-neighborhood is complete inside one cell group — neighbor
counting and edge emission are per-cell dense-matrix ops with NO
all-pairs stage.  Cells co-partition by a coarse hash bucket and each
bucket sorts once, slicing per-cell blocks (the repo-wide
bounded-group pattern).  Cluster resolution is TWO-LEVEL: the
core-core graph is first CONTRACTED inside each cell (vectorized
min-label over the cell's native-native pairs → one representative
per local component), cross-cell edges are rewritten rep→rep by one
co-partitioned pass, and only the contracted graph — orders of
magnitude fewer edges on supercritical instances — goes through
``connected_components_auto`` (driver-vectorized labeling when
bounded, the banded min-label rounds above the cap).  Labels map back
to every core through the (node, rep) mapping in one more
co-partitioned pass; label assembly stays three coalesce passes keyed
by point id — nothing node-sized ever sits on the driver.  Exactness:
a rep is its local component's min id, so the component-min over reps
IS the component-min node id — contraction changes no label.

The default ``cell = 4·eps`` trades 3×3-window slack for fewer,
denser cells (≈ 25 natives / cell at the default occupancy), keeping
the per-cell loop count low while the dense distance blocks stay
tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MINPTS = 6          # >= 5 genuine neighbors (closed disk includes self)
TARGET_OCCUPANCY = 5.0  # mean points per eps-disk the eps rule targets
CELL_FACTOR = 4.0   # grid cell side = CELL_FACTOR * eps


def dbscan_eps(n: int, area: float) -> float:
    """eps such that a uniform scatter of n points over ``area`` has
    TARGET_OCCUPANCY expected points per eps-disk — keeps the
    core/border/noise mix scale-invariant as n grows."""
    return float(np.sqrt(TARGET_OCCUPANCY * area / (np.pi * float(n))))


_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cells(x: np.ndarray, y: np.ndarray, cell: float):
    cx = np.floor(x / cell).astype(np.int64)
    cy = np.floor(y / cell).astype(np.int64)
    return cx, cy


def _replicate(b: pa.Table, cols: list[str], cell: float, nb: int) -> pa.Table:
    """9× ghost replication to the 3×3 cell neighborhood; native rows
    flagged.  Cell key packs (cx, cy) into one int64 (cy ≥ 0 here:
    the lat/lon domain keeps y positive; callers with negative y
    should shift first)."""
    x = b["x"].to_numpy().astype(np.float64)
    y = b["y"].to_numpy().astype(np.float64)
    cx, cy = _cells(x, y, cell)
    n = len(x)
    out: dict[str, np.ndarray] = {
        c: np.tile(b[c].to_numpy(), len(_OFFS)) for c in cols
    }
    key = np.concatenate(
        [(cx + dx) * np.int64(1 << 20) + (cy + dy) for dx, dy in _OFFS]
    )
    nat = np.zeros(n * len(_OFFS), dtype=np.int8)
    nat[4 * n : 5 * n] = 1  # offset (0, 0) is the 5th of _OFFS
    return pa.table(
        {
            **{c: pa.array(out[c]) for c in cols},
            "cellk": pa.array(key, pa.int64()),
            "nat": pa.array(nat, pa.int8()),
            "cbk": pa.array(key % nb, pa.int64()),
        }
    )


def _per_cell(g: pd.DataFrame, fn) -> list:
    """Sort one coarse bucket by cell key and call ``fn`` per cell."""
    kk = g["cellk"].to_numpy(np.int64)
    order = np.argsort(kk, kind="mergesort")
    kk = kk[order]
    starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
    ends = np.r_[starts[1:], len(kk)]
    res = []
    for s0, s1 in zip(starts, ends):
        res.append(fn(order[s0:s1]))
    return res


def dbscan(ds, id_col: str, eps: float, minpts: int = MINPTS, nb: int = 64):
    """``ds`` carries (id_col int64, x float64, y float64 with y ≥ 0);
    returns a Dataset of (id_col, cluster) over EVERY input point."""
    from .zonal import bucketed_agg

    eps2 = eps * eps
    cell = CELL_FACTOR * eps

    # -- pass 1: exact neighbor counts -> core flags (complete within
    # the home cell: ghosts cover every point within eps); coords ride
    # along so pass 2 needs no join
    def count_pass(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        nat = g["nat"].to_numpy(np.int8)

        def one(ix: np.ndarray):
            nm = nat[ix] == 1
            if not nm.any():
                return None
            xi, yi = x[ix][nm], y[ix][nm]
            d2 = (xi[:, None] - x[ix][None, :]) ** 2 + (
                yi[:, None] - y[ix][None, :]
            ) ** 2
            cnt = (d2 <= eps2).sum(axis=1)
            return ids[ix][nm], (cnt >= minpts), xi, yi

        parts = [p for p in _per_cell(g, one) if p is not None]
        if parts:
            fid = np.concatenate([p[0] for p in parts])
            fcore = np.concatenate([p[1] for p in parts])
            fx = np.concatenate([p[2] for p in parts])
            fy = np.concatenate([p[3] for p in parts])
        else:
            fid = np.empty(0, dtype=np.int64)
            fcore = np.empty(0, dtype=bool)
            fx = np.empty(0, dtype=np.float64)
            fy = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                id_col: pa.array(fid, pa.int64()),
                "core": pa.array(fcore.astype(np.int8), pa.int8()),
                "x": pa.array(fx, pa.float64()),
                "y": pa.array(fy, pa.float64()),
            }
        )

    flags = (
        ds.map_batches(
            lambda b: _replicate(b, [id_col, "x", "y"], cell, nb),
            batch_format="pyarrow",
        )
        .groupby("cbk")
        .map_groups(count_pass, batch_format="pandas")
        .materialize()  # consumed 3x (edge pass, core rows, all rows);
        # n rows of 4 narrow columns
    )

    # -- pass 2: re-replicate the flagged points; per cell CONTRACT the
    # local core-core graph (native-native pairs resolve to one local
    # min-id representative per in-cell component) and emit only
    #   kind 3: (native core id, local rep)        -- the mapping
    #   kind 1: (rep, in-range ghost core id)      -- cross-cell edges,
    #           deduped per (rep, ghost)
    #   kind 2: (non-core native, in-range core)   -- border candidates
    # The global components then run over the contracted rep graph —
    # edge count drops from O(occupancy × n) in-range pairs to
    # O(#local components × boundary degree), which on supercritical
    # instances is what keeps the fixpoint rounds (or the broadcast
    # fast path) off the full pair set.
    def edge_pass(g: pd.DataFrame) -> pa.Table:
        from .cluster import _min_label_components

        ids = g[id_col].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        nat = g["nat"].to_numpy(np.int8)
        core = g["core"].to_numpy(np.int8)

        def one(ix: np.ndarray):
            nm = nat[ix] == 1
            if not nm.any():
                return None
            aid, ax, ay, acore = ids[ix], x[ix], y[ix], core[ix]
            nid, nx_, ny_, ncore = aid[nm], ax[nm], ay[nm], acore[nm]
            d2 = (nx_[:, None] - ax[None, :]) ** 2 + (
                ny_[:, None] - ay[None, :]
            ) ** 2
            inr = d2 <= eps2
            is_ghost = nat[ix] == 0
            # native-native core pairs (lower id emits; feeds the
            # bucket-level local contraction)
            ni, nj = np.nonzero(
                inr[:, nm]
                & (ncore[:, None] == 1)
                & (ncore[None, :] == 1)
                & (nid[:, None] < nid[None, :])
            )
            # native core -> ghost core pairs (cross-cell edges)
            xi, xj = np.nonzero(
                inr
                & (ncore[:, None] == 1)
                & (acore[None, :] == 1)
                & is_ghost[None, :]
            )
            # border candidates: non-core native -> in-range core
            bi, bj = np.nonzero(
                inr & (ncore[:, None] == 0) & (acore[None, :] == 1)
            )
            return (
                nid[ni], nid[nj],          # native-native core pairs
                nid[xi], aid[xj],          # native core -> ghost core
                nid[bi], aid[bj],          # border candidates
                nid[ncore == 1],           # native core ids of the cell
            )

        parts = [p for p in _per_cell(g, one) if p is not None]

        def cat(k: int) -> np.ndarray:
            if parts:
                return np.concatenate([p[k] for p in parts])
            return np.empty(0, dtype=np.int64)

        nn_a, nn_b = cat(0), cat(1)
        cx_a, cx_b = cat(2), cat(3)
        bd_a, bd_b = cat(4), cat(5)
        ncores = cat(6)
        # local contraction: cells are disjoint node sets, so one
        # vectorized min-label pass over the whole bucket's native-native
        # pairs yields exactly the per-cell components
        rep = ncores.copy()
        if len(nn_a):
            cn, cl = _min_label_components(nn_a, nn_b)
            pos = np.searchsorted(cn, ncores)
            hit = (pos < len(cn)) & (cn[np.minimum(pos, len(cn) - 1)] == ncores)
            rep[hit] = cl[pos[hit]]
        # substitute reps into the cross edges and dedup (rep, ghost)
        if len(cx_a):
            order = np.argsort(ncores, kind="mergesort")
            srt, srt_rep = ncores[order], rep[order]
            cx_a = srt_rep[np.searchsorted(srt, cx_a)]
            o = np.lexsort((cx_b, cx_a))
            cx_a, cx_b = cx_a[o], cx_b[o]
            keep = np.r_[True, (cx_a[1:] != cx_a[:-1]) | (cx_b[1:] != cx_b[:-1])]
            cx_a, cx_b = cx_a[keep], cx_b[keep]
        kind = np.concatenate(
            [
                np.ones(len(cx_a), np.int8),
                np.full(len(bd_a), 2, np.int8),
                np.full(len(ncores), 3, np.int8),
            ]
        )
        return pa.table(
            {
                "kind": pa.array(kind, pa.int8()),
                "a": pa.array(np.concatenate([cx_a, bd_a, ncores]), pa.int64()),
                "b": pa.array(np.concatenate([cx_b, bd_b, rep]), pa.int64()),
            }
        )

    combined = (
        flags.map_batches(
            lambda b: _replicate(b, [id_col, "x", "y", "core"], cell, nb),
            batch_format="pyarrow",
        )
        .groupby("cbk")
        .map_groups(edge_pass, batch_format="pandas")
        .materialize()  # consumed twice (edges + candidates); bounded
        # by the in-range pair count ~ occupancy × n
    )

    def kind_only(k: int):
        def f(b: pa.Table) -> pa.Table:
            m = b["kind"].to_numpy() == k
            return pa.table(
                {
                    "a": pa.array(b["a"].to_numpy()[m], pa.int64()),
                    "b": pa.array(b["b"].to_numpy()[m], pa.int64()),
                }
            )

        return f

    cross = combined.map_batches(kind_only(1), batch_format="pyarrow")
    cands = combined.map_batches(kind_only(2), batch_format="pyarrow")
    mapping = combined.map_batches(kind_only(3), batch_format="pyarrow")

    # -- resolve the ghost side of each cross edge to ITS local rep:
    # one co-partitioned pass keyed on the ghost core id (tag 0 = the
    # node's mapping row, tag 1 = cross edges naming it)
    def map_key_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["a"],
                "val": b["b"],
                "tag": pa.array(np.zeros(len(b), np.int8), pa.int8()),
            }
        )

    def cross_key_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["b"],
                "val": b["a"],
                "tag": pa.array(np.ones(len(b), np.int8), pa.int8()),
            }
        )

    def resolve_ghost(g: pd.DataFrame) -> pa.Table:
        key = g["key"].to_numpy(np.int64)
        val = g["val"].to_numpy(np.int64)
        tag = g["tag"].to_numpy(np.int8)
        o = np.lexsort((tag, key))
        key, val, tag = key[o], val[o], tag[o]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        sizes = np.diff(np.r_[starts, len(key)])
        rep_per_row = np.repeat(val[starts], sizes)  # tag-0 sorts first
        take = tag == 1
        return pa.table(
            {
                "a": pa.array(val[take], pa.int64()),
                "b": pa.array(rep_per_row[take], pa.int64()),
            }
        )

    def add_kb(col: str):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "kb",
                pa.array(b[col].to_numpy().astype(np.int64) % nb, pa.int64()),
            )

        return f

    contracted = (
        mapping.map_batches(map_key_rows, batch_format="pyarrow")
        .union(cross.map_batches(cross_key_rows, batch_format="pyarrow"))
        .map_batches(add_kb("key"), batch_format="pyarrow")
        .repartition(nb // 4)
        .groupby("kb")
        .map_groups(resolve_ghost, batch_format="pandas")
    )

    # global components over the CONTRACTED rep graph (auto: broadcast
    # labeling when the contracted edge set is bounded, the banded
    # min-label rounds above the cap)
    from .cluster import connected_components_auto

    cc_rep = connected_components_auto(contracted, "a", "b")

    # -- map labels back to every core: rep -> component label joins the
    # (node, rep) mapping, co-partitioned on rep; reps outside the cross
    # graph label themselves (their component is cell-local)
    def map_rep_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["b"],
                "val": b["a"],
                "tag": pa.array(np.ones(len(b), np.int8), pa.int8()),
            }
        )

    def cc_rep_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["node"],
                "val": b["lbl"],
                "tag": pa.array(np.zeros(len(b), np.int8), pa.int8()),
            }
        )

    def label_back(g: pd.DataFrame) -> pa.Table:
        key = g["key"].to_numpy(np.int64)
        val = g["val"].to_numpy(np.int64)
        tag = g["tag"].to_numpy(np.int8)
        o = np.lexsort((tag, key))
        key, val, tag = key[o], val[o], tag[o]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        sizes = np.diff(np.r_[starts, len(key)])
        # tag-0 (cc label) sorts first per key when present, else the
        # key labels itself
        first_val = np.where(tag[starts] == 0, val[starts], key[starts])
        lbl_per_row = np.repeat(first_val, sizes)
        take = tag == 1
        return pa.table(
            {
                "node": pa.array(val[take], pa.int64()),
                "lbl": pa.array(lbl_per_row[take], pa.int64()),
            }
        )

    cc = (
        mapping.map_batches(map_rep_rows, batch_format="pyarrow")
        .union(cc_rep.map_batches(cc_rep_rows, batch_format="pyarrow"))
        .map_batches(add_kb("key"), batch_format="pyarrow")
        .repartition(nb // 4)
        .groupby("kb")
        .map_groups(label_back, batch_format="pandas")
    )

    def add_idb(b: pa.Table, col: str) -> pa.Table:
        return b.append_column(
            "idb", pa.array(b[col].to_numpy().astype(np.int64) % nb, pa.int64())
        )

    # -- coalesce 1: core labels = CC label, else self (singleton core)
    def core_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        core = b["core"].to_numpy().astype(np.int8)
        k = ids[core == 1]
        return pa.table(
            {
                "id": pa.array(k, pa.int64()),
                "pri": pa.array(np.ones(len(k), np.int64), pa.int64()),
                "lbl": pa.array(k, pa.int64()),
            }
        )

    def cc_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["node"],
                "pri": pa.array(
                    np.full(len(b), 2, dtype=np.int64), pa.int64()
                ),
                "lbl": b["lbl"],
            }
        )

    def pick_max_pri(g: pd.DataFrame) -> pa.Table:
        ids = g["id"].to_numpy(np.int64)
        pri = g["pri"].to_numpy(np.int64)
        lbl = g["lbl"].to_numpy(np.int64)
        o = np.lexsort((-pri, ids))
        ids, lbl = ids[o], lbl[o]
        first = np.r_[True, ids[1:] != ids[:-1]]
        return pa.table(
            {
                "id": pa.array(ids[first], pa.int64()),
                "lbl": pa.array(lbl[first], pa.int64()),
            }
        )

    core_lbl = (
        flags.map_batches(core_rows, batch_format="pyarrow")
        .union(cc.map_batches(cc_rows, batch_format="pyarrow"))
        .map_batches(lambda b: add_idb(b, "id"), batch_format="pyarrow")
        .repartition(nb // 4)  # coalesce below key count: more sort
        # splits than populated idb keys emit schema-less empty blocks
        .groupby("idb")
        .map_groups(pick_max_pri, batch_format="pandas")
    )

    # -- coalesce 2: border -> min core-cluster label, co-partitioned
    # on the CORE id (cands.b == core_lbl.id)
    def cand_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["b"],
                "pri": pa.array(np.zeros(len(b), np.int64), pa.int64()),
                "val": b["a"],
            }
        )

    def lbl_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["id"],
                "pri": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "val": b["lbl"],
            }
        )

    def resolve(g: pd.DataFrame) -> pa.Table:
        key = g["key"].to_numpy(np.int64)
        pri = g["pri"].to_numpy(np.int64)
        val = g["val"].to_numpy(np.int64)
        o = np.lexsort((-pri, key))
        key, pri, val = key[o], pri[o], val[o]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        sizes = np.diff(np.r_[starts, len(key)])
        lbl_per_row = np.repeat(val[starts], sizes)
        take = pri == 0  # border rows (label row sorts first per key)
        return pa.table(
            {
                "bid": pa.array(val[take], pa.int64()),
                "blbl": pa.array(lbl_per_row[take], pa.int64()),
            }
        )

    border_min = bucketed_agg(
        cands.map_batches(cand_rows, batch_format="pyarrow")
        .union(core_lbl.map_batches(lbl_rows, batch_format="pyarrow"))
        .map_batches(lambda b: add_idb(b, "key"), batch_format="pyarrow")
        .repartition(nb // 4)
        .groupby("idb")
        .map_groups(resolve, batch_format="pandas")
        .repartition(4),  # borders are a small fraction; keep the
        # final min-merge's splits below its bucket count
        ["bid"],
        {"lbl": ("blbl", "min")},
        nb=16,
    )

    # -- coalesce 3: every point -> core label | border label | -1
    def all_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "pri": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "lbl": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            }
        )

    def lbl1_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["id"],
                "pri": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "lbl": b["lbl"],
            }
        )

    def blbl_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["bid"],
                "pri": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "lbl": b["lbl"],
            }
        )

    out = (
        flags.map_batches(all_rows, batch_format="pyarrow")
        .union(core_lbl.map_batches(lbl1_rows, batch_format="pyarrow"))
        .union(border_min.map_batches(blbl_rows, batch_format="pyarrow"))
        .map_batches(lambda b: add_idb(b, "id"), batch_format="pyarrow")
        .repartition(nb // 4)
        .groupby("idb")
        .map_groups(pick_max_pri, batch_format="pandas")
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["id"], "cluster": b["lbl"]})

    return out.map_batches(rename, batch_format="pyarrow")
