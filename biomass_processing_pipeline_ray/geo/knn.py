"""Exact k-nearest-neighbor lookup over tile centroids, grid-bucketed.

Plays the reference's FIA radius join (``ST_DWithin … ORDER BY distance
LIMIT 50``, ``/root/reference/src/config/database_config_v3.py:104-114``)
and the STRtree/sindex nearest lookups
(``optimized_county_processor_v3.py:305-321``): for each tile, the k
nearest *other* tiles with a deterministic (distance², id) total order,
feeding the inverse-distance-weighted stitch
(``forest_analyzer_v3.py:194-243`` semantics: weight = 1/(d+0.01)).

scipy's KD-tree is unavailable; this is a uniform-grid bucket index with
ring expansion and a proven stopping bound (any point outside Chebyshev
ring R of the query's bucket is at Euclidean distance ≥ R·cell), so
results are EXACT — required for DuckDB-oracle equality.

Queries are processed grouped by bucket (queries sharing a bucket share
candidate sets), so the inner work is vectorized numpy.

Scale note (10^12 rows): one global GridKNN would not fit; the design
point is per-super-cell sharding — partition tiles by a coarse hex cell,
run GridKNN per shard with a halo of neighboring cells (the reference's
radius cap plays the same role).  ``halo_from`` supports that layout.
"""

from __future__ import annotations

import numpy as np

# fast-path query block size — see GridKNN.query docstring
_QUERY_BLOCK = 512


class GridKNN:
    def __init__(self, x: np.ndarray, y: np.ndarray, ids: np.ndarray, target_per_bucket: float = 12.0):
        self.x = np.ascontiguousarray(x, dtype=np.float64)
        self.y = np.ascontiguousarray(y, dtype=np.float64)
        self.ids = np.asarray(ids, dtype=np.int64)  # int ids → fast, lexsort-able
        n = max(len(self.x), 1)
        self.x0, self.y0 = (self.x.min(), self.y.min()) if n and len(self.x) else (0.0, 0.0)
        span_x = (self.x.max() - self.x0) if len(self.x) else 1.0
        span_y = (self.y.max() - self.y0) if len(self.y) else 1.0
        area = max(span_x * span_y, 1e-12)
        self.cell = max(np.sqrt(area * target_per_bucket / n), 1e-9)
        self.nx = int(span_x / self.cell) + 1
        self.ny = int(span_y / self.cell) + 1
        bx = np.clip(((self.x - self.x0) / self.cell).astype(np.int64), 0, self.nx - 1)
        by = np.clip(((self.y - self.y0) / self.cell).astype(np.int64), 0, self.ny - 1)
        bucket = bx * self.ny + by
        order = np.argsort(bucket, kind="stable")
        self.order = order
        sorted_bucket = bucket[order]
        # CSR over occupied buckets via searchsorted
        self.sorted_bucket = sorted_bucket

    def _bucket_slice(self, b: int) -> np.ndarray:
        lo = np.searchsorted(self.sorted_bucket, b, side="left")
        hi = np.searchsorted(self.sorted_bucket, b, side="right")
        return self.order[lo:hi]

    def _ring_members(self, cbx: int, cby: int, ring: int) -> np.ndarray:
        """Point indices in buckets at Chebyshev distance == ring."""
        cells = []
        if ring == 0:
            cells.append((cbx, cby))
        else:
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if max(abs(dx), abs(dy)) != ring:
                        continue
                    cells.append((cbx + dx, cby + dy))
        out = []
        for gx, gy in cells:
            if 0 <= gx < self.nx and 0 <= gy < self.ny:
                s = self._bucket_slice(gx * self.ny + gy)
                if len(s):
                    out.append(s)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)

    def query(self, qx: np.ndarray, qy: np.ndarray, qids: np.ndarray, k: int):
        """Exact kNN for each query point, excluding the query's own id.

        Returns (neighbor_idx [n,k] int64 into the index arrays, padded
        with -1; d2 [n,k] float64, padded with +inf).  Neighbors are in
        (d2, id) ascending order — the documented deterministic order.

        Strategy: a fully VECTORIZED 5×5-bucket fast path answers every
        query in one batch of numpy ops (gather the ring≤2 neighborhood
        for all queries at once via CSR expansion, one segmented
        (d2, id) sort); a query is accepted iff its k-th neighbor is
        provably closer than anything outside the gathered rings
        (kth < 2·cell — the same bound the ring walk uses), else it
        falls back to the per-bucket ring walk.  With the index sized at
        ~12 points/bucket the fast path answers ~100 % of queries, so
        the per-query Python loop (~130 µs each, the old hot spot of the
        kNN stitch stage) is gone from the hot path.

        Queries run in blocks of ``_QUERY_BLOCK``: the fast path's
        temporaries (candidate arrays + the dense finalist matrices)
        must stay a few MB, because multi-MB fresh allocations in many
        concurrent Ray workers collapse on this class of host (measured
        ~200× on 32-way: large per-call buffers → concurrent page-fault
        storms; blocked: faster than the walk, flat under parallelism).
        """
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        qids = np.asarray(qids, dtype=np.int64)
        n = len(qx)
        if n > _QUERY_BLOCK:
            parts = [
                self.query(qx[i : i + _QUERY_BLOCK],
                           qy[i : i + _QUERY_BLOCK],
                           qids[i : i + _QUERY_BLOCK], k)
                for i in range(0, n, _QUERY_BLOCK)
            ]
            return (
                np.concatenate([p[0] for p in parts], axis=0),
                np.concatenate([p[1] for p in parts], axis=0),
            )
        out_idx = np.full((n, k), -1, dtype=np.int64)
        out_d2 = np.full((n, k), np.inf, dtype=np.float64)
        if n == 0 or len(self.x) == 0:
            return out_idx, out_d2
        R = 2
        qbx = np.clip(((qx - self.x0) / self.cell).astype(np.int64), 0, self.nx - 1)
        qby = np.clip(((qy - self.y0) / self.cell).astype(np.int64), 0, self.ny - 1)
        offs = np.arange(-R, R + 1)
        bx = (qbx[:, None] + offs[None, :])[:, :, None]  # (n, 5, 1)
        by = (qby[:, None] + offs[None, :])[:, None, :]  # (n, 1, 5)
        valid = (bx >= 0) & (bx < self.nx) & (by >= 0) & (by < self.ny)
        bucket = np.where(valid, bx * self.ny + by, -1).reshape(n, (2 * R + 1) ** 2)
        lo = np.searchsorted(self.sorted_bucket, bucket, side="left")
        hi = np.searchsorted(self.sorted_bucket, bucket, side="right")
        cnt = np.where(bucket >= 0, hi - lo, 0)
        counts_q = cnt.sum(axis=1)
        flat_lo, flat_cnt = lo.ravel(), cnt.ravel()
        total = int(flat_cnt.sum())
        accepted = np.zeros(n, dtype=bool)
        if total:
            # CSR expansion of the [lo, lo+cnt) ranges, no Python loop
            ends = flat_cnt.cumsum()
            pos = (
                np.arange(total)
                - np.repeat(ends - flat_cnt, flat_cnt)
                + np.repeat(flat_lo, flat_cnt)
            )
            cand = self.order[pos]
            qidx = np.repeat(np.arange(n), counts_q)
            dx = self.x[cand] - qx[qidx]
            dy = self.y[cand] - qy[qidx]
            d2 = dx * dx + dy * dy
            d2[self.ids[cand] == qids[qidx]] = np.inf  # exclude self by id
            # scatter the query-major candidate runs into a dense padded
            # (n, Cmax) matrix, then ROW-WISE argpartition keeps k+16
            # finalists per query — avoids a 3-key lexsort over the full
            # candidate set (the all-candidates sort was the former cost
            # center); only the tiny finalist matrix is (d2, id)-sorted
            cmax = int(counts_q.max())
            seg_starts = counts_q.cumsum() - counts_q
            col = np.arange(total) - np.repeat(seg_starts, counts_q)
            D = np.full((n, cmax), np.inf)
            I = np.full((n, cmax), np.iinfo(np.int64).max, dtype=np.int64)
            C = np.full((n, cmax), -1, dtype=np.int64)
            D[qidx, col] = d2
            I[qidx, col] = self.ids[cand]
            C[qidx, col] = cand
            m = min(k + 16, cmax)
            if m < cmax:
                part = np.argpartition(D, m - 1, axis=1)[:, :m]
                Dp = np.take_along_axis(D, part, axis=1)
                Ip = np.take_along_axis(I, part, axis=1)
                Cp = np.take_along_axis(C, part, axis=1)
            else:
                Dp, Ip, Cp = D, I, C
            rowsort = np.lexsort((Ip, Dp))  # per-row (d2, id) ascending
            kk = min(k, Dp.shape[1])
            sel = rowsort[:, :kk]
            out_d2[:, :kk] = np.take_along_axis(Dp, sel, axis=1)
            out_idx[:, :kk] = np.take_along_axis(Cp, sel, axis=1)
            out_idx[~np.isfinite(out_d2)] = -1
            # acceptance: (a) ring bound — everything outside rings 0..2
            # is ≥ 2·cell from any point of the center bucket (the
            # walk's rule); (b) partition bound — when the finalist cut
            # dropped candidates, the k-th kept distance must beat the
            # cut boundary strictly, else an exact-tie group could span
            # it (same guard as the brute-force kNN oracle)
            kth = out_d2[:, k - 1] if k <= kk else np.full(n, np.inf)
            accepted = np.isfinite(kth) & (np.sqrt(kth) < 2 * self.cell)
            if m < cmax:
                cut = np.take_along_axis(
                    Dp, rowsort[:, -1:], axis=1
                ).ravel()
                accepted &= (kth < cut) | (counts_q <= m)
        if not accepted.all():
            fi = np.flatnonzero(~accepted)
            fidx, fd2 = self._query_ring_walk(qx[fi], qy[fi], qids[fi], k)
            out_idx[fi] = fidx
            out_d2[fi] = fd2
        return out_idx, out_d2

    def _query_ring_walk(self, qx: np.ndarray, qy: np.ndarray, qids: np.ndarray, k: int):
        """Per-bucket expanding ring walk — the general-case path (and
        the fast path's fallback for sparse neighborhoods)."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        n = len(qx)
        out_idx = np.full((n, k), -1, dtype=np.int64)
        out_d2 = np.full((n, k), np.inf, dtype=np.float64)
        qbx = np.clip(((qx - self.x0) / self.cell).astype(np.int64), 0, self.nx - 1)
        qby = np.clip(((qy - self.y0) / self.cell).astype(np.int64), 0, self.ny - 1)
        qbucket = qbx * self.ny + qby
        order = np.argsort(qbucket, kind="stable")
        max_ring = max(self.nx, self.ny)
        i = 0
        while i < n:
            j = i
            b = qbucket[order[i]]
            while j < n and qbucket[order[j]] == b:
                j += 1
            grp = order[i:j]
            i = j
            cbx, cby = int(b // self.ny), int(b % self.ny)
            cand = np.empty(0, dtype=np.int64)
            gx_, gy_, gid_ = qx[grp], qy[grp], qids[grp]
            done = False
            for ring in range(0, max_ring + 2):
                members = self._ring_members(cbx, cby, ring)
                if len(members):
                    cand = np.concatenate([cand, members])
                if len(cand) == 0:
                    continue
                # worst query point in this bucket: distance bound uses
                # ring r ⇒ everything farther is ≥ (ring)·cell away
                bound = ring * self.cell
                cx, cy = self.x[cand], self.y[cand]
                dx = cx[None, :] - gx_[:, None]
                dy = cy[None, :] - gy_[:, None]
                d2 = dx * dx + dy * dy
                # exclude self by id
                self_mask = self.ids[cand][None, :] == gid_[:, None]
                d2 = np.where(self_mask, np.inf, d2)
                if d2.shape[1] >= k:
                    kth = np.partition(d2, k - 1, axis=1)[:, k - 1]
                    if np.all(np.sqrt(kth) < bound) or ring >= max_ring + 1:
                        done = True
                elif ring >= max_ring + 1:
                    done = True
                if done:
                    kk = min(k, d2.shape[1])
                    # total order (d2, id): lexsort per row
                    for row, g in enumerate(grp):
                        dr = d2[row]
                        sel = np.lexsort((self.ids[cand], dr))[:kk]
                        sel = sel[np.isfinite(dr[sel])]
                        out_idx[g, : len(sel)] = cand[sel]
                        out_d2[g, : len(sel)] = dr[sel]
                    break
        return out_idx, out_d2
