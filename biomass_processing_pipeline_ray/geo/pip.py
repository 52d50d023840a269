"""Vectorized point-in-polygon with a bbox grid index — the STRtree stand-in.

The reference does this join server-side in PostGIS (``ST_Intersects``,
``/root/reference/src/config/database_config_v3.py:82-92``) or with a
GeoPandas STRtree (``optimized_county_processor_v3.py:173-176``).
Shapely is unavailable here, so :class:`PolygonSet` holds every zone
polygon as flat edge arrays plus a uniform bbox grid for candidate
pruning, and answers "which county contains each of these N points" in
a handful of numpy kernels:

1. candidate (point, polygon) pairs from the bbox grid,
2. even-odd ray-cast crossing counts, fully vectorized over all
   (pair, edge) combinations via CSR edge offsets + ``np.repeat``,
3. tie rule: a point inside several polygons (shared boundary) goes to
   the lowest ``fips`` (documented in SURVEY.md §7.4; oracle matches).

The whole structure pickles cheaply, so it is built once on the driver,
``ray.put`` once, and rebuilt per actor in ``__init__`` — broadcast
hash-spatial-join, never a shuffle.
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb


class PolygonSet:
    """Immutable set of labeled polygons supporting batch PIP queries."""

    def __init__(self, labels: list[str], wkbs: list[bytes], grid_n: int = 64):
        order = np.argsort(np.asarray(labels, dtype=object))
        self.labels = np.asarray(labels, dtype=object)[order]
        vx, vy, ring_poly = [], [], []
        bboxes = np.empty((len(wkbs), 4), dtype=np.float64)
        for rank, src in enumerate(order):
            rings = _wkb.wkb_to_rings(wkbs[src])
            allx = np.concatenate([r[:, 0] for r in rings])
            ally = np.concatenate([r[:, 1] for r in rings])
            bboxes[rank] = (allx.min(), ally.min(), allx.max(), ally.max())
            for r in rings:
                # edges of a closed ring: (x[i],y[i]) -> (x[i+1],y[i+1])
                vx.append(r[:, 0])
                vy.append(r[:, 1])
                ring_poly.append(np.full(len(r) - 1, rank, dtype=np.int64))
        self.bboxes = bboxes
        # flat edge arrays grouped (and ordered) by polygon rank
        ex0 = np.concatenate([v[:-1] for v in vx])
        ey0 = np.concatenate([v[:-1] for v in vy])
        ex1 = np.concatenate([v[1:] for v in vx])
        ey1 = np.concatenate([v[1:] for v in vy])
        epoly = np.concatenate(ring_poly)
        eorder = np.argsort(epoly, kind="stable")
        self.ex0, self.ey0 = ex0[eorder], ey0[eorder]
        self.ex1, self.ey1 = ex1[eorder], ey1[eorder]
        counts = np.bincount(epoly, minlength=len(wkbs))
        self.edge_off = np.concatenate([[0], np.cumsum(counts)])
        # uniform grid over the union bbox: cell -> candidate polygon ranks
        self.gx0, self.gy0 = bboxes[:, 0].min(), bboxes[:, 1].min()
        gx1, gy1 = bboxes[:, 2].max(), bboxes[:, 3].max()
        self.grid_n = grid_n
        self.gw = max((gx1 - self.gx0) / grid_n, 1e-12)
        self.gh = max((gy1 - self.gy0) / grid_n, 1e-12)
        cell_lists: dict[int, list[int]] = {}
        for rank in range(len(wkbs)):
            x0, y0, x1, y1 = bboxes[rank]
            cx0 = int(np.clip((x0 - self.gx0) / self.gw, 0, grid_n - 1))
            cx1 = int(np.clip((x1 - self.gx0) / self.gw, 0, grid_n - 1))
            cy0 = int(np.clip((y0 - self.gy0) / self.gh, 0, grid_n - 1))
            cy1 = int(np.clip((y1 - self.gy0) / self.gh, 0, grid_n - 1))
            for cx in range(cx0, cx1 + 1):
                for cy in range(cy0, cy1 + 1):
                    cell_lists.setdefault(cx * grid_n + cy, []).append(rank)
        # CSR layout of the grid
        ncells = grid_n * grid_n
        lens = np.zeros(ncells + 1, dtype=np.int64)
        for c, lst in cell_lists.items():
            lens[c + 1] = len(lst)
        self.cell_off = np.cumsum(lens)
        flat = np.empty(self.cell_off[-1], dtype=np.int64)
        for c, lst in cell_lists.items():
            flat[self.cell_off[c] : self.cell_off[c + 1]] = lst
        self.cell_polys = flat

    def __len__(self) -> int:
        return len(self.labels)

    def _candidates(self, px: np.ndarray, py: np.ndarray):
        """(pair_point_idx, pair_poly_rank) for bbox-hit candidates."""
        n = self.grid_n
        cx = np.clip(((px - self.gx0) / self.gw).astype(np.int64), 0, n - 1)
        cy = np.clip(((py - self.gy0) / self.gh).astype(np.int64), 0, n - 1)
        cell = cx * n + cy
        start = self.cell_off[cell]
        stop = self.cell_off[cell + 1]
        cnt = stop - start
        pt_idx = np.repeat(np.arange(len(px)), cnt)
        # flat indices into cell_polys for each (point, slot)
        flat_idx = np.concatenate(
            [np.arange(s, e) for s, e in zip(start, stop)]
        ) if len(px) else np.empty(0, dtype=np.int64)
        poly = self.cell_polys[flat_idx] if len(flat_idx) else np.empty(0, dtype=np.int64)
        # exact bbox filter
        bb = self.bboxes[poly]
        keep = (
            (px[pt_idx] >= bb[:, 0])
            & (px[pt_idx] <= bb[:, 2])
            & (py[pt_idx] >= bb[:, 1])
            & (py[pt_idx] <= bb[:, 3])
        )
        return pt_idx[keep], poly[keep]

    def locate(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """For each point, index (rank) of the containing polygon, or -1.

        Ray-cast even-odd rule; points inside multiple polygons resolve
        to the lowest label (ranks are label-sorted).
        """
        px = np.ascontiguousarray(px, dtype=np.float64)
        py = np.ascontiguousarray(py, dtype=np.float64)
        pt_idx, poly = self._candidates(px, py)
        if len(pt_idx) == 0:
            return np.full(len(px), -1, dtype=np.int64)
        # expand candidate pairs over each polygon's edges
        e_start = self.edge_off[poly]
        e_cnt = self.edge_off[poly + 1] - e_start
        pair_id = np.repeat(np.arange(len(pt_idx)), e_cnt)
        edge_idx = np.concatenate(
            [np.arange(s, s + c) for s, c in zip(e_start, e_cnt)]
        )
        x = px[pt_idx][pair_id]
        y = py[pt_idx][pair_id]
        x0, y0 = self.ex0[edge_idx], self.ey0[edge_idx]
        x1, y1 = self.ex1[edge_idx], self.ey1[edge_idx]
        # half-open vertical span rule avoids double-counting vertices
        spans = (y0 <= y) != (y1 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
        crossing = spans & (x < xint)
        cross_count = np.bincount(pair_id, weights=crossing, minlength=len(pt_idx))
        inside = (cross_count.astype(np.int64) % 2) == 1
        result = np.full(len(px), np.iinfo(np.int64).max, dtype=np.int64)
        if inside.any():
            np.minimum.at(result, pt_idx[inside], poly[inside])
        result[result == np.iinfo(np.int64).max] = -1
        return result

    def locate_labels(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Like :meth:`locate` but returns labels ('' for outside)."""
        rank = self.locate(px, py)
        out = np.where(rank >= 0, self.labels[np.clip(rank, 0, None)], "")
        return out.astype(object)


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Standalone even-odd PIP of points against one ring (N,2)."""
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    spans = (y0[None, :] <= py) != (y1[None, :] <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (py - y0[None, :]) * (x1 - x0)[None, :] / (y1 - y0)[None, :]
    crossing = spans & (px < xint)
    return (crossing.sum(axis=1) % 2) == 1
