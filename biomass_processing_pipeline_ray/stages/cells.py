"""Cell-encoding stage: centroid → hex (H3-style) + S2 cell columns.

The batched analog of the reference's tile-id grid math
(``coordinate_utils_v3.py:250-358``) per SURVEY.md §2.2 M9/M10.
Stateless vectorized map_batches body — no actor needed.
"""

from __future__ import annotations

import pyarrow as pa

from ..geo import hexgrid, s2

DEFAULT_HEX_RES = 7
DEFAULT_S2_LEVEL = 13


class CellEncoder:
    """Adds ``hex_cell`` (int64) and ``s2_cell`` (uint64) columns."""

    def __init__(self, hex_res: int = DEFAULT_HEX_RES, s2_level: int = DEFAULT_S2_LEVEL):
        self.hex_res = hex_res
        self.s2_level = s2_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        hexes = hexgrid.latlng_to_cell(lon, lat, self.hex_res)
        s2c = s2.latlng_to_cell(lon, lat, self.s2_level)
        batch = batch.append_column("hex_cell", pa.array(hexes, pa.int64()))
        return batch.append_column("s2_cell", pa.array(s2c, pa.uint64()))


def encode_cells(batch: pa.Table, hex_res: int = DEFAULT_HEX_RES, s2_level: int = DEFAULT_S2_LEVEL) -> pa.Table:
    return CellEncoder(hex_res, s2_level)(batch)


# ---------------------------------------------------------------------------
# S2 cell-union compaction (CellUnion::Normalize): replace every
# complete set of 4 sibling cells by their parent, bottom-up, yielding
# the MINIMAL covering of the occupied cells.  The s2geometry public
# normalization algorithm, expressed as ONE Ray Data exchange:
# map_batches pre-combines per-cell tile counts (a hot cell contributes
# one partial row per batch, never per tile), the exchange key is the
# cell's min_level ancestor — every merge decision from from_level up
# to min_level happens strictly inside one min_level subtree, so each
# group compacts its subtrees independently with vectorized
# sort + run-length sibling detection.  At 10^12 tiles the group state
# is bounded by occupied cells per min_level subtree, not by tiles.
# Reference analogue: the multi-scale tile grid consolidation of
# /root/reference/src/core/coordinate_utils_v3.py (3-degree tile
# rollup); semantics per s2geometry.io CellUnion docs.
# ---------------------------------------------------------------------------


def compact_cells(
    ds,
    from_level: int = 11,
    min_level: int = 8,
    nb: int = 256,
):
    """Minimal S2 covering of occupied cells: (level, cell, n_tiles).

    ``ds`` must carry ``lon``/``lat`` columns; cells are encoded at
    ``from_level`` and complete sibling quads merge bottom-up until
    ``min_level``.  ``nb`` coarse buckets keyed by the min_level
    ancestor (hash-spread) bound group sizes.
    """
    import numpy as np
    import pandas as pd

    from ..geo import s2 as S2

    KNUTH = np.uint64(2654435761)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        cells = S2.latlng_to_cell(lon, lat, from_level)
        uniq, cnt = np.unique(cells, return_counts=True)
        anc = S2.parent(uniq, min_level)
        coarse = (((anc * KNUTH) >> np.uint64(16)) % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "coarse": pa.array(coarse),
                "cell": pa.array(uniq, pa.uint64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def compact_group(g: pd.DataFrame) -> pa.Table:
        cells = g["cell"].to_numpy().astype(np.uint64)
        n = g["n"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(cells, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, n)
        out_lvl: list[np.ndarray] = []
        out_cell: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        cur_c, cur_n = uniq, summed
        for lvl in range(from_level, min_level, -1):
            if len(cur_c) == 0:
                break
            par = S2.parent(cur_c, lvl - 1)
            order = np.argsort(par, kind="stable")
            par_s, c_s, n_s = par[order], cur_c[order], cur_n[order]
            starts = np.flatnonzero(np.r_[True, par_s[1:] != par_s[:-1]])
            ends = np.r_[starts[1:], len(par_s)]
            runlen = ends - starts
            complete = runlen == 4
            keep = np.repeat(~complete, runlen)
            if keep.any():
                out_lvl.append(np.full(int(keep.sum()), lvl, np.int64))
                out_cell.append(c_s[keep])
                out_n.append(n_s[keep])
            if complete.any():
                csum = np.concatenate([[0], np.cumsum(n_s)])
                runsum = csum[ends] - csum[starts]
                cur_c = par_s[starts[complete]]
                cur_n = runsum[complete]
            else:
                cur_c = np.empty(0, np.uint64)
                cur_n = np.empty(0, np.int64)
        if len(cur_c):
            out_lvl.append(np.full(len(cur_c), min_level, np.int64))
            out_cell.append(cur_c)
            out_n.append(cur_n)
        if not out_cell:
            return pa.table(
                {
                    "level": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.uint64()),
                    "n_tiles": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "level": pa.array(np.concatenate(out_lvl)),
                "cell": pa.array(np.concatenate(out_cell), pa.uint64()),
                "n_tiles": pa.array(np.concatenate(out_n)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(compact_group, batch_format="pandas")
    )
