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
