"""Polygon-clipped raster zonal stats — the reference's clip-to-geometry
path (M14/G1): county polygon → pixel-window mask → masked reduction.

Reference analog: ``blob_manager_v3.py:800-845`` (rasterio mask of the
parcel geometry) feeding ``landcover_analyzer_v3.py:224-263`` (per-zone
masked class stats).  Here each tile decodes once inside an actor-pool
stage, the ASSIGNED county's ring (broadcast, parsed once per actor) is
rasterized over the tile's pixel grid (``image/window.rasterize_ring``),
and ``masked_stats`` reduces the per-pixel NDVI-style values to per-tile
scalars — only narrow rows ever shuffle, the pixel payload dies in the
actor (SURVEY.md §7.4 wide-row rule).

Tile georeferencing: the tile centroid comes from the arithmetic georef
spec; the raster covers ``w×PIX_DEG × h×PIX_DEG`` degrees centered on
it.  ``PIX_DEG = 2^-13`` is exactly representable so bounds arithmetic
is bit-reproducible against the oracle generator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import georef as G
from ..functions.rounding import snap_binary
from ..image import codecs
from ..image.window import masked_stats, pixel_window, rasterize_ring
from ..sources.tiles import image_ids_to_int

PIX_DEG = 1.0 / 8192.0  # exact binary: ~13 m at these latitudes


class ClipZonalStage:
    """Actor: georef → PIP county → decode → clip mask → masked stats."""

    def __init__(self, counties_ref):
        import ray

        from ..geo.wkb import wkb_to_rings
        from .pip_join import PIPJoiner

        counties = ray.get(counties_ref)
        self.pip = PIPJoiner(counties_ref=counties_ref)
        self.rings = {
            f: wkb_to_rings(w)[0]
            for f, w in zip(
                counties["county_fips"].to_pylist(),
                counties["geometry_wkb"].to_pylist(),
            )
        }
        # county bbox for the interior fast path: a tile raster wholly
        # inside its county's bbox has an all-true mask (pixel centers
        # are strictly inside the rect), so rasterize is skipped and the
        # unmasked sum — bit-identical to the masked one — is used
        self.bbox = {
            f: (x0, y0, x1, y1)
            for f, x0, y0, x1, y1 in zip(
                counties["county_fips"].to_pylist(),
                counties["min_lon"].to_numpy(),
                counties["min_lat"].to_numpy(),
                counties["max_lon"].to_numpy(),
                counties["max_lat"].to_numpy(),
            )
        }
        import pandas as pd

        self._bbox_frame = pd.DataFrame.from_dict(
            self.bbox, orient="index", columns=["x0", "y0", "x1", "y1"]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        int_ids = image_ids_to_int(batch["image_id"])
        lon, lat = G.derive_lonlat(int_ids)
        batch = batch.append_column("tile_int_id", pa.array(int_ids, pa.int64()))
        batch = batch.append_column("lon", pa.array(lon))
        batch = batch.append_column("lat", pa.array(lat))
        batch = self.pip(batch)

        fips_col = batch["county_fips"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        n = len(bufs)
        n_px = np.zeros(n, dtype=np.int64)
        n_in = np.zeros(n, dtype=np.int64)
        val_sum = np.zeros(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        pixels: list = [None] * n
        known = np.asarray([f in self.rings for f in fips_col])
        for k in range(n):
            if not known[k]:
                continue
            try:
                pixels[k] = codecs.decode(bufs[k], fmts[k], int(hs[k]), int(ws[k]))
                ok[k] = True
            except Exception:
                continue  # corrupt payload: row flagged invalid, job survives
        # vectorized interior test (routing only — both paths bit-equal)
        bb = self._bbox_frame.reindex(fips_col).to_numpy(dtype=np.float64)
        half_w_all = ws * PIX_DEG * 0.5
        half_h_all = hs * PIX_DEG * 0.5
        with np.errstate(invalid="ignore"):
            interior = (
                (lon - half_w_all >= bb[:, 0])
                & (lat - half_h_all >= bb[:, 1])
                & (lon + half_w_all <= bb[:, 2])
                & (lat + half_h_all <= bb[:, 3])
            )
        # interior tiles: all-true mask → stacked vectorized sums per
        # (h, w) shape class (bit-identical to the masked flat sum)
        shape_key = hs.astype(np.int64) * 100000 + ws.astype(np.int64)
        for key in np.unique(shape_key):
            sel = np.flatnonzero((shape_key == key) & interior & ok)
            if len(sel) == 0:
                continue
            stack = np.stack([pixels[k] for k in sel])
            red = stack[:, :, :, 0].astype(np.float64)
            nir = stack[:, :, :, 2].astype(np.float64)
            v = (nir - red) / (nir + red + 1.0)
            h, w = stack.shape[1:3]
            n_px[sel] = h * w
            n_in[sel] = h * w
            val_sum[sel] = v.sum(axis=(1, 2))
        # boundary tiles: rasterize only the pixel WINDOW covering the
        # county bbox ∩ tile (M13 windowed-read semantics) — pixels
        # outside it are provably outside the polygon, and the windowed
        # masked sum selects the same pixels in the same row-major
        # order, so the result is bit-identical to a full-tile mask
        for k in np.flatnonzero(ok & ~interior):
            px = pixels[k]
            h, w = px.shape[:2]
            red = px[:, :, 0].astype(np.float64)
            nir = px[:, :, 2].astype(np.float64)
            v = (nir - red) / (nir + red + 1.0)
            half_w = w * PIX_DEG * 0.5
            half_h = h * PIX_DEG * 0.5
            bounds = (
                lon[k] - half_w,
                lat[k] - half_h,
                lon[k] + half_w,
                lat[k] + half_h,
            )
            n_px[k] = h * w
            x0, y0, x1, y1 = self.bbox[fips_col[k]]
            win = pixel_window(
                bounds,
                (
                    max(x0, bounds[0]),
                    max(y0, bounds[1]),
                    min(x1, bounds[2]),
                    min(y1, bounds[3]),
                ),
                h,
                w,
                buffer_px=1,
            )
            if win is None:
                continue  # tile entirely outside its county bbox: no overlap
            mask = rasterize_ring(self.rings[fips_col[k]], bounds, h, w, window=win)
            r0, r1, c0, c1 = win
            stats = masked_stats(v[r0:r1, c0:c1], mask)
            n_in[k] = stats["n_pixels"]
            val_sum[k] = stats["sum"]
        out = pa.table(
            {
                "tile_id": pa.array(int_ids, pa.int64()),
                "county_fips": batch["county_fips"],
                "n_px": pa.array(n_px),
                "n_in": pa.array(n_in),
                # lattice-snapped per-tile sums merge exactly in any order
                "val_sum": pa.array(snap_binary(val_sum)),
            }
        )
        return out.filter(pa.array(ok))


class ClipZonalStageFused(ClipZonalStage):
    """ClipZonalStage with the parquet read fused into the actor: input
    rows are file paths, the multi-GB pixel payload never enters the
    object store (same pattern as ``TileGeoStageFused``)."""

    COLUMNS = ["image_id", "bytes", "w", "h", "fmt"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tables = [
            pq.read_table(p, columns=self.COLUMNS)
            for p in batch["item"].to_pylist()
        ]
        return super().__call__(
            pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        )
