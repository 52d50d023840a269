"""CRS transforms (M11) and pixel-window/rasterize (M13/M14) vs oracles."""

import numpy as np
import pytest

from biomass_processing_pipeline_ray.geo import crs
from biomass_processing_pipeline_ray.image import window as W


def test_utm_zone_and_epsg():
    assert crs.utm_zone(np.asarray([-89.0]))[0] == 16  # Illinois
    assert crs.utm_zone(np.asarray([-91.6]))[0] == 15
    assert crs.utm_zone(np.asarray([0.5]))[0] == 31
    assert crs.utm_epsg(np.asarray([-89.0]), np.asarray([40.0]))[0] == 32616
    assert crs.utm_epsg(np.asarray([-89.0]), np.asarray([-40.0]))[0] == 32716


def test_utm_roundtrip_subcentimeter():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-91.5, -87.5, 500)
    lat = rng.uniform(37.0, 42.5, 500)
    e, n, z = crs.wgs84_to_utm(lon, lat)
    lon2, lat2 = crs.utm_to_wgs84(e, n, z)
    # series truncation grows toward zone edges; 2e-8 deg ≈ 2 mm
    assert np.abs(lon2 - lon).max() < 2e-8
    assert np.abs(lat2 - lat).max() < 2e-8


def test_utm_anchor_properties():
    # point on the central meridian of zone 16 (-87) → easting 500000
    e, n, z = crs.wgs84_to_utm(np.asarray([-87.0]), np.asarray([40.0]))
    assert z[0] == 16
    assert e[0] == pytest.approx(500000.0, abs=1e-6)
    # equator → northing 0
    e, n, _ = crs.wgs84_to_utm(np.asarray([-87.0]), np.asarray([0.0]))
    assert n[0] == pytest.approx(0.0, abs=1e-6)
    # one degree of latitude ≈ 110.9–111.0 km of northing at 40°N
    e1, n1, _ = crs.wgs84_to_utm(np.asarray([-88.0]), np.asarray([40.0]))
    e2, n2, _ = crs.wgs84_to_utm(np.asarray([-88.0]), np.asarray([41.0]))
    assert 110_500 < n2[0] - n1[0] < 111_500
    # southern hemisphere false northing
    _, ns, _ = crs.wgs84_to_utm(np.asarray([-87.0]), np.asarray([-1.0]))
    assert ns[0] > 9_000_000


def test_pixel_window_clipping():
    bounds = (-90.0, 40.0, -89.0, 41.0)  # 1°×1° tile
    h = w = 100  # 0.01° pixels
    # interior bbox
    win = W.pixel_window(bounds, (-89.6, 40.4, -89.4, 40.6), h, w, buffer_px=0)
    r0, r1, c0, c1 = win
    # float-conservative: window covers the exact [40, 60] range and may
    # over-approximate by at most one pixel per side (never cuts data)
    assert c0 in (39, 40) and c1 in (60, 61)
    assert r0 in (39, 40) and r1 in (60, 61)
    # buffer grows the window by 2 px each side
    win_b = W.pixel_window(bounds, (-89.6, 40.4, -89.4, 40.6), h, w, buffer_px=2)
    assert win_b == (r0 - 2, r1 + 2, c0 - 2, c1 + 2)
    # bbox partially outside clips to the tile
    assert W.pixel_window(bounds, (-90.5, 40.9, -89.9, 41.5), h, w, buffer_px=0) == (
        0,
        11,
        0,
        10,
    )
    # disjoint bbox → None
    assert W.pixel_window(bounds, (-88.0, 40.0, -87.5, 41.0), h, w) is None


def test_rasterize_ring_matches_bruteforce():
    bounds = (-90.0, 40.0, -89.0, 41.0)
    h = w = 64
    # diamond polygon centered in the tile
    ring = np.asarray(
        [
            [-89.5, 40.9],
            [-89.1, 40.5],
            [-89.5, 40.1],
            [-89.9, 40.5],
            [-89.5, 40.9],
        ]
    )
    mask = W.rasterize_ring(ring, bounds, h, w)
    lon, lat = W.pixel_centers(bounds, h, w)
    # brute force: |dx|/0.4 + |dy|/0.4 <= 1 (diamond metric)
    exp = (np.abs(lon + 89.5) / 0.4 + np.abs(lat - 40.5) / 0.4) < 1.0
    assert (mask == exp).mean() > 0.995  # boundary pixels may differ
    # area sanity: diamond area = 2*0.4*0.4 = 0.32 deg² of 1 deg² tile
    assert mask.mean() == pytest.approx(0.32, abs=0.02)
    # windowed rasterize agrees with the full-mask slice
    win = W.pixel_window(bounds, (-89.9, 40.1, -89.1, 40.9), h, w, buffer_px=0)
    sub = W.rasterize_ring(ring, bounds, h, w, window=win)
    r0, r1, c0, c1 = win
    assert np.array_equal(sub, mask[r0:r1, c0:c1])


def test_masked_stats():
    vals = np.arange(16.0).reshape(4, 4)
    mask = vals >= 8
    s = W.masked_stats(vals, mask)
    assert s["n_pixels"] == 8
    assert s["sum"] == float(np.arange(8, 16).sum())
    assert s["mean"] == pytest.approx(11.5)
    empty = W.masked_stats(vals, np.zeros_like(mask))
    assert empty["n_pixels"] == 0 and np.isnan(empty["mean"])


def test_clip_zonal_stage_interior_fast_path(ray_session):
    """The interior (all-true mask) fast path must equal the rasterized
    path bit-for-bit, and boundary tiles must clip some pixels."""
    import ray

    from biomass_processing_pipeline_ray.sources import tiles as T
    from biomass_processing_pipeline_ray.sources.counties import rect_counties
    from biomass_processing_pipeline_ray.stages.clipzonal import ClipZonalStage

    tbl = T.gen_tiles_batch(np.arange(300))
    ref = ray.put(rect_counties())
    stage = ClipZonalStage(counties_ref=ref)
    out = stage(tbl).to_pandas().sort_values("tile_id").reset_index(drop=True)
    assert len(out) == 300
    # most tiles are interior (mask all-true); some boundary tiles clip
    full = out[out.n_in == out.n_px]
    clipped = out[out.n_in < out.n_px]
    assert len(full) > 250 and len(clipped) > 0

    # both paths (interior stacked sums AND windowed boundary rasterize)
    # must match the independent per-edge rasterizer oracle bit-for-bit
    from biomass_processing_pipeline_ray.functions.rounding import snap_binary
    from biomass_processing_pipeline_ray.pipelines.oracles import _clip_oracle_chunk

    exp = _clip_oracle_chunk(np.arange(300)).to_pandas()
    assert np.array_equal(out.n_px.to_numpy(), exp.n_px.to_numpy())
    assert np.array_equal(out.n_in.to_numpy(), exp.n_in.to_numpy())
    assert np.array_equal(
        out.val_sum.to_numpy(), snap_binary(exp.val_sum.to_numpy())
    )


def test_fused_decode_clip_equals_standalone(ray_session):
    """TileGeoStage(emit_clip=True) — the single-decode-pass fusion —
    must emit clip columns bit-identical to the standalone
    ClipZonalStage (and therefore to the per-edge rasterizer oracle),
    while still producing the headline ndvi/biomass columns."""
    import ray

    from biomass_processing_pipeline_ray.pipelines.biomass import TileGeoStage
    from biomass_processing_pipeline_ray.sources import tiles as T
    from biomass_processing_pipeline_ray.sources.counties import rect_counties
    from biomass_processing_pipeline_ray.stages.clipzonal import ClipZonalStage

    tbl = T.gen_tiles_batch(np.arange(300))
    ref = ray.put(rect_counties())
    standalone = (
        ClipZonalStage(counties_ref=ref)(tbl)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    fused_tbl = TileGeoStage(
        counties_ref=ref, emit_clip=True, encode_cells=False, stitch_knn=False
    )(tbl)
    fused = fused_tbl.to_pandas()
    fused = (
        fused[fused.clip_ok]
        .sort_values("tile_int_id")
        .reset_index(drop=True)
    )
    assert len(fused) == len(standalone) == 300
    for col in ("n_px", "n_in", "val_sum"):
        assert np.array_equal(
            fused[col].to_numpy(), standalone[col].to_numpy()
        ), col
    # headline scalars still present and finite on the same rows
    assert np.isfinite(fused.ndvi.to_numpy()).all()
    assert np.isfinite(fused.biomass.to_numpy()).all()


def test_fused_decode_grad_thumb_equals_standalone(ray_session):
    """decode_batch(emit_grad=True, emit_thumb=True) — the round-4
    curation-sweep fusion — must emit gradient energy and thumbnail
    stats bit-identical to the standalone ImageGradientStage /
    ImageResizeStage kernels, from the same single decode pass."""
    from biomass_processing_pipeline_ray.sources import tiles as T
    from biomass_processing_pipeline_ray.stages.decode import decode_batch
    from biomass_processing_pipeline_ray.stages.multimodal import (
        ImageGradientStage,
        ImageResizeStage,
    )

    tbl = T.gen_tiles_batch(np.arange(300))
    fused = (
        decode_batch(tbl, emit_grad=True, emit_thumb=True)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    grad = (
        ImageGradientStage()(tbl)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    thumb = (
        ImageResizeStage()(tbl)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert fused.shape_ok.all()
    assert np.array_equal(fused.grad.to_numpy(), grad.grad.to_numpy())
    assert np.array_equal(
        fused.thumb_phash.to_numpy(), thumb.thumb_phash.to_numpy()
    )
    assert np.array_equal(
        fused.thumb_mean.to_numpy(), thumb.thumb_mean.to_numpy()
    )
