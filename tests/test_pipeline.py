import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomass_processing_pipeline_ray.functions import georef as G
from biomass_processing_pipeline_ray.image import codecs
from biomass_processing_pipeline_ray.sources import tiles as T


def _oracle_frame(n):
    """Brute-force per-tile expectations (independent of the Ray stages)."""
    ids = np.arange(n, dtype=np.int64)
    lon, lat = G.derive_lonlat(ids)
    cx, cy = G.derive_county_xy(lon, lat)
    fips = G.county_fips_from_xy(cx, cy)
    ndvi = np.empty(n)
    biomass = np.empty(n)
    for i in range(n):
        px = T.make_pixels(i)
        dims = T.tile_dims(np.asarray([i]))
        fmt = T.FMTS[int(dims[2][0])]
        # decode through the codec so lossy tiles use decoded pixels
        dec = codecs.decode(codecs.encode(px, fmt), fmt, px.shape[0], px.shape[1])
        red = dec[:, :, 0].astype(np.float64)
        nir = dec[:, :, 2].astype(np.float64)
        ndvi[i] = np.mean((nir - red) / (nir + red + 1.0))
        area_m2 = dec.shape[0] * dec.shape[1] * 10.0 * 10.0
        biomass[i] = (ndvi[i] + 1.0) * area_m2 * 0.01
    return pd.DataFrame(
        {
            "tile_int_id": ids,
            "lon": lon,
            "lat": lat,
            "county_fips": fips.astype(str),
            "ndvi": ndvi,
            "biomass": biomass,
        }
    )


def test_fixture_row_invariants(ray_session, tiles_small):
    """FIXTURES.md §4: pixel fidelity, caption equality, shape, phash."""
    from biomass_processing_pipeline_ray.image import phash as PH

    tbl = pq.read_table(tiles_small)
    df = tbl.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(df) == 1000
    for i in (0, 1, 17, 500, 999):
        row = df.iloc[i]
        iid = int(row.image_id[3:])
        dec = codecs.decode(row["bytes"], row.fmt, row.h, row.w)
        orig = T.make_pixels(iid)
        assert dec.shape == (row.h, row.w, 3)
        if row.fmt in ("png", "raw"):
            assert np.array_equal(dec, orig)
        else:
            assert codecs.psnr(orig, dec) >= 40.0
        assert PH.dhash(dec) == row.phash
        assert row.caption.startswith(f"synthetic tile {row.image_id} ")


def test_assignments_match_oracle(ray_session, tiles_small):
    from biomass_processing_pipeline_ray.pipelines.biomass import build_assignments

    ds = build_assignments(tiles_small, n_tiles=1000)
    got = ds.to_pandas().sort_values("tile_int_id").reset_index(drop=True)
    exp = _oracle_frame(1000)
    assert len(got) == 1000
    assert np.array_equal(got.county_fips.to_numpy(), exp.county_fips.to_numpy())
    assert np.allclose(got.ndvi, exp.ndvi, rtol=0, atol=0)  # exact: same decode
    assert np.allclose(got.biomass, exp.biomass, rtol=0, atol=0)
    assert got.phash_ok.all() and got.shape_ok.all()
    # captions pass through byte-equal
    assert got.caption.iloc[5] == f"synthetic tile {got.image_id.iloc[5]} at lon {got.lon.iloc[5]:.4f} lat {got.lat.iloc[5]:.4f}"
    # kNN spot-check vs brute force on derived centroids
    ids = np.arange(1000, dtype=np.int64)
    lon, lat = G.derive_lonlat(ids)
    for i in (3, 77, 500):
        dx = lon - lon[i]
        dy = lat - lat[i]
        d2 = dx * dx + dy * dy
        d2[i] = np.inf
        sel = np.lexsort((ids, d2))[:8]
        expect = ",".join(str(s) for s in sel)
        assert got.knn_ids.iloc[i] == expect


def test_zonal_matches_pandas_groupby(ray_session, tiles_small):
    from biomass_processing_pipeline_ray.pipelines.biomass import biomass_zonal

    got = (
        biomass_zonal(tiles_small, n_tiles=1000)
        .to_pandas()
        .sort_values("county_fips")
        .reset_index(drop=True)
    )
    exp = _oracle_frame(1000)
    g = exp.groupby("county_fips").agg(
        tile_count=("biomass", "size"),
        biomass_sum=("biomass", "sum"),
        ndvi_mean=("ndvi", "mean"),
    ).reset_index()
    from biomass_processing_pipeline_ray.functions.rounding import round_away

    assert np.array_equal(got.county_fips.to_numpy(), g.county_fips.to_numpy())
    assert np.array_equal(got.tile_count.to_numpy(), g.tile_count.to_numpy())
    # zonal output rounds sums/means to 4 decimals (round-half-away)
    assert np.allclose(got.biomass_sum, round_away(g.biomass_sum, 4), atol=1e-9)
    assert np.allclose(got.ndvi_mean, round_away(g.ndvi_mean, 4), atol=1e-9)


def test_checkpoint_resume(ray_session, tiles_small, tmp_path):
    """FIXTURES.md §5: two-phase run == uninterrupted run, no recompute."""
    import os

    from biomass_processing_pipeline_ray.pipelines.biomass import (
        biomass_zonal_checkpointed,
    )
    from biomass_processing_pipeline_ray.state.checkpoint import CheckpointStore

    out_a = str(tmp_path / "full")
    full = biomass_zonal_checkpointed(tiles_small, out_a, n_tiles=1000)

    # interrupted run: pre-mark half the counties as done by running a full
    # pass, then deleting the other half's manifest entries
    out_b = str(tmp_path / "twophase")
    biomass_zonal_checkpointed(tiles_small, out_b, n_tiles=1000)
    store = CheckpointStore(out_b)
    done = sorted(store.completed())
    half = done[: len(done) // 2]
    for fips in done[len(done) // 2 :]:
        store.invalidate(fips)
    mtimes_before = {
        f: os.path.getmtime(os.path.join(store.lineage_dir, f"{f}.json")) for f in half
    }
    resumed = biomass_zonal_checkpointed(tiles_small, out_b, n_tiles=1000, resume=True)
    # completed counties were not recomputed (lineage untouched)
    for f in half:
        assert os.path.getmtime(os.path.join(store.lineage_dir, f"{f}.json")) == mtimes_before[f]
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), resumed.reset_index(drop=True)
    )


def test_corrupt_tiles_do_not_poison_zonal(ray_session, tmp_path):
    """A corrupt payload (NaN ndvi/biomass) must not NaN an entire
    county: both zonal paths exclude flagged rows and agree exactly."""
    import pyarrow as pa

    from biomass_processing_pipeline_ray.pipelines.biomass import (
        biomass_zonal,
        biomass_zonal_checkpointed,
    )
    from biomass_processing_pipeline_ray.sources import tiles as T2

    n = 200
    tbl = T2.gen_tiles_batch(np.arange(n))
    bufs = tbl["bytes"].to_pylist()
    corrupt = {7, 42, 141}
    for i in corrupt:
        bufs[i] = b"\x00garbage"
    tbl = tbl.set_column(
        tbl.column_names.index("bytes"), "bytes", pa.array(bufs, pa.binary())
    )
    fix_dir = tmp_path / "corrupt_tiles"
    fix_dir.mkdir()
    pq.write_table(tbl, str(fix_dir / "part-0.parquet"))

    fast = (
        biomass_zonal(str(fix_dir), n_tiles=n)
        .to_pandas()
        .sort_values("county_fips")
        .reset_index(drop=True)
    )
    assert int(fast.tile_count.sum()) == n - len(corrupt)
    assert np.isfinite(fast.biomass_sum).all() and np.isfinite(fast.ndvi_mean).all()

    ckpt = biomass_zonal_checkpointed(
        str(fix_dir), str(tmp_path / "ckpt"), n_tiles=n
    ).reset_index(drop=True)
    assert int(ckpt.tile_count.sum()) == n - len(corrupt)
    assert np.isfinite(ckpt.biomass_sum).all() and np.isfinite(ckpt.ndvi_mean).all()
    # the two paths agree on counts and (to rounding) on sums/means
    assert np.array_equal(fast.county_fips.to_numpy(), ckpt.county_fips.to_numpy())
    assert np.array_equal(fast.tile_count.to_numpy(), ckpt.tile_count.to_numpy())
    assert np.allclose(fast.biomass_sum, ckpt.biomass_sum, atol=1e-4)
    assert np.allclose(fast.ndvi_mean, ckpt.ndvi_mean, atol=1e-4)


def test_skewed_county_salted_writes(ray_session, tiles_small, tmp_path):
    """North-rule skew handling: ONE county holding 100% of tiles is
    split into n_salts parallel sub-partitions, output stays exact."""
    import numpy as np
    import pyarrow as pa

    from biomass_processing_pipeline_ray.functions import georef as G
    from biomass_processing_pipeline_ray.geo import wkb as W
    from biomass_processing_pipeline_ray.pipelines.biomass import (
        biomass_zonal_checkpointed,
    )
    from biomass_processing_pipeline_ray.state.checkpoint import CheckpointStore

    one_county = pa.table(
        {
            "county_fips": pa.array(["99999"], pa.string()),
            "geometry_wkb": pa.array(
                [
                    W.rect_wkb(
                        G.LON0, G.LAT0, G.LON0 + G.LON_SPAN, G.LAT0 + G.LAT_SPAN
                    )
                ],
                pa.binary(),
            ),
            "min_lon": [G.LON0],
            "min_lat": [G.LAT0],
            "max_lon": [G.LON0 + G.LON_SPAN],
            "max_lat": [G.LAT0 + G.LAT_SPAN],
            "area_m2": [1.0],
        }
    )
    out = str(tmp_path / "skew")
    df = biomass_zonal_checkpointed(
        tiles_small, out, counties=one_county, n_tiles=1000, n_salts=4
    )
    assert len(df) == 1 and df.county_fips.iloc[0] == "99999"
    assert int(df.tile_count.iloc[0]) == 1000
    # the hot county was written as 4 parallel salted sub-partitions
    store = CheckpointStore(out)
    assert store.completed() == {f"99999_s{s}" for s in range(4)}
    exp = _oracle_frame(1000)
    # partial sums merge in deterministic (county, salt) order
    by_salt = exp.assign(salt=exp.tile_int_id % 4).sort_values("tile_int_id")
    exp_sum = sum(
        by_salt[by_salt.salt == s].biomass.sum() for s in range(4)
    )
    assert abs(df.biomass_sum.iloc[0] - exp_sum) < 1e-6


def test_per_county_wall_clock_beats_reference(ray_session, tiles_small):
    """The reference's headline benchmark is ONE county in 6.6 minutes
    (396 s; reference run_full_county_test.py / BASELINE.md).  The
    north rule asks for that number reproduced as a per-county
    wall-clock test: here the full 64-county flagship (decode → cells
    → PIP → kNN → zonal) over the t1 fixture must average far under
    the reference's per-county budget.  The 60 s/county bound is
    ~400× looser than the measured ~0.05 s/county so scheduler noise
    can never flake it, while still sitting 6.6× under the
    reference's 396 s."""
    import time

    from biomass_processing_pipeline_ray.pipelines.biomass import biomass_zonal

    t0 = time.time()
    df = biomass_zonal(tiles_small, n_tiles=1000).to_pandas()
    wall = time.time() - t0
    n_counties = len(df)
    assert n_counties == 64
    per_county = wall / n_counties
    assert per_county < 60.0, f"{per_county:.2f}s/county vs reference 396s"
