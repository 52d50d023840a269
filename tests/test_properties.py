"""Property-based tests (hypothesis) for the determinism-critical kernels:
codec roundtrips, WKB roundtrip, and the DuckDB float-parity rules the
whole correctness gate rests on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biomass_processing_pipeline_ray.functions.rounding import round_away, snap_binary
from biomass_processing_pipeline_ray.geo import wkb as W
from biomass_processing_pipeline_ray.image import codecs


@st.composite
def small_images(draw):
    h = draw(st.integers(4, 40))
    w = draw(st.integers(4, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@settings(max_examples=30, deadline=None)
@given(small_images())
def test_png_raw_roundtrip_lossless(px):
    for fmt in ("png", "raw"):
        dec = codecs.decode(codecs.encode(px, fmt), fmt, px.shape[0], px.shape[1])
        assert np.array_equal(dec, px)


@settings(max_examples=30, deadline=None)
@given(small_images())
def test_qimg_psnr_bound(px):
    dec = codecs.decode(codecs.encode(px, "jpeg"), "jpeg", px.shape[0], px.shape[1])
    assert dec.shape == px.shape
    assert codecs.psnr(px, dec) >= 40.0  # the north-rule lossy bound


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-180, 180, allow_nan=False),
            st.floats(-89, 89, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    )
)
def test_wkb_roundtrip(coords):
    ring = np.asarray(coords + coords[:1], dtype=np.float64)
    rings = W.wkb_to_rings(W.polygon_to_wkb([ring]))
    assert len(rings) == 1
    assert np.array_equal(rings[0], ring)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 6))
def test_round_away_matches_duckdb(seed, ndigits):
    import duckdb

    rng = np.random.Generator(np.random.PCG64(seed))
    xs = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 50),
            np.round(rng.uniform(-100, 100, 20), ndigits)  # exact-boundary-ish
            + 0.5 * 10.0 ** (-ndigits),
        ]
    )
    got = round_away(xs, ndigits)
    con = duckdb.connect()
    # feed via an Arrow table: SQL float literals with >15 significant
    # digits parse through DECIMAL and mangle the double; real oracle
    # queries round DOUBLE columns read from parquet
    import pyarrow as pa

    tbl = pa.table({"i": np.arange(len(xs)), "x": xs})  # noqa: F841
    con.register("t", tbl)
    exp = (
        con.sql(f"SELECT ROUND(x, {ndigits}) AS r FROM t ORDER BY i")
        .df()["r"]
        .to_numpy()
    )
    assert np.array_equal(got, exp)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_snap_binary_sums_order_independent(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    xs = snap_binary(rng.uniform(-1e4, 1e4, 500))
    forward = float(np.sum(xs))
    backward = float(np.sum(xs[::-1]))
    shuffled = xs.copy()
    rng.shuffle(shuffled)
    chunked = float(sum(float(np.sum(c)) for c in np.array_split(shuffled, 7)))
    assert forward == backward == chunked  # exact, any order/partition
