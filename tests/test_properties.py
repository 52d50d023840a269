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


from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_simplify_engine_matches_iterative_oracle(seed):
    """Recursive vectorized DP (engine) == iterative scalar DP (oracle)
    on random wiggly rings — the discrete keep set must agree exactly."""
    import numpy as np

    from biomass_processing_pipeline_ray.geo.geoms import simplify_ring
    from biomass_processing_pipeline_ray.pipelines.oracles import _dp_keep

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 40))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.5, 1.5, n)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([pts, pts[:1]])
    tol = float(rng.uniform(0.01, 0.5))
    simp = simplify_ring(ring, tol)
    keep = _dp_keep(pts, tol)
    out = pts[keep]
    if len(out) < 3:
        out = pts[:3]
    exp = np.vstack([out, out[:1]])
    assert np.array_equal(simp, exp)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000))
def test_sliding_window_partial_invariants(seed):
    """Each event lands in exactly width/hop windows; totals preserved."""
    import numpy as np
    import pyarrow as pa

    from biomass_processing_pipeline_ray.functions.rounding import snap_binary
    from biomass_processing_pipeline_ray.stages.windows import sliding_partial

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 200))
    ts = np.datetime64("2024-01-01", "us") + rng.integers(0, 10**12, n)
    batch = pa.table(
        {
            "ts": pa.array(ts),
            "event_type": pa.array(rng.choice(["a", "b"], n)),
            "value": pa.array(rng.uniform(-5, 5, n)),
        }
    )
    out = sliding_partial(batch).to_pandas()
    assert out["n"].sum() == 2 * n  # width/hop = 2 windows per event
    assert np.isclose(
        out["value_sum"].sum(),
        2.0 * snap_binary(batch["value"].to_numpy()).sum(),
        atol=1e-9,
    )
    # every event's ts falls inside each window it was assigned to
    WIDTH, HOP = 3_600_000_000, 1_800_000_000
    tsi = ts.astype("datetime64[us]").astype(np.int64)
    for w in out["window_id"].unique():
        lo, hi = w * HOP, w * HOP + WIDTH
        assert ((tsi >= lo) & (tsi < hi)).sum() > 0


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_clip_area_matches_candidate_vertex_oracle(seed):
    """Cross-validation property: Sutherland–Hodgman clipped area ==
    the independent candidate-vertex + angular-ordering construction
    (pipelines/oracles.py) on random convex quads × random boxes —
    the two county_overlap implementations must agree everywhere, not
    just on the fixture."""
    import math

    from biomass_processing_pipeline_ray.geo.geoms import (
        clip_ring_to_box,
        shoelace_area,
    )
    from biomass_processing_pipeline_ray.pipelines.oracles import (
        _inside_convex,
        _seg_crossings,
    )

    rng = np.random.default_rng(seed)
    c = rng.uniform(-1.0, 3.0, 2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 4))
    rx, ry = rng.uniform(0.2, 1.5, 2)
    ring = np.c_[c[0] + rx * np.cos(ang), c[1] + ry * np.sin(ang)]
    ring = np.vstack([ring, ring[:1]])
    x0, y0 = rng.uniform(-1.0, 2.0, 2)
    x1 = x0 + rng.uniform(0.2, 2.0)
    y1 = y0 + rng.uniform(0.2, 2.0)

    out = clip_ring_to_box(ring, x0, y0, x1, y1)
    a_sh = abs(shoelace_area(out)) if len(out) else 0.0

    cand = []
    for vx, vy in ring[:-1]:
        if x0 - 1e-12 <= vx <= x1 + 1e-12 and y0 - 1e-12 <= vy <= y1 + 1e-12:
            cand.append((min(max(vx, x0), x1), min(max(vy, y0), y1)))
    for bx, by in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
        if _inside_convex(bx, by, ring):
            cand.append((bx, by))
    cand.extend(_seg_crossings(ring, x0, y0, x1, y1))
    uniq = []
    for p in cand:
        if not any(abs(p[0] - q[0]) < 1e-9 and abs(p[1] - q[1]) < 1e-9 for q in uniq):
            uniq.append(p)
    if len(uniq) < 3:
        a_or = 0.0
    else:
        mx = sum(p[0] for p in uniq) / len(uniq)
        my = sum(p[1] for p in uniq) / len(uniq)
        uniq.sort(key=lambda p: math.atan2(p[1] - my, p[0] - mx))
        terms = [
            uniq[i][0] * uniq[(i + 1) % len(uniq)][1]
            - uniq[(i + 1) % len(uniq)][0] * uniq[i][1]
            for i in range(len(uniq))
        ]
        a_or = abs(math.fsum(terms) * 0.5)

    assert abs(a_sh - a_or) < 1e-9


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_dhash_stack_bit_identical_to_scalar(seed):
    """The int-sum grayscale batched dHash is bit-identical to the
    per-image reference across random shapes (the 3.4× kernel rewrite
    must never change a single hash bit — hashes feed the dedup gate)."""
    from biomass_processing_pipeline_ray.image.phash import dhash, dhash_stack

    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 7))
    h = int(rng.integers(8, 80))
    w = int(rng.integers(8, 80))
    stack = rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8)
    fast = np.asarray(dhash_stack(stack)).astype(np.int64)
    slow = np.array([np.int64(dhash(stack[i])) for i in range(b)])
    assert np.array_equal(fast, slow)


# -- Python ↔ DuckDB tokenization parity (decontam / repetition twins) --------
#
# The benchmark_decontam and doc_repetition oracles rest on
# ``text.split(' ')`` ≡ DuckDB ``string_split(text, ' ')`` and on the
# n-gram construction matching ``array_to_string(w[i:i+k], ' ')`` over
# ``UNNEST(range(...))``.  The synthetic corpus is single-spaced, so the
# gate never exercises double/leading/trailing spaces or empty strings —
# these properties pin the equivalence on exactly those adversarial
# shapes.

word_soup = st.text(alphabet=" abc", max_size=40)


@settings(max_examples=60, deadline=None)
@given(word_soup, st.integers(2, 5))
def test_word_ngrams_match_duckdb(text, n):
    import duckdb

    from biomass_processing_pipeline_ray.stages.textstages import word_ngram_set

    got = word_ngram_set(text, n)
    exp = set(
        r[0]
        for r in duckdb.sql(
            f"""
            WITH tok AS (SELECT string_split(?, ' ') AS w),
            g AS (
                SELECT array_to_string(w[i:i+{n - 1}], ' ') AS gram
                FROM tok, UNNEST(range(1, len(w) - {n - 2})) AS t(i)
                WHERE len(w) >= {n}
            )
            SELECT DISTINCT gram FROM g
            """,
            params=[text],
        ).fetchall()
    )
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(word_soup)
def test_repetition_counts_match_duckdb(text):
    import duckdb
    import pyarrow as pa

    from biomass_processing_pipeline_ray.stages.textstages import repetition_batch

    out = repetition_batch(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([text])})
    )
    row = duckdb.sql(
        """
        WITH tok AS (SELECT string_split(?, ' ') AS w),
        bi AS (
            SELECT array_to_string(w[i:i+1], ' ') AS g
            FROM tok, UNNEST(range(1, len(w))) AS t(i)
            WHERE len(w) >= 2
        ),
        cnt AS (SELECT g, COUNT(*) AS c FROM bi GROUP BY 1)
        SELECT COALESCE(MAX(c), 0), COALESCE(SUM(c), 0) FROM cnt
        """,
        params=[text],
    ).fetchone()
    assert out["top_bigram_count"][0].as_py() == row[0]
    assert out["n_bigrams"][0].as_py() == row[1]
