import numpy as np

from biomass_processing_pipeline_ray.geo import knn, pip, wkb
from biomass_processing_pipeline_ray.sources.counties import jittered_counties, rect_counties


def _brute_pip(px, py, rings_by_label):
    """Independent per-point even-odd oracle (pure python loops)."""
    out = []
    for x, y in zip(px, py):
        best = None
        for label, rings in rings_by_label.items():
            crossings = 0
            for ring in rings:
                for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
                    if (y0 <= y) != (y1 <= y):
                        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                        if x < xint:
                            crossings += 1
            if crossings % 2 == 1 and (best is None or label < best):
                best = label
        out.append(best if best is not None else "")
    return np.asarray(out, dtype=object)


def test_pip_matches_bruteforce_jittered(rng):
    counties = jittered_counties()
    pset = pip.PolygonSet(
        counties["county_fips"].to_pylist(), counties["geometry_wkb"].to_pylist()
    )
    px = rng.uniform(-91.5, -87.5, 2000)
    py = rng.uniform(37.0, 42.5, 2000)
    got = pset.locate_labels(px, py)
    rings_by_label = {
        f: wkb.wkb_to_rings(w)
        for f, w in zip(
            counties["county_fips"].to_pylist(), counties["geometry_wkb"].to_pylist()
        )
    }
    expect = _brute_pip(px, py, rings_by_label)
    assert np.array_equal(got.astype(str), expect.astype(str))
    # jittered grid still partitions the domain: everything is assigned
    assert np.all(got != "")


def test_pip_rect_matches_floor_arithmetic(rng):
    from biomass_processing_pipeline_ray.functions import georef as G

    counties = rect_counties()
    pset = pip.PolygonSet(
        counties["county_fips"].to_pylist(), counties["geometry_wkb"].to_pylist()
    )
    ids = rng.integers(0, 10**9, 3000)
    lon, lat = G.derive_lonlat(ids)
    got = pset.locate_labels(lon, lat)
    cx, cy = G.derive_county_xy(lon, lat)
    expect = G.county_fips_from_xy(cx, cy)
    assert np.array_equal(got.astype(str), expect.astype(str))


def test_pip_boundary_tie_lowest_fips():
    pset = pip.PolygonSet(
        ["00002", "00001"],
        [wkb.rect_wkb(0, 0, 1, 1), wkb.rect_wkb(1, 0, 2, 1)],
    )
    # x=1.0 lies on the shared edge → lowest fips wins
    got = pset.locate_labels(np.array([1.0]), np.array([0.5]))
    assert got[0] == "00001"


def test_knn_exact_vs_bruteforce(rng):
    n = 3000
    x = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n)
    ids = rng.permutation(n).astype(np.int64)
    g = knn.GridKNN(x, y, ids)
    k = 8
    idx, d2 = g.query(x, y, ids, k)
    for i in rng.integers(0, n, 120):
        dx = x - x[i]
        dy = y - y[i]
        dd = dx * dx + dy * dy
        dd[i] = np.inf
        sel = np.lexsort((ids, dd))[:k]
        assert np.array_equal(sel, idx[i]), i


def test_knn_clustered_skew(rng):
    """Heavy clustering (one hot bucket) still returns exact results."""
    n = 1500
    x = np.concatenate([rng.uniform(0, 0.01, n // 2), rng.uniform(0, 1, n // 2)])
    y = np.concatenate([rng.uniform(0, 0.01, n // 2), rng.uniform(0, 1, n // 2)])
    ids = np.arange(n, dtype=np.int64)
    g = knn.GridKNN(x, y, ids)
    idx, _ = g.query(x[:50], y[:50], ids[:50], 5)
    for i in range(50):
        dx = x - x[i]
        dy = y - y[i]
        dd = dx * dx + dy * dy
        dd[i] = np.inf
        sel = np.lexsort((ids, dd))[:5]
        assert np.array_equal(sel, idx[i])
