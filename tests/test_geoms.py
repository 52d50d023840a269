"""Geometry kernels (geo/geoms.py) vs brute-force oracles — no Ray needed."""

import numpy as np
import pytest

from biomass_processing_pipeline_ray.geo import geoms, wkb as W


def _square(x0=0.0, y0=0.0, s=1.0):
    return np.asarray(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
    )


def test_validate_and_fix():
    ok, reason = geoms.validate_ring(_square())
    assert ok and reason == "ok"
    # not closed
    open_ring = _square()[:-1]
    assert geoms.validate_ring(open_ring) == (False, "not_closed")
    fixed = geoms.fix_ring(open_ring)
    assert geoms.validate_ring(fixed)[0]
    # bowtie self-intersection (asymmetric so the lobes don't cancel to
    # zero area, which is checked first)
    bowtie = np.asarray([[0, 0], [2, 2], [2, 0], [0, 1], [0, 0]], dtype=float)
    assert geoms.validate_ring(bowtie) == (False, "self_intersection")
    # zero area
    line = np.asarray([[0, 0], [1, 0], [2, 0], [0, 0]], dtype=float)
    assert geoms.validate_ring(line) == (False, "zero_area")
    # CW ring is normalized to CCW by fix
    cw = _square()[::-1]
    assert geoms.shoelace_area(cw) < 0
    assert geoms.shoelace_area(geoms.fix_ring(cw)) > 0
    # duplicate vertices dropped
    dup = np.asarray([[0, 0], [0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    assert len(geoms.fix_ring(dup)) == 5


def test_area_centroid_against_closed_forms():
    sq = _square(-91.0, 40.0, 0.5)
    assert geoms.shoelace_area(sq) == pytest.approx(0.25, rel=1e-12)
    cx, cy = geoms.centroid(sq)
    assert cx == pytest.approx(-90.75, abs=1e-9)
    assert cy == pytest.approx(40.25, abs=1e-9)
    # acres: deg² × scale² × cos(lat) × acres/m²
    exp = 0.25 * 111320.0**2 * np.cos(np.radians(cy)) * 0.000247105
    assert geoms.area_acres(sq) == pytest.approx(exp, rel=1e-12)


def test_simplify_douglas_peucker():
    # square with collinear midpoints: tolerance removes them
    ring = np.asarray(
        [[0, 0], [0.5, 0], [1, 0], [1, 0.5], [1, 1], [0, 1], [0, 0]], dtype=float
    )
    simp = geoms.simplify_ring(ring, tolerance=1e-9)
    assert len(simp) == 5  # 4 corners + closure
    assert geoms.shoelace_area(simp) == pytest.approx(1.0)
    # a real vertex survives a small tolerance but not a big one
    ring2 = np.asarray(
        [[0, 0], [0.5, 0.2], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float
    )
    assert len(geoms.simplify_ring(ring2, 0.1)) == 6
    assert len(geoms.simplify_ring(ring2, 0.3)) == 5


def test_buffer_convex_grows_bounds():
    sq = _square(0, 0, 1.0)
    buf = geoms.buffer_convex(sq, 0.1)
    b = geoms.ring_bounds(buf)
    assert b == pytest.approx((-0.1, -0.1, 1.1, 1.1), abs=1e-9)
    assert geoms.shoelace_area(buf) == pytest.approx(1.2 * 1.2, rel=1e-9)
    # point-containment monotone: original corners are inside the buffer
    from biomass_processing_pipeline_ray.geo.pip import PolygonSet

    pset = PolygonSet(["z"], [W.polygon_to_wkb([buf])])
    lab = pset.locate_labels(sq[:-1, 0], sq[:-1, 1])
    assert (lab == "z").all()


def test_bounds_intersect_matrix():
    b1 = np.asarray([[0, 0, 1, 1], [5, 5, 6, 6]], dtype=float)
    b2 = np.asarray([[0.5, 0.5, 2, 2], [10, 10, 11, 11]], dtype=float)
    m = geoms.bounds_intersect(b1, b2)
    assert m.tolist() == [[True, False], [False, False]]
    # touching edges count as intersecting (closed intervals)
    assert geoms.bounds_intersect([[0, 0, 1, 1]], [[1, 1, 2, 2]])[0, 0]


def test_geometry_stats_batch_on_counties():
    from biomass_processing_pipeline_ray.sources.counties import (
        jittered_counties,
        rect_counties,
    )

    for tbl in (rect_counties(), jittered_counties()):
        out = geoms.geometry_stats_batch(
            tbl.select(["county_fips", "geometry_wkb"])
        ).to_pandas()
        assert out.is_valid.all()
        assert (out.area_acres > 0).all()
        # centroids stay inside the domain
        assert out.centroid_lon.between(-91.5, -87.5).all()
        assert out.centroid_lat.between(37.0, 42.5).all()


def test_clip_ring_to_box_properties():
    """Sutherland–Hodgman clip: exact on closed-form cases, bounded by
    both operands, identity when fully inside, empty when disjoint."""
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=np.float64)

    # identity: box contains ring
    out = geoms.clip_ring_to_box(sq, -1, -1, 3, 3)
    assert abs(abs(geoms.shoelace_area(out)) - 4.0) < 1e-12
    # disjoint
    assert len(geoms.clip_ring_to_box(sq, 5, 5, 6, 6)) == 0
    # half overlap: unit strip
    out = geoms.clip_ring_to_box(sq, 1, 0, 3, 2)
    assert abs(abs(geoms.shoelace_area(out)) - 2.0) < 1e-12
    # diamond ∩ unit corner box: the triangle (1,0)-(1,1)-(0,1), area 0.5
    dia = np.array([[1, 0], [2, 1], [1, 2], [0, 1], [1, 0]], dtype=np.float64)
    out = geoms.clip_ring_to_box(dia, 0.0, 0.0, 1.0, 1.0)
    assert abs(abs(geoms.shoelace_area(out)) - 0.5) < 1e-12
    # box fully inside the diamond (corners on its boundary) → the box
    out = geoms.clip_ring_to_box(dia, 0.5, 0.5, 1.5, 1.5)
    assert abs(abs(geoms.shoelace_area(out)) - 1.0) < 1e-12

    # random CONVEX quads (points on an ellipse — SH's area guarantee
    # holds for convex subjects only) vs a fixed box: area bounded by
    # both operands
    rng = np.random.default_rng(3)
    for _ in range(50):
        c = rng.uniform(0.5, 1.5, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 4))
        rx, ry = rng.uniform(0.3, 1.2, 2)
        quad = np.c_[c[0] + rx * np.cos(ang), c[1] + ry * np.sin(ang)]
        quad = np.vstack([quad, quad[:1]])
        out = geoms.clip_ring_to_box(quad, 0.0, 0.0, 2.0, 2.0)
        a = abs(geoms.shoelace_area(out)) if len(out) else 0.0
        assert a <= abs(geoms.shoelace_area(quad)) + 1e-12
        assert a <= 4.0 + 1e-12
