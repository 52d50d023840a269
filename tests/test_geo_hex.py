import numpy as np

from biomass_processing_pipeline_ray.geo import hexgrid


def test_roundtrip_center(rng):
    lon = rng.uniform(-91.5, -87.5, 2000)
    lat = rng.uniform(37, 42.5, 2000)
    for res in (3, 5, 7):
        cells = hexgrid.latlng_to_cell(lon, lat, res)
        clon, clat = hexgrid.cell_to_latlng(cells)
        assert np.array_equal(hexgrid.latlng_to_cell(clon, clat, res), cells)
        # every point is within one circumradius of its cell center
        d = np.hypot(lon - clon, lat - clat)
        assert d.max() <= hexgrid.edge_deg(res) * 1.0000001


def test_pack_unpack(rng):
    q = rng.integers(-100000, 100000, 500)
    r = rng.integers(-100000, 100000, 500)
    cells = hexgrid.pack_cell(9, q, r)
    res, q2, r2 = hexgrid.unpack_cell(cells)
    assert np.all(res == 9)
    assert np.array_equal(q, q2)
    assert np.array_equal(r, r2)
    assert np.all(cells >= 0)  # int64-safe for Arrow/DuckDB


def test_nearest_center_property(rng):
    """hex_round must assign each point to the nearest cell center."""
    lon = rng.uniform(-91, -90, 300)
    lat = rng.uniform(38, 39, 300)
    res = 5
    cells = hexgrid.latlng_to_cell(lon, lat, res)
    clon, clat = hexgrid.cell_to_latlng(cells)
    d_own = np.hypot(lon - clon, lat - clat)
    # compare against all cells in a 2-ring neighborhood
    for i in range(0, 300, 37):
        disk = hexgrid.grid_disk(int(cells[i]), 2)
        dlon, dlat = hexgrid.cell_to_latlng(disk)
        d_all = np.hypot(lon[i] - dlon, lat[i] - dlat)
        assert d_own[i] <= d_all.min() + 1e-9


def test_grid_disk_sizes():
    c = int(hexgrid.latlng_to_cell(np.array([-90.0]), np.array([40.0]), 6)[0])
    assert len(hexgrid.grid_disk(c, 0)) == 1
    assert len(hexgrid.grid_disk(c, 1)) == 7
    assert len(hexgrid.grid_disk(c, 2)) == 19


def test_polygon_to_cells_cover():
    ring = np.asarray([[-91, 38], [-90, 38], [-90, 39], [-91, 39]])
    cells = hexgrid.polygon_to_cells(ring, 5)
    assert len(cells) > 10
    clon, clat = hexgrid.cell_to_latlng(cells)
    assert clon.min() >= -91 and clon.max() <= -90
    assert clat.min() >= 38 and clat.max() <= 39


def test_sql_mirror_matches_duckdb(rng):
    import duckdb

    lon = rng.uniform(-91.5, -87.5, 1000)
    lat = rng.uniform(37, 42.5, 1000)
    cells = hexgrid.latlng_to_cell(lon, lat, 7)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    expr = hexgrid.sql_hex_cell("lon", "lat", 7)
    got = con.execute(f"SELECT {expr} AS c FROM pts").df()["c"].to_numpy()
    assert np.array_equal(got.astype(np.int64), cells)
