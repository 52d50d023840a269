import numpy as np

from biomass_processing_pipeline_ray.geo import s2


def test_face_level0_ids():
    """Known S2 values: level-0 face cells are (2f+1) << 60."""
    for f, (lon, lat) in enumerate(
        [(0, 0), (90, 0), (0, 90), (180, 0), (-90, 0), (0, -90)]
    ):
        c = s2.latlng_to_cell(np.array([lon]), np.array([lat]), 0)
        assert int(c[0]) == (2 * f + 1) << 60


def test_roundtrip_levels(rng):
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-89, 89, 3000)
    for level in (5, 13, 20, 30):
        c = s2.latlng_to_cell(lon, lat, level)
        assert np.all(s2.cell_level(c) == level)
        clon, clat = s2.cell_to_latlng(c)
        assert np.array_equal(s2.latlng_to_cell(clon, clat, level), c)


def test_hierarchy(rng):
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89, 89, 2000)
    leaf = s2.latlng_to_cell(lon, lat, 30)
    for level in (3, 10, 25):
        assert np.array_equal(s2.parent(leaf, level), s2.latlng_to_cell(lon, lat, level))


def test_leaf_ids_odd_and_distinct(rng):
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89, 89, 5000)
    leaf = s2.latlng_to_cell(lon, lat, 30)
    assert np.all(leaf & np.uint64(1) == 1)  # leaf sentinel bit
    assert len(np.unique(leaf)) == len(leaf)  # distinct points → distinct leaves


def test_hilbert_locality():
    """Consecutive curve positions on one face decode to adjacent ij."""
    face = np.zeros(1023, dtype=np.uint64)
    # walk positions 0..1022 at level 5 on face 0
    level = 5
    ids = []
    for pos in range(1023):
        # id layout: [3 face][60 pos][1 sentinel]; level-l pos sits at the
        # top 2l bits of the pos field, lsb sentinel at bit 2*(30-l)
        leafpos = np.uint64(pos) << np.uint64(2 * (s2.MAX_LEVEL - level) + 1)
        lsb = np.uint64(1) << np.uint64(2 * (s2.MAX_LEVEL - level))
        ids.append(leafpos | lsb)
    ids = np.asarray(ids, dtype=np.uint64)
    _, i, j = s2.id_to_face_ij(ids)
    scale = 1 << (s2.MAX_LEVEL - level)
    ii = (i // scale).astype(np.int64)
    jj = (j // scale).astype(np.int64)
    step = np.abs(np.diff(ii)) + np.abs(np.diff(jj))
    assert np.all(step == 1)  # Hilbert curve moves one cell at a time
