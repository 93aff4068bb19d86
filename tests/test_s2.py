"""S2 cell id property tests (pure-numpy implementation, geo/s2.py)."""

import numpy as np

from gdal_spark.geo import s2


def _rand_latlon(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-180, 180, n)


def test_face_centers():
    # (0,0) is the center of face 0 (+x); poles on faces 2 / 5
    lat = np.array([0.0, 90.0, -90.0, 0.0, 0.0, 0.0])
    lon = np.array([0.0, 0.0, 0.0, 90.0, 180.0, -90.0])
    x, y, z = s2.latlon_to_xyz(lat, lon)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert list(face) == [0, 2, 5, 1, 3, 4]
    assert abs(u[0]) < 1e-12 and abs(v[0]) < 1e-12


def test_leaf_roundtrip():
    lat, lon = _rand_latlon()
    cell = s2.latlon_to_cell(lat, lon)  # leaf level 30
    clat, clon = s2.cell_to_center_latlon(cell)
    # leaf cells are ~1cm; centers must be within a few meters of input
    assert np.abs(clat - lat).max() < 1e-5
    dlon = np.abs(clon - lon)
    dlon = np.minimum(dlon, 360 - dlon)
    assert dlon.max() < 1e-4  # lon degrades near poles


def test_hierarchy_containment():
    """child id range [parent - lsb + 1, parent + lsb - 1] (S2 id scheme)."""
    lat, lon = _rand_latlon(2000, seed=8)
    for lvl in (5, 10, 16):
        child = s2.latlon_to_cell(lat, lon, lvl + 4)
        par = s2.parent(child, lvl)
        direct = s2.latlon_to_cell(lat, lon, lvl)
        assert (par == direct).all()
        lsb = np.int64(1) << np.int64(2 * (30 - lvl))
        assert ((child >= par - lsb + 1) & (child <= par + lsb - 1)).all()


def test_levels():
    lat, lon = _rand_latlon(100)
    for lvl in (0, 7, 15, 30):
        cell = s2.latlon_to_cell(lat, lon, lvl)
        assert (s2.cell_level(cell) == lvl).all()


def test_same_cell_for_nearby_points():
    # two points ~1e-7 deg apart share coarse cells
    a = s2.latlon_to_cell(np.array([40.7]), np.array([-74.0]), 12)
    b = s2.latlon_to_cell(np.array([40.7000001]), np.array([-74.0000001]), 12)
    assert a[0] == b[0]


def test_distinct_faces_distinct_cells():
    lat, lon = _rand_latlon(3000, seed=5)
    cells = s2.latlon_to_cell(lat, lon, 30)
    assert len(np.unique(cells)) == len(cells)  # leaf collisions ~impossible
