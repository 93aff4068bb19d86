"""Tile math vs the reference formulas (gdal2tiles.py GlobalMercator)."""

import math

import numpy as np

from gdal_spark.geo import mercator as M


def test_constants():
    assert abs(M.ORIGIN_SHIFT - 20037508.342789244) < 1e-6  # gdal2tiles.py:420
    assert abs(M.resolution(0) - 156543.03392804097) < 1e-6  # :498-502


def test_latlon_to_meters_golden():
    mx, my = M.latlon_to_meters_np([0.0], [0.0])
    assert mx[0] == 0.0 and abs(my[0]) < 1e-7
    # independent formula check at a reference point
    mx, my = M.latlon_to_meters_np([45.0], [90.0])
    assert abs(mx[0] - M.ORIGIN_SHIFT / 2) < 1e-6
    expected_my = math.log(math.tan(math.pi / 8 + math.pi / 4)) * M.EARTH_RADIUS
    assert abs(my[0] - expected_my) < 1e-4


def test_ceil_minus_one_boundary_rule():
    """gdal2tiles.py:461-465: t = ceil(p/ts) - 1, NOT floor."""
    # px exactly 256 → tile 0 (not 1); px=256.0001 → tile 1
    tx, _ = M.pixels_to_tile_np(np.array([256.0, 256.0001, 0.0, 255.999]),
                                np.array([1.0, 1.0, 1.0, 1.0]))
    assert list(tx) == [0, 1, -1, 0]


def test_round_trip_meters():
    lat = np.array([40.7, -23.55, 80.0, -79.9])
    lon = np.array([-74.0, -46.63, 179.5, -179.5])
    mx, my = M.latlon_to_meters_np(lat, lon)
    lat2, lon2 = M.meters_to_latlon_np(mx, my)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9


def test_xyz_flip_and_parent_halving():
    """XYZ parent tile == child // 2 for both axes (exactness of the
    pyramid cascade vs per-zoom recomputation)."""
    rng = np.random.RandomState(42)
    lat = rng.uniform(-80, 80, 2000)
    lon = rng.uniform(-180, 180, 2000)
    for z in (1, 5, 9):
        tx_hi, ty_hi = M.latlon_to_tile_np(lat, lon, z)
        tx_lo, ty_lo = M.latlon_to_tile_np(lat, lon, z - 1)
        assert (tx_lo == tx_hi // 2).all()
        assert (ty_lo == ty_hi // 2).all()


def test_zoom_for_pixel_size():
    # gdal2tiles.py:504-510: first i with pixelSize > Resolution(i),
    # minus one ("we don't want to scale up")
    assert M.zoom_for_pixel_size(M.resolution(5) * 1.01) == 4
    assert M.zoom_for_pixel_size(M.resolution(5) * 0.99) == 5
    assert M.zoom_for_pixel_size(M.resolution(0) * 2.0) == 0


def test_quadkey():
    # z=3, google tile (tx=3, ty=5) → TMS ty=2 ... quadkey digits from bits
    key = M.quadkey_np(np.array([3]), np.array([5]), 3)
    # digits: i=3: (0,1)->2; i=2: (1,0)->1; i=1: (1,1)->3 → "213" base4
    assert key[0] == int("213", 4)


def test_tile_bounds_contain_point():
    lat = np.array([40.7]); lon = np.array([-74.0])
    for z in (3, 8, 12):
        tx, ty = M.latlon_to_tile_np(lat, lon, z)
        minlat, minlon, maxlat, maxlon = M.tile_bounds_latlon_np(tx, ty, z)
        lo, hi = min(minlat[0], maxlat[0]), max(minlat[0], maxlat[0])
        assert lo <= lat[0] <= hi
        assert minlon[0] <= lon[0] <= maxlon[0]
