"""PIP / geometry kernels: boundary-inclusive GEOS Intersects semantics
(ogrlayer.cpp:4005-4078) + fixture sanity."""

import numpy as np

from gdal_spark.fixtures import ZONES, zone_rings_numpy
from gdal_spark.geo import geom as G


def _signed_area(ring):
    r = np.asarray(ring, dtype=np.float64)
    x1, y1 = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    return 0.5 * np.sum(x1 * y2 - x2 * y1)


def test_all_parts_and_holes_ccw():
    """The half-plane oracle requires CCW orientation everywhere."""
    for z in ZONES:
        for ring in z["parts"] + z["holes"]:
            assert _signed_area(ring) > 0, f"zone {z['zone_fid']} ring not CCW"


def test_pip_square():
    rings = [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]
    px = np.array([1.0, 3.0, 2.0, 0.0, 2.0, -0.0001])
    py = np.array([1.0, 1.0, 1.0, 0.0, 2.0, 1.0])
    got = G.point_in_polygon(px, py, rings)
    # interior, outside, on edge, on vertex, on corner, just outside
    assert list(got) == [True, False, True, True, True, False]


def test_pip_vs_halfplane_on_convex_zones():
    """Engine ray-cast vs the oracle's half-plane algebra must agree on
    random points (the two PIP formulations used by engine vs DuckDB)."""
    rng = np.random.RandomState(7)
    for z in ZONES:
        if z["holes"] or len(z["parts"]) > 1:
            continue
        xmin, ymin, xmax, ymax = G.polygon_bbox(z["rings"])
        px = rng.uniform(xmin - 0.5, xmax + 0.5, 4000)
        py = rng.uniform(ymin - 0.5, ymax + 0.5, 4000)
        raycast = G.point_in_polygon(px, py, zone_rings_numpy()[z["zone_fid"]])
        ring = np.asarray(z["parts"][0], dtype=np.float64)
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        cross = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - \
                (y2 - y1)[None, :] * (px[:, None] - x1[None, :])
        halfplane = (cross >= 0).all(axis=1)
        assert (raycast == halfplane).all(), f"zone {z['zone_fid']}"


def test_pip_hole_and_lshape():
    rings = zone_rings_numpy()
    # zone 9 hole: interior excluded, hole edge included
    got = G.point_in_polygon(np.array([-0.15, -0.5, -0.6]),
                             np.array([51.5, 51.5, 51.5]), rings[9])
    assert list(got) == [False, True, True]
    # zone 8 L-shape: notch excluded, both arms included
    got = G.point_in_polygon(np.array([140.0, 139.3, 140.0]),
                             np.array([36.0, 36.0, 35.25]), rings[8])
    assert list(got) == [False, True, True]


def test_polygon_area_with_hole():
    rings = [[(0, 0), (4, 0), (4, 4), (0, 4)], [(1, 1), (2, 1), (2, 2), (1, 2)]]
    assert G.polygon_area(rings) == 15.0


def test_segments_intersect_rect():
    ring = [(0, 0), (10, 0), (10, 10), (0, 10)]
    assert G.segments_intersect_rect(ring, -1, -1, 1, 1)      # corner crossing
    assert not G.segments_intersect_rect(ring, 4, 4, 6, 6)    # fully inside
    assert not G.segments_intersect_rect(ring, 20, 20, 30, 30)
    assert G.segments_intersect_rect(ring, 9, 4, 11, 6)       # side crossing


def test_haversine():
    # quarter meridian ≈ pi/2 * R
    d = G.haversine_m([0.0], [0.0], [90.0], [0.0])
    assert abs(d[0] - np.pi / 2 * G.EARTH_RADIUS) < 1.0
