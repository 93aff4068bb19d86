"""Chi-shape concave hull: ratio=1.0 equals the convex hull (computed
by the independent monotone-chain kernel); erosion is monotone and
keeps a closed boundary."""

import math

import numpy as np

from gdal_spark.geo.geom import convex_hull, ring_signed_area
from gdal_spark.operators.delaunay import delaunay_flood_np
from gdal_spark.operators.hull import chi_concave_hull


def _tri_rows(x, y):
    pid = np.arange(1, len(x) + 1, dtype=np.int64)
    tri = delaunay_flood_np(pid, x, y, np.zeros(len(x)))
    return [tuple(r) for r in tri[["ia", "ib", "ic", "ax", "ay", "bx",
                                   "by", "cx", "cy"]].values]


def test_ratio_one_equals_convex_hull():
    rng = np.random.RandomState(17)
    x, y = rng.rand(80) * 12, rng.rand(80) * 9
    rows = _tri_rows(x, y)
    ne, area, peri = chi_concave_hull(rows, 1e18)
    h = convex_hull(x, y)
    want_area = abs(ring_signed_area(h))
    want_peri = sum(math.hypot(h[(i + 1) % len(h)][0] - h[i][0],
                               h[(i + 1) % len(h)][1] - h[i][1])
                    for i in range(len(h)))
    assert ne == len(h)
    assert abs(area - want_area) < 1e-9
    assert abs(peri - want_peri) < 1e-9


def test_erosion_monotone_and_closed():
    rng = np.random.RandomState(4)
    x, y = rng.rand(70) * 10, rng.rand(70) * 10
    rows = _tri_rows(x, y)
    prev = None
    for thr in (1e18, 3.0, 1.5, 0.8):
        ne, area, peri = chi_concave_hull(rows, thr)
        if prev is not None:
            assert area <= prev + 1e-12  # smaller threshold -> tighter
        prev = area
        assert ne >= 3 and area > 0.0
