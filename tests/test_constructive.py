"""Constructive geometry kernels: DP simplify, makevalid, hull
associativity (the property the two-phase distributed hull relies on)."""

import numpy as np

from gdal_spark.geo.geom import (
    convex_hull, dp_ring_keep, make_valid_ring, ring_signed_area,
)


def test_dp_drops_collinear_keeps_corners():
    # square segmentized at 0.25 steps: only the 4 corners survive
    pts = []
    for (x1, y1), (x2, y2) in [((0, 0), (1, 0)), ((1, 0), (1, 1)),
                               ((1, 1), (0, 1)), ((0, 1), (0, 0))]:
        for k in range(4):
            pts.append((x1 + (x2 - x1) * k / 4.0, y1 + (y2 - y1) * k / 4.0))
    keep = dp_ring_keep(np.array(pts), 0.1)
    kept = np.array(pts)[keep]
    assert len(kept) == 4
    assert {tuple(p) for p in kept} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_make_valid_bowtie():
    pieces = make_valid_ring([(0, 0), (2, 2), (2, 0), (0, 2)])
    assert len(pieces) == 2
    areas = sorted(abs(ring_signed_area(np.array(p))) for p in pieces)
    assert areas == [1.0, 1.0]  # two unit triangles meeting at (1,1)
    for p in pieces:
        assert (1.0, 1.0) in [tuple(v) for v in p]


def test_make_valid_noop_on_valid():
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]
    pieces = make_valid_ring(ring)
    assert len(pieces) == 1
    assert abs(ring_signed_area(np.array(pieces[0]))) == 12.0


def test_hull_associative_merge():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(500, 2))
    whole = convex_hull(pts[:, 0], pts[:, 1])
    h1 = convex_hull(pts[:250, 0], pts[:250, 1])
    h2 = convex_hull(pts[250:, 0], pts[250:, 1])
    merged_pts = np.vstack([h1, h2])
    merged = convex_hull(merged_pts[:, 0], merged_pts[:, 1])
    assert np.array_equal(np.sort(whole, axis=0), np.sort(merged, axis=0))
