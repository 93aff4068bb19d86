"""Polygon×polygon overlay geometry: Sutherland–Hodgman kernel
properties + the distributed intersection_pieces operator against both
the driver twin and an independent pixel-center sampling estimate."""

import numpy as np
import pytest

from gdal_spark.fixtures import ZONES
from gdal_spark.geo.geom import (
    clip_convex, point_in_polygon, polygon_area, ring_signed_area,
)
from gdal_spark.operators.algebra import (
    intersection_pieces, intersection_pieces_twin,
)


def test_clip_convex_unit_overlap():
    a = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
    b = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
    out = clip_convex(np.array(a), np.array(b))
    assert ring_signed_area(out) == 1.0


def test_clip_convex_disjoint_and_contained():
    a = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    far = [(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0)]
    assert len(clip_convex(np.array(a), np.array(far))) == 0
    big = [(-1.0, -1.0), (2.0, -1.0), (2.0, 2.0), (-1.0, 2.0)]
    out = clip_convex(np.array(a), np.array(big))
    assert ring_signed_area(out) == 1.0  # subject unchanged


def _sample_area(rings_a, rings_b, n=400):
    """Independent estimate: fraction of pixel centers inside BOTH
    polygons (holes respected) over the joint bbox."""
    ax = np.asarray(rings_a[0]); bx = np.asarray(rings_b[0])
    xmin = min(ax[:, 0].min(), bx[:, 0].min())
    xmax = max(ax[:, 0].max(), bx[:, 0].max())
    ymin = min(ax[:, 1].min(), bx[:, 1].min())
    ymax = max(ax[:, 1].max(), bx[:, 1].max())
    xs = np.linspace(xmin, xmax, n, endpoint=False) + (xmax - xmin) / (2 * n)
    ys = np.linspace(ymin, ymax, n, endpoint=False) + (ymax - ymin) / (2 * n)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.ravel(), gy.ravel()
    inside = point_in_polygon(px, py, rings_a) & point_in_polygon(px, py, rings_b)
    cell = ((xmax - xmin) / n) * ((ymax - ymin) / n)
    return inside.sum() * cell


def _zone(fid):
    return next(z for z in ZONES if z["zone_fid"] == fid)


def test_twin_nested_pair_exact():
    # zone 7 lies fully inside zone 0 → intersection area == area(z7)
    rows = {(a, b): (n, area) for a, b, n, area in intersection_pieces_twin()}
    n, area = rows[(0, 7)]
    assert n == 1
    assert area == pytest.approx(polygon_area(_zone(7)["rings"]), abs=1e-12)


def test_twin_shared_edge_zero():
    rows = {(a, b): (n, area) for a, b, n, area in intersection_pieces_twin()}
    n, area = rows[(4, 6)]
    assert abs(area) < 1e-9  # edge-only contact


def test_twin_hole_subtracts_and_matches_sampling():
    rows = {(a, b): (n, area) for a, b, n, area in intersection_pieces_twin()}
    _, area = rows[(1, 9)]
    z1, z9 = _zone(1), _zone(9)
    est = _sample_area(z1["rings"], z9["rings"])
    assert area == pytest.approx(est, rel=0.02)
    # hole must actually subtract: area < clip against outer ring alone
    outer_only = _sample_area(z1["rings"], [z9["rings"][0]])
    assert area < outer_only


def test_twin_tokyo_nonconvex_matches_sampling():
    rows = {(a, b): (n, area) for a, b, n, area in intersection_pieces_twin()}
    _, area = rows[(2, 8)]
    est = _sample_area(_zone(2)["rings"], _zone(8)["rings"])
    assert area == pytest.approx(est, rel=0.02)


def test_spark_matches_twin(spark):
    got = {(r["fid_a"], r["fid_b"]): (r["n_pieces"], r["inter_area"])
           for r in intersection_pieces(spark).collect()}
    want = {(a, b): (n, area) for a, b, n, area in intersection_pieces_twin()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]  # bit-exact fold


def test_dissolve_geometric_semantics(spark):
    from gdal_spark.fixtures import ZONES, zone_area
    from gdal_spark.operators.algebra import dissolve_geometric
    rows = {r["key"]: r for r in dissolve_geometric(spark).collect()}
    area = {z["zone_fid"]: zone_area(z) for z in ZONES}
    # contained pair: union == container's area exactly
    assert rows["nyc"]["n_parts"] == 1
    assert rows["nyc"]["union_area"] == area[0]
    # shared-edge pair: zero overlap, one dissolved part, additive area
    assert rows["france"]["n_parts"] == 1
    assert abs(rows["france"]["union_area"] - (area[4] + area[6])) < 1e-9
    # partial overlaps: one part, union strictly between max and sum
    for key, a, b in (("london", 1, 9), ("tokyo", 2, 8)):
        r = rows[key]
        assert r["n_parts"] == 1 and r["n_features"] == 2
        assert max(area[a], area[b]) < r["union_area"] < area[a] + area[b]
    # singletons
    assert rows["saopaulo"]["n_parts"] == 1
    assert rows["ocean"]["n_features"] == 1
