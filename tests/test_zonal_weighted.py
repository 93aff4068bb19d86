"""Coverage-fraction kernel: exact partial-pixel areas."""

import math

from gdal_spark.operators.zonal_weighted import coverage_rows


def test_coverage_sums_to_polygon_area():
    # axis-aligned unit grid; quad offset by fractional amounts
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    quad = [(1.25, 2.5), (4.75, 2.5), (4.75, 6.25), (1.25, 6.25)]
    rows = coverage_rows([quad], [], gt, 10, 10)
    total = sum(ci for _, ci, _, _ in rows)
    assert math.isclose(total, 3.5 * 3.75, rel_tol=1e-12)
    # fully-interior pixel has ci exactly 1
    by_pid = {pid: ci for pid, ci, _, _ in rows}
    # pixel (px=2, py=4) spans x [2,3], y [5,6] -> fully inside
    assert by_pid[4 * 10 + 2] == 1.0
    # corner pixel (px=1, py=7): x [1,2], y [2,3] -> 0.75 x 0.5
    assert math.isclose(by_pid[7 * 10 + 1], 0.75 * 0.5, rel_tol=1e-12)


def test_coverage_hole_subtracts():
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    outer = [(0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (0.0, 6.0)]
    hole = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]
    rows = coverage_rows([outer], [hole], gt, 10, 10)
    total = sum(ci for _, ci, _, _ in rows)
    assert math.isclose(total, 36.0 - 4.0, rel_tol=1e-12)


def test_nonconvex_parts_cover_exactly():
    # L-shape as two convex parts: total equals the L's area
    gt = (0.0, 0.5, 0.0, 8.0, 0.0, -0.5)
    a = [(0.0, 0.0), (1.0, 0.0), (1.0, 3.0), (0.0, 3.0)]
    b = [(1.0, 0.0), (3.0, 0.0), (3.0, 1.0), (1.0, 1.0)]
    rows = coverage_rows([a, b], [], gt, 16, 16)
    total = sum(ci for _, ci, _, _ in rows) * 0.25  # pixel area
    assert math.isclose(total, 3.0 + 2.0, rel_tol=1e-12)
