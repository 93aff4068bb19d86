"""Scanline rasterize kernel vs the reference rules
(alg/llrasterize.cpp:41-250) + GDAL checksum (alg/gdalchecksum.cpp)."""

import numpy as np

from gdal_spark.geo import geom as G
from gdal_spark.operators import rasterize as R


def test_square_fill_pixel_center_rule():
    # square [2.2, 6.7]² in pixel space: pixel centers inside are 2.5..6.5
    rings = [np.array([[2.2, 2.2], [6.7, 2.2], [6.7, 6.7], [2.2, 6.7]])]
    runs = R.scanline_fill(rings, 10, 10)
    grid = np.zeros((10, 10))
    for y, x0, x1 in runs:
        grid[y, x0:x1 + 1] = 1
    # dy = y+0.5 in [2.2, 6.7] → y in 2..6; crossings at floor(2.2+.5)=2,
    # floor(6.7+.5)=7 → fill [2, 6]
    expect = np.zeros((10, 10))
    expect[2:7, 2:7] = 1
    assert (grid == expect).all()


def test_fill_matches_pixel_center_pip():
    """The scanline algorithm's defining invariant: a pixel is burned iff
    its CENTER falls inside the polygon (llrasterize.cpp:43-46) — checked
    against the independent PIP kernel on a non-convex ring."""
    ring = np.array([[1.3, 1.1], [8.2, 2.3], [6.9, 8.7], [4.1, 4.9], [2.2, 7.8]])
    runs = R.scanline_fill([ring], 12, 12)
    grid = np.zeros((12, 12))
    for y, x0, x1 in runs:
        grid[y, x0:x1 + 1] = 1
    ys, xs = np.mgrid[0:12, 0:12]
    centers_in = G.point_in_polygon(
        (xs + 0.5).ravel(), (ys + 0.5).ravel(), [ring]).reshape(12, 12)
    assert (grid.astype(bool) == centers_in).all()


def test_hole_not_burned():
    rings = [np.array([[0.2, 0.2], [9.7, 0.2], [9.7, 9.7], [0.2, 9.7]]),
             np.array([[3.2, 3.2], [6.7, 3.2], [6.7, 6.7], [3.2, 6.7]])]
    runs = R.scanline_fill(rings, 10, 10)
    grid = np.zeros((10, 10))
    for y, x0, x1 in runs:
        grid[y, x0:x1 + 1] = 1
    assert grid[5, 5] == 0 and grid[1, 1] == 1 and grid[5, 1] == 1


def test_bottom_horizontal_edge_filled_top_skipped():
    # axis-aligned square with horizontal top and bottom edges: the fill
    # must not double-burn nor leave gaps (llrasterize.cpp:146-185)
    rings = [np.array([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0]])]
    runs = R.scanline_fill(rings, 8, 8)
    grid = np.zeros((8, 8))
    for y, x0, x1 in runs:
        grid[y, x0:x1 + 1] += 1
    assert grid.max() == 1  # no double burn
    # dy=y+0.5 in [1,5] → y in 1..4 burned [1,4]; row 5 center 5.5 outside
    assert (grid[1:5, 1:5] == 1).all() and grid[5].sum() == 0


def test_degenerate_outside_raster():
    runs = R.scanline_fill([np.array([[20.0, 20.0], [30.0, 20.0], [25.0, 30.0]])], 10, 10)
    assert runs == []


def test_gdal_checksum_reference_values():
    """Checksum algorithm vs a hand-computed case: primes table %, index
    (i + j + value) % 11, 16-bit mask (alg/gdalchecksum.cpp:54-56)."""
    g = np.zeros((2, 2))
    g[0, 0] = 5   # linear idx 0 → prime 7:  5 % 7  = 5
    g[0, 1] = 3   # linear idx 1 → prime 11: 3 % 11 = 3
    g[1, 0] = 0   # linear idx 2 → prime 13: 0
    g[1, 1] = 40  # linear idx 3 → prime 17: 40 % 17 = 6
    assert R.gdal_checksum(g) == 14
    # float rounding rule: floor(v + 0.5); negative values keep C modulo
    g2 = np.array([[6.6, -3.0], [0.0, 0.0]])  # round(6.6)=7 → 7%7=0; -3%11=-3
    assert R.gdal_checksum(g2) == (0 + -3) & 0xFFFF


def test_checksum_changes_with_position():
    a = np.zeros((4, 4)); a[0, 0] = 9
    b = np.zeros((4, 4)); b[2, 2] = 9
    assert R.gdal_checksum(a) != R.gdal_checksum(b)


def test_line_burn_all_touched_superset(spark):
    """ALL_TOUCHED must cover every DDA pixel of a diagonal segment and
    typically more (supercover vs one-pixel-per-major-step)."""
    from gdal_spark.operators.rasterize import burn_lines, burn_lines_all_touched
    gt = (0.0, 1.0, 0.0, 16.0, 0.0, -1.0)  # 16x16 unit grid
    edges = spark.createDataFrame(
        [(0, 0, 0, 0.2, 15.8, 15.7, 0.3)],  # steep diagonal corner to corner
        "zone_fid int, ring_id int, edge int, x1 double, y1 double, x2 double, y2 double")
    dda = {(r["py"], r["px"]) for r in burn_lines(edges, gt, 16, 16).collect()}
    touched = {(r["py"], r["px"])
               for r in burn_lines_all_touched(edges, gt, 16, 16).collect()}
    assert dda <= touched
    assert len(touched) > len(dda)
    # exact 45-degree line through lattice corners: the closed-cell rule
    # counts all 4 cells at each grazed corner (documented deviation)
    assert 16 <= len(touched) <= 46
