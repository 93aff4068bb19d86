"""Kernel-level tests for the Delaunay linear gridding operator
(the sf0.001 oracle compare in test_queries_oracle.py covers the full
query; these pin the numpy kernel itself)."""

import numpy as np
import pytest

from gdal_spark.operators.delaunay import delaunay_triangles_np


def test_square_with_center():
    # unit square + center → exactly 4 triangles, all using the center
    pid = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    x = np.array([0.0, 1.0, 1.0, 0.0, 0.5])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.5])
    v = np.array([10.0, 20.0, 30.0, 40.0, 25.0])
    tri = delaunay_triangles_np(pid, x, y, v)
    assert len(tri) == 4
    assert (tri[["ia", "ib", "ic"]].apply(
        lambda r: 5 in (r.ia, r.ib, r.ic), axis=1)).all()


def test_empty_circumcircle_property():
    rng = np.random.RandomState(7)
    n = 40
    x, y = rng.rand(n) * 10, rng.rand(n) * 10
    v = rng.rand(n)
    pid = np.arange(1, n + 1, dtype=np.int64)
    tri = delaunay_triangles_np(pid, x, y, v)
    # Euler: triangulation of n points with h hull points has
    # 2n - 2 - h triangles
    assert len(tri) > n
    by_id = {int(p): (x[i], y[i]) for i, p in enumerate(pid)}
    for row in tri.itertuples():
        ax, ay, bx, by, cx, cy = row.ax, row.ay, row.bx, row.by, row.cx, row.cy
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        for p, (qx, qy) in by_id.items():
            if p in (row.ia, row.ib, row.ic):
                continue
            assert (qx - ux) ** 2 + (qy - uy) ** 2 >= r2, \
                f"point {p} inside circumcircle of ({row.ia},{row.ib},{row.ic})"


def test_degenerate_inputs():
    pid = np.array([1, 2], dtype=np.int64)
    tri = delaunay_triangles_np(pid, np.array([0.0, 1.0]),
                                np.array([0.0, 1.0]), np.array([1.0, 2.0]))
    assert len(tri) == 0
    # 3 collinear points → no triangle (d == 0)
    pid = np.array([1, 2, 3], dtype=np.int64)
    tri = delaunay_triangles_np(pid, np.array([0.0, 1.0, 2.0]),
                                np.array([0.0, 1.0, 2.0]),
                                np.array([1.0, 2.0, 3.0]))
    assert len(tri) == 0


def test_flood_kernel_equals_bruteforce():
    from gdal_spark.operators.delaunay import delaunay_flood_np
    rng = np.random.RandomState(11)
    for n in (5, 30, 120):
        x, y = rng.rand(n) * 10, rng.rand(n) * 7
        v = rng.rand(n)
        pid = np.arange(1, n + 1, dtype=np.int64)
        bf = delaunay_triangles_np(pid, x, y, v)
        bw = delaunay_flood_np(pid, x, y, v)
        key = lambda df: sorted(map(tuple, df[["ia", "ib", "ic"]].values))
        assert key(bw) == key(bf)


def test_tiled_equals_single_group(spark):
    from gdal_spark.operators.delaunay import (triangulate,
                                               triangulate_single)
    rng = np.random.RandomState(23)
    n = 150
    rows = [(int(i + 1), float(rng.rand()), float(rng.rand() * 20),
             float(rng.rand() * 9)) for i in range(n)]
    pts = spark.createDataFrame(
        rows, "pt_id long, value double, x double, y double")
    key = lambda df: sorted((r["ia"], r["ib"], r["ic"])
                            for r in df.select("ia", "ib", "ic").collect())
    got = key(triangulate(pts, tiles_x=4, tiles_y=2))
    want = key(triangulate_single(pts))
    assert got == want and len(want) > n
