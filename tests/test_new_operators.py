"""Unit tests for round-1 additions: Hilbert code, warp envelope,
distributed CCL, proximity, IVF assignment."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import sqlexpr
from gdal_spark.geo import warp as W_
from gdal_spark.queries import ZRAST_GT, ZRAST_W, ZRAST_H


def test_hilbert_py_locality():
    # adjacent cells along the curve are adjacent in the grid
    order = 4
    n = 1 << order
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[sqlexpr.hilbert_d_py(x, y, order)] = (x, y)
    assert len(pos) == n * n  # bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps


def test_warp_envelope_roundtrip():
    env = W_.suggested_warp_output(ZRAST_GT, ZRAST_W, ZRAST_H)
    # envelope covers the transformed corners
    for lon, lat in [(ZRAST_GT[0], ZRAST_GT[3]),
                     (ZRAST_GT[0] + ZRAST_W * ZRAST_GT[1],
                      ZRAST_GT[3] + ZRAST_H * ZRAST_GT[5])]:
        mx, my = W_.fwd_3857(lon, lat)
        assert env["minx"] - 1e-6 <= mx <= env["maxx"] + 1e-6
        assert env["miny"] - 1e-6 <= my <= env["maxy"] + 1e-6
    # inverse round-trips forward within float noise
    for lon, lat in [(-1.0, 51.9), (0.5, 52.2)]:
        mx, my = W_.fwd_3857(lon, lat)
        lon2, lat2 = W_.inv_3857(mx, my)
        assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    assert env["width"] >= 1 and env["height"] >= 1
    # stretched sizes cover the extent exactly
    assert math.isclose(env["psx"] * env["width"], env["maxx"] - env["minx"])
    assert math.isclose(env["psy"] * env["height"], env["maxy"] - env["miny"])


def test_ccl_matches_unionfind(spark):
    # random-ish deterministic mask; distributed CCL vs local union-find
    from gdal_spark.operators import polygonize as poly_op
    rng = np.random.RandomState(7)
    W = 64
    pts = {(int(y), int(x)) for y, x in zip(rng.randint(0, W, 400),
                                            rng.randint(0, W, 400))}
    mask = spark.createDataFrame(
        [(y, x) for y, x in sorted(pts)], "py long, px long")
    labels = {(r["py"], r["px"]): r["label"]
              for r in poly_op.polygonize(mask, W, tile=16).collect()}

    parent = {p: p for p in pts}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (y, x) in pts:
        for q in ((y + 1, x), (y, x + 1)):
            if q in pts:
                ra, rb = find((y, x)), find(q)
                if ra != rb:
                    parent[ra] = rb
    expect = {}
    for p in pts:
        r = find(p)
        expect.setdefault(r, min(py * W + px for (py, px) in pts if find((py, px)) == r))
    for p in pts:
        assert labels[p] == expect[find(p)], p


def test_proximity_exact(spark):
    from gdal_spark.operators import proximity as prox_op
    tgts = [(3, 3), (10, 12)]
    pixels = spark.createDataFrame(
        [(y, x) for y in range(16) for x in range(16)], "py long, px long")
    targets = spark.createDataFrame(tgts, "py long, px long")
    got = {(r["py"], r["px"]): r["dist"]
           for r in prox_op.proximity(pixels, targets, 4.0).collect()}
    for y in range(16):
        for x in range(16):
            d = min(math.sqrt((y - ty) ** 2 + (x - tx) ** 2) for ty, tx in tgts)
            if d <= 4.0:
                assert math.isclose(got[(y, x)], round(d, 6)), (y, x)
            else:
                assert (y, x) not in got


def test_ivf_assignment_ties(spark):
    from gdal_spark.operators import ann as ann_op
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.5, 0.5]), (3, [2.0, 2.0])],
        "vec_id long, embedding array<float>")
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    cells = {r["vec_id"]: r["cell"]
             for r in ann_op.assign_cells(df, cents).collect()}
    assert cells[0] == 0 and cells[1] == 1 and cells[3] == 1
    assert cells[2] == 0  # equidistant → lowest centroid id
