"""Minimum-rotated-rectangle properties vs a dense angle sweep."""

import math

import numpy as np

from gdal_spark.fixtures import ZONES
from gdal_spark.queries import q_oriented_envelope, q_point_on_surface


def _sweep_min_area(pts, n=3600):
    best = math.inf
    xs, ys = pts[:, 0], pts[:, 1]
    for k in range(n):
        t = math.pi * k / n
        c, s = math.cos(t), math.sin(t)
        u = xs * c + ys * s
        v = -xs * s + ys * c
        best = min(best, (u.max() - u.min()) * (v.max() - v.min()))
    return best


def test_mrr_at_most_aabb_and_matches_sweep(spark):
    rows = {r["zone_fid"]: r
            for r in q_oriented_envelope(spark, "").collect()}
    for z in ZONES:
        pts = np.array(z["rings"][0], dtype=float)
        aabb = (pts[:, 0].ptp()) * (pts[:, 1].ptp())
        got = rows[z["zone_fid"]]["mrr_area"]
        assert got <= aabb + 1e-9
        # the dense sweep only samples angles, so its min is an UPPER
        # bound on the true MRR; the edge-aligned min must match it to
        # sweep resolution
        sweep = _sweep_min_area(pts)
        assert got <= sweep + 1e-6
        assert got >= sweep - 1e-3  # sweep can't beat the true optimum by much


def test_point_on_surface_is_interior(spark):
    # the emitted point must be strictly inside its zone's outer ring
    # (even-odd rule) and outside every hole
    rows = {r["zone_fid"]: r
            for r in q_point_on_surface(spark, "").collect()}

    def inside(ring, x, y):
        n, c = len(ring), False
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 <= y < y2) or (y2 <= y < y1):
                if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                    c = not c
        return c

    for z in ZONES:
        r = rows[z["zone_fid"]]
        assert inside(z["rings"][0], r["posx"], r["posy"]), z["zone_fid"]
        for hole in z["rings"][1:]:
            assert not inside(hole, r["posx"], r["posy"]), z["zone_fid"]
