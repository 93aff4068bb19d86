"""line_of_sight vs a direct transliteration of the reference
(alg/los.cpp GDALIsLineOfSightVisible): endpoint pre-checks, the
vertical/horizontal special-case walks, and the Bresenham walk with
sqrt-distance-ratio interpolation — including the closed-form-vs-loop
equivalence the operator relies on, exhaustively."""

import math

import pytest

from gdal_spark.operators.dem import DEM_H, DEM_W

SF = "/root/testdata/sf0.001"


def _terr(x, y):
    return float((x * 31 + y * 17) % 101 + ((x * y) % 7) * 3)


def _bres_ref(x1, y1, x2, y2):
    """Reference Bresenham2D (los.cpp:38-111), points in visit order."""
    pts = []
    dx, incx = (x2 - x1, 1) if x2 >= x1 else (x1 - x2, -1)
    dy, incy = (y2 - y1, 1) if y2 >= y1 else (y1 - y2, -1)
    x, y = x1, y1
    if dx >= dy:
        dy2, dx2 = dy * 2, dx * 2
        balance = dy2 - dx
        while x != x2:
            pts.append((x, y))
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
        pts.append((x, y))
    else:
        dx2, dy2 = dx * 2, dy * 2
        balance = dx2 - dy
        while y != y2:
            pts.append((x, y))
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
        pts.append((x, y))
    return pts


def _bres_closed(x1, y1, x2, y2):
    """The operator's closed form (operators/los._walk_cells)."""
    dx, incx = (x2 - x1, 1) if x2 >= x1 else (x1 - x2, -1)
    dy, incy = (y2 - y1, 1) if y2 >= y1 else (y1 - y2, -1)
    if dx >= dy:
        return [(x1 + i * incx,
                 y1 + incy * ((2 * i * dy + dx) // (2 * dx)) if dx else y1)
                for i in range(dx + 1)]
    return [(x1 + incx * ((2 * i * dx + dy) // (2 * dy)),
             y1 + i * incy) for i in range(dy + 1)]


def test_closed_form_equals_reference_loop_exhaustive():
    r = range(-6, 7)
    for x1 in r:
        for y1 in r:
            for x2 in r:
                for y2 in r:
                    assert _bres_closed(x1, y1, x2, y2) == \
                        _bres_ref(x1, y1, x2, y2), (x1, y1, x2, y2)


def _los_ref(xa, ya, za, xb, yb, zb):
    """Transliteration of GDALIsLineOfSightVisible (los.cpp:183-368)."""
    if za < _terr(xa, ya):
        return False, xa, ya
    if zb < _terr(xb, yb):
        return False, xb, yb
    if xa == xb and ya == yb:
        return True, -1, -1
    if xa == xb:
        step = 1 if ya < yb else -1
        for y in range(ya, yb + step, step):
            z = za + ((y - ya) / (yb - ya)) * (zb - za)
            if z < _terr(xa, y):
                return False, xa, y
        return True, -1, -1
    if ya == yb:
        step = 1 if xa < xb else -1
        for x in range(xa, xb + step, step):
            z = za + ((x - xa) / (xb - xa)) * (zb - za)
            if z < _terr(x, ya):
                return False, x, ya
        return True, -1, -1
    denom = float((xb - xa) ** 2 + (yb - ya) ** 2)
    for x, y in _bres_ref(xa, ya, xb, yb):
        ratio = math.sqrt(((x - xa) ** 2 + (y - ya) ** 2) / denom)
        z = za + ratio * (zb - za)
        if z < _terr(x, y):
            return False, x, y
    return True, -1, -1


def test_batch_matches_reference_per_pair(spark):
    from gdal_spark.queries import _los_pairs, q_line_of_sight

    got = {r.pair_id: (r.visible, r.ix, r.iy)
           for r in q_line_of_sight(spark, SF).collect()}
    outcomes = set()
    for p, xa, ya, za, xb, yb, zb in _los_pairs():
        vis, ix, iy = _los_ref(xa, ya, za, xb, yb, zb)
        assert got[p] == (vis, ix, iy), (p, got[p], (vis, ix, iy))
        outcomes.add((vis, (ix, iy) == (xa, ya), (ix, iy) == (xb, yb)))
    # the fixture is non-vacuous: visible, blocked-at-A/B and
    # blocked-mid-walk outcomes all occur
    assert (True, False, False) in outcomes
    assert any(not v and a for v, a, _ in outcomes)
    assert any(not v and not a and not b for v, a, b in outcomes)


def test_curvature_flips_visibility(spark):
    """-cc correction at the fixture's 5 km cell scale must flip some
    pairs visible (terrain drops with distance) and never flip
    visible -> invisible."""
    from gdal_spark.queries import q_line_of_sight, q_los_curvature

    base = {r["pair_id"]: r["visible"]
            for r in q_line_of_sight(spark, "").collect()}
    curv = {r["pair_id"]: r["visible"]
            for r in q_los_curvature(spark, "").collect()}
    flips = [p for p in base if base[p] != curv[p]]
    assert len(flips) >= 1
    for p in flips:
        assert curv[p] and not base[p]
