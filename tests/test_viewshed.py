"""Viewshed (gdal_viewshed, alg/viewshed/) — the distributed R3
per-cell LOS form vs a direct serial Python walk implementing the
los.cpp visibility rules (Bresenham + sqrt-ratio interpolation,
z >= terrain visible)."""

import math

from gdal_spark.queries import VS_MAXD, VS_OX, VS_OY, VS_OZ, VS_TZ

SF = "/root/testdata/sf0.001"


def _terr(x, y):
    return float((x * 31 + y * 17) % 101 + ((x * y) % 7) * 3)


def _bres(x1, y1, x2, y2):
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


def _visible_ref(xa, ya, za, xb, yb, zb):
    """Serial los.cpp twin: endpoint pre-checks then interpolated walk."""
    if za < _terr(xa, ya) or zb < _terr(xb, yb):
        return False
    if (xa, ya) == (xb, yb):
        return True
    g2 = float((xb - xa) ** 2 + (yb - ya) ** 2)
    for (x, y) in _bres(xa, ya, xb, yb):
        if xa == xb and ya != yb:
            r = (y - ya) / float(yb - ya)
        elif ya == yb and xa != xb:
            r = (x - xa) / float(xb - xa)
        else:
            r = math.sqrt(((x - xa) ** 2 + (y - ya) ** 2) / g2)
        if za + r * (zb - za) < _terr(x, y):
            return False
    return True


def _expected_mask():
    oz = _terr(VS_OX, VS_OY) + VS_OZ
    out = {}
    for py in range(64):
        for px in range(64):
            if (px - VS_OX) ** 2 + (py - VS_OY) ** 2 > VS_MAXD ** 2:
                continue
            out[(py, px)] = int(_visible_ref(
                VS_OX, VS_OY, oz, px, py, _terr(px, py) + VS_TZ))
    return out


def test_viewshed_matches_serial_reference_walk(spark):
    from gdal_spark.queries import q_viewshed
    got = {(r.py, r.px): r.visible
           for r in q_viewshed(spark, SF).collect()}
    want = _expected_mask()
    assert got == want
    # non-vacuous both ways and the observer sees itself
    assert 0 < sum(got.values()) < len(got)
    assert got[(VS_OY, VS_OX)] == 1


def test_radius_mask_is_exact_circle(spark):
    from gdal_spark.queries import q_viewshed
    cells = [(r.py, r.px) for r in q_viewshed(spark, SF).collect()]
    assert all((px - VS_OX) ** 2 + (py - VS_OY) ** 2 <= VS_MAXD ** 2
               for py, px in cells)
    n_in = sum(1 for py in range(64) for px in range(64)
               if (px - VS_OX) ** 2 + (py - VS_OY) ** 2 <= VS_MAXD ** 2)
    assert len(cells) == n_in
