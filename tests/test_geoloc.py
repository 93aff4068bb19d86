"""Geolocation-array transform invariants (alg/gdalgeoloc.cpp).

The gated queries prove Spark/DuckDB parity (and, for the forward
path, join-vs-arithmetic independence); these tests prove the
SEMANTICS: interpolation exactness at nodes, edge extrapolation
continuity, and the backmap's round-trip consistency."""

import duckdb
import pytest

from gdal_spark.operators import geoloc as G


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _lon(p, l):
    return 10.0 + 0.1 * p + 0.02 * l + 0.0005 * p * l


def _lat(p, l):
    return 50.0 - 0.08 * l + 0.01 * p + 0.0003 * p * l


def test_forward_exact_at_nodes(con):
    # raster pixels landing exactly on geoloc nodes (even px, py)
    rows = con.execute(G.forward_sql("duck")).fetchall()
    for py, px, gx, gy in rows:
        if px % 2 == 0 and py % 2 == 0:
            p, l = px * G.PIXEL_STEP, py * G.LINE_STEP
            assert abs(gx - _lon(p, l)) < 1e-9
            assert abs(gy - _lat(p, l)) < 1e-9


def test_forward_bilinear_between_nodes(con):
    # the fixture surface has a p*l cross term, so bilinear in-cell
    # interpolation is EXACT for it (bilinear reproduces x, y, xy)
    rows = con.execute(G.forward_sql("duck")).fetchall()
    for py, px, gx, gy in rows:
        p, l = px * G.PIXEL_STEP, py * G.LINE_STEP
        assert abs(gx - _lon(p, l)) < 1e-9
        assert abs(gy - _lat(p, l)) < 1e-9


def test_backmap_round_trip(con):
    # each non-empty cell's averaged (pixel, line), forward-projected,
    # must land within one cell of that cell's center
    cell = con.execute(
        G.backmap_sql("duck").replace(
            "SELECT bmy, bmx,",
            "SELECT (SELECT minx FROM cell) AS minx, "
            "(SELECT maxy FROM cell) AS maxy, "
            "(SELECT psx FROM cell) AS psx, "
            "(SELECT psy FROM cell) AS psy, bmy, bmx,")).fetchall()
    assert len(cell) > 1000
    for minx, maxy, psx, psy, bmy, bmx, ap, al, n in cell:
        gx, gy = _lon(ap, al), _lat(ap, al)
        fx = (gx - minx) / psx
        fy = (maxy - gy) / psy
        assert abs(fx - (bmx + 0.5)) <= 1.5
        assert abs(fy - (bmy + 0.5)) <= 1.5
        assert 1 <= n <= 8
