"""Igor hillshade vs a float64 transliteration of GDALHillshadeIgorAlg
(apps/gdaldem_lib.cpp:947-1013) with the N-S orientation convention
(ewres=1, nsres=-1) the fixed Horn hillshade uses."""

import math

import pytest

from gdal_spark.operators.dem import WIN_OFFSETS

SF = "/root/testdata/sf0.001"


def _terr(x, y):
    return float((x * 31 + y * 17) % 101 + ((x * y) % 7) * 3)


def _ref(py, px, az_deg=315.0):
    w = [_terr(px + dx, py + dy) for dx, dy in WIN_OFFSETS]
    dx = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) * 1.0
    dy = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) * -1.0
    zf = 1.0 / 8.0
    slope_deg = math.atan(math.sqrt(dx * dx + dy * dy) * zf) * 180.0 / math.pi
    dxa = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy2 = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    aspect = math.atan2(dy2, -dxa)

    def norm(a):
        a = math.fmod(a, 2 * math.pi)
        return a + 2 * math.pi if a < 0 else a

    a2 = norm(1.5 * math.pi - math.radians(az_deg))
    diff = abs(norm(aspect) - a2)
    if diff > math.pi:
        diff = 2 * math.pi - diff
    strength = (slope_deg / 90.0) * (1.0 - diff / math.pi)
    return 255.0 * (1.0 - strength)


def test_igor_matches_transliteration(spark):
    from gdal_spark.queries import q_dem_hillshade_igor
    rows = q_dem_hillshade_igor(spark, SF).collect()
    assert len(rows) == 62 * 62
    for r in rows[::31] + rows[:4]:
        assert r.shade == pytest.approx(_ref(r.py, r.px), abs=1e-5), \
            (r.py, r.px)
    vals = [r.shade for r in rows]
    assert 0.0 <= min(vals) and max(vals) <= 255.0
    assert max(vals) - min(vals) > 50  # non-vacuous relief
