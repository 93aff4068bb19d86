"""raster_neighbors vs a direct transliteration of
VRTKernelFilteredSource::FilterData (frmts/vrt/vrtfilters.cpp:485-700):
population stddev, sorted-middle median, and the mode's
first-to-reach-max-count scan-order tie rule."""

import math

from gdal_spark.operators.dem import DEM_H, DEM_W, WIN_OFFSETS

SF = "/root/testdata/sf0.001"


def _terr(x, y):
    return float((x * 31 + y * 17) % 101 + ((x * y) % 7) * 3)


def _ref(py, px):
    # reference scan order: dy outer, dx inner == WIN_OFFSETS k order
    vals = [_terr(px + dx, py + dy) for dx, dy in WIN_OFFSETS]
    n = len(vals)
    mean = sum(vals) / n
    # Welford, as the reference runs it
    m, m2 = 0.0, 0.0
    for i, v in enumerate(vals, 1):
        d = v - m
        m += d / i
        m2 += d * (v - m)
    stddev = math.sqrt(m2 / n)
    median = sorted(vals)[n // 2]
    qs = [int(v) % 4 for v in vals]
    best, maxc, counts = None, 0, {}
    for q in qs:
        counts[q] = counts.get(q, 0) + 1
        if counts[q] > maxc:
            maxc, best = counts[q], q
    return (mean, sum(vals), min(vals), max(vals), stddev, median, best)


def test_focal_stats_match_reference(spark):
    from gdal_spark.queries import q_raster_neighbors
    rows = q_raster_neighbors(spark, SF).collect()
    assert len(rows) == (DEM_W - 2) * (DEM_H - 2)
    import pytest as pt
    for r in rows[::37] + rows[:5]:
        mean, s, mn, mx, sd, med, mode = _ref(r.py, r.px)
        assert r.f_mean == pt.approx(mean, abs=1e-6)
        assert r.f_sum == pt.approx(s, abs=1e-9)
        assert r.f_min == mn and r.f_max == mx
        assert r.f_stddev == pt.approx(sd, abs=1e-6)
        assert r.f_median == med
        assert r.f_mode == mode


def test_mode_tie_rule_first_to_reach():
    """Hand case: [2,1,1,2,...] — both reach count 2; value 1 reaches
    it first (positions 1,2 vs 0,3), so mode must be 1."""
    qs = [2, 1, 1, 2, 3, 0, 3, 0, 3]
    best, maxc, counts = None, 0, {}
    for q in qs:
        counts[q] = counts.get(q, 0) + 1
        if counts[q] > maxc:
            maxc, best = counts[q], q
    assert best == 3 and maxc == 3  # 3 reaches count 3 at the end
    qs2 = [2, 1, 1, 2, 0, 5, 6, 7, 8]
    best, maxc, counts = None, 0, {}
    for q in qs2:
        counts[q] = counts.get(q, 0) + 1
        if counts[q] > maxc:
            maxc, best = counts[q], q
    assert best == 1  # 1's 2nd occurrence (idx 2) precedes 2's (idx 3)
