"""grid_metrics_avg: average_distance vs direct recomputation and the
self-pair-inclusive avg_distance_pts rule (gdalgrid.cpp quadtree path
`for j = k`)."""

import math

import pytest

from gdal_spark.queries import AVGPTS_RADIUS, EGRID

SF = "/root/testdata/sf0.001"


def test_metrics_avg_direct(spark):
    from gdal_spark.queries import (_egrid_cand, _egrid_cand_r,
                                    q_grid_metrics_avg)
    rows = {(r.cy, r.cx): r
            for r in q_grid_metrics_avg(spark, SF).collect()}
    cand = _egrid_cand(spark, SF).select("cy", "cx", "pt_id", "d",
                                         "lon", "lat").collect()
    by_cell: dict = {}
    for c in cand:
        by_cell.setdefault((c.cy, c.cx), []).append(c)
    assert set(rows) == set(by_cell)
    for k, cs in list(by_cell.items())[:40]:
        r = rows[k]
        ds = [c.d for c in cs]
        assert r.n == len(ds)
        assert r.range_d == pytest.approx(max(ds) - min(ds), abs=1e-6)
        assert r.avg_d == pytest.approx(sum(ds) / len(ds), abs=1e-6)

    sm = _egrid_cand_r(spark, SF, AVGPTS_RADIUS).select(
        "cy", "cx", "pt_id", "lon", "lat").collect()
    by2: dict = {}
    for c in sm:
        by2.setdefault((c.cy, c.cx), []).append(c)
    for k, cs in list(by2.items())[:20]:
        # quadtree-path rule: pairs with a.pt_id <= b.pt_id incl. self
        tot, n = 0.0, 0
        for a in cs:
            for b in cs:
                if a.pt_id <= b.pt_id:
                    tot += math.hypot(b.lon - a.lon, b.lat - a.lat)
                    n += 1
        r = rows[k]
        assert r.n_pairs == n, k
        assert r.avg_d_pts == pytest.approx(tot / n, abs=1e-6)
