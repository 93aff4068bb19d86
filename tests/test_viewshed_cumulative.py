"""Cumulative viewshed (alg/viewshed/cumulative.cpp) — per-cell sum of
the 16 single-observer masks, each independently checked against the
serial los.cpp walk twin from tests/test_viewshed.py."""

from gdal_spark.queries import VS_MAXD, VS_OZ, VSC_SPACING
from tests.test_viewshed import _terr, _visible_ref

SF = "/root/testdata/sf0.001"


def _expected_counts():
    counts = {}
    for oy in range(0, 64, VSC_SPACING):
        for ox in range(0, 64, VSC_SPACING):
            oz = _terr(ox, oy) + VS_OZ
            for py in range(64):
                for px in range(64):
                    if (px - ox) ** 2 + (py - oy) ** 2 > VS_MAXD ** 2:
                        continue
                    if _visible_ref(ox, oy, oz, px, py, _terr(px, py)):
                        counts[(py, px)] = counts.get((py, px), 0) + 1
    return counts


def test_cumulative_counts_match_serial_sum(spark):
    from gdal_spark.queries import q_viewshed_cumulative
    want = _expected_counts()
    got = {(r.py, r.px): (r.n_vis, r.scaled)
           for r in q_viewshed_cumulative(spark, SF).collect()}
    assert len(got) == 64 * 64
    mx = max(n for n, _ in got.values())
    assert mx == max(want.values())
    for py in range(64):
        for px in range(64):
            n, s = got[(py, px)]
            assert n == want.get((py, px), 0), (py, px)
            assert s == n * 255 // mx
    # non-vacuous: some cells seen by several observers
    assert mx >= 2
