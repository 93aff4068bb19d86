"""Linear referencing (apps/ogrlineref.cpp) vs direct serial twins of
OGRLineString::Value (point at arclength) and ::Project (arclength of
nearest point), ogr/ogrlinestring.cpp."""

import math

from gdal_spark.fixtures import zone_ring_edge_rows
from gdal_spark.queries import LREF_STEP

SF = "/root/testdata/sf0.001"


def _rings():
    rings = {}
    for z, r, e, x1, y1, x2, y2 in zone_ring_edge_rows():
        rings.setdefault((z, r), []).append((e, x1, y1, x2, y2))
    for k in rings:
        rings[k].sort()
    return rings


def _value(segs, m):
    """OGRLineString::Value twin: walk segments, interpolate."""
    cum = 0.0
    for _, x1, y1, x2, y2 in segs:
        ln = math.hypot(x2 - x1, y2 - y1)
        if cum <= m < cum + ln:
            t = (m - cum) / ln
            return x1 + t * (x2 - x1), y1 + t * (y2 - y1)
        cum += ln
    _, x1, y1, x2, y2 = segs[-1]
    return x2, y2


def _project_all(qx, qy, rings):
    best = None
    for (z, r), segs in sorted(rings.items()):
        cum = 0.0
        for e, x1, y1, x2, y2 in segs:
            ln = math.hypot(x2 - x1, y2 - y1)
            t = ((qx - x1) * (x2 - x1) + (qy - y1) * (y2 - y1)) / (ln * ln)
            t = min(max(t, 0.0), 1.0)
            d2 = (qx - (x1 + t * (x2 - x1))) ** 2 \
                + (qy - (y1 + t * (y2 - y1))) ** 2
            key = (d2, z, r, e)
            if best is None or key < best[0]:
                best = (key, z, r, cum + t * ln, math.sqrt(d2))
            cum += ln
    return best[1:]


def test_stations_match_value_walk(spark):
    import pytest as pt

    from gdal_spark.queries import q_lineref_stations
    rings = _rings()
    rows = q_lineref_stations(spark, SF).collect()
    # every ring gets floor(total/step)+1 stations
    per = {}
    for r in rows:
        per[(r.zone_fid, r.ring_id)] = per.get((r.zone_fid, r.ring_id), 0) + 1
    for k, segs in rings.items():
        tot = sum(math.hypot(x2 - x1, y2 - y1)
                  for _, x1, y1, x2, y2 in segs)
        assert per[k] == int(tot / LREF_STEP) + 1, k
    for r in rows[::7]:
        x, y = _value(rings[(r.zone_fid, r.ring_id)], r.station * LREF_STEP)
        assert r.x == pt.approx(x, abs=1e-6)
        assert r.y == pt.approx(y, abs=1e-6)


def test_projection_matches_brute_force(spark):
    import pytest as pt

    from gdal_spark.queries import q_lineref_project
    rings = _rings()
    rows = q_lineref_project(spark, SF).collect()
    assert len(rows) == len(zone_ring_edge_rows())
    for r in rows:
        z = r.pid // 1000
        ring = (r.pid // 100) % 10
        e = r.pid % 100
        seg = [s for s in zone_ring_edge_rows()
               if s[0] == z and s[1] == ring and s[2] == e][0]
        qx = (seg[3] + seg[5]) / 2.0 + 0.17 * ((z * 7 + e) % 5 - 2)
        qy = (seg[4] + seg[6]) / 2.0 + 0.13 * ((z * 3 + e) % 7 - 3)
        bz, br, pos, dist = _project_all(qx, qy, rings)
        assert (r.zone_fid, r.ring_id) == (bz, br), r.pid
        assert r.pos == pt.approx(pos, abs=1e-6)
        assert r.dist == pt.approx(dist, abs=1e-6)
