"""Polygon buffer: emitted ring area matches the closed form
A + P*r + (K-gon fan area), fans sum to one full turn for convex."""

import math

from gdal_spark.queries import (BUFFER_POLY_R, _poly_buffer_rows,
                                q_buffer_polygons)


def test_buffered_ring_area_closed_form(spark):
    from gdal_spark.fixtures import ZONES
    from gdal_spark.geo.geom import ring_signed_area
    rows = {}
    for r in q_buffer_polygons(spark, "/root/testdata/sf0.001").collect():
        rows.setdefault((r["zone_fid"], r["part_id"]), []).append(
            (r["seq"], r["vx"], r["vy"]))
    parts = {(z["zone_fid"], pid): [(float(x), float(y)) for x, y in ring]
             for z in ZONES for pid, ring in enumerate(z["parts"])}
    rr = float(BUFFER_POLY_R)
    for key, vs in rows.items():
        ring = [(x, y) for _, x, y in sorted(vs)]
        got = abs(ring_signed_area(ring))
        pts = parts[key]
        n = len(pts)
        a = abs(sum(pts[i][0] * pts[(i + 1) % n][1]
                    - pts[(i + 1) % n][0] * pts[i][1]
                    for i in range(n))) / 2.0
        p = sum(math.hypot(pts[(i + 1) % n][0] - pts[i][0],
                           pts[(i + 1) % n][1] - pts[i][1])
                for i in range(n))
        # fans sum to a full turn; K-gon-ish disc area is <= pi r^2
        assert a + p * rr < got <= a + p * rr + math.pi * rr * rr + 1e-9
        # each emitted ring is closed and duplicate-free
        assert len(set(ring)) == len(ring)
