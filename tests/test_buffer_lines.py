"""Line-buffer capsule construction invariants (q_buffer_lines):
every construction vertex lies at distance exactly r from its source
segment — the defining property of the round-cap segment buffer
boundary (cap vertices measure to the endpoint, rectangle corners to
the segment interior endpointwise)."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _seg_dist(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    t = ((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy)
    t = min(1.0, max(0.0, t))
    return math.hypot(px - (x1 + t * dx), py - (y1 + t * dy))


def test_capsule_vertices_at_exact_distance(spark):
    from gdal_spark.fixtures import zone_ring_edge_rows
    from gdal_spark.queries import BUFFER_LINE_R, q_buffer_lines

    edges = {(z, rid, e): (x1, y1, x2, y2)
             for z, rid, e, x1, y1, x2, y2 in zone_ring_edge_rows()}
    rows = q_buffer_lines(spark, SF).collect()
    assert len(rows) == len(edges) * 2 * 9  # 2 caps x (m+1) fan verts
    ds = []
    for r in rows:
        x1, y1, x2, y2 = edges[(r.zone_fid, r.ring_id, r.edge)]
        ds.append(_seg_dist(r.vx, r.vy, x1, y1, x2, y2))
    assert np.allclose(ds, BUFFER_LINE_R, rtol=0, atol=1e-12)


def test_cap_fans_span_semicircle(spark):
    """k=0 and k=m vertices of the two caps are the four offset-
    rectangle corners: each pair across the segment is 2r apart."""
    from gdal_spark.queries import BUFFER_LINE_R, q_buffer_lines

    rows = q_buffer_lines(spark, SF).collect()
    by_edge = {}
    for r in rows:
        by_edge.setdefault((r.zone_fid, r.ring_id, r.edge), {})[
            (r.endpt, r.k)] = (r.vx, r.vy)
    m = max(k for (_, k) in next(iter(by_edge.values())))
    for verts in by_edge.values():
        for endpt in (0, 1):
            (ax, ay), (bx, by) = verts[(endpt, 0)], verts[(endpt, m)]
            assert math.hypot(bx - ax, by - ay) == pytest.approx(
                2 * BUFFER_LINE_R, abs=1e-12)
