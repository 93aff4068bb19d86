"""Convex decomposition (geo/decompose.py) and the general WKB overlay
path: partition invariants, pointwise-indicator equality with the
direct point-in-polygon test, fixture-zone reproduction, and the
distributed operator's equality with the driver twin."""

import numpy as np
import pytest

from gdal_spark.geo.decompose import (clean_ring, convex_decompose,
                                      ensure_ccw)
from gdal_spark.geo.geom import point_in_polygon, ring_signed_area


def _shapes():
    from gdal_spark.queries import _genpoly_rings
    return _genpoly_rings()


def _is_convex(p):
    n = len(p)
    scale = max(float(np.abs(p).max()), 1.0)
    return all(
        np.cross(p[(i + 1) % n] - p[i], p[(i + 2) % n] - p[(i + 1) % n])
        >= -1e-12 * scale * scale
        for i in range(n))


def test_pieces_are_convex_and_partition_area():
    for fid, rings in _shapes():
        for ring in rings:
            pieces = convex_decompose(ring)
            assert pieces, (fid, "no pieces")
            for p in pieces:
                assert _is_convex(p), (fid, "non-convex piece")
                assert ring_signed_area(p) > 0, (fid, "CW piece")
            want = ring_signed_area(
                ensure_ccw(clean_ring(np.asarray(ring, float))))
            got = sum(ring_signed_area(p) for p in pieces)
            assert got == pytest.approx(want, rel=1e-12), fid


def test_signed_indicator_matches_point_in_polygon():
    """Σ sign·1_piece(x) == 1_polygon(x) at every probe point not on a
    boundary — the inclusion-exclusion identity the whole overlay
    algebra rests on, checked against the independent crossing-number
    test."""
    rng = np.linspace(0.07, 19.93, 41)
    gx, gy = np.meshgrid(rng, rng)
    px, py = gx.ravel(), gy.ravel()
    for fid, rings in _shapes():
        want = point_in_polygon(px, py, rings).astype(int)
        acc = np.zeros(len(px), dtype=int)
        pieces_all = []
        for ri, ring in enumerate(rings):
            sign = 1 if ri == 0 else -1
            for p in convex_decompose(ring):
                pieces_all.append(p)
                acc += sign * point_in_polygon(px, py, [p]).astype(int)
        # probes exactly ON a piece edge (outer boundary or an internal
        # diagonal) are legitimately double-counted by the inclusive
        # per-piece edge rule — the identity is almost-everywhere,
        # which is what the area algebra integrates; require equality
        # off that measure-zero set
        diff = np.nonzero(acc != want)[0]
        for i in diff:
            d = min(_dist_to_rings(px[i], py[i], pieces_all), 1.0)
            assert d < 1e-9, (fid, px[i], py[i], acc[i], want[i])


def _dist_to_rings(x, y, rings):
    best = np.inf
    for ring in rings:
        pts = np.asarray(ring, float).reshape(-1, 2)
        for i in range(len(pts)):
            a, b = pts[i], pts[(i + 1) % len(pts)]
            ab = b - a
            t = np.clip(np.dot([x, y] - a, ab)
                        / max(np.dot(ab, ab), 1e-300), 0, 1)
            best = min(best, float(np.hypot(*([x, y] - a - t * ab))))
    return best


def test_fixture_zone_areas_reproduced():
    """Decomposing every fixture zone's raw rings (outer + holes)
    reproduces zone_area — the hand decomposition is no longer load-
    bearing."""
    from gdal_spark.fixtures import ZONES, zone_area
    for z in ZONES:
        net = 0.0
        for ri, ring in enumerate(z["rings"]):
            s = 1 if ri == 0 else -1
            net += s * sum(ring_signed_area(p)
                           for p in convex_decompose(ring))
        assert net == pytest.approx(float(zone_area(z)), rel=1e-12), \
            z["zone_fid"]


def test_distributed_decompose_equals_twin(spark):
    from gdal_spark.geo.wkb import polygon_wkb
    from gdal_spark.operators.algebra import (decompose_pieces_wkb,
                                              wkb_pieces_rows)
    rows = [(fid, polygon_wkb(rings)) for fid, rings in _shapes()]
    polys = spark.createDataFrame(rows, "zone_fid int, wkb binary")
    got = sorted(
        (r["zone_fid"], r["piece_id"], r["sign"], tuple(r["ring"]))
        for r in decompose_pieces_wkb(polys).collect())
    want = sorted((fid, pid, sign, tuple(flat))
                  for fid, pid, sign, flat, *_ in
                  wkb_pieces_rows(_shapes()))
    assert got == want


def test_general_overlay_sanity(spark):
    """Containment pair (5 ⊂ 2 solid region) must intersect at exactly
    |5|; the chevron/holed-rectangle pair (6, 7) at |6∩7| < |6|."""
    from gdal_spark.queries import q_algebra_pieces_general
    out = {(r["fid_a"], r["fid_b"]): r["inter_area"]
           for r in q_algebra_pieces_general(spark, "").collect()}
    assert out[(2, 5)] == pytest.approx(1.2 * 1.2, rel=1e-12)
    assert (6, 7) in out and 0 < out[(6, 7)]
