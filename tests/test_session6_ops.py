"""Invariant tests for the round-3 final-session operators —
properties the cross-engine gate can't see (it proves Spark == DuckDB;
these prove both match the published semantics)."""

import math

from conftest import SF_SMOKE


def test_cutline_blend_density_semantics(spark):
    """Blend density must be in [0,1]; pixels deeper inside the
    cutline than the blend distance must be exactly 1; every pixel of
    the hard warp_cutline keep-set must have density >= 0.5 (inside =>
    non-negative signed distance => ramp at or above its midpoint)."""
    from gdal_spark.queries import (CBLEND_PX, ZRAST_GT, _z9_pixel_edges,
                                    q_cutline_blend)
    df = q_cutline_blend(spark, SF_SMOKE).toPandas()
    assert ((df.density > 0) & (df.density <= 1)).all()

    # python twin of the signed distance, on a few probe pixels
    edges = _z9_pixel_edges()

    def density(py, px):
        cx, cy = px + 0.5, py + 0.5
        d2min, in_part, in_hole = float("inf"), True, True
        for is_hole, x1, y1, x2, y2 in edges:
            ex, ey = x2 - x1, y2 - y1
            l2 = ex * ex + ey * ey
            t = min(1.0, max(0.0, ((cx - x1) * ex + (cy - y1) * ey) / l2))
            d2 = (cx - (x1 + t * ex)) ** 2 + (cy - (y1 + t * ey)) ** 2
            d2min = min(d2min, d2)
            cross = ex * (cy - y1) - ey * (cx - x1)
            if is_hole == 0 and cross > 0:
                in_part = False
            if is_hole == 1 and cross >= 0:
                in_hole = False
        s = 1.0 if (in_part and not in_hole) else -1.0
        return min(1.0, max(0.0, 0.5 + s * math.sqrt(d2min)
                            / (2 * CBLEND_PX)))

    got = df.set_index(["py", "px"]).density
    for py in range(0, 40, 7):
        for px in range(0, 40, 7):
            want = round(density(py, px), 6)
            if want > 0:
                assert abs(got.loc[(py, px)] - want) < 1e-9
            else:
                assert (py, px) not in got.index


def test_gcp_refine_removes_exactly_the_planted_outliers(spark):
    from gdal_spark.queries import _gcp_refine_fixture, q_gcp_refine
    df = q_gcp_refine(spark, SF_SMOKE).toPandas()
    planted = {gid for gid, *_ in [r for r in _gcp_refine_fixture()]
               if gid % 6 == 1}
    survivors = set(df.gid)
    assert survivors == set(range(24)) - planted
    # the exact affine is recovered and residuals vanish
    row = df.iloc[0]
    assert (row.a0e, row.a1e, row.a2e) == (100.0, 0.5, 0.03)
    assert (row.a0n, row.a1n, row.a2n) == (200.0, 0.02, -0.4)
    assert (df.resid2.abs() < 1e-9).all()


def test_line_merge_matches_networkx_free_reference(spark):
    """Recompute merged components with a plain python union-find over
    the same degree-2 rule; counts, ring flags and lengths must agree."""
    from gdal_spark.fixtures import zone_ring_edge_rows
    from gdal_spark.queries import q_line_merge
    df = q_line_merge(spark, SF_SMOKE).toPandas()

    segs = {}
    for zf, rid, e, x1, y1, x2, y2 in zone_ring_edge_rows():
        key = zf * 100 + rid * 10 + e
        a = (round(x1 * 100), round(y1 * 100))
        b = (round(x2 * 100), round(y2 * 100))
        segs[key] = (a, b, math.hypot(x2 - x1, y2 - y1))
    deg = {}
    for a, b, _ in segs.values():
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    parent = {k: k for k in segs}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    by_node = {}
    for k, (a, b, _) in segs.items():
        by_node.setdefault(a, []).append(k)
        by_node.setdefault(b, []).append(k)
    for node, ks in by_node.items():
        if deg[node] == 2 and len(ks) == 2:
            ra, rb = find(ks[0]), find(ks[1])
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for k in segs:
        comps.setdefault(find(k), []).append(k)
    want = {}
    for ks in comps.values():
        nodes = set()
        length = 0.0
        for k in ks:
            a, b, ln = segs[k]
            nodes |= {a, b}
            length += ln
        want[min(ks)] = (len(ks), len(nodes),
                         1 if len(nodes) == len(ks) else 0, length)
    got = {int(r.line_id): (int(r.n_segs), int(r.n_nodes), int(r.is_ring),
                            float(r.length)) for _, r in df.iterrows()}
    assert set(got) == set(want)
    for lid, (ns, nn, ring, ln) in want.items():
        gns, gnn, gring, gln = got[lid]
        assert (gns, gnn, gring) == (ns, nn, ring)
        assert abs(gln - ln) < 1e-5
    # the shared zone-4/zone-6 edge must break chains: both 1-segment
    # pieces exist and at least 8 full rings survive
    assert sum(1 for v in want.values() if v[0] == 1) >= 2
    assert sum(1 for v in want.values() if v[2] == 1) >= 8


def test_ndcg_bounds_and_perfect_ranking_is_1(spark):
    from gdal_spark.queries import q_ndcg_eval
    df = q_ndcg_eval(spark, SF_SMOKE).toPandas()
    assert len(df) == 8
    assert ((df.ndcg10 > 0) & (df.ndcg10 <= 1)).all()
    assert ((df.mrr >= 0) & (df.mrr <= 1)).all()
    assert (df.dcg10 <= df.idcg10 + 1e-9).all()


def test_line_zonal_length_hand_checked_zones(spark):
    """Zones whose clipped road length is computable by hand: zone 0
    holds its own 1.9x1.7 quad ring (perimeter 7.2) plus the fully
    contained zone-7 ring (2.6); zone 7 holds only its own ring; the
    isolated mid-ocean zone 5 holds its 24x28 ring (104); and a road
    lying exactly ON the zone-9 hole ring keeps its FULL length (holes
    subtract their open interior only)."""
    from gdal_spark.queries import q_line_zonal_length
    df = (q_line_zonal_length(spark, SF_SMOKE).toPandas()
          .set_index("zone_fid"))
    assert abs(df.road_len[0] - 9.8) < 1e-6
    assert abs(df.road_len[7] - 2.6) < 1e-6
    assert abs(df.road_len[5] - 104.0) < 1e-6
    assert df.road_len[9] > 10.5 - 1e-6  # outer 8.0 + hole ring 2.5 + overlaps


def test_luhn_matches_python_reference(spark):
    from gdal_spark.queries import q_luhn_cc
    df = q_luhn_cc(spark, SF_SMOKE).toPandas()

    def luhn_valid(s):
        tot = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - (9 if d >= 5 else 0)
            tot += d
        return tot % 10 == 0

    assert len(df) > 0
    for _, r in df.iterrows():
        assert len(r.cc) == 16
        assert bool(r.luhn_valid) == luhn_valid(r.cc)
        if r.luhn_valid:
            assert r.masked == "*" * 12 + r.cc[12:]
        else:
            assert r.masked == r.cc
    # the seeded known-valid PAN rows are all detected as valid
    pan = df[df.cc == "4539148803436467"]
    assert len(pan) > 0 and pan.luhn_valid.all()
