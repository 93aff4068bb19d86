"""Topology invariants of the coverage operators that the per-cell
gate rows can't express directly."""

import numpy as np

from gdal_spark.geo.geom import dp_keep_mask, ring_signed_area
from gdal_spark.operators import coverage as cov


def test_simplified_coverage_has_no_gaps_or_overlaps():
    """Interior arcs cancel: the sum of simplified cell areas must
    equal the area enclosed by the simplified OUTER boundary alone —
    true iff neighbors take byte-identical shared arcs."""
    rows = cov.simplify_coverage_rows()
    total = sum(r[3] for r in rows)
    full = {aid: vs for aid, _, _, _, vs in cov.grid_arcs()}
    simp = {aid: vs[dp_keep_mask(vs, cov.COV_TOL)]
            for aid, vs in full.items()}
    n = cov.COV_N
    outer_ids = ([ay * n + ax for ay in (0, n) for ax in range(n)]
                 + [(n + 1) * n + ax * n + ay
                    for ax in (0, n) for ay in range(n)])
    # walk the outer ring: bottom fwd, right fwd, top rev, left rev
    parts = []
    for ax in range(n):
        parts.append(simp[0 * n + ax][:-1])
    for ay in range(n):
        parts.append(simp[(n + 1) * n + n * n + ay][:-1])
    for ax in reversed(range(n)):
        parts.append(simp[n * n + ax][::-1][:-1])
    for ay in reversed(range(n)):
        parts.append(simp[(n + 1) * n + 0 * n + ay][::-1][:-1])
    outer = np.vstack(parts)
    assert abs(total - ring_signed_area(outer)) < 1e-12


def test_simplification_is_nontrivial_and_bounded():
    rows = cov.simplify_coverage_rows()
    for cid, nb, na, area in rows:
        assert 4 <= na < nb, f"cell {cid}: {na} vs {nb}"
        assert abs(area - 1.0) < 0.2


def test_clean_coverage_tiles_exactly():
    rows = cov.clean_coverage_rows()
    assert all(r[2] == 1.0 for r in rows)
    assert all(r[3] == 4 * cov.COV_SEGS for r in rows)
    # defective input genuinely doesn't tile
    assert any(abs(r[1] - 1.0) > 1e-4 for r in rows)


def test_snap_agrees_across_shared_edges():
    """After snapping, the vertex multiset of cell (cx,cy)'s right
    side equals cell (cx+1,cy)'s left side — the cleaned coverage's
    shared boundaries are byte-identical."""
    n, segs = cov.COV_N, cov.COV_SEGS
    verts = {}
    for cid, side, k, x, y in cov.clean_cell_vertices():
        if k == 0:      # side-local corner: owned by the adjacent side
            continue
        verts.setdefault((cid, side), []).append(
            (cov.snap(x), cov.snap(y)))
    for cy in range(n):
        for cx in range(n - 1):
            right = set(verts[(cy * n + cx, 1)])
            left = set(verts[(cy * n + cx + 1, 3)])
            assert right == left
