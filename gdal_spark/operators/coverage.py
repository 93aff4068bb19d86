"""Polygonal-coverage operators: simplify-coverage and clean-coverage.

Reference: ``gdal vector simplify-coverage``
(apps/gdalalg_vector_simplify_coverage.cpp — GEOS CoverageSimplifier)
and ``gdal vector clean-coverage``
(apps/gdalalg_vector_clean_coverage.cpp — GEOS CoverageCleaner).

Semantics re-expressed Spark-first:

* **simplify-coverage**: decompose the coverage's boundaries into
  shared ARCS (maximal chains between topology nodes), Douglas–Peucker
  each arc ONCE, then let every incident polygon reuse the same
  simplified polyline. Because neighbors take the identical arc, the
  result is gap-free and overlap-free BY CONSTRUCTION — exactly the
  CoverageSimplifier architecture, and the shape that distributes: the
  DP kernel runs per-arc (groupBy arc → applyInPandas, arcs are
  feature-sized), reassembly is a per-polygon group.
* **clean-coverage**: the cleaner's snapping stage — vertices within
  the snap tolerance of a lattice point collapse onto it, so
  near-coincident boundary chains from adjacent features become
  byte-identical and slivers/gaps vanish.

Fixture: an N×N unit-cell coverage whose straight edges are
segmentized and deterministically jittered (hash arithmetic — no RNG).
For simplify, both cells sharing an edge carry the SAME jittered arc;
for clean, each cell jitters its own copy of the shared edge
INDEPENDENTLY (the gap/sliver defect the cleaner must repair). Jitter
bases sit on lattice centers so the snap is exact: |jitter| < g/2
guarantees floor(v/g + 0.5)*g recovers the base vertex.
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.geo.geom import dp_keep_mask, ring_signed_area

COV_N = 4           # N x N unit cells
COV_SEGS = 8        # subsegments per cell edge
COV_TOL = 0.05      # DP tolerance: keeps 0.15-amp wiggles, drops 0.02
COV_SNAP = 1.0 / COV_SEGS  # clean-coverage snap lattice pitch


def _hash(a: int, b: int) -> int:
    return (a * 2654435761 + b * 2246822519) % 4294967296


def _jit(aid: int, k: int) -> float:
    """Arc-keyed perpendicular jitter: mostly small (under the DP
    tolerance), every ~7th vertex large (over it) — so simplification
    is non-trivial per arc."""
    h = _hash(aid, k)
    amp = 0.15 if h % 7 == 0 else 0.02
    return amp * ((h % 2001) - 1000) / 1000.0


def _jit_cell(cell_id: int, side: int, k: int) -> float:
    """Cell-and-side-keyed jitter (clean fixture): adjacent cells
    disagree on their shared edge. |value| <= 0.03 < COV_SNAP/2."""
    h = _hash(cell_id * 4 + side + 1, k)
    return 0.03 * ((h % 2001) - 1000) / 1000.0


def grid_arcs(n: int = COV_N, segs: int = COV_SEGS):
    """All arcs of the n×n coverage in canonical (+x / +y) direction.

    Returns list of (arc_id, horizontal, ax, ay, vertices) with
    vertices an (segs+1, 2) float array; interior vertices jittered
    perpendicular to the edge."""
    arcs = []
    aid = 0
    for ay in range(n + 1):          # horizontal arcs y=ay, x: ax..ax+1
        for ax in range(n):
            vs = []
            for k in range(segs + 1):
                t = k / segs
                x = ax + t
                y = float(ay)
                if 0 < k < segs:
                    y = y + _jit(aid, k)
                vs.append((x, y))
            arcs.append((aid, True, ax, ay, np.array(vs)))
            aid += 1
    for ax in range(n + 1):          # vertical arcs x=ax, y: ay..ay+1
        for ay in range(n):
            vs = []
            for k in range(segs + 1):
                t = k / segs
                x = float(ax)
                y = ay + t
                if 0 < k < segs:
                    x = x + _jit(aid, k)
                vs.append((x, y))
            arcs.append((aid, False, ax, ay, np.array(vs)))
            aid += 1
    return arcs


def cell_arc_uses(n: int = COV_N):
    """CCW ring of cell (cx,cy) as (cell_id, side, arc_id, reversed):
    bottom fwd, right fwd, top rev, left rev. Horizontal arc (ax,ay)
    has id ay*n+ax; vertical arc (ax,ay) has id (n+1)*n + ax*n + ay."""
    uses = []
    for cy in range(n):
        for cx in range(n):
            cid = cy * n + cx
            h = lambda ax, ay: ay * n + ax
            v = lambda ax, ay: (n + 1) * n + ax * n + ay
            uses += [(cid, 0, h(cx, cy), False),
                     (cid, 1, v(cx + 1, cy), False),
                     (cid, 2, h(cx, cy + 1), True),
                     (cid, 3, v(cx, cy), True)]
    return uses


def assemble_ring(arc_vertices: dict, uses_of_cell) -> np.ndarray:
    """Concatenate a cell's (possibly simplified) arcs into its ring,
    dropping each arc's last vertex (the junction node, owned by the
    next arc)."""
    parts = []
    for _, _, arc_id, rev in sorted(uses_of_cell, key=lambda u: u[1]):
        vs = arc_vertices[arc_id]
        vs = vs[::-1] if rev else vs
        parts.append(vs[:-1])
    return np.vstack(parts)


def simplify_coverage_rows(n: int = COV_N, segs: int = COV_SEGS,
                           tol: float = COV_TOL):
    """Driver-side twin of the distributed pipeline: DP each arc once,
    reassemble every cell from the shared simplified arcs. Returns
    [(cell_id, n_before, n_after, area)] with shoelace area."""
    full = {aid: vs for aid, _, _, _, vs in grid_arcs(n, segs)}
    simp = {aid: vs[dp_keep_mask(vs, tol)] for aid, vs in full.items()}
    uses = cell_arc_uses(n)
    rows = []
    for cid in range(n * n):
        mine = [u for u in uses if u[0] == cid]
        ring = assemble_ring(simp, mine)
        rows.append((cid, len(assemble_ring(full, mine)), len(ring),
                     ring_signed_area(ring)))
    return rows


def clean_cell_vertices(n: int = COV_N, segs: int = COV_SEGS):
    """Clean-coverage fixture: every cell's ring with PER-CELL jitter
    on each side (shared edges disagree → gaps/slivers). Returns
    [(cell_id, side, k, vx, vy)] — side-local vertex k of segs, node
    corners exact."""
    rows = []
    for cy in range(n):
        for cx in range(n):
            cid = cy * n + cx
            corners = [(cx, cy), (cx + 1, cy), (cx + 1, cy + 1),
                       (cx, cy + 1)]
            for side in range(4):
                ax, ay = corners[side]
                bx, by = corners[(side + 1) % 4]
                for k in range(segs):
                    t = k / segs
                    x = ax + t * (bx - ax)
                    y = ay + t * (by - ay)
                    if k > 0:
                        j = _jit_cell(cid, side, k)
                        if ay == by:     # horizontal side
                            y = y + j
                        else:
                            x = x + j
                    rows.append((cid, side, k, x, y))
    return rows


def snap(v: float, g: float = COV_SNAP) -> float:
    """The cleaner's lattice snap — floor(v/g + 0.5)*g (shared op
    order with the engine column expression)."""
    return math.floor(v / g + 0.5) * g


def clean_coverage_rows(n: int = COV_N, segs: int = COV_SEGS):
    """Twin: per cell, shoelace area of the defective ring, then of
    the snapped ring. Snapped rings of all cells tile exactly (every
    area 1.0) — the cleaned-coverage invariant."""
    by_cell = {}
    for cid, side, k, x, y in clean_cell_vertices(n, segs):
        by_cell.setdefault(cid, []).append((side, k, x, y))
    rows = []
    for cid, vs in sorted(by_cell.items()):
        vs.sort()
        ring = np.array([(x, y) for _, _, x, y in vs])
        snapped = np.array([(snap(x), snap(y)) for _, _, x, y in vs])
        keep = np.ones(len(snapped), dtype=bool)
        for i in range(1, len(snapped)):
            if (snapped[i] == snapped[i - 1]).all():
                keep[i] = False
        snapped = snapped[keep]
        rows.append((cid, ring_signed_area(ring),
                     ring_signed_area(snapped), len(snapped)))
    return rows
