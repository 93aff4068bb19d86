"""Convex decomposition of arbitrary simple polygons — the bridge from
WKB input to the signed-convex-piece overlay algebra.

The overlay operators (operators/algebra.py) consume polygons as
signed CONVEX pieces (outer cover +1, holes −1) so that every
polygon×polygon operation reduces to convex×convex Sutherland–Hodgman
clips with inclusion–exclusion. Round 3 could only source those pieces
from the fixture's hand decomposition; this module computes them from
ANY simple ring (the role GEOS plays for ``ogrlayer.cpp:5386-5803``,
which overlays arbitrary ``OGRGeometry`` via GEOSIntersection):

1. ``ear_clip`` — O(n²) ear clipping of a simple ring (CCW-normalized,
   collinear vertices pre-dropped) into a fan-free triangulation;
2. ``hertel_mehlhorn`` — remove inessential diagonals (Hertel &
   Mehlhorn 1983): merge the two pieces flanking a diagonal whenever
   the union stays convex, in deterministic (sorted-diagonal) order;
   guarantees ≤ 4× the optimal piece count without any search.

Both run on (n, 2) float64 numpy arrays inside executor-side kernels —
the decomposition of one polygon is one bounded unit of work, so a
10^12-feature layer decomposes embarrassingly parallel (one row per
feature through mapInPandas, no shuffle).
"""

from __future__ import annotations

import numpy as np


def _cross(o, a, b) -> float:
    return ((a[0] - o[0]) * (b[1] - o[1])
            - (a[1] - o[1]) * (b[0] - o[0]))


def clean_ring(ring: np.ndarray) -> np.ndarray:
    """Drop the duplicate closing vertex, consecutive duplicates and
    collinear middle vertices (area-neutral; ear clipping needs strict
    corners)."""
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(pts) >= 2 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    keep = [p for i, p in enumerate(pts)
            if not np.array_equal(p, pts[(i - 1) % len(pts)])]
    pts = np.asarray(keep)
    n = len(pts)
    if n < 3:
        return pts
    scale = max(float(np.abs(pts).max()), 1.0)
    eps = 1e-12 * scale * scale
    out = [i for i in range(n)
           if abs(_cross(pts[(i - 1) % n], pts[i], pts[(i + 1) % n]))
           > eps]
    return pts[out] if len(out) >= 3 else pts[:0]


def ensure_ccw(pts: np.ndarray) -> np.ndarray:
    x, y = pts[:, 0], pts[:, 1]
    area2 = float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    return pts if area2 >= 0 else pts[::-1].copy()


def ear_clip(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Triangulate a simple CCW ring by ear clipping; returns CCW index
    triples into ``pts``."""
    n = len(pts)
    if n < 3:
        return []
    scale = max(float(np.abs(pts).max()), 1.0)
    eps = 1e-12 * scale * scale
    nxt = list(range(1, n)) + [0]
    prv = [n - 1] + list(range(n - 1))
    alive = n
    tris: list[tuple[int, int, int]] = []
    i = 0
    guard = 0
    while alive > 3 and guard < 2 * n * n:
        guard += 1
        p, q, r = prv[i], i, nxt[i]
        a, b, c = pts[p], pts[q], pts[r]
        if _cross(a, b, c) <= eps:
            i = nxt[i]  # reflex or degenerate corner: not an ear
            continue
        # ear test: no OTHER alive vertex inside triangle (p, q, r);
        # boundary contact by a reflex vertex blocks the ear too —
        # the safe inclusive rule for touching-hole style inputs
        ok = True
        j = nxt[r]
        while j != p:
            v = pts[j]
            if (_cross(a, b, v) >= -eps and _cross(b, c, v) >= -eps
                    and _cross(c, a, v) >= -eps):
                ok = False
                break
            j = nxt[j]
        if not ok:
            i = nxt[i]
            continue
        tris.append((p, q, r))
        nxt[p], prv[r] = r, p
        alive -= 1
        i = p
        guard = 0
    if alive == 3:
        p, q, r = prv[i], i, nxt[i]
        if _cross(pts[p], pts[q], pts[r]) > eps:
            tris.append((p, q, r))
    return tris


def hertel_mehlhorn(pts: np.ndarray,
                    tris: list[tuple[int, int, int]]) -> list[list[int]]:
    """Merge triangles across inessential diagonals into convex pieces
    (deterministic sorted-diagonal order). Pieces are CCW index lists.
    """
    pieces: dict[int, list[int]] = {ti: list(t) for ti, t in
                                    enumerate(tris)}
    # directed edge (u, v) -> piece id
    owner: dict[tuple[int, int], int] = {}
    for ti, t in pieces.items():
        for k in range(len(t)):
            owner[(t[k], t[(k + 1) % len(t)])] = ti
    diagonals = sorted({tuple(sorted((u, v))) for (u, v) in owner
                        if (v, u) in owner})
    scale = max(float(np.abs(pts).max()), 1.0) if len(pts) else 1.0
    eps = 1e-12 * scale * scale

    for (u, v) in diagonals:
        pi = owner.get((u, v))
        qi = owner.get((v, u))
        if pi is None or qi is None or pi == qi:
            continue
        P, Q = pieces.get(pi), pieces.get(qi)
        if P is None or Q is None:
            continue
        # P holds edge u->v, so v's predecessor in P is u: rotating P
        # to start at v yields the path [v, ..., u] (all of P except
        # the diagonal edge). Symmetrically Q rotated to u is
        # [u, ..., v]. The merged CCW ring is both paths spliced with
        # the duplicate endpoints dropped.
        p_path = P[P.index(v):] + P[:P.index(v)]
        q_path = Q[Q.index(u):] + Q[:Q.index(u)]
        if p_path[-1] != u or q_path[-1] != v:
            continue  # diagonal no longer an edge of these pieces
        ring = p_path + q_path[1:-1]
        # both inputs are convex, so convexity can only break at the
        # two junction vertices u and v — test every corner at them
        m = len(ring)
        okc = True
        for k in range(m):
            if ring[k] in (u, v):
                a = pts[ring[(k - 1) % m]]
                b = pts[ring[k]]
                c = pts[ring[(k + 1) % m]]
                if _cross(a, b, c) < -eps:
                    okc = False
                    break
        if not okc:
            continue
        pieces[pi] = ring
        pieces[qi] = None
        for k in range(m):
            owner[(ring[k], ring[(k + 1) % m])] = pi
    return [p for p in pieces.values() if p is not None]


def convex_decompose(ring) -> list[np.ndarray]:
    """Simple ring (any orientation, optionally closed) → list of CCW
    convex (k, 2) arrays that partition it."""
    pts = clean_ring(np.asarray(ring, dtype=np.float64).reshape(-1, 2))
    if len(pts) < 3:
        return []
    pts = ensure_ccw(pts)
    tris = ear_clip(pts)
    return [pts[idx] for idx in hertel_mehlhorn(pts, tris)]
