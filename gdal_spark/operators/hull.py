"""Distributed convex hull per key — ConvexHull as an ASSOCIATIVE
aggregation (OGRGeometry::ConvexHull, ogr/ogr_geometry.h:583;
apps/gdalalg_vector_convex_hull.cpp is per-feature, this is the
per-group layer version a dissolve+hull pipeline needs).

Scale shape: hull(A ∪ B) = hull(hull(A) ∪ hull(B)), so phase 1 computes
a partial hull per task partition inside mapInPandas (bounding the
shuffle to O(hull size) candidate vertices per partition per key —
for n random points the expected hull is O(log n)), and phase 2 merges
candidates per key with one applyInPandas. The kernel is the strict-turn
monotone chain (geo/geom.convex_hull) over deduplicated coords.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.geo.geom import convex_hull


def hull_per_key(df: DataFrame, key_col: str = "tld", x_col: str = "lon",
                 y_col: str = "lat", min_distinct: int = 2) -> DataFrame:
    """(key, vx, vy) hull vertex rows per key. Keys with fewer than
    ``min_distinct`` distinct coordinates are dropped (a 1-point hull
    has no edge — mirrored in the SQL hull-edge oracle)."""
    src = df.select(F.col(key_col).alias("k"),
                    F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def _partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for k, g in pdf.groupby("k"):
                h = convex_hull(g["x"].to_numpy(), g["y"].to_numpy())
                out.append(pd.DataFrame(
                    {"k": k, "x": h[:, 0], "y": h[:, 1]}))
            yield pd.concat(out, ignore_index=True)

    part = src.mapInPandas(_partial, "k string, x double, y double")

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        h = convex_hull(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        return pd.DataFrame(
            {"k": pdf["k"].iloc[0], "vx": h[:, 0], "vy": h[:, 1]})

    hull = part.groupBy("k").applyInPandas(
        _final, "k string, vx double, vy double")
    big = (src.distinct().groupBy("k").agg(F.count("*").alias("_n"))
           .filter(F.col("_n") >= min_distinct).select("k"))
    return (hull.join(F.broadcast(big), "k")
            .select(F.col("k").alias(key_col), "vx", "vy"))


def chi_concave_hull(tri_rows: list, length_thr: float) -> tuple:
    """Concave hull via the published χ-shape algorithm (Duckham,
    Kulik, Worboys, Galton 2008; the reference exposes GEOS
    ConcaveHull, ogr/ogr_geometry.h:565): starting from the Delaunay
    triangulation's boundary, repeatedly remove the longest exterior
    edge that is (a) longer than ``length_thr`` and (b) REGULAR —
    its exposed opposite vertex is not already a boundary vertex (this
    preserves simple connectivity). Deterministic: ties on length break
    by the sorted vertex-id pair.

    tri_rows: [(ia, ib, ic, ax, ay, bx, by, cx, cy)] Delaunay triangle
    rows. Returns (n_boundary_edges, hull_area, hull_perimeter) of the
    resulting χ-shape.

    Driver-side kernel (triangle counts are hull-boundary-sized); at
    scale the same erosion runs on the tile+halo triangulation's
    boundary only."""
    import math

    coords: dict[int, tuple] = {}
    tris: set[tuple] = set()
    for ia, ib, ic, ax, ay, bx, by, cx, cy in tri_rows:
        coords[int(ia)] = (float(ax), float(ay))
        coords[int(ib)] = (float(bx), float(by))
        coords[int(ic)] = (float(cx), float(cy))
        tris.add((int(ia), int(ib), int(ic)))
    if not tris:
        return 0, 0.0, 0.0

    def edges_of(t):
        return [tuple(sorted((t[0], t[1]))), tuple(sorted((t[1], t[2]))),
                tuple(sorted((t[0], t[2])))]

    def elen(e):
        (x1, y1), (x2, y2) = coords[e[0]], coords[e[1]]
        return math.hypot(x2 - x1, y2 - y1)

    edge_tris: dict[tuple, set] = {}
    for t in tris:
        for e in edges_of(t):
            edge_tris.setdefault(e, set()).add(t)

    def boundary_edges():
        return {e for e, ts in edge_tris.items() if len(ts) == 1}

    bnd = boundary_edges()
    bnd_verts = {v for e in bnd for v in e}
    changed = True
    while changed:
        changed = False
        # longest removable boundary edge first; ties by vertex pair
        for e in sorted(bnd, key=lambda e: (-elen(e), e)):
            if elen(e) <= length_thr:
                break
            (t,) = edge_tris[e]
            opp = next(v for v in t if v not in e)
            if opp in bnd_verts:
                continue  # irregular: would pinch the boundary
            # the triangle's other two edges: must be interior now
            others = [oe for oe in edges_of(t) if oe != e]
            if any(len(edge_tris[oe]) == 1 for oe in others):
                continue  # ear triangle: removal would disconnect
            tris.discard(t)
            for oe in edges_of(t):
                edge_tris[oe].discard(t)
                if not edge_tris[oe]:
                    del edge_tris[oe]
            bnd = boundary_edges()
            bnd_verts = {v for e2 in bnd for v in e2}
            changed = True
            break
    area = 0.0
    for t in sorted(tris):
        (ax, ay), (bx, by), (cx, cy) = (coords[t[0]], coords[t[1]],
                                        coords[t[2]])
        area += abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) / 2.0
    peri = sum(elen(e) for e in sorted(bnd))
    return len(bnd), area, peri
