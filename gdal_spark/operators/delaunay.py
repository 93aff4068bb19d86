"""Delaunay linear interpolation — gdal_grid's `linear` algorithm
(alg/gdalgrid.cpp GDALGridLinear + alg/delaunay.c GDALTriangulate*):
triangulate the scattered points, then each grid node inside a
triangle gets the barycentric combination of the three vertex values;
nodes outside the hull are nodata (dropped — the reference's default
-nodata behaviour at radius 0).

Spark shape (two stages):

1. TRIANGULATE — a bounded per-group kernel (`applyInPandas`). At the
   gated fixture scale one group holds all (deduplicated, filtered)
   points; at cluster scale the same kernel runs per spatial tile with
   a halo (each task triangulates tile+halo points; triangles whose
   circumcircle fits inside the halo'd bbox equal the global Delaunay
   — the standard halo-correctness contract, same as polygonize's
   border-repair contract). The kernel is a VECTORIZED brute-force
   empty-circumcircle test — O(n^3) candidate triangles, auditable
   against the SQL oracle term-for-term; a divide-and-conquer
   triangulator is the drop-in for larger per-tile point budgets
   (alg/delaunay.c uses qhull the same way).

2. INTERPOLATE — pure column math, fully distributed: each triangle
   explodes to the grid cells of its bbox (the scatter-to-cells idiom,
   gridding.py), barycentric weights filter containment, a window
   tie-breaks boundary nodes by (ia, ib, ic). No Python in this stage.

Float discipline: circumcenter, circumradius and barycentric formulas
are written with the SAME association order in numpy, Spark Column
expressions and the DuckDB oracle, so strict `<` / `>=` threshold
tests agree bit-for-bit (the repo-wide cross-engine rule; see
gridding.py). Duplicate coordinates (shared TLD centroids) are
deduplicated to min (pt_id, value) per (x, y) first — a Delaunay
precondition.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRI_SCHEMA = ("ia long, ib long, ic long, "
              "ax double, ay double, av double, "
              "bx double, by double, bv double, "
              "cx double, cy double, cv double")


def delaunay_triangles_np(pid: np.ndarray, x: np.ndarray, y: np.ndarray,
                          v: np.ndarray) -> pd.DataFrame:
    """All triples (i<j<k by pt_id) whose circumcircle strictly
    contains no other input point. Vectorized: circumcenters for every
    candidate triple at once, then a chunked (triangles × points)
    distance test. Formula shapes mirror the SQL oracle exactly."""
    n = len(pid)
    order = np.argsort(pid, kind="stable")
    pid, x, y, v = pid[order], x[order], y[order], v[order]
    if n < 3:
        return pd.DataFrame(columns=[c.split()[0]
                                     for c in TRI_SCHEMA.split(", ")])
    # all i<j<k triples, fully vectorized: explode each (i,j) pair of
    # np.triu_indices into its k = j+1..n-1 suffix via repeat+cumsum
    i2, j2 = np.triu_indices(n, k=1)
    counts = (n - 1 - j2).astype(np.int64)
    ii = np.repeat(i2, counts)
    jj = np.repeat(j2, counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    kk = (np.arange(counts.sum(), dtype=np.int64)
          - np.repeat(starts, counts) + np.repeat(j2 + 1, counts))
    ax, ay, av = x[ii], y[ii], v[ii]
    bx, by, bv = x[jj], y[jj], v[jj]
    cx, cy, cv = x[kk], y[kk], v[kk]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    keep = d != 0.0
    ii, jj, kk = ii[keep], jj[keep], kk[keep]
    ax, ay, av = ax[keep], ay[keep], av[keep]
    bx, by, bv = bx[keep], by[keep], bv[keep]
    cx, cy, cv = cx[keep], cy[keep], cv[keep]
    d = d[keep]
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
    empty = np.ones(len(d), dtype=bool)
    chunk = max(1, 20_000_000 // max(n, 1))
    for s in range(0, len(d), chunk):
        e = min(s + chunk, len(d))
        dx = x[None, :] - ux[s:e, None]
        dy = y[None, :] - uy[s:e, None]
        inside = (dx * dx + dy * dy) < r2[s:e, None]
        idx = np.arange(n)[None, :]
        own = ((idx == ii[s:e, None]) | (idx == jj[s:e, None])
               | (idx == kk[s:e, None]))
        empty[s:e] = ~np.any(inside & ~own, axis=1)
    m = empty
    return pd.DataFrame({
        "ia": pid[ii[m]], "ib": pid[jj[m]], "ic": pid[kk[m]],
        "ax": ax[m], "ay": ay[m], "av": av[m],
        "bx": bx[m], "by": by[m], "bv": bv[m],
        "cx": cx[m], "cy": cy[m], "cv": cv[m]})


def triangulate(points: DataFrame) -> DataFrame:
    """points(pt_id, value, x, y) → Delaunay triangle rows. Single
    group at fixture scale; `points` pre-grouped per tile+halo at
    cluster scale (pass a `tile` column and group by it instead)."""

    def _tri(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            yield delaunay_triangles_np(
                pdf["pt_id"].to_numpy(np.int64),
                pdf["x"].to_numpy(np.float64),
                pdf["y"].to_numpy(np.float64),
                pdf["value"].to_numpy(np.float64))

    return (points.repartition(1).mapInPandas(_tri, TRI_SCHEMA))


def dedupe_coords(points: DataFrame, x_col: str = "lon",
                  y_col: str = "lat") -> DataFrame:
    """Min-(pt_id, value) representative per exact coordinate pair —
    the Delaunay general-position precondition for TLD-centroid
    duplicate coords."""
    w = Window.partitionBy(x_col, y_col).orderBy("pt_id", "value")
    return (points.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("pt_id", "value", F.col(x_col).alias("x"),
                    F.col(y_col).alias("y")))


def linear_interpolate(tri: DataFrame, x0: float, y0: float, dx: float,
                       dy: float, nx: int, ny: int) -> DataFrame:
    """Distributed stage: triangle → bbox cells (superset prune; the
    barycentric test is the exact filter) → containment + interp →
    boundary tie-break by (ia, ib, ic)."""
    min_x = F.least("ax", "bx", "cx")
    max_x = F.greatest("ax", "bx", "cx")
    min_y = F.least("ay", "by", "cy")
    max_y = F.greatest("ay", "by", "cy")
    cx_lo = F.greatest(F.lit(0), F.floor((min_x - x0) / dx - 1.0).cast("int"))
    cx_hi = F.least(F.lit(nx - 1), F.ceil((max_x - x0) / dx).cast("int"))
    cy_lo = F.greatest(F.lit(0), F.floor((max_y - y0) / dy - 1.0).cast("int"))
    cy_hi = F.least(F.lit(ny - 1), F.ceil((min_y - y0) / dy).cast("int"))
    t = (tri
         .withColumn("gcx", F.explode_outer(
             F.when(cx_lo <= cx_hi, F.sequence(cx_lo, cx_hi))))
         .withColumn("gcy", F.explode_outer(
             F.when(cy_lo <= cy_hi, F.sequence(cy_lo, cy_hi))))
         .filter(F.col("gcx").isNotNull() & F.col("gcy").isNotNull()))
    gx = F.lit(x0) + (F.col("gcx") + 0.5) * F.lit(dx)
    gy = F.lit(y0) + (F.col("gcy") + 0.5) * F.lit(dy)
    det = ((F.col("by") - F.col("cy")) * (F.col("ax") - F.col("cx"))
           + (F.col("cx") - F.col("bx")) * (F.col("ay") - F.col("cy")))
    w0 = ((F.col("by") - F.col("cy")) * (gx - F.col("cx"))
          + (F.col("cx") - F.col("bx")) * (gy - F.col("cy"))) / det
    w1 = ((F.col("cy") - F.col("ay")) * (gx - F.col("cx"))
          + (F.col("ax") - F.col("cx")) * (gy - F.col("cy"))) / det
    t = (t.withColumn("w0", w0).withColumn("w1", w1)
         .withColumn("w2", F.lit(1.0) - F.col("w0") - F.col("w1"))
         .filter((F.col("w0") >= 0.0) & (F.col("w1") >= 0.0)
                 & (F.col("w2") >= 0.0)))
    win = Window.partitionBy("gcy", "gcx").orderBy("ia", "ib", "ic")
    val = (F.col("w0") * F.col("av") + F.col("w1") * F.col("bv")
           + F.col("w2") * F.col("cv"))
    return (t.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .select(F.col("gcy").alias("cy"), F.col("gcx").alias("cx"),
                    F.round(val, 6).alias("v")))
