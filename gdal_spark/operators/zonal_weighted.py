"""Weighted zonal statistics — alg/zonal.cpp:640-830 semantics backed
by the exactextract-style accumulator alg/raster_stats.h:116-270:

  ci  = coverage fraction of pixel i inside the zone polygon (EXACT
        partial-pixel area, not center-in-polygon),
  wi  = secondary weight-raster value, xi = value-raster value;
  count = Σci            sum  = Σxi·ci          mean  = sum/count
  weighted_count = Σci·wi weighted_sum = Σxi·ci·wi
  weighted_mean = ws/wc   weighted_frac = ws/sum
  variance/stdev: population, coverage-weighted (and the ci·wi twin);
  min/max (+ their pixel-center locations): strict <,> updates in
  raster scan order — FIRST extreme in row-major order wins ties
  (raster_stats.h:233-250). Only pixels with ci above FLT_MIN count
  (RasterStatsOptions.min_coverage_fraction default ≈ 1e-38 ⇒ ci > 0).

Coverage kernel: Sutherland-Hodgman clip of each ring to the pixel box
+ sequential shoelace (geo/geom.clip_convex — S-H bridge edges along
the clip window cancel in the signed area, so non-convex rings clip
exactly), holes subtracted. Fixed op order end-to-end, so the oracle's
injected VALUES (the same function run driver-side) are bit-identical
to the executor UDF's output.

Spark shape: one mapInPandas task per zone emits the coverage rows
(the rasterize-zones idiom — at 10^12 px the same kernel runs per
zone×tile window); value/weight join + ordered-fold aggregation
(F.aggregate over sort_array ≡ DuckDB list_reduce over list(ORDER BY))
are pure column math. The reference's West incremental variance
(raster_stats.h WestVariance) is replaced by the moment form — equal
in exact arithmetic, and both engines run the identical moment text.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coverage_rows(outer_rings, hole_rings, gt, w: int, h: int
                  ) -> list[tuple]:
    """Exact per-pixel coverage of a polygon (outer − holes) over a
    north-up grid → [(pid, ci, cx, cy)] for ci > 0, row-major order.
    cx/cy are the pixel-CENTER georeferenced coords (zonal.cpp padfX/Y)."""
    from gdal_spark.geo.geom import clip_convex, ring_signed_area

    xs = np.concatenate([np.asarray(r, dtype=np.float64)[:, 0]
                         for r in outer_rings])
    ys = np.concatenate([np.asarray(r, dtype=np.float64)[:, 1]
                         for r in outer_rings])
    px_lo = max(0, int(np.floor((xs.min() - gt[0]) / gt[1])))
    px_hi = min(w - 1, int(np.floor((xs.max() - gt[0]) / gt[1])))
    py_lo = max(0, int(np.floor((ys.max() - gt[3]) / gt[5])))
    py_hi = min(h - 1, int(np.floor((ys.min() - gt[3]) / gt[5])))
    pix_area = gt[1] * (-gt[5])
    out = []
    for py in range(py_lo, py_hi + 1):
        y_top = gt[3] + py * gt[5]
        y_bot = gt[3] + (py + 1) * gt[5]
        for px in range(px_lo, px_hi + 1):
            x_lo = gt[0] + px * gt[1]
            x_hi = gt[0] + (px + 1) * gt[1]
            box = [(x_lo, y_bot), (x_hi, y_bot), (x_hi, y_top), (x_lo, y_top)]
            a = 0.0
            for r in outer_rings:
                piece = clip_convex(r, box)
                if len(piece) >= 3:
                    a += abs(ring_signed_area(piece))
            for r in hole_rings:
                piece = clip_convex(r, box)
                if len(piece) >= 3:
                    a -= abs(ring_signed_area(piece))
            ci = a / pix_area
            if ci > 0.0:
                out.append((py * w + px, ci,
                            gt[0] + (px + 0.5) * gt[1],
                            gt[3] + (py + 0.5) * gt[5]))
    return out


def weighted_stats(rows: DataFrame) -> DataFrame:
    """rows(zone_fid, pid, ci, cx, cy, xi, wi) → one stats row per
    zone, every float fold in pid order (bit-exact vs the SQL twin)."""
    it = F.sort_array(F.collect_list(
        F.struct("pid", "ci", "cx", "cy", "xi", "wi")))
    g = rows.groupBy("zone_fid").agg(it.alias("it"))

    def s(expr):
        return F.aggregate(F.col("it"), F.lit(0.0), expr)

    sum_ci = s(lambda a, r: a + r["ci"])
    sum_xici = s(lambda a, r: a + r["xi"] * r["ci"])
    sum_ciwi = s(lambda a, r: a + r["ci"] * r["wi"])
    sum_xiciwi = s(lambda a, r: a + r["xi"] * (r["ci"] * r["wi"]))
    sum_x2ci = s(lambda a, r: a + (r["xi"] * r["xi"]) * r["ci"])
    sum_x2ciwi = s(lambda a, r: a + (r["xi"] * r["xi"]) * (r["ci"] * r["wi"]))
    mn = F.array_min(F.transform(
        F.col("it"), lambda r: F.struct(r["xi"].alias("v"),
                                        r["pid"].alias("pid"),
                                        r["cx"].alias("cx"),
                                        r["cy"].alias("cy"))))
    mx = F.array_min(F.transform(
        F.col("it"), lambda r: F.struct((-r["xi"]).alias("v"),
                                        r["pid"].alias("pid"),
                                        r["cx"].alias("cx"),
                                        r["cy"].alias("cy"))))
    g = (g.withColumn("cnt", sum_ci)
         .withColumn("zsum", sum_xici)
         .withColumn("wcnt", sum_ciwi)
         .withColumn("wsum", sum_xiciwi)
         .withColumn("x2", sum_x2ci)
         .withColumn("wx2", sum_x2ciwi)
         .withColumn("_mn", mn).withColumn("_mx", mx))
    mean = F.col("zsum") / F.col("cnt")
    wmean = F.col("wsum") / F.col("wcnt")
    var = F.greatest(F.col("x2") / F.col("cnt") - mean * mean, F.lit(0.0))
    wvar = F.greatest(F.col("wx2") / F.col("wcnt") - wmean * wmean,
                      F.lit(0.0))
    return g.select(
        "zone_fid", "cnt", "zsum", mean.alias("mean"),
        "wcnt", "wsum", wmean.alias("wmean"),
        (F.col("wsum") / F.col("zsum")).alias("wfrac"),
        var.alias("variance"), F.sqrt(var).alias("stdev"),
        wvar.alias("wvariance"), F.sqrt(wvar).alias("wstdev"),
        F.col("_mn.v").alias("vmin"),
        F.col("_mn.cx").alias("min_cx"), F.col("_mn.cy").alias("min_cy"),
        (-F.col("_mx.v")).alias("vmax"),
        F.col("_mx.cx").alias("max_cx"), F.col("_mx.cy").alias("max_cy"))
