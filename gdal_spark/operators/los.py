"""Line of sight — batch LOS visibility checks over a DEM.

Reference: alg/los.cpp GDALIsLineOfSightVisible (GDAL >= 3.9): two
endpoint pre-checks (z >= terrain; A reported first, then B —
los.cpp:211-222), then a Bresenham walk from A to B testing at every
cell the linearly-interpolated sight-line height against the terrain
(z_interp >= terrain, "a point exactly at the height of the DEM is
treated as visible"). The interpolation ratio is the planar distance
fraction sqrt(((x-xA)^2+(y-yA)^2)/((xB-xA)^2+(yB-yA)^2)) for diagonal
lines (los.cpp:340-353) and the direct single-axis fraction for pure
vertical/horizontal lines (los.cpp:236-258). The first failing cell is
reported as the terrain intersection.

The reference checks ONE pair per call with a serial early-exit walk.
The distributed re-expression checks a whole TABLE of pairs at once:

1. the Bresenham walk has a closed form — for dx >= dy the step-i cell
   is (xA + i*incx, yA + incy*floor((2*i*dy + dx)/(2*dx))), verified
   EXHAUSTIVELY equal to the reference loop over all 13^4 line
   configurations in tests/test_los.py — so the walk becomes one
   sequence-explode + pure column math (no per-pair Python, no serial
   scan);
2. cells equi-join the DEM table on (py, px) — at 10^12 pixels this is
   a plain shuffle join on pixel key, and the per-pair row count is
   O(line length), never O(raster);
3. visible/intersection fold per pair: endpoint flags from two direct
   DEM lookups + min-by-step-index over failing walk cells (the
   reference's early-exit = first failure in walk order).

Early-exit note: the reference stops reading at the first failure; the
distributed form evaluates the full line and takes min(i) — same
result, and at 10^12 scale the join is cheaper than a dependent
sequential probe chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _walk_cells(p: DataFrame) -> DataFrame:
    """Explode each pair into its Bresenham cells (pair_id, i, x, y)
    plus the pair columns — closed-form midpoint rule, int math."""
    i = F.col("i")
    dx, dy = F.col("dx"), F.col("dy")
    shallow_y = F.when(
        dx > 0,
        F.col("incy") * F.floor((2 * i * dy + dx) / (2 * dx)).cast("int")
    ).otherwise(F.lit(0))
    steep_x = (F.col("incx")
               * F.floor((2 * i * dx + dy) / (2 * dy)).cast("int"))
    return (p.select("*", F.explode(F.sequence(F.lit(0), F.col("n")))
                     .alias("i"))
            .withColumn("x", F.when(dx >= dy, F.col("xa")
                                    + i * F.col("incx"))
                        .otherwise(F.col("xa") + steep_x))
            .withColumn("y", F.when(dx >= dy, F.col("ya") + shallow_y)
                        .otherwise(F.col("ya") + i * F.col("incy"))))


def line_of_sight(pairs: DataFrame, dem: DataFrame,
                  curv_coeff: float = 1.0,
                  earth_diam: float = 0.0) -> DataFrame:
    """pairs(pair_id, xa, ya, za, xb, yb, zb) x dem(py, px, elev) ->
    (pair_id, visible, ix, iy): visibility and the first terrain
    intersection cell (-1, -1 when visible), reference report order
    (A pre-check, then B, then first failing walk cell).

    ``curv_coeff`` < 1 enables gdal_viewshed's earth-curvature (and
    atmospheric-refraction) correction (alg/viewshed.cpp
    CalcHeightAdjFactor: default -cc 0.85714 ≈ 1 - 1/7): terrain at
    squared distance d² from the OBSERVER drops by
    d² * (1 - cc) / earth_diam before the sightline test. cc = 1.0
    (or earth_diam = 0) disables the term exactly."""
    p = pairs.select(
        "*",
        F.abs(F.col("xb") - F.col("xa")).alias("dx"),
        F.abs(F.col("yb") - F.col("ya")).alias("dy"),
        F.when(F.col("xb") >= F.col("xa"), 1).otherwise(-1).alias("incx"),
        F.when(F.col("yb") >= F.col("ya"), 1).otherwise(-1).alias("incy"),
        F.greatest(F.abs(F.col("xb") - F.col("xa")),
                   F.abs(F.col("yb") - F.col("ya"))).alias("n"))

    cells = _walk_cells(p)
    fx = (F.col("x") - F.col("xa")).cast("double")
    fy = (F.col("y") - F.col("ya")).cast("double")
    gx = (F.col("xb") - F.col("xa")).cast("double")
    gy = (F.col("yb") - F.col("ya")).cast("double")
    ratio = (F.when((F.col("xa") == F.col("xb"))
                    & (F.col("ya") == F.col("yb")), F.lit(0.0))
             .when(F.col("xa") == F.col("xb"), fy / gy)
             .when(F.col("ya") == F.col("yb"), fx / gx)
             .otherwise(F.sqrt((fx * fx + fy * fy) / (gx * gx + gy * gy))))
    z = F.col("za") + ratio * (F.col("zb") - F.col("za"))
    adj_k = ((1.0 - curv_coeff) / earth_diam) if (
        curv_coeff < 1.0 and earth_diam > 0) else 0.0
    d2 = fx * fx + fy * fy
    walked = (cells.join(dem.select(F.col("px").alias("x"),
                                    F.col("py").alias("y"), "elev"),
                         ["x", "y"])
              .withColumn("_z", z)
              .withColumn("_e", F.col("elev") - F.lit(adj_k) * d2)
              .filter(F.col("_z") < F.col("_e")))
    first_fail = (walked.groupBy("pair_id")
                  .agg(F.min_by(F.struct(F.col("x").alias("fx"),
                                         F.col("y").alias("fy")),
                                F.col("i")).alias("f")))

    da = dem.select(F.col("px").alias("xa"), F.col("py").alias("ya"),
                    F.col("elev").alias("ta"))
    db = dem.select(F.col("px").alias("xb"), F.col("py").alias("yb"),
                    F.col("elev").alias("tb"))
    gd2 = ((F.col("xb") - F.col("xa")).cast("double")
           * (F.col("xb") - F.col("xa")).cast("double")
           + (F.col("yb") - F.col("ya")).cast("double")
           * (F.col("yb") - F.col("ya")).cast("double"))
    ends = (p.join(da, ["xa", "ya"]).join(db, ["xb", "yb"])
            .select("pair_id", "xa", "ya", "xb", "yb",
                    (F.col("za") < F.col("ta")).alias("a_fail"),
                    (F.col("zb") < F.col("tb") - F.lit(adj_k) * gd2)
                    .alias("b_fail")))

    out = ends.join(first_fail, "pair_id", "left")
    wf = F.col("f").isNotNull()
    return out.select(
        "pair_id",
        (~(F.col("a_fail") | F.col("b_fail") | wf)).alias("visible"),
        F.when(F.col("a_fail"), F.col("xa"))
         .when(F.col("b_fail"), F.col("xb"))
         .when(wf, F.col("f.fx")).otherwise(F.lit(-1))
         .cast("int").alias("ix"),
        F.when(F.col("a_fail"), F.col("ya"))
         .when(F.col("b_fail"), F.col("yb"))
         .when(wf, F.col("f.fy")).otherwise(F.lit(-1))
         .cast("int").alias("iy"))
