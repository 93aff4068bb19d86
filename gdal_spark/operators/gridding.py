"""Gridding — scatter points onto a regular grid with a search radius,
the distributed re-expression of gdal_grid (alg/gdalgrid.cpp, 4,308
LoC: invdist :242-277 AOI search, moving average :630-720, nearest
quadtree search :905-976, data metrics gdalgrid.h:68-84).

Shape: the reference iterates GRID CELLS and searches points via a
quadtree. Inverted for Spark: each POINT computes the (small, bounded)
range of cells whose center lies within `radius` of it — pure column
math + one explode of a sequence — then one shuffle groups candidate
(cell, point) rows by cell. No broadcast of the big side, no quadtree:
the cell-range arithmetic IS the spatial index. Skewed cells (hotspot
discs) stay cheap for count/min/max (map-side combine); the invdist
fold materializes per-cell candidate lists and is the documented
hotspot cost of exact-order summation.

Float discipline (cross-engine exactness):
- distances: sqrt/d² of lattice-exact doubles — identical bit patterns
  in Spark, DuckDB and numpy;
- MIN/MAX/COUNT: order-free — safe;
- inverse-distance weighted sums: floating sums are order-DEPENDENT,
  so the fold runs over candidates sorted by pt_id: collect → sort →
  sequential fold (F.aggregate ≡ DuckDB list_reduce over
  list(... ORDER BY pt_id)). Smoothing δ=1e-9 on d² sidesteps the
  exact-hit pole (GDAL's invdist smoothing parameter plays this role).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SMOOTH = 1e-9


def scatter_to_cells(points: DataFrame, x0: float, y0: float, dx: float,
                     dy: float, nx: int, ny: int, radius: float,
                     lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Candidate (cy, cx, …point cols, d2, d) rows: every grid cell
    whose CENTER is within `radius` of the point. Cell centers:
    (x0 + (cx+0.5)·dx, y0 + (cy+0.5)·dy), dy negative north-up."""
    p = points.filter(F.col(lat_col).isNotNull())
    # candidate index ranges from the point's radius bbox (column math)
    cx_lo = F.greatest(F.lit(0), F.floor((F.col(lon_col) - radius - x0) / dx - 0.5).cast("int"))
    cx_hi = F.least(F.lit(nx - 1), F.ceil((F.col(lon_col) + radius - x0) / dx).cast("int"))
    cy_lo = F.greatest(F.lit(0), F.floor((F.col(lat_col) + radius - y0) / dy - 0.5).cast("int"))
    cy_hi = F.least(F.lit(ny - 1), F.ceil((F.col(lat_col) - radius - y0) / dy).cast("int"))
    p = (p.withColumn("cx", F.explode_outer(
            F.when(cx_lo <= cx_hi, F.sequence(cx_lo, cx_hi))))
         .withColumn("cy", F.explode_outer(
            F.when(cy_lo <= cy_hi, F.sequence(cy_lo, cy_hi))))
         .filter(F.col("cx").isNotNull() & F.col("cy").isNotNull()))
    ctr_x = F.lit(x0) + (F.col("cx") + 0.5) * F.lit(dx)
    ctr_y = F.lit(y0) + (F.col("cy") + 0.5) * F.lit(dy)
    ddx = F.col(lon_col) - ctr_x
    ddy = F.col(lat_col) - ctr_y
    d2 = ddx * ddx + ddy * ddy
    return (p.withColumn("d2", d2).withColumn("d", F.sqrt(F.col("d2")))
            .filter(F.col("d") <= radius))


def grid_metrics(cand: DataFrame) -> DataFrame:
    """Data metrics (gdalgrid.h:68-84): count / minimum_distance /
    maximum_distance per cell."""
    return cand.groupBy("cy", "cx").agg(
        F.count("*").alias("n"),
        F.round(F.min("d"), 6).alias("min_d"),
        F.round(F.max("d"), 6).alias("max_d"))


def grid_nearest(cand: DataFrame, id_col: str = "pt_id",
                 value_col: str = "value") -> DataFrame:
    """Nearest (alg/gdalgrid.cpp:905-976 semantics at fixed radius):
    value of the closest candidate, ties by (point id, value) — the
    value term matters because the synthetic point table contains
    duplicate pt_ids (colliding l_orderkey*8+l_linenumber keys) whose
    hash-derived coords tie exactly but whose values differ."""
    w = Window.partitionBy("cy", "cx").orderBy(
        F.col("d2").asc(), F.col(id_col).asc(), F.col(value_col).asc())
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("cy", "cx", F.col(id_col).alias("pt_id"),
                    F.col(value_col).alias("v"),
                    F.round(F.col("d2"), 6).alias("d2")))


def grid_average(cand: DataFrame, id_col: str = "pt_id",
                 value_col: str = "value") -> DataFrame:
    """Moving average (alg/gdalgrid.cpp:630-720 GDALGridMovingAverage,
    circular window): mean of candidate values in the radius, summed in
    (pt_id, value) order for cross-engine bit-exactness."""
    items = F.array_sort(F.collect_list(F.struct(
        F.col(id_col).alias("pid"), F.col(value_col).alias("v"))))
    folded = cand.groupBy("cy", "cx").agg(items.alias("it"))
    sv = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["v"])
    return folded.select(
        "cy", "cx", F.size("it").alias("n"),
        F.round(sv / F.size("it").cast("double"), 6).alias("v"))


def grid_invdistnn(cand: DataFrame, max_points: int = 8,
                   id_col: str = "pt_id", value_col: str = "value") -> DataFrame:
    """invdistnn (GDALGridInverseDistanceToAPowerNearestNeighbor,
    alg/gdalgrid.cpp): inverse-distance weighting restricted to the
    `max_points` nearest candidates — a per-cell ranked top-N (ties by
    (pt_id, value)) feeding the same ordered invdist fold."""
    w_rank = Window.partitionBy("cy", "cx").orderBy(
        F.col("d2").asc(), F.col(id_col).asc(), F.col(value_col).asc())
    top = (cand.withColumn("_rn", F.row_number().over(w_rank))
           .filter(F.col("_rn") <= max_points).drop("_rn"))
    return grid_invdist(top, id_col, value_col)


def grid_invdist_quadrant(cand: DataFrame, power: float = 2.0,
                          smoothing: float = 0.0, max_points: int = 0,
                          min_points: int = 0,
                          min_points_per_quadrant: int = 0,
                          max_points_per_quadrant: int = 0,
                          nodata: float = 0.0,
                          id_col: str = "pt_id",
                          value_col: str = "value") -> DataFrame:
    """GDALGridInverseDistanceToAPowerNearestNeighborPerQuadrant
    (alg/gdalgrid.cpp:351-480) — the per-quadrant constrained IDW both
    invdist and invdistnn dispatch to when min/max_points_per_quadrant
    is set. Exact reference semantics, pinned against the
    test_gdal_grid_lib quadrant goldens in
    tests/test_autotest_parity.py:

    - quadrant = (dx >= 0) | ((dy >= 0) << 1) (:406-407);
    - candidates ranked per quadrant by smoothed distance d2 + s^2;
      selection walks quadrants round-robin taking each quadrant's
      next-nearest (:424-460) — equivalent to ordering by (rank,
      quadrant) — capped at max_points_per_quadrant per quadrant and
      max_points overall;
    - a candidate with smoothed d2 < 1e-13 short-circuits to its value
      (:397-402);
    - if any quadrant has fewer than min_points_per_quadrant selected,
      or fewer than min_points total, the cell takes nodata (:464-474);
    - weight = 1 / (d2 + s^2)^(power/2), accumulated in selection
      order (:452-455).

    cand: (cy, cx, dx, dy, d2, id_col, value_col) already filtered to
    the search radius. Two windows + one ordered fold — no shuffle
    beyond the per-cell grouping."""
    s2 = float(smoothing) * float(smoothing)
    quad = ((F.col("dx") >= 0).cast("int")
            + (F.col("dy") >= 0).cast("int") * 2)
    c = cand.withColumn("_q", quad).withColumn(
        "_d2s", F.col("d2") + F.lit(s2))
    wq = Window.partitionBy("cy", "cx", "_q").orderBy(
        F.col("_d2s").asc(), F.col(id_col).asc(), F.col(value_col).asc())
    ranked = c.withColumn("_r", F.row_number().over(wq))
    if max_points_per_quadrant > 0:
        ranked = ranked.filter(F.col("_r") <= max_points_per_quadrant)
    wsel = Window.partitionBy("cy", "cx").orderBy(
        F.col("_r").asc(), F.col("_q").asc())
    sel = ranked.withColumn("_pos", F.row_number().over(wsel))
    if max_points > 0:
        sel = sel.filter(F.col("_pos") <= max_points)
    inv_w = F.lit(1.0) / F.pow(F.col("_d2s"), F.lit(power / 2.0))
    items = F.array_sort(F.collect_list(F.struct(
        F.col("_pos").alias("pos"), inv_w.alias("w"),
        (inv_w * F.col(value_col)).alias("wv"))))
    per_cell = sel.groupBy("cy", "cx").agg(
        items.alias("it"),
        F.count("*").alias("_n"),
        *[F.sum(F.when(F.col("_q") == q, 1).otherwise(0)).alias(f"_nq{q}")
          for q in range(4)])
    # the exact-hit short-circuit fires during the SCAN, before any
    # quadrant/max caps (:397-402); the reference returns the FIRST
    # scanned such point — points are scanned in array (id) order, so
    # min_by(value, id) over the sub-threshold candidates reproduces
    # it deterministically even with coincident points of different
    # values (round-3 ADVICE item)
    exact = (c.groupBy("cy", "cx")
             .agg(F.min_by(F.when(F.col("_d2s") < 1e-13,
                                  F.col(value_col)),
                           F.when(F.col("_d2s") < 1e-13,
                                  F.col(id_col))).alias("_exact")))
    per_cell = per_cell.join(exact, ["cy", "cx"])
    num = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["wv"])
    den = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["w"])
    ok = F.lit(True)
    if min_points_per_quadrant > 0:
        for q in range(4):
            ok = ok & (F.col(f"_nq{q}") >= min_points_per_quadrant)
    if min_points > 0:
        ok = ok & (F.col("_n") >= min_points)
    v = (F.when(F.col("_exact").isNotNull(), F.col("_exact"))
         .when(ok & (den != 0.0), num / den)
         .otherwise(F.lit(float(nodata))))
    return per_cell.select("cy", "cx", F.col("_n").cast("int").alias("n"),
                           v.alias("v"))


def grid_invdist(cand: DataFrame, id_col: str = "pt_id",
                 value_col: str = "value") -> DataFrame:
    """Inverse-distance-squared weighting with smoothing, folded in
    pt_id order for cross-engine bit-exactness."""
    w = 1.0 / (F.col("d2") + F.lit(SMOOTH))
    items = F.array_sort(F.collect_list(F.struct(
        F.col(id_col).alias("pid"),
        w.alias("w"),
        (w * F.col(value_col)).alias("wv"))))
    folded = cand.groupBy("cy", "cx").agg(items.alias("it"))
    sw = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["w"])
    swv = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["wv"])
    return folded.select(
        "cy", "cx", F.size("it").alias("n"),
        F.round(swv / sw, 6).alias("v"))


def grid_metrics_avg(cand: DataFrame, cand_pts: DataFrame,
                     id_col: str = "pt_id") -> DataFrame:
    """Data metrics part 2 (alg/gdalgrid.cpp:2088-2310):
    range = max - min distance; average_distance = mean distance to
    the cell center (GDALGridDataMetricAverageDistance :2125-2232);
    average_distance_pts = mean pairwise distance between in-radius
    points, INCLUDING self-pairs, per the reference's quadtree path
    (GDALGridDataMetricAverageDistancePts — inner loop `for j = k`, so
    n = C(m,2) + m; the set of j>=k pairs is visit-order-free).
    ``cand_pts`` may use a smaller radius: the O(k^2) pair join is the
    genuine reference cost — at scale the hot-cell pair set IS the
    work, so the radius bounds k (documented; the reference pays the
    same quadratic serially). All float folds ordered by point id for
    cross-engine bit-exactness."""
    items = F.array_sort(F.collect_list(F.struct(
        F.col(id_col).alias("pid"), F.col("d").alias("dd"))))
    base = cand.groupBy("cy", "cx").agg(
        items.alias("it"),
        F.round(F.max("d") - F.min("d"), 6).alias("range_d"))
    sd = F.aggregate(F.col("it"), F.lit(0.0), lambda a, x: a + x["dd"])
    base = base.select(
        "cy", "cx", F.size("it").alias("n"), "range_d",
        F.round(sd / F.size("it").cast("double"), 6).alias("avg_d"))

    a = cand_pts.select("cy", "cx", F.col(id_col).alias("pa"),
                        F.col("lon").alias("xa"), F.col("lat").alias("ya"))
    b = cand_pts.select("cy", "cx", F.col(id_col).alias("pb"),
                        F.col("lon").alias("xb"), F.col("lat").alias("yb"))
    pd_ = (a.join(b, ["cy", "cx"]).filter(F.col("pa") <= F.col("pb"))
           .select("cy", "cx", "pa", "pb",
                   F.sqrt((F.col("xb") - F.col("xa"))
                          * (F.col("xb") - F.col("xa"))
                          + (F.col("yb") - F.col("ya"))
                          * (F.col("yb") - F.col("ya"))).alias("pdist")))
    pit = F.array_sort(F.collect_list(F.struct(
        F.col("pa"), F.col("pb"), F.col("pdist").alias("dd"))))
    pairs = pd_.groupBy("cy", "cx").agg(pit.alias("it"))
    sp = F.aggregate(F.col("it"), F.lit(0.0), lambda acc, x: acc + x["dd"])
    pairs = pairs.select(
        "cy", "cx", F.size("it").alias("n_pairs"),
        F.round(sp / F.size("it").cast("double"), 6).alias("avg_d_pts"))
    return base.join(pairs, ["cy", "cx"], "left")
