"""kNN via H3 cell-ring expansion + range-join refine.

The north-star physical design: candidate search walks hex k-rings of
the query's H3 cell (geo/h3.py) with radius doubling — the distributed
twin of the reference's quadtree radius-doubling nearest search
(alg/gdalgrid.cpp:905-976, ``dfSearchRadius *= 2`` at :976) — then an
exact **range-join refine** step makes the result equal to brute-force
top-k regardless of hex-cell geometry:

1. index points with a res-``H3_RES`` cell id (one vectorized pandas
   UDF); per-cell counts collect to the driver — bounded by the cell
   count of the resolution (≤ 140·7³ ≈ 48k at res 3) at ANY data scale,
2. per query, hex rings double (k_ring 1, 2, 4, …) over the counts
   until the ring holds ≥ k candidates — driver arithmetic, no data
   motion; face-clipped rings (k_ring returns -1 across icosahedron
   faces) simply contribute fewer cells, which only widens the ring,
3. stage-1 candidates (one broadcast equi-join on cell id) yield the
   k-th smallest distance d_k per query — an upper bound on the true
   k-th distance since the candidates are a subset of all points,
4. refine: a broadcast range join fetches EVERY point in the
   [q ± d_k] lat/lon box (⊇ the d_k disk), and the final top-k over
   that superset is exactly the global brute-force answer. On a
   cell-partitioned Iceberg table the same box becomes a cell-prefix
   partition-pruning filter; here it is a plain column predicate under
   a BroadcastNestedLoopJoin (big side never shuffles).

Ranking metric: squared planar-degree distance (only * and +) so
Spark, DuckDB and numpy order candidates bit-identically; tie-break by
point id (same contract as operators/knn.py).
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark.geo import h3

H3_RES = 3  # ≤ 48 020 cells globally → driver counts stay bounded
_MAX_RING = 64


def _with_cell(points: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    @F.pandas_udf("long")
    def h3_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        ids = h3.latlon_to_cell(lat.to_numpy(), lon.to_numpy(), H3_RES)
        return pd.Series(ids.astype("int64"))

    return points.withColumn("_h3", h3_cell(F.col(lat_col), F.col(lon_col)))


def knn_h3_join(points: DataFrame, queries: list[tuple], spark: SparkSession,
                id_col: str = "doc_id", lat_col: str = "lat",
                lon_col: str = "lon") -> DataFrame:
    """queries: [(query_id, qlat, qlon, k)]. Returns
    (query_id, <id_col>, rank, dist2), rank ≤ k — exactly equal to the
    global brute-force top-k under (dist2, id) ordering."""
    import numpy as np

    pts = _with_cell(
        points.filter(F.col(lat_col).isNotNull()), lat_col, lon_col
    ).select(id_col, lat_col, lon_col, "_h3").persist()

    counts = {r["_h3"]: r["n"]
              for r in pts.groupBy("_h3").agg(F.count("*").alias("n")).collect()}

    # ring expansion on the driver-side counts (no data motion)
    cand_rows = []
    for qid, qlat, qlon, k in queries:
        qcell = int(h3.latlon_to_cell([qlat], [qlon], H3_RES)[0])
        r = 1
        ring_cells: list[int] = [qcell]
        while r <= _MAX_RING:
            ring = h3.k_ring(np.array([qcell], dtype=np.int64), r)[0]
            ring_cells = [int(c) for c in ring if c >= 0]
            if sum(counts.get(c, 0) for c in ring_cells) >= k:
                break
            r *= 2  # radius doubling (gdalgrid.cpp:976)
        else:
            ring_cells = list(counts)  # degenerate: sparse table → all
        for c in ring_cells:
            if c in counts:
                cand_rows.append((qid, float(qlat), float(qlon), int(k), c))

    cand_df = spark.createDataFrame(
        cand_rows, "query_id int, qlat double, qlon double, k int, _h3 long")

    dlat = F.col(lat_col) - F.col("qlat")
    dlon = F.col(lon_col) - F.col("qlon")
    stage1 = (pts.join(F.broadcast(cand_df), ["_h3"], "inner")
              .withColumn("dist2", dlat * dlat + dlon * dlon))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col(id_col).asc())
    # k-th candidate distance per query = refine radius bound
    bounds = (stage1.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= F.col("k"))
              .groupBy("query_id", "qlat", "qlon", "k")
              .agg(F.max("dist2").alias("d2k"))
              .withColumn("dk", F.sqrt(F.col("d2k"))))

    # range-join refine: every point in the [q ± d_k] box (broadcast
    # nested-loop with a pure column predicate; the big side is only
    # scanned, never shuffled)
    b = bounds.alias("q")
    refined = (pts.alias("p").join(
        F.broadcast(b),
        (F.col(f"p.{lat_col}") >= F.col("q.qlat") - F.col("q.dk"))
        & (F.col(f"p.{lat_col}") <= F.col("q.qlat") + F.col("q.dk"))
        & (F.col(f"p.{lon_col}") >= F.col("q.qlon") - F.col("q.dk"))
        & (F.col(f"p.{lon_col}") <= F.col("q.qlon") + F.col("q.dk")),
        "inner")
        .withColumn("dist2", dlat * dlat + dlon * dlon)
        .filter(F.col("dist2") <= F.col("d2k")))
    out = (refined.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= F.col("k"))
           .select("query_id", id_col, F.col("rank").cast("int").alias("rank"),
                   "dist2"))
    return out
