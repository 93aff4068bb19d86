"""kNN of a small query set against the big point table.

The reference's nearest-neighbour search is a quadtree lookup with
radius-DOUBLING expansion until a hit (alg/gdalgrid.cpp:905-976,
``dfSearchRadius *= 2`` at :976; same pattern in invdistnn's AOI search
:242-277). The distributed twin implemented here:

1. one cheap aggregation builds per-cell point counts on a degree grid
   (the reusable "cell stats" table — also feeds skew salting),
2. per query, ring radii double (1, 2, 4, …) over the *counts* until
   the disk holds ≥ k candidates — driver-side, no data motion,
3. the candidate disk is enlarged to the exact bound
   ``R = floor(d_up / cell) + 2`` with ``d_up = (r+1) * cell * sqrt(2)``
   (any true kth-neighbour must lie within d_up of the query, hence
   within disk(R)) — this makes the result EXACTLY equal to a global
   brute-force top-k, which is what the DuckDB oracle computes,
4. one broadcast join on cell id fetches candidates; a window takes the
   top-k by (squared-degree distance, point id) — the tie-break is
   documented engine behaviour since GDAL's "keep last-scanned minimum"
   (alg/gdalgrid.cpp:905-960) has no stable distributed analog.

Ranking metric: squared planar-degree distance — only * and + so
Spark, DuckDB and numpy order candidates identically bit-for-bit.
Haversine meters are emitted as a separate descriptive column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CELL_DEG = 1.0  # degree-grid cell size for candidate search


def cell_of(lat: float, lon: float) -> tuple[int, int]:
    return math.floor(lat / CELL_DEG), math.floor(lon / CELL_DEG)


def knn_join(points: DataFrame, queries: list[tuple], spark: SparkSession,
             id_col: str = "doc_id", lat_col: str = "lat", lon_col: str = "lon",
             ) -> DataFrame:
    """queries: [(query_id, qlat, qlon, k)]. Returns
    (query_id, <id_col>, rank, dist2) with rank ≤ k."""
    pts = points.filter(F.col(lat_col).isNotNull()).select(
        id_col, lat_col, lon_col,
        F.floor(F.col(lat_col) / F.lit(CELL_DEG)).cast("long").alias("_ci"),
        F.floor(F.col(lon_col) / F.lit(CELL_DEG)).cast("long").alias("_cj"),
    )
    counts = {(r["_ci"], r["_cj"]): r["n"]
              for r in pts.groupBy("_ci", "_cj").agg(F.count("*").alias("n")).collect()}

    def disk_count(ci: int, cj: int, r: int) -> int:
        return sum(
            counts.get((i, j), 0)
            for i in range(ci - r, ci + r + 1)
            for j in range(cj - r, cj + r + 1)
        )

    cand_rows = []
    for qid, qlat, qlon, k in queries:
        ci, cj = cell_of(qlat, qlon)
        r = 1
        while disk_count(ci, cj, r) < k and r < 512:
            r *= 2  # radius doubling (gdalgrid.cpp:976)
        d_up = (r + 1) * CELL_DEG * math.sqrt(2.0)
        R = int(d_up / CELL_DEG) + 2
        for i in range(ci - R, ci + R + 1):
            for j in range(cj - R, cj + R + 1):
                if (i, j) in counts:
                    cand_rows.append((qid, float(qlat), float(qlon), int(k), i, j))

    cand_df = spark.createDataFrame(
        cand_rows, "query_id int, qlat double, qlon double, k int, _ci long, _cj long")

    dlat = F.col(lat_col) - F.col("qlat")
    dlon = F.col(lon_col) - F.col("qlon")
    joined = (pts.join(F.broadcast(cand_df), ["_ci", "_cj"], "inner")
              .withColumn("dist2", dlat * dlat + dlon * dlon))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(id_col).asc())
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", id_col, "rank", "dist2"))
