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
