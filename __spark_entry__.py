"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship pipeline on sf0.001 — geocode pages → H3/S2 +
XYZ cell index → point-in-polygon join against the 10-zone cover →
per-zone page counts with zone attributes joined back.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2, engine DataFrame vs DuckDB oracle (see gdal_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from gdal_spark.operators import spatial_join as sj
    from gdal_spark.queries import pages_df

    sf_dir = "/root/testdata/sf0.001"
    pages = pages_df(spark, sf_dir)
    hits = sj.pip_join(pages, spark)
    zattr = sj.zones_attr_df(spark)
    return (hits.groupBy("zone_fid")
            .agg(F.count("*").alias("n_pages"),
                 F.count_distinct("tld").alias("n_tlds"))
            .join(F.broadcast(zattr), "zone_fid")
            .select("zone_fid", "eas_id", "prfedea", "n_pages", "n_tlds")
            .orderBy("zone_fid"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gdal_spark.queries import REGISTRY
    return {name: fns[0] for name, fns in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from gdal_spark.queries import REGISTRY
    return {name: fns[1]() for name, fns in REGISTRY.items() if fns[1] is not None}
