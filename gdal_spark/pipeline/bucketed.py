"""Bucketed-table sink + shuffle-free co-located join.

The 100-TB join story: a fact table re-joined on the same key across
many jobs should be written BUCKETED on that key (hash-partitioned
files + bucket metadata), so every later equi-join on the key is a
zipped per-bucket merge with NO exchange on either side — the shuffle
is paid once at write time, then amortized over every downstream join.
This is Spark's native equivalent of the reference's tile/shard
pre-organization (gdaltindex-style physical layout; the reference has
no distributed join to co-locate — this is Spark-side design, SURVEY
§7.3 "bucketing for co-located joins").

Mechanics: ``write_bucketed`` writes a parquet table with
``bucketBy(n, key).sortBy(key)`` registered in the session catalog
(external path, so the data outlives the catalog); joining two tables
bucketed by the same key into the same bucket count produces a
SortMergeJoin whose BOTH sides read pre-bucketed files —
``assert_no_exchange`` proves it from the executed plan. Requires
``spark.sql.sources.bucketing.enabled`` (default true) and bucket
counts to match (Spark can also coalesce k×n→n buckets when
``bucketing.autoBucketedScan`` allows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   buckets: int = 8) -> None:
    """Write ``df`` as an external parquet table bucketed + sorted by
    ``key``. The one-time shuffle/sort at write time is the amortized
    cost; every later join or aggregation on ``key`` skips its
    exchange."""
    (df.write.format("parquet")
     .bucketBy(buckets, key)
     .sortBy(key)
     .option("path", path)
     .mode("overwrite")
     .saveAsTable(table))


def bucketed_join(spark: SparkSession, left: str, right: str,
                  key: str) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left).join(spark.table(right), key)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the EXECUTED plan contains any shuffle exchange.
    (BroadcastExchange is not a shuffle — excluded.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "ShuffleExchange" in plan or "Exchange hashpartitioning" in plan
