"""OGR SQL relational surface as DataFrame plans.

The reference's SQL engine (ogr/swq_*.cpp + ogr/ogrsf_frmts/generic/
ogr_gensql.cpp) supports: SELECT with aliases/DISTINCT, WHERE with
3-valued logic / LIKE / IN / BETWEEN / IS NULL, JOIN (always LEFT,
first-match), whole-table summary aggregates (no GROUP BY:
SWQM_SUMMARY_RECORD, ogr/ogr_swq.h:320), ORDER BY (+LIMIT/OFFSET),
UNION ALL. Catalyst supplies every optimization GenSQL has (pushdown,
COUNT(*) fast path, top-1 single pass) — see SURVEY.md §4.

The one semantic Spark lacks natively is the JOIN rule
(ogr_gensql.cpp:1334-1546): executed as LEFT join taking only the FIRST
matching secondary feature in FID order; null join key ⇒ row kept with
nulls. ``first_match_left_join`` reproduces it with a window dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_match_left_join(primary: DataFrame, secondary: DataFrame,
                          on_expr, primary_key: str,
                          secondary_fid: str) -> DataFrame:
    """OGR SQL LEFT JOIN: at most one match — the first secondary row in
    FID order (single GetNextFeature after SetAttributeFilter)."""
    joined = primary.join(secondary, on_expr, "left")
    w = Window.partitionBy(primary_key).orderBy(
        F.col(secondary_fid).asc_nulls_last())
    return (joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def summary_record(df: DataFrame, numeric_col: str) -> DataFrame:
    """OGR SQL summary mode: aggregates collapse the layer to ONE row
    (no GROUP BY in the dialect; ogr/ogr_swq.h:67-75 — MIN MAX COUNT SUM
    AVG STDDEV_POP STDDEV_SAMP + COUNT(DISTINCT)). Floats are rounded to
    6 decimals for cross-engine comparison (the reference's Kahan sum /
    Welford variance, ogr/ogr_swq.h:374-396, differs from Spark's float
    rounding in the last ulps — SURVEY.md §2.4)."""
    c = F.col(numeric_col)
    return df.agg(
        F.min(c).alias("min_v"), F.max(c).alias("max_v"),
        F.count(c).alias("count_v"),
        F.round(F.sum(c), 4).alias("sum_v"),
        F.round(F.avg(c), 6).alias("avg_v"),
        F.round(F.stddev_pop(c), 6).alias("stddev_pop_v"),
        F.round(F.stddev_samp(c), 6).alias("stddev_samp_v"),
        F.count_distinct(c).alias("count_distinct_v"),
    )
