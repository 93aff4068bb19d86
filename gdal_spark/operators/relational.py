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


def asof_carry(left: DataFrame, right: DataFrame, key: str, ts: str,
               carry_cols: list[str], order_col: str) -> DataFrame:
    """AS-OF JOIN (kdb/DuckDB semantics: per left row, the right row
    with the greatest right.ts <= left.ts within the key) as the
    scalable union+window idiom — ONE shuffle on the key, no range-join
    candidate blowup, no per-key skew beyond the sort.

    ``carry_cols`` are the right-side columns to carry; ``order_col``
    is a right-side column that breaks equal-ts ties deterministically
    (last in (ts, order_col) order wins). Left columns pass through
    with matched carry columns appended (NULL when no prior right row:
    LEFT as-of). Right rows at the same ts as a left row DO match
    (<=), implemented by sorting right (side 0) before left (side 1)
    at equal ts."""
    lcols = left.columns
    l_tag = left.withColumn("_side", F.lit(1)) \
                .withColumn("_ord", F.lit(None).cast(
                    right.schema[order_col].dataType))
    for c in carry_cols:
        l_tag = l_tag.withColumn(
            c, F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.withColumn("_side", F.lit(0)) \
                 .withColumn("_ord", F.col(order_col))
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, ts, "_side", "_ord"] + \
        [c for c in lcols if c not in (key, ts)] + carry_cols
    merged = l_tag.select(*cols).unionByName(r_tag.select(*cols))
    w = (Window.partitionBy(key)
         .orderBy(ts, "_side", "_ord")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = merged
    for c in carry_cols:
        out = out.withColumn(f"m_{c}",
                             F.last(c, ignorenulls=True).over(w))
    out = out.withColumn(
        "m_ts", F.last(F.when(F.col("_side") == 0, F.col(ts)),
                       ignorenulls=True).over(w))
    return (out.filter(F.col("_side") == 1)
            .select(*[F.col(c) for c in lcols],
                    *[F.col(f"m_{c}") for c in carry_cols],
                    F.col("m_ts")))
