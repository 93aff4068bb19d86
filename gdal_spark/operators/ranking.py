"""Two-phase exact global ranking — the scale-correct replacement for
an unpartitioned ``ROW_NUMBER() OVER (ORDER BY ...)``.

A global sort-window funnels the whole input through ONE task
(WindowExec warns "No Partition Defined ... moving all data to a
single partition"); at 10^12 rows that task is the job. The exact
two-phase form (the TeraSort discipline, same shape as q_doc_shuffle /
sequence_pack in queries.py):

1. bucket every row by a coarse key that is MONOTONE-compatible with
   the sort order (equal sort keys land in one bucket, bucket order ==
   sort order between buckets);
2. one map-side-combined count per bucket (tiny table: one row per
   bucket);
3. an exclusive prefix sum over that tiny table — the only remaining
   unpartitioned window, over ≤ thousands of rows by construction;
4. per-bucket partitioned ``row_number`` + broadcast-joined offset.

No stage sees the corpus in one task; the shuffle is hash(bucket),
which AQE skew-splits if the bucketing is imbalanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, bucket_col: str,
                      order_cols: list, out: str = "rnk") -> DataFrame:
    """Append ``out`` = exact global 1-based rank of ``df`` rows under
    ``order_cols``, given ``bucket_col`` — an integer column already on
    ``df`` that is monotone-compatible with the order (see module
    docstring). The caller picks the bucketing (score ranges, hash
    prefixes, ...); this helper owns the count/prefix/offset plumbing.
    """
    bcnt = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_bn"))
    wb = (Window.orderBy(bucket_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    boff = bcnt.select(
        bucket_col,
        F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_boff"))
    wd = Window.partitionBy(bucket_col).orderBy(*order_cols)
    return (df.join(F.broadcast(boff), bucket_col)
            .withColumn(out, (F.col("_boff")
                              + F.row_number().over(wd)).cast("long"))
            .drop("_boff"))


def ntile_from_rank(rnk, n, k: int):
    """Exact NTILE(k) label from a global rank + total count — the
    SQL-standard rule: the first ``n % k`` tiles get ``n DIV k + 1``
    rows, the rest ``n DIV k``. Lets a two-phase rank replace an
    unpartitioned NTILE window with identical output."""
    def idiv(a, b):
        # exact integer a DIV b on long columns: subtract the modulus
        # first so the double division is of an exact multiple —
        # correctly-rounded IEEE division then yields the integer
        # exactly (both operands < 2^53), with no floor-epsilon risk
        return ((a - a % b) / b).cast("long")

    big = idiv(n, F.lit(k)) + 1                  # rows in a big tile
    small = idiv(n, F.lit(k))
    r = (n % k).cast("long")                     # number of big tiles
    cut = big * r                                # rows in all big tiles
    tile = (F.when(rnk <= cut, idiv(rnk - 1, big))
            .otherwise(r + idiv(rnk - cut - 1, small)))
    return (tile + 1).cast("int")
