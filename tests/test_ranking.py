"""Two-phase exact global rank (operators/ranking.py): value parity
with the single-window form, exact NTILE derivation, and the PLAN
proof that the corpus-sized window is partitioned (the round-3 VERDICT
defect: classifier_auc / perplexity_buckets / length_deciles each
shipped an unpartitioned ROW_NUMBER/NTILE that funnels the corpus
through one task)."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _corpus_windows_are_partitioned(df, bucket_col: str) -> None:
    """Every row_number/ntile window in the physical plan must carry
    the bucket column in its partition spec; the only permissible
    unpartitioned window is the prefix sum over the per-bucket count
    table (an Aggregate output, one row per bucket)."""
    plan = _physical_plan(df)
    for line in plan.splitlines():
        if "row_number()" in line or "ntile(" in line:
            assert bucket_col in line, (
                f"corpus-sized window lacks partition spec:\n{line}")


def test_global_row_number_matches_window(spark):
    from gdal_spark.operators.ranking import global_row_number
    df = (spark.range(5000)
          .select((F.col("id") * 48271 % 9973).alias("k"),
                  F.col("id").alias("doc_id"))
          .withColumn("_rkb", F.expr("CAST(k DIV 512 AS INT)")))
    got = (global_row_number(df, "_rkb", ["k", "doc_id"], out="rnk")
           .select("doc_id", "rnk").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (df.withColumn("rnk", F.row_number().over(
        Window.orderBy("k", "doc_id")).cast("long"))
        .select("doc_id", "rnk").toPandas()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_ntile_from_rank_matches_ntile():
    """Pure-python check of the SQL-standard tile rule across remainder
    cases (n % k = 0, 1, k-1) and tiny n < k."""
    def ref_ntile(n, k):
        q, r = divmod(n, k)
        out, rnk = [], 0
        for tile in range(1, k + 1):
            size = q + (1 if tile <= r else 0)
            out += [tile] * size
        return out

    def rule(rnk, n, k):
        q, r = divmod(n, k)
        big, small = q + 1, q
        cut = big * r
        if rnk <= cut:
            return (rnk - 1) // big + 1
        return r + (rnk - cut - 1) // small + 1

    for n in (1, 7, 9, 10, 11, 19, 20, 21, 97, 100):
        k = 10
        if n < k:
            # every tile has 0 or 1 rows; ntile gives row i tile i
            assert [rule(i + 1, n, k) for i in range(n)] == \
                list(range(1, n + 1))
            continue
        assert [rule(i + 1, n, k) for i in range(n)] == ref_ntile(n, k)


def test_auc_plan_partitioned(spark):
    from gdal_spark.queries import q_classifier_auc
    _corpus_windows_are_partitioned(q_classifier_auc(spark, SF), "_rkb")


def test_perplexity_plan_partitioned(spark):
    from gdal_spark.queries import q_perplexity_buckets
    _corpus_windows_are_partitioned(q_perplexity_buckets(spark, SF),
                                    "_rkb")


def test_deciles_plan_partitioned_and_ntile_free(spark):
    from gdal_spark.queries import q_length_deciles
    df = q_length_deciles(spark, SF)
    _corpus_windows_are_partitioned(df, "_rkb")
    assert "ntile(" not in _physical_plan(df)
