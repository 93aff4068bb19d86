"""Bucketed sink → shuffle-free co-located join (pipeline/bucketed.py).

Proves the amortized-shuffle contract from the executed plan: joining
two tables bucketed by the same key shows NO shuffle exchange, while
the identical join over plain parquet shows one on each side; results
are identical."""

import os

import pytest

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucket_env(spark, tmp_path_factory):
    from gdal_spark.pipeline.bucketed import write_bucketed
    base = str(tmp_path_factory.mktemp("buck"))
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", "source")
    write_bucketed(left, "b_left", os.path.join(base, "l"), "doc_id")
    write_bucketed(right, "b_right", os.path.join(base, "r"), "doc_id")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_no_exchange(bucket_env):
    from gdal_spark.pipeline.bucketed import bucketed_join, plan_has_exchange
    spark = bucket_env
    # force a real SMJ (no broadcast shortcut hiding the exchange story)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_left", "b_right", "doc_id")
        j.collect()
        assert not plan_has_exchange(j), (
            "bucketed join must not shuffle either side")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_and_matches(bucket_env):
    from gdal_spark.pipeline.bucketed import bucketed_join, plan_has_exchange
    spark = bucket_env
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        plain = (docs.select("doc_id", "lang", "n_chars")
                 .join(docs.select("doc_id", "source"), "doc_id"))
        plain.collect()
        assert plan_has_exchange(plain), (
            "plain parquet join is expected to shuffle")
        b = bucketed_join(spark, "b_left", "b_right", "doc_id")
        got = sorted(tuple(r) for r in b.collect())
        want = sorted(tuple(r) for r in plain.collect())
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
