"""Partition pruning proof — the local analog of Iceberg partition
pruning (SURVEY §2.1 scan story): a corpus written partitioned by a
query key is scanned with the partition filter applied at PLANNING
time, so non-matching partitions are never listed into the scan."""

import os

from conftest import SF_SMOKE


def test_partitioned_write_prunes_scan(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(path)

    pruned = spark.read.parquet(path).filter("lang = 'en'")
    plan_str = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str and "lang" in plan_str.split(
        "PartitionFilters")[1][:200], "lang filter must prune partitions"

    # physical proof from the executed scan metric: only the lang=en
    # file is read (inputFiles() reflects the unpruned listing, so the
    # numFiles metric is the authoritative count)
    rows = pruned.collect()
    scan = (pruned._jdf.queryExecution().executedPlan()
            .collectLeaves().apply(0))
    n_read = int(scan.metrics().apply("numFiles").value())
    n_langs = docs.select("lang").distinct().count()
    assert n_read == 1 < n_langs, f"pruned scan read {n_read} files"

    # and produce exactly the filtered rows
    assert len(rows) == docs.filter("lang = 'en'").count()


def test_unpartitioned_scan_reads_everything(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_flat")
    docs.write.mode("overwrite").parquet(path)
    flat = spark.read.parquet(path).filter("lang = 'en'")
    # same answer, but without partition layout the filter can only
    # push down into row groups — every file is still scanned
    flat.collect()
    scan = (flat._jdf.queryExecution().executedPlan()
            .collectLeaves().apply(0))
    n_read = int(scan.metrics().apply("numFiles").value())
    n_all = len(spark.read.parquet(path).inputFiles())
    assert n_read == n_all, (n_read, n_all)
    assert flat.count() == docs.filter("lang = 'en'").count()
