"""BPE merge semantics and sequence-packing prefix-sum property."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from gdal_spark.queries import PACK_BUCKET, SEQ_LEN


def test_bpe_replace_is_boundary_safe_and_left_to_right(spark):
    """The pipe-delimited representation must (a) never merge inside a
    longer symbol ('|aa| |r|' does not contain '|a| |r|') and (b) merge
    runs left-to-right non-overlapping, exactly BPE's order."""
    df = spark.createDataFrame(
        [("|a| |r| |a| |r|",), ("|aa| |r|",), ("|x| |a| |r| |y|",)],
        "seq string")
    out = [r["m"] for r in
           df.select(F.replace("seq", F.lit("|a| |r|"), F.lit("|ar|"))
                     .alias("m")).collect()]
    assert out == ["|ar| |ar|", "|aa| |r|", "|x| |ar| |y|"]


def test_bpe_learns_expected_merge_on_toy_corpus(spark):
    """'low lower lowest' x freq: first merge must be the most frequent
    adjacent pair with lexicographic tie-break."""
    import os
    import tempfile
    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "low lowest")],
        "doc_id long, text string")
    docs = docs.selectExpr("doc_id", "text", "1 AS n_chars", "'en' AS lang")
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    from gdal_spark.queries import q_bpe_train
    rows = q_bpe_train(spark, d).collect()
    # every word contains 'l o w' → ('|l| |o|', cnt 5) ties with
    # ('|o| |w|', 5); lexicographic '|l| |o|' wins round 1, and round 2
    # merges '|lo| |w|'
    assert rows[0]["pair"] == "|l| |o|" and rows[0]["cnt"] == 5
    assert rows[1]["pair"] == "|lo| |w|" and rows[1]["cnt"] == 5


def test_sequence_pack_two_phase_equals_global_cumsum(spark):
    from gdal_spark.queries import q_sequence_pack
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (1 + (i * 37) % 90))) for i in range(300)],
        "doc_id long, text string") \
        .selectExpr("doc_id", "text", "1 AS n_chars", "'en' AS lang")
    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"])
           for r in q_sequence_pack(spark, d).collect()}
    run = 0
    for i in range(300):
        n = 1 + (i * 37) % 90
        assert got[i] == (run, run // SEQ_LEN, (run + n - 1) // SEQ_LEN), i
        run += n
    assert 300 > PACK_BUCKET  # the fixture genuinely spans buckets
