"""Invariant tests for the round-3 continuation operators.

The exact-value gate is tests/test_queries_oracle.py + tools/run_gate.py;
these tests pin the SEMANTIC claims each docstring makes, independently
of the oracle (which shares the SQL text for some of them).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gdal_spark import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from gdal_spark.session import get_spark
    return get_spark()


def test_not_in_null_3vl(spark):
    """NOT IN vs NOT EXISTS against an all-NULL set: the 3VL split."""
    rows = {(r["kind"], r["k"]): r["n"]
            for r in Q.q_sql_not_in_null(spark, SF).collect()}
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    # NOT IN (all-NULL set) is UNKNOWN for every row -> empty
    assert rows[("notin_all_null", -1)] == 0
    # NOT EXISTS with the same predicate keeps every customer
    assert rows[("notexists_null", -1)] == n_cust
    # the useful anti-join arm is non-vacuous
    assert sum(n for (kind, _), n in rows.items() if kind == "no_recent") > 0


def test_warp_nodata_renormalizes(spark):
    """Masked bilinear: NULL only where all four taps are nodata;
    valid outputs renormalize (a partial window over a constant field
    returns the constant, not a scaled-down value)."""
    df = Q.q_warp_nodata(spark, SF).collect()
    vals = [r["v"] for r in df]
    assert any(v is None for v in vals)        # all-nodata windows exist
    live = [v for v in vals if v is not None]
    assert live and all(v > 0 for v in live)   # burn counts are >= 1
    # renormalization bound: masked bilinear output never exceeds the
    # max valid tap (a convex combination of VALID values only) -- the
    # unmasked variant with implicit 0s would undershoot instead.
    bil = {(r["dy"], r["dx"]): r["v"]
           for r in Q.q_warp_bilinear(spark, SF).collect()}
    nod = {(r["dy"], r["dx"]): r["v"] for r in df}
    assert all(nod[k] >= bil[k] - 1e-9 for k in nod if nod[k] is not None)


def test_warc_roundtrip_all_valid(spark):
    """Every synthesized record is recovered byte-exactly and its
    length equation tiles the record."""
    df = Q.q_warc_records(spark, SF)
    agg = df.agg(F.count("*").alias("n"),
                 F.sum("len_ok").alias("lo"),
                 F.sum("payload_ok").alias("po")).collect()[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert agg["n"] == n_docs
    assert agg["lo"] == n_docs and agg["po"] == n_docs
    # rec_idx is a dense 0..k-1 sequence per shard file
    per = (df.groupBy("file_id")
           .agg(F.count("*").alias("c"), F.min("rec_idx").alias("mn"),
                F.max("rec_idx").alias("mx")).collect())
    assert all(r["mn"] == 0 and r["mx"] == r["c"] - 1 for r in per)


def test_warc_length_check_catches_corruption(spark):
    """The len_ok equation is a real validator: a record whose payload
    embeds the version magic splits wrong and fails the check."""
    spark.createDataFrame(
        [(0, "clean text here", "en", "w", 15),
         (1, "bad WARC/1.0\r\n mid-payload", "en", "w", 26),
         (8, "other shard", "en", "w", 11)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    from gdal_spark.queries import _warc_sql
    rows = spark.sql(f"WITH {_warc_sql('spark')}").collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[0]["len_ok"] == 1 and by_doc[0]["payload_ok"] == 1
    assert by_doc[8]["len_ok"] == 1
    # the corrupted record's length equation fails
    assert by_doc[1]["len_ok"] == 0
    spark.catalog.dropTempView("documents")


def test_cdx_block_index(spark):
    """zipnum secondary index: blocks tile the sorted record space."""
    import math
    rows = Q.q_cdx_index(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert len(rows) == math.ceil(n_docs / Q.CDX_BLOCK)
    keys = [r["first_key"] for r in rows]
    assert keys == sorted(keys)                  # index is ordered
    assert all(r["n"] == Q.CDX_BLOCK for r in rows[:-1])  # full blocks
    # SURT keys are host-reversed: every key starts with a reversed TLD
    assert all(k.split(",")[0] in ("com", "org", "net") for k in keys)


def test_mime_filter_gate(spark):
    rows = Q.q_mime_filter(spark, SF).collect()
    for r in rows:
        want = 1 if (r["doc_id"] % 7 not in (3, 5, 6)
                     and r["doc_id"] % 4 != 3) else 0
        assert r["keep"] == want, r
        if r["doc_id"] % 7 == 3:
            assert r["status"] == 301 and r["redirect"].startswith("https://")
        if r["doc_id"] % 4 == 2:                 # no charset param
            assert r["charset"] == "UTF-8"       # RFC default applied
        if r["doc_id"] % 4 == 1:
            assert r["charset"] == "ISO-8859-1"  # uppercased param


def test_stream_upsert_final_state(spark):
    """foreachBatch CDC apply: the drained table is the batch argmax
    regardless of micro-batch boundaries."""
    import pyspark.sql.functions as FF
    got = {r["user_id"]: r for r in Q.q_stream_upsert(spark, SF).collect()}
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("ts", FF.col("ts").cast("timestamp")))
    want = (ev.groupBy("user_id")
            .agg(FF.max(FF.struct("ts", "event_id")).alias("s"),
                 FF.count("*").alias("nv")).collect())
    assert len(got) == len(want)
    for r in want:
        g = got[r["user_id"]]
        assert g["last_event_id"] == r["s"]["event_id"]
        assert g["n_versions"] == r["nv"]


def test_stream_ema_state_carries_across_batches(spark):
    """The GroupState fold really spans micro-batches: users touched
    by >1 time-ordered shard still reproduce the batch ordered fold."""
    import pyspark.sql.functions as FF
    got = {r["user_id"]: r for r in Q.q_stream_ema_state(spark, SF).collect()}
    # non-vacuous multi-batch state: most users appear in 2+ batches
    multi = [r for r in got.values() if r["n_updates"] > 1]
    assert len(multi) > len(got) / 2, (len(multi), len(got))
    # cross-check the fold against the batch EMA query (same alpha)
    batch = {r["user_id"]: r for r in Q.q_ema_smoothing(spark, SF).collect()}
    for uid, r in got.items():
        assert abs(r["ema"] - batch[uid]["ema"]) < 1e-9, uid
        assert r["n_obs"] == batch[uid]["n_obs"]


def test_stream_interval_outer_suppression(spark):
    """The outer join's watermark rule is non-vacuous: some unmatched
    views are provably expired (emit null rows) and some are too
    young to prove unmatched (emit nothing)."""
    import pyspark.sql.functions as FF
    got = Q.q_stream_interval_outer(spark, SF)
    n_null = got.filter(FF.col("c_id").isNull()).count()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    v = ev.filter(FF.col("event_type") == "view").alias("v")
    c = ev.filter(FF.col("event_type") == "click").alias("c")
    all_unmatched = (v.join(
        c, (FF.col("c.user_id") == FF.col("v.user_id"))
        & (FF.col("c.ts") >= FF.col("v.ts"))
        & (FF.col("c.ts") <= FF.col("v.ts") + FF.expr("INTERVAL 1 HOUR")),
        "left_anti").count())
    assert 0 < n_null < all_unmatched   # expiry emitted AND suppression real


def test_wet_source_scan_model(spark):
    """Format-driver scan: one input partition per gzip shard."""
    import shutil
    import tempfile

    from gdal_spark.sources.wet import WetDataSource, write_wet_shards
    staged = tempfile.mkdtemp()
    try:
        write_wet_shards([(i, f"doc {i} text") for i in range(20)],
                         staged, n_shards=4)
        spark.dataSource.register(WetDataSource)
        df = spark.read.format("wet").load(staged)
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 20
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_wet_reader_handles_magic_in_payload():
    """The Content-Length contract (not magic scanning): a payload
    containing 'WARC/1.0' round-trips byte-exactly — the case
    q_warc_records' split-on-magic analog documents as its deviation."""
    import gzip
    import io

    from gdal_spark.sources.wet import parse_wet_stream, wet_record
    evil = "before WARC/1.0\r\n after"
    blob = wet_record("urn:doc:1", evil) + wet_record("urn:doc:2", "plain")
    fh = io.StringIO(blob)
    recs = list(parse_wet_stream(fh))
    assert [(r[1], r[3]) for r in recs] == [("urn:doc:1", evil),
                                            ("urn:doc:2", "plain")]
    # truncated body raises rather than silently mis-framing
    bad = io.StringIO(blob[:-30])
    import pytest as _pt
    with _pt.raises(ValueError):
        list(parse_wet_stream(bad))
    assert gzip  # imported for parity with the reader's stream mode


def test_wet_writer_roundtrip(spark):
    """Sink half of the format driver: df.write.format('wet') →
    read back through the reader, byte-exact, with the two-phase
    commit leaving no temp files behind."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as FF

    from gdal_spark.sources.wet import WetDataSource
    spark.dataSource.register(WetDataSource)
    out = tempfile.mkdtemp()
    try:
        src = (spark.read.parquet(f"{SF}/documents.parquet")
               .select(FF.concat(FF.lit("urn:doc:"), FF.col("doc_id"))
                       .alias("url"), "text")
               .repartition(3))
        src.write.format("wet").mode("overwrite").save(out)
        files = [f for f in os.listdir(out) if f.endswith(".wet.gz")]
        assert len(files) == 3 and all(f.startswith("part-") for f in files)
        assert not any(f.startswith("_tmp") for f in os.listdir(out))
        back = spark.read.format("wet").load(out)
        a = {(r["url"], r["text"]) for r in back.collect()}
        b = {(r["url"], r["text"]) for r in src.collect()}
        assert a == b
        # append numbers new parts after the existing ones — earlier
        # shards must survive (the ogr2ogr ACCESS_APPEND analog)
        extra = (spark.createDataFrame([("urn:doc:x1", "extra one")],
                                       "url string, text string")
                 .coalesce(1))
        extra.write.format("wet").mode("append").save(out)
        names = sorted(f for f in os.listdir(out) if f.endswith(".wet.gz"))
        assert len(names) == 4 and names[-1] == "part-00003.warc.wet.gz"
        assert spark.read.format("wet").load(out).count() == len(b) + 1
        # overwrite replaces the dataset only at commit time
        extra.write.format("wet").mode("overwrite").save(out)
        assert spark.read.format("wet").load(out).count() == 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_wet_stream_reader_tail_resume(spark):
    """Streaming half of the format driver: a drained query consumes
    all shards; a RESUMED query (same checkpoint) admits only the
    shard that appeared since — the crawler-ingest tail contract."""
    import os
    import shutil
    import tempfile

    from gdal_spark.sources.wet import WetDataSource, write_wet_shards
    spark.dataSource.register(WetDataSource)
    d, ck, out = (tempfile.mkdtemp() for _ in range(3))

    def drain():
        q = (spark.readStream.format("wet").load(d)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).count()

    try:
        write_wet_shards([(i, f"text {i}") for i in range(30)],
                         d, n_shards=3)
        assert drain() == 30
        late = tempfile.mkdtemp()
        write_wet_shards([(100 + i, f"late {i}") for i in range(6)],
                         late, n_shards=1)
        # arrives under a name sorting AFTER the consumed shards (the
        # monotone-name contract of the tail reader)
        os.rename(os.path.join(late, "shard-00000.warc.wet.gz"),
                  os.path.join(d, "zlate.warc.wet.gz"))
        assert drain() == 36          # only the new shard was admitted
    finally:
        for p in (d, ck, out):
            shutil.rmtree(p, ignore_errors=True)


def test_warp_nodata_avg_mask_semantics(spark):
    """Masked average: NULL exactly where no valid source coverage;
    valid outputs bounded by the window max; coverage ≤ window area."""
    rows = Q.q_warp_nodata_avg(spark, SF).collect()
    assert any(r["v"] is None for r in rows)
    for r in rows:
        assert (r["v"] is None) == (r["w_valid"] == 0.0)
        assert r["w_valid"] <= 2.5 * 2.5 + 1e-9
        if r["v"] is not None:
            assert r["v"] >= 1.0        # means of burn counts >= 1


def test_hashclf_decision_is_exact(spark):
    rows = Q.q_hashclf_score(spark, SF).collect()
    ndocs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == ndocs
    for r in rows:
        assert r["label"] == (1 if r["score_sum"] > 0 else 0)
        assert 0.0 < r["prob"] < 1.0
        # dyadic weights: score_sum * 256 is integral (exact fold)
        assert abs(r["score_sum"] * 256 - round(r["score_sum"] * 256)) < 1e-9
    labels = {r["label"] for r in rows}
    assert labels == {0, 1}             # both classes fire


def test_bitext_margin_semantics(spark):
    df = Q.q_bitext_mine(spark, SF).collect()
    n_src = (spark.read.parquet(f"{SF}/embeddings.parquet")
             .filter(F.col("vec_id") % 2 == 0).count())
    assert len(df) == n_src                     # one best target per source
    assert all(r["tgt_id"] % 2 == 1 for r in df)
    assert all(-1.0 <= r["cos"] <= 1.0 for r in df)
    # margin > 0 and the mutual flag is a strict subset
    assert all(r["margin"] > 0 for r in df)
    assert 0 < sum(r["mutual"] for r in df) <= len(df)


def test_bitext_best_is_argmax(spark):
    """The emitted target really is the cosine argmax over the target
    side (brute-force recheck on the small fixture)."""
    import numpy as np
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    out = {r["src_id"]: r["tgt_id"]
           for r in Q.q_bitext_mine(spark, SF).collect()}
    tgts = sorted(i for i in emb if i % 2 == 1)
    for src in list(out)[:20]:
        va = emb[src]
        cos = [(round(float(va @ emb[t]
                            / (np.linalg.norm(va) * np.linalg.norm(emb[t]))),
                      6), t) for t in tgts]
        best = max(cos, key=lambda ct: (ct[0], -ct[1]))[1]
        assert out[src] == best
