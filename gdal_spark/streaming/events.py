"""Structured Streaming surface.

The reference has NO streaming model (SURVEY §2.15 — GDAL is a batch
library; its incremental story is chunk-restartable utilities). The
north star's incremental requirement is checkpoint/resume (see
pipeline/checkpoint.py). This module adds the Spark-native streaming
twin of the batch event rollup anyway, because a web-scale ingest
pipeline would arrive as a stream: file-source → event-time watermark →
tumbling windows → sink, runnable with trigger(availableNow) for
batch-equivalent replays.

Determinism: with availableNow + complete mode the stream drains the
full input and the result equals the batch GROUP BY (the oracle is the
same SQL as queries.o_events_window) — so even the streaming operator
gets an exact cross-engine check.
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextlib.contextmanager
def utc_session(spark: SparkSession):
    """Pin the session timezone to UTC for the duration, restoring the
    caller's zone after — a driver-owned session with a deliberately
    different tz must not see it permanently changed."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def dedup_stream(spark: SparkSession, sf_dir: str,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    ``dedup_exact`` pipeline: content-hash key, first copy wins, state
    bounded by the event-time watermark (dropDuplicatesWithinWatermark
    keeps a key only until its watermark expires, so state does NOT
    grow with stream length — the property that matters at a 10^12-row
    ingest). Only the dedup keys are emitted. Equality with the batch
    DISTINCT holds for THIS single-file availableNow replay because the
    source drains in one micro-batch; in a multi-batch replay
    (multi-file glob or maxFilesPerTrigger), duplicate keys whose event
    times differ by more than the watermark are re-emitted — the
    batch-equality claim is scoped to the single-batch case."""
    name = f"dedup_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
            src = (spark.readStream.schema(schema)
                   .option("pathGlobFilter", "events.parquet")
                   .parquet(sf_dir)
                   .withColumn("ts", F.col("ts").cast("timestamp")))
            deduped = (src
                       .withColumn("content_hash",
                                   F.md5(F.concat_ws("|", "event_type", "props")))
                       .withWatermark("ts", watermark)
                       .dropDuplicatesWithinWatermark(["content_hash"])
                       .select("content_hash"))
            q = (deduped.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def hourly_rollup_stream(spark: SparkSession, sf_dir: str,
                         watermark: str = "2 hours") -> DataFrame:
    """Run the hourly per-type rollup as a stream over the events
    parquet; returns the drained result as a batch DataFrame."""
    # the NTZ→LTZ→window→NTZ round-trip is tz-invariant only for
    # whole-hour-offset zones; pin UTC so a driver-owned session with
    # another zone can't shift bucket boundaries
    name = f"rollup_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
            src = (spark.readStream.schema(schema)
                   # file source requires a directory; select just the
                   # events table out of the shared sf dir
                   .option("pathGlobFilter", "events.parquet")
                   .parquet(sf_dir)
                   # watermark requires TIMESTAMP (LTZ); the table
                   # stores NTZ. Session TZ is UTC so the cast is
                   # value-preserving.
                   .withColumn("ts", F.col("ts").cast("timestamp")))
            agg = (src.withWatermark("ts", watermark)
                   .groupBy(F.window("ts", "1 hour").alias("w"),
                            F.col("event_type"))
                   .agg(F.count("*").alias("n"),
                        F.round(F.sum("value"), 4).alias("sum_value")))
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            # materialize under UTC — the memory sink holds LTZ windows
            return (spark.table(name)
                    .select(F.col("w.start").cast("timestamp_ntz").alias("hour"),
                            "event_type", "n", "sum_value")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# deterministic event coordinates + circular fences for the geofence
# stream: formulas shared verbatim with the DuckDB oracle
GEOFENCE_LAT_SQL = "(((event_id * 37) % 1200) / 10.0 - 60.0)"
GEOFENCE_LON_SQL = "(((event_id * 91) % 3600) / 10.0 - 180.0)"
GEOFENCES = [  # (fence_id, lat, lon, radius_deg) — planar circles
    (0, 40.7, -74.0, 12.0),
    (1, 51.5, -0.12, 10.0),
    (2, 35.68, 139.69, 14.0),
    (3, -23.55, -46.63, 11.0),
    (4, 48.85, 2.35, 8.0),
]


def geofence_stream(spark: SparkSession, sf_dir: str,
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming geofence alerts — the canonical spatial streaming op
    the reference's batch-only model cannot express: an event stream
    with derived coordinates, a stream-static NON-EQUI join against a
    broadcast fence table (point-in-circle), then watermarked hourly
    tumbling counts per fence. An event inside two overlapping fences
    alerts in both. With availableNow + complete mode the drained
    result equals the batch GROUP BY (exact DuckDB oracle); the
    watermark bounds state for the unbounded-ingest case."""
    name = f"geofence_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
            src = (spark.readStream.schema(schema)
                   .option("pathGlobFilter", "events.parquet")
                   .parquet(sf_dir)
                   .withColumn("ts", F.col("ts").cast("timestamp"))
                   .selectExpr("event_id", "ts", "value",
                               GEOFENCE_LAT_SQL + " AS lat",
                               GEOFENCE_LON_SQL + " AS lon"))
            fences = spark.createDataFrame(
                GEOFENCES, "fence_id int, flat double, flon double, r double")
            d2 = ((F.col("lat") - F.col("flat"))
                  * (F.col("lat") - F.col("flat"))
                  + (F.col("lon") - F.col("flon"))
                  * (F.col("lon") - F.col("flon")))
            hits = src.join(F.broadcast(fences), d2 <= F.col("r") * F.col("r"))
            agg = (hits.withWatermark("ts", watermark)
                   .groupBy(F.window("ts", "1 hour").alias("w"),
                            F.col("fence_id"))
                   .agg(F.count("*").alias("n"),
                        F.round(F.sum("value"), 4).alias("sum_value")))
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return (spark.table(name)
                    .select(F.col("w.start").cast("timestamp_ntz")
                            .alias("hour"),
                            "fence_id", "n", "sum_value")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def interval_join_stream(spark: SparkSession, sf_dir: str,
                         watermark: str = "2 hours",
                         window: str = "1 hour") -> DataFrame:
    """STREAM-STREAM event-time interval join (the Structured
    Streaming capability the rest of the suite's stream-static joins
    don't exercise): each view stream row joins the same user's click
    stream rows that land within ``window`` after it. Both sides carry
    watermarks and the join predicate carries the event-time range
    constraint — exactly what Spark requires to bound join state: a
    buffered view row is dropped once the click watermark passes
    v_ts + window, so state is (rate × window)-bounded at any stream
    length. Equality with the batch interval join holds for this
    single-file availableNow replay (one micro-batch — in-batch
    matches are always emitted); a multi-batch replay could only ADD
    late-arrival drops, which the watermark makes deterministic."""
    name = f"ivj_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

            def src():
                return (spark.readStream.schema(schema)
                        .option("pathGlobFilter", "events.parquet")
                        .parquet(sf_dir)
                        .withColumn("ts", F.col("ts").cast("timestamp")))

            views = (src().filter(F.col("event_type") == "view")
                     .select(F.col("user_id").alias("v_user"),
                             F.col("ts").alias("v_ts"),
                             F.col("event_id").alias("v_id"))
                     .withWatermark("v_ts", watermark))
            clicks = (src().filter(F.col("event_type") == "click")
                      .select(F.col("user_id").alias("c_user"),
                              F.col("ts").alias("c_ts"),
                              F.col("event_id").alias("c_id"))
                      .withWatermark("c_ts", watermark))
            j = (views.join(
                clicks,
                (F.col("c_user") == F.col("v_user"))
                & (F.col("c_ts") >= F.col("v_ts"))
                & (F.col("c_ts") <= F.col("v_ts")
                   + F.expr(f"INTERVAL {window}")), "inner")
                .select("v_id", "c_id",
                        F.expr("timestampdiff(MICROSECOND, v_ts, c_ts)")
                        .alias("lag_us")))
            q = (j.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# streaming count-min sketch: key rule + geometry shared verbatim
# with the DuckDB oracle (queries.o_stream_cms)
SCMS_D = 4
SCMS_KEY_SQL = ("concat(event_type, ':', "
                "CAST(user_id % 97 AS STRING))")


def scms_bucket_sql(j: int) -> str:
    """Row-j bucket (0..15): one md5 hex digit of ('j:' || key) — the
    same portable instr-on-hex-alphabet idiom the batch
    cms_heavy_hitters uses."""
    return (f"(instr('0123456789abcdef', "
            f"substr(md5(concat('{j}:', k)), 1, 1)) - 1)")


def cms_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch (Cormode & Muthukrishnan 2005) over
    the event stream: every event increments {D} counters (row j,
    bucket h_j(key)); the running aggregation state IS the sketch —
    D x 16 counters, so state is CONSTANT in stream length (the
    sketch's entire reason to exist: no watermark needed, unlike
    keyed-window aggs whose state grows with key cardinality).
    availableNow + complete mode drains the file replay so the
    drained counter table equals the batch construction exactly —
    the oracle rebuilds it in DuckDB."""
    name = f"scms_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
            src = (spark.readStream.schema(schema)
                   .option("pathGlobFilter", "events.parquet")
                   .parquet(sf_dir)
                   .withColumn("k", F.expr(SCMS_KEY_SQL)))
            rows = src.select(F.explode(F.array(*[
                F.struct(F.lit(j).alias("j"),
                         F.expr(scms_bucket_sql(j)).alias("bucket"))
                for j in range(SCMS_D)])).alias("r")) \
                .select("r.j", "r.bucket")
            agg = rows.groupBy("j", "bucket").agg(
                F.count("*").alias("cnt"))
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return (spark.table(name)
                    .orderBy("j", "bucket")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def upsert_stream(spark: SparkSession, sf_dir: str,
                  n_shards: int = 4) -> DataFrame:
    """Streaming CDC apply — foreachBatch incremental MERGE into a
    versioned snapshot table (pipeline/checkpoint.VersionedTable): the
    event log replays as ``n_shards`` real micro-batches
    (one file per trigger), and every batch merges latest-per-user
    state — argmax by (ts, event_id) — into a NEW immutable table
    version whose manifest records the prior version as lineage. This
    is the Iceberg ``MERGE INTO`` loop a 10^12-row CDC ingest runs,
    with the resume story built in: a killed job re-reads the last
    complete version and the stream checkpoint replays only unseen
    files.

    Determinism: the final state is batch-boundary-independent — the
    per-user merge is an associative argmax over (ts, event_id) (a
    total order; event_id is unique) and n_versions is an associative
    count-sum — so ANY interleaving of the shard files converges to
    the batch argmax the oracle computes. Intermediate versions DO
    depend on file-discovery order; only the drained final table is
    the gated output.

    Scale shape: each batch does ONE groupBy(user_id) merge of
    (current ∪ batch) — the co-partitioned MERGE plan; state lives in
    the table, not executor memory, so stream length never grows
    state. The memory-pressure knob is table size, exactly as in the
    real Iceberg sink."""
    vt_dir = tempfile.mkdtemp(prefix="gdal_spark_upsert_vt_")
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    staged = tempfile.mkdtemp(prefix="gdal_spark_upsert_src_")
    from gdal_spark.pipeline.checkpoint import VersionedTable
    vt = VersionedTable(vt_dir)
    try:
        with utc_session(spark):
            ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
                  .withColumn("ts", F.col("ts").cast("timestamp")))
            for i in range(n_shards):
                (ev.filter(F.col("event_id") % n_shards == i).coalesce(1)
                 .write.mode("append").parquet(staged))
            schema = ev.schema

            def apply_batch(bdf, batch_id):
                s = bdf.sparkSession
                batch = (bdf.groupBy("user_id")
                         .agg(F.max(F.struct("ts", "event_id", "value"))
                              .alias("s"),
                              F.count("*").alias("nv")))
                try:
                    cur = vt.read(s, "users")
                except FileNotFoundError:
                    cur = None
                merged = batch if cur is None else (
                    cur.unionByName(batch)
                    .groupBy("user_id")
                    .agg(F.max("s").alias("s"), F.sum("nv").alias("nv")))
                vt.write(s, "users", merged, mode="overwrite")

            q = (spark.readStream.schema(schema)
                 .option("maxFilesPerTrigger", 1)
                 .parquet(staged)
                 .writeStream.foreachBatch(apply_batch)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            final = vt.read(spark, "users")
            n_versions = vt.manifest("users")["version"]
            assert n_versions == n_shards, (n_versions, n_shards)
            return (final.select(
                        "user_id",
                        F.unix_micros(F.col("s.ts")).alias("last_us"),
                        F.col("s.event_id").alias("last_event_id"),
                        F.col("s.value").alias("last_value"),
                        F.col("nv").cast("long").alias("n_versions"))
                    .orderBy("user_id")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(vt_dir, ignore_errors=True)


EMA_STATE_SHARDS = 4

EMA_OUT_SCHEMA = ("user_id long, n_obs long, first_v double, "
                  "last_v double, ema double")
EMA_STATE_SCHEMA = "n long, fv double, lv double, ema double"


def _ema_user(key, pdfs, state):
    """Fold this batch's time-sorted rows of one user into the carried
    (n, first, last, ema) ValueState; emit the post-batch state. The
    0.25 alpha is dyadic so every fold step is exact IEEE — the same
    float op sequence as the batch sort_array+aggregate and the
    oracle's list_reduce."""
    import pandas as pd
    df = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        n, fv, lv, ema = state.get
    else:
        n, fv, lv, ema = 0, 0.0, 0.0, 0.0
    for v in df["value"]:
        v = float(v)
        if n == 0:
            ema = v
            fv = v
        else:
            ema = 0.25 * v + 0.75 * ema
        lv = v
        n += 1
    state.update((n, fv, lv, ema))
    yield pd.DataFrame({"user_id": [int(key[0])], "n_obs": [n],
                        "first_v": [fv], "last_v": [lv], "ema": [ema]})


def ema_state_stream(spark: SparkSession, sf_dir: str,
                     n_shards: int = EMA_STATE_SHARDS) -> DataFrame:
    """Per-user streaming EMA — a custom stateful operator whose
    GroupState carries the full smoother (n, first, last, ema) across
    REAL micro-batches: the order-sensitive recurrence built-in
    streaming aggregates cannot express. (Spark 4 adds the stateful
    v2 surface, transformWithStateInPandas; its Python state server
    requires protobuf, absent from this container — documented — so
    the operator uses the applyInPandasWithState surface; the state
    contract is the same fixed-width per-user tuple, bounded by user
    count, never by stream length.)

    Replay discipline: the event log is staged into ``n_shards``
    files that partition the GLOBAL (ts, event_id) order (ntile), and
    file mtimes force the file source to admit them oldest-first — so
    batches arrive in time order and the cross-batch fold reproduces
    the batch ordered fold exactly (oracle: ema_smoothing's
    list_reduce + an NTILE emission count). The single-window ntile
    staging is test scaffolding, not the operator — a real ingest
    arrives already time-bucketed.

    Emissions: one row per touched user per batch; the gated output
    keeps each user's LAST emission (max n_obs) plus n_updates, the
    number of batches that touched the user — both deterministic
    because shard boundaries and admission order are pinned."""
    import os
    import time

    from pyspark.sql import Window
    from pyspark.sql.streaming.state import GroupStateTimeout

    name = f"emastate_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    staged = tempfile.mkdtemp(prefix="gdal_spark_ema_src_")
    try:
        with utc_session(spark):
            ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
                  .withColumn("ts", F.col("ts").cast("timestamp")))
            w = Window.orderBy("ts", "event_id")
            sharded = ev.withColumn("shard", F.ntile(n_shards).over(w))
            for i in range(1, n_shards + 1):
                (sharded.filter(F.col("shard") == i).drop("shard")
                 .coalesce(1).write.mode("append").parquet(staged))
                # monotone mtimes admit shards oldest-first (the file
                # source orders pending files by modification time)
                t = time.time() - (n_shards - i) * 60
                for fn in os.listdir(staged):
                    p = os.path.join(staged, fn)
                    if os.path.getmtime(p) > t:
                        os.utime(p, (t, t))
            src = (spark.readStream.schema(ev.schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(staged))
            out = (src.groupBy("user_id")
                   .applyInPandasWithState(
                       _ema_user, EMA_OUT_SCHEMA, EMA_STATE_SCHEMA,
                       "append", GroupStateTimeout.NoTimeout))
            q = (out.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            emitted = spark.table(name)
            wl = Window.partitionBy("user_id").orderBy(
                F.col("n_obs").desc())
            return (emitted
                    .withColumn("_rn", F.row_number().over(wl))
                    .withColumn("n_updates",
                                F.count(F.lit(1)).over(
                                    Window.partitionBy("user_id")))
                    .filter(F.col("_rn") == 1)
                    .select("user_id", "n_obs",
                            F.round("first_v", 6).alias("first_v"),
                            F.round("last_v", 6).alias("last_v"),
                            F.round("ema", 6).alias("ema"),
                            F.col("n_updates").cast("long")
                            .alias("n_updates"))
                    .orderBy("user_id")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def interval_join_outer_stream(spark: SparkSession, sf_dir: str,
                               watermark: str = "2 hours",
                               window: str = "1 hour") -> DataFrame:
    """LEFT OUTER stream-stream interval join — the semantics the
    inner variant (interval_join_stream) can't show: a view row with
    NO click inside its window emits a null-padded row, but ONLY once
    the global watermark proves no future match can arrive (the
    buffered row's expiry v_ts + window falls behind the watermark,
    min(max seen view ts, max seen click ts) − delay). Views younger
    than that stay in state and emit NOTHING when an availableNow
    replay drains — unmatched-but-not-yet-provably-unmatched is a
    real, documented streaming outcome, and it is exactly computable:
    the oracle derives the final watermark from the same fixture and
    splits the LEFT JOIN accordingly. The no-data final micro-batch
    (noDataMicroBatches, on by default) is what flushes the expired
    rows after the last data batch."""
    name = f"ivjo_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_stream_ckpt_")
    try:
        with utc_session(spark):
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

            def src():
                return (spark.readStream.schema(schema)
                        .option("pathGlobFilter", "events.parquet")
                        .parquet(sf_dir)
                        .withColumn("ts", F.col("ts").cast("timestamp")))

            views = (src().filter(F.col("event_type") == "view")
                     .select(F.col("user_id").alias("v_user"),
                             F.col("ts").alias("v_ts"),
                             F.col("event_id").alias("v_id"))
                     .withWatermark("v_ts", watermark))
            clicks = (src().filter(F.col("event_type") == "click")
                      .select(F.col("user_id").alias("c_user"),
                              F.col("ts").alias("c_ts"),
                              F.col("event_id").alias("c_id"))
                      .withWatermark("c_ts", watermark))
            j = (views.join(
                clicks,
                (F.col("c_user") == F.col("v_user"))
                & (F.col("c_ts") >= F.col("v_ts"))
                & (F.col("c_ts") <= F.col("v_ts")
                   + F.expr(f"INTERVAL {window}")), "leftOuter")
                .select("v_id", "c_id",
                        F.expr("timestampdiff(MICROSECOND, v_ts, c_ts)")
                        .alias("lag_us")))
            q = (j.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return (spark.table(name)
                    .orderBy("v_id", "c_id")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
