"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the Spark-native "custom stateful
operator" surface (the reference has no streaming model; SURVEY §2.15).

Semantics: events of a user belong to one session while consecutive
event times are within ``gap`` (classic gaps-and-islands). With
``availableNow`` over a single file the source drains in one batch,
every user's events arrive in a single grouped call, and the result is
EXACTLY the batch LAG-based islands query — so even this stateful
operator gets an exact DuckDB oracle.

Multi-batch behavior (documented semantics, not a claim of exactness):
GroupState carries the number of sessions emitted so far, so
``session_idx`` keeps counting monotonically across micro-batches
instead of restarting at 0. A session whose events straddle a batch
boundary is still SPLIT into two sessions (the operator emits eagerly
rather than holding the open session back until a state timeout) — the
operator is single-batch-exact; cross-batch runs get correct counts
and monotone indexes but boundary sessions may split.

Outputs only order-free exact fields (counts, min/max timestamps) —
per-session float sums would be fold-order-dependent.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, session_idx int, start_ts timestamp, "
              "end_ts timestamp, n_events long")
STATE_SCHEMA = "n int"


def _sessionize_user(key, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    gap = pd.Timedelta(minutes=30)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    start = end = None
    n = 0
    # resume the index from prior batches so session_idx stays
    # monotone across micro-batches (see module docstring)
    idx = state.get[0] if state.exists else 0
    for ts in rows["ts"]:
        if start is None:
            start, end, n = ts, ts, 1
        elif ts - end > gap:
            out.append((key[0], idx, start, end, n))
            idx += 1
            start, end, n = ts, ts, 1
        else:
            end, n = ts, n + 1
    if start is not None:
        out.append((key[0], idx, start, end, n))
        idx += 1
    state.update((idx,))
    yield pd.DataFrame(
        out, columns=["user_id", "session_idx", "start_ts", "end_ts",
                      "n_events"])


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table through the stateful operator; returns the
    session table as a batch DataFrame."""
    import shutil

    from gdal_spark.streaming.events import utc_session
    name = f"sessions_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_sess_ckpt_")
    try:
        with utc_session(spark):  # see events.py
            schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
            src = (spark.readStream.schema(schema)
                   .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
                   .withColumn("ts", F.col("ts").cast("timestamp")))
            sessions = (src.groupBy("user_id")
                        .applyInPandasWithState(
                            _sessionize_user, OUT_SCHEMA, STATE_SCHEMA,
                            "append", GroupStateTimeout.NoTimeout))
            q = (sessions.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return (spark.table(name)
                    .select("user_id", "session_idx",
                            F.col("start_ts").cast("timestamp_ntz").alias("start_ts"),
                            F.col("end_ts").cast("timestamp_ntz").alias("end_ts"),
                            "n_events")
                    .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
