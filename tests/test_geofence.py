"""Streaming geofence: drained availableNow result equals the batch
point-in-circle rollup; overlapping fences double-alert."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch_oracle(spark):
    from gdal_spark.queries import o_stream_geofence, q_stream_geofence
    got = sorted((str(r.hour), r.fence_id, r.n, r.sum_value)
                 for r in q_stream_geofence(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = sorted((str(r[0]), r[1], r[2], r[3])
                  for r in con.execute(o_stream_geofence()).fetchall())
    assert got == want
    assert len(got) > 0
    fence_ids = {f for _, f, _, _ in got}
    assert len(fence_ids) >= 3   # several fences fire


def test_overlapping_fences_double_alert(spark):
    """NYC(0) r=12 and London(1)/Paris(4) overlap: one event position
    inside both London and Paris circles must count in each."""
    from gdal_spark.streaming.events import GEOFENCES
    # verify the fixture really has overlapping fences
    (_, la1, lo1, r1), (_, la4, lo4, r4) = GEOFENCES[1], GEOFENCES[4]
    d2 = (la1 - la4) ** 2 + (lo1 - lo4) ** 2
    assert d2 ** 0.5 < r1 + r4
