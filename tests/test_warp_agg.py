"""Warp aggregate kernels: scatter-weight tiling, sum preservation,
average/mode semantics on hand-computed windows."""

from pyspark.sql import functions as F

from gdal_spark.operators import warp_agg

R = 2.5


def _src(spark):
    # 10x10 source, v = sy*10 + sx (all distinct) -> dst 4x4
    return spark.range(100).select(
        (F.col("id") / 10).cast("long").alias("sy"),
        (F.col("id") % 10).alias("sx"),
        F.col("id").cast("double").alias("v"))


def test_weights_tile_per_source_pixel(spark):
    c = warp_agg.scatter_contributions(_src(spark), R)
    # every source pixel's contributions must sum to exactly 1.0
    # (the dst windows tile the plane), and each touches <= 4 cells
    per = (c.groupBy("v").agg(F.sum("w").alias("tw"),
                              F.count("*").alias("k")).collect())
    assert len(per) == 100
    for r in per:
        assert r["tw"] == 1.0
        assert 1 <= r["k"] <= 4


def test_sum_preserving(spark):
    src = _src(spark)
    c = warp_agg.scatter_contributions(src, R)
    total_src = src.agg(F.sum("v")).collect()[0][0]
    total_dst = warp_agg.warp_sum(c).agg(F.sum("v")).collect()[0][0]
    assert total_dst == total_src  # exact: dyadic weights


def test_average_window_hand_computed(spark):
    c = warp_agg.scatter_contributions(_src(spark), R)
    got = {(r["dy"], r["dx"]): r["v"]
           for r in warp_agg.warp_average(c).collect()}
    # dst (0,0) covers [0,2.5)x[0,2.5): cols 0,1 w=1, col 2 w=.5 (same
    # rows); v = 10*sy+sx
    w = {(sy, sx): (1.0 if sx < 2 else 0.5) * (1.0 if sy < 2 else 0.5)
         for sy in range(3) for sx in range(3)}
    num = sum(wt * (10 * sy + sx) for (sy, sx), wt in w.items())
    den = sum(w.values())
    assert got[(0, 0)] == num / den


def test_mode_ties_min(spark):
    # two values with equal coverage in a window -> smaller value wins
    rows = [(0, 0, 7.0), (0, 1, 7.0), (1, 0, 3.0), (1, 1, 3.0)]
    src = spark.createDataFrame(rows, "sy long, sx long, v double")
    c = warp_agg.scatter_contributions(src, 2.0)
    got = warp_agg.warp_mode(c).collect()
    assert len(got) == 1 and got[0]["v"] == 3.0


def test_scatter_weight_tiling_property(spark):
    """Property: for any decimation factor, every source pixel's
    contribution weights tile its unit footprint (sum == 1 within
    float eps; exactly 1 for dyadic factors)."""
    import math
    for r, exact in ((2.5, True), (2.0, True), (1.25, True),
                     (3.0, False), (1.7, False), (5.3, False)):
        src = spark.range(40).select(
            (F.col("id") / 8).cast("long").alias("sy"),
            (F.col("id") % 8).alias("sx"),
            F.col("id").cast("double").alias("v"))
        c = warp_agg.scatter_contributions(src, r)
        for row in c.groupBy("v").agg(F.sum("w").alias("tw")).collect():
            if exact:
                assert row["tw"] == 1.0, (r, row)
            else:
                assert math.isclose(row["tw"], 1.0, rel_tol=1e-12), (r, row)
