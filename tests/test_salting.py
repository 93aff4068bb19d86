"""Skew handling: salted two-phase aggregation must equal the plain
aggregation (north-rule explicit skew story; the hot keys here are the
TLD centroids that concentrate ~a third of all geocoded points on a
handful of tiles)."""

from pyspark.sql import functions as F

from gdal_spark.operators import tiling
from gdal_spark.queries import points_df

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    pts = points_df(spark, SF).filter(F.col("lat").isNotNull())
    tiles = tiling.assign_tiles(pts, 5)
    plain = {(r["tx"], r["ty"]): r["n"] for r in
             tiles.groupBy("tx", "ty").agg(F.count("*").alias("n")).collect()}
    salted = {(r["tx"], r["ty"]): r["n"] for r in
              tiling.salted_agg(
                  tiles, ["tx", "ty"],
                  [F.count("*").alias("n")],
                  merge_exprs=[F.sum("n").alias("n")]).collect()}
    assert salted == plain


def test_hot_tile_exists(spark):
    # the fixture really is skewed: top tile ≫ median tile
    pts = points_df(spark, SF).filter(F.col("lat").isNotNull())
    counts = sorted(
        r["n"] for r in tiling.tile_counts(pts, 5)
        .withColumnRenamed("n_pages", "n").collect())
    assert counts[-1] > 20 * counts[len(counts) // 2]
