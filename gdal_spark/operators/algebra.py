"""Layer algebra — GDAL's two-layer set operators re-expressed for the
pages(points) × zones(polygons) pair as relational plans over the PIP
join.

Reference semantics (ogr/ogrsf_frmts/generic/ogrlayer.cpp):

- Intersection (:5386) — every intersecting (x, y) pair with both
  sides' attributes → ``sj.pip_join`` (queries.q_pip_join).
- Union (:5804) — intersection pairs + non-intersecting remainders of
  BOTH inputs (null-filled other side).
- Identity (:6771) — input split by method, keeping ALL of input:
  LEFT join shape.
- Update (:7189) — method features patch over input: input rows not
  intersecting method + all method features.
- SymDifference (:6341) — A-only remainders + B-only remainders.
- Clip (:7538) / Erase (:7847) — geometric semi/anti join
  (queries.q_clip / q_erase).

For point inputs the "geometry pieces" degenerate to the point itself
(a point minus / intersected with a polygon is the point or nothing),
so each operator is exactly one distributed join shape — the geometry
bookkeeping GDAL does per feature pair is unnecessary. Every operator
is a composition of the broadcast PIP join + left/anti joins: no new
shuffle beyond the (already map-side) candidate join and the final
aggregation the caller adds.

Output convention: (doc_id nullable, zone_fid nullable) tagged rows —
``side`` ∈ {'both', 'a', 'b'} mirroring mapInput/mapMethod attribute
concatenation (null-filled like OGR's unmatched-field rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.operators import spatial_join as sj


def _pairs(pages: DataFrame, spark: SparkSession) -> DataFrame:
    return sj.pip_join(pages, spark).select("doc_id", "zone_fid")


def _pages_only(pages: DataFrame, pairs: DataFrame) -> DataFrame:
    """Geocoded pages intersecting no zone (the A remainder)."""
    return (pages.filter(F.col("lat").isNotNull()).select("doc_id")
            .join(pairs.select("doc_id").distinct(), "doc_id", "left_anti"))


def _zones_only(pairs: DataFrame, spark: SparkSession) -> DataFrame:
    """Zones containing no page (the B remainder)."""
    z = sj.zones_attr_df(spark).select("zone_fid")
    return z.join(pairs.select("zone_fid").distinct(), "zone_fid", "left_anti")


def union(pages: DataFrame, spark: SparkSession) -> DataFrame:
    """Union: pairs + A-only + B-only (ogrlayer.cpp:5804)."""
    pairs = _pairs(pages, spark)
    both = pairs.select(F.lit("both").alias("side"), "doc_id", "zone_fid")
    a = _pages_only(pages, pairs).select(
        F.lit("a").alias("side"), "doc_id", F.lit(None).cast("int").alias("zone_fid"))
    b = _zones_only(pairs, spark).select(
        F.lit("b").alias("side"), F.lit(None).cast("long").alias("doc_id"), "zone_fid")
    return both.unionByName(a).unionByName(b)


def identity(pages: DataFrame, spark: SparkSession) -> DataFrame:
    """Identity: all of A, split by B where intersecting
    (ogrlayer.cpp:6771) — LEFT join shape."""
    pairs = _pairs(pages, spark)
    return (pages.filter(F.col("lat").isNotNull()).select("doc_id")
            .join(pairs, "doc_id", "left")
            .select("doc_id", "zone_fid"))


def update(pages: DataFrame, spark: SparkSession) -> DataFrame:
    """Update: A rows not touched by B, plus all of B
    (ogrlayer.cpp:7189)."""
    pairs = _pairs(pages, spark)
    a = _pages_only(pages, pairs).select(
        F.lit("a").alias("side"), "doc_id", F.lit(None).cast("int").alias("zone_fid"))
    b = sj.zones_attr_df(spark).select(
        F.lit("b").alias("side"), F.lit(None).cast("long").alias("doc_id"), "zone_fid")
    return a.unionByName(b)


def sym_difference(pages: DataFrame, spark: SparkSession) -> DataFrame:
    """SymDifference: A-only + B-only (ogrlayer.cpp:6341)."""
    pairs = _pairs(pages, spark)
    a = _pages_only(pages, pairs).select(
        F.lit("a").alias("side"), "doc_id", F.lit(None).cast("int").alias("zone_fid"))
    b = _zones_only(pairs, spark).select(
        F.lit("b").alias("side"), F.lit(None).cast("long").alias("doc_id"), "zone_fid")
    return a.unionByName(b)
