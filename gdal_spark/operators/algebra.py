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


# ------------------------------------------------------------------------
# polygon × polygon overlay GEOMETRY (ogrlayer.cpp:5386-5803): actual
# intersection pieces, not just (id, id) tags.
# ------------------------------------------------------------------------

def convex_pieces_rows():
    """Every polygon as signed CONVEX pieces: its convex `parts`
    decomposition with sign +1 and its convex holes with sign -1, so
    area(A ∩ B) = Σ sign_a·sign_b·area(piece_a ∩ piece_b) — the
    inclusion–exclusion that turns arbitrary (holed, non-convex)
    polygon overlay into convex×convex Sutherland–Hodgman clips."""
    from gdal_spark.fixtures import ZONES
    from gdal_spark.geo.geom import polygon_bbox
    rows = []
    for z in ZONES:
        for pid, ring in enumerate(z["parts"]):
            xmin, ymin, xmax, ymax = polygon_bbox([ring])
            rows.append((z["zone_fid"], pid, 1,
                         [float(c) for xy in ring for c in xy],
                         xmin, ymin, xmax, ymax))
        for hid, ring in enumerate(z["holes"]):
            xmin, ymin, xmax, ymax = polygon_bbox([ring])
            rows.append((z["zone_fid"], 100 + hid, -1,
                         [float(c) for xy in ring for c in xy],
                         xmin, ymin, xmax, ymax))
    return rows

PIECES_SCHEMA = ("zone_fid int, piece_id int, sign int, ring array<double>, "
                 "xmin double, ymin double, xmax double, ymax double")


def intersection_pieces(spark: SparkSession) -> DataFrame:
    """Overlay Intersection with real geometry: for every bbox-
    overlapping polygon pair (fid_a < fid_b), clip each signed convex
    piece pair with Sutherland–Hodgman (geo/geom.clip_convex) and fold
    the signed piece areas → (fid_a, fid_b, n_pieces, inter_area).

    Distributed shape: the piece table is tiny here (fixture zones) but
    the plan is the scale one — bbox equi-prefilter join (a real
    deployment joins on a cell cover instead of the raw bbox cross),
    mapInPandas numpy clip kernel per candidate piece pair (rows are
    geometry PAIRS — coarse-grained work per row, same pattern as the
    PIP refine UDF), then a per-pair ORDERED fold of the signed areas
    (sort_array over (piece_a, piece_b) — float sums are
    order-dependent, so the fold order is pinned to match the oracle
    twin; the per-pair piece count is bounded by the two decomposition
    sizes, never by the data)."""
    import pandas as pd

    from gdal_spark.geo.geom import clip_convex, ring_signed_area

    # repartition(1): the piece table is feature-sized; without it the
    # non-equi join plans as a CartesianProduct over the default 32×32
    # partition grid — 1024 near-empty tasks (~20 s of pure task
    # launch; coalesce(1) keeps the slow parent layout, measured 10 s
    # vs 0.6 s). At data scale the big side would be a real table and
    # the join a cell-cover equi-join instead.
    pieces = spark.createDataFrame(
        convex_pieces_rows(), PIECES_SCHEMA).repartition(1)
    a, b = pieces.alias("a"), pieces.alias("b")
    cand = (a.join(b, (F.col("a.zone_fid") < F.col("b.zone_fid"))
                   & (F.col("a.xmin") <= F.col("b.xmax"))
                   & (F.col("a.xmax") >= F.col("b.xmin"))
                   & (F.col("a.ymin") <= F.col("b.ymax"))
                   & (F.col("a.ymax") >= F.col("b.ymin")))
            .select(F.col("a.zone_fid").alias("fid_a"),
                    F.col("b.zone_fid").alias("fid_b"),
                    F.col("a.piece_id").alias("pa"),
                    F.col("b.piece_id").alias("pb"),
                    (F.col("a.sign") * F.col("b.sign")).alias("sign"),
                    F.col("a.ring").alias("ring_a"),
                    F.col("b.ring").alias("ring_b")))

    def _clip(batches):
        import numpy as np
        for pdf in batches:
            areas = []
            for ra, rb in zip(pdf["ring_a"], pdf["ring_b"]):
                sa = np.asarray(ra, dtype=np.float64).reshape(-1, 2)
                sb = np.asarray(rb, dtype=np.float64).reshape(-1, 2)
                areas.append(ring_signed_area(clip_convex(sa, sb)))
            yield pd.DataFrame({
                "fid_a": pdf["fid_a"], "fid_b": pdf["fid_b"],
                "pa": pdf["pa"], "pb": pdf["pb"], "sign": pdf["sign"],
                "area": areas})

    clipped = cand.mapInPandas(
        _clip, "fid_a int, fid_b int, pa int, pb int, sign int, area double")
    folded = (clipped
              .groupBy("fid_a", "fid_b")
              .agg(F.sort_array(F.collect_list(F.struct(
                  "pa", "pb", (F.col("sign") * F.col("area")).alias("sa"),
                  "area"))).alias("xs")))
    total = F.aggregate(F.col("xs"), F.lit(0.0), lambda acc, x: acc + x["sa"])
    npieces = F.aggregate(
        F.col("xs"), F.lit(0),
        lambda acc, x: acc + F.when(x["area"] > 0.0, 1).otherwise(0))
    return folded.select("fid_a", "fid_b", npieces.alias("n_pieces"),
                         total.alias("inter_area"))


def intersection_pieces_twin() -> list[tuple[int, int, int, float]]:
    """Driver-side oracle twin: the SAME kernels over the SAME fixture
    in the SAME (pa, pb) fold order — generates the VALUES oracle for
    the driver gate (the overlay inputs are fixture constants, so the
    oracle needs no table access)."""
    import numpy as np

    from gdal_spark.geo.geom import clip_convex, ring_signed_area

    rows = convex_pieces_rows()
    by_fid: dict[int, list] = {}
    for fid, pid, sign, flat, xmin, ymin, xmax, ymax in rows:
        by_fid.setdefault(fid, []).append(
            (pid, sign, np.asarray(flat, dtype=np.float64).reshape(-1, 2),
             (xmin, ymin, xmax, ymax)))
    out = []
    fids = sorted(by_fid)
    for ia, fa in enumerate(fids):
        for fb in fids[ia + 1:]:
            entries = []
            for pa, sa_, ra, ba in by_fid[fa]:
                for pb, sb_, rb, bb in by_fid[fb]:
                    if (ba[0] <= bb[2] and ba[2] >= bb[0]
                            and ba[1] <= bb[3] and ba[3] >= bb[1]):
                        area = ring_signed_area(clip_convex(ra, rb))
                        entries.append((pa, pb, sa_ * sb_ * area, area))
            if not entries:
                continue
            entries.sort()
            total = 0.0
            n_pieces = 0
            for _, _, sa_area, area in entries:
                total += sa_area
                if area > 0.0:
                    n_pieces += 1
            out.append((fa, fb, n_pieces, total))
    return out
