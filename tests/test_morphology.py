"""Invariant tests for binary morphology — the set-algebra laws the
cross-engine gate can't see (it proves Spark == DuckDB; these prove
the operators ARE erosion/dilation: anti-extensivity of opening,
extensivity of closing, and the containment chain)."""

# sf0.01, not the usual sf0.001 smoke dir: the thr=1 mask at sf0.001
# has no full-3x3 interior pixel, so erosion would be vacuously empty
SF_GATE = "/root/testdata/sf0.01"


def _sets(spark):
    from pyspark.sql import functions as F

    from gdal_spark.queries import MORPH_THR, PGRID_H, PGRID_W, _mask_df

    m = _mask_df(spark, SF_GATE, MORPH_THR)
    offs = F.explode(F.flatten(F.expr(
        "transform(sequence(-1, 1), dy -> "
        "transform(sequence(-1, 1), dx -> struct(dy, dx)))")))

    def dilate(df):
        return (df.select("py", "px", offs.alias("o"))
                .select((F.col("py") + F.col("o.dy")).alias("py"),
                        (F.col("px") + F.col("o.dx")).alias("px"))
                .filter((F.col("py") >= 0) & (F.col("py") < PGRID_H)
                        & (F.col("px") >= 0) & (F.col("px") < PGRID_W))
                .distinct())

    def erode(df):
        return (df.select("py", "px", offs.alias("o"))
                .select((F.col("py") - F.col("o.dy")).alias("py"),
                        (F.col("px") - F.col("o.dx")).alias("px"))
                .groupBy("py", "px")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") == 9).drop("_n"))

    def tolist(df):
        return {(r.py, r.px) for r in df.collect()}

    mask = tolist(m)
    er = tolist(erode(m))
    dl = tolist(dilate(m))
    op = tolist(dilate(erode(m)))
    cl = tolist(erode(dilate(m)))
    return mask, er, dl, op, cl


def test_morphology_containment_chain(spark):
    """erode ⊆ open ⊆ mask and mask ⊆ close ⊆ dilate (Serra's
    ordering). Closing's extensivity holds for pixels away from the
    raster border only — with out-of-grid treated as background the
    clipped dilation can't supply the off-grid neighbors, the same
    border artifact scipy's binary_closing(border_value=0) documents."""
    from gdal_spark.queries import PGRID_H, PGRID_W
    mask, er, dl, op, cl = _sets(spark)
    assert er <= op <= mask
    assert cl <= dl
    interior = {(y, x) for (y, x) in mask
                if 0 < y < PGRID_H - 1 and 0 < x < PGRID_W - 1}
    assert interior <= cl
    # non-vacuity at the smoke scale: erosion keeps interior pixels
    assert er and dl > mask


def test_morphology_erode_window_rule(spark):
    """Every eroded pixel has its FULL 3x3 window inside the mask;
    every non-eroded mask pixel is missing at least one neighbor."""
    mask, er, _, _, _ = _sets(spark)
    for (y, x) in er:
        assert all((y + dy, x + dx) in mask
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    for (y, x) in mask - er:
        assert any((y + dy, x + dx) not in mask
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1))
