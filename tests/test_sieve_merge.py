"""Sieve merge-into-largest-neighbor: chain walk, cycles, isolated
smalls — hand-computed expectations on a synthetic valued raster
(alg/gdalsievefilter.cpp:300-640 semantics)."""

from pyspark.sql import functions as F

from gdal_spark.operators import polygonize as poly_op

W = 16
THR = 5

# (py, px, v): A big(10px,v=1); C small(3px,v=3) adj A+B; B small(2px,
# v=2) adj C only -> chain B->C->A; D/E 2-cycle of smalls; F isolated.
ROWS = (
    [(0, x, 1) for x in range(10)]          # A: big
    + [(1, 0, 3), (1, 1, 3), (1, 2, 3)]     # C: small, adj A and B
    + [(2, 0, 2), (2, 1, 2)]                # B: small, adj C only
    + [(5, 0, 4), (5, 1, 4)]                # D: small, adj E only
    + [(6, 0, 5), (6, 1, 5)]                # E: small, adj D only
    + [(10, 10, 6)]                          # F: isolated small
)

EXPECTED = {(py, px): (1 if v in (2, 3) else v) for py, px, v in ROWS}


def _run(spark, **kw):
    df = spark.createDataFrame(ROWS, "py long, px long, v long")
    labels = poly_op.polygonize(df, W, tile=4, value_col="v")
    out = poly_op.sieve_merge(labels, THR, "v", **kw)
    return {(r["py"], r["px"]): r["v"] for r in out.collect()}


def test_chain_cycle_isolated(spark):
    got = _run(spark)
    assert got == EXPECTED


def test_distributed_pointer_doubling_matches(spark):
    # force the distributed fallback (driver_poly_limit=0) — must give
    # the identical result as the driver-side walk
    got = _run(spark, driver_poly_limit=0)
    assert got == EXPECTED


def test_valued_ccl_separates_classes(spark):
    # two adjacent same-position runs with different values must NOT
    # union; same value must union across the tile boundary (tile=4)
    rows = [(0, x, 7) for x in range(9)] + [(1, x, 8) for x in range(9)]
    df = spark.createDataFrame(rows, "py long, px long, v long")
    labels = poly_op.polygonize(df, W, tile=4, value_col="v")
    n = labels.select("label").distinct().count()
    assert n == 2
