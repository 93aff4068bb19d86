"""8-connected CCL (GDALPolygonize 8CONNECTED=8) vs the 4-connected
default: diagonal chains merge, straddling tile borders included."""

import pytest

from gdal_spark.operators.polygonize import components, polygonize


@pytest.fixture(scope="module")
def diag_mask(spark):
    # a diagonal staircase crossing the 32-tile border at (31,31)->(32,32),
    # plus an isolated pixel: 4-conn sees every stair pixel as its own
    # component; 8-conn sees one staircase + the isolated pixel
    pts = [(i, i) for i in range(28, 37)] + [(0, 5)]
    return spark.createDataFrame(pts, "py long, px long")


def test_8conn_merges_diagonals(spark, diag_mask):
    four = components(polygonize(diag_mask, width=64)).collect()
    eight = components(polygonize(diag_mask, width=64,
                                  connect8=True)).collect()
    assert len(four) == 10          # each stair pixel separate
    assert len(eight) == 2          # staircase + isolated
    sizes = sorted(r["n_pixels"] for r in eight)
    assert sizes == [1, 9]
    # the staircase component keeps the min-global-pixel-id label
    stair = [r for r in eight if r["n_pixels"] == 9][0]
    assert stair["label"] == 28 * 64 + 28
    assert (stair["ymin"], stair["xmin"], stair["ymax"], stair["xmax"]) \
        == (28, 28, 36, 36)


def test_8conn_antidiagonal_cross_tile(spark):
    # anti-diagonal pair straddling the vertical tile border px 31|32
    pts = [(10, 32), (11, 31)]
    df = spark.createDataFrame(pts, "py long, px long")
    four = components(polygonize(df, width=64)).collect()
    eight = components(polygonize(df, width=64, connect8=True)).collect()
    assert len(four) == 2
    assert len(eight) == 1
