"""Reference-parity goldens: run OUR operators on the reference test
suite's OWN fixtures and assert the reference's published expectations.

The oracle gate (tools/run_gate.py) proves Spark ≡ DuckDB on the same
formula — it cannot prove the formula matches the REFERENCE (the round-2
Horn y-sign episode: both engines shared the bug, the gate stayed
green). These tests close that loop for the sieve filter: inputs are
the grids from ``autotest/alg/data/sieve_src.grd`` /
``unmergeable.grd`` / ``sieve_2634.grd`` and the inline fixtures of
``autotest/alg/sieve.py`` (test_sieve_7/8), expectations are the
Checksum() values pinned there (364 / 370 / 451 / 98 / 42 / 0) plus
test_sieve_7's expected full array — computed with our from-scratch
``gdal_checksum`` twin (operators/rasterize.py:234).

Reference semantics exercised end-to-end (alg/gdalsievefilter.cpp):
merge-into-LARGEST-neighbor (not removal), chain-walk through small
neighbors to the first >= threshold polygon (":472-540 fix-up pass"),
cycles of smalls stay unmerged, isolated smalls stay, nodata (masked)
pixels keep their value and never count as neighbors
(GPMaskImageData's GP_NODATA_MARKER), 4- vs 8-connectedness applying
to BOTH the component enumerator and the neighbor scan.

Tie-break parity: equal-size biggest-neighbor ties follow the
reference's raster-scan encounter order exactly (CompareNeighbour
keeps the FIRST seen of equal sizes, gdalsievefilter.cpp:118-126;
comparison order up / up-left / up-right / left per scan pixel,
:412-438) via sieve_merge(width=...) → adjacency_events. The
"unmergeable" fixture is the stress case: nearly every polygon is
1 px, so the biggest-neighbor choice is tie-dominated — its golden
(451) only reproduces under the exact encounter-order rule.
"""

import numpy as np
import pytest

from gdal_spark.operators.polygonize import polygonize, sieve_merge
from gdal_spark.operators.rasterize import gdal_checksum

# autotest/alg/data/sieve_src.grd (ncols 5, nrows 7; the NODATA_value
# 132 header is irrelevant in tests 1-2: SieveFilter is called with a
# NULL mask, so every pixel is valid and 132 is an ordinary class).
SIEVE_SRC = """
107 123 132 115 132
115 132 132 123 123
115 132 140 132 123
148 132 123 123 123
156 156 156 140 132
156 100 156 101 102
156 156 156 103 103
"""

# autotest/alg/data/unmergeable.grd (all polygons below threshold
# except the two-pixel 25 25 run — the "unmergeable" stress case).
UNMERGEABLE = """
10 11 12 13 14
15 16 17 18 19
20 21 22 23 24
25 25 26 27 28
29 30 31 32 33
34 35 36 37 38
39 40 41 42 43
"""

# autotest/alg/data/sieve_2634.grd (bug #2634 reduction).
SIEVE_2634 = """
0 0 0 0 0 0 0 0 0 0
0 0 0 0 0 0 0 0 0 0
0 0 0 0 0 0 0 0 0 0
0 0 0 255 0 0 0 255 0 0
0 0 255 255 255 255 255 255 255 0
0 0 0 255 0 0 0 255 0 0
0 0 0 0 0 0 0 0 0 0
0 0 0 0 0 0 0 0 0 0
"""

# autotest/alg/sieve.py test_sieve_7 inline fixture (NODATA_value 0,
# sieved with the nodata mask, threshold 4).
SIEVE_7 = """
0 0 0 0 0 0 0
0 1 1 1 1 1 1
0 1 0 0 1 1 1
0 1 0 2 2 2 1
0 1 1 2 1 2 1
0 1 1 2 2 2 1
0 1 1 1 1 1 1
"""

SIEVE_7_EXPECTED = """
0 0 0 0 0 0 0
0 1 1 1 1 1 1
0 1 0 0 1 1 1
0 1 0 2 2 2 1
0 1 1 2 2 2 1
0 1 1 2 2 2 1
0 1 1 1 1 1 1
"""

# autotest/alg/sieve.py test_sieve_8 inline fixture (no nodata: the
# all-valid mask; every non-zero polygon is < 4 px and chain-walks to
# the background 0 polygon — "propagation in our search of biggest
# neighbour").
SIEVE_8 = """
0 0 0 0 0 0 0
0 5 5 0 0 0 0
0 5 2 3 4 0 0
0 0 8 1 5 0 0
0 0 7 6 5 9 0
0 0 0 0 9 9 0
0 0 0 0 0 0 0
"""


def _grid(text: str) -> np.ndarray:
    return np.array([[int(t) for t in line.split()]
                     for line in text.strip().splitlines()], dtype=np.int64)


def _sieve(spark, grid: np.ndarray, threshold: int, connect8: bool,
           nodata: int | None = None) -> np.ndarray:
    """Run grid → polygonize → sieve_merge → rewritten grid, GDAL
    call-shape: masked (nodata) pixels are excluded from labeling and
    keep their original value in the output."""
    h, w = grid.shape
    rows = [(int(y), int(x), int(grid[y, x]))
            for y in range(h) for x in range(w)
            if nodata is None or grid[y, x] != nodata]
    df = spark.createDataFrame(rows, "py long, px long, v long")
    labels = polygonize(df, w, tile=4, value_col="v", connect8=connect8)
    out = sieve_merge(labels, threshold, "v", connect8=connect8, width=w)
    res = grid.copy()
    for r in out.collect():
        res[r["py"], r["px"]] = r["v"]
    return res


def test_sieve_autotest_1_default(spark):
    """autotest/alg/sieve.py test_sieve_1: threshold 2, 4-connected."""
    out = _sieve(spark, _grid(SIEVE_SRC), 2, connect8=False)
    assert gdal_checksum(out) == 364


def test_sieve_autotest_2_eight_connected(spark):
    """autotest/alg/sieve.py test_sieve_2: threshold 2, 8-connected."""
    out = _sieve(spark, _grid(SIEVE_SRC), 2, connect8=True)
    assert gdal_checksum(out) == 370


def test_sieve_autotest_3_unmergeable(spark):
    """autotest/alg/sieve.py test_sieve_3: every polygon except the
    25-pair is 1 px; chains walk toward it or fail. Checksum 451 (the
    post-2010 expected value in the reference test)."""
    out = _sieve(spark, _grid(UNMERGEABLE), 2, connect8=True)
    assert gdal_checksum(out) == 451


def test_sieve_autotest_4_bug2634(spark):
    """autotest/alg/sieve.py test_sieve_4: threshold 2, 4-connected."""
    out = _sieve(spark, _grid(SIEVE_2634), 2, connect8=False)
    assert gdal_checksum(out) == 98


def test_sieve_autotest_7_nodata_mask(spark):
    """autotest/alg/sieve.py test_sieve_7: nodata 0 masked out,
    threshold 4 — the 1 px '1' inside the 2-ring merges into the 2
    polygon; the 3-px interior nodata hole stays nodata. Asserts the
    full expected array printed in the reference test AND its
    checksum."""
    out = _sieve(spark, _grid(SIEVE_7), 4, connect8=False, nodata=0)
    np.testing.assert_array_equal(out, _grid(SIEVE_7_EXPECTED))
    assert gdal_checksum(out) == 42


def test_sieve_autotest_8_chain_propagation(spark):
    """autotest/alg/sieve.py test_sieve_8: all non-zero polygons are
    < 4 px and must chain through each other into the background —
    output is all zeros (checksum 0)."""
    out = _sieve(spark, _grid(SIEVE_8), 4, connect8=False)
    assert gdal_checksum(out) == 0
    assert not out.any()


def test_sieve_autotest_all_masked(spark):
    """autotest/alg/sieve.py test_sieve_all_masked: every pixel masked
    -> output identical to input."""
    grid = np.ones((10, 10), dtype=np.int64)
    out = _sieve(spark, grid, 4, connect8=False, nodata=1)
    np.testing.assert_array_equal(out, grid)
