"""Median-cut PCT (alg/gdalmediancut.cpp GDALComputeMedianCutPCT):
the numpy split kernel vs hand-computed goldens, box-disjointness /
coverage invariants, the pure-Python oracle twin's independent
agreement, and the distributed query vs its DuckDB oracle."""

import numpy as np
import pytest

from gdal_spark.operators.mediancut import (Box, assign_pct,
                                            compute_median_cut_pct,
                                            median_cut_boxes, palette_entry)

SF = "/root/testdata/sf0.001"


def test_two_color_split_golden():
    """Two populated cells on the red axis: one split at the median,
    both halves shrunk to single cells, palette = cell midpoints."""
    hist = np.zeros((32, 32, 32), dtype=np.int64)
    hist[2, 5, 5] = 10
    hist[20, 5, 5] = 30
    boxes = median_cut_boxes(hist, 2)
    assert len(boxes) == 2
    # new (lower) box prepended: cumulative reaches total/2=20 at bin 2
    # ... wait: bins 2..20, h1[0]=10 at r=2, 10 < 20; r=20 reaches 40.
    # median lands at r=20 but i==first bump doesn't apply; split at 20
    # puts [2..19] (shrunk to cell 2) in the NEW box? No: new = bins
    # strictly below i=20 -> [2..19] shrunk to r=2; old = [20..20].
    low, high = boxes[0], boxes[1]
    assert (low.rmin, low.rmax, low.total) == (2, 2, 10)
    assert (high.rmin, high.rmax, high.total) == (20, 20, 30)
    assert palette_entry(low) == ((2 + 2) * 8 // 2, 5 * 8, 5 * 8)
    assert palette_entry(high) == (20 * 8, 5 * 8, 5 * 8)


def test_axis_tiebreak_red_wins():
    """Equal extents on r and g: the reference splits red first."""
    hist = np.zeros((32, 32, 32), dtype=np.int64)
    hist[0, 0, 0] = 1
    hist[4, 4, 0] = 1
    boxes = median_cut_boxes(hist, 2)
    # split must have been on red: each box has a single red bin
    assert all(b.rmin == b.rmax for b in boxes)


def test_boxes_disjoint_and_cover_populated_cells():
    rng = np.random.RandomState(7)
    hist = np.zeros((32, 32, 32), dtype=np.int64)
    idx = rng.randint(0, 32, size=(300, 3))
    for r, g, b in idx:
        hist[r, g, b] += int(rng.randint(1, 50))
    boxes = median_cut_boxes(hist, 16)
    assert 1 < len(boxes) <= 16
    for r, g, b in zip(*np.nonzero(hist)):
        owners = [i for i, bx in enumerate(boxes)
                  if bx.rmin <= r <= bx.rmax and bx.gmin <= g <= bx.gmax
                  and bx.bmin <= b <= bx.bmax]
        assert len(owners) == 1, (r, g, b, owners)
    # totals partition the histogram mass
    assert sum(bx.total for bx in boxes) == int(hist.sum())


def test_twin_matches_operator_on_fixture():
    """The oracle's sparse-dict twin and the operator's dense-numpy
    kernel must produce the identical final box list on the shared
    synthetic image."""
    from gdal_spark.queries import (MC_COLORS, MC_H, MC_W,
                                    _median_cut_twin)
    hist = np.zeros((32, 32, 32), dtype=np.int64)
    for py in range(MC_H):
        for px in range(MC_W):
            r = (px // 16 * 37 + (px * py) % 11) % 256
            g = (py // 16 * 53 + (px * 7 + py) % 13) % 256
            b = ((px + py) // 16 * 29 + (px + py * 3) % 7) % 256
            hist[r >> 3, g >> 3, b >> 3] += 1
    ours = [(b.rmin, b.rmax, b.gmin, b.gmax, b.bmin, b.bmax, b.total)
            for b in median_cut_boxes(hist, MC_COLORS)]
    assert ours == _median_cut_twin()


def test_query_matches_duckdb_oracle(spark):
    import duckdb

    from gdal_spark.queries import o_median_cut, q_median_cut
    got = [(r.color_id, r.pr, r.pg, r.pb, r.n_pix)
           for r in q_median_cut(spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(o_median_cut()).fetchall()]
    assert sorted(got) == sorted(want)
    assert sum(n for *_, n in got) == 96 * 96


def test_assign_pct_every_pixel_assigned(spark):
    from gdal_spark.queries import MC_COLORS, _mc_rgb_df
    rgb = _mc_rgb_df(spark)
    boxes, palette = compute_median_cut_pct(rgb, MC_COLORS)
    asg = assign_pct(rgb, boxes)
    assert asg.filter("color_id IS NULL").count() == 0
    assert len(palette) == len(boxes) <= MC_COLORS
