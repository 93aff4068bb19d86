"""hist_equalize vs a direct transliteration of gdalenhance.cpp's
ComputeEqualizationLUTs + EnhancerCallback, plus the equalization
property (output CDF flattens)."""

import numpy as np

from gdal_spark.queries import HEQ_H, HEQ_W

SF = "/root/testdata/sf0.001"


def _fixture_vals():
    out = []
    for py in range(HEQ_H):
        for px in range(HEQ_W):
            u = (px * 53 + py * 29) % 256
            out.append((py, px, (u * u) // 256))
    return out


def _ref_lut(vals):
    hist = np.zeros(256, dtype=np.int64)
    for _, _, v in vals:
        hist[v] += 1
    hist[0] = 0
    hist[255] = 0
    cum = np.zeros(256, dtype=np.int64)
    total = 0
    for i in range(256):
        cum[i] = total + hist[i] // 2
        total += hist[i]
    lut = np.clip((cum * 256) // total, 0, 255).astype(int)
    return lut


def test_equalize_matches_reference_lut(spark):
    from gdal_spark.queries import q_hist_equalize
    vals = _fixture_vals()
    lut = _ref_lut(vals)
    got = {(r.py, r.px): (r.val, r.eq)
           for r in q_hist_equalize(spark, SF).collect()}
    assert len(got) == len(vals)
    for py, px, v in vals:
        gv, ge = got[(py, px)]
        assert gv == v
        assert ge == lut[v], (py, px, v, ge, lut[v])


def test_output_cdf_flattens(spark):
    """Equalized values spread across the range: the output histogram's
    max-bucket share must drop vs the skewed input (quadratic-dark)."""
    from gdal_spark.queries import q_hist_equalize
    import pandas as pd
    df = q_hist_equalize(spark, SF).toPandas()
    # input concentrated in the dark half; output median near mid-range
    assert df["val"].median() < 80
    assert 100 <= df["eq"].median() <= 160
    # monotone non-decreasing mapping ("eq" shadows pandas' .eq method)
    m = df.groupby("val")["eq"].first().sort_index()
    assert (m.diff().dropna() >= 0).all()
