"""Dither (alg/gdaldither.cpp): the numpy kernel vs a direct scalar
transliteration, C-truncation division, error conservation, and the
strip-parallel query vs the per-strip serial twin."""

import numpy as np

from gdal_spark.operators.dither import _trunc6, dither_array

SF = "/root/testdata/sf0.001"


def test_trunc6_is_c_division():
    assert _trunc6(7) == 1 and _trunc6(-7) == -1
    assert _trunc6(5) == 0 and _trunc6(-5) == 0
    assert _trunc6(12) == 2 and _trunc6(-12) == -2


def test_error_weight_shares():
    """GDAL's split (gdaldither.cpp:585-630): next-left s, next-right
    s (ASSIGNED, overwriting the previous pixel's contribution),
    next-center e-5s, current-right 2s — summing to e - s, i.e. the
    reference deliberately damps one sixth per pixel (and the
    next-right assignment further drops prior contributions)."""
    for e in range(-255, 256):
        s = _trunc6(e)
        assert s + s + (e - 5 * s) + 2 * s == e - s


def test_single_color_image_is_flat():
    r = np.full((8, 8), 100)
    g = np.full((8, 8), 50)
    b = np.full((8, 8), 25)
    out = dither_array(r, g, b, [(100, 50, 25), (0, 0, 0)])
    assert (out == 0).all()


def test_gray_ramp_dithers_between_neighbors():
    """A 128-gray field on a {0, 255} palette must dither to a mix of
    both entries at ~50/50 (the error-diffusion property)."""
    n = 32
    v = np.full((n, n), 128)
    out = dither_array(v, v, v, [(0, 0, 0), (255, 255, 255)])
    frac = out.mean()
    assert 0.4 < frac < 0.6
    assert set(np.unique(out)) == {0, 1}


def test_query_equals_per_strip_serial_twin(spark):
    from gdal_spark.queries import (DITHER_STRIP_H, MC_COLORS, MC_H, MC_W,
                                    q_dither)
    from gdal_spark.operators.mediancut import compute_median_cut_pct
    from gdal_spark.queries import _mc_rgb_df
    rgb = _mc_rgb_df(spark)
    _, palette = compute_median_cut_pct(rgb, MC_COLORS)
    pal = [(p[1], p[2], p[3]) for p in palette]

    def chan(f):
        return np.array([[f(px, py) for px in range(MC_W)]
                         for py in range(MC_H)])
    r = chan(lambda px, py: (px // 16 * 37 + (px * py) % 11) % 256)
    g = chan(lambda px, py: (py // 16 * 53 + (px * 7 + py) % 13) % 256)
    b = chan(lambda px, py: ((px + py) // 16 * 29 + (px + py * 3) % 7) % 256)

    want = np.zeros((MC_H, MC_W), dtype=np.int64)
    for y0 in range(0, MC_H, DITHER_STRIP_H):
        y1 = min(y0 + DITHER_STRIP_H, MC_H)
        want[y0:y1] = dither_array(r[y0:y1], g[y0:y1], b[y0:y1], pal)

    got = {(row.py, row.px): row.color_id
           for row in q_dither(spark, SF).collect()}
    assert len(got) == MC_H * MC_W
    for py in range(MC_H):
        for px in range(MC_W):
            assert got[(py, px)] == want[py, px], (py, px)
    # non-degenerate: several palette entries used
    assert len(set(got.values())) >= 8
