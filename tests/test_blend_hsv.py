"""hsv-value blend vs a float32 transliteration of the reference
(gdalalg_raster_blend.cpp rgb_to_hs / hsv_to_rgb / patch_value_line):
the engine's float64 form must stay within 1 count of the reference's
float32 math, and match it exactly on the overwhelming majority."""

import numpy as np

from gdal_spark.queries import BLEND_H, BLEND_W

SF = "/root/testdata/sf0.001"


def _ref_f32(px, py):
    f32 = np.float32
    r = (px * 3 + py * 5) % 256
    g = (px * 7 + py * 2) % 256
    b = (px + py * 11) % 256
    v = (px * 13 + py) % 256
    minc, maxc = min(r, g, b), max(r, g, b)
    d = maxc - minc
    s = f32(d) / f32(max(1, maxc))
    m6 = f32(1.0) if d == 0 else f32(6.0) * f32(d)
    if maxc == b:
        h = f32(4.0 / 6.0) + f32(r - g) / m6
    elif maxc == g:
        h = f32(2.0 / 6.0) + f32(b - r) / m6
    else:
        t = f32(g - b) / m6
        h = t + f32(1.0) if t < 0 else t
    i = int(f32(6.0) * h)
    f = f32(6.0) * h - f32(i)
    p = int(f32(v) * (f32(1.0) - s) + f32(0.5))
    q = int(f32(v) * (f32(1.0) - s * f) + f32(0.5))
    t = int(f32(v) * (f32(1.0) - s * (f32(1.0) - f)) + f32(0.5))
    ch = lambda a0, a1, a2, a3, a4, a5: (a0, a1, a2, a3, a4, a5)[min(i, 5)]
    return (ch(v, q, p, p, t, v), ch(t, v, v, q, p, p),
            ch(p, p, t, v, v, q))


def test_hsv_blend_within_one_count_of_float32_reference(spark):
    from gdal_spark.queries import q_blend_hsv
    rows = q_blend_hsv(spark, SF).collect()
    assert len(rows) == BLEND_W * BLEND_H
    exact = 0
    for r in rows:
        want = _ref_f32(r.px, r.py)
        got = (r.out_r, r.out_g, r.out_b)
        assert all(abs(a - b) <= 1 for a, b in zip(got, want)), \
            (r.py, r.px, got, want)
        exact += got == want
    assert exact / len(rows) > 0.99


def test_gray_value_becomes_hsv_value(spark):
    """max(out RGB) must equal the overlay gray (the value channel is
    replaced; hue/saturation preserved) up to rounding."""
    from gdal_spark.queries import q_blend_hsv
    for r in q_blend_hsv(spark, SF).collect()[::17]:
        v = (r.px * 13 + r.py) % 256
        assert abs(max(r.out_r, r.out_g, r.out_b) - v) <= 1, r
