"""raster_blend vs a direct Python transliteration of the reference's
*_Generic kernels (apps/gdalalg_raster_blend.cpp): MulScale255 /
DivScale255 byte discipline, opacity-scaled overlay alpha,
premultiplication, and the four Mapserver component formulas."""

from gdal_spark.queries import BLEND_H, BLEND_OPACITY, BLEND_W

SF = "/root/testdata/sf0.001"


def _mul(a, b):
    return (a * b + 255) // 256


def _div255(a, b):
    if a == 0:
        return 0
    if b == 0:
        return 255
    return ((a * 255) // b) & 0xFF   # release-mode GByte cast


def _ref(px, py):
    b = {"r": (px * 3 + py * 5) % 256, "g": (px * 7 + py * 2) % 256,
         "b": (px + py * 11) % 256, "a": 255 - (px + py) % 128}
    o = {"r": (px * 13 + py) % 256, "g": (px * 5 + py * 7) % 256,
         "b": (px * 11 + py * 3) % 256, "a": (px * py) % 256}
    oa = _mul(o["a"], BLEND_OPACITY)
    a = b["a"]
    fa = oa + a - _mul(oa, a)
    out = {"fin_a": fa}
    for c in "rgb":
        C = b[c] if a == 255 else _mul(b[c], a)
        OC = o[c] if oa == 255 else _mul(o[c], oa)
        out[f"mul_{c}"] = _div255(
            _mul(C, OC) + _mul(C, 255 - oa) + _mul(OC, 255 - a), fa)
        out[f"scr_{c}"] = _div255(C + OC - _mul(C, OC), fa)
        out[f"drk_{c}"] = _div255(
            min(_mul(OC, a), _mul(C, oa))
            + _mul(C, 255 - oa) + _mul(OC, 255 - a), fa)
        out[f"lgt_{c}"] = _div255(
            max(_mul(OC, a), _mul(C, oa))
            + _mul(C, 255 - oa) + _mul(OC, 255 - a), fa)
    return out


def test_blend_matches_reference_bytes(spark):
    from gdal_spark.queries import q_raster_blend
    rows = q_raster_blend(spark, SF).collect()
    assert len(rows) == BLEND_W * BLEND_H
    for r in rows[::23] + rows[:3]:
        want = _ref(r.px, r.py)
        for k, v in want.items():
            assert r[k] == v, (r.py, r.px, k, r[k], v)


def test_blend_ranges(spark):
    from gdal_spark.queries import q_raster_blend
    import pandas as pd
    df = q_raster_blend(spark, SF).toPandas()
    for col in df.columns:
        if col in ("py", "px"):
            continue
        assert df[col].between(0, 255).all(), col
    # screen >= multiply and lighten >= darken hold in exact
    # Porter-Duff math; the reference's per-term ceil rounding
    # (multiply sums 3 MulScale255 terms, screen 1) can undershoot by
    # a few counts (3 ceil-rounded terms + the DivScale255 floor) —
    # allow that slack, nothing more
    assert (df.scr_r >= df.mul_r - 3).all()
    assert (df.lgt_r >= df.drk_r - 3).all()


def test_gbyte_wrap_is_exercised(spark):
    """The fixture hits the reference's release-mode GByte wrap (a
    ceil-rounded numerator a few counts past the denominator) — the
    documented DivScale255 'just casts' branch."""
    over = 0
    for py in range(64):
        for px in range(64):
            b_a = 255 - (px + py) % 128
            oa = _mul((px * py) % 256, BLEND_OPACITY)
            fa = oa + b_a - _mul(oa, b_a)
            for c, bc, oc in (("g", (px * 7 + py * 2) % 256,
                               (px * 5 + py * 7) % 256),):
                C = bc if b_a == 255 else _mul(bc, b_a)
                OC = oc if oa == 255 else _mul(oc, oa)
                num = (max(_mul(OC, b_a), _mul(C, oa))
                       + _mul(C, 255 - oa) + _mul(OC, 255 - b_a))
                if num and fa and (num * 255) // fa > 255:
                    over += 1
    assert over > 0
