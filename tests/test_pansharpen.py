"""Pansharpen (alg/gdalpansharpen.cpp): the separable phase-map cubic
upsample vs a direct numpy convolution twin, kernel invariants
(partition of unity -> constants preserved), and the Brovey identity
(equal bands => output == pan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.pansharpen import (_cubic_w, phase_map,
                                             upsample_cubic,
                                             weighted_brovey)

SF = "/root/testdata/sf0.001"
R, W, H = 4, 16, 16


def _up_ref(a: np.ndarray) -> np.ndarray:
    """Direct cubic upsample: per dst pixel, 4 clamped taps per axis."""
    h, w = a.shape
    out = np.zeros((h * R, w * R))
    for oy in range(h * R):
        sy = (oy + 0.5) / R - 0.5
        by = int(np.floor(sy))
        fy = sy - by
        for ox in range(w * R):
            sx = (ox + 0.5) / R - 0.5
            bx = int(np.floor(sx))
            fx = sx - bx
            v = 0.0
            for ky in range(4):
                wy = _cubic_w(abs(fy - (ky - 1)))
                ty = min(max(by - 1 + ky, 0), h - 1)
                hv = 0.0
                for kx in range(4):
                    wx = _cubic_w(abs(fx - (kx - 1)))
                    tx = min(max(bx - 1 + kx, 0), w - 1)
                    hv += wx * a[ty, tx]
                v += wy * hv
            out[oy, ox] = v
    return out


def test_phase_weights_partition_unity():
    for row in phase_map(R):
        assert abs(sum(row[5:]) - 1.0) < 1e-12


def test_upsample_matches_direct_convolution(spark):
    a = np.array([[float((x * 17 + y * 23) % 89 + 10)
                   for x in range(W)] for y in range(H)])
    ms = spark.createDataFrame(
        [(0, y, x, float(a[y, x])) for y in range(H) for x in range(W)],
        "band int, my int, mx int, val double")
    got = {(r.py, r.px): r.val
           for r in upsample_cubic(ms, R, W, H).collect()}
    want = _up_ref(a)
    assert len(got) == H * R * W * R
    for (py, px), v in got.items():
        assert v == pytest.approx(want[py, px], abs=1e-9), (py, px)


def test_constant_field_preserved(spark):
    ms = spark.createDataFrame(
        [(0, y, x, 7.5) for y in range(H) for x in range(W)],
        "band int, my int, mx int, val double")
    vals = [r.val for r in upsample_cubic(ms, R, W, H).collect()]
    assert all(v == pytest.approx(7.5, abs=1e-12) for v in vals)


def test_brovey_equal_bands_yield_pan(spark):
    from gdal_spark.queries import PS_MS_SQL, PS_PAN_SQL
    up = spark.range(3 * 8 * 8).select(
        (F.col("id") / 64).cast("int").alias("band"),
        ((F.col("id") / 8) % 8).cast("int").alias("py"),
        (F.col("id") % 8).cast("int").alias("px"),
        F.lit(5.0).alias("val"))
    pan = spark.range(64).select(
        (F.col("id") / 8).cast("int").alias("py"),
        (F.col("id") % 8).cast("int").alias("px"),
        (F.col("id") % 11 + 1.0).alias("pan"))
    out = weighted_brovey(pan, up, [1 / 3] * 3)
    rows = out.join(pan, ["py", "px"]).collect()
    assert len(rows) == 192
    for r in rows:
        assert r.sharp == pytest.approx(r.pan, rel=1e-12)


def test_query_oracle_parity(spark):
    import duckdb

    from gdal_spark.queries import o_pansharpen, q_pansharpen
    got = {(r.band, r.py, r.px): r.sharp
           for r in q_pansharpen(spark, SF).collect()}
    want = {(r[0], r[1], r[2]): r[3]
            for r in duckdb.sql(o_pansharpen()).fetchall()}
    assert got == want
