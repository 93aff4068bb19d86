"""Pansharpening — weighted Brovey with cubic spectral upsampling.

Reference: alg/gdalpansharpen.cpp GDALPansharpenOperation (weighted
Brovey, Airbus DS Geo SA): each multispectral band is upsampled to the
panchromatic resolution (default resampling GRIORA_Cubic,
gdalpansharpen.cpp:58), a pseudo-panchromatic value is formed as
sum(w_i * ms_i) and every output band is ms_i * (pan / pseudo_pan)
(WeightedBrovey3, gdalpansharpen.cpp:592-630; factor 0 when
pseudo_pan == 0, ComputeFactor :567-572).

Distributed shape: the upsample ratio is an exact integer R, so the
cubic-convolution taps have only R distinct phases per axis — the tap
offsets/weights are an R-row broadcast literal map (computed once,
driver-side, injected identically into the DuckDB oracle). Each
separable pass is then explode(4 taps) -> equi-join on the MS pixel
key -> groupBy sum: O(4 rows) per output pixel per pass, plain
shuffle joins, no Python in the hot path. The Brovey combine is pure
column math. Tap indices clamp to the MS extent (edge replication,
matching GDALResampleChunk cubic edge clamping)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUBIC_A = -0.5  # GDAL cubic convolution parameter (gdalwarpkernel)


def _cubic_w(t: float) -> float:
    t = abs(t)
    if t <= 1.0:
        return (CUBIC_A + 2.0) * t ** 3 - (CUBIC_A + 3.0) * t ** 2 + 1.0
    if t < 2.0:
        return CUBIC_A * (t ** 3 - 5.0 * t ** 2 + 8.0 * t - 4.0)
    return 0.0


def phase_map(ratio: int) -> list[tuple]:
    """Per-phase cubic tap offsets and weights for an exact integer
    upsample: dst pixel d = ratio*q + p maps to source coordinate
    q + (2p + 1 - ratio) / (2*ratio); returns one row per phase p:
    (p, off0..off3 relative to q, w0..w3)."""
    rows = []
    for p in range(ratio):
        sf = (2 * p + 1 - ratio) / (2.0 * ratio)
        import math
        base = math.floor(sf)
        frac = sf - base
        offs = [base - 1, base, base + 1, base + 2]
        ws = [_cubic_w(frac + 1.0), _cubic_w(frac),
              _cubic_w(1.0 - frac), _cubic_w(2.0 - frac)]
        rows.append((p, *offs, *[float(w) for w in ws]))
    return rows


def upsample_cubic(ms: DataFrame, ratio: int, ms_w: int, ms_h: int,
                   key: str = "band") -> DataFrame:
    """ms(key, my, mx, val) -> (key, py, px, val) at ratio x the
    resolution, separable cubic with edge clamping."""
    spark = ms.sparkSession
    pm = spark.createDataFrame(
        phase_map(ratio),
        "p int, o0 int, o1 int, o2 int, o3 int, "
        "w0 double, w1 double, w2 double, w3 double")

    def one_pass(df, coord, out_coord, extent, val_col):
        """4-tap pass along ``coord``: a broadcast (out_coord -> 4
        clamped taps+weights) grid joined to the data on the source
        coordinate, then groupBy-sum (other columns carried)."""
        grid = spark.range(extent * ratio).select(
            F.col("id").cast("int").alias(out_coord),
            (F.col("id") % ratio).cast("int").alias("p"),
            (F.col("id") / ratio).cast("int").alias("q"))
        g = grid.join(F.broadcast(pm), "p")
        taps = F.array(*[
            F.struct(
                F.least(F.greatest(F.col("q") + F.col(f"o{k}"),
                                   F.lit(0)), F.lit(extent - 1))
                .alias("tc"),
                F.col(f"w{k}").alias("w"))
            for k in range(4)])
        ex = (g.select(out_coord, F.posexplode(taps).alias("k", "t"))
              .select(out_coord, "k", F.col("t.tc").alias(coord),
                      F.col("t.w").alias("w")))
        carry = [c for c in df.columns if c not in (key, coord, val_col)]
        j = df.join(F.broadcast(ex), coord)
        # pivot the 4 taps to columns and add in FIXED order — a
        # groupBy float sum would be partial-agg-order dependent and
        # break bit-exact parity with the oracle
        tcols = [F.max(F.when(F.col("k") == k,
                              F.col("w") * F.col(val_col)))
                 .alias(f"_t{k}") for k in range(4)]
        piv = j.groupBy(key, out_coord, *carry).agg(*tcols)
        total = sum((F.coalesce(F.col(f"_t{k}"), F.lit(0.0))
                     for k in range(1, 4)),
                    F.coalesce(F.col("_t0"), F.lit(0.0)))
        return piv.select(key, out_coord, *carry, total.alias(val_col))

    h = one_pass(ms.select(key, "my", "mx", "val"), "mx", "px", ms_w, "val")
    v = one_pass(h.select(key, "my", "px", "val"), "my", "py", ms_h, "val")
    return v.select(key, "py", "px", "val")


def weighted_brovey(pan: DataFrame, ms_up: DataFrame,
                    weights: list[float]) -> DataFrame:
    """pan(py, px, pan) x ms_up(band, py, px, val) -> (band, py, px,
    sharp): ms * pan / sum(w_i * ms_i), 0 where pseudo-pan is 0."""
    # fixed-order pseudo-pan fold (band pivot, not an unordered sum)
    bcols = [F.max(F.when(F.col("band") == b, F.col("val"))).alias(f"_b{b}")
             for b in range(len(weights))]
    piv = ms_up.groupBy("py", "px").agg(*bcols)
    pexpr = sum((F.lit(w) * F.col(f"_b{b}")
                 for b, w in list(enumerate(weights))[1:]),
                F.lit(weights[0]) * F.col("_b0"))
    pseudo = piv.select("py", "px", pexpr.alias("pseudo"))
    return (ms_up.join(pseudo, ["py", "px"]).join(pan, ["py", "px"])
            .select("band", "py", "px",
                    F.when(F.col("pseudo") != 0.0,
                           F.col("val") * F.col("pan") / F.col("pseudo"))
                    .otherwise(F.lit(0.0)).alias("sharp")))
