"""Warp AGGREGATE resampling kernels — GRA_Average / Mode / Min / Max /
Sum / RMS (alg/gdalwarper.h:37-67) for downsampling warps, the common
100-TB case (decimating a global mosaic to a coarser grid).

Reference kernels: GWKAverageOrModeThread (alg/gdalwarpkernel.cpp:7600+)
gathers, per DEST pixel, the source window spanned by the dst pixel's
corners (GWKAverageOrModeComputeSourceCoords :6919-7020) with
partial-pixel edge weights (COMPUTE_WEIGHT_Y/COMPUTE_WEIGHT macros
:6849-6861: first/last row/col weighted by their covered fraction,
interior 1). GRA_Sum is GWKSumPreservingThread (:8685): each SOURCE
pixel's footprint is split across the dst pixels it overlaps in
proportion to area, so the global sum is preserved.

Spark shape — the forward-SCATTER formulation (the rasterize-point
idiom): each source pixel emits its 1-2 dst cells per axis (≤4 total)
with the exact overlap weight, then ONE groupBy(dy, dx) folds each
kernel. This is plan-equivalent to the reference's gather but needs no
windowed source reads: a 10^12-pixel mosaic decimation becomes
scan → explode(≤4) → partial-aggregated shuffle on the dst key, the
same shape as the overview cascade. All column math, no UDF.

Weight identity: for an affine decimation by factor r, the gather
window of dst cell X is [rX, r(X+1)); COMPUTE_WEIGHT's edge fractions
(1 - (dfXMin - iSrcXMin), 1 - (iSrcXMax - dfXMax)) are exactly the
overlap length min(sx+1, r(X+1)) - max(sx, rX), which is what the
scatter emits — the two formulations agree pixel-for-pixel.

Fold discipline: with r chosen dyadic (e.g. 2.5 ⇒ fractions ∈ {.5, 1})
and integer-valued sources, every contribution w·v is exact in
binary, so sums are order-independent and the DuckDB oracle matches
bit-for-bit without an ordered fold.

Mode tie-break: the reference's default GWKTS_First is raster-scan-
order dependent; we implement MODE_TIES=MIN (GWKTieStrategy::MIN,
gdalwarpkernel.h — a documented reference option): max total weight,
ties to the smallest value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scatter_contributions(src: DataFrame, r: float,
                          value_col: str = "v") -> DataFrame:
    """src(sy, sx, v) → contributions (dy, dx, v, w) where w is the
    exact overlap area between the source pixel [sx,sx+1)×[sy,sy+1)
    and the dst gather window [r·dx, r·(dx+1))×[r·dy, r·(dy+1)).

    Each source pixel overlaps 1 or 2 dst cells per axis (for r ≥ 1);
    the per-axis targets are floor(s/r) and floor((s+1)/r − ε), the ε
    dropping the zero-width overlap when the pixel ends exactly on a
    window boundary (mirrors the reference's ceil(dfXMax − EPSILON),
    gdalwarpkernel.cpp:7001)."""

    def axis(col):
        t1 = F.floor(col / F.lit(r)).cast("long")
        t2 = F.floor((col + 1) / F.lit(r) - F.lit(1e-12)).cast("long")

        def entry(t):
            lo = F.greatest(col.cast("double"), t * F.lit(r))
            hi = F.least((col + 1).cast("double"), (t + 1) * F.lit(r))
            return F.struct(t.alias("t"), (hi - lo).alias("w"))

        return F.when(t2 > t1, F.array(entry(t1), entry(t2))) \
                .otherwise(F.array(entry(t1)))

    return (src
            .withColumn("_xs", axis(F.col("sx")))
            .withColumn("_ys", axis(F.col("sy")))
            .select(value_col, F.explode("_xs").alias("ex"), "_ys")
            .select(value_col, "ex", F.explode("_ys").alias("ey"))
            .select(F.col("ey.t").alias("dy"), F.col("ex.t").alias("dx"),
                    F.col(value_col).alias("v"),
                    (F.col("ex.w") * F.col("ey.w")).alias("w")))


def warp_average(contrib: DataFrame) -> DataFrame:
    """GRA_Average: weighted mean over the window. The reference's
    weighted-incremental fold (gdalwarpkernel.cpp:7998-8005) is
    mathematically Σwv/Σw; with exact dyadic weights both forms are
    bit-identical."""
    return contrib.groupBy("dy", "dx").agg(
        (F.sum(F.col("w") * F.col("v")) / F.sum("w")).alias("v"))


def warp_rms(contrib: DataFrame) -> DataFrame:
    """GRA_RMS: sqrt(Σw·v² / Σw) (gdalwarpkernel.cpp:8034-8078)."""
    return contrib.groupBy("dy", "dx").agg(
        F.sqrt(F.sum(F.col("w") * F.col("v") * F.col("v"))
               / F.sum("w")).alias("v"))


def warp_sum(contrib: DataFrame) -> DataFrame:
    """GRA_Sum, sum-preserving (GWKSumPreservingThread :8685): each
    source pixel's value splits across overlapped dst cells by area
    fraction; for an axis-aligned decimation the fractions ARE the
    scatter weights (the footprint has unit area in source units), so
    Σ over all dst cells equals Σ over the source."""
    return contrib.groupBy("dy", "dx").agg(
        F.sum(F.col("w") * F.col("v")).alias("v"))


def warp_minmax(contrib: DataFrame) -> DataFrame:
    """GRA_Min / GRA_Max: unweighted extrema over every window pixel
    with positive coverage (gdalwarpkernel.cpp:8177-8230 iterates the
    whole [iSrcMin, iSrcMax) box)."""
    return contrib.groupBy("dy", "dx").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax"))


def warp_mode(contrib: DataFrame) -> DataFrame:
    """GRA_Mode with MODE_TIES=MIN: the value with the largest total
    coverage weight in the window (pafCounts accumulation,
    gdalwarpkernel.cpp:8120-8165), ties to the smallest value."""
    cnt = contrib.groupBy("dy", "dx", "v").agg(F.sum("w").alias("cnt"))
    return (cnt.groupBy("dy", "dx")
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                F.col("v").alias("v"))).alias("m"))
            .select("dy", "dx", F.col("m.v").alias("v")))


def warp_quantile(contrib: DataFrame, quants: dict) -> DataFrame:
    """GRA_Med / GRA_Q1 / GRA_Q3 (gdalwarpkernel.cpp:8294-8341): sort
    the window's values (unweighted — every window pixel once), pick
    index ceil(q·n − 1) with NO interpolation. quants: {col: q}."""
    g = contrib.groupBy("dy", "dx").agg(
        F.sort_array(F.collect_list("v")).alias("vs"))
    cols = []
    for name, q in quants.items():
        idx = F.ceil(F.lit(q) * F.size("vs") - 1).cast("int")
        cols.append(F.element_at("vs", idx + 1).alias(name))
    return g.select("dy", "dx", *cols)
