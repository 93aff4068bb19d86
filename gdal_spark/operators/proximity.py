"""Proximity — per-pixel Euclidean distance to the nearest target
pixel, within a max search distance.

Reference: alg/gdalproximity.cpp (577 LoC) computes a two-pass
forward/backward propagation per scanline pair — inherently sequential
across rows. The distributed re-expression keeps the SEMANTICS (exact
Euclidean distance to the nearest target, cut at maxdist — GDAL's
result is exact too, its propagation carries (dx, dy) vectors) with a
scale-friendly shape:

- targets are bucketed into K×K pixel tiles (K ≥ maxdist), and each
  target row is scattered to its tile's 3×3 ring via one explode of a
  9-element literal array (pure column math);
- every pixel joins candidate targets through its own tile id — an
  equi-join Catalyst shuffles on tile id (or broadcasts when the
  target side is small, as with our hotspot cores);
- min(sqrt(dx²+dy²)) per pixel, filtered to ≤ maxdist.

A pixel's nearest target within maxdist is always within a 3×3 tile
ring when K ≥ maxdist, so the candidate set is complete. sqrt over
exact integer dx²+dy² is bit-identical across engines; MIN is
order-free — no float-sum hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proximity(pixels: DataFrame, targets: DataFrame, maxdist: float,
              tile: int | None = None) -> DataFrame:
    """pixels(py, px) × targets(py, px) → (py, px, dist) for pixels
    with a target within maxdist (targets themselves get dist 0)."""
    k = tile or max(1, int(maxdist))
    ring = F.array(*[F.struct(F.lit(dy).alias("ry"), F.lit(dx).alias("rx"))
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    t = (targets.select(F.col("py").alias("ty"), F.col("px").alias("tx"))
         .withColumn("_r", F.explode(ring))
         .select(
             ((F.col("ty") / k).cast("long") + F.col("_r.ry")).alias("_gy"),
             ((F.col("tx") / k).cast("long") + F.col("_r.rx")).alias("_gx"),
             "ty", "tx"))
    p = pixels.withColumn("_gy", (F.col("py") / k).cast("long")) \
              .withColumn("_gx", (F.col("px") / k).cast("long"))
    dy = (F.col("py") - F.col("ty")).cast("double")
    dx = (F.col("px") - F.col("tx")).cast("double")
    d = F.sqrt(dy * dy + dx * dx)
    return (p.join(t, ["_gy", "_gx"])
            .withColumn("_d", d)
            .filter(F.col("_d") <= maxdist)
            .groupBy("py", "px")
            .agg(F.round(F.min("_d"), 6).alias("dist")))
