"""Rasterize — vector → raster burn, exact port of the reference rules.

Reference kernels (alg/llrasterize.cpp, alg/gdalrasterize.cpp):

- Polygon fill (GDALdllImageFilledPolygon, llrasterize.cpp:41-228):
  for each scanline y in [max(0,miny), min(maxy, H-1)], at pixel-center
  height ``dy = y + 0.5`` collect edge crossings
  ``x = floor(intersect + 0.5)`` (llrasterize.cpp:193) for edges with
  ``dy1 <= dy < dy2`` (half-open so vertices count once), sort, fill
  even-odd pairs ``[x_i, x_{i+1} - 1]`` clipped to the raster; BOTTOM
  horizontal edges are filled separately (right-to-left ones), TOP
  horizontal edges are skipped (llrasterize.cpp:146-185).
- Point burn (GDALdllImagePoint, llrasterize.cpp:233-250): burn pixel
  ``(int(x), int(y))`` iff ``0 <= x < W and 0 <= y < H``.
- MERGE_ALG REPLACE|ADD (alg/gdalrasterize.cpp:796-834): ADD sums burn
  values per pixel.
- Geotransform pixel mapping: px = (x - gt0)/gt1, py = (y - gt3)/gt5.

Spark shape: the raster is a DataFrame of pixel rows (or tile rows).
Point burn is pure column math (floor + bounds filter + groupBy) —
JVM-side, shuffle only on the final per-pixel aggregation, map-side
combine keeps hot pixels cheap. Polygon fill runs the numpy scanline
kernel per (geometry, tile) via the driver for small covers or inside a
pandas UDF for large ones.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scanline_fill(rings, width: int, height: int) -> list[tuple[int, int, int]]:
    """Exact GDALdllImageFilledPolygon port → list of (y, x_start, x_end)
    inclusive runs. ``rings`` = [outer, holes...] in PIXEL coordinates
    (caller applies the geotransform). Even-odd rule makes holes work by
    simply concatenating their edges (llrasterize.cpp treats parts
    uniformly via panPartSize)."""
    parts = [np.asarray(r, dtype=np.float64) for r in rings]
    parts = [p[:-1] if len(p) > 1 and np.array_equal(p[0], p[-1]) else p for p in parts]
    ys = np.concatenate([p[:, 1] for p in parts])
    dminy, dmaxy = float(ys.min()), float(ys.max())
    miny = int(max(0.0, dminy))
    maxy = int(min(dmaxy, height - 1))
    maxx = width - 1
    runs: list[tuple[int, int, int]] = []
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints: list[int] = []
        horiz: list[tuple[int, int]] = []
        for p in parts:
            n = len(p)
            for i in range(n):
                x1, y1 = p[i - 1] if i > 0 else p[n - 1]
                x2, y2 = p[i]
                dy1, dy2 = y1, y2
                if (dy1 < dy and dy2 < dy) or (dy1 > dy and dy2 > dy):
                    continue
                if dy1 < dy2:
                    dx1, dx2 = x1, x2
                elif dy1 > dy2:
                    dy1, dy2 = dy2, dy1
                    dx2, dx1 = x1, x2
                else:
                    # horizontal edge: fill BOTTOM (right-to-left) ones
                    # separately, skip top ones (llrasterize.cpp:146-185)
                    if x1 > x2:
                        hx1 = np.floor(x2 + 0.5)
                        hx2 = np.floor(x1 + 0.5)
                        if hx1 > maxx or hx2 <= 0:
                            continue
                        horiz.append((int(max(hx1, 0.0)), int(min(hx2, float(width)))))
                    continue
                if dy1 <= dy < dy2:
                    intersect = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                    ints.append(int(np.floor(intersect + 0.5)))
        ints.sort()
        horiz.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= maxx and ints[i + 1] > 0:
                runs.append((y, max(ints[i], 0), min(ints[i + 1] - 1, maxx)))
        # horizontal segments burned unless an identical run exists
        ii = 0
        for hx1, hx2 in horiz:
            if hx1 <= maxx and hx2 > 0:
                while ii + 1 < len(ints) and ints[ii] < hx1:
                    ii += 2
                if ii + 1 >= len(ints) or ints[ii] != hx1:
                    runs.append((y, max(hx1, 0), min(hx2 - 1, maxx)))
    return runs


def rasterize_polygon_grid(rings_lonlat, gt: tuple, width: int, height: int,
                           burn: float = 1.0, merge_add: bool = False) -> np.ndarray:
    """Burn one polygon into a fresh (height, width) float64 grid.
    gt = (x0, dx, 0, y0, 0, dy) with dy negative (north-up).

    Rings are normalized to WORLD-CLOCKWISE order first — the
    reference reverses counterclockwise rings before the scanline
    (GDALCollectRingsFromGeometry, gdalrasterize.cpp:444-466), which
    makes the bottom-horizontal-edge fill rule winding-independent
    (pinned by the autotest ADD-polygon golden, both windings)."""
    px_rings = []
    for r in rings_lonlat:
        r = np.asarray(r, dtype=np.float64)
        x, y = r[:, 0], r[:, 1]
        area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        if area2 > 0:  # counterclockwise (y-up world) -> reverse
            r = r[::-1]
        px = (r[:, 0] - gt[0]) / gt[1]
        py = (r[:, 1] - gt[3]) / gt[5]
        px_rings.append(np.stack([px, py], axis=1))
    grid = np.zeros((height, width), dtype=np.float64)
    for y, x0, x1 in scanline_fill(px_rings, width, height):
        if merge_add:
            grid[y, x0:x1 + 1] += burn
        else:
            grid[y, x0:x1 + 1] = burn
    return grid


def burn_points(points: DataFrame, gt: tuple, width: int, height: int,
                lat_col: str = "lat", lon_col: str = "lon",
                value_col: str | None = None) -> DataFrame:
    """Point burn with MERGE_ALG=ADD semantics → (py, px, burn) rows.

    Mirrors GDALdllImagePoint (llrasterize.cpp:233-250): fractional
    pixel coords bounds-checked as doubles, then truncated. Pure column
    math + one aggregation; fully codegen'd, map-side combined.
    """
    fx = (F.col(lon_col) - F.lit(gt[0])) / F.lit(gt[1])
    fy = (F.col(lat_col) - F.lit(gt[3])) / F.lit(gt[5])
    df = (points.filter(F.col(lat_col).isNotNull())
          .withColumn("_fx", fx).withColumn("_fy", fy)
          .filter((F.col("_fx") >= 0) & (F.col("_fx") < width)
                  & (F.col("_fy") >= 0) & (F.col("_fy") < height))
          .withColumn("px", F.floor(F.col("_fx")).cast("long"))
          .withColumn("py", F.floor(F.col("_fy")).cast("long")))
    agg = (F.sum(F.col(value_col)).alias("burn") if value_col
           else F.count("*").cast("double").alias("burn"))
    return df.groupBy("py", "px").agg(agg)


def burn_lines(edges: DataFrame, gt: tuple, width: int, height: int) -> DataFrame:
    """Line burn — the DDA rule of GDALdllImageLine (alg/llrasterize.cpp
    GDALdllImageLine; dispatch alg/gdalrasterize.cpp:717-763) as pure
    column math: endpoints truncated to integer pixels, n = max(|Δix|,
    |Δiy|) steps, k-th pixel = i1 + floor(k·Δ/n + 0.5) per axis.
    Every op (int products exact in double, one correctly-rounded
    division, +0.5, floor) is bit-deterministic across engines.

    MERGE_ALG=ADD over features: pixels deduped per FEATURE (zone_fid)
    then counted → (py, px, burn). The reference keeps one
    visited-points set per geometry spanning ALL its segments and
    parts (gdalrasterize.cpp:711-714 poSetVisitedPoints; the
    issue-1307 fix), so a pixel hit by several edges of one feature —
    every interior vertex — burns once; distinct features still add.
    Pinned by the autotest ADD-linestring golden in
    tests/test_autotest_parity.py. Scale shape: explode(sequence)
    per edge = one task-local row expansion, no shuffle until the final
    map-side-combined count."""
    fx1 = (F.col("x1") - F.lit(gt[0])) / F.lit(gt[1])
    fy1 = (F.col("y1") - F.lit(gt[3])) / F.lit(gt[5])
    fx2 = (F.col("x2") - F.lit(gt[0])) / F.lit(gt[1])
    fy2 = (F.col("y2") - F.lit(gt[3])) / F.lit(gt[5])
    base = (edges
            .withColumn("ix1", F.floor(fx1)).withColumn("iy1", F.floor(fy1))
            .withColumn("ix2", F.floor(fx2)).withColumn("iy2", F.floor(fy2))
            .withColumn("n", F.greatest(F.abs(F.col("ix2") - F.col("ix1")),
                                        F.abs(F.col("iy2") - F.col("iy1")))))
    nn = F.greatest(F.col("n"), F.lit(1))
    k = F.col("k")
    px = F.col("ix1") + F.floor(
        (k * (F.col("ix2") - F.col("ix1"))).cast("double") / nn + 0.5)
    py = F.col("iy1") + F.floor(
        (k * (F.col("iy2") - F.col("iy1"))).cast("double") / nn + 0.5)
    pix = (base
           .withColumn("k", F.explode(F.sequence(F.lit(0), F.col("n"))))
           .select("zone_fid", py.alias("py"), px.alias("px"))
           .filter((F.col("px") >= 0) & (F.col("px") < width)
                   & (F.col("py") >= 0) & (F.col("py") < height))
           .distinct())
    return pix.groupBy("py", "px").agg(F.count("*").cast("double").alias("burn"))


def burn_lines_all_touched(edges: DataFrame, gt: tuple, width: int,
                           height: int) -> DataFrame:
    """ALL_TOUCHED line burn (GDALdllImageLineAllTouched,
    alg/llrasterize.cpp): every pixel whose CLOSED unit square the
    segment touches. Exact formulation: candidates = DDA pixels dilated
    by a 3×3 ring (the supercover is always within Chebyshev distance 1
    of the DDA line), then a Liang-Barsky parametric clip test per
    (edge, cell) — pure arithmetic, same op order both engines.
    Documented deviation: corner-grazing pixels count (closed-cell
    rule; the reference's epsilon handling differs at exact corners)."""
    fx1 = (F.col("x1") - F.lit(gt[0])) / F.lit(gt[1])
    fy1 = (F.col("y1") - F.lit(gt[3])) / F.lit(gt[5])
    fx2 = (F.col("x2") - F.lit(gt[0])) / F.lit(gt[1])
    fy2 = (F.col("y2") - F.lit(gt[3])) / F.lit(gt[5])
    base = (edges
            .withColumn("fx1", fx1).withColumn("fy1", fy1)
            .withColumn("fx2", fx2).withColumn("fy2", fy2)
            .withColumn("ix1", F.floor("fx1")).withColumn("iy1", F.floor("fy1"))
            .withColumn("ix2", F.floor("fx2")).withColumn("iy2", F.floor("fy2"))
            .withColumn("n", F.greatest(F.abs(F.col("ix2") - F.col("ix1")),
                                        F.abs(F.col("iy2") - F.col("iy1")))))
    nn = F.greatest(F.col("n"), F.lit(1))
    k = F.col("k")
    px = F.col("ix1") + F.floor(
        (k * (F.col("ix2") - F.col("ix1"))).cast("double") / nn + 0.5)
    py = F.col("iy1") + F.floor(
        (k * (F.col("iy2") - F.col("iy1"))).cast("double") / nn + 0.5)
    cand = (base
            .withColumn("k", F.explode(F.sequence(F.lit(0), F.col("n"))))
            .withColumn("bpx", px).withColumn("bpy", py)
            .withColumn("ox", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
            .withColumn("oy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
            .select("zone_fid", "ring_id", "edge", "fx1", "fy1", "fx2", "fy2",
                    (F.col("bpx") + F.col("ox")).alias("cx"),
                    (F.col("bpy") + F.col("oy")).alias("cy"))
            .filter((F.col("cx") >= 0) & (F.col("cx") < width)
                    & (F.col("cy") >= 0) & (F.col("cy") < height))
            .distinct())
    dxf = F.col("fx2") - F.col("fx1")
    dyf = F.col("fy2") - F.col("fy1")
    BIG = F.lit(1e300)

    def axis_range(d, f1, c):
        t1 = (c - f1) / d
        t2 = (c + 1.0 - f1) / d
        in_band = (f1 >= c) & (f1 <= c + 1.0)
        lo = F.when(d == 0.0, F.when(in_band, -BIG).otherwise(BIG)) \
             .otherwise(F.least(t1, t2))
        hi = F.when(d == 0.0, F.when(in_band, BIG).otherwise(-BIG)) \
             .otherwise(F.greatest(t1, t2))
        return lo, hi

    lox, hix = axis_range(dxf, F.col("fx1"), F.col("cx").cast("double"))
    loy, hiy = axis_range(dyf, F.col("fy1"), F.col("cy").cast("double"))
    entry = F.greatest(F.lit(0.0), lox, loy)
    exit_ = F.least(F.lit(1.0), hix, hiy)
    # dedup per FEATURE: one visited set per geometry across all its
    # edges (gdalrasterize.cpp:711-714), so ADD counts features
    hit = (cand.filter(entry <= exit_)
           .select("zone_fid", "cy", "cx").distinct())
    return (hit.groupBy(F.col("cy").alias("py"), F.col("cx").alias("px"))
            .agg(F.count("*").cast("double").alias("burn")))


def gdal_checksum(grid: np.ndarray) -> int:
    """GDAL band checksum (alg/gdalchecksum.cpp:54-56,174-187): per pixel
    in row-major order, value rounded ``floor(v + 0.5)`` (GDALCopyWords
    float→Int32 rule), term ``val % primes[(y*W + x) % 11]`` with C-style
    signed modulo, accumulated and masked to 16 bits per line. Used for
    compact raster goldens exactly like the reference autotest suite
    (e.g. test_gdal_rasterize.py golden Checksum()==39190)."""
    primes = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
    h, w = grid.shape
    vals = np.floor(np.asarray(grid, dtype=np.float64) + 0.5)
    # GDALCopyWords float→Int32 clamps to the full Int32 range —
    # low side is INT32_MIN (-2^31), exposed by the int64_full_range
    # fixture whose published checksum 65535 requires it
    vals = np.clip(vals, -2147483648, 2147483647).astype(np.int64)
    idx = (np.arange(h * w, dtype=np.int64) % 11).reshape(h, w)
    terms = np.fmod(vals, primes[idx])  # fmod keeps C's sign-of-dividend
    chk = 0
    for y in range(h):
        chk = (chk + int(terms[y].sum())) & 0xFFFF
    return chk
