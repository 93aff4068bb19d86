"""Median-cut PCT — near-optimal pseudocolor table for an RGB image.

Reference: alg/gdalmediancut.cpp GDALComputeMedianCutPCT (Heckbert
SIGGRAPH'82 via libtiff tiffmedian.c): build a 5-bit-per-channel color
histogram, then repeatedly split the most-populated splittable box at
the median of its longest axis until nColors boxes exist, shrink each
box to its populated bounds, and emit box midpoints
(((min+max) << 3) / 2) as the palette.

Distributed shape (the trained-IVF-codebook pattern): the ONLY
driver-side state is the quantized histogram — groupBy((r>>3),(g>>3),
(b>>3)).count() is bounded at 32^3 = 32768 rows no matter how many
input pixels (map-side combined, one shuffle), so a 10^12-pixel mosaic
collects the same ≤32768 rows. The split loop itself touches only that
histogram (exactly like the reference, which also never re-reads
pixels once the histogram is built — gdalmediancut.cpp:419-540). The
pixel→palette assignment goes back to the engine: a broadcast
range-join of ≤nColors disjoint boxes (split halves are disjoint and
shrinking only contracts, so every populated cell lies in exactly one
box).

Replicated reference details (pinned by tests/test_mediancut.py):
- largest_box: first strictly-greater-total splittable box in list
  order, new boxes PREPENDED at the list head (LIFO tie-break,
  gdalmediancut.cpp:593-660);
- split axis: red wins ties against green and blue, green against
  blue (splitbox, :858-866);
- median index: first bin where the in-box cumulative 1-D histogram
  reaches total/2 (integer), bumped by one when it lands on the first
  bin (:1055-1066);
- both halves shrunk to tight populated bounds (:1151+);
- palette entry i = box i in final list order, channel value
  ((min + max) << 3) / 2 with integer truncation (:612-620).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MC_BITS = 5
MC_SHIFT = 8 - MC_BITS


@dataclass
class Box:
    rmin: int
    rmax: int
    gmin: int
    gmax: int
    bmin: int
    bmax: int
    total: int


def _shrink(box: Box, hist: np.ndarray) -> None:
    sub = hist[box.rmin:box.rmax + 1, box.gmin:box.gmax + 1,
               box.bmin:box.bmax + 1]
    nz = np.nonzero(sub)
    if len(nz[0]) == 0:
        return
    box.rmin, box.rmax = box.rmin + int(nz[0].min()), box.rmin + int(nz[0].max())
    box.gmin, box.gmax = box.gmin + int(nz[1].min()), box.gmin + int(nz[1].max())
    box.bmin, box.bmax = box.bmin + int(nz[2].min()), box.bmin + int(nz[2].max())


def _split(box: Box, hist: np.ndarray) -> Box:
    """Split at the median of the longest axis; returns the NEW box
    (lower half, to be prepended); mutates ``box`` into the upper."""
    rext = box.rmax - box.rmin
    gext = box.gmax - box.gmin
    bext = box.bmax - box.bmin
    sub = hist[box.rmin:box.rmax + 1, box.gmin:box.gmax + 1,
               box.bmin:box.bmax + 1]
    if rext >= gext and rext >= bext:
        axis, first, last = 0, box.rmin, box.rmax
    elif gext >= bext:
        axis, first, last = 1, box.gmin, box.gmax
    else:
        axis, first, last = 2, box.bmin, box.bmax
    h1 = sub.sum(axis=tuple(a for a in (0, 1, 2) if a != axis))

    sum2 = box.total // 2
    s, i = 0, first
    while i <= last:
        s += int(h1[i - first])
        if s >= sum2:
            break
        i += 1
    if i == first:
        i += 1

    new_total = int(h1[:i - first].sum())
    old_total = int(h1[i - first:].sum())
    new = Box(box.rmin, box.rmax, box.gmin, box.gmax, box.bmin, box.bmax,
              new_total)
    if axis == 0:
        new.rmax, box.rmin = i - 1, i
    elif axis == 1:
        new.gmax, box.gmin = i - 1, i
    else:
        new.bmax, box.bmin = i - 1, i
    box.total = old_total
    _shrink(new, hist)
    _shrink(box, hist)
    return new


def median_cut_boxes(hist: np.ndarray, n_colors: int) -> list[Box]:
    """The reference's STEP 1-3 over a (32,32,32) histogram: returns
    the final box list in the reference's usedboxes order (head =
    most recently created)."""
    nz = np.nonzero(hist)
    used = [Box(int(nz[0].min()), int(nz[0].max()),
                int(nz[1].min()), int(nz[1].max()),
                int(nz[2].min()), int(nz[2].max()), int(hist.sum()))]
    free = n_colors - 1
    while free > 0:
        cand = None
        for b in used:
            if (b.rmax > b.rmin or b.gmax > b.gmin or b.bmax > b.bmin) \
                    and (cand is None or b.total > cand.total):
                cand = b
        if cand is None:
            break
        used.insert(0, _split(cand, hist))
        free -= 1
    return used


def palette_entry(box: Box) -> tuple[int, int, int]:
    return (((box.rmin + box.rmax) << MC_SHIFT) // 2,
            ((box.gmin + box.gmax) << MC_SHIFT) // 2,
            ((box.bmin + box.bmax) << MC_SHIFT) // 2)


def compute_median_cut_pct(rgb: DataFrame, n_colors: int):
    """rgb(r, g, b int 0..255) -> (boxes, palette_rows): one bounded
    shuffle to the ≤32768-row histogram, driver split loop, palette =
    (color_id, r, g, b) in reference color-table order."""
    rows = (rgb.groupBy((F.col("r") / (1 << MC_SHIFT)).cast("int").alias("r5"),
                        (F.col("g") / (1 << MC_SHIFT)).cast("int").alias("g5"),
                        (F.col("b") / (1 << MC_SHIFT)).cast("int").alias("b5"))
            .count().collect())
    hist = np.zeros((1 << MC_BITS,) * 3, dtype=np.int64)
    for r in rows:
        hist[r.r5, r.g5, r.b5] = r["count"]
    boxes = median_cut_boxes(hist, n_colors)
    palette = [(i, *palette_entry(b)) for i, b in enumerate(boxes)]
    return boxes, palette


def assign_pct(rgb: DataFrame, boxes: list[Box]) -> DataFrame:
    """Broadcast range-join of the ≤256 disjoint boxes: every pixel's
    5-bit code lies in exactly one box. Returns rgb + color_id."""
    spark = rgb.sparkSession
    bdf = spark.createDataFrame(
        [(i, b.rmin, b.rmax, b.gmin, b.gmax, b.bmin, b.bmax)
         for i, b in enumerate(boxes)],
        "color_id int, rmin int, rmax int, gmin int, gmax int, "
        "bmin int, bmax int")
    q = rgb.select(
        "*",
        (F.col("r") / (1 << MC_SHIFT)).cast("int").alias("r5"),
        (F.col("g") / (1 << MC_SHIFT)).cast("int").alias("g5"),
        (F.col("b") / (1 << MC_SHIFT)).cast("int").alias("b5"))
    return q.join(
        F.broadcast(bdf),
        F.col("r5").between(F.col("rmin"), F.col("rmax"))
        & F.col("g5").between(F.col("gmin"), F.col("gmax"))
        & F.col("b5").between(F.col("bmin"), F.col("bmax")), "left")
