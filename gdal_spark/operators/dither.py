"""Error-diffusion dither to a palette — GDALDitherRGB2PCT.

Reference: alg/gdaldither.cpp GDALDitherRGB2PCTInternal: per scanline,
(1) add the carried next-line error to each channel (clamped 0..255,
:440-448), (2) serial left-to-right scan: palette index looked up in
the precomputed 5-BIT COLOR CUBE — pabyColorMap[v*32/256 per channel],
each of the 32^3 cells holding the L1-nearest (first-min tie) palette
color of the cell REPRESENTATIVE (i*255)/31 (:297,:553-558; builder
FindNearestColor :768-795) — NOT the exact pixel color; the
cell-quantized lookup is pinned by the rgbsmall golden (checksum 8803)
in tests/test_autotest_parity.py, (3) diffuse the quantization error
e = value - palette[idx] with GDAL's weights — next-line left += e/6,
next-line right = e/6 (assignment), next-line center += e - 5*(e/6),
current-line right carries 2*(e/6) (:585-630; e/6 is C integer
division, truncating toward zero).

Distributed shape: the reference's error chain is a strict whole-image
serial wavefront — the one raster op with no exact parallel order. The
engine runs the EXACT reference kernel per horizontal STRIP (error
state zeroed at strip top — documented deviation, differences confined
to rows just below strip seams), strips in parallel via applyInPandas:
a 10^12-pixel dither becomes rows/STRIP_H independent Arrow-batched
tasks. STRIP_H = whole image reproduces the reference bit-for-bit."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trunc6(e: int) -> int:
    """C integer division e/6 (truncation toward zero)."""
    return -((-e) // 6) if e < 0 else e // 6


def _color_cube(pr, pg, pb) -> np.ndarray:
    """The reference's 32^3 nearest-color cube (gdaldither.cpp:768-795
    FindNearestColor map builder): per cell the L1-nearest palette
    index of the representative (i*255)/31, first-min tie in palette
    order."""
    reps = (np.arange(32, dtype=np.int64) * 255) // 31
    pal = np.stack([np.asarray(pr, dtype=np.int64),
                    np.asarray(pg, dtype=np.int64),
                    np.asarray(pb, dtype=np.int64)], axis=1)  # (nc, 3)
    rr, gg, bb = np.meshgrid(reps, reps, reps, indexing="ij")
    cells = np.stack([rr, gg, bb], axis=-1).reshape(-1, 1, 3)  # (32^3,1,3)
    dist = np.abs(cells - pal.reshape(1, -1, 3)).sum(axis=2)
    return np.argmin(dist, axis=1).reshape(32, 32, 32)


def dither_array(r: np.ndarray, g: np.ndarray, b: np.ndarray,
                 palette: list[tuple]) -> np.ndarray:
    """Exact GDALDitherRGB2PCTInternal twin over an h x w strip.
    palette = [(r, g, b)] in color-table order."""
    h, w = r.shape
    out = np.zeros((h, w), dtype=np.int64)
    pan = np.zeros((w + 2) * 3, dtype=np.int64)   # next-line error
    pr = [int(p[0]) for p in palette]
    pg = [int(p[1]) for p in palette]
    pb = [int(p[2]) for p in palette]
    cmap = _color_cube(pr, pg, pb)
    for y in range(h):
        rr = r[y].astype(np.int64)
        gg = g[y].astype(np.int64)
        bb = b[y].astype(np.int64)
        # apply carried error, clamp, reset (gdaldither.cpp:440-448)
        for i in range(w):
            rr[i] = max(0, min(255, rr[i] + pan[i * 3 + 0 + 3]))
            gg[i] = max(0, min(255, gg[i] + pan[i * 3 + 1 + 3]))
            bb[i] = max(0, min(255, bb[i] + pan[i * 3 + 2 + 3]))
        pan[:] = 0
        ler = leg = leb = 0
        for i in range(w):
            rv = max(0, min(255, int(rr[i]) + ler))
            gv = max(0, min(255, int(gg[i]) + leg))
            bv = max(0, min(255, int(bb[i]) + leb))
            best = int(cmap[(rv * 32) // 256,
                            (gv * 32) // 256,
                            (bv * 32) // 256])
            out[y, i] = best
            for err, last in (
                    (rv - pr[best], 0), (gv - pg[best], 1),
                    (bv - pb[best], 2)):
                sixth = _trunc6(err)
                pan[i * 3 + last] += sixth
                pan[i * 3 + 6 + last] = sixth
                pan[i * 3 + 3 + last] += err - 5 * sixth
                if last == 0:
                    ler = 2 * sixth
                elif last == 1:
                    leg = 2 * sixth
                else:
                    leb = 2 * sixth
    return out


def dither_rgb_to_pct(img: DataFrame, palette: list[tuple],
                      strip_h: int, width: int) -> DataFrame:
    """img(py, px, r, g, b) -> (py, px, color_id): strip-parallel
    exact-kernel dither; strip key = py // strip_h."""
    pal = [tuple(int(v) for v in p) for p in palette]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["py", "px"])
        ys = np.sort(pdf["py"].unique())
        h, w = len(ys), width
        def grid(col):
            return pdf[col].to_numpy().reshape(h, w)
        out = dither_array(grid("r"), grid("g"), grid("b"), pal)
        return pd.DataFrame({
            "py": np.repeat(ys, w).astype("int32"),
            "px": np.tile(np.arange(w), h).astype("int32"),
            "color_id": out.reshape(-1).astype("int32"),
        })

    strips = img.withColumn(
        "strip", (F.col("py") / strip_h).cast("int"))
    return strips.groupBy("strip").applyInPandas(
        run, "py int, px int, color_id int")
