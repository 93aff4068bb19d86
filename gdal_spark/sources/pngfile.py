"""PNG raster file source — a Spark 4 Python DataSource over the
from-scratch codec in geo/png.py (frmts/png in the reference).

Grayscale (color type 0) and palette (3) emit one band — palette
files as INDICES with geo.png.png_palette() for expansion, GDAL's
Byte-band-with-color-table model; RGB (2) / RGBA (6) emit one band
per channel. A PNG's IDAT is a single zlib stream with row-to-row
filter dependencies, so each file is one InputPartition (the same
constraint a single-strip TIFF or a GIF image has; file-level
parallelism still applies via glob paths).

Parity anchors (autotest/gdrivers/png.py): test.png band 1 ==
57921 (test_png_1), byte_with_xmp.png == 4672.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA


class PngFilePartition(InputPartition):
    def __init__(self, path):
        self.path = path


class PngFileReader(DataSourceReader):
    def __init__(self, options):
        import glob as _glob
        path = options.get("path")
        if not path:
            raise ValueError("png source requires a path")
        self.paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]

    def partitions(self):
        return [PngFilePartition(p) for p in self.paths]

    def read(self, part: PngFilePartition):
        import os

        import numpy as np
        import pyarrow as pa

        from gdal_spark.geo.png import decode_png
        with open(part.path, "rb") as fh:
            arr = decode_png(fh.read())
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, ch = arr.shape
        fname = os.path.basename(part.path)
        n = h * w
        pys = pa.array(np.repeat(np.arange(h, dtype=np.int32), w))
        pxs = pa.array(np.tile(np.arange(w, dtype=np.int32), h))
        fcol = pa.array([fname] * n, pa.string())
        for c in range(ch):
            yield pa.record_batch(
                [fcol, pa.array(np.full(n, c, dtype=np.int32)),
                 pys, pxs,
                 pa.array(arr[:, :, c].astype(np.float64).ravel())],
                names=["file", "band", "py", "px", "value"])


class PngFileDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pngfile"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return PngFileReader(self.options)
