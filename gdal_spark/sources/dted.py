"""DTED (MIL-PRF-89020B digital terrain elevation data) raster
source — a Spark 4 Python DataSource; frmts/dted/dted_api.c in the
reference (studied for the odd-layout column-map rules; NOT a port).

Layout: UHL(80) + DSI(648) + ACC(2700) headers, then one record per
LONGITUDE COLUMN: 0xAA sentinel, block count, longitude count, nlat
big-endian SIGN-MAGNITUDE int16 samples stored south→north (the band
is the vertical flip + column-major transpose), 4-byte checksum.
Values below -16000 that aren't the -32767 nodata are re-read as
two's complement (the reference's w_069_s50.dt0 fixup). Odd layouts
(the reference's DTEDDetectVariantWithMissingColumns): a contiguous
column subrange, or non-sequential records mapped by their embedded
longitude count — absent columns fill with nodata -32767. Published
pins: n43.dt0 49187, n43_partial_cols 56006, n43_sparse_cols 56369.

Scale shape: the driver reads the 3 headers plus at most a
record-header scan (8 bytes per physical column — never sample
data); executors take column-range InputPartitions with closed-form
offsets through the column map."""

from __future__ import annotations

import glob as _glob
import os

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA

DTED_NODATA = -32767.0
_HDR = 80 + 648 + 2700


def dted_header(path: str) -> dict:
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        uhl = fh.read(80)
        if uhl[:4] != b"UHL1":
            raise ValueError(f"{path}: not a DTED file")
        nlon = int(uhl[47:51])
        nlat = int(uhl[51:55])
        rec = 12 + 2 * nlat

        def hdr8(off):
            fh.seek(off)
            b = fh.read(8)
            if len(b) < 8 or b[0] != 0xAA:
                return None
            return ((b[2] << 8) | b[3], (b[4] << 8) | b[5])

        first = hdr8(_HDR)
        last = hdr8(size - rec)
        colmap = None  # None → standard positional layout
        if not (first == (0, 0) and last == (nlon - 1, nlon - 1)
                and size - _HDR == nlon * rec):
            colmap = [-1] * nlon
            if (first and last and first[0] == 0
                    and last[1] - first[1] == last[0] - first[0]
                    and size - _HDR
                    == (last[1] - first[1] + 1) * rec):
                # contiguous subrange (the real-world case)
                for i in range(nlon):
                    if first[1] <= i <= last[1]:
                        colmap[i] = _HDR + (i - first[1]) * rec
            else:
                # non-sequential: map each physical record by its
                # embedded longitude count (header-only reads)
                for i in range((size - _HDR) // rec):
                    h = hdr8(_HDR + i * rec)
                    if h is None:
                        break
                    if h[1] < nlon:
                        colmap[h[1]] = _HDR + i * rec
    return {"path": path, "nx": nlon, "ny": nlat, "rec": rec,
            "size": size, "colmap": colmap}


class DtedColBlock(InputPartition):
    def __init__(self, meta, c0, c1):
        self.meta = meta
        self.c0 = c0
        self.c1 = c1


class DtedReader(DataSourceReader):
    COLS_PER_BLOCK = 512

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("dted source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [dted_header(p) for p in paths]

    def partitions(self):
        return [DtedColBlock(m, c0, min(c0 + self.COLS_PER_BLOCK,
                                        m["nx"]))
                for m in self.metas
                for c0 in range(0, m["nx"], self.COLS_PER_BLOCK)]

    def read(self, part: DtedColBlock):
        import pyarrow as pa
        m, c0, c1 = part.meta, part.c0, part.c1
        nlat, rec = m["ny"], m["rec"]
        ncols = c1 - c0
        block = np.full((nlat, ncols), DTED_NODATA, dtype=np.float64)
        with open(m["path"], "rb") as fh:
            for j in range(c0, c1):
                off = (m["colmap"][j] if m["colmap"] is not None
                       else _HDR + j * rec)
                if off < 0 or off + rec > m["size"]:
                    continue
                fh.seek(off + 8)
                raw = fh.read(2 * nlat)
                u = np.frombuffer(raw, dtype=">u2").astype(np.int64)
                v = np.where(u & 0x8000, -(u & 0x7FFF).astype(np.int64),
                             (u & 0x7FFF).astype(np.int64))
                # two's-complement fixup for improperly coded files
                bad = (v < -16000) & (v != -32767)
                if bad.any():
                    tc = np.frombuffer(raw, dtype=">i2")\
                        .astype(np.int64)
                    v = np.where(bad, tc, v)
                block[:, j - c0] = v
        band = block[::-1, :]  # south-up grid → top-down band
        fname = os.path.basename(m["path"])
        n = nlat * ncols
        yield pa.record_batch(
            [pa.array([fname] * n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int32)),
             pa.array(np.repeat(np.arange(nlat, dtype=np.int32),
                                ncols)),
             pa.array(np.tile(np.arange(c0, c1, dtype=np.int32),
                              nlat)),
             pa.array(band.ravel())],
            names=["file", "band", "py", "px", "value"])


class DtedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "dted"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return DtedReader(self.options)
