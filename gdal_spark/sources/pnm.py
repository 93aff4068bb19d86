"""PNM (portable any-map) raster source — a Spark 4 Python
DataSource; frmts/pnm in the reference.

P5 (binary graymap) and P6 (binary pixmap): ASCII header of magic,
width, height, maxval with '#' comments and arbitrary whitespace,
then raw samples — one byte per sample at maxval ≤ 255, two
big-endian bytes above (the Netpbm rule). Gray emits band 0; P6
emits bands 0/1/2. Raw data is seekable by row, so row-blocks
partition like the rawbin source.

Parity anchors (autotest/gdrivers/pnm.py): byte.pgm band 1 == 4672,
rgbsmall.ppm band 2 == 21053 (tests 1 and 2/4).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA


def _pnm_header(path: str) -> dict:
    """Parse magic/width/height/maxval, returning the data offset."""
    with open(path, "rb") as fh:
        head = fh.read(64 * 1024)
    if head[:2] not in (b"P5", b"P6"):
        raise ValueError("only binary P5/P6 PNM supported")
    bands = 3 if head[:2] == b"P6" else 1
    fields, pos, n = [], 2, len(head)
    while len(fields) < 3 and pos < n:
        c = head[pos:pos + 1]
        if c == b"#":
            while pos < n and head[pos] not in (0x0A, 0x0D):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not head[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(head[start:pos]))
    # exactly ONE whitespace byte separates maxval from the raw data
    # (the Netpbm rule) — but writers that end the header with CRLF
    # put TWO bytes there; skip the LF of a CR-LF pair so the data
    # offset is not shifted by one byte.
    pos += 1
    if (head[pos - 1:pos] == b"\r" and head[pos:pos + 1] == b"\n"):
        pos += 1
    w, h, maxval = fields
    return {"path": path, "w": w, "h": h, "bands": bands,
            "offset": pos, "maxval": maxval,
            "dtype": ">u2" if maxval > 255 else "u1"}


class PnmRowBlock(InputPartition):
    def __init__(self, meta, r0, r1):
        self.meta = meta
        self.r0 = r0
        self.r1 = r1


class PnmReader(DataSourceReader):
    ROWS_PER_BLOCK = 512

    def __init__(self, options):
        import glob as _glob
        path = options.get("path")
        if not path:
            raise ValueError("pnm source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [_pnm_header(p) for p in paths]

    def partitions(self):
        return [PnmRowBlock(m, r0, min(r0 + self.ROWS_PER_BLOCK,
                                       m["h"]))
                for m in self.metas
                for r0 in range(0, m["h"], self.ROWS_PER_BLOCK)]

    def read(self, part: PnmRowBlock):
        import numpy as np
        import pyarrow as pa
        m, r0, r1 = part.meta, part.r0, part.r1
        w, bands = m["w"], m["bands"]
        s = 2 if m["maxval"] > 255 else 1
        nr = r1 - r0
        with open(m["path"], "rb") as fh:
            fh.seek(m["offset"] + r0 * w * bands * s)
            arr = np.frombuffer(fh.read(nr * w * bands * s),
                                dtype=m["dtype"]).reshape(
                nr, w, bands)
        fname = os.path.basename(m["path"])
        n = nr * w
        pys = pa.array(np.repeat(np.arange(r0, r1, dtype=np.int32), w))
        pxs = pa.array(np.tile(np.arange(w, dtype=np.int32), nr))
        fcol = pa.array([fname] * n, pa.string())
        for b in range(bands):
            yield pa.record_batch(
                [fcol, pa.array(np.full(n, b, dtype=np.int32)),
                 pys, pxs,
                 pa.array(arr[:, :, b].astype(np.float64).ravel())],
                names=["file", "band", "py", "px", "value"])


class PnmDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pnm"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return PnmReader(self.options)
