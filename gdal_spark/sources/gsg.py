"""Golden Software grid raster source (Surfer 6 ASCII ``DSAA``,
Surfer 6 binary ``DSBB``, Surfer 7 binary ``DSRB``) — a Spark 4
Python DataSource; frmts/gsg in the reference (gsagdataset.cpp /
gsbgdataset.cpp / gs7bgdataset.cpp — NOT a port; formats re-derived
from the public Surfer grid descriptions).

Surfer stores node-centered grids bottom-up: grid row 0 sits at yLO,
so the raster band is the vertical flip, and the GDAL geotransform
puts the origin half a cell outside the node extent
((xlo - dx/2, yhi + dy/2)); the published parity pins
(autotest/gdrivers/gsg.py tests 1-3) are checksum 4672 — the
position-sensitive GDAL checksum, so the flip and the node layout
must both be exact — plus geotransform (440720, 60, 0, 3751320, 0,
-60) for all three dialects.

Scale shape: DSBB (float32) and DSRB (float64) rows are seekable —
row-block InputPartitions with closed-form offsets like
sources/rawbin.py; DSAA is whitespace-delimited text and parses as
one partition per file (the format's own constraint; its corpus role
is ingest-then-rewrite)."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA

GSG_BLANK = 1.701410009187828e38  # Surfer blank threshold (>= blanks)


def gsg_header(path: str) -> dict:
    with open(path, "rb") as fh:
        magic = fh.read(4)
        if magic == b"DSBB":
            nx, ny = struct.unpack("<hh", fh.read(4))
            xlo, xhi, ylo, yhi, zlo, zhi = struct.unpack(
                "<6d", fh.read(48))
            return {"path": path, "kind": "dsbb", "nx": nx, "ny": ny,
                    "xlo": xlo, "xhi": xhi, "ylo": ylo, "yhi": yhi,
                    "off": 56, "itemsize": 4, "fmt": "<f4"}
        if magic == b"DSRB":
            # tagged container: sections (id, size, payload)
            fh.seek(4)
            hdr_size = struct.unpack("<i", fh.read(4))[0]
            fh.read(hdr_size)
            meta = None
            while True:
                tag = fh.read(4)
                if len(tag) < 4:
                    break
                size = struct.unpack("<i", fh.read(4))[0]
                if tag == b"GRID":
                    (nrow, ncol) = struct.unpack("<ii", fh.read(8))
                    (xll, yll, dx, dy, zmin, zmax, rot,
                     blank) = struct.unpack("<8d", fh.read(64))
                    fh.read(size - 72)
                    meta = (nrow, ncol, xll, yll, dx, dy, blank)
                elif tag == b"DATA":
                    assert meta is not None, "DATA before GRID"
                    nrow, ncol, xll, yll, dx, dy, blank = meta
                    return {"path": path, "kind": "dsrb",
                            "nx": ncol, "ny": nrow,
                            "xlo": xll, "xhi": xll + dx * (ncol - 1),
                            "ylo": yll, "yhi": yll + dy * (nrow - 1),
                            "off": fh.tell(), "itemsize": 8,
                            "fmt": "<f8", "blank": blank}
                else:
                    fh.read(size)
            raise ValueError(f"{path}: no DATA section")
        if magic == b"DSAA":
            head = magic + fh.read(1 << 20)
            toks = head.split()
            nx, ny = int(toks[1]), int(toks[2])
            xlo, xhi = float(toks[3]), float(toks[4])
            ylo, yhi = float(toks[5]), float(toks[6])
            return {"path": path, "kind": "dsaa", "nx": nx, "ny": ny,
                    "xlo": xlo, "xhi": xhi, "ylo": ylo, "yhi": yhi,
                    "ntok_skip": 9}
        raise ValueError(f"{path}: not a Surfer grid ({magic!r})")


def gsg_geotransform(meta: dict) -> tuple:
    dx = (meta["xhi"] - meta["xlo"]) / (meta["nx"] - 1)
    dy = (meta["yhi"] - meta["ylo"]) / (meta["ny"] - 1)
    return (meta["xlo"] - dx / 2.0, dx, 0.0,
            meta["yhi"] + dy / 2.0, 0.0, -dy)


class GsgBlock(InputPartition):
    def __init__(self, meta, r0, r1):
        self.meta = meta
        self.r0 = r0    # band rows (top-down)
        self.r1 = r1


class GsgReader(DataSourceReader):
    ROWS_PER_BLOCK = 512

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gsg source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [gsg_header(p) for p in paths]

    def partitions(self):
        out = []
        for m in self.metas:
            if m["kind"] == "dsaa":
                out.append(GsgBlock(m, 0, m["ny"]))
            else:
                for r0 in range(0, m["ny"], self.ROWS_PER_BLOCK):
                    out.append(GsgBlock(
                        m, r0, min(r0 + self.ROWS_PER_BLOCK,
                                   m["ny"])))
        return out

    def read(self, part: GsgBlock):
        import numpy as np
        import pyarrow as pa
        m, r0, r1 = part.meta, part.r0, part.r1
        nx, ny = m["nx"], m["ny"]
        if m["kind"] == "dsaa":
            with open(m["path"], "rb") as fh:
                toks = fh.read().split()
            vals = np.asarray(toks[m["ntok_skip"]:],
                              dtype=np.float64).reshape(ny, nx)
            arr = vals[::-1, :]  # bottom-up grid → top-down band
        else:
            # band row r (top-down) = grid row ny-1-r (bottom-up);
            # the block [r0, r1) is contiguous in the file reversed
            g_lo = ny - r1
            with open(m["path"], "rb") as fh:
                fh.seek(m["off"] + g_lo * nx * m["itemsize"])
                raw = fh.read((r1 - r0) * nx * m["itemsize"])
            arr = np.frombuffer(raw, dtype=m["fmt"]).reshape(
                r1 - r0, nx).astype(np.float64)[::-1, :]
        fname = os.path.basename(m["path"])
        nrows = r1 - r0
        n = nrows * nx
        yield pa.record_batch(
            [pa.array([fname] * n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int32)),
             pa.array(np.repeat(np.arange(r0, r1, dtype=np.int32),
                                nx)),
             pa.array(np.tile(np.arange(nx, dtype=np.int32), nrows)),
             pa.array(arr.ravel())],
            names=["file", "band", "py", "px", "value"])


class GsgDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gsg"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return GsgReader(self.options)
