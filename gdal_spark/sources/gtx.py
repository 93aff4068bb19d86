"""NOAA VDatum .gtx vertical-datum-shift grid source — a Spark 4
Python DataSource; frmts/raw/gtxdataset.cpp in the reference (NOT a
port; layout from the public VDatum GTX description).

40-byte big-endian header (lower-left lat, lon, delta-lat,
delta-lon doubles + nrows/ncols int32) then big-endian float32
samples starting at the SOUTH row — the band is the vertical flip,
pinned position-sensitively by the published checksum 64183
(autotest/gdrivers/gtx.py). -88.8888 is the format's nodata marker.
Rows are seekable → row-block InputPartitions with closed-form
offsets (same scale shape as sources/gsg.py binary dialects)."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA

GTX_NODATA = -88.8888


def gtx_header(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(40)
    lat0, lon0, dlat, dlon = struct.unpack(">4d", head[:32])
    nrows, ncols = struct.unpack(">2i", head[32:40])
    return {"path": path, "lat0": lat0, "lon0": lon0, "dlat": dlat,
            "dlon": dlon, "ny": nrows, "nx": ncols, "off": 40}


def gtx_geotransform(m: dict) -> tuple:
    # node-centered like GTX consumers expect: origin half a cell
    # out from the northern-most node
    top = m["lat0"] + m["dlat"] * (m["ny"] - 1)
    return (m["lon0"] - m["dlon"] / 2.0, m["dlon"], 0.0,
            top + m["dlat"] / 2.0, 0.0, -m["dlat"])


class GtxBlock(InputPartition):
    def __init__(self, meta, r0, r1):
        self.meta = meta
        self.r0 = r0
        self.r1 = r1


class GtxReader(DataSourceReader):
    ROWS_PER_BLOCK = 1024

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gtx source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [gtx_header(p) for p in paths]

    def partitions(self):
        return [GtxBlock(m, r0, min(r0 + self.ROWS_PER_BLOCK,
                                    m["ny"]))
                for m in self.metas
                for r0 in range(0, m["ny"], self.ROWS_PER_BLOCK)]

    def read(self, part: GtxBlock):
        import numpy as np
        import pyarrow as pa
        m, r0, r1 = part.meta, part.r0, part.r1
        nx, ny = m["nx"], m["ny"]
        g_lo = ny - r1   # band rows r0..r1 = grid rows (bottom-up)
        with open(m["path"], "rb") as fh:
            fh.seek(m["off"] + g_lo * nx * 4)
            raw = fh.read((r1 - r0) * nx * 4)
        arr = np.frombuffer(raw, dtype=">f4").reshape(
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


class GtxDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gtx"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return GtxReader(self.options)
