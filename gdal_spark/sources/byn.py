"""NRCan BYN geoid-grid raster source — a Spark 4 Python DataSource;
frmts/raw/byndataset.cpp in the reference (studied for the 80-byte
header field offsets + the nScale/nByteOrder rules; NOT a port).

Header (little-endian fields): south/north/west/east int32 (arcsec,
or milli-arcsec-scaled when nScale==1), dLat/dLon int16, data factor
double at 24, nSizeOf at 32 (2 → int16, 4 → int32), nByteOrder at 48
(1 → LSB data, else MSB — the shipped fixture is MSB, pinned by the
position-sensitive published checksum 64764). Data starts at the NW
corner (top-down, no flip) at offset 80; rows are seekable →
row-block InputPartitions with closed-form offsets."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA

BYN_HDR_SZ = 80


def byn_header(path: str) -> dict:
    with open(path, "rb") as fh:
        h = fh.read(BYN_HDR_SZ)
    south, north, west, east = struct.unpack("<4i", h[0:16])
    dlat, dlon = struct.unpack("<2h", h[16:20])
    (factor,) = struct.unpack("<d", h[24:32])
    sizeof, _vdatum = struct.unpack("<2h", h[32:36])
    byteorder, scale = struct.unpack("<2h", h[48:52])
    if sizeof not in (2, 4):
        raise ValueError(f"{path}: unsupported BYN nSizeOf {sizeof}")
    mult = 1000.0 if scale == 1 else 1.0
    ny = int(round((north - south) / float(dlat))) + 1
    nx = int(round((east - west) / float(dlon))) + 1
    bo = "<" if byteorder == 1 else ">"
    return {"path": path, "nx": nx, "ny": ny,
            "dtype": f"{bo}i{sizeof}", "itemsize": sizeof,
            "south": south * mult, "north": north * mult,
            "west": west * mult, "east": east * mult,
            "dlat": dlat * mult, "dlon": dlon * mult,
            "factor": factor, "off": BYN_HDR_SZ}


def byn_geotransform(m: dict) -> tuple:
    return ((m["west"] - m["dlon"] / 2.0) / 3600.0,
            m["dlon"] / 3600.0, 0.0,
            (m["north"] + m["dlat"] / 2.0) / 3600.0, 0.0,
            -m["dlat"] / 3600.0)


class BynBlock(InputPartition):
    def __init__(self, meta, r0, r1):
        self.meta = meta
        self.r0 = r0
        self.r1 = r1


class BynReader(DataSourceReader):
    ROWS_PER_BLOCK = 1024

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("byn source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [byn_header(p) for p in paths]

    def partitions(self):
        return [BynBlock(m, r0, min(r0 + self.ROWS_PER_BLOCK,
                                    m["ny"]))
                for m in self.metas
                for r0 in range(0, m["ny"], self.ROWS_PER_BLOCK)]

    def read(self, part: BynBlock):
        import numpy as np
        import pyarrow as pa
        m, r0, r1 = part.meta, part.r0, part.r1
        nx = m["nx"]
        with open(m["path"], "rb") as fh:
            fh.seek(m["off"] + r0 * nx * m["itemsize"])
            raw = fh.read((r1 - r0) * nx * m["itemsize"])
        arr = np.frombuffer(raw, dtype=m["dtype"]).reshape(
            r1 - r0, nx).astype(np.float64)
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


class BynDataSource(DataSource):
    @classmethod
    def name(cls):
        return "byn"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return BynReader(self.options)
