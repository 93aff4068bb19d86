"""GIF raster file source — a Spark 4 Python DataSource, from
scratch, stdlib-only.

The second real raster FORMAT DRIVER beside sources/tiff.py (the
reference gets this from frmts/gif via giflib): GIF87a/89a screen
descriptor, global/local color tables, extension-block skipping,
image descriptors, the GIF flavor of LZW (LSB-first bit packing,
variable initial code size, CLEAR/EOI at 2^N/2^N+1, width grows at
table size 2^width with NO early change — the opposite packing of
TIFF-LZW in sources/tiff.py), sub-block reassembly, and 4-pass
interlace row ordering.

Emitted schema is the engine's pixel convention (file, band, py, px,
value) with value = the palette INDEX (GDAL's Byte band with a color
table); gif_palette() exposes the color table for rgbExpand-style
pipelines (gdal.Translate rgbExpand="rgb",
apps/gdal_translate_lib.cpp). A GIF image is one sequential LZW
stream, so each image is one InputPartition — the same constraint a
single-strip TIFF has.

Parity anchor: bug407.gif (400×400, interlaced, 16-color GCT)
expanded through the palette reproduces the reference's published
per-band checksums 20615/59147/63052
(autotest/utilities/test_gdal_translate_lib.py:158-162).
"""

from __future__ import annotations

import struct

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from gdal_spark.sources.tiff import PIXEL_SCHEMA


def gif_lzw_decode(data: bytes, min_code_size: int,
                   expected: int) -> bytes:
    """GIF LZW (GIF89a spec appendix F): LSB-first packing, initial
    code width min_code_size+1, CLEAR = 2^N, EOI = 2^N+1, width grows
    when the table fills 2^width (no early change), capped at 12."""
    CLEAR = 1 << min_code_size
    EOI = CLEAR + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(CLEAR)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    bitbuf = nbits = pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _parse(path: str) -> dict:
    """Driver-side parse: screen descriptor, color tables, first
    image descriptor + its compressed sub-blocks' byte range."""
    with open(path, "rb") as fh:
        b = fh.read()
    if b[:3] != b"GIF":
        raise ValueError("not a GIF")
    flags = b[10]
    gct = None
    pos = 13
    if flags >> 7 & 1:
        n = 2 ** ((flags & 7) + 1)
        gct = [(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
               for i in range(n)]
        pos += 3 * n
    while pos < len(b):
        c = b[pos]
        if c == 0x21:          # extension: label then sub-blocks
            q = pos + 2
            while b[q]:
                q += b[q] + 1
            pos = q + 1
        elif c == 0x2C:        # image descriptor
            x, y, iw, ih = struct.unpack("<HHHH", b[pos + 1:pos + 9])
            f2 = b[pos + 9]
            pos += 10
            pal = gct
            if f2 >> 7 & 1:
                n = 2 ** ((f2 & 7) + 1)
                pal = [(b[pos + 3 * i], b[pos + 3 * i + 1],
                        b[pos + 3 * i + 2]) for i in range(n)]
                pos += 3 * n
            mcs = b[pos]
            pos += 1
            # concatenate sub-blocks
            chunks = []
            while b[pos]:
                ln = b[pos]
                chunks.append(b[pos + 1:pos + 1 + ln])
                pos += ln + 1
            return {"path": path, "w": iw, "h": ih,
                    "interlaced": bool((f2 >> 6) & 1),
                    "palette": pal, "min_code_size": mcs,
                    "data": b"".join(chunks)}
        elif c == 0x3B:        # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{c:02x}")
    raise ValueError("GIF has no image descriptor")


def gif_palette(path: str) -> list:
    """The image's color table as (idx, r, g, b) rows — enumeration
    metadata, ≤256 rows, broadcast by consumers (the rgbExpand
    analog of tiff.tiff_colormap)."""
    m = _parse(path)
    return [(i, r, g, bl) for i, (r, g, bl) in enumerate(m["palette"])]


def _interlace_order(h: int) -> list:
    """GIF 4-pass interlace: rows 0,8,16…, then 4,12…, then 2,6…,
    then 1,3,5… — maps stored row order to display rows."""
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


class GifImagePartition(InputPartition):
    def __init__(self, meta):
        self.meta = meta


class GifReader(DataSourceReader):
    def __init__(self, options):
        import glob as _glob
        path = options.get("path")
        if not path:
            raise ValueError("gif source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.metas = [_parse(p) for p in paths]

    def partitions(self):
        return [GifImagePartition(m) for m in self.metas]

    def read(self, part: GifImagePartition):
        import os

        import numpy as np
        import pyarrow as pa
        m = part.meta
        w, h = m["w"], m["h"]
        raw = gif_lzw_decode(m["data"], m["min_code_size"], w * h)
        if len(raw) < w * h:
            raw = raw + b"\0" * (w * h - len(raw))
        elif len(raw) > w * h:
            # a malformed stream whose final LZW entry overshoots the
            # pixel count must not break the reshape below
            raw = raw[:w * h]
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        if m["interlaced"]:
            disp = np.empty_like(arr)
            disp[_interlace_order(h)] = arr
            arr = disp
        fname = os.path.basename(m["path"])
        n = h * w
        yield pa.record_batch(
            [pa.array([fname] * n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int32)),
             pa.array(np.repeat(np.arange(h, dtype=np.int32), w)),
             pa.array(np.tile(np.arange(w, dtype=np.int32), h)),
             pa.array(arr.astype(np.float64).ravel())],
            names=["file", "band", "py", "px", "value"])


class GifDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gif"

    def schema(self):
        return PIXEL_SCHEMA

    def reader(self, schema):
        return GifReader(self.options)
