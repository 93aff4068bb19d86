"""MapInfo Interchange Format (.mif/.mid) vector source — a Spark 4
Python DataSource built from the public MIF format description;
behavioral reference: ``ogr/ogrsf_frmts/mitab/mitab_miffile.cpp``
(NOT a port — the reference streams features sequentially through one
cursor; here the driver does ONE light text pass to index per-feature
byte offsets in both files, then plans record-range InputPartitions
that executors parse independently).

Scale shape: MIF has no record index sidecar (unlike .shx), so the
driver's offset pass is the format's inherent cost — it reads lines,
never parses geometry. Feature payload parsing is fully distributed.
(At real scale this source is the ingest step before a columnar
rewrite, same as the reference's ogr2ogr MIF→anything usage.)

Geometry mapping follows the shipped golden
``autotest/ogr/data/mitab/all_geoms.mif.golden.csv`` + the published
small.mif pins (ogr_mitab.py test_ogr_mitab_10):
  Point → POINT; Line / single-section Pline → LINESTRING;
  PLINE MULTIPLE → MULTILINESTRING; Region → POLYGON (multi-ring
  regions organized by winding, holes attached); Rect → the 5-point
  CCW envelope ring; Multipoint → MULTIPOINT. RoundRect / Ellipse /
  Arc / Text need OGR's curve-stroking rules and are surfaced as
  shape_type with NULL wkb (documented stub); Collection members are
  parsed and surfaced as a GEOMETRYCOLLECTION row count.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (BinaryType, BooleanType, DateType,
                               DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

_GEOM_KEYWORDS = ("point", "line", "pline", "region", "rect",
                  "roundrect", "ellipse", "arc", "text", "multipoint",
                  "collection", "none")
_STYLE_KEYWORDS = ("pen", "brush", "symbol", "smooth", "center",
                   "font", "spacing", "justify", "angle", "label")


def _mif_type(decl: str):
    t = decl.lower()
    if t.startswith(("integer", "smallint")):
        return LongType()
    if t.startswith(("float", "decimal")):
        return DoubleType()
    if t.startswith("date"):
        return DateType()
    if t.startswith("logical"):
        return BooleanType()
    return StringType()


def mif_header(path: str) -> dict:
    """Parse the MIF header + index feature start offsets (driver
    pass: line reads only). Returns fields, delimiter, and the byte
    offset of each feature's geometry block in .mif plus each
    record's line offset in .mid."""
    fields, delim, starts = [], "\t", []
    with open(path, "rb") as fh:
        in_columns = 0
        in_data = False
        skip_members = 0
        off = 0
        for raw in fh:
            line = raw.decode("latin-1").strip()
            low = line.lower()
            if not in_data:
                if low.startswith("delimiter"):
                    q = line.split('"')
                    if len(q) >= 2:
                        delim = q[1]
                elif low.startswith("columns"):
                    in_columns = int(line.split()[1])
                elif in_columns > 0 and line:
                    # column declarations bind tighter than the Data
                    # marker — a column may be NAMED "DATA"
                    name, decl = line.split(None, 1)
                    fields.append((name, decl))
                    in_columns -= 1
                elif low == "data":
                    in_data = True
            else:
                word = low.split(" ")[0].split("\t")[0] if line else ""
                if word in _GEOM_KEYWORDS:
                    if skip_members > 0:
                        # member geometry of a Collection — belongs
                        # to the collection feature, not a new one
                        skip_members -= 1
                    else:
                        starts.append(off)
                        if word == "collection":
                            skip_members = int(low.split()[1])
            off += len(raw)
        end = off
    mid = os.path.splitext(path)[0] + ".mid"
    if not os.path.exists(mid):
        mid = os.path.splitext(path)[0] + ".MID"
    mid_offsets = []
    if os.path.exists(mid) and fields:
        with open(mid, "rb") as fh:
            o = 0
            for raw in fh:
                mid_offsets.append(o)
                o += len(raw)
            mid_offsets.append(o)
    return {"path": path, "mid": mid if mid_offsets else None,
            "fields": fields, "delim": delim,
            "starts": starts + [end], "mid_offsets": mid_offsets}


# --------------------------------------------------------- geometry ---

def _floats(tokens):
    return [float(t) for t in tokens]


class _Cursor:
    def __init__(self, lines):
        self.lines = lines
        self.i = 0

    def peek(self):
        while self.i < len(self.lines) and not self.lines[self.i].strip():
            self.i += 1
        return (self.lines[self.i].strip()
                if self.i < len(self.lines) else None)

    def take(self):
        ln = self.peek()
        if ln is not None:
            self.i += 1
        return ln


def _read_points(cur, n):
    pts = []
    while len(pts) < n:
        toks = cur.take().replace(",", " ").split()
        vals = _floats(toks)
        for j in range(0, len(vals), 2):
            pts.append((vals[j], vals[j + 1]))
    return np.asarray(pts, dtype=np.float64)


def parse_geometry(cur: _Cursor):
    """One geometry block → (shape_type, wkb | None). The cursor is
    left positioned after the block's style clauses."""
    from gdal_spark.geo import wkb as W
    from gdal_spark.sources.shapefile import organize_rings
    header = cur.take()
    toks = header.split()
    kw = toks[0].lower()
    st, out = kw.capitalize(), None
    if kw == "none":
        st = "None"
    elif kw == "point":
        x, y = _floats(toks[1:3])
        out = W.point_wkb(x, y)
    elif kw == "line":
        x1, y1, x2, y2 = _floats(toks[1:5])
        out = W.linestring_wkb([(x1, y1), (x2, y2)])
    elif kw == "pline":
        rest = toks[1:]
        if rest and rest[0].lower() == "multiple":
            nsec = int(rest[1]) if len(rest) > 1 else int(cur.take())
            parts = []
            for _ in range(nsec):
                cnt = int(cur.take().split()[0])
                parts.append(_read_points(cur, cnt))
            out = W.multilinestring_wkb(parts)
            st = "PlineMultiple"
        else:
            cnt = int(rest[0]) if rest else int(cur.take().split()[0])
            out = W.linestring_wkb(_read_points(cur, cnt))
    elif kw == "region":
        nrings = int(toks[1]) if len(toks) > 1 else int(cur.take())
        rings = []
        for _ in range(nrings):
            cnt = int(cur.take().split()[0])
            r = _read_points(cur, cnt)
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            rings.append(r)
        if len(rings) == 1:
            out = W.polygon_wkb([rings[0]])
        else:
            polys = organize_rings(rings)
            if len(polys) == 1:
                out = W.polygon_wkb([polys[0][0]] + polys[0][1])
            else:
                out = W.multipolygon_wkb(
                    [[o] + h for o, h in polys])
    elif kw == "rect":
        x1, y1, x2, y2 = _floats(toks[1:5])
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        out = W.polygon_wkb([[(x1, y1), (x2, y1), (x2, y2),
                              (x1, y2), (x1, y1)]])
    elif kw == "multipoint":
        cnt = int(toks[1]) if len(toks) > 1 else int(cur.take())
        out = W.multipoint_wkb(_read_points(cur, cnt))
    elif kw == "collection":
        nparts = int(toks[1])
        for _ in range(nparts):
            parse_geometry(cur)
        st = "Collection"
    elif kw in ("roundrect", "ellipse", "arc"):
        # curve types need OGR's stroking rules — out of scope;
        # their parameter lines ride on the header (+ arc angles
        # possibly on the next line)
        if kw == "arc" and len(toks) < 7:
            cur.take()
    elif kw == "text":
        cur.take()  # the quoted string may precede coords
        if cur.peek() and cur.peek()[0] in "-0123456789.":
            cur.take()
    # consume trailing style clauses
    while True:
        nxt = cur.peek()
        if nxt is None:
            break
        w = nxt.split("(")[0].split()[0].lower()
        if w in _STYLE_KEYWORDS:
            cur.take()
        else:
            break
    return st, out


def _split_mid(line: str, delim: str):
    out, cur_s, q = [], [], False
    i = 0
    while i < len(line):
        c = line[i]
        if q:
            if c == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    cur_s.append('"')
                    i += 1
                else:
                    q = False
            else:
                cur_s.append(c)
        else:
            if c == '"':
                q = True
            elif c == delim:
                out.append("".join(cur_s))
                cur_s = []
            else:
                cur_s.append(c)
        i += 1
    out.append("".join(cur_s))
    return out


def _mid_value(s: str, decl: str):
    import datetime as _dt
    t = decl.lower()
    s = s.strip() if not t.startswith("char") else s
    if t.startswith(("integer", "smallint")):
        return int(s) if s else None
    if t.startswith(("float", "decimal")):
        return float(s) if s else None
    if t.startswith("date"):
        s = s.strip()
        return (_dt.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
                if len(s) == 8 else None)
    if t.startswith("logical"):
        return s.upper().startswith("T") if s else None
    return s


class MifBlock(InputPartition):
    def __init__(self, meta, r0, r1):
        self.meta = meta
        self.r0 = r0
        self.r1 = r1


class MifReader(DataSourceReader):
    RECORDS_PER_BLOCK = 4096

    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("mif source requires a path")
        paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        self.rpb = int(options.get("records_per_block",
                                   self.RECORDS_PER_BLOCK))
        self.metas = [mif_header(p) for p in paths]
        self.schema = schema

    def partitions(self):
        return [MifBlock(m, r0, min(r0 + self.rpb,
                                    len(m["starts"]) - 1))
                for m in self.metas
                for r0 in range(0, len(m["starts"]) - 1, self.rpb)]

    def read(self, part: MifBlock):
        import pyarrow as pa
        m, r0, r1 = part.meta, part.r0, part.r1
        n = r1 - r0
        fname = os.path.basename(m["path"])
        with open(m["path"], "rb") as fh:
            fh.seek(m["starts"][r0])
            blob = fh.read(m["starts"][r1] - m["starts"][r0])
        text = blob.decode("latin-1")
        base = m["starts"][r0]
        cols = {"file": [fname] * n, "fid": list(range(r0, r1)),
                "shape_type": [], "wkb": []}
        for i in range(n):
            seg = text[m["starts"][r0 + i] - base:
                       m["starts"][r0 + i + 1] - base]
            st, wkb_b = parse_geometry(_Cursor(seg.splitlines()))
            cols["shape_type"].append(st)
            cols["wkb"].append(wkb_b)
        if m["mid"] is not None:
            with open(m["mid"], "rb") as fh:
                fh.seek(m["mid_offsets"][r0])
                mb = fh.read(m["mid_offsets"][
                    min(r1, len(m["mid_offsets"]) - 1)]
                    - m["mid_offsets"][r0])
            lines = mb.decode("latin-1").splitlines()
            for k, (nmf, decl) in enumerate(m["fields"]):
                vals = []
                for i in range(n):
                    if i < len(lines):
                        parts_v = _split_mid(lines[i], m["delim"])
                        vals.append(_mid_value(parts_v[k], decl)
                                    if k < len(parts_v) else None)
                    else:
                        vals.append(None)
                cols[nmf] = vals
        _pa = {"string": pa.string(), "bigint": pa.int64(),
               "double": pa.float64(), "boolean": pa.bool_(),
               "date": pa.date32(), "binary": pa.binary(),
               "int": pa.int32()}
        arrays = [pa.array(cols[f.name],
                           type=_pa[f.dataType.simpleString()])
                  for f in self.schema.fields]
        yield pa.record_batch(arrays,
                              names=[f.name for f in
                                     self.schema.fields])


def mif_schema(path: str) -> StructType:
    paths = sorted(_glob.glob(path)) if any(
        c in path for c in "*?[") else [path]
    meta = mif_header(paths[0])
    fields = [
        StructField("file", StringType()),
        StructField("fid", LongType()),
        StructField("shape_type", StringType()),
        StructField("wkb", BinaryType()),
    ]
    for name, decl in meta["fields"]:
        fields.append(StructField(name, _mif_type(decl)))
    return StructType(fields)


class MifDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mif"

    def schema(self):
        return mif_schema(self.options.get("path"))

    def reader(self, schema):
        return MifReader(self.options, schema)
