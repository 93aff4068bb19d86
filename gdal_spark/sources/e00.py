"""Arc/Info E00 (AVCE00 interchange) vector source — a Spark 4
Python DataSource; ogr/ogrsf_frmts/avc in the reference (NOT a
port; the section grammar re-derived from the shipped fixtures and
the public E00 description).

Sections parsed: ARC (arc records: id, userid, fnode, tnode, lpoly,
rpoly, npts + coordinate pairs, two per line), LAB (label points:
id, polyid, x, y), PAL (polygon arc lists: numarcs + bbox, then
(arcid, fnode, adjpoly) triples — the first record is the universe
polygon and is skipped, like the reference's PAL layer). Polygon
rings assemble by CHAINING arcs end-to-end in listed order (the
arcid sign is left/right topology, not travel direction — pinned by
the published last-polygon WKT of testpoly.e00); a zero arcid
separates rings (holes).

Layers via the ``layer`` option: ``arc`` → LINESTRING + user_id,
``lab`` → POINT + polygon id, ``pal`` → POLYGON + arc-id list.
Published pins (ogr_avc.py): ARC UserID [1..7] with the first-arc
LINESTRING; LAB count 80 (testpoint.e00); PAL count 3 with last
ArcIds [-4, -5] and its 4-vertex ring.

Scale shape: E00 is a sequential ASCII stream (the reference's
reader shares the constraint) — one partition per file; its corpus
role is the ingest edge before a columnar rewrite."""

from __future__ import annotations

import glob as _glob
import os

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,
                               IntegerType, LongType, StringType,
                               StructField, StructType)


def _floats(line):
    return [float(t) for t in line.split()]


def parse_e00(path: str) -> dict:
    """→ {"arc": [(id, userid, fnode, tnode, lpoly, rpoly, pts)],
    "lab": [(id, polyid, x, y)], "pal": [(arcids, rings)]}."""
    with open(path, "r", encoding="latin-1") as fh:
        lines = fh.read().splitlines()
    i = 0
    arcs, labs, pals = [], [], []
    n = len(lines)
    while i < n:
        tok = lines[i].split()
        key = tok[0] if tok else ""
        if key == "ARC":
            i += 1
            while i < n:
                hdr = [int(t) for t in lines[i].split()]
                i += 1
                if hdr[0] == -1:
                    break
                aid, uid, fn, tn, lp, rp, npts = hdr[:7]
                vals = []
                while len(vals) < 2 * npts:
                    vals += _floats(lines[i])
                    i += 1
                pts = np.asarray(vals, dtype=np.float64)\
                    .reshape(npts, 2)
                arcs.append((aid, uid, fn, tn, lp, rp, pts))
        elif key == "LAB":
            i += 1
            while i < n:
                t = lines[i].split()
                i += 1
                if int(t[0]) == -1:
                    break
                labs.append((int(t[0]), int(t[1]),
                             float(t[2]), float(t[3])))
                i += 1  # skip the bbox line
        elif key == "PAL":
            i += 1
            while i < n:
                hdr = lines[i].split()
                if int(hdr[0]) == -1:
                    i += 1
                    break
                narcs = int(hdr[0])
                i += 1
                trips = []
                while len(trips) < 3 * narcs:
                    trips += [int(t) for t in lines[i].split()]
                    i += 1
                arcids = [trips[3 * k] for k in range(narcs)]
                pals.append(arcids)
        else:
            i += 1
    # assemble PAL rings (skip the universe polygon, record 0)
    arc_by_id = {a[0]: a[6] for a in arcs}
    out_pals = []
    for arcids in pals[1:]:
        rings, cur = [], []
        prev_aid = 0
        for aid in arcids:
            if aid == 0:
                if cur:
                    rings.append(np.asarray(cur))
                    cur = []
                continue
            pts = arc_by_id.get(abs(aid))
            if pts is None:
                continue
            if not cur:
                cur = [tuple(p) for p in pts]
            else:
                end = cur[-1]
                if tuple(pts[0]) == end:
                    cur += [tuple(p) for p in pts[1:]]
                elif tuple(pts[-1]) == end:
                    cur += [tuple(p) for p in pts[::-1][1:]]
                elif (len(cur) and
                      (tuple(pts[0]) == cur[0]
                       or tuple(pts[-1]) == cur[0])
                      and cur == [tuple(p) for p in
                                  arc_by_id.get(abs(prev_aid),
                                                [])]):
                    # the FIRST arc was emitted in the wrong travel
                    # direction — flip it so this arc chains (the
                    # arcid sign is topology, not orientation)
                    cur = cur[::-1]
                    end = cur[-1]
                    if tuple(pts[0]) == end:
                        cur += [tuple(p) for p in pts[1:]]
                    else:
                        cur += [tuple(p) for p in pts[::-1][1:]]
                else:  # disjoint: start a new ring
                    rings.append(np.asarray(cur))
                    cur = [tuple(p) for p in pts]
            prev_aid = aid
        if cur:
            rings.append(np.asarray(cur))
        out_pals.append((arcids, rings))
    return {"arc": arcs, "lab": labs, "pal": out_pals}


E00_SCHEMAS = {
    "arc": StructType([
        StructField("file", StringType()),
        StructField("fid", LongType()),
        StructField("arc_id", IntegerType()),
        StructField("user_id", IntegerType()),
        StructField("fnode", IntegerType()),
        StructField("tnode", IntegerType()),
        StructField("lpoly", IntegerType()),
        StructField("rpoly", IntegerType()),
        StructField("n_points", IntegerType()),
        StructField("wkb", BinaryType()),
    ]),
    "lab": StructType([
        StructField("file", StringType()),
        StructField("fid", LongType()),
        StructField("label_id", IntegerType()),
        StructField("poly_id", IntegerType()),
        StructField("wkb", BinaryType()),
    ]),
    "pal": StructType([
        StructField("file", StringType()),
        StructField("fid", LongType()),
        StructField("arc_ids", ArrayType(IntegerType())),
        StructField("n_rings", IntegerType()),
        StructField("n_points", IntegerType()),
        StructField("wkb", BinaryType()),
    ]),
}


class E00Partition(InputPartition):
    def __init__(self, path, layer):
        self.path = path
        self.layer = layer


class E00Reader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("e00 source requires a path")
        self.layer = options.get("layer", "arc")
        self.paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]

    def partitions(self):
        return [E00Partition(p, self.layer) for p in self.paths]

    def read(self, part):
        import pyarrow as pa

        from gdal_spark.geo import wkb as W
        data = parse_e00(part.path)
        fname = os.path.basename(part.path)
        layer = part.layer
        rows = []
        if layer == "arc":
            for fid, (aid, uid, fn, tn, lp, rp, pts) in enumerate(
                    data["arc"]):
                rows.append({"file": fname, "fid": fid, "arc_id": aid,
                             "user_id": uid, "fnode": fn, "tnode": tn,
                             "lpoly": lp, "rpoly": rp,
                             "n_points": len(pts),
                             "wkb": W.linestring_wkb(pts)})
        elif layer == "lab":
            for fid, (lid, pid, x, y) in enumerate(data["lab"]):
                rows.append({"file": fname, "fid": fid,
                             "label_id": lid, "poly_id": pid,
                             "wkb": W.point_wkb(x, y)})
        else:
            for fid, (arcids, rings) in enumerate(data["pal"]):
                npts = int(sum(len(r) for r in rings))
                rows.append({"file": fname, "fid": fid,
                             "arc_ids": arcids,
                             "n_rings": len(rings),
                             "n_points": npts,
                             "wkb": (W.polygon_wkb(rings)
                                     if rings else None)})
        schema = E00_SCHEMAS[layer]
        _pa = {"string": pa.string(), "bigint": pa.int64(),
               "int": pa.int32(), "binary": pa.binary(),
               "double": pa.float64(),
               "array<int>": pa.list_(pa.int32())}
        arrays = [pa.array([r.get(f.name) for r in rows],
                           type=_pa[f.dataType.simpleString()])
                  for f in schema.fields]
        yield pa.record_batch(arrays,
                              names=[f.name for f in schema.fields])


class E00DataSource(DataSource):
    @classmethod
    def name(cls):
        return "e00"

    def schema(self):
        return E00_SCHEMAS[self.options.get("layer", "arc")]

    def reader(self, schema):
        return E00Reader(self.options)
