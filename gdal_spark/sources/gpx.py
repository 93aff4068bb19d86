"""GPX (GPS Exchange Format 1.1) vector source — a Spark 4 Python
DataSource over stdlib ElementTree; behavioral reference:
``ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp`` (NOT a port). Exposes the
reference's five-layer model via the ``layer`` option:

  waypoints     <wpt>     → POINT, ele/time/name/cmt/desc/src +
                            linkN_{href,text,type} columns
  routes        <rte>     → LINESTRING over <rtept> (EMPTY when none)
  route_points  <rtept>   → POINT + route_fid / route_point_id
  tracks        <trk>     → MULTILINESTRING over <trkseg> (EMPTY when
                            no segment has points — the published
                            'empty track' / 'empty track 2' pins)
  track_points  <trkpt>   → POINT + track_fid / track_seg_id /
                            track_seg_point_id

Scale shape: an XML document is one parse unit, so the file is the
partition grain (same single-cursor constraint as the reference's
expat stream); multi-file globs fan out. GPX corpora at engine scale
are ingested once and rewritten columnar — this source is that ingest
edge, parsed entirely on executors."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField,
                               StructType)

_WPT_FIELDS = ["ele", "time", "name", "cmt", "desc", "src"]


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child_text(el, name):
    for c in el:
        if _strip(c.tag) == name:
            return c.text
    return None


def _links(el):
    out = []
    for c in el:
        if _strip(c.tag) == "link":
            out.append((c.get("href"),
                        _child_text(c, "text"), _child_text(c, "type")))
    return out


def gpx_schema(layer: str) -> StructType:
    base = [StructField("file", StringType()),
            StructField("fid", LongType())]
    pt = [StructField("lat", DoubleType()),
          StructField("lon", DoubleType()),
          StructField("ele", DoubleType()),
          StructField("time", StringType()),
          StructField("name", StringType()),
          StructField("wkb", BinaryType())]
    if layer == "waypoints":
        return StructType(base + pt[:4] + [
            StructField("name", StringType()),
            StructField("cmt", StringType()),
            StructField("desc", StringType()),
            StructField("src", StringType())] + [
            StructField(f"link{i}_{k}", StringType())
            for i in (1, 2) for k in ("href", "text", "type")] + [
            StructField("wkb", BinaryType())])
    if layer == "routes":
        return StructType(base + [
            StructField("name", StringType()),
            StructField("n_points", IntegerType()),
            StructField("wkb", BinaryType())])
    if layer == "tracks":
        return StructType(base + [
            StructField("name", StringType()),
            StructField("n_segs", IntegerType()),
            StructField("n_points", IntegerType()),
            StructField("wkb", BinaryType())])
    if layer == "route_points":
        return StructType(base + [
            StructField("route_fid", LongType()),
            StructField("route_point_id", LongType())] + pt)
    if layer == "track_points":
        return StructType(base + [
            StructField("track_fid", LongType()),
            StructField("track_seg_id", LongType()),
            StructField("track_seg_point_id", LongType())] + pt)
    raise ValueError(f"unknown gpx layer {layer!r}")


class GpxPartition(InputPartition):
    def __init__(self, path, layer):
        self.path = path
        self.layer = layer


class GpxReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gpx source requires a path")
        self.layer = options.get("layer", "waypoints")
        self.paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]

    def partitions(self):
        return [GpxPartition(p, self.layer) for p in self.paths]

    def read(self, part):
        import xml.etree.ElementTree as ET

        import pyarrow as pa

        from gdal_spark.geo import wkb as W
        root = ET.parse(part.path).getroot()
        fname = os.path.basename(part.path)
        layer = part.layer
        rows = []

        def _pt_cols(el):
            lat = float(el.get("lat"))
            lon = float(el.get("lon"))
            ele = _child_text(el, "ele")
            return {"lat": lat, "lon": lon,
                    "ele": None if ele is None else float(ele),
                    "time": _child_text(el, "time"),
                    "name": _child_text(el, "name"),
                    "wkb": W.point_wkb(lon, lat)}

        wpts = [e for e in root if _strip(e.tag) == "wpt"]
        rtes = [e for e in root if _strip(e.tag) == "rte"]
        trks = [e for e in root if _strip(e.tag) == "trk"]
        if layer == "waypoints":
            for fid, el in enumerate(wpts):
                r = _pt_cols(el)
                r.update({"file": fname, "fid": fid,
                          "cmt": _child_text(el, "cmt"),
                          "desc": _child_text(el, "desc"),
                          "src": _child_text(el, "src")})
                ln = _links(el)
                for i in (1, 2):
                    h, t, y = (ln[i - 1] if len(ln) >= i
                               else (None, None, None))
                    r[f"link{i}_href"] = h
                    r[f"link{i}_text"] = t
                    r[f"link{i}_type"] = y
                rows.append(r)
        elif layer == "routes":
            for fid, el in enumerate(rtes):
                pts = [(float(p.get("lon")), float(p.get("lat")))
                       for p in el if _strip(p.tag) == "rtept"]
                rows.append({"file": fname, "fid": fid,
                             "name": _child_text(el, "name"),
                             "n_points": len(pts),
                             "wkb": W.linestring_wkb(pts)})
        elif layer == "tracks":
            for fid, el in enumerate(trks):
                segs = []
                for s in el:
                    if _strip(s.tag) != "trkseg":
                        continue
                    pts = [(float(p.get("lon")), float(p.get("lat")))
                           for p in s if _strip(p.tag) == "trkpt"]
                    if pts:  # empty segments collapse (OGR pin:
                        segs.append(pts)  # 'empty track 2' is EMPTY)
                rows.append({"file": fname, "fid": fid,
                             "name": _child_text(el, "name"),
                             "n_segs": len(segs),
                             "n_points": sum(map(len, segs)),
                             "wkb": W.multilinestring_wkb(segs)})
        elif layer == "route_points":
            fid = 0
            for rfid, el in enumerate(rtes):
                pid = 0
                for p in el:
                    if _strip(p.tag) != "rtept":
                        continue
                    r = _pt_cols(p)
                    r.update({"file": fname, "fid": fid,
                              "route_fid": rfid,
                              "route_point_id": pid})
                    rows.append(r)
                    fid += 1
                    pid += 1
        elif layer == "track_points":
            fid = 0
            for tfid, el in enumerate(trks):
                sid = 0
                for s in el:
                    if _strip(s.tag) != "trkseg":
                        continue
                    pid = 0
                    for p in s:
                        if _strip(p.tag) != "trkpt":
                            continue
                        r = _pt_cols(p)
                        r.update({"file": fname, "fid": fid,
                                  "track_fid": tfid,
                                  "track_seg_id": sid,
                                  "track_seg_point_id": pid})
                        rows.append(r)
                        fid += 1
                        pid += 1
                    sid += 1
        schema = gpx_schema(layer)
        _pa = {"string": pa.string(), "bigint": pa.int64(),
               "double": pa.float64(), "binary": pa.binary(),
               "int": pa.int32()}
        arrays = [pa.array([r.get(f.name) for r in rows],
                           type=_pa[f.dataType.simpleString()])
                  for f in schema.fields]
        yield pa.record_batch(arrays,
                              names=[f.name for f in schema.fields])


class GpxDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gpx"

    def schema(self):
        return gpx_schema(self.options.get("layer", "waypoints"))

    def reader(self, schema):
        return GpxReader(self.options)
