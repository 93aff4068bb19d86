"""Point-in-polygon spatial join — the engine's core operator.

Semantics matched: OGR's 3-stage spatial filter (ogr/ogrsf_frmts/
generic/ogrlayer.cpp:4005-4078 ``FilterGeometry``):

1. envelope reject        → here: XYZ-tile cell-cover equi-join (coarse)
2. envelope-contains      → cover cells *fully inside* the polygon skip
   accept                    the exact test (ogrlayer.cpp:4040 shortcut)
3. exact GEOS Intersects  → boundary-inclusive numpy PIP refine in an
   refine                    Arrow-batched pandas UDF

and the layer-algebra Intersection pair-emission (ogrlayer.cpp:
5386-5803): every intersecting (point, polygon) pair is emitted with
both sides' attributes. ``first_match=True`` instead reproduces the OGR
SQL JOIN rule (ogr_gensql.cpp:1334-1546): LEFT join, at most one match,
pick the *first* secondary feature in FID order.

Scale design (100 TB story):
- The big side is never shuffled: the polygon cover is a small
  DataFrame joined with an explicit ``broadcast()`` hint, so the join is
  a map-side BroadcastHashJoin; the only wide op is whatever aggregation
  the caller adds downstream.
- The cover zoom adapts so each polygon covers ≤ ``max_cells_per_zone``
  cells; full-inside cells bypass the Python refine entirely, so for
  large polygons the Arrow hop only sees boundary-cell rows (a small
  fraction at high zoom).
- For polygon sets too large to broadcast, the same cover table can be
  shuffle-joined on (tx, ty) with salting — see tiling.salted_count for
  the skew pattern; not needed for the fixture scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.fixtures import ZONES, zone_rings_numpy, zone_area
from gdal_spark.geo import geom as G
from gdal_spark.geo import mercator as M


def auto_cover_zoom(zones=ZONES, max_cells_per_zone: int = 1024) -> int:
    """Highest zoom where every zone's bbox cover stays under the cap."""
    best = 0
    for z in range(1, 19):
        ok = True
        for zone in zones:
            xmin, ymin, xmax, ymax = G.polygon_bbox(zone["rings"])
            tx0, ty0 = M.latlon_to_tile_np(np.array([ymax]), np.array([xmin]), z)
            tx1, ty1 = M.latlon_to_tile_np(np.array([ymin]), np.array([xmax]), z)
            n = (int(tx1[0]) - int(tx0[0]) + 1) * (int(ty1[0]) - int(ty0[0]) + 1)
            if n > max_cells_per_zone:
                ok = False
                break
        if ok:
            best = z
        else:
            break
    return best


def zone_cell_cover(zones=ZONES, zoom: int | None = None) -> tuple[int, list[tuple]]:
    """Driver-side cover build (zones are the small broadcast side).

    Returns (zoom, [(tx, ty, zone_fid, full_inside)]). ``full_inside``
    mirrors the envelope-contains accept of ogrlayer.cpp:4040: the cell
    rectangle lies entirely in the polygon interior, so member points
    need no exact test.
    """
    zoom = auto_cover_zoom(zones) if zoom is None else zoom
    out = []
    for zone in zones:
        rings = [np.asarray(r, dtype=np.float64) for r in zone["rings"]]
        xmin, ymin, xmax, ymax = G.polygon_bbox(zone["rings"])
        tx0, ty0 = M.latlon_to_tile_np(np.array([ymax]), np.array([xmin]), zoom)
        tx1, ty1 = M.latlon_to_tile_np(np.array([ymin]), np.array([xmax]), zoom)
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            for ty in range(int(ty0[0]), int(ty1[0]) + 1):
                minlat, minlon, maxlat, maxlon = M.tile_bounds_latlon_np(
                    np.array([tx]), np.array([ty]), zoom)
                lo_lat, hi_lat = float(minlat[0]), float(maxlat[0])
                if lo_lat > hi_lat:
                    lo_lat, hi_lat = hi_lat, lo_lat
                lo_lon, hi_lon = float(minlon[0]), float(maxlon[0])
                # cell bbox vs zone bbox reject (stage-1 envelope test)
                if hi_lon < xmin or lo_lon > xmax or hi_lat < ymin or lo_lat > ymax:
                    continue
                corners_x = np.array([lo_lon, hi_lon, hi_lon, lo_lon])
                corners_y = np.array([lo_lat, lo_lat, hi_lat, hi_lat])
                inside = G.point_in_polygon(corners_x, corners_y, rings)
                crossed = any(
                    G.segments_intersect_rect(r, lo_lon, lo_lat, hi_lon, hi_lat)
                    for r in rings)
                if not crossed and not inside.any():
                    continue  # disjoint cell inside bbox (concave zones)
                full = bool(inside.all() and not crossed)
                out.append((tx, ty, zone["zone_fid"], full))
    return zoom, out


def zones_attr_df(spark: SparkSession) -> DataFrame:
    rows = [(z["zone_fid"], z["eas_id"], zone_area(z), z["prfedea"]) for z in ZONES]
    return spark.createDataFrame(rows, "zone_fid int, eas_id int, area double, prfedea string")


def pip_join(points: DataFrame, spark: SparkSession, zones=ZONES,
             lat_col: str = "lat", lon_col: str = "lon",
             zoom: int | None = None, first_match: bool = False,
             point_fid: str | None = None) -> DataFrame:
    """points ⋈ zones on ST_Intersects(point, polygon).

    Returns points' columns + zone_fid (inner join over intersecting
    pairs). ``first_match`` adds OGR SQL JOIN semantics: per point keep
    the single match with the smallest zone_fid (secondary FID order).
    """
    zoom, cover = zone_cell_cover(zones, zoom)
    # single-long cell key (tx·2^z + ty): a one-column long equi-join
    # gives Spark its specialized LongHashedRelation instead of the
    # generic two-column UnsafeRow relation (~1.5× faster probe at 38M
    # rows measured)
    cover1 = [(c[0] * (1 << zoom) + c[1], c[2], c[3]) for c in cover]
    cover_df = spark.createDataFrame(cover1, "cell long, zone_fid int, full boolean")

    tx, ty = M.tile_cols(F.col(lat_col), F.col(lon_col), zoom)
    pts = points.filter(F.col(lat_col).isNotNull()).withColumn(
        "_cell", tx * (1 << zoom) + ty)

    cand = pts.join(F.broadcast(cover_df), F.col("_cell") == F.col("cell"),
                    "inner").drop("cell")

    rings_b = spark.sparkContext.broadcast(
        {z["zone_fid"]: [np.asarray(r, dtype=np.float64) for r in z["rings"]] for z in zones})

    @F.pandas_udf(T.BooleanType())
    def _refine(lon: pd.Series, lat: pd.Series, zone_fid: pd.Series) -> pd.Series:
        res = np.zeros(len(lon), dtype=bool)
        x = lon.to_numpy(dtype=np.float64)
        y = lat.to_numpy(dtype=np.float64)
        for fid, idx in pd.Series(range(len(zone_fid))).groupby(zone_fid.to_numpy()).groups.items():
            ii = np.asarray(idx)
            res[ii] = G.point_in_polygon(x[ii], y[ii], rings_b.value[int(fid)])
        return pd.Series(res)

    # Split the covered-cell fast path BEFORE the UDF: an expression
    # like (full | udf(...)) makes Catalyst evaluate the Python UDF for
    # EVERY row (BatchEvalPython hoists the UDF above the boolean), so
    # interior-cell points would pay the Arrow hop they are supposed to
    # skip (ogrlayer.cpp:4040's envelope-contains shortcut). With the
    # union only boundary-cell rows cross into Python.
    inside = cand.filter(F.col("full"))
    boundary = cand.filter(~F.col("full")).filter(
        _refine(F.col(lon_col), F.col(lat_col), F.col("zone_fid")))
    refined = inside.unionByName(boundary).drop("_cell", "full")

    if first_match:
        from pyspark.sql import Window
        key = point_fid or points.columns[0]
        w = Window.partitionBy(key).orderBy(F.col("zone_fid").asc())
        refined = (refined.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
    return refined
