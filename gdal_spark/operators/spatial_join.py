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

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.fixtures import ZONES, zone_rings_numpy, zone_area
from gdal_spark.geo import geom as G
from gdal_spark.geo import mercator as M


def cover_cells_budget() -> int:
    """bbox-cell budget per zone for the cover zoom choice. Finer
    covers shrink the Python-refine boundary fraction (the per-row win
    grows with input size); coarser covers shrink the broadcast build
    (a per-query fixed cost). Measured knee at sf0.1 (600k points):
    16384 (z10) beats both 1024 (z8, 12.5 s — refine-bound) and 131072
    (z12, 5.5 s — probe/build-bound) at 4.4 s flagship; at the scaling
    job's 10^8-row inputs the finer default wins. Read per call so the
    bench can set it per input scale; output is IDENTICAL at any
    setting."""
    return int(os.environ.get("SPARK_GRAFT_COVER_CELLS", "131072"))


def auto_cover_zoom(zones=ZONES, max_cells_per_zone: int | None = None) -> int:
    """Highest zoom where every zone's bbox cover stays under the cap."""
    if max_cells_per_zone is None:
        max_cells_per_zone = cover_cells_budget()
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
    parts = []
    for zone in zones:
        rings = [np.asarray(r, dtype=np.float64) for r in zone["rings"]]
        zbbox = G.polygon_bbox(zone["rings"])
        txs, tys, fulls = _quad_cover(rings, zbbox, zoom)
        parts.append(pd.DataFrame({
            "tx": txs, "ty": tys,
            "zone_fid": np.full(len(txs), zone["zone_fid"], dtype=np.int32),
            "full": fulls}))
    pdf = (pd.concat(parts, ignore_index=True) if parts
           else pd.DataFrame({"tx": [], "ty": [], "zone_fid": [], "full": []}))
    return zoom, pdf


def _classify_cells(rings, zbbox, gx, gy, zoom):
    """Classify cells (gx, gy int64 arrays at ``zoom``) against one
    polygon → (keep, full) bool arrays. keep = cell intersects the
    polygon; full = cell interior entirely inside (the ogrlayer.cpp:4040
    envelope-contains accept)."""
    xmin, ymin, xmax, ymax = zbbox
    minlat, minlon, maxlat, maxlon = M.tile_bounds_latlon_np(gx, gy, zoom)
    lo_lat, hi_lat = np.minimum(minlat, maxlat), np.maximum(minlat, maxlat)
    lo_lon, hi_lon = minlon, maxlon
    keep = np.zeros(len(gx), dtype=bool)
    full = np.zeros(len(gx), dtype=bool)
    # cell bbox vs zone bbox reject (stage-1 envelope test)
    idx = np.nonzero(~((hi_lon < xmin) | (lo_lon > xmax)
                       | (hi_lat < ymin) | (lo_lat > ymax)))[0]
    if len(idx) == 0:
        return keep, full
    lo_lon, hi_lon = lo_lon[idx], hi_lon[idx]
    lo_lat, hi_lat = lo_lat[idx], hi_lat[idx]
    m = len(idx)
    # 4 corners of every candidate cell in one PIP call
    corners_x = np.concatenate([lo_lon, hi_lon, hi_lon, lo_lon])
    corners_y = np.concatenate([lo_lat, lo_lat, hi_lat, hi_lat])
    cin = G.point_in_polygon(corners_x, corners_y, rings).reshape(4, m)
    inside_all, inside_any = cin.all(axis=0), cin.any(axis=0)
    crossed = np.zeros(m, dtype=bool)
    vin = np.zeros(m, dtype=bool)       # any polygon vertex inside cell
    hole_vin = np.zeros(m, dtype=bool)  # any HOLE vertex inside cell
    for ri, r in enumerate(rings):
        crossed |= G.edges_cross_rects(r, lo_lon, lo_lat, hi_lon, hi_lat)
        rx, ry = r[:, 0][None, :], r[:, 1][None, :]
        v = ((rx >= lo_lon[:, None]) & (rx <= hi_lon[:, None])
             & (ry >= lo_lat[:, None]) & (ry <= hi_lat[:, None])).any(axis=1)
        vin |= v
        if ri > 0:
            hole_vin |= v
    # vin guard: a polygon (or hole) strictly inside one cell leaves no
    # corner-inside or edge-crossing evidence — the seed grid of the
    # quadtree build can be coarser than the zone, so test ring
    # vertices against the cell too
    keep[idx] = crossed | inside_any | vin
    full[idx] = inside_all & ~crossed & ~hole_vin
    return keep, full


def _expand_cells(tx, ty, d: int):
    """All zoom+d descendants of cells (tx, ty): (n·4^d,) arrays."""
    k = 1 << d
    off = np.arange(k, dtype=np.int64)
    ox, oy = np.meshgrid(off, off, indexing="ij")
    ox, oy = ox.ravel(), oy.ravel()
    ex = (tx[:, None] * k + ox[None, :]).ravel()
    ey = (ty[:, None] * k + oy[None, :]).ravel()
    return ex, ey


#: seed-grid budget for the quadtree cover build: the recursion starts
#: at the coarsest zoom where the zone bbox is under this many cells,
#: then subdivides only boundary cells — build work is O(perimeter /
#: cell_size), not O(area / cell_size²), so a fine final zoom (small
#: Python-refine fraction) stays cheap to construct driver-side.
COVER_SEED_CELLS = 1024


def _quad_cover(rings, zbbox, zoom: int):
    """Uniform-zoom cover of one polygon built by quadtree descent.

    Emits the same (tx, ty, full) set as classifying every bbox cell at
    ``zoom`` directly: full coarse cells expand to all-full descendants
    (strict subset of the interior), boundary cells recurse.
    """
    xmin, ymin, xmax, ymax = zbbox
    z0 = max(1, min(zoom, auto_cover_zoom(
        [{"rings": [r.tolist() for r in rings], "zone_fid": -1}],
        COVER_SEED_CELLS)))
    tx0, ty0 = M.latlon_to_tile_np(np.array([ymax]), np.array([xmin]), z0)
    tx1, ty1 = M.latlon_to_tile_np(np.array([ymin]), np.array([xmax]), z0)
    txs = np.arange(int(tx0[0]), int(tx1[0]) + 1, dtype=np.int64)
    tys = np.arange(int(ty0[0]), int(ty1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(txs, tys, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    out_x, out_y, out_f = [], [], []
    z = z0
    while len(gx):
        keep, full = _classify_cells(rings, zbbox, gx, gy, z)
        if z == zoom:
            out_x.append(gx[keep])
            out_y.append(gy[keep])
            out_f.append(full[keep])
            break
        fsel = keep & full
        if fsel.any():
            ex, ey = _expand_cells(gx[fsel], gy[fsel], zoom - z)
            out_x.append(ex)
            out_y.append(ey)
            out_f.append(np.ones(len(ex), dtype=bool))
        bsel = keep & ~full
        bx, by = gx[bsel], gy[bsel]
        gx = np.repeat(bx * 2, 4) + np.tile(np.array([0, 1, 0, 1]), len(bx))
        gy = np.repeat(by * 2, 4) + np.tile(np.array([0, 0, 1, 1]), len(by))
        z += 1
    if not out_x:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), np.array([], dtype=bool)
    return (np.concatenate(out_x), np.concatenate(out_y),
            np.concatenate(out_f))


def zones_attr_df(spark: SparkSession) -> DataFrame:
    rows = [(z["zone_fid"], z["eas_id"], zone_area(z), z["prfedea"]) for z in ZONES]
    return spark.createDataFrame(rows, "zone_fid int, eas_id int, area double, prfedea string")


def build_cover_df(spark: SparkSession, cover, zoom: int) -> DataFrame:
    """Cover table keyed by a SINGLE long cell id (tx·2^z + ty): a
    one-column long equi-join gives Spark its specialized
    LongHashedRelation instead of the generic two-column UnsafeRow
    relation (~1.5× faster probe at 38M rows measured)."""
    cover_pdf = pd.DataFrame({
        "cell": cover["tx"].to_numpy() * (1 << zoom) + cover["ty"].to_numpy(),
        "zone_fid": cover["zone_fid"].to_numpy(np.int32),
        "full": cover["full"].to_numpy()})
    return spark.createDataFrame(
        cover_pdf, "cell long, zone_fid int, full boolean")


def refined_hits(pts: DataFrame, spark: SparkSession, cover_df: DataFrame,
                 zones=ZONES, lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """Broadcast cover join + exact refine over points that already
    carry a ``_cell`` column. Exposed separately so a caller that has
    co-partitioned the points by cell (one exchange shared with other
    per-cell consumers) can run the join on top of its own exchange."""
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
    return inside.unionByName(boundary).drop("_cell", "full")


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
    cover_df = build_cover_df(spark, cover, zoom)

    tx, ty = M.tile_cols(F.col(lat_col), F.col(lon_col), zoom)
    pts = points.filter(F.col(lat_col).isNotNull()).withColumn(
        "_cell", tx * (1 << zoom) + ty)

    refined = refined_hits(pts, spark, cover_df, zones,
                           lat_col=lat_col, lon_col=lon_col)

    if first_match:
        from pyspark.sql import Window
        key = point_fid or points.columns[0]
        w = Window.partitionBy(key).orderBy(F.col("zone_fid").asc())
        refined = (refined.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
    return refined
