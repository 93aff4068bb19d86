"""Web-Mercator / XYZ tile math — exact port of the reference rules.

Reference: ``swig/python/gdal-utils/osgeo_utils/gdal2tiles.py`` class
``GlobalMercator``:

- origin shift ``pi * 6378137`` (gdal2tiles.py:420)
- ``Resolution(z) = 2*pi*6378137 / tile_size / 2**z`` (gdal2tiles.py:498-502)
- LatLon→meters (gdal2tiles.py:423-430)
- meters→pixels at zoom z (gdal2tiles.py:453-458)
- pixels→tile ``t = ceil(p / tile_size) - 1`` — NOT floor; this is the
  reference's boundary rule and is exact-match relevant for points that
  land exactly on tile edges (gdal2tiles.py:461-465)
- TMS→XYZ ("Google") y flip ``ty_xyz = 2**z - 1 - ty_tms``
  (gdal2tiles.py:512-516); Bing quadkey (gdal2tiles.py:518-533)
- ``ZoomForPixelSize``: largest z whose resolution is finer, minus one,
  never scaling up (gdal2tiles.py:504-510)

Every formula exists in THREE synchronized forms:

1. numpy (oracle kernels / pandas-UDF interiors),
2. pyspark Column expressions (the engine's JVM-side fast path — tile
   assignment is pure column math, whole-stage-codegen'd, no UDF),
3. ANSI-SQL strings (``sqlexpr`` builders) that BOTH Spark SQL and DuckDB
   parse, used for the driver's DuckDB oracle comparison.

They are cross-checked bit-exactly in tests/test_mercator.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = math.pi * EARTH_RADIUS  # 20037508.342789244
TILE_SIZE = 256


def resolution(z: int, tile_size: int = TILE_SIZE) -> float:
    """Meters/pixel at zoom z (gdal2tiles.py:498-502)."""
    return 2 * math.pi * EARTH_RADIUS / tile_size / (2 ** z)


# ---------------------------------------------------------------- numpy ---

def latlon_to_meters_np(lat, lon):
    """EPSG:4326 → EPSG:3857 (gdal2tiles.py:423-430)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_latlon_np(mx, my):
    """EPSG:3857 → EPSG:4326 (gdal2tiles.py:432-443)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = mx / ORIGIN_SHIFT * 180.0
    lat = my / ORIGIN_SHIFT * 180.0
    lat = 180.0 / math.pi * (2.0 * np.arctan(np.exp(lat * math.pi / 180.0)) - math.pi / 2.0)
    return lat, lon


def meters_to_pixels_np(mx, my, z, tile_size: int = TILE_SIZE):
    res = resolution(z, tile_size)
    return (np.asarray(mx) + ORIGIN_SHIFT) / res, (np.asarray(my) + ORIGIN_SHIFT) / res


def pixels_to_tile_np(px, py, tile_size: int = TILE_SIZE):
    """ceil(p/ts)-1 rule (gdal2tiles.py:461-465)."""
    tx = np.ceil(np.asarray(px) / float(tile_size)).astype(np.int64) - 1
    ty = np.ceil(np.asarray(py) / float(tile_size)).astype(np.int64) - 1
    return tx, ty


def latlon_to_tile_np(lat, lon, z, xyz: bool = True, tile_size: int = TILE_SIZE):
    """Per-point XYZ (or TMS) tile assignment at zoom z."""
    mx, my = latlon_to_meters_np(lat, lon)
    px, py = meters_to_pixels_np(mx, my, z, tile_size)
    tx, ty = pixels_to_tile_np(px, py, tile_size)
    if xyz:
        ty = (2 ** z) - 1 - ty  # gdal2tiles.py:512-516
    return tx, ty


def tile_bounds_meters_np(tx, ty_tms, z, tile_size: int = TILE_SIZE):
    """TMS tile → EPSG:3857 bounds from pixel corners (gdal2tiles.py:480-487)."""
    res = resolution(z, tile_size)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty_tms, dtype=np.float64)
    minx = tx * tile_size * res - ORIGIN_SHIFT
    miny = ty * tile_size * res - ORIGIN_SHIFT
    maxx = (tx + 1) * tile_size * res - ORIGIN_SHIFT
    maxy = (ty + 1) * tile_size * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def tile_bounds_latlon_np(tx, ty_xyz, z, tile_size: int = TILE_SIZE):
    """XYZ tile → lat/lon bounds (minlat, minlon, maxlat, maxlon)."""
    ty_tms = (2 ** z) - 1 - np.asarray(ty_xyz)
    minx, miny, maxx, maxy = tile_bounds_meters_np(tx, ty_tms, z, tile_size)
    minlat, minlon = meters_to_latlon_np(minx, miny)
    maxlat, maxlon = meters_to_latlon_np(maxx, maxy)
    return minlat, minlon, maxlat, maxlon


def zoom_for_pixel_size(pixel_size: float, tile_size: int = TILE_SIZE) -> int:
    """Max z with Resolution(z) < pixelSize, minus 1; "don't scale up"
    (gdal2tiles.py:504-510)."""
    for i in range(32):
        if pixel_size > resolution(i, tile_size):
            return max(0, i - 1)
    return 31


def quadkey_np(tx, ty_xyz, z):
    """Bing quadkey digits from XYZ/google tile (gdal2tiles.py:518-533).

    Returned as int64 holding the base-4 digit string interpreted base-10
    would be ambiguous for leading zeros, so we return the quadkey as a
    python string array for display and an int64 morton-style key
    ``sum(digit << 2*(z-i))`` for joins.
    """
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty_xyz, dtype=np.int64)
    key = np.zeros_like(tx)
    for i in range(z, 0, -1):
        digit = ((tx >> (i - 1)) & 1) | (((ty >> (i - 1)) & 1) << 1)
        key = (key << 2) | digit
    return key


# ------------------------------------------------------- Spark columns ---

def latlon_to_meters_cols(lat: Column, lon: Column) -> tuple[Column, Column]:
    # op order matches latlon_to_meters_np and sqlexpr.tile_sql exactly:
    # ((lon * OS) / 180), (((log(tan(((90+lat)*pi)/360)) / (pi/180)) * OS) / 180)
    mx = lon * F.lit(ORIGIN_SHIFT) / F.lit(180.0)
    my = (F.log(F.tan((F.lit(90.0) + lat) * F.lit(math.pi) / F.lit(360.0)))
          / F.lit(math.pi / 180.0)) * F.lit(ORIGIN_SHIFT) / F.lit(180.0)
    return mx, my


def tile_cols(lat: Column, lon: Column, z: int, xyz: bool = True,
              tile_size: int = TILE_SIZE) -> tuple[Column, Column]:
    """Pure column-math tile assignment — JVM-side, codegen'd, no UDF.

    NOTE: mirrors the SQL in sqlexpr.tile_sql() operation-for-operation so
    Spark and the DuckDB oracle agree bit-exactly.
    """
    mx, my = latlon_to_meters_cols(lat, lon)
    res = F.lit(2.0) * F.lit(math.pi) * F.lit(EARTH_RADIUS) / F.lit(float(tile_size)) / F.pow(F.lit(2.0), F.lit(z))
    px = (mx + F.lit(ORIGIN_SHIFT)) / res
    py = (my + F.lit(ORIGIN_SHIFT)) / res
    tx = F.ceil(px / F.lit(float(tile_size))).cast("long") - F.lit(1).cast("long")
    ty = F.ceil(py / F.lit(float(tile_size))).cast("long") - F.lit(1).cast("long")
    if xyz:
        ty = F.lit(int(2 ** z) - 1).cast("long") - ty
    return tx, ty


def geodetic_tile_cols(lat: Column, lon: Column, z: int,
                       tile_size: int = TILE_SIZE) -> tuple[Column, Column]:
    """EPSG:4326 geodetic tiling scheme (GlobalGeodetic,
    osgeo_utils/gdal2tiles.py:535-610): resolution 180/tile/2^z deg/px,
    2×1 tiles at z0, the same ceil−1 pixel→tile rule as mercator.
    Returns XYZ-flipped (tx, ty). The resolution literal is computed
    driver-side and injected into both engines (decimal-literal
    division would diverge in DuckDB)."""
    res = 180.0 / tile_size / (2.0 ** z)
    px = (F.lit(180.0) + lon) / F.lit(res)
    py = (F.lit(90.0) + lat) / F.lit(res)
    tx = F.ceil(px / F.lit(float(tile_size))).cast("long") - F.lit(1).cast("long")
    ty = F.ceil(py / F.lit(float(tile_size))).cast("long") - F.lit(1).cast("long")
    ty = F.lit(int(2 ** z) - 1).cast("long") - ty
    return tx, ty
