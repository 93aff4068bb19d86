"""DEM kernel direction tests — pin the gdaldem north-up convention.

gdaldem hillshade's Horn gradient divides the south-minus-north sum by
gt[5], which is NEGATIVE for every north-up raster (apps/gdaldem_lib.cpp
Gradient<HORN>::calc).  With the default az=315 (light from the NW), a
north-facing slope must be BRIGHTER than a south-facing one; an engine
with a positive y-resolution is N-S mirrored (az=315 behaves like 225).
"""

import math

from pyspark.sql import functions as F

from gdal_spark.operators import dem as dem_op


def _plane_shade(spark, k):
    """Hillshade at the center of a 5x5 plane elev = k * py
    (py grows south: k>0 dips north => north-facing slope)."""
    rows = [(px, py, float(k * py)) for px in range(5) for py in range(5)]
    dem = spark.createDataFrame(rows, "px int, py int, elev double")
    nb = dem_op.neighbors9(dem, w=5, h=5)
    win = [F.col(f"win{i}") for i in range(9)]
    r = (nb.filter((F.col("px") == 2) & (F.col("py") == 2))
         .select(dem_op.hillshade_cols(win).alias("shade")).collect())
    return r[0]["shade"]


def test_north_facing_brightens_under_nw_light(spark):
    north_facing = _plane_shade(spark, 1.0)   # elev grows south -> faces N
    south_facing = _plane_shade(spark, -1.0)  # elev grows north -> faces S
    assert north_facing > south_facing
    # closed form for a unit plane: x=0, y=-k (north-positive convention)
    alt, az = math.radians(45.0), math.radians(315.0)
    for k, got in ((1.0, north_facing), (-1.0, south_facing)):
        y = -k
        cang = (254.0 * math.sin(alt)
                - y * 254.0 * math.cos(az) * math.cos(alt)) / math.sqrt(1 + y * y)
        want = 1.0 if cang <= 0 else cang + 1.0
        assert abs(got - want) < 1e-9


def test_flat_plane_aspect_null_slope_zero(spark):
    rows = [(px, py, 7.0) for px in range(5) for py in range(5)]
    dem = spark.createDataFrame(rows, "px int, py int, elev double")
    nb = dem_op.neighbors9(dem, w=5, h=5)
    win = [F.col(f"win{i}") for i in range(9)]
    r = (nb.filter((F.col("px") == 2) & (F.col("py") == 2))
         .select(dem_op.slope_deg_col(win).alias("s"),
                 dem_op.aspect_col(win).alias("a")).collect()[0])
    assert r["s"] == 0.0 and r["a"] is None
