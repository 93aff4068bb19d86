"""Geolocation-array (swath) georeferencing — alg/gdalgeoloc.cpp
GDALGeoLocTransformer.

Forward transform (PixelLineToXY, gdalgeoloc.cpp:391-527): raster
pixel -> fractional geoloc-array position (PIXEL/LINE OFFSET+STEP
metadata) -> bilinear interpolation of the lon/lat arrays, with the
reference's edge behavior: the truncated index is clamped and, when
it lands on the last row/column, stepped back one cell so the SAME
bilinear expression extrapolates (the iAttempt retry loop collapses
to iX' = min(iX, W-2), iY' = min(iY, H-2) when the array has no
nodata — each retry branch lands in the bilinear case). The
fractional offsets use the UNCLAMPED position (matching the
reference), so out-of-array samples extrapolate from the closest
grid square. NoData holes and the geographic dateline shift
(ShiftGeoX, only active with wrapping SRS metadata) are out of scope
for the fixture — documented.

Backmap (GenerateBackMap, gdalgeoloc.cpp:1019-1160 sizing replicated
exactly: target-pixel oversample -> sqrt cell size -> half-cell
padded extent -> ceil sizes -> +1 edge extension): the reference
then fills the backmap with a SEQUENTIAL float32 running-average
whose per-update acceptance test depends on visit order, plus a
multi-ring hole-filling pass. DOCUMENTED DEVIATION: we compute the
order-free specification of the same construction — every
dfStep-spaced geoloc sample is forward-projected and scatter-
averaged (weight 1) into the backmap cell it falls in, one groupBy —
and leave unhit cells empty. tests/test_geoloc.py proves the
round-trip invariant (each cell's averaged pixel/line forward-
projects back into a 1-cell neighborhood of that cell).

Distributed shape: geoloc arrays are tiny relative to rasters (the
whole point of swath georeferencing) — broadcast the array; the
raster side is pure column math + 4 broadcast corner joins (the warp
tap idiom, no shuffle of the big side). The backmap build is one
scatter groupBy over the (oversampled) geoloc samples.
"""

from __future__ import annotations

GEO_W, GEO_H = 33, 25        # geolocation array size
RAST_W, RAST_H = 64, 48      # raster size
PIXEL_STEP = LINE_STEP = 0.5  # raster pixel -> geoloc array position
OSF = 2.0                    # backmap oversample factor (option knob)

LON = "(10.0 + 0.1 * ({p}) + 0.02 * ({l}) + 0.0005 * ({p}) * ({l}))"
LAT = "(50.0 - 0.08 * ({l}) + 0.01 * ({p}) + 0.0003 * ({p}) * ({l}))"


def _rng(n: int, alias: str, dialect: str) -> str:
    if dialect == "duck":
        return f"(SELECT UNNEST(RANGE(0, {n})) AS {alias})"
    return f"(SELECT explode(sequence(0, {n - 1})) AS {alias})"


def _dlit(v: float) -> str:
    from gdal_spark.sqlexpr import dlit
    return dlit(v)


def geoloc_cte(dialect: str) -> str:
    lon = LON.format(p="CAST(gp AS DOUBLE)", l="CAST(gl AS DOUBLE)")
    lat = LAT.format(p="CAST(gp AS DOUBLE)", l="CAST(gl AS DOUBLE)")
    return (f"geoloc AS (SELECT gl, gp, {lon} AS lon, {lat} AS lat "
            f"FROM {_rng(GEO_W, 'gp', dialect)} xs "
            f"CROSS JOIN {_rng(GEO_H, 'gl', dialect)} ys)")


def _eff_idx(pos: str, size: int) -> str:
    """Truncated, clamped, last-cell-stepped-back index (the closed
    form of the reference's clamp + retry loop, no-nodata case)."""
    clamped = f"LEAST(GREATEST(0.0, {pos}), {_dlit(float(size - 1))})"
    return f"LEAST(CAST(FLOOR({clamped}) AS INT), {size - 2})"


def _bilinear(fp: str, fl: str, v00: str, v10: str, v01: str,
              v11: str) -> str:
    """Exact expression order of PixelLineToXY (gdalgeoloc.cpp:444)."""
    return (f"((1.0 - {fl}) * ({v00} + {fp} * ({v10} - {v00})) "
            f"+ {fl} * ({v01} + {fp} * ({v11} - {v01})))")


def forward_sql(dialect: str) -> str:
    """Gated query: every raster pixel georeferenced through the
    geoloc array. Spark: 4 broadcast corner joins against the array
    table. The oracle (o_geoloc_forward) recomputes the corners
    ARITHMETICALLY from the fixture formula — an independent
    formulation that proves the join plumbing."""
    glp = f"(CAST(px AS DOUBLE) * {_dlit(PIXEL_STEP)})"
    gll = f"(CAST(py AS DOUBLE) * {_dlit(LINE_STEP)})"
    ix, iy = _eff_idx(glp, GEO_W), _eff_idx(gll, GEO_H)
    grid = (f"grid AS (SELECT py, px, {ix} AS ix, {iy} AS iy, "
            f"{glp} - {ix} AS fp, {gll} - {iy} AS fl "
            f"FROM {_rng(RAST_W, 'px', dialect)} xs "
            f"CROSS JOIN {_rng(RAST_H, 'py', dialect)} ys)")
    gx = _bilinear("g.fp", "g.fl", "c00.lon", "c10.lon", "c01.lon",
                   "c11.lon")
    gy = _bilinear("g.fp", "g.fl", "c00.lat", "c10.lat", "c01.lat",
                   "c11.lat")
    return f"""WITH {geoloc_cte(dialect)},
{grid}
SELECT g.py, g.px, ROUND({gx}, 9) AS geo_x, ROUND({gy}, 9) AS geo_y
FROM grid g
JOIN geoloc c00 ON c00.gl = g.iy AND c00.gp = g.ix
JOIN geoloc c10 ON c10.gl = g.iy AND c10.gp = g.ix + 1
JOIN geoloc c01 ON c01.gl = g.iy + 1 AND c01.gp = g.ix
JOIN geoloc c11 ON c11.gl = g.iy + 1 AND c11.gp = g.ix + 1
ORDER BY g.py, g.px"""


def forward_oracle_sql(dialect: str) -> str:
    """Join-free arithmetic twin of forward_sql."""
    glp = f"(CAST(px AS DOUBLE) * {_dlit(PIXEL_STEP)})"
    gll = f"(CAST(py AS DOUBLE) * {_dlit(LINE_STEP)})"
    ix, iy = _eff_idx(glp, GEO_W), _eff_idx(gll, GEO_H)
    grid = (f"grid AS (SELECT py, px, {ix} AS ix, {iy} AS iy, "
            f"{glp} - {ix} AS fp, {gll} - {iy} AS fl "
            f"FROM {_rng(RAST_W, 'px', dialect)} xs "
            f"CROSS JOIN {_rng(RAST_H, 'py', dialect)} ys)")

    def corner(f, dx, dy):
        return f.format(p=f"CAST(ix + {dx} AS DOUBLE)",
                        l=f"CAST(iy + {dy} AS DOUBLE)")

    gx = _bilinear("fp", "fl", corner(LON, 0, 0), corner(LON, 1, 0),
                   corner(LON, 0, 1), corner(LON, 1, 1))
    gy = _bilinear("fp", "fl", corner(LAT, 0, 0), corner(LAT, 1, 0),
                   corner(LAT, 0, 1), corner(LAT, 1, 1))
    return f"""WITH {grid}
SELECT py, px, ROUND({gx}, 9) AS geo_x, ROUND({gy}, 9) AS geo_y
FROM grid
ORDER BY py, px"""


def backmap_sql(dialect: str) -> str:
    """Backmap build: reference grid sizing verbatim, order-free
    scatter-average fill (documented deviation above). Output: one
    row per non-empty backmap cell with the averaged fractional
    geoloc pixel/line and the sample count."""
    step = 1.0 / OSF
    # sample positions k -> -step + k*step, while <= size + 2*step
    # (+ step/10 slack), exactly the reference loop bounds
    nx = int((GEO_W + 2 * step + step / 10 + step) / step) + 1
    ny = int((GEO_H + 2 * step + step / 10 + step) / step) + 1
    sp = f"(CAST(kx AS DOUBLE) * {_dlit(step)} - {_dlit(step)})"
    sl = f"(CAST(ky AS DOUBLE) * {_dlit(step)} - {_dlit(step)})"
    ix, iy = _eff_idx(sp, GEO_W), _eff_idx(sl, GEO_H)

    def corner(f, dx, dy):
        return f.format(p=f"CAST(ix + {dx} AS DOUBLE)",
                        l=f"CAST(iy + {dy} AS DOUBLE)")

    gx = _bilinear("fp", "fl", corner(LON, 0, 0), corner(LON, 1, 0),
                   corner(LON, 0, 1), corner(LON, 1, 1))
    gy = _bilinear("fp", "fl", corner(LAT, 0, 0), corner(LAT, 1, 0),
                   corner(LAT, 0, 1), corner(LAT, 1, 1))
    samples = (
        f"samples AS (SELECT sp, sl, {gx} AS gx, {gy} AS gy "
        f"FROM (SELECT {sp} AS sp, {sl} AS sl, {ix} AS ix, {iy} AS iy, "
        f"{sp} - {ix} AS fp, {sl} - {iy} AS fl "
        f"FROM {_rng(nx, 'kx', dialect)} xs "
        f"CROSS JOIN {_rng(ny, 'ky', dialect)} ys "
        f"WHERE {sp} <= {_dlit(GEO_W + 2 * step + step / 10)} "
        f"AND {sl} <= {_dlit(GEO_H + 2 * step + step / 10)}) t)")
    # GenerateBackMap sizing (gdalgeoloc.cpp:1033-1086), min/max over
    # the geoloc ARRAY values
    tgt = f"{_dlit(float(GEO_W * GEO_H))} * {_dlit(OSF)}"
    ext = (f"ext AS (SELECT SQRT((MAX(lon) - MIN(lon)) * "
           f"(MAX(lat) - MIN(lat)) / ({tgt})) AS ps, "
           f"MIN(lon) AS mnx, MAX(lon) AS mxx, "
           f"MIN(lat) AS mny, MAX(lat) AS mxy FROM geoloc)")
    bm = (f"bm AS (SELECT ps, mnx - ps / 2.0 AS minx, "
          f"mxx + ps / 2.0 AS maxx, mny - ps / 2.0 AS miny, "
          f"mxy + ps / 2.0 AS maxy, "
          f"CAST(CEIL((mxx + ps / 2.0 - (mnx - ps / 2.0)) / ps) AS INT) "
          f"AS nbx0, "
          f"CAST(CEIL((mxy + ps / 2.0 - (mny - ps / 2.0)) / ps) AS INT) "
          f"AS nby0 FROM ext)")
    # pixel sizes from the PRE-increment sizes; widths post-increment
    cell = (f"cell AS (SELECT minx, maxy, nbx0 + 1 AS nbx, "
            f"nby0 + 1 AS nby, (maxx - minx) / nbx0 AS psx, "
            f"(maxy - miny) / nby0 AS psy FROM bm)")
    return f"""WITH {geoloc_cte(dialect)},
{samples},
{ext},
{bm},
{cell},
scatter AS (
  SELECT CAST(FLOOR((s.gx - c.minx) / c.psx) AS INT) AS bmx,
         CAST(FLOOR((c.maxy - s.gy) / c.psy) AS INT) AS bmy,
         s.sp, s.sl, c.nbx, c.nby
  FROM samples s CROSS JOIN cell c)
SELECT bmy, bmx,
       ROUND(SUM(sp) / COUNT(*), 9) AS avg_pixel,
       ROUND(SUM(sl) / COUNT(*), 9) AS avg_line,
       COUNT(*) AS n
FROM scatter
WHERE bmx >= 0 AND bmx < nbx AND bmy >= 0 AND bmy < nby
GROUP BY bmy, bmx
ORDER BY bmy, bmx"""
