"""Contour iso-polygons: ring count cross-checked against an
independent pixel-topology computation (4-connected above components
+ enclosed 8-connected holes — the disconnected-saddle policy's
binary-topology equivalent), band area against simple bounds."""

from collections import deque

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators import rasterize as rast_op
from gdal_spark.queries import (CONTOUR_LEVELS, PGRID_GT, PGRID_H, PGRID_W,
                                points_df, q_contour_polygons)

SF = "/root/testdata/sf0.001"


def _components(mask, conn8):
    seen = np.zeros_like(mask, dtype=bool)
    H, W = mask.shape
    nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if conn8:
        nbrs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    comps = []
    for y in range(H):
        for x in range(W):
            if mask[y, x] and not seen[y, x]:
                q = deque([(y, x)])
                seen[y, x] = True
                cells = []
                while q:
                    cy, cx = q.popleft()
                    cells.append((cy, cx))
                    for dy, dx in nbrs:
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < H and 0 <= nx < W and mask[ny, nx]
                                and not seen[ny, nx]):
                            seen[ny, nx] = True
                            q.append((ny, nx))
                comps.append(cells)
    return comps


def test_ring_count_matches_pixel_topology(spark):
    burn = rast_op.burn_points(points_df(spark, SF),
                               PGRID_GT, PGRID_W, PGRID_H).collect()
    grid = np.zeros((PGRID_H, PGRID_W))
    for r in burn:
        grid[r["py"], r["px"]] = r["burn"]
    got = {r["level"]: r for r in q_contour_polygons(spark, SF).collect()}
    for lv in CONTOUR_LEVELS:
        above = grid >= lv
        n_above = len(_components(above, conn8=False))
        holes = sum(
            1 for c in _components(~above, conn8=True)
            if all(0 < y < PGRID_H - 1 and 0 < x < PGRID_W - 1
                   for y, x in c))
        if lv not in got:
            assert n_above == 0
            continue
        assert got[lv]["n_rings"] == n_above + holes
        # band area bounded by the dilated above-pixel count
        assert 0.0 < got[lv]["band_area"] <= 4.0 * max(above.sum(), 1)
