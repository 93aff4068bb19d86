"""raster_stack / raster_update / pixel_info invariants."""

from gdal_spark.queries import (UPD_X0, UPD_X1, UPD_Y0, UPD_Y1, ZRAST_GT,
                                ZRAST_H, ZRAST_W)

SF = "/root/testdata/sf0.001"


def test_stack_bands_align(spark):
    from gdal_spark.queries import q_raster_stack
    rows = q_raster_stack(spark, SF).collect()
    assert len(rows) == ZRAST_W * ZRAST_H
    some_sparse = sum(1 for r in rows if r.band1 is not None)
    assert 0 < some_sparse < len(rows)   # band1 genuinely sparse
    for r in rows[::97]:
        assert r.band2 == float((r.px * 7 + r.py * 13) % 50)
        assert r.band3 == float((r.px + r.py * r.py) % 31)


def test_update_only_inside_window(spark):
    from gdal_spark.queries import q_raster_update
    rows = {(r.py, r.px): r.val
            for r in q_raster_update(spark, SF).collect()}
    changed = 0
    for (py, px), v in rows.items():
        base = float((px * 11 + py * 3) % 77)
        inside = UPD_X0 <= px < UPD_X1 and UPD_Y0 <= py < UPD_Y1
        if not inside:
            assert v == base, (py, px)
        elif v != base:
            changed += 1
    assert changed > 50   # the burn genuinely overwrote the window


def test_pixel_info_inverse_geotransform(spark):
    from gdal_spark.queries import q_pixel_info
    import math
    g = ZRAST_GT
    rows = q_pixel_info(spark, SF).collect()
    assert len(rows) == 40
    outside = [r for r in rows if not r.in_raster]
    assert outside and all(r.val is None for r in outside)
    for r in rows:
        qx = g[0] + ((r.q_id * 13) % 50 - 4.7) * g[1]
        qy = g[3] + ((r.q_id * 7) % 48 - 3.9) * g[5]
        assert r.px == math.floor((qx - g[0]) / g[1])
        assert r.py == math.floor((qy - g[3]) / g[5])


def test_distributed_checksum_equals_numpy_twin(spark):
    """The relational band checksum (q_band_checksum) must equal the
    line-folded numpy reference (rasterize.gdal_checksum) on the same
    dense grid — validating that the 16-bit per-line mask commutes to
    one final mod for non-negative terms."""
    import numpy as np

    from gdal_spark.operators.rasterize import gdal_checksum
    from gdal_spark.queries import (GRID_GT, GRID_H, GRID_W,
                                    q_band_checksum, q_rasterize_points)

    sf = "/root/testdata/sf0.001"
    burned = q_rasterize_points(spark, sf).collect()
    grid = np.zeros((GRID_H, GRID_W))
    for r in burned:
        grid[int(r["py"]), int(r["px"])] = r["burn"]
    want = gdal_checksum(grid)
    got = q_band_checksum(spark, sf).collect()[0]["checksum"]
    assert got == want
