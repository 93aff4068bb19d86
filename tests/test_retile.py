"""gdal_retile window-grid invariants: full coverage, the documented
overlap, and edge clipping — checked against a brute-force Python
replica of gdal_retile.py's loop (not against the SQL)."""


def test_retile_grid_covers_every_pixel_with_expected_overlap():
    from gdal_spark.queries import (PGRID_H, PGRID_W, RT_NX, RT_NY,
                                    RT_OVER, RT_STEP, RT_TILE)

    # brute-force replica of gdal_retile.py:404-426
    windows = []
    for yi in range(1, RT_NY + 1):
        for xi in range(1, RT_NX + 1):
            ox, oy = (xi - 1) * RT_STEP, (yi - 1) * RT_STEP
            w = min(RT_TILE, PGRID_W - ox)
            h = min(RT_TILE, PGRID_H - oy)
            assert w > 0 and h > 0, "count formula produced a dead tile"
            windows.append((ox, oy, w, h))

    cover = [[0] * PGRID_W for _ in range(PGRID_H)]
    for ox, oy, w, h in windows:
        for y in range(oy, oy + h):
            for x in range(ox, ox + w):
                cover[y][x] += 1
    flat = [c for row in cover for c in row]
    assert min(flat) >= 1, "retile grid left a pixel uncovered"
    # interior overlap bands are exactly RT_OVER pixels wide, covered 2x
    row0 = cover[0]
    assert row0.count(2) == (RT_NX - 1) * RT_OVER
    # corner of two overlap bands is covered 4x
    assert max(flat) == 4


def test_retile_counts_match_reference_formula():
    from gdal_spark.queries import PGRID_W, RT_NX, RT_OVER, RT_TILE

    # gdal_retile.py:93-97 verbatim arithmetic
    step = RT_TILE - RT_OVER
    expect = 1 + int((PGRID_W - RT_TILE + step - 1) / step) \
        if PGRID_W > RT_TILE else 1
    assert RT_NX == expect
