"""Ring tracer goldens on hand grids + footprint hull kernel checks."""

import numpy as np

from gdal_spark.geo.geom import convex_hull, ring_signed_area
from gdal_spark.operators.polygonize import _trace_component


def test_single_pixel():
    assert _trace_component({(0, 0)})[:3] == (1, 4, 4)


def test_square_2x2():
    cells = {(y, x) for y in range(2) for x in range(2)}
    assert _trace_component(cells)[:3] == (1, 4, 8)


def test_l_tromino():
    n_rings, n_vertices, perim, rings = _trace_component(
        {(0, 0), (1, 0), (1, 1)})
    assert (n_rings, n_vertices, perim) == (1, 6, 8)


def test_ring_with_hole():
    cells = {(y, x) for y in range(3) for x in range(3)} - {(1, 1)}
    n_rings, n_vertices, perim, rings = _trace_component(cells)
    assert (n_rings, n_vertices, perim) == (2, 8, 16)
    # one outer 12-edge ring (4 verts), one hole 4-edge ring (4 verts)
    assert sorted(len(r) for r in rings) == [4, 4]


def test_diagonal_pinch_single_ring():
    # Two present pixels touching at a corner (an 8-connectivity
    # component shape): the surrounding complement is ONE region, so
    # the boundary is a single self-touching ring through the shared
    # vertex (visited twice, so still 8 direction-change corners —
    # the 2x2-mask count). The hug-same-complement-pixel successor
    # rule merges here and SPLITS the dual case (two HOLES touching
    # at a corner — autotest test_polygonize_5, two separate regions;
    # pinned in test_autotest_parity.py).
    n_rings, n_vertices, perim, _ = _trace_component({(0, 0), (1, 1)})
    assert (n_rings, n_vertices, perim) == (1, 8, 8)


def test_touching_holes_split():
    # complement side of the same corner: 4x4 block minus two diagonal
    # interior pixels -> outer ring + TWO separate hole rings
    cells = {(y, x) for y in range(4) for x in range(4)} - {(1, 1), (2, 2)}
    n_rings, n_vertices, perim, rings = _trace_component(cells)
    assert n_rings == 3
    assert sorted(len(r) for r in rings) == [4, 4, 4]


def test_plus_shape():
    cells = {(1, 0), (1, 1), (1, 2), (0, 1), (2, 1)}
    n_rings, n_vertices, perim, _ = _trace_component(cells)
    assert (n_rings, n_vertices, perim) == (1, 12, 12)


def test_hull_kernel_square_plus_interior():
    px = np.array([0, 4, 4, 0, 2, 2, 0])  # square + interior + edge-mid
    py = np.array([0, 0, 4, 4, 2, 0, 2])
    h = convex_hull(px, py)
    assert len(h) == 4  # collinear edge-mids excluded
    assert abs(ring_signed_area(h)) == 16.0


def test_hull_kernel_collinear():
    h = convex_hull(np.array([0, 1, 2, 3]), np.array([0, 1, 2, 3]))
    assert len(h) == 2
    assert abs(ring_signed_area(h)) == 0.0


def test_distributed_rings_equal_walk(spark):
    """trace_rings_distributed ≡ trace_rings on a pinch + hole + multi
    component fixture AND on the real density mask."""
    from gdal_spark.operators.polygonize import (polygonize, trace_rings,
                                                 trace_rings_distributed)
    # synthetic: a 5x5 ring with a hole, a diagonal pinch pair, a dot
    cells = ([(y, x) for y in range(5) for x in range(5)
              if not (1 <= y <= 3 and 1 <= x <= 3)]      # ring w/ hole
             + [(7, 7), (8, 8), (7, 8)]                   # pinch-ish L
             + [(10, 0)])                                 # single pixel
    df = spark.createDataFrame(cells, "py long, px long")
    labels = polygonize(df, 16, tile=4)
    key = lambda rows: sorted((r["label"], r["n_rings"], r["n_vertices"],
                               r["perimeter"], r["n_pixels"]) for r in rows)
    assert key(trace_rings_distributed(labels, 16).collect()) \
        == key(trace_rings(labels).collect())


def test_distributed_rings_on_density_mask(spark):
    from gdal_spark.operators.polygonize import (polygonize, trace_rings,
                                                 trace_rings_distributed)
    from gdal_spark.queries import PGRID_W, _mask_df, PMASK_THR
    labels = polygonize(_mask_df(spark, "/root/testdata/sf0.001",
                                 PMASK_THR), PGRID_W).persist()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(trace_rings_distributed(labels, PGRID_W).collect()) \
        == key(trace_rings(labels).collect())
