"""Property tests for the H3-style aperture-7 hex index (geo/h3.py).

The scheme is deliberately not bit-compatible with Uber H3 (documented
in the module docstring); these tests pin down the properties a Spark
pipeline actually relies on: determinism, containment-scale round-trip,
exact digit-arithmetic hierarchy, k-ring shape, and id-layout sanity.
"""

import numpy as np
import pytest

from gdal_spark.geo import h3


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    n = 5000
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


def test_determinism(pts):
    lat, lon = pts
    a = h3.latlon_to_cell(lat, lon, 9)
    b = h3.latlon_to_cell(lat.copy(), lon.copy(), 9)
    assert (a == b).all()


@pytest.mark.parametrize("res", [0, 1, 2, 4, 7, 10, 15])
def test_roundtrip_within_cell(pts, res):
    """Point → cell → center must stay within one cell circumradius
    (gnomonic-plane scale ~ angular scale near the face center)."""
    lat, lon = pts
    c = h3.latlon_to_cell(lat, lon, res)
    clat, clon = h3.cell_to_center(c)
    la1, lo1, la2, lo2 = map(np.radians, (lat, lon, clat, clon))
    d = np.arccos(np.clip(
        np.sin(la1) * np.sin(la2)
        + np.cos(la1) * np.cos(la2) * np.cos(lo1 - lo2), -1.0, 1.0))
    size = h3.R0 * 7.0 ** (-res / 2.0)
    assert d.max() <= 1.05 * size


def test_res_and_face_fields(pts):
    lat, lon = pts
    for res in (0, 3, 15):
        c = h3.latlon_to_cell(lat, lon, res)
        assert (h3.cell_res(c) == res).all()
        f = h3.cell_face(c)
        assert ((f >= 0) & (f < 20)).all()
        assert (h3.cell_root(c) < 7).all()


def test_children_parent_exact(pts):
    """cell_to_children then cell_to_parent is the exact identity —
    pure integer digit arithmetic, no geometry involved."""
    lat, lon = pts
    for res in (0, 5, 14):
        c = np.unique(h3.latlon_to_cell(lat, lon, res))
        ch = h3.cell_to_children(c)
        assert ch.shape == (len(c), 7)
        back = h3.cell_to_parent(ch.ravel()).reshape(-1, 7)
        assert (back == c[:, None]).all()
        # children are distinct
        assert len(np.unique(ch)) == 7 * len(c)


def test_parent_chain_matches_digit_truncation(pts):
    lat, lon = pts
    c9 = h3.latlon_to_cell(lat, lon, 9)
    p = c9
    for r in range(8, -1, -1):
        p = h3.cell_to_parent(p)
        assert (h3.cell_res(p) == r).all()
    with pytest.raises(ValueError):
        h3.cell_to_parent(p)


def test_parent_agrees_with_direct_mostly(pts):
    """Hex hierarchies never nest exactly (aperture-7 Gosper boundary);
    the digit-arithmetic parent must agree with direct indexing at the
    coarser res for the vast majority of points."""
    lat, lon = pts
    for res in (3, 6, 9):
        agree = (h3.cell_to_parent(h3.latlon_to_cell(lat, lon, res))
                 == h3.latlon_to_cell(lat, lon, res - 1)).mean()
        assert agree > 0.85


def test_kring_shape_and_membership(pts):
    lat, lon = pts
    c = np.unique(h3.latlon_to_cell(lat[:500], lon[:500], 6))
    for k in (1, 2):
        kr = h3.k_ring(c, k)
        assert kr.shape == (len(c), 1 + 3 * k * (k + 1))
        assert (kr == c[:, None]).any(axis=1).all()  # contains self
        valid = kr[kr >= 0]
        assert (h3.cell_res(valid) == 6).all()


def test_kring_symmetric(pts):
    """If b is in k_ring(a, 1) then a is in k_ring(b, 1) (away from
    face edges, where clipped cells return -1)."""
    lat, lon = pts
    c = np.unique(h3.latlon_to_cell(lat[:200], lon[:200], 7))[:50]
    kr = h3.k_ring(c, 1)
    for i in range(len(c)):
        for b in kr[i]:
            if b < 0 or b == c[i]:
                continue
            back = h3.k_ring(np.array([b]), 1)
            if (back >= 0).all():
                assert c[i] in back


def test_cell_count_growth(pts):
    """Finer res → ~7× more distinct cells on uniform points (until
    cells outnumber points)."""
    lat, lon = pts
    n2 = len(np.unique(h3.latlon_to_cell(lat, lon, 2)))
    n3 = len(np.unique(h3.latlon_to_cell(lat, lon, 3)))
    assert 4.0 < n3 / n2 < 10.0


def test_res0_cell_count_bounded(pts):
    lat, lon = pts
    c0 = np.unique(h3.latlon_to_cell(lat, lon, 0))
    assert len(c0) <= 140  # ≤ 7 roots × 20 faces


def test_invalid_res():
    with pytest.raises(ValueError):
        h3.latlon_to_cell([0.0], [0.0], 16)
    with pytest.raises(ValueError):
        h3.latlon_to_cell([0.0], [0.0], -1)
