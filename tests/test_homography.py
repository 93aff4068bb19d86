"""Homography GCP transform invariants (alg/gdal_homography.cpp).

The gated query proves Spark/DuckDB parity on the applied transform;
these tests prove the FIT itself has the reference's semantics:
exact interpolation of a true homography, inverse round-trip, and
the unit-square convexity rejection."""

import pytest

from gdal_spark.operators.gcpwarp import (_h_apply, _h_compose, _h_invert,
                                          fit_homography)

TRUE_H = [10.0, 0.5, 0.1, 20.0, -0.05, 0.4, 1.0, 0.001, 0.0005]


def _gcps_from(h, n=12):
    out = []
    for i in range(n):
        c = float((i * 13 + 5) % 64)
        r = float((i * 19 + 7) % 64)
        e, g = _h_apply(h, c, r)
        out.append((c, r, e, g))
    return out


def test_exact_recovery_of_true_homography():
    fit = fit_homography(_gcps_from(TRUE_H))
    for x, y in [(0.0, 0.0), (63.0, 63.0), (31.5, 12.25), (7.0, 55.0)]:
        want = _h_apply(TRUE_H, x, y)
        got = _h_apply(fit, x, y)
        assert abs(got[0] - want[0]) < 1e-9
        assert abs(got[1] - want[1]) < 1e-9


def test_inverse_round_trip():
    fit = fit_homography(_gcps_from(TRUE_H))
    inv = _h_invert(fit)
    for x, y in [(3.0, 4.0), (60.0, 2.0), (33.3, 44.4)]:
        gx, gy = _h_apply(fit, x, y)
        bx, by = _h_apply(inv, gx, gy)
        assert abs(bx - x) < 1e-9 and abs(by - y) < 1e-9


def test_compose_is_sequential_application():
    a = TRUE_H
    b = [1.0, 2.0, 0.0, -3.0, 0.0, 2.0, 1.0, 0.0, 0.0]
    ab = _h_compose(a, b)
    x, y = 11.0, 23.0
    step = _h_apply(b, *_h_apply(a, x, y))
    once = _h_apply(ab, x, y)
    assert abs(step[0] - once[0]) < 1e-9
    assert abs(step[1] - once[1]) < 1e-9


def test_degenerate_gcps_rejected():
    # all pixels on one column: degenerate in the pixel dimension
    gcps = [(5.0, float(i), float(i) * 2.0, float(i) * 3.0 + 1.0)
            for i in range(8)]
    with pytest.raises(ValueError):
        fit_homography(gcps)


def test_nonconvex_mapping_rejected():
    # fold the plane: swap two corners so the unit square maps to a
    # self-intersecting (bow-tie) quad — gdal_homography.cpp:288-316
    gcps = [(0.0, 0.0, 0.0, 0.0), (64.0, 0.0, 64.0, 64.0),
            (64.0, 64.0, 64.0, 0.0), (0.0, 64.0, 0.0, 64.0),
            (32.0, 16.0, 40.0, 30.0), (16.0, 32.0, 12.0, 40.0)]
    with pytest.raises(ValueError):
        fit_homography(gcps)
