"""GCP transforms (alg/gdal_crs.cpp, alg/thinplatespline.cpp): the
pure-Python solvers vs numpy, exact-interpolation invariants, and the
distributed apply vs driver evaluation."""

import math

import numpy as np
import pytest

from gdal_spark.operators.gcpwarp import (POLY_TERMS, _gauss_solve,
                                          _terms, fit_polynomial, fit_tps)
from gdal_spark.queries import _gcp_fixture

SF = "/root/testdata/sf0.001"


def test_gauss_solve_matches_numpy():
    rng = np.random.RandomState(3)
    a = rng.rand(6, 6) + np.eye(6) * 3
    b1, b2 = rng.rand(6), rng.rand(6)
    got = _gauss_solve(a.tolist(), [b1.tolist(), b2.tolist()])
    assert np.allclose(got[0], np.linalg.solve(a, b1), atol=1e-10)
    assert np.allclose(got[1], np.linalg.solve(a, b2), atol=1e-10)


def test_polynomial_fit_matches_numpy_lstsq():
    gcps = _gcp_fixture()
    fit = fit_polynomial(gcps, 2)
    xm, ym = fit["xm"], fit["ym"]
    A = np.array([_terms(px - xm, py - ym, 2) for px, py, _, _ in gcps])
    ce = np.linalg.lstsq(A, np.array([g[2] for g in gcps]), rcond=None)[0]
    cn = np.linalg.lstsq(A, np.array([g[3] for g in gcps]), rcond=None)[0]
    assert np.allclose(fit["ce"], ce, atol=1e-8)
    assert np.allclose(fit["cn"], cn, atol=1e-8)


def test_order1_exact_on_affine_gcps():
    """An exactly-affine GCP set is reproduced exactly by order 1."""
    gcps = [(float(c), float(r), 10.0 + 2.0 * c - 0.5 * r,
             -3.0 + 0.25 * c + 1.5 * r)
            for c, r in [(0, 0), (10, 3), (4, 20), (30, 30), (7, 50)]]
    fit = fit_polynomial(gcps, 1)
    for px, py, ge, gn in gcps:
        t = _terms(px - fit["xm"], py - fit["ym"], 1)
        e = sum(c * v for c, v in zip(fit["ce"], t))
        n = sum(c * v for c, v in zip(fit["cn"], t))
        assert e == pytest.approx(ge, abs=1e-9)
        assert n == pytest.approx(gn, abs=1e-9)


def test_tps_interpolates_gcps_exactly():
    gcps = _gcp_fixture()[:12]
    fit = fit_tps(gcps)
    for px, py, ge, gn in gcps:
        dx, dy = px - fit["xm"], py - fit["ym"]
        for coefs, want in ((fit["ce"], ge), (fit["cn"], gn)):
            v = coefs[0] + coefs[1] * dx + coefs[2] * dy
            for r, (xr, yr) in enumerate(zip(fit["xs"], fit["ys"])):
                d2 = (dx - xr) ** 2 + (dy - yr) ** 2
                v += coefs[r + 3] * (d2 * math.log(d2) if d2 else 0.0)
            assert v == pytest.approx(want, abs=1e-7)


def test_tps_side_conditions():
    """The spline weights satisfy sum(c)=0, sum(c*x)=0, sum(c*y)=0."""
    fit = fit_tps(_gcp_fixture()[:12])
    for coefs in (fit["ce"], fit["cn"]):
        w = coefs[3:]
        assert sum(w) == pytest.approx(0.0, abs=1e-8)
        assert sum(c * x for c, x in zip(w, fit["xs"])) == \
            pytest.approx(0.0, abs=1e-7)
        assert sum(c * y for c, y in zip(w, fit["ys"])) == \
            pytest.approx(0.0, abs=1e-7)


def test_spark_apply_matches_driver_eval(spark):
    from gdal_spark.queries import q_gcp_polywarp
    fit = fit_polynomial(_gcp_fixture(), 2)
    rows = q_gcp_polywarp(spark, SF).filter("py = 11 AND px < 8").collect()
    for r in rows:
        t = _terms(r.px - fit["xm"], r.py - fit["ym"], 2)
        e = sum(c * v for c, v in zip(fit["ce"], t))
        n = sum(c * v for c, v in zip(fit["cn"], t))
        assert r.geo_e == pytest.approx(e, abs=1e-6)
        assert r.geo_n == pytest.approx(n, abs=1e-6)
