"""RPC forward transform vs a direct Python transliteration of
alg/gdal_rpc.cpp RPCTransformPoint (normalize -> RPC00B 20-term basis
-> even/odd split-sum rational -> denormalize + 0.5)."""

import pytest

from gdal_spark.operators.rpc import RPC_TERMS
from gdal_spark.queries import _rpc_fixture

SF = "/root/testdata/sf0.001"


def _ref(rpc, lon, lat, hgt):
    P = (lon - rpc["long_off"]) / rpc["long_scale"]
    L = (lat - rpc["lat_off"]) / rpc["lat_scale"]
    H = (hgt - rpc["height_off"]) / rpc["height_scale"]
    t = [P ** ep * L ** el * H ** eh for ep, el, eh in RPC_TERMS]

    def ev(c):
        s1 = sum(t[i] * c[i] for i in range(0, 20, 2))
        s2 = sum(t[i] * c[i] for i in range(1, 20, 2))
        return s1 + s2

    x = ev(rpc["samp_num"]) / ev(rpc["samp_den"])
    y = ev(rpc["line_num"]) / ev(rpc["line_den"])
    return (x * rpc["samp_scale"] + rpc["samp_off"] + 0.5,
            y * rpc["line_scale"] + rpc["line_off"] + 0.5)


def test_terms_match_reference_order():
    # spot-pin the published table: t4 = long*lat, t12 = long*lat^2
    assert RPC_TERMS[4] == (1, 1, 0)
    assert RPC_TERMS[12] == (1, 2, 0)
    assert RPC_TERMS[19] == (0, 0, 3)
    assert len(RPC_TERMS) == 20


def test_transform_matches_transliteration(spark):
    from gdal_spark.queries import q_rpc_transform
    rpc = _rpc_fixture()
    rows = q_rpc_transform(spark, SF).collect()
    assert len(rows) == 4096
    for r in rows[::41] + rows[:3]:
        lon = 44.0 - 0.22 + (r.px / 63.0) * 0.44
        lat = 31.5 - 0.18 + (r.py / 63.0) * 0.36
        hgt = 500.0 + ((r.px * r.py) % 7 - 3) * 100.0
        wx, wy = _ref(rpc, lon, lat, hgt)
        assert r.pixel == pytest.approx(wx, abs=1e-5)
        assert r.line == pytest.approx(wy, abs=1e-5)


def test_center_maps_near_offsets(spark):
    """At the normalization center the rational is dominated by the
    constant/linear terms; pixel must sit near SAMP_OFF."""
    from gdal_spark.queries import q_rpc_transform
    rpc = _rpc_fixture()
    rows = {(r.py, r.px): r for r in
            q_rpc_transform(spark, SF).collect()}
    # px=31.5 is between cells; take px=32,py=32 (slightly off-center)
    r = rows[(32, 32)]
    assert abs(r.pixel - rpc["samp_off"]) < 0.1 * rpc["samp_scale"]
    assert abs(r.line - rpc["line_off"]) < 0.1 * rpc["line_scale"]
