"""MVT wire-format round-trip: the mvt_encode query's command text and
byte counts must be the REAL protobuf tile bytes (geo/mvt.py), and the
snapped coordinates must match an independent numpy derivation of the
reference rule (ConvertToTileCoords, ogrmvtdataset.cpp:3734-3751)."""

import numpy as np
import pytest

from conftest import SF_SMOKE

from gdal_spark.geo import mercator as M
from gdal_spark.geo import mvt


def test_varint_roundtrip_and_len():
    vals = [0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152, 4001]
    for v in vals:
        buf = mvt.encode_varint(v)
        assert len(buf) == int(mvt.varint_len_np(np.array([v]))[0])
        dec, pos = mvt.decode_varint(buf, 0)
        assert (dec, pos) == (v, len(buf))


def test_zigzag_matches_reference_rule():
    d = np.array([0, -1, 1, -2, 2, -4096, 4096])
    # EncodeSInt: (n << 1) ^ (n >> 31)
    expect = np.array([(int(n) << 1) ^ (int(n) >> 63) for n in d])
    assert (mvt.zigzag_np(d) == expect).all()


def test_point_geometry_drops_consecutive_dups():
    lx = np.array([5, 5, 9])
    ly = np.array([7, 7, 7])
    geom = mvt.point_geometry_ints(lx, ly)
    assert geom[0] == (1 | (2 << 3))  # MoveTo count=2, dup dropped
    gx, gy = mvt.decode_point_geometry(geom)
    assert gx.tolist() == [5, 9] and gy.tolist() == [7, 7]


def test_tile_wire_roundtrip():
    geom = mvt.point_geometry_ints(np.array([10, 20]), np.array([30, 4096]))
    buf = mvt.encode_tile("pages", [(42, geom)])
    tile = mvt.decode_tile(buf)
    (layer,) = tile["layers"]
    assert layer["name"] == "pages" and layer["version"] == 2
    assert layer["extent"] == 4096
    (feat,) = layer["features"]
    assert feat["id"] == 42 and feat["type"] == 1
    assert (feat["geometry"] == geom).all()


@pytest.fixture(scope="module")
def encoded(spark):
    from gdal_spark.queries import q_mvt_encode
    return q_mvt_encode(spark, SF_SMOKE).toPandas()


def test_query_geom_bytes_are_wire_exact(encoded):
    """The SQL varint byte count must equal len() of the real packed
    geometry bytes for every tile."""
    for _, row in encoded.iterrows():
        geom = np.array([int(t) for t in row["geom_cmds"].split(",")])
        packed = b"".join(mvt.encode_varint(g) for g in geom)
        assert row["geom_bytes"] == len(packed), row["geom_cmds"]
        assert geom[0] >> 3 == row["n_points"]
        assert len(geom) == 1 + 2 * row["n_points"]


def test_query_matches_numpy_reference_rule(spark, encoded):
    """Decode each tile's command stream and compare the recovered
    snapped positions against an independent numpy derivation from
    lat/lon (mercator meters -> round((x-topX)*4096/dim), y down)."""
    from gdal_spark.queries import pages_df
    p = (pages_df(spark, SF_SMOKE).filter("lat IS NOT NULL")
         .select("lat", "lon").toPandas())
    mx, my = M.latlon_to_meters_np(p["lat"].to_numpy(),
                                   p["lon"].to_numpy())
    tx, ty = M.latlon_to_tile_np(p["lat"].to_numpy(),
                                 p["lon"].to_numpy(), 5)
    os_, dim = np.pi * 6378137, 2 * np.pi * 6378137 / 2 ** 5
    lx = np.round((mx - (tx * dim - os_)) * 4096.0 / dim).astype(np.int64)
    ly = np.round(((os_ - ty * dim) - my) * 4096.0 / dim).astype(np.int64)
    want = {}
    for t in set(zip(tx.tolist(), ty.tolist())):
        m = (tx == t[0]) & (ty == t[1])
        want[t] = sorted(set(zip(lx[m].tolist(), ly[m].tolist())))
    got = {}
    for _, row in encoded.iterrows():
        geom = np.array([int(s) for s in row["geom_cmds"].split(",")])
        gx, gy = mvt.decode_point_geometry(geom)
        got[(row["tx"], row["ty"])] = list(zip(gx.tolist(), gy.tolist()))
    assert got == want
    # and the full tile survives the wire
    for t, pts in got.items():
        geom = mvt.point_geometry_ints(
            np.array([a for a, _ in pts]), np.array([b for _, b in pts]))
        tile = mvt.decode_tile(mvt.encode_tile("pages", [(1, geom)]))
        rx, ry = mvt.decode_point_geometry(
            tile["layers"][0]["features"][0]["geometry"])
        assert list(zip(rx.tolist(), ry.tolist())) == pts
