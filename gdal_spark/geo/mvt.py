"""Mapbox Vector Tile wire encoding — from scratch, no protobuf lib.

The reference ships MVT as an OGR driver (ogr/ogrsf_frmts/mvt/). The
pieces mirrored here, each against its reference site:

- integer tile coordinates: ConvertToTileCoords snaps mercator meters
  to extent units with round() and a y-down axis measured from the
  tile's top-left corner (ogrmvtdataset.cpp:3734-3751; default extent
  4096, mvt_tile.h:371);
- geometry command integers: (cmd_id | count << 3)
  (GetCmdCountCombined, ogrmvtdataset.cpp:3757; knCMD_MOVETO = 1,
  mvt_tile.h:52) followed by zigzag-encoded coordinate deltas
  (EncodeSInt) relative to the running cursor, with consecutive
  zero-deltas dropped (ogrmvtdataset.cpp:3838-3846);
- the tile container is the protobuf wire format written by hand —
  the reference also hand-rolls varints rather than linking protobuf
  (mvt_tile.cpp:234-449, WriteVarUInt / GetPackedArraySize), which is
  the same constraint as this container (no google.protobuf).

Only the POINT/MULTIPOINT feature path is implemented — the path the
page-geocode tiling pipeline needs; lines/polygons stay with the
existing rasterize/polygonize operators.

The SQL twin in queries._mvt_sql computes the identical command
stream as comma-joined text plus its varint byte length entirely in
codegen'd column math; this module exists to prove those numbers are
the real wire bytes (tests/test_mvt.py round-trips them).
"""

from __future__ import annotations

import numpy as np

EXTENT = 4096
CMD_MOVETO = 1

# -------------------------------------------------- vectorized pieces ---


def zigzag_np(d: np.ndarray) -> np.ndarray:
    """EncodeSInt: signed delta -> unsigned zigzag (2n / -2n-1)."""
    d = np.asarray(d, dtype=np.int64)
    return np.where(d >= 0, 2 * d, -2 * d - 1)


def varint_len_np(v: np.ndarray) -> np.ndarray:
    """Bytes the unsigned varint encoding of v occupies (v < 2**28)."""
    v = np.asarray(v, dtype=np.int64)
    return np.select([v < 128, v < 16384, v < 2097152], [1, 2, 3], 4)


def point_geometry_ints(lx: np.ndarray, ly: np.ndarray) -> np.ndarray:
    """MULTIPOINT geometry command stream for snapped extent coords.

    Input order is the caller's contract (the SQL twin sorts by
    (lx, ly) after DISTINCT — a deterministic normalization a
    distributed writer needs; the reference keeps feature order).
    Consecutive duplicate positions are dropped per the reference rule
    (under sorted-distinct input there are none). Cursor starts at
    (0, 0); MoveTo count = number of emitted points."""
    lx = np.asarray(lx, dtype=np.int64)
    ly = np.asarray(ly, dtype=np.int64)
    if len(lx):
        keep = np.ones(len(lx), dtype=bool)
        keep[1:] = (np.diff(lx) != 0) | (np.diff(ly) != 0)
        lx, ly = lx[keep], ly[keep]
    n = len(lx)
    dx = np.diff(lx, prepend=0)
    dy = np.diff(ly, prepend=0)
    out = np.empty(1 + 2 * n, dtype=np.int64)
    out[0] = CMD_MOVETO | (n << 3)
    out[1::2] = zigzag_np(dx)
    out[2::2] = zigzag_np(dy)
    return out


# ------------------------------------------------------ wire framing ---


def encode_varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + encode_varint(len(payload)) + payload


def encode_feature(fid: int, geometry: np.ndarray) -> bytes:
    """Tile.Feature: id(1)=varint, type(3)=POINT(1), geometry(4)=packed."""
    packed = b"".join(encode_varint(g) for g in np.asarray(geometry))
    return (_key(1, 0) + encode_varint(fid)
            + _key(3, 0) + encode_varint(1)
            + _len_delim(4, packed))


def encode_tile(layer_name: str, features: list[tuple[int, np.ndarray]],
                extent: int = EXTENT) -> bytes:
    """Tile: layers(3); Layer: version(15)=2, name(1), features(2),
    extent(5) — the vector_tile.proto field numbers the reference
    reader switches on (mvt_tile.cpp ReadLayer)."""
    layer = (_key(15, 0) + encode_varint(2)
             + _len_delim(1, layer_name.encode())
             + b"".join(_len_delim(2, encode_feature(f, g))
                        for f, g in features)
             + _key(5, 0) + encode_varint(extent))
    return _len_delim(3, layer)


# ---------------------------------------------------------- decoding ---


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = decode_varint(buf, pos)
        elif wt == 2:
            n, pos = decode_varint(buf, pos)
            v, pos = buf[pos:pos + n], pos + n
        else:  # pragma: no cover - wire types this encoder never emits
            raise ValueError(f"wire type {wt}")
        yield field, v


def decode_tile(buf: bytes) -> dict:
    """Inverse of encode_tile, for the round-trip tests."""
    out: dict = {"layers": []}
    for field, v in _fields(buf):
        if field != 3:
            continue
        layer = {"features": [], "extent": EXTENT}
        for lf, lv in _fields(v):
            if lf == 15:
                layer["version"] = lv
            elif lf == 1:
                layer["name"] = lv.decode()
            elif lf == 5:
                layer["extent"] = lv
            elif lf == 2:
                feat = {}
                for ff, fv in _fields(lv):
                    if ff == 1:
                        feat["id"] = fv
                    elif ff == 3:
                        feat["type"] = fv
                    elif ff == 4:
                        geom, pos = [], 0
                        while pos < len(fv):
                            g, pos = decode_varint(fv, pos)
                            geom.append(g)
                        feat["geometry"] = np.asarray(geom, dtype=np.int64)
                layer["features"].append(feat)
        out["layers"].append(layer)
    return out


def decode_point_geometry(geom: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Geometry command ints -> snapped (lx, ly) extent coordinates."""
    geom = np.asarray(geom, dtype=np.int64)
    cmd = geom[0]
    if cmd & 7 != CMD_MOVETO:
        raise ValueError("expected MoveTo")
    n = cmd >> 3
    zz = geom[1:1 + 2 * n]
    d = np.where(zz % 2 == 0, zz // 2, -(zz + 1) // 2)
    return np.cumsum(d[0::2]), np.cumsum(d[1::2])
