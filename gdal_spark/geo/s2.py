"""S2 cell ids in pure vectorized numpy.

The north rule mandates an H3/S2 cell index as the Spark-side physical
design (SURVEY.md scoping note: cell indexing does not exist in GDAL
itself; the semantics we match are GDAL's spatial-filter semantics).
The container ships no s2/h3 library, so this implements the published
S2 cell-id scheme (s2geometry.io, Apache-2.0 reference algorithm) from
scratch:

- lat/lon → unit XYZ → cube face (0..5) + (u,v)
- quadratic u→s projection: ``s = 0.5*sqrt(1+3u)`` for u>=0 else
  ``1 - 0.5*sqrt(1-3u)``
- (s,t) → leaf (i,j) at 2^30 resolution
- Hilbert curve position via the standard 2-bit order/orientation
  tables; 64-bit id = face(3 bits) | position(2*level bits) | lsb marker.

Used as a secondary spatial index column (`s2_cell`); the engine's
join/tiling prefilters use Web-Mercator XYZ tiles (mercator.py) whose
math is the reference's own (gdal2tiles.py), but S2 gives a uniform-area
hierarchical key useful for skew stats and Hilbert-like write locality.
Verified by round-trip + hierarchy property tests (tests/test_s2.py).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_TO_IJ = np.array([[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64)
_IJ_TO_POS = np.array([[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.int64)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)  # swap, none, none, swap|invert


def latlon_to_xyz(lat, lon):
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative major axis → face+3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate([
        (lambda: y / x, lambda: z / x),        # 0: +x
        (lambda: -x / y, lambda: z / y),       # 1: +y
        (lambda: -x / z, lambda: -y / z),      # 2: +z
        (lambda: z / x, lambda: y / x),        # 3: -x
        (lambda: z / y, lambda: -x / y),       # 4: -y
        (lambda: -y / z, lambda: -x / z),      # 5: -z
    ]):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                uu, vv = ue(), ve()
            u[m], v[m] = uu[m], vv[m]
    return face, u, v


def _uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s):
    return np.clip(np.floor(np.asarray(s) * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def face_ij_to_pos(face, i, j):
    """Hilbert position (60 bits) of leaf (i,j) on a face."""
    pos = np.zeros_like(i)
    orient = face & 1  # initial orientation = face & kSwapMask
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij = (bi << 1) | bj
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def pos_to_face_ij(face, pos):
    """Inverse of face_ij_to_pos (leaf level)."""
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    orient = face & 1
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


def latlon_to_cell(lat, lon, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized lat/lon → S2 cell id at `level` (int64)."""
    x, y, z = latlon_to_xyz(lat, lon)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = face_ij_to_pos(face, i, j)
    leaf = (face.astype(np.uint64) << np.uint64(61)) | (pos.astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf.astype(np.int64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (((leaf & ~(lsb - np.uint64(1))) | lsb)).astype(np.int64)


def cell_to_center_latlon(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → center lat/lon (any level; uses the id's lsb)."""
    c = np.asarray(cell).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # promote to the leaf at the cell center: center leaf pos = id (the
    # lsb marker bit IS the center in S2's id scheme)
    face = (c >> np.uint64(61)).astype(np.int64)
    pos = ((c & ((np.uint64(1) << np.uint64(61)) - np.uint64(1))) >> np.uint64(1)).astype(np.int64)
    i, j = pos_to_face_ij(face, pos)
    del lsb
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u, v = _st_to_uv(s), _st_to_uv(t)
    # face uv → xyz (inverse of xyz_to_face_uv tables)
    ones = np.ones_like(u)
    xyz_by_face = [
        (ones, u, v), (-u, ones, v), (-u, -v, ones),
        (-ones, -v, -u), (v, -ones, -u), (v, u, -ones),
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xf, yf, zf) in enumerate(xyz_by_face):
        m = face == f
        x[m], y[m], z[m] = xf[m], yf[m], zf[m]
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def parent(cell, level: int) -> np.ndarray:
    """Ancestor id at coarser `level`."""
    c = np.asarray(cell).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & ~(lsb - np.uint64(1))) | lsb).astype(np.int64)


def cell_level(cell) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # level = 30 - trailing_zeros/2
    tz = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (v & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
        big = v >> np.uint64(shift)
        v = np.where(m & (big > 0), big, v)
        tz = np.where(m & (big > 0), tz + shift, tz)
    return MAX_LEVEL - tz // 2
