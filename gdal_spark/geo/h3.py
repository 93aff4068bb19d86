"""H3-style aperture-7 hexagonal hierarchical cell index, pure numpy.

The north rule mandates H3 **and** S2 cell indexing as the Spark-side
physical design (cell indexing does not exist in GDAL itself — the
semantics we match are GDAL's spatial-filter semantics; S2 lives in
``geo/s2.py``). The container ships no h3 library, so this implements
the *published* H3 scheme (h3geo.org docs, Apache-2.0 reference
algorithm description) from scratch:

- lat/lon → unit XYZ → nearest icosahedron face (max dot with the 20
  face centers; the icosahedron is constructed analytically from the
  golden ratio, not from tables)
- gnomonic projection onto the face's tangent plane → (u, v)
- aperture-7 hex grid at resolution r: cell size ``R0·7^(-r/2)``,
  Class III resolutions (odd r) rotated by ``α = atan(√3/5) ≈ 19.107°``
  relative to Class II (even r) — the published H3 subdivision geometry
- fractional axial coords → integer hex cell via cube rounding
- per-resolution digits by peeling with the exact integer aperture-7
  lattice maps (upAp7 / upAp7r and their integer inverses downAp7 /
  downAp7r, the published H3 CoordIJK arithmetic)
- 64-bit id = res(4 bits) | face(6 bits) | root(3 bits) | 15 × 3-bit
  digits (unused fine digits = 7), mirroring H3's index layout with
  (face, root) standing in for H3's 7-bit base-cell field.

**Deliberate deviation, documented:** ids are NOT bit-compatible with
Uber H3. H3's 122-base-cell orientation/overage tables cannot be
reproduced offline without the library to verify against; instead,
resolution 0 here is (face, root) — the face-center hex plus its ring-1
neighbors on each icosahedron face (≤140 res-0 cells, the analog of
H3's 122 base cells: the ring-1 roots absorb the peel drift of points
near face edges exactly like H3's base-cell overage tables do) — and
cells are face-clipped: a point is always indexed on its *nearest*
face, so hex cells straddling a face edge are split between the two
faces. Every property a Spark pipeline uses the index for —
determinism, hierarchy (exact parent/child digit arithmetic), k-ring
adjacency, ~uniform cell area — holds and is property-tested
(tests/test_h3.py).

Parent/child and k-ring are *exact by construction* (integer lattice
arithmetic on the digit encoding), not re-projection heuristics.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
#: res-0 hex circumradius on the gnomonic plane. The face triangle's
#: vertices project 0.7639 from center (tan of the 37.377° vertex-to-
#: face-center angle); inradius of a R0=1.0 hex is 0.866 > 0.764, so
#: the res-0 hex covers the whole face.
R0 = 1.0
#: Class III rotation (published aperture-7 angle): atan(√3/5).
ALPHA = float(np.arctan(np.sqrt(3.0) / 5.0))


# ---------------------------------------------------------------------
# icosahedron, constructed analytically
# ---------------------------------------------------------------------

def _build_icosahedron():
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a, b in ((1.0, phi), (-1.0, phi), (1.0, -phi), (-1.0, -phi)):
        verts.append((0.0, a, b))
        verts.append((a, b, 0.0))
        verts.append((b, 0.0, a))
    v = np.array(verts, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # faces = vertex triples at mutual edge distance (adjacent pairs
    # have the maximal pairwise dot product ≈ 0.4472)
    dots = v @ v.T
    adj = dots > 0.4  # adjacent iff dot = 1/√5 ≈ 0.447; next is -0.447
    np.fill_diagonal(adj, False)
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array([v[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic local axes per face: x toward vertex 0's projection
    ax_x = []
    ax_y = []
    for fi, f in enumerate(faces):
        c = centers[fi]
        p = v[f[0]] - np.dot(v[f[0]], c) * c
        p /= np.linalg.norm(p)
        ax_x.append(p)
        ax_y.append(np.cross(c, p))
    return v, faces, centers, np.array(ax_x), np.array(ax_y)


_VERTS, _FACES, _CENTERS, _AX_X, _AX_Y = _build_icosahedron()


# ---------------------------------------------------------------------
# hex lattice helpers (axial coords, pointy-top; public formulas)
# ---------------------------------------------------------------------

def _cube_round(qf, rf):
    """Fractional axial → nearest integer axial (standard cube round)."""
    xf, zf = qf, rf
    yf = -xf - zf
    x = np.rint(xf)
    y = np.rint(yf)
    z = np.rint(zf)
    dx = np.abs(x - xf)
    dy = np.abs(y - yf)
    dz = np.abs(z - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    x = np.where(fix_x, -y - z, x)
    z = np.where(fix_z, -x - y, z)
    return x.astype(np.int64), z.astype(np.int64)


def _xy_to_axial(x, y, size):
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def _axial_to_xy(q, r, size):
    x = size * np.sqrt(3.0) * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


# exact integer aperture-7 lattice maps (published H3 CoordIJK math,
# expressed on axial coords). up* carries a child cell to its parent
# via the fractional 1/7 matrix + cube round; down* are the exact
# integer inverses placing a parent's center in the child lattice.

def _up_ap7(q, r):
    # rounded inverse of _down_ap7: (1/7)·[[2,-1],[1,3]]
    return _cube_round((2.0 * q - r) / 7.0, (q + 3.0 * r) / 7.0)


def _up_ap7r(q, r):
    # rounded inverse of _down_ap7r: (1/7)·[[3,1],[-1,2]]
    return _cube_round((3.0 * q + r) / 7.0, (2.0 * r - q) / 7.0)


def _down_ap7(q, r):
    # odd child res (even parent → odd child, grid rotates by +ALPHA):
    # √7·M⁻¹·R(-ALPHA)·M = [[3,1],[-1,2]] on column (q,r)
    return 3 * q + r, -q + 2 * r


def _down_ap7r(q, r):
    # even child res (odd parent → even child, rotation -ALPHA):
    # √7·M⁻¹·R(+ALPHA)·M = [[2,-1],[1,3]]
    return 2 * q - r, q + 3 * r


#: the 7 child-lattice offsets of a parent center: center + 6 axial
#: unit directions; digit = index into this table.
_DIGIT_DIRS = np.array(
    [(0, 0), (1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)],
    dtype=np.int64)
_DIR_TO_DIGIT = {tuple(d): i for i, d in enumerate(_DIGIT_DIRS)}


def _res_size(res: int) -> float:
    return R0 * 7.0 ** (-res / 2.0)


def _res_rot(res: int) -> float:
    """Cumulative grid rotation at resolution ``res`` (Class III on
    odd resolutions, aligned on even — the alternation falls out of
    using up_ap7 for odd→even peels and up_ap7r for even→odd)."""
    return ALPHA if res % 2 else 0.0


# ---------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------

def _latlon_to_face_uv(lat, lon):
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(lat)
    p = np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=-1)
    face = np.argmax(p @ _CENTERS.T, axis=-1)
    c = _CENTERS[face]
    scale = np.sum(p * c, axis=-1, keepdims=True)
    g = p / scale - c  # gnomonic offset in the tangent plane
    u = np.sum(g * _AX_X[face], axis=-1)
    v = np.sum(g * _AX_Y[face], axis=-1)
    return face.astype(np.int64), u, v


def _face_uv_to_latlon(face, u, v):
    c = _CENTERS[face]
    p = c + u[:, None] * _AX_X[face] + v[:, None] * _AX_Y[face]
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1.0, 1.0)))
    lon = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    return lat, lon


# ---------------------------------------------------------------------
# index encode/decode
# ---------------------------------------------------------------------

# bit layout: res 54..57 | face 48..53 | root 45..47 | digits 0..44
_RES_SHIFT, _FACE_SHIFT, _ROOT_SHIFT = 54, 48, 45


def _encode(res, face, root, digits):
    """res int, face/root int arrays, digits (n, res) int array."""
    n = len(face)
    out = ((np.full(n, int(res), dtype=np.int64) << _RES_SHIFT)
           | (face << _FACE_SHIFT) | (root << _ROOT_SHIFT))
    fill = np.full(n, 7, dtype=np.int64)
    for d in range(MAX_RES):
        val = digits[:, d] if d < res else fill
        out |= val << (3 * (MAX_RES - 1 - d))
    return out


def cell_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> _RES_SHIFT) & 0xF


def cell_face(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> _FACE_SHIFT) & 0x3F


def cell_root(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> _ROOT_SHIFT) & 0x7


def _cell_digits(cell, res):
    cell = np.asarray(cell, dtype=np.int64)
    return np.stack(
        [(cell >> (3 * (MAX_RES - 1 - d))) & 0x7 for d in range(res)],
        axis=1) if res else np.zeros((len(cell), 0), dtype=np.int64)


def _digits_to_axial(root, digits, res):
    """Replay root + digits → axial coords on the res-``res`` lattice."""
    q = _DIGIT_DIRS[root, 0].copy()
    r = _DIGIT_DIRS[root, 1].copy()
    for d in range(res):
        child_res = d + 1
        down = _down_ap7 if child_res % 2 else _down_ap7r
        q, r = down(q, r)
        q = q + _DIGIT_DIRS[digits[:, d], 0]
        r = r + _DIGIT_DIRS[digits[:, d], 1]
    return q, r


def _axial_to_digits(q, r, res):
    """Peel res-lattice axial coords into per-resolution digits.
    Returns (digits (n, res), root digit index); the root lands in the
    7-cell ring-≤1 set for every on-face point (geometric bound: peel
    drift ≤ 0.61·R0 + triangle extent 0.77·R0 < ring-2 reach)."""
    n = len(q)
    digits = np.zeros((n, res), dtype=np.int64)
    for child_res in range(res, 0, -1):
        up = _up_ap7 if child_res % 2 else _up_ap7r
        down = _down_ap7 if child_res % 2 else _down_ap7r
        pq, pr = up(q, r)
        cq, cr = down(pq, pr)
        dq, dr = q - cq, r - cr
        dig = np.full(n, -1, dtype=np.int64)
        for i, (uq, ur) in enumerate(_DIGIT_DIRS):
            dig = np.where((dq == uq) & (dr == ur), i, dig)
        if (dig < 0).any():
            raise AssertionError("aperture-7 residual outside digit set")
        digits[:, child_res - 1] = dig
        q, r = pq, pr
    root = np.full(n, -1, dtype=np.int64)
    for i, (uq, ur) in enumerate(_DIGIT_DIRS):
        root = np.where((q == uq) & (r == ur), i, root)
    return digits, root


def latlon_to_cell(lat, lon, res: int) -> np.ndarray:
    """Vectorized lat/lon (degrees) → 64-bit cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be 0..{MAX_RES}")
    face, u, v = _latlon_to_face_uv(lat, lon)
    rot = _res_rot(res)
    cosr, sinr = np.cos(-rot), np.sin(-rot)
    ur = u * cosr - v * sinr
    vr = u * sinr + v * cosr
    qf, rf = _xy_to_axial(ur, vr, _res_size(res))
    q, r = _cube_round(qf, rf)
    digits, root = _axial_to_digits(q, r, res)
    if (root < 0).any():
        raise AssertionError("point escaped the ring-1 res-0 roots")
    return _encode(res, face, root, digits)


def cell_to_parent(cell) -> np.ndarray:
    """Exact parent via digit truncation (integer arithmetic only)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if (res == 0).any():
        raise ValueError("res-0 cells have no parent")
    new_res = res - 1
    pos = 3 * (MAX_RES - res)  # position of the dropped digit
    cleared = cell | (np.int64(7) << pos)
    return (cleared & ~(np.int64(0xF) << _RES_SHIFT)) \
        | (new_res << _RES_SHIFT)


def cell_to_children(cell) -> np.ndarray:
    """The 7 children of each cell → (n, 7) int64."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if len(np.unique(res)) > 1:
        raise ValueError("mixed resolutions")
    r = int(res[0])
    if r >= MAX_RES:
        raise ValueError("max res")
    pos = 3 * (MAX_RES - 1 - r)
    base = (cell & ~(np.int64(0xF) << _RES_SHIFT) & ~(np.int64(7) << pos)) \
        | (np.int64(r + 1) << _RES_SHIFT)
    return base[:, None] | (np.arange(7, dtype=np.int64)[None, :] << pos)


def cell_to_center(cell):
    """Cell id → (lat, lon) of the cell's lattice center point."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if len(np.unique(res)) > 1:
        raise ValueError("mixed resolutions")
    r = int(res[0])
    face = cell_face(cell)
    q, rr = _digits_to_axial(cell_root(cell), _cell_digits(cell, r), r)
    x, y = _axial_to_xy(q.astype(np.float64), rr.astype(np.float64),
                        _res_size(r))
    rot = _res_rot(r)
    cosr, sinr = np.cos(rot), np.sin(rot)
    u = x * cosr - y * sinr
    v = x * sinr + y * cosr
    return _face_uv_to_latlon(face, u, v)


def k_ring(cell, k: int) -> np.ndarray:
    """All cells within ``k`` lattice steps, same face → (n, m) int64
    with m = 1 + 3k(k+1). Face-clipped: ring cells keep the center
    cell's face (cross-face neighbors are the documented deviation);
    ring cells whose peel escapes the ring-1 root set are -1."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if len(np.unique(res)) > 1:
        raise ValueError("mixed resolutions")
    r = int(res[0])
    face = cell_face(cell)
    q, rr = _digits_to_axial(cell_root(cell), _cell_digits(cell, r), r)
    offs = [(dq, dr)
            for dq in range(-k, k + 1)
            for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)]
    offs = np.array(offs, dtype=np.int64)
    nq = (q[:, None] + offs[None, :, 0]).ravel()
    nr = (rr[:, None] + offs[None, :, 1]).ravel()
    digits, root = _axial_to_digits_clipped(nq, nr, r)
    faces = np.repeat(face, len(offs))
    ids = _encode(r, faces, np.maximum(root, 0), digits)
    ids = np.where(root >= 0, ids, np.int64(-1))
    return ids.reshape(len(cell), len(offs))


def _axial_to_digits_clipped(q, r, res):
    """Like _axial_to_digits but tolerates an out-of-set root (returns
    root = -1 instead of raising) — k_ring needs this at face edges."""
    n = len(q)
    digits = np.zeros((n, res), dtype=np.int64)
    for child_res in range(res, 0, -1):
        up = _up_ap7 if child_res % 2 else _up_ap7r
        down = _down_ap7 if child_res % 2 else _down_ap7r
        pq, pr = up(q, r)
        cq, cr = down(pq, pr)
        dq, dr = q - cq, r - cr
        dig = np.full(n, 0, dtype=np.int64)
        for i, (uq, ur) in enumerate(_DIGIT_DIRS):
            dig = np.where((dq == uq) & (dr == ur), i, dig)
        digits[:, child_res - 1] = dig
        q, r = pq, pr
    root = np.full(n, -1, dtype=np.int64)
    for i, (uq, ur) in enumerate(_DIGIT_DIRS):
        root = np.where((q == uq) & (r == ur), i, root)
    return digits, root
