"""S2 cell ids, pure numpy, vectorized — the fallback spatial index.

Implements the public S2 geometry cell-id scheme (s2geometry.io docs and
the open-source s2geometry reference algorithm): lat/lng → unit sphere
xyz → cube face + (u,v) → quadratic (s,t) transform → 30-bit (i,j) →
Hilbert-curve position → 64-bit cell id ``face(3b) | pos | 1-sentinel``.

Plays the role of the reference's secondary grid (WorldCover 3° tiles,
``/root/reference/src/core/coordinate_utils_v3.py:327-358``) per the
north rule ("S2 fallback index").

The Hilbert traversal uses the standard 4-bit lookup-table construction
(kPosToIJ / kPosToOrientation), vectorized over numpy uint64 arrays.
No external s2 library exists in this environment; correctness is
checked by structural invariants in tests (roundtrip, hierarchy,
face placement, curve adjacency).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, orient: int, pos: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig,
            orient ^ _POS_TO_ORIENT[idx],
            pos + idx,
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, _o, 0)


def latlng_to_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest absolute component decides the cube face
    fx = (ax >= ay) & (ax >= az)
    fy = (~fx) & (ay >= az)
    face = np.where(fx, np.where(x >= 0, 0, 3), np.where(fy, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face.astype(np.int64), u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1).astype(np.uint64)


def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized FromFaceIJ: Hilbert-encode (i,j) on a face → cell id."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(POS_BITS - 1)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    neg_lsb = np.bitwise_not(lsb) + np.uint64(1)  # two's complement -lsb
    return (leaf & neg_lsb) | lsb


def id_to_face_ij(cell: np.ndarray):
    """Inverse of face_ij_to_id at leaf resolution (ToFaceIJOrientation)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(POS_BITS)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    i = np.zeros_like(cell)
    j = np.zeros_like(cell)
    mask = np.uint64((1 << (2 * LOOKUP_BITS)) - 1)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        chunk_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((cell >> np.uint64(k * 2 * LOOKUP_BITS + 1)) & chunk_mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(LOOKUP_BITS + 2)) << np.uint64(k * LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << LOOKUP_BITS) - 1)) << np.uint64(k * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i, j


def latlng_to_cell(lon_deg, lat_deg, level: int = 13) -> np.ndarray:
    """Vectorized lon/lat → S2 cell id at ``level`` (returned as uint64)."""
    x, y, z = latlng_to_xyz(lon_deg, lat_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return face_ij_to_id(face, i, j, level)


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (np.uint64(0) - cell)
    # lsb = 2^(2*(30-level)) → level = 30 - log2(lsb)/2
    return (MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2)).astype(np.int64)


def cell_to_latlng(cell: np.ndarray):
    """Center of a (leaf or non-leaf) cell → (lon_deg, lat_deg)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face, i, j = id_to_face_ij(cell)
    # center of the leaf cell: st at (ij + 0.5) / 2^30
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            x[m], y[m], z[m] = 1.0, u[m], v[m]
        elif f == 1:
            x[m], y[m], z[m] = -u[m], 1.0, v[m]
        elif f == 2:
            x[m], y[m], z[m] = -u[m], -v[m], 1.0
        elif f == 3:
            x[m], y[m], z[m] = -1.0, -v[m], -u[m]
        elif f == 4:
            x[m], y[m], z[m] = v[m], -1.0, -u[m]
        else:
            x[m], y[m], z[m] = v[m], u[m], -1.0
    lon = np.rad2deg(np.arctan2(y, x))
    lat = np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    neg_lsb = np.bitwise_not(lsb) + np.uint64(1)
    return (cell & neg_lsb) | lsb
