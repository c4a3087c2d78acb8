"""Hexagonal grid codec — the engine's replacement for the reference's stored
adjacency lists.

The reference (``src/cpu/hex_smooth_naive.cpp:9-12``, ``:26-42``) stores an
explicit neighbor list per cell read from a binary file.  We instead derive
neighbors *arithmetically* from a packed cell id: lat/lon (equirectangular
degrees) -> pointy-top axial hex coordinates ``(q, r)`` at a resolution-
dependent edge length -> ``(res, q, r)`` packed into a signed int64.  k-ring
neighborhoods (``k_ring(1)`` = 6 cells, ``k_ring(2)`` = 12 cells, mirroring
``MAX_NEIGHBORS``/``MAX_NEIGHBORS_2ND`` at ``src/cuda/hex_smooth_cuda_v5.cu:29-30``)
are pure integer offset arithmetic — no adjacency is ever stored or shuffled.

Everything here is vectorized numpy over int64/float64.  The exact same
formulas are emitted as SQL by ``cuda_gis_smoothing_ray.sql.oracles`` so the
DuckDB oracle and the Ray pipeline share one definition.  For that reason:

* rounding is ``floor(x + 0.5)`` (identical semantics in numpy and DuckDB;
  ``round()`` differs: banker's vs half-away-from-zero),
* constants are decimal literals, not library calls, where an oracle needs
  them (see ``WEIGHT_RING1`` etc. in :mod:`.weights`).
"""

from __future__ import annotations

import numpy as np

RES_MIN = 5
RES_MAX = 9

# Packing layout: cell = (res << 56) | ((q + OFF) << 28) | (r + OFF).
# OFF = 2^27 keeps q, r non-negative; res<=9 keeps the id < 2^60 (int64-safe,
# so the same ids survive a round-trip through DuckDB BIGINT and Arrow int64).
OFF = 1 << 27
COORD_MASK = (1 << 28) - 1

SQRT3 = float(np.sqrt(3.0))  # correctly-rounded double; duckdb sqrt(3) is identical


def edge_size(res: int) -> float:
    """Hex edge length in degrees at resolution ``res`` (5..9).

    Powers of two so the constant is exact in binary: res5=4.0, res6=2.0,
    res7=1.0, res8=0.5, res9=0.25.
    """
    if not (RES_MIN <= res <= RES_MAX):
        raise ValueError(f"resolution {res} outside [{RES_MIN},{RES_MAX}]")
    return 4.0 / (2.0 ** (res - RES_MIN))


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the nearest hex (cube rounding).

    Uses floor(x+0.5), not round(), so the SQL oracle reproduces it exactly.
    """
    xf, zf = qf, rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def latlon_to_axial(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Equirectangular (lat, lon) degrees -> axial (q, r) at ``res``.

    Canonical formula (mirrored verbatim in SQL):
        qf = (sqrt(3)/3 * lon - lat/3) / size
        rf = (2 * lat / 3) / size
    """
    size = edge_size(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    qf = (SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 * lat / 3.0) / size
    return _cube_round(qf, rf)


def axial_to_latlon(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center (lat, lon) of axial (q, r) — exact inverse of the fractional
    transform in :func:`latlon_to_axial`."""
    size = edge_size(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    lon = size * SQRT3 * (q + r / 2.0)
    lat = size * 1.5 * r
    return lat, lon


def pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return (np.int64(res) << np.int64(56)) | ((q + OFF) << np.int64(28)) | (r + OFF)


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell -> (res, q, r)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(56)
    q = ((cell >> np.int64(28)) & COORD_MASK) - OFF
    r = (cell & COORD_MASK) - OFF
    return res, q, r


def latlon_to_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    q, r = latlon_to_axial(lat, lon, res)
    return pack(res, q, r)


def cell_to_latlon(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = unpack(cell)
    # all cells in one call must share a resolution for the vectorized path
    res_arr = np.atleast_1d(res)
    r0 = int(res_arr[0]) if res_arr.size else RES_MIN
    return axial_to_latlon(q, r, r0)


def hex_distance(q1, r1, q2, r2) -> np.ndarray:
    """Axial hex distance: (|dq| + |dr| + |dq+dr|) / 2."""
    dq = np.asarray(q1, dtype=np.int64) - np.asarray(q2, dtype=np.int64)
    dr = np.asarray(r1, dtype=np.int64) - np.asarray(r2, dtype=np.int64)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def ring_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets at exactly hex distance ``k``; |ring 1| = 6,
    |ring 2| = 12 — matching MAX_NEIGHBORS / MAX_NEIGHBORS_2ND
    (``src/cuda/hex_smooth_cuda_v2.cu:22``, ``v5.cu:30``).  Deterministic
    lexicographic order."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 == k:
                out.append((dq, dr))
    return out


RING1 = ring_offsets(1)   # 6 offsets
RING2 = ring_offsets(2)   # 12 offsets


def kring_cells(cell: np.ndarray, k: int, include_center: bool = True) -> np.ndarray:
    """For each input cell, the cells of its k-ring *disc* (all cells at
    distance <= k), shape (n, m).  Duplicate-free by construction — the
    reference needs a std::set for this (``hex_smooth_cuda_v5.cu:429-456``)."""
    res, q, r = unpack(cell)
    res0 = int(np.atleast_1d(res)[0]) if np.atleast_1d(res).size else RES_MIN
    offs = ([(0, 0)] if include_center else [])
    for kk in range(1, k + 1):
        offs += ring_offsets(kk)
    dq = np.array([o[0] for o in offs], dtype=np.int64)
    dr = np.array([o[1] for o in offs], dtype=np.int64)
    return pack(res0, q[:, None] + dq[None, :], r[:, None] + dr[None, :])


def morton_key(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Z-order key by interleaving the low 16 bits of (q+32768, r+32768),
    the engine analog of ``morton2D`` (``src/cuda/hex_smooth_cuda_v4.cu:29-44``).

    Magic-number bit spreading; int64 throughout so the SQL oracle can use the
    identical shift/mask sequence on BIGINT.
    """
    def spread(v: np.ndarray) -> np.ndarray:
        v = v & np.int64(0xFFFF)
        v = (v | (v << np.int64(8))) & np.int64(0x00FF00FF)
        v = (v | (v << np.int64(4))) & np.int64(0x0F0F0F0F)
        v = (v | (v << np.int64(2))) & np.int64(0x33333333)
        v = (v | (v << np.int64(1))) & np.int64(0x55555555)
        return v

    x = np.asarray(q, dtype=np.int64) + np.int64(32768)
    y = np.asarray(r, dtype=np.int64) + np.int64(32768)
    return spread(x) | (spread(y) << np.int64(1))


def hilbert_key(q: np.ndarray, r: np.ndarray, bits: int = 16) -> np.ndarray:
    """Hilbert-curve index of (q+32768, r+32768) on a 2^bits x 2^bits grid —
    the locality-preserving alternative to :func:`morton_key` (the reference
    studies Morton layout only, ``hex_smooth_cuda_v4.cu:29-44``; Hilbert has
    strictly better worst-case neighbor locality).  Standard xy2d rotation
    recurrence, vectorized over cells; all-integer, so the SQL oracle's
    unrolled 16-step CTE chain reproduces it exactly."""
    x = np.asarray(q, dtype=np.int64) + np.int64(32768)
    y = np.asarray(r, dtype=np.int64) + np.int64(32768)
    x = np.atleast_1d(x).copy()
    y = np.atleast_1d(y).copy()
    d = np.zeros(len(x), dtype=np.int64)
    for i in range(bits - 1, -1, -1):
        s = np.int64(1 << i)
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        nx = np.where(ry == 0, np.where(flip, s - 1 - y, y), x)
        ny = np.where(ry == 0, np.where(flip, s - 1 - x, x), y)
        x, y = nx, ny
    return d
