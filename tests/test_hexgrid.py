"""Codec + k-ring property tests (FIXTURES.md golden invariants 3-5)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cuda_gis_smoothing_ray.functions import hexgrid as hg
from cuda_gis_smoothing_ray.functions import weights as w


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(-(1 << 20), 1 << 20, 10000)
    r = rng.integers(-(1 << 20), 1 << 20, 10000)
    for res in range(hg.RES_MIN, hg.RES_MAX + 1):
        cell = hg.pack(res, q, r)
        res2, q2, r2 = hg.unpack(cell)
        assert (res2 == res).all() and (q2 == q).all() and (r2 == r).all()


def test_latlon_cell_roundtrip_all_res():
    """cell -> center latlon -> cell is identity (invariant 5: resolution
    round-trips)."""
    rng = np.random.default_rng(2)
    lat = rng.uniform(-85, 85, 5000)
    lon = rng.uniform(-179, 179, 5000)
    for res in range(hg.RES_MIN, hg.RES_MAX + 1):
        cell = hg.latlon_to_cell(lat, lon, res)
        clat, clon = hg.cell_to_latlon(cell)
        cell2 = hg.latlon_to_cell(clat, clon, res)
        assert (cell == cell2).all()


def test_cell_center_is_nearest():
    """Every point maps to a cell whose center is within one edge length."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 2000)
    lon = rng.uniform(-170, 170, 2000)
    for res in (5, 7, 9):
        cell = hg.latlon_to_cell(lat, lon, res)
        clat, clon = hg.cell_to_latlon(cell)
        d = np.hypot(lat - clat, lon - clon)
        assert d.max() <= hg.edge_size(res) * 1.0000001


def test_ring_sizes_and_distances():
    assert len(hg.RING1) == 6
    assert len(hg.RING2) == 12
    assert len(set(hg.RING1) & set(hg.RING2)) == 0
    assert (0, 0) not in hg.RING1 and (0, 0) not in hg.RING2
    for dq, dr in hg.RING1:
        assert hg.hex_distance(0, 0, dq, dr) == 1
    for dq, dr in hg.RING2:
        assert hg.hex_distance(0, 0, dq, dr) == 2


def test_ring_symmetry():
    """j in ring(i) <=> i in ring(j): offsets are closed under negation."""
    for ring in (hg.RING1, hg.RING2):
        s = set(ring)
        assert all((-dq, -dr) in s for dq, dr in s)


def test_kring_cells_disc():
    cell = hg.pack(7, np.array([10]), np.array([-3]))
    disc1 = hg.kring_cells(cell, 1)
    assert disc1.shape == (1, 7)
    disc2 = hg.kring_cells(cell, 2)
    assert disc2.shape == (1, 19)
    assert len(np.unique(disc2)) == 19  # duplicate-free (reference needs a std::set)


def test_weight_constants_match_formula():
    """Invariant 5.5: pinned literals equal exp(-d^2/(2 sigma^2)), sigma=1."""
    assert abs(w.WEIGHT_RING1_GAUSS - math.exp(-0.5)) < 1e-12
    assert abs(w.WEIGHT_RING2_GAUSS - math.exp(-2.0)) < 1e-12
    assert w.WEIGHT_CENTER == 1.0
    assert w.ring_weights("gaussian", 2) == [1.0, w.WEIGHT_RING1_GAUSS, w.WEIGHT_RING2_GAUSS]
    assert w.ring_weights("uniform", 1) == [1.0, 1.0]


def test_morton_key_interleave():
    # morton(0,0) with +32768 bias = interleave(0x8000, 0x8000)
    k0 = hg.morton_key(np.array([0]), np.array([0]))[0]
    assert k0 == (1 << 30) | (1 << 31)
    # locality: adjacent cells differ in few high bits
    k1 = hg.morton_key(np.array([1]), np.array([0]))[0]
    assert k0 != k1


def test_edge_sizes():
    assert [hg.edge_size(r) for r in range(5, 10)] == [4.0, 2.0, 1.0, 0.5, 0.25]
    with pytest.raises(ValueError):
        hg.edge_size(4)


def test_hilbert_key_properties():
    import numpy as np

    from cuda_gis_smoothing_ray.functions.hexgrid import hilbert_key

    # bijective on a block
    q = np.repeat(np.arange(-16, 16), 32)
    r = np.tile(np.arange(-16, 16), 32)
    ks = hilbert_key(q, r)
    assert len(set(ks.tolist())) == 1024
    # curve origin: first 4 cells of the bottom row follow the U-turn
    ks0 = hilbert_key(np.array([-32768, -32767]), np.array([-32768, -32768]))
    assert ks0.tolist() == [0, 1]
    # consecutive Hilbert indices are grid-adjacent (|dx|+|dy| == 1) --
    # the property Morton does NOT have; check by inverting over the block
    order = np.argsort(ks, kind="stable")
    dx = np.abs(np.diff(q[order]))
    dy = np.abs(np.diff(r[order]))
    # within the 32x32 block interior jumps can leave the block; restrict
    # to steps where both cells are consecutive in hilbert value
    consec = np.diff(ks[order]) == 1
    assert ((dx + dy)[consec] == 1).all()
