"""Property-based tests (hypothesis) for the pure kernels every operator
leans on: the hex codec, cube rounding, k-ring geometry, the edit-distance
check behind the fuzzy join, and the geohash quantizer."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuda_gis_smoothing_ray.functions import hexgrid

LAT = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64)
LON = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=64)
RES = st.integers(min_value=hexgrid.RES_MIN, max_value=hexgrid.RES_MAX)


@settings(max_examples=300, deadline=None)
@given(LAT, LON, RES)
def test_cell_roundtrip_center_reencodes_to_itself(lat, lon, res):
    cell = hexgrid.latlon_to_cell(np.array([lat]), np.array([lon]), res)
    clat, clon = hexgrid.cell_to_latlon(cell)
    again = hexgrid.latlon_to_cell(clat, clon, res)
    assert again[0] == cell[0]


@settings(max_examples=300, deadline=None)
@given(LAT, LON, RES)
def test_point_within_circumradius_of_its_cell_center(lat, lon, res):
    cell = hexgrid.latlon_to_cell(np.array([lat]), np.array([lon]), res)
    clat, clon = hexgrid.cell_to_latlon(cell)
    d = np.hypot(lat - clat[0], lon - clon[0])
    # cube rounding assigns the NEAREST hex: the point is inside the cell,
    # hence within one circumradius (= edge size) of the center (+ float fuzz)
    assert d <= hexgrid.edge_size(res) * (1 + 1e-9)


@settings(max_examples=200, deadline=None)
@given(st.integers(-1000, 1000), st.integers(-1000, 1000), RES,
       st.integers(min_value=1, max_value=2))
def test_kring_cells_are_exactly_hex_distance_ring(q, r, res, k):
    cell = hexgrid.pack(res, np.array([q]), np.array([r]))
    disc = hexgrid.kring_cells(cell, k)[0]
    assert len(disc) == len(set(disc.tolist()))  # duplicate-free
    _, qs, rs = hexgrid.unpack(disc)
    d = hexgrid.hex_distance(qs, rs, q, r)
    assert d.max() == k and d.min() == 0
    assert (np.sort(np.unique(d)) == np.arange(k + 1)).all()


def _lev(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="abc", max_size=8), st.text(alphabet="abc", max_size=8))
def test_within_edit1_agrees_with_dp_levenshtein(s, t):
    from cuda_gis_smoothing_ray.stages.textops import _within_edit1

    if s == t:
        return
    assert _within_edit1(s, t) == (_lev(s, t) <= 1)


@settings(max_examples=300, deadline=None)
@given(LAT, LON)
def test_geohash_prefix_property(lat, lon):
    """The 15-bit quantizer stays in range over the whole globe."""
    lon_q = min(int(np.floor((lon + 180.0) / 360.0 * 32768.0)), 32767)
    lat_q = min(int(np.floor((lat + 90.0) / 180.0 * 32768.0)), 32767)
    assert 0 <= lon_q < 32768 and 0 <= lat_q < 32768


# ---------------------------------------------------------------------------
# real media codecs: arbitrary-content round-trips (the golden byte-literal
# tests in test_media_events.py pin the format; these pin totality)
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 40), st.integers(1, 25), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_any_dims(w, h, seed):
    from cuda_gis_smoothing_ray.stages.media import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px))
    assert out.shape == (h, w, 3) and (out == px).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 5000), st.integers(1, 192000), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_any_samples(n, rate, seed):
    from cuda_gis_smoothing_ray.stages.media import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate and len(out) == n and (out == s).all()


def _brute_bpe(texts: list[str], rounds: int):
    """Reference BPE with the engine's documented semantics: word-type
    histogram; per round overlapping lead-chain pair counts, argmax by
    (total DESC, s1, s2), sentinel-space str.replace application."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split())
    seqs = {w: " ".join(w) for w in words}
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for w, cnt in words.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (a, b), tot = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, a + b, tot))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        seqs = {w: (" " + s + " ").replace(pat, rep).strip(" ")
                for w, s in seqs.items()}
    return merges


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.text(alphabet="abcd", min_size=0, max_size=6), min_size=1, max_size=12
).map(lambda ws: " ".join(ws)), st.integers(1, 4))
def test_bpe_merges_matches_brute(text, rounds):
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import bpe_merges

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([text], pa.string()),
    }))
    got = bpe_merges(ds, rounds=rounds).to_pandas()
    want = _brute_bpe([text], rounds)
    assert list(zip(got["left_sym"], got["right_sym"], got["merged"],
                    got["pair_count"])) == want
