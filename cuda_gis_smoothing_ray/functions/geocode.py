"""Deterministic page geocoding (the engine analog of the reference's
placeholder hex-id coordinate decode, ``src/cuda/hex_smooth_cuda_v4.cu:274-280``).

Two signals, per ``BASELINE.json`` north_star:

1. **TLD -> centroid**: the url's TLD maps to a fixed country centroid, plus a
   deterministic per-doc jitter so pages spread over nearby hex cells.  The
   TLD distribution is Zipf-skewed, which *guarantees* hot cells (``.com``
   owns ~27% of pages) — the skew the salted two-phase aggregation handles.
2. **lat/lon mention extraction**: a vectorized regex over ``text`` — an
   explicit ``lat 0.3476 lon 32.5825`` style mention overrides the centroid.

All arithmetic is integer/double expressions reproduced verbatim by the SQL
oracle generator (:mod:`cuda_gis_smoothing_ray.sql.oracles`); do not "simplify"
a formula here without updating the generator.
"""

from __future__ import annotations

import re

import numpy as np

# (tld, centroid_lat, centroid_lon) — Zipf rank order (rank 1 = most pages).
TLD_TABLE: list[tuple[str, float, float]] = [
    ("com", 39.0, -98.0),
    ("org", 38.0, -97.0),
    ("net", 40.0, -100.0),
    ("de", 51.2, 10.4),
    ("uk", 54.0, -2.0),
    ("fr", 46.6, 2.2),
    ("jp", 36.2, 138.3),
    ("cn", 35.9, 104.2),
    ("ru", 61.5, 105.3),
    ("br", -14.2, -51.9),
    ("in", 20.6, 79.0),
    ("it", 41.9, 12.6),
    ("es", 40.5, -3.7),
    ("ca", 56.1, -106.3),
    ("au", -25.3, 133.8),
    ("nl", 52.1, 5.3),
    ("se", 60.1, 18.6),
    ("pl", 51.9, 19.1),
    ("ch", 46.8, 8.2),
    ("at", 47.5, 14.6),
    ("be", 50.5, 4.5),
    ("no", 60.5, 8.5),
    ("fi", 61.9, 25.7),
    ("io", -7.3, 72.4),
]

ZIPF_MOD = 997          # prime modulus for the TLD selector
TLD_MULT = 2654435761   # Knuth multiplicative hash constant
HOST_MOD = 100000
JITTER_LAT_MULT = 48271     # MINSTD
JITTER_LON_MULT = 69621
JITTER_MOD = 2001
JITTER_SCALE = 0.0015       # (m - 1000) * 0.0015 -> +/- 1.5 degrees


def _zipf_thresholds(n: int, mod: int) -> list[int]:
    """Cumulative integer thresholds over [0, mod) with p(rank i) ~ 1/i.

    Pure integer arithmetic -> identical in the SQL CASE generator."""
    weights = [1.0 / i for i in range(1, n + 1)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights[:-1]:
        acc += w
        cum.append(int(acc / total * mod))
    cum.append(mod)
    return cum


TLD_CUM_THRESHOLDS = _zipf_thresholds(len(TLD_TABLE), ZIPF_MOD)

# "lat 12.345 lon -67.89" style mention; first match wins.
LATLON_PATTERN = r"lat (?P<lat>-?\d+\.\d+) lon (?P<lon>-?\d+\.\d+)"


def tld_index(doc_id: np.ndarray) -> np.ndarray:
    """Zipf-skewed TLD rank index for each doc_id (vectorized)."""
    m = (np.asarray(doc_id, dtype=np.int64) * np.int64(TLD_MULT)) % np.int64(ZIPF_MOD)
    thresholds = np.array(TLD_CUM_THRESHOLDS, dtype=np.int64)
    return np.searchsorted(thresholds, m, side="right").astype(np.int64)


def host_id(doc_id: np.ndarray) -> np.ndarray:
    return (np.asarray(doc_id, dtype=np.int64) * np.int64(TLD_MULT)) % np.int64(HOST_MOD)


def centroid_latlon(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tld_idx, centroid lat + jitter, centroid lon + jitter) per doc."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    idx = tld_index(doc_id)
    lats = np.array([t[1] for t in TLD_TABLE], dtype=np.float64)
    lons = np.array([t[2] for t in TLD_TABLE], dtype=np.float64)
    mlat = (doc_id * np.int64(JITTER_LAT_MULT)) % np.int64(JITTER_MOD)
    mlon = (doc_id * np.int64(JITTER_LON_MULT)) % np.int64(JITTER_MOD)
    jlat = (mlat - np.int64(1000)).astype(np.float64) * JITTER_SCALE
    jlon = (mlon - np.int64(1000)).astype(np.float64) * JITTER_SCALE
    return idx, lats[idx] + jlat, lons[idx] + jlon


class LatLonExtractor:
    """Compiled-regex lat/lon mention extractor.

    Built once per actor (``__init__`` of the geocode actor pool stage), run
    per batch — the pattern compile is the reference's "load once, iterate
    many" state (``hex_smooth_cuda_v1.cu:163-177``) in miniature.
    """

    def __init__(self) -> None:
        self._re = re.compile(LATLON_PATTERN)

    def __call__(self, texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """texts: pyarrow (Chunked)Array or sequence of str
        -> (lat, lon, found) float64/bool arrays.

        Arrow path: one ``pc.extract_regex`` call (RE2, C speed) over the
        whole column — no Python-per-row work.  First match wins, identical
        to ``re.search`` / DuckDB ``regexp_extract`` on this pattern.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            return self._slow(texts)
        m = pc.extract_regex(texts, LATLON_PATTERN)
        found = pc.is_valid(m).to_numpy(zero_copy_only=False)
        lat = pc.cast(pc.struct_field(m, "lat"), pa.float64())
        lon = pc.cast(pc.struct_field(m, "lon"), pa.float64())
        lat = pc.fill_null(lat, 0.0).to_numpy(zero_copy_only=False)
        lon = pc.fill_null(lon, 0.0).to_numpy(zero_copy_only=False)
        return lat, lon, found

    def _slow(self, texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = len(texts)
        lat = np.zeros(n, dtype=np.float64)
        lon = np.zeros(n, dtype=np.float64)
        found = np.zeros(n, dtype=bool)
        search = self._re.search
        for i, t in enumerate(texts):
            m = search(t) if t is not None else None
            if m is not None:
                lat[i] = float(m.group("lat"))
                lon[i] = float(m.group("lon"))
                found[i] = True
        return lat, lon, found
