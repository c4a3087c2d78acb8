"""Deterministic hashing primitives for dedup / fingerprinting.

All hashes are seed-free and process-independent (no PYTHONHASHSEED
dependence): blake2b for whole-string identity, a vectorized polynomial
rolling hash for shingles, splitmix64 for integer mixing.  These back the
exact-dedup, MinHash-LSH, SimHash and winnowing-fingerprint stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FNV_PRIME = np.uint64(1099511628211)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def coarse_partition(keys: np.ndarray, n_parts: int, shift: int = 52) -> np.ndarray:
    """int64 keys -> int64 coarse partition ids in [0, n_parts): one golden-
    ratio multiply + high-bit shift.  THE shared partitioner for every
    hash-partition + vectorized-segmented-solve stage (events._by_user,
    smooth._enrich_shuffle_join, textops pair reducers) so the idiom can't
    drift between copies."""
    p = (keys.view(np.uint64) * _GOLDEN) >> np.uint64(shift)
    return (p % np.uint64(n_parts)).astype(np.int64)


def text_hash64(texts) -> np.ndarray:
    """Stable 64-bit content hash per string (blake2b, C speed)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.blake2b((t or "").encode("utf-8"), digest_size=8).digest()
        out[i] = np.uint64(int.from_bytes(d, "little"))
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (integer mixing)."""
    z = x.astype(np.uint64) + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """All k-char shingle hashes of one string — vectorized rolling
    polynomial hash over the utf-8 bytes (k vector ops, no per-shingle
    Python)."""
    bt = (text or "").encode("utf-8")
    if len(bt) < k:
        bt = bt + b"\x00" * (k - len(bt))
    arr = np.frombuffer(bt, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            h = h * _FNV_PRIME + arr[j : j + n]
    return splitmix64(h)


def _intra(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... — per-segment aranges, concatenated."""
    total = int(counts.sum())
    return (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))


class MinHasher:
    """num_perms-way MinHash over char shingles, with (bands x rows) LSH.

    Permutations are the standard ``a*h + b`` family with deterministic
    odd multipliers.  Signature arrays are uint64; band keys are mixed to a
    single int64 so they groupby cheaply.
    """

    def __init__(self, num_perms: int = 64, shingle_k: int = 5, bands: int = 16):
        assert num_perms % bands == 0
        self.num_perms = num_perms
        self.k = shingle_k
        self.bands = bands
        self.rows = num_perms // bands
        rng = np.random.default_rng(1234)  # fixed seed: engine-wide constant
        self.a = (rng.integers(1, 1 << 62, num_perms, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, num_perms, dtype=np.uint64).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        h = char_shingle_hashes(text, self.k)
        with np.errstate(over="ignore"):
            m = self.a[:, None] * h[None, :] + self.b[:, None]  # (P, n_shingles)
        return m.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perms) uint64 — batched: ONE rolling-hash pass over
        the batch's concatenated utf-8 bytes (k vector ops total, windows
        that straddle doc boundaries discarded by index), then per-perm
        ``np.minimum.reduceat`` segment-mins.  Python cost is per BATCH,
        not per doc; bit-identical to :meth:`signature` per doc (same
        padding, same hash, same permutation family — the tiny SQL oracle
        stays bit-exact).  Accepts a list of strings or an Arrow string
        array (read zero-copy via its offsets/data buffers)."""
        n = len(texts)
        out = np.empty((n, self.num_perms), dtype=np.uint64)
        if n == 0:
            return out
        k = self.k
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if isinstance(texts, pa.Array):
            width = 8 if pa.types.is_large_string(texts.type) else 4
            odt = np.int64 if width == 8 else np.int32
            off = np.frombuffer(texts.buffers()[1], dtype=odt,
                                count=n + 1, offset=texts.offset * width
                                ).astype(np.int64)
            buf = texts.buffers()[2]
            raw = (np.frombuffer(buf, dtype=np.uint8)[off[0]:off[-1]]
                   if buf is not None else np.zeros(0, np.uint8))
            lens = np.diff(off)
            starts_raw = off[:-1] - off[0]
        else:
            bts = [(t or "").encode("utf-8") for t in texts]
            lens = np.fromiter((len(b) for b in bts), np.int64, n)
            raw = (np.frombuffer(b"".join(bts), dtype=np.uint8)
                   if lens.sum() else np.zeros(0, np.uint8))
            starts_raw = np.cumsum(lens) - lens
        short = lens < k
        if short.any():
            # docs shorter than k pad with NULs (rare; matches signature())
            pad = np.zeros(len(raw) + int((k - lens[short]).sum()), np.uint8)
            new_lens = np.maximum(lens, k)
            new_starts = np.cumsum(new_lens) - new_lens
            take = np.repeat(starts_raw, lens) + _intra(lens)
            put = np.repeat(new_starts, lens) + _intra(lens)
            pad[put] = raw[take]
            raw, lens, starts_raw = pad, new_lens, new_starts
        data = raw.astype(np.uint64)
        total = len(data) - k + 1
        with np.errstate(over="ignore"):
            h_all = np.zeros(total, dtype=np.uint64)
            for j in range(k):
                h_all = h_all * _FNV_PRIME + data[j : j + total]
        n_sh = lens - k + 1  # >= 1 per doc after padding
        idx = np.repeat(starts_raw, n_sh) + _intra(n_sh)
        h = splitmix64(h_all[idx])
        seg_starts = np.cumsum(n_sh) - n_sh
        with np.errstate(over="ignore"):
            for p in range(self.num_perms):
                out[:, p] = np.minimum.reduceat(self.a[p] * h + self.b[p],
                                                seg_starts)
        return out

    def band_keys(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, bands) int64: one mixed key per band (includes band id)."""
        n = sigs.shape[0]
        keys = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows : (b + 1) * self.rows]
            acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(self.rows):
                    acc = splitmix64(acc ^ seg[:, j])
            keys[:, b] = acc
        return (keys >> np.uint64(1)).astype(np.int64)  # non-negative int64

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def md5_hash64(texts) -> np.ndarray:
    """Stable 64-bit hash per string from the first 16 hex chars of md5 —
    chosen because DuckDB's ``md5()`` computes the identical value, making
    md5-hashed sketches SQL-oracle-checkable (see simhash tiny oracle)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = np.uint64(
            int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:16], 16)
        )
    return out


def fnv_token_hash64(texts) -> np.ndarray:
    """Vectorized 64-bit hash per string: FNV-style polynomial over the
    UTF-8 bytes + splitmix64 finalizer.  Strings are processed sorted by
    length so each byte step operates on a contiguous PREFIX slice (no
    boolean masks; total work O(total bytes)) — the scale-path token hasher
    for SimHash, no Python per token."""
    arr = pa.array(texts, pa.string()) if not isinstance(texts, pa.Array) else texts
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = arr.buffers()
    off = np.frombuffer(buf[1], dtype=np.int64 if pa.types.is_large_string(arr.type)
                        else np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(buf[2], dtype=np.uint8)
            if buf[2] is not None else np.zeros(0, np.uint8))
    lo = off[:-1] - off[0]
    d = data[off[0] : off[-1]].astype(np.uint64)
    lens = off[1:] - off[:-1]
    order = np.argsort(-lens, kind="stable")
    lo_s = lo[order]
    lens_s = lens[order]
    h = np.zeros(n, dtype=np.uint64)
    max_len = int(lens_s[0]) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            m = int(np.searchsorted(-lens_s, -(j + 1), side="right"))
            h[:m] = h[:m] * _FNV_PRIME + d[lo_s[:m] + j]
    out = np.empty(n, dtype=np.uint64)
    out[order] = splitmix64(h)
    return out


def _simhash64_vectorized(texts) -> np.ndarray:
    """One Arrow split + one vectorized token-hash pass + per-bit segmented
    votes for a whole batch of documents — zero Python per token/doc, and
    no (tokens x 64) wide intermediate (this sandbox faults fresh pages at
    ~150 MB/s, so per-bit 8-byte-per-token passes beat one wide matrix)."""
    import pyarrow.compute as pc

    arr = pa.array([t or "" for t in texts], pa.string()) \
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    # NULL slots sanitize to "" (the blake2b/md5 paths' `t or ""` analog);
    # without this, value_lengths() yields null -> negative repeat counts
    arr = pc.fill_null(arr, "")
    split = pc.split_pattern_regex(arr, r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    doc_idx = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[nonempty]
    toks = flat.filter(pa.array(nonempty))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    if len(toks) == 0:
        return out
    th = fnv_token_hash64(toks)  # (T,)
    docs, tok_counts = np.unique(doc_idx, return_counts=True)
    starts = np.searchsorted(doc_idx, docs)  # doc_idx is non-decreasing
    sims = np.zeros(len(docs), dtype=np.uint64)
    bit_buf = np.empty(len(th), dtype=np.int64)
    for b in range(64):
        np.bitwise_and(th >> np.uint64(b), np.uint64(1), out=bit_buf,
                       casting="unsafe")
        ones = np.add.reduceat(bit_buf, starts)
        # votes = 2*ones - count > 0  <=>  2*ones > count
        sims |= (2 * ones > tok_counts).astype(np.uint64) << np.uint64(b)
    out[docs] = sims
    return out


def simhash64(texts, token_pattern=None, token_hash: str = "blake2b") -> np.ndarray:
    """64-bit SimHash per text over whitespace tokens (unweighted votes).

    ``token_hash``: "blake2b" (default; ~2us/token Python loop — fine up to
    ~1M tokens/s/core), "fnv" (fully vectorized batch path, equivalence-
    tested; on THIS sandbox the page-fault-limited allocator makes it a
    wash, on normal hardware it wins for token-dense corpora), or "md5"
    (SQL-oracle-parity variant; DuckDB computes the identical token hash)."""
    import re

    if token_hash == "fnv":
        if token_pattern is not None:
            raise ValueError("custom token_pattern requires token_hash='blake2b'/'md5'")
        return _simhash64_vectorized(texts)
    hash_fn = text_hash64 if token_hash == "blake2b" else md5_hash64
    pat = token_pattern or re.compile(r"\S+")
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = pat.findall(t or "")
        if not toks:
            out[i] = np.uint64(0)
            continue
        th = hash_fn(toks)  # (m,)
        votes = ((th[:, None] & bits[None, :]) != 0).sum(axis=0) * 2 - len(th)
        out[i] = np.uint64(((votes > 0) * bits).sum(dtype=np.uint64))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def winnow_fingerprints(text: str, k: int = 8, window: int = 6) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): min rolling-hash per sliding window,
    deduplicated — the document-fingerprinting primitive."""
    h = char_shingle_hashes(text, k)
    if len(h) <= window:
        return np.unique(h[: max(1, len(h))])
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def poly_hash64(strs) -> np.ndarray:
    """Stable 64-bit whole-string hash: rolling FNV polynomial over the
    utf-8 bytes (``h = h * FNV_PRIME + byte``, uint64 wrap) finished with
    :func:`splitmix64` — the SQL-expressible sibling of :func:`text_hash64`
    (DuckDB mirrors it with a ``list_reduce`` fold in HUGEINT mod 2^64,
    ``sql/oracles_corpus.hll_registers_sql``).

    Vectorized across strings: one numpy pass per byte *position* (loop
    length = longest string, not row count), operating on the Arrow
    offsets/data buffers directly.
    """
    arr = strs if isinstance(strs, pa.Array) else pa.array(list(strs), pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    assert arr.null_count == 0, "poly_hash64: null strings not supported"
    arr = arr.cast(pa.large_string())
    # read the offsets WINDOW at arr.offset (a no-op cast of an already-
    # large_string slice keeps its element offset; the byte positions in
    # the offsets buffer are already absolute — never add arr.offset to
    # the VALUES)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, lens = off[:-1], np.diff(off)
    h = np.zeros(len(arr), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max(initial=0))):
            m = lens > j
            h[m] = h[m] * _FNV_PRIME + data[starts[m] + j]
    return splitmix64(h)
