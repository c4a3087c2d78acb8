"""Vectorized text-analysis primitives for the training-data pipeline ops
(language ID, quality scoring, token counting, fingerprinting).

Every metric here is defined by ONE shared constant/pattern and mirrored
expression-for-expression by :mod:`..sql.oracles` so the DuckDB oracle
reproduces it exactly.  All regex counting uses RE2 semantics on BOTH sides
(pyarrow ``count_substring_regex`` / DuckDB ``regexp_extract_all`` are both
RE2), so match counts agree by construction.

Reference anchor: the reference engine has no string ops
(``SURVEY.md §2.8``); these are the north-rule's web-corpus additions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: whitespace-token pattern (token counting)
TOKEN_RE = r"\S+"
#: BPE-ish word/number/punct tokenizer (the GPT-2-style coarse split)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
#: punctuation / symbol characters
PUNCT_RE = r"[^A-Za-z0-9\s]"
#: non-space characters (for mean token length without materializing tokens)
NONSPACE_RE = r"\S"
#: sentence-terminator RUNS ("..." = one sentence end) for the Flesch proxy
SENTENCE_RE = r"[.!?]+"
#: vowel-letter runs = the dependency-free syllable proxy for Flesch
VOWEL_RUN_RE = r"[AEIOUaeiou]+"
#: Flesch (1948) reading-ease constants, shared with the SQL generator
FLESCH_BASE = 206.835
FLESCH_WPS = 1.015
FLESCH_SPW = 84.6

#: per-language marker-token lists for the n-gram/stopword language-ID
#: heuristic; order = deterministic argmax preference order
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "and", "of", "value")),
    ("de", ("der", "und", "die", "das", "nicht")),
    ("fr", ("le", "et", "les", "des", "une")),
    ("es", ("el", "y", "los", "una", "por")),
    ("zh", ("zh", "ni", "hao", "shi", "bu")),
]

#: english stopwords for the quality score's stopword ratio
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

#: quality-score shape constants (shared with the SQL generator)
QS_TOKEN_NORM = 100.0
QS_MEANLEN_NORM = 8.0
QS_STOP_LO = 0.01
QS_STOP_HI = 0.6


def marker_pattern(words: tuple[str, ...]) -> str:
    return r"\b(?:" + "|".join(words) + r")\b"


def count_re(texts, pattern: str) -> np.ndarray:
    """Non-overlapping RE2 match count per string -> int64."""
    return pc.count_substring_regex(texts, pattern).to_numpy(zero_copy_only=False).astype(np.int64)


OUT_KEYS = ("n_chars", "n_tokens", "n_punct", "n_nonspace", "n_bpe")

# Per-worker scratch pool.  This sandbox (like many container runtimes)
# faults in fresh mmap'd pages at only ~150 MB/s, so a kernel that mallocs
# ~10 large temporaries per batch spends 10-30x its compute time in page
# faults (measured: 35 s vs 0.3 s for one 50 MB batch).  All temporaries
# below come from this pool: allocated once per worker process, reused for
# every batch.  Segmenting at string boundaries bounds the pool at
# ~9 x SEG_BYTES + 8 x SEG_BYTES (the int64 cumsum buffer) ~= 70 MB/worker.
_SCRATCH: dict = {}
#: 1 MB segments: every temporary (9 bool + 1 uint8 + int32 cumsum ~= 15 MB)
#: stays L2/L3-resident, so per-task DRAM traffic is ~one read of the text
#: buffer instead of ~40 whole-buffer round-trips (measured 4x e2e at 32
#: concurrent workers on this bandwidth-limited VM)
SEG_BYTES = 1 << 20


def _scratch(key: str, n: int, dtype) -> np.ndarray:
    if not _SCRATCH:
        from .. import tune_worker_allocator

        tune_worker_allocator()
    b = _SCRATCH.get(key)
    if b is None or b.shape[0] < n:
        _SCRATCH[key] = b = np.empty(max(n, SEG_BYTES), dtype)
    return _SCRATCH[key][:n]


# --- byte-class lookup table: all class properties are per-byte-value, so
# ONE 256-entry gather (table L1-resident) + a bitwise_and per mask replaces
# the ~15 range-compare passes the masks previously cost per segment ---
_WS_BIT, _LETTER_BIT, _DIGIT_BIT, _LEAD_BIT, _WC_BIT, _PUNCT_BIT = 1, 2, 4, 8, 16, 32


def _build_cls_lut() -> np.ndarray:
    b = np.arange(256)
    ws = np.isin(b, (9, 10, 12, 13, 32))          # RE2 \s
    letter = ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122))
    digit = (b >= 48) & (b <= 57)
    lead = (b & 0xC0) != 0x80                     # not a UTF-8 continuation
    wc = letter | digit | (b == 95)               # RE2 \w
    punct = lead & ~ws & ~letter & ~digit
    lut = np.zeros(256, np.uint8)
    for bit, m in ((_WS_BIT, ws), (_LETTER_BIT, letter), (_DIGIT_BIT, digit),
                   (_LEAD_BIT, lead), (_WC_BIT, wc), (_PUNCT_BIT, punct)):
        lut[m] |= bit
    return lut


_CLS_LUT = _build_cls_lut()


def _per_string_counts(mask: np.ndarray, off: np.ndarray, nb: int,
                       ns: int) -> np.ndarray:
    """Per-string True counts of a byte mask via ``np.add.reduceat`` — one
    streaming pass writing only per-string outputs, vs the cumsum variant's
    4-bytes-per-input-byte prefix array (measured 55% of the whole class
    kernel; reduceat is 3.3x faster on a 1 MB segment).

    reduceat gotchas handled here: (a) an index pair with
    ``indices[k] >= indices[k+1]`` yields ``a[indices[k]]``, not 0 — empty
    strings are zeroed explicitly; (b) indices must be < nb, and CLIPPING an
    end-of-buffer empty's offset from nb to nb-1 would truncate the
    *previous* string's slice by one byte — instead only offsets < nb feed
    reduceat (the last valid slice then runs to the buffer end, which IS its
    true extent because every later offset equals nb) and the trailing
    empties stay zero."""
    res = np.zeros(ns, np.int64)
    mv = int(np.searchsorted(off[:-1], nb, side="left"))
    if mv:
        res[:mv] = np.add.reduceat(mask, off[:mv], dtype=np.int64)
        res[:mv][off[:mv] >= off[1 : mv + 1]] = 0
    return res


def _seg_counts(d: np.ndarray, off: np.ndarray,
                words: tuple[bytes, ...] | None = None,
                need_bpe: bool = True) -> dict[str, np.ndarray]:
    """One segment (strings fully contained): uint8 bytes + 0-based offsets
    -> per-string class counts.  All temporaries from the scratch pool;
    everything vectorized; RE2-semantics proven by the fuzz tests and the
    per-run SQL oracle gate.

    With ``words``, additionally returns ``n_words`` (standalone-word count,
    see :func:`_seg_word_counts`) computed in the SAME pass, reusing the
    letter/digit masks — one fewer full scan for the quality-score pipeline.
    """
    nb = len(d)
    ns = len(off) - 1
    keys = OUT_KEYS if need_bpe else tuple(k for k in OUT_KEYS if k != "n_bpe")
    if nb == 0:
        z = np.zeros(ns, np.int64)
        out = {k: z.copy() for k in keys}
        if words is not None:
            out["n_words"] = z.copy()
        return out
    starts = off[:-1][off[:-1] < nb]

    ws = _scratch("ws", nb, np.bool_)
    t1 = _scratch("t1", nb, np.bool_)
    t2 = _scratch("t2", nb, np.bool_)
    letter = _scratch("letter", nb, np.bool_)
    digit = _scratch("digit", nb, np.bool_)
    lead = _scratch("lead", nb, np.bool_)
    prev = _scratch("prev", nb, np.bool_)
    bpe = _scratch("bpe", nb, np.bool_)
    punct = _scratch("punct", nb, np.bool_)
    u8 = _scratch("u8", nb, np.uint8)
    cls = _scratch("cls", nb, np.uint8)
    np.take(_CLS_LUT, d, out=cls)

    def unpack(bit: int, out: np.ndarray) -> None:
        np.bitwise_and(cls, bit, out=u8)
        np.not_equal(u8, 0, out=out)

    def per_string(mask: np.ndarray) -> np.ndarray:
        return _per_string_counts(mask, off, nb, ns)

    unpack(_WS_BIT, ws)        # ws = [\t\n\f\r ]  (RE2 \s)
    unpack(_LETTER_BIT, letter)
    unpack(_DIGIT_BIT, digit)
    unpack(_LEAD_BIT, lead)    # char lead bytes (not UTF-8 continuation)
    unpack(_PUNCT_BIT, punct)  # nonws lead & ~letter & ~digit
    # nonws char leads -> t2
    np.logical_not(ws, out=t2)
    np.logical_and(lead, t2, out=t2)

    # token starts: nonws char preceded by ws or string start
    prev[0] = True
    prev[1:] = ws[:-1]
    prev[starts] = True
    np.logical_and(t2, prev, out=t1)
    n_tokens = per_string(t1)

    n_chars = per_string(lead)
    n_ws = per_string(ws)
    out = {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": per_string(punct),
        "n_nonspace": n_chars - n_ws,
    }
    if need_bpe:
        # BPE = letter-run starts + digit-run starts + punct chars (disjoint)
        prev[0] = False
        prev[1:] = letter[:-1]
        prev[starts] = False
        np.logical_not(prev, out=prev)
        np.logical_and(letter, prev, out=bpe)
        prev[0] = False
        prev[1:] = digit[:-1]
        prev[starts] = False
        np.logical_not(prev, out=prev)
        np.logical_and(digit, prev, out=t1)
        np.logical_or(bpe, t1, out=bpe)
        np.logical_or(bpe, punct, out=bpe)
        out["n_bpe"] = per_string(bpe)
    if words is not None:
        wc = _scratch("w_wc", nb, np.bool_)
        unpack(_WC_BIT, wc)  # word chars [A-Za-z0-9_]
        is_start = _scratch("w_is_start", nb, np.bool_)
        is_start[:] = False
        is_start[starts] = True
        if _fastpath_ok(words):
            out["n_words"] = _token_set_counts(d, off, wc, is_start, (words,))[0]
        else:
            out["n_words"] = _word_hits(d, off, wc, is_start, words)
    return out


def _fastpath_ok(words: tuple[bytes, ...]) -> bool:
    """Token-run matching applies when every word is pure ``\\w`` and fits a
    uint64 — then a standalone-word RE2 match is exactly a maximal word-char
    run equal to the word (anything longer/shorter/crossing can't match)."""
    return all(
        0 < len(w) <= 8 and all(_CLS_LUT[b] & _WC_BIT for b in w) for w in words
    )


def _token_set_counts(d: np.ndarray, off: np.ndarray, wc: np.ndarray,
                      is_start: np.ndarray,
                      sets: tuple[tuple[bytes, ...], ...]) -> list[np.ndarray]:
    """Maximal word-char runs -> per-string count of runs equal to any word,
    one count array per word set — ALL sets share one run extraction.

    O(bytes) for ~8 fused passes plus O(#runs) token-value work, vs the
    positional matcher's ~8 passes PER word (:func:`_word_hits`); the run
    values are compared as little-endian uint64s gathered per run length.
    Only valid under :func:`_fastpath_ok` (callers guard).
    """
    nb = len(d)
    ns = len(off) - 1
    t1 = _scratch("w_t1", nb, np.bool_)
    t2 = _scratch("w_t2", nb, np.bool_)
    # run starts: wc & (buffer start | ~wc_prev | string start)
    t1[0] = True
    np.logical_not(wc[: nb - 1], out=t1[1:])
    np.logical_or(t1, is_start, out=t1)
    np.logical_and(t1, wc, out=t1)
    # run ends: wc & (buffer end | ~wc_next | next byte starts a string)
    t2[nb - 1] = True
    np.logical_not(wc[1:], out=t2[: nb - 1])
    np.logical_or(t2[: nb - 1], is_start[1:], out=t2[: nb - 1])
    np.logical_and(t2, wc, out=t2)
    s_idx = np.nonzero(t1)[0]
    e_idx = np.nonzero(t2)[0]
    lens = e_idx - s_idx + 1  # starts/ends alternate, so they pair in order
    outs = [np.zeros(ns, np.int64) for _ in sets]
    for L in sorted({len(w) for ws_ in sets for w in ws_}):
        lm = lens == L
        if not lm.any():
            continue
        sL = s_idx[lm]
        v = d[sL].astype(np.uint64)
        for j in range(1, L):
            v |= d[sL + j].astype(np.uint64) << np.uint64(8 * j)
        # string owner only for the runs whose length can match a word
        si_L = np.searchsorted(off, sL, side="right") - 1
        for oi, ws_ in enumerate(sets):
            m = None
            for w in ws_:
                if len(w) != L:
                    continue
                mm = v == np.uint64(int.from_bytes(w, "little"))
                m = mm if m is None else np.logical_or(m, mm)
            if m is not None and m.any():
                outs[oi] += np.bincount(si_L[m], minlength=ns)
    return outs


def _word_hits(d: np.ndarray, off: np.ndarray, wc: np.ndarray,
               is_start: np.ndarray, words: tuple[bytes, ...]) -> np.ndarray:
    """Shared word-matching core: given precomputed word-char mask and
    string-start mask, count standalone-word matches per string."""
    nb = len(d)
    t1 = _scratch("w_t1", nb, np.bool_)
    t2 = _scratch("w_t2", nb, np.bool_)
    hits = _scratch("w_hits", nb, np.bool_)
    hit = _scratch("w_hit", nb, np.bool_)
    cs = _scratch("w_cs", nb, np.int32)

    # cs[i] = #string-starts at positions <= i (to reject cross-string runs)
    np.cumsum(is_start.view(np.int8), dtype=np.int32, out=cs)

    hits[:] = False
    for wb in words:
        L = len(wb)
        if nb < L:
            continue
        m = nb - L + 1
        h = hit[:m]
        np.equal(d[:m], wb[0], out=h)
        for j in range(1, L):
            np.equal(d[j : m + j], wb[j], out=t1[:m])
            np.logical_and(h, t1[:m], out=h)
        if L > 1:
            # no string boundary strictly inside the match
            np.equal(cs[L - 1 : L - 1 + m] - cs[:m], 0, out=t1[:m])
            np.logical_and(h, t1[:m], out=h)
        # left edge: string start or previous byte non-word
        t2[0] = True
        np.logical_not(wc[: nb - 1], out=t1[: nb - 1])
        t2[1:] = t1[: nb - 1]
        np.logical_or(t2[:m], is_start[:m], out=t2[:m])
        np.logical_and(h, t2[:m], out=h)
        # right edge: buffer end, next string's first byte, or non-word byte
        if L < nb:
            mm = min(m, nb - L)
            np.logical_not(wc[L : L + mm], out=t1[:mm])
            np.logical_or(t1[:mm], is_start[L : L + mm], out=t1[:mm])
            np.logical_and(h[:mm], t1[:mm], out=h[:mm])
        np.logical_or(hits[:m], h, out=hits[:m])
        hits[m:nb] = hits[m:nb]  # tail (< L bytes) can't start a match: unchanged

    return _per_string_counts(hits[:nb], off, nb, len(off) - 1)


def _seg_word_sets(d: np.ndarray, off: np.ndarray,
                   sets: tuple[tuple[bytes, ...], ...]) -> list[np.ndarray]:
    """Per-string count of standalone-word occurrences for each word set —
    byte-level equivalent of RE2 ``\\b(?:w1|w2|...)\\b`` (word chars =
    ``[A-Za-z0-9_]``).  A match is an exact word with non-word (or string
    edge) on both sides; standalone words can never overlap, so the count
    equals the regex's non-overlapping match count.

    Pure-``\\w`` word sets share one token-run extraction
    (:func:`_token_set_counts`); any other set uses the positional matcher.
    """
    nb = len(d)
    ns = len(off) - 1
    if nb == 0:
        return [np.zeros(ns, np.int64) for _ in sets]
    starts = off[:-1][off[:-1] < nb]

    wc = _scratch("w_wc", nb, np.bool_)
    u8 = _scratch("u8", nb, np.uint8)
    cls = _scratch("cls", nb, np.uint8)
    is_start = _scratch("w_is_start", nb, np.bool_)

    np.take(_CLS_LUT, d, out=cls)
    np.bitwise_and(cls, _WC_BIT, out=u8)
    np.not_equal(u8, 0, out=wc)
    is_start[:] = False
    is_start[starts] = True

    fast = tuple(ws_ for ws_ in sets if _fastpath_ok(ws_))
    fast_counts = iter(_token_set_counts(d, off, wc, is_start, fast) if fast else ())
    return [
        next(fast_counts) if _fastpath_ok(ws_) else _word_hits(d, off, wc, is_start, ws_)
        for ws_ in sets
    ]


def _seg_word_counts(d: np.ndarray, off: np.ndarray, words: tuple[bytes, ...]) -> np.ndarray:
    return _seg_word_sets(d, off, (words,))[0]


def _require_no_nulls(arr: pa.Array) -> None:
    """The buffer-level kernels read offsets/data directly and would count a
    null string as empty, silently diverging from the RE2/SQL NULL
    propagation they replace — fail loudly instead (no engine table carries
    null text; a user table with nulls must fill them explicitly)."""
    if arr.null_count:
        raise ValueError(
            "byte-class text kernels require a null-free string column "
            f"(got {arr.null_count} nulls); fill or drop nulls upstream"
        )


def _apply_segmented(arr: pa.Array, seg_fn) -> np.ndarray | dict:
    """Shared segment loop: split at string boundaries, call
    ``seg_fn(d_seg, off_seg) -> array | dict of arrays``, stitch."""
    _require_no_nulls(arr)
    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    o = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.zeros(0, np.uint8)
    )
    d_all = data[o[0] : o[-1]]
    off_all = (o - o[0]).astype(np.int64)
    pieces = []
    row = 0
    while row < n:
        row_end = int(np.searchsorted(off_all, off_all[row] + SEG_BYTES, side="right")) - 1
        row_end = min(max(row_end, row + 1), n)
        pieces.append(
            seg_fn(d_all[off_all[row] : off_all[row_end]], off_all[row : row_end + 1] - off_all[row])
        )
        row = row_end
    if not pieces:
        return seg_fn(d_all, off_all)
    if isinstance(pieces[0], dict):
        return {k: np.concatenate([p[k] for p in pieces]) for k in pieces[0]}
    return np.concatenate(pieces)


def count_words_bytes(texts, words: tuple[str, ...]) -> np.ndarray:
    """(Chunked)Array -> per-string standalone-word count; byte-level
    RE2-equivalent of ``count_re(texts, marker_pattern(words))``."""
    return count_word_sets(texts, (words,))[0]


def count_word_sets(texts, sets: tuple[tuple[str, ...], ...]) -> list[np.ndarray]:
    """Count standalone-word matches for SEVERAL word sets over one shared
    token-run extraction (the lang-ID marker scorer: 25 marker words across
    5 languages cost ~one class pass instead of 25 positional scans)."""
    bsets = tuple(tuple(w.encode() for w in ws_) for ws_ in sets)
    names = [str(i) for i in range(len(bsets))]

    def seg(d, o):
        return dict(zip(names, _seg_word_sets(d, o, bsets)))

    if isinstance(texts, pa.ChunkedArray):
        chunks = texts.chunks or [pa.array([], pa.string())]
        if not len(texts):
            return [np.zeros(0, np.int64) for _ in bsets]
        parts = [_apply_segmented(c, seg) for c in chunks]
        return [np.concatenate([p[nm] for p in parts]) for nm in names]
    out = _apply_segmented(texts, seg)
    return [out[nm] for nm in names]


def _byte_class_counts(arr: pa.Array,
                       words: tuple[bytes, ...] | None = None,
                       need_bpe: bool = True) -> dict[str, np.ndarray]:
    """One vectorized pass over a StringArray's UTF-8 buffer -> per-string
    counts with EXACTLY the RE2 semantics of the module's patterns:

    - ``n_chars``    = utf8_length            (count of non-continuation bytes)
    - ``n_tokens``   = count of ``\\S+`` runs (RE2 ``\\s`` = ``[\\t\\n\\f\\r ]``)
    - ``n_punct``    = count of ``[^A-Za-z0-9\\s]`` chars (any non-ASCII char
      has exactly one lead byte, which is neither letter/digit/ws -> counts 1)
    - ``n_nonspace`` = count of ``\\S`` chars
    - ``n_bpe``      = ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]`` matches
      (= letter-run starts + digit-run starts + punct chars; leftmost-first
      alternation can never merge across the three classes)

    Replaces four whole-column RE2 scans (measured ~60% of the corpus
    pipeline's CPU) with numpy byte arithmetic.  Work proceeds in
    ~SEG_BYTES segments split at string boundaries so the per-worker
    scratch pool (see ``_SCRATCH``) stays small and is reused every batch.
    """
    _require_no_nulls(arr)
    n = len(arr)
    keys = OUT_KEYS + ("n_words",) if words is not None else OUT_KEYS
    if not need_bpe:
        keys = tuple(k for k in keys if k != "n_bpe")
    if n == 0:
        return {k: np.zeros(0, np.int64) for k in keys}
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    o = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.zeros(0, np.uint8)
    )
    d_all = data[o[0] : o[-1]]
    off_all = (o - o[0]).astype(np.int64)

    outs = {k: np.empty(n, np.int64) for k in keys}
    row = 0
    while row < n:
        # furthest string end within SEG_BYTES of this segment's start
        row_end = int(np.searchsorted(off_all, off_all[row] + SEG_BYTES, side="right")) - 1
        row_end = max(row_end, row + 1)
        row_end = min(row_end, n)
        seg = _seg_counts(
            d_all[off_all[row] : off_all[row_end]],
            off_all[row : row_end + 1] - off_all[row],
            words=words, need_bpe=need_bpe,
        )
        for k in keys:
            outs[k][row:row_end] = seg[k]
        row = row_end
    return outs


def byte_class_counts(texts, words: tuple[bytes, ...] | None = None,
                      need_bpe: bool = True) -> dict[str, np.ndarray]:
    """(Chunked)Array -> concatenated per-string class counts (optionally
    with a fused standalone-word count under ``n_words``)."""
    if isinstance(texts, pa.ChunkedArray):
        parts = [_byte_class_counts(c, words, need_bpe) for c in texts.chunks]
        if not parts:
            return _byte_class_counts(pa.array([], pa.string()), words,
                                      need_bpe)
        return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    return _byte_class_counts(texts, words, need_bpe)


def text_stats(texts, need_bpe: bool = True) -> dict[str, np.ndarray]:
    """texts: pyarrow (Chunked)Array -> dict of per-doc metric arrays.

    All counting — char classes AND the stopword markers — is ONE fused
    numpy byte pass (:func:`byte_class_counts` with ``words``,
    RE2-equivalent by construction — the SQL oracle gate proves it per
    run); ratios are float64 with guarded denominators (0-token docs
    score 0).
    """
    bc = byte_class_counts(texts, words=tuple(w.encode() for w in STOPWORDS),
                           need_bpe=need_bpe)
    n_chars = bc["n_chars"]
    n_tokens = bc["n_tokens"]
    n_punct = bc["n_punct"]
    n_nonspace = bc["n_nonspace"]
    tok = np.maximum(n_tokens, 1).astype(np.float64)
    chars = np.maximum(n_chars, 1).astype(np.float64)
    punct_ratio = n_punct / chars
    stop_ratio = bc["n_words"] / tok
    mean_tok_chars = n_nonspace / tok
    quality = (
        0.25 * np.minimum(1.0, n_tokens / QS_TOKEN_NORM)
        + 0.25 * (1.0 - punct_ratio)
        + 0.25 * np.where((stop_ratio >= QS_STOP_LO) & (stop_ratio <= QS_STOP_HI), 1.0, 0.0)
        + 0.25 * np.minimum(1.0, mean_tok_chars / QS_MEANLEN_NORM)
    )
    out = {"n_chars": n_chars, "n_tokens": n_tokens}
    if need_bpe:  # keep the historical column position for consumers that
        out["n_bpe_tokens"] = bc["n_bpe"]  # emit stats.items() in order
    out.update({
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "mean_token_chars": mean_tok_chars,
        "quality_score": quality,
    })
    return out


def lang_scores(texts) -> dict[str, np.ndarray]:
    """Marker-token counts per language -> {lang: int64 array}; all 5
    marker sets share one token-run extraction."""
    counts = count_word_sets(texts, tuple(words for _, words in LANG_MARKERS))
    return {lang: c for (lang, _), c in zip(LANG_MARKERS, counts)}


def lang_id(texts) -> np.ndarray:
    """Deterministic argmax language ID (first max in LANG_MARKERS order)."""
    scores = lang_scores(texts)
    langs = [lang for lang, _ in LANG_MARKERS]
    mat = np.stack([scores[lang] for lang in langs])  # (L, n)
    best = mat.argmax(axis=0)  # numpy argmax = first max, same as our SQL CASE
    return np.array(langs, dtype=object)[best]


def md5_hex(texts) -> list[str]:
    """Per-string md5 hex digest (matches DuckDB ``md5(text)``).

    hashlib releases work to C; ~1 us/row — acceptable for a fingerprint
    column (not in any per-page hot loop)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
