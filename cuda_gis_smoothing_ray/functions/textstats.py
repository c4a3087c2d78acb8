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


def text_stats(texts) -> dict[str, np.ndarray]:
    """texts: pyarrow (Chunked)Array -> dict of per-doc metric arrays.

    All counting is done by four RE2 scans over the column; ratios are
    float64 with guarded denominators (0-token docs score 0).
    """
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = count_re(texts, TOKEN_RE)
    n_bpe = count_re(texts, BPE_RE)
    n_punct = count_re(texts, PUNCT_RE)
    n_nonspace = count_re(texts, NONSPACE_RE)
    tok = np.maximum(n_tokens, 1).astype(np.float64)
    chars = np.maximum(n_chars, 1).astype(np.float64)
    punct_ratio = n_punct / chars
    stop_ratio = count_re(texts, marker_pattern(STOPWORDS)) / tok
    mean_tok_chars = n_nonspace / tok
    quality = (
        0.25 * np.minimum(1.0, n_tokens / QS_TOKEN_NORM)
        + 0.25 * (1.0 - punct_ratio)
        + 0.25 * np.where((stop_ratio >= QS_STOP_LO) & (stop_ratio <= QS_STOP_HI), 1.0, 0.0)
        + 0.25 * np.minimum(1.0, mean_tok_chars / QS_MEANLEN_NORM)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_bpe_tokens": n_bpe,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "mean_token_chars": mean_tok_chars,
        "quality_score": quality,
    }


def lang_scores(texts) -> dict[str, np.ndarray]:
    """Marker-token counts per language -> {lang: int64 array}."""
    return {lang: count_re(texts, marker_pattern(words)) for lang, words in LANG_MARKERS}


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
