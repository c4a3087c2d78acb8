"""Bigram-LM quality scoring tests (stages/lm.py) against a brute-force
pure-Python transcription, including the vocab-cap and min-count paths the
driver data doesn't exercise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "completely unseen tokens here zzz",
    "the the the the",
    "single",
    "",
    "the cat sat",
]


def _brute(docs, train_mod, min_count, vocab_max, scale=10**9):
    toks = [d.split() for d in docs]
    train = [t for i, t in enumerate(toks) if i % train_mod == 0]
    uc: dict[str, int] = {}
    bc: dict[tuple[str, str], int] = {}
    for t in train:
        for w in t:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    vocab = dict(sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_max])
    V = len(vocab)
    model = {k: v for k, v in bc.items()
             if v >= min_count and k[0] in vocab and k[1] in vocab}
    rows = []
    for i, t in enumerate(toks):
        n = max(len(t) - 1, 0)
        s = 0
        for a, b in zip(t, t[1:]):
            c12 = model.get((a, b), 0)
            c1 = vocab.get(a, 0)
            s += ((c12 + 1) * scale) // (c1 + V)
        rows.append((i, n, s))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "score_fp"])


@pytest.mark.parametrize("train_mod,min_count,vocab_max", [
    (2, 2, 50_000),   # driver defaults
    (1, 1, 50_000),   # every doc in train, no count floor
    (2, 1, 4),        # vocab cap engaged (ties broken (cnt DESC, tok ASC))
])
def test_lm_score_matches_bruteforce(ray_session, train_mod, min_count, vocab_max):
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import lm_score

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(DOCS), dtype=np.int64)),
        "text": pa.array(DOCS),
    })).repartition(3)
    got = (
        lm_score(ds, train_mod=train_mod, min_count=min_count,
                 vocab_max=vocab_max, concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _brute(DOCS, train_mod, min_count, vocab_max)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    if train_mod == 1 and min_count == 1:
        # non-vacuous: the high-count repeated bigram ("the the" x3) must
        # outscore the count-1 bigrams of the rare-token doc per bigram
        mean = want["score_fp"] / want["n_bigrams"].clip(lower=1)
        assert mean.loc[4] > mean.loc[3]


def test_ccnet_buckets_monotone_and_exhaustive():
    """Buckets partition the corpus, labels are monotone in score_fp
    (head >= middle >= tail by value), and the thresholds are the exact
    rank-floor((n-1)q) terciles."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import ccnet_buckets

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(DOCS), dtype=np.int64)),
        "text": pa.array(DOCS),
    })).repartition(2)
    out = (
        ccnet_buckets(ds, train_mod=1, min_count=1, concurrency=2)
        .to_pandas().sort_values("score_fp").reset_index(drop=True)
    )
    assert len(out) == len(DOCS)
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    # monotone: once scores rise into the next bucket they never fall back
    order = {"tail": 0, "middle": 1, "head": 2}
    codes = out["bucket"].map(order).to_numpy()
    assert (np.diff(codes) >= 0).all()
    # exact thresholds: recompute from the scored values
    s = np.sort(out["score_fp"].to_numpy())
    n = len(s)
    t1 = s[int(np.floor((n - 1) * (1.0 / 3.0)))]
    t2 = s[int(np.floor((n - 1) * (2.0 / 3.0)))]
    expect = np.where(out["score_fp"] > t2, "head",
                      np.where(out["score_fp"] > t1, "middle", "tail"))
    assert (out["bucket"].to_numpy() == expect).all()


def test_bpe_merges_hand_corpus():
    """Hand-traced BPE on a tiny corpus: 'low low lower' -> word types
    low:2, lower:1.  Round 1 pairs: (l,o):3, (o,w):3 -> tie broken (s1,s2)
    ascending picks (l,o) -> 'lo'.  Round 2: (lo,w):3 wins -> 'low'.
    Round 3: (low,e):1, (e,r):1 -> (e,r) wins -> 'er'."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import bpe_merges

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["low low", "lower"], pa.string()),
    }))
    out = bpe_merges(ds, rounds=3).to_pandas()
    assert list(zip(out["left_sym"], out["right_sym"], out["merged"])) == [
        ("l", "o", "lo"), ("lo", "w", "low"), ("e", "r", "er")]
    assert out["pair_count"].tolist() == [3, 3, 1]


def test_bpe_merges_run_semantics_and_early_stop():
    """'aaa': round-1 pair (a,a) counted twice (overlapping lead-chain)
    but the sentinel replace merges once -> 'aa a'; round 2 merges
    (aa,a).  A single-char corpus stops early with zero rows."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import bpe_merges

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["aaa"], pa.string()),
    }))
    out = bpe_merges(ds, rounds=2).to_pandas()
    assert out["merged"].tolist() == ["aa", "aaa"]
    assert out["pair_count"].tolist() == [2, 1]

    single = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b c", ""], pa.string())[0:1],
    }))
    out2 = bpe_merges(single, rounds=2).to_pandas()
    assert len(out2) == 0


def test_bpe_tokenize_applies_learned_merges():
    """With merges (lo, low, er): 'low low' -> 2 tokens; 'lower' ->
    'low er' -> 2 tokens; an empty doc counts 0."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.lm import bpe_merges, bpe_tokenize

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["low low", "lower", ""], pa.string()),
    }))
    merges = bpe_merges(ds, rounds=3)
    out = bpe_tokenize(ds, merges).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [2, 2, 0]


def test_bpe_exotic_whitespace_symbol_survives():
    """A vertical tab survives the RE2 \\s+ split as a word character; the
    engine must keep it as a BPE symbol (ASCII-space-only trims), matching
    the SQL twin's array_to_string/trim semantics."""
    import duckdb
    import ray.data as rd

    from cuda_gis_smoothing_ray.sql import oracles_corpus as oc
    from cuda_gis_smoothing_ray.stages.lm import bpe_merges, bpe_tokenize

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a\x0b a\x0b", "a\x0bz"], pa.string()),
    })
    ds = rd.from_arrow(docs)
    got = bpe_merges(ds, rounds=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(oc.bpe_merges_sql(rounds=2)).df()
    assert got["merged"].tolist() == want["merged"].tolist()
    assert got["pair_count"].tolist() == want["pair_count"].tolist()
    # the merged symbol contains the raw \x0b byte
    assert got["merged"].tolist()[0] == "a\x0b"
    tok = bpe_tokenize(ds, bpe_merges(ds, rounds=2)).to_pandas().sort_values(
        "doc_id")
    wtok = con.sql(oc.bpe_tokenize_sql(rounds=2)).df().sort_values("doc_id")
    assert tok["n_tokens"].tolist() == wtok["n_tokens"].tolist()
