"""Text analysis + dedup operator tests: planted-duplicate fixtures and
brute-force numpy oracles (the reference's cross-implementation-equivalence
strategy, SURVEY §5, applied to the corpus ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows], pa.string()),
            }
        )
    )


BASE = (
    "the quick brown fox jumps over a lazy dog and runs into the value of "
    "deep data pipelines with many tokens to hash"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token near-duplicate
OTHER = "completely different content about graphs shuffles and actors in ray"


@pytest.fixture(scope="module")
def planted():
    return [
        (0, BASE),
        (1, BASE),        # exact dup of 0
        (2, NEAR),        # near dup of 0
        (3, OTHER),
        (4, OTHER + " with an extra suffix of words appended here"),
        (5, "tiny"),
    ]


def test_exact_dedup_keeps_min_id(planted):
    from cuda_gis_smoothing_ray.stages.textops import exact_dedup

    out = exact_dedup(_docs_ds(planted)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2, 3, 4, 5]  # doc 1 deduped into 0


def test_minhash_finds_planted_near_dups(planted):
    from cuda_gis_smoothing_ray.stages.textops import minhash_pairs

    out = minhash_pairs(_docs_ds(planted), threshold=0.5).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs  # exact dup: est_jaccard == 1
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert (0, 3) not in pairs and (0, 5) not in pairs


def test_simhash_hamming_zero_for_exact_dup(planted):
    from cuda_gis_smoothing_ray.stages.textops import simhash_pairs

    out = simhash_pairs(_docs_ds(planted), max_hamming=6).to_pandas()
    d = {(a, b): h for a, b, h in zip(out["a"], out["b"], out["hamming"])}
    assert d.get((0, 1)) == 0
    assert (0, 2) in d  # one-token change stays within a few bits
    assert (0, 3) not in d


def test_jaccard_pairs_matches_numpy_oracle(planted):
    from cuda_gis_smoothing_ray.stages.textops import jaccard_pairs

    out = jaccard_pairs(_docs_ds(planted), threshold=0.3).to_pandas()
    got = {(a, b): j for a, b, j in zip(out["a"], out["b"], out["jaccard"])}
    sets = {i: set(t.split()) for i, t, *_ in planted}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= 0.3:
                    want[(a, b)] = np.floor(j * 1e6 + 0.5) / 1e6
    assert got == want


def test_text_stats_invariants(sf_dir):
    from cuda_gis_smoothing_ray.stages.textops import read_documents, text_stats

    df = text_stats(read_documents(sf_dir)).to_pandas()
    assert len(df) == 500
    assert (df["n_tokens"] <= df["n_chars"]).all()
    for c in ["punct_ratio", "stopword_ratio"]:
        assert df[c].between(0, 1).all()
    assert (df["quality_score"].between(0, 1)).all()
    assert df["fingerprint"].str.len().eq(32).all()


def test_lang_id_deterministic_argmax():
    from cuda_gis_smoothing_ray.stages.textops import lang_id

    rows = [
        (0, "the value of the thing and more", "en"),
        (1, "der hund und die katze und das haus", "de"),
        (2, "le chat et les chiens et une maison", "fr"),
        (3, "xyzzy qwerty plugh", "zh"),  # no markers anywhere -> first lang wins
    ]
    out = lang_id(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist() == ["en", "de", "fr", "en"]


def test_byte_class_counts_equal_re2():
    """The numpy byte-class kernel must count exactly like the RE2 patterns
    it replaces (adversarial + fuzz, incl. slices, unicode, tiny segments)."""
    import numpy as np
    import pyarrow as pa

    from cuda_gis_smoothing_ray.functions import textstats as ts

    cases = ["", " ", "hello world", "vvert\x0bx", "über café 北京 test!", "...",
             "a" * 100, "1 22 333, x;y", "\n\nmulti\nline\f", "🎉🎉 two emoji"]
    rng = np.random.default_rng(3)
    alphabet = list("abc XYZ 019 \t\n\f\r.;-é北🎉")
    cases += ["".join(rng.choice(alphabet, size=rng.integers(0, 120))) for _ in range(1500)]
    pairs = [("n_tokens", ts.TOKEN_RE), ("n_bpe", ts.BPE_RE),
             ("n_punct", ts.PUNCT_RE), ("n_nonspace", ts.NONSPACE_RE)]
    old_seg = ts.SEG_BYTES
    try:
        for seg in (old_seg, 256):
            ts.SEG_BYTES = seg
            for arr in (pa.array(cases), pa.array(cases).slice(3, 1000),
                        pa.array(cases).cast(pa.large_string())):
                got = ts.byte_class_counts(arr)
                for k, pat in pairs:
                    assert np.array_equal(got[k], ts.count_re(arr, pat)), (k, seg)
    finally:
        ts.SEG_BYTES = old_seg


def test_count_words_bytes_equal_re2():
    import numpy as np
    import pyarrow as pa

    from cuda_gis_smoothing_ray.functions import textstats as ts

    rng = np.random.default_rng(4)
    vocab = ["the", "a", "and", "of", "to", "in", "is", "xx", "thee", "athe",
             "and_", "1", "_", "北京", " ", ""]
    fuzz = [" ".join(rng.choice(vocab, size=rng.integers(0, 30))) for _ in range(2000)]
    # cross-string adjacency: "...th" + "e..." must NOT match "the"
    fuzz += ["xx th", "e yy", "th", "e", " the "]
    arr = pa.array(fuzz)
    for words in [ts.STOPWORDS] + [w for _, w in ts.LANG_MARKERS]:
        got = ts.count_words_bytes(arr, words)
        want = ts.count_re(arr, ts.marker_pattern(words))
        assert np.array_equal(got, want), words


def test_jaccard_max_df_drops_stopword_fanout(planted):
    """The bounded default path: a token present in EVERY doc is dropped by
    max_df, so pairs linked ONLY through it disappear while pairs sharing
    rarer tokens survive with the exact jaccard value."""
    from cuda_gis_smoothing_ray.stages.textops import jaccard_pairs

    rows = [(i, f"common u{i} v{i}") for i in range(8)]
    rows += [(100, "common alpha beta gamma"), (101, "common alpha beta gamma delta")]
    # max_df=4: "common" (df=10) is dropped; alpha/beta/gamma (df=2) survive
    out = jaccard_pairs(_docs_ds(rows), threshold=0.2, max_df=4).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == {(100, 101)}
    # set sizes stay exact (4 and 5); only the dropped token's SHARED count
    # is lost, so jaccard = 3 / (4 + 5 - 3)
    j = out.set_index(["a", "b"]).loc[(100, 101), "jaccard"]
    assert j == np.floor(3 / 6 * 1e6 + 0.5) / 1e6

    exact = jaccard_pairs(_docs_ds(rows), threshold=0.2, max_df=None).to_pandas()
    assert len(exact) > len(out)  # the i<->j "common"-only pairs exist exactly


def test_doc_fingerprints_match_direct_winnowing(planted):
    from cuda_gis_smoothing_ray.functions.hashing import winnow_fingerprints
    from cuda_gis_smoothing_ray.stages.textops import doc_fingerprints

    out = doc_fingerprints(_docs_ds(planted)).to_pandas()
    got = {d: sorted(g["fp"]) for d, g in out.groupby("doc_id")}
    for doc_id, text, *_ in planted:
        want = sorted(winnow_fingerprints(text).view(np.int64).tolist())
        assert got[doc_id] == want, doc_id
    # exact dups share the full fingerprint set; unrelated docs do not
    assert got[0] == got[1]
    assert got[0] != got[3]


def test_simhash_fnv_path_equals_per_doc_reference():
    """The vectorized fnv simhash (batch split + prefix-slice token hashing
    + per-bit segmented votes) must equal a per-doc loop over the same hash
    family."""
    import re

    from cuda_gis_smoothing_ray.functions import hashing

    rng = np.random.default_rng(0)
    vocab = ["the", "cat", "sat", "on", "mat", "42", "x", "北京", "lorem", ""]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 40))) for _ in range(200)]
    docs += ["", "   ", "one", "a b  c"]
    pat = re.compile(r"\S+")
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    want = np.empty(len(docs), dtype=np.uint64)
    for i, t in enumerate(docs):
        toks = pat.findall(t)
        if not toks:
            want[i] = np.uint64(0)
            continue
        th = hashing.fnv_token_hash64(toks)
        votes = ((th[:, None] & bits[None, :]) != 0).sum(axis=0) * 2 - len(th)
        want[i] = np.uint64(((votes > 0) * bits).sum(dtype=np.uint64))
    got = hashing.simhash64(docs, token_hash="fnv")
    assert np.array_equal(got, want)


def test_contamination_planted():
    """Docs sharing trigrams with the benchmark partition (doc_id % 10 == 0)
    are flagged with exact DISTINCT-trigram overlap counts; disjoint docs and
    benchmark docs themselves are absent."""
    from cuda_gis_smoothing_ray.stages.textops import contamination

    rows = [
        (10, "alpha beta gamma delta"),          # benchmark: trigrams {a b g, b g d}
        (1, "alpha beta gamma delta"),           # shares both trigrams -> 2
        (2, "x alpha beta gamma y"),             # shares "alpha beta gamma" -> 1
        (3, "alpha beta gamma alpha beta gamma"),  # repeated shared trigram counts once... plus bridge
        (4, "nothing in common here at all"),    # absent
        (20, "zz yy xx"),                        # benchmark with unshared trigram
    ]
    out = contamination(_docs_ds(rows), bench_mod=10, n=3).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    assert got[1] == 2
    assert got[2] == 1
    # doc 3: distinct trigrams = {abg, bga, gab, abg(dup)} -> shared distinct = abg, bgd? no:
    # trigrams of doc3: "alpha beta gamma", "beta gamma alpha", "gamma alpha beta",
    # "alpha beta gamma" (dup) -> shared with bench {abg, bgd} = {"alpha beta gamma"} -> 1
    assert got[3] == 1
    assert 4 not in got and 10 not in got and 20 not in got


def test_pack_sequences_prefix_sum():
    """Global exclusive prefix sum across many small blocks: seq_id/offset
    match the single-machine cumsum regardless of block boundaries."""
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import pack_sequences

    rng = np.random.default_rng(7)
    n = 400
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 30, size=n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    ds = rd.from_arrow(tbl).repartition(13)  # many blocks, uneven sizes
    out = pack_sequences(ds, cap=64).to_pandas().sort_values("doc_id").reset_index(drop=True)
    nt = np.array([len(t.split()) if t else 0 for t in texts], np.int64)
    cum_prev = np.cumsum(nt) - nt
    assert np.array_equal(out["n_tokens"].to_numpy(), nt)
    assert np.array_equal(out["seq_id"].to_numpy(), cum_prev // 64)
    assert np.array_equal(out["seq_offset"].to_numpy(), cum_prev % 64)


def test_dup_ngram_stats_planted():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import dup_ngram_stats

    # doc 1: "a b a b a b" -> 3-grams: "a b a", "b a b", "a b a", "b a b"
    #   -> all 4 occurrences duplicated, 5 chars each
    # doc 2: all distinct grams; doc 3: too short for any 3-gram (dropped)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a b", "w x y z", "hi there"]),
    }))
    out = dup_ngram_stats(ds, n=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_grams"].tolist() == [4, 2]
    assert out["n_dup"].tolist() == [4, 0]
    assert out["total_chars"].tolist() == [20, 10]
    assert out["dup_chars"].tolist() == [20, 0]


def test_inverted_index_ordered_postings():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import inverted_index

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 7, 3], pa.int64()),
        "text": pa.array(["cat dog cat", "dog fish", "cat dog"]),
    }))
    out = (
        inverted_index(ds, min_df=2)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    # "fish" df=1 filtered; within-doc repeats of "cat" dedup to one posting;
    # posting lists ascend by doc_id regardless of input order
    assert out["token"].tolist() == ["cat", "dog"]
    assert out["df"].tolist() == [2, 3]
    assert out["doc_list"].tolist() == ["3,10", "3,7,10"]


def test_chunk_documents_cover_and_overlap():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import chunk_documents

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # len 0 -> 1 empty chunk; len 10 -> 1 chunk; len 25 -> 3 chunks at
        # stride 10 / size 12
        "text": pa.array(["", "abcdefghij", "abcdefghijklmnopqrstuvwxy"]),
    })
    out = (chunk_documents(rd.from_arrow(docs), size=12, stride=10)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    got = list(zip(out["doc_id"], out["chunk_idx"], out["chunk_text"]))
    assert got == [
        (1, 0, ""),
        (2, 0, "abcdefghij"),
        (3, 0, "abcdefghijkl"),
        (3, 1, "klmnopqrstuv"),
        (3, 2, "uvwxy"),
    ]
    # overlap invariant: consecutive chunks share size - stride chars
    assert got[3][2][:2] == got[2][2][-2:]


def test_redact_terms_matches_python_re():
    import re

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.extract import redact_terms

    texts = ["the customer ran spark fast", "no match", "customer customer",
             "sparkle is not spark boundary", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    out = (redact_terms(ds, pattern=r"\b(customer|spark)\b", replacement="<X>")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pat = re.compile(r"\b(customer|spark)\b")
    assert out["text"].tolist() == [pat.sub("<X>", t) for t in texts]
    assert out["n_redactions"].tolist() == [len(pat.findall(t)) for t in texts]
    # "sparkle" must survive: word-boundary semantics, not substring
    assert "sparkle" in out["text"][3]


def test_cross_source_neardup_hand(ray_session):
    """Planted exact duplicates across known sources: the pair matrix is
    exactly the cross-tab of the duplicate clique's source labels, and
    unrelated docs contribute nothing."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import cross_source_neardup

    dup = BASE  # identical text -> est_jaccard 1.0, always banded together
    other = "completely different words about oranges apples pears " * 3
    rows = [
        (1, dup, "crawl_a"),
        (2, dup, "crawl_b"),
        (3, dup, "crawl_a"),
        (4, other, "crawl_c"),
        (5, "yet another unrelated text with its own unique tokens here",
         "crawl_b"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)
    got = cross_source_neardup(ds).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    # clique {1,2,3}: pairs (1,2) a-b, (1,3) a-a, (2,3) a-b
    assert got["source_a"].to_list() == ["crawl_a", "crawl_a"]
    assert got["source_b"].to_list() == ["crawl_a", "crawl_b"]
    assert got["n_pairs"].to_list() == [1, 2]


def test_source_divergence_matrix_hand(ray_session):
    """Three tiny sources with hand-computable unigram JSD: A = "x x y",
    B = "x z", C = "x x y" (identical to A).  Expected nano-nat terms
    (each quantized separately, engine discipline):
      (A,B): x -> (1/3)ln(8/7) + (1/4)ln(6/7), y -> ln2/6, z -> ln2/4
      (A,C): identical distributions -> 0 over union vocab {x, y}
      (B,C): symmetric to (A,B) -> same quantized total."""
    import math

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import source_divergence_matrix

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["x x y", "x z", "x x y"], pa.string()),
        "source": pa.array(["src_a", "src_b", "src_c"], pa.string()),
    })).repartition(2)
    got = source_divergence_matrix(ds).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)

    def q(t):
        return int(math.floor(t * 1e9 + 0.5))

    # pair (A,B): nA=3, nB=2; per-token terms with m = (p1+p2)/2
    tx = (0.5 * (2 / 3)) * math.log((2 / 3) / ((2 / 3 + 1 / 2) / 2.0)) \
        + (0.5 * (1 / 2)) * math.log((1 / 2) / ((2 / 3 + 1 / 2) / 2.0))
    ty = (0.5 * (1 / 3)) * math.log((1 / 3) / ((1 / 3) / 2.0))
    tz = (0.5 * (1 / 2)) * math.log((1 / 2) / ((1 / 2) / 2.0))
    ab = q(tx) + q(ty) + q(tz)

    assert got["source_a"].to_list() == ["src_a", "src_a", "src_b"]
    assert got["source_b"].to_list() == ["src_b", "src_c", "src_c"]
    assert got["n_tokens"].to_list() == [3, 2, 3]
    assert got["jsd_nano"].to_list() == [ab, 0, ab]


def test_readability_hand(ray_session):
    """Hand-counted Flesch proxy: "The cat sat. The dog ran!" has 6
    whitespace tokens, 2 sentence-terminator runs, 6 vowel runs ->
    206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19.  Empty text clamps both
    denominators to 1: 206.835 - 1.015 - 0 = 205.82."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import readability

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["The cat sat. The dog ran!", "", "Wait... what?!"],
                         pa.string()),
    }))
    got = readability(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["n_tokens"].to_list() == [6, 0, 2]
    assert got["n_sentences"].to_list() == [2, 0, 2]  # "..." = ONE run
    assert got["n_vowel_runs"].to_list() == [6, 0, 2]  # "ai" in Wait, "a" in what
    assert got["flesch"][0] == 119.19
    assert got["flesch"][1] == 205.82


def test_gopher_repetition_hand(ray_session):
    """Hand-counted repetition metrics.  "a b a b a b" (n_chars 11):
    top 2-gram "a b" c=3 len=3 -> 9/11; 3-grams "a b a"/"b a b" tie at 2,
    gram-asc picks "a b a" len=5 -> 10/11; both 5-grams distinct -> dup5 0.
    "w w w w w w": the repeated 5-gram "w w w w w" (2 occurrences, 1
    distinct) -> dup5 0.5; count*len cover may exceed n_chars (overlap) —
    15/11 (top-3: "w w w" x4, len 5 -> 20/11).  "x y z" has no 5-gram -> dup5 0."""
    import math

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import gopher_repetition

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a b", "x y z", "w w w w w w"], pa.string()),
    })).repartition(2)
    got = gopher_repetition(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["n_chars"].to_list() == [11, 5, 11]
    assert got["top2_char_frac"].to_list() == [r6(9 / 11), r6(3 / 5), r6(15 / 11)]
    assert got["top3_char_frac"].to_list() == [r6(10 / 11), 1.0, r6(20 / 11)]
    assert got["dup5_frac"].to_list() == [0.0, 0.0, 0.5]


def test_source_divergence_matrix_zero_token_source_raises(ray_session):
    """Contract error: a source whose every document is empty has no
    unigram distribution — the stage must refuse loudly, not divide by 0."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import source_divergence_matrix

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["x y", "", "  "], pa.string()),
        "source": pa.array(["src_a", "src_b", "src_b"], pa.string()),
    }))
    with pytest.raises(ValueError, match="no tokens"):
        source_divergence_matrix(ds).to_pandas()


def test_lang_id_eval_hand(ray_session):
    """Hand-built confusion: en predicted right once and confused to de
    once; fr perfect; gold label "zz" is never predictable (not in the
    marker list) but must still appear as a class row with rec=0."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import lang_id_eval

    rows = [
        (0, "the a and", "en"),       # pred en  (tp)
        (1, "der und die", "en"),     # pred de  (en miss, de false pos)
        (2, "le et les", "fr"),       # pred fr  (tp)
        (3, "qqq", "zz"),             # no markers -> pred en (first max)
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(2)
    got = lang_id_eval(ds).reset_index(drop=True)
    assert got["lang"].to_list() == ["de", "en", "fr", "zz"]
    assert got["n_true"].to_list() == [0, 2, 1, 1]
    assert got["n_pred"].to_list() == [1, 2, 1, 0]
    assert got["tp"].to_list() == [0, 1, 1, 0]
    assert got["prec"].to_list() == [0.0, 0.5, 1.0, 0.0]
    assert got["rec"].to_list() == [0.0, 0.5, 1.0, 0.0]
    assert got["f1"].to_list() == [0.0, 0.5, 1.0, 0.0]


def test_lang_source_chi2_hand(ray_session):
    """Textbook 2x2: counts (en,s1)=10 (en,s2)=20 (de,s1)=30 (de,s2)=40
    -> expected 12/18/28/42, chi2 = 4*(1/12+1/18+1/28+1/42); per-cell
    nano quantization gives 333333333+222222222+142857143+95238095 =
    793650793 exactly."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import lang_source_chi2

    langs, srcs = [], []
    for lang, src, c in [("en", "s1", 10), ("en", "s2", 20),
                         ("de", "s1", 30), ("de", "s2", 40)]:
        langs += [lang] * c
        srcs += [src] * c
    ds = rd.from_arrow(pa.table({
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })).repartition(3)
    got = lang_source_chi2(ds)
    assert got["n_docs"].to_list() == [100]
    assert got["n_langs"].to_list() == [2]
    assert got["n_sources"].to_list() == [2]
    assert got["dof"].to_list() == [1]
    assert got["chi2_nano"].to_list() == [793650793]


def test_length_psi_by_source_hand(ray_session):
    """Lengths 1..10 one doc each -> exact deciles t_k = k, one doc per
    bin; source A holds lengths 1-5, B holds 6-10 — perfectly disjoint
    halves, so each source has five (2/15 vs 2/20) bins and five
    (1/15 vs 2/20) bins and A and B get the identical PSI."""
    import math

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import length_psi_by_source

    ds = rd.from_arrow(pa.table({
        "n_chars": pa.array(list(range(1, 11)), pa.int64()),
        "source": pa.array(["A"] * 5 + ["B"] * 5, pa.string()),
    })).repartition(3)
    got = length_psi_by_source(ds).reset_index(drop=True)

    def q(t):
        return int(math.floor(t * 1e9 + 0.5))

    ps_hi, ps_lo, pg = 2 / 15, 1 / 15, 2 / 20
    want = 5 * q((ps_hi - pg) * math.log(ps_hi / pg)) \
        + 5 * q((ps_lo - pg) * math.log(ps_lo / pg))
    assert got["source"].to_list() == ["A", "B"]
    assert got["n_docs"].to_list() == [5, 5]
    assert got["psi_nano"].to_list() == [want, want]


def test_cross_source_neardup_arms_parity(ray_session):
    """The size-gated broadcast arm and the tagged-union shuffle arm must
    produce the identical contamination matrix (broadcast_max_docs=0
    forces the shuffle arm)."""
    from cuda_gis_smoothing_ray.stages.textops import cross_source_neardup

    dup = BASE
    rows = [(1, dup, "x"), (2, dup, "y"), (3, dup, "x"), (4, "other words", "z")]
    ds = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    import ray.data as rd
    fast = cross_source_neardup(rd.from_arrow(ds).repartition(2)) \
        .to_pandas().sort_values(["source_a", "source_b"]).reset_index(drop=True)
    slow = cross_source_neardup(rd.from_arrow(ds).repartition(2),
                                broadcast_max_docs=0) \
        .to_pandas().sort_values(["source_a", "source_b"]).reset_index(drop=True)
    assert fast.equals(slow)
    assert fast["n_pairs"].sum() == 3


def test_minhash_verify_arms_parity(planted, monkeypatch):
    """The endpoint-broadcast semi-join filter (round 5) and the
    full-stream verify plan must be bit-identical — filtering sig rows to
    pair endpoints cannot change which joins match."""
    from cuda_gis_smoothing_ray.stages import textops

    def run():
        return (textops.minhash_pairs(_docs_ds(planted), threshold=0.5)
                .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    broadcast = run()
    monkeypatch.setattr(textops, "VERIFY_BROADCAST_MAX_ENDPOINTS", 0)
    fullstream = run()
    assert broadcast.equals(fullstream)
    assert len(broadcast) > 0
