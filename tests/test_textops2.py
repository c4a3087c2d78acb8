"""Tests for the round-2 text-cleaning transforms (stages/textops.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_collapse_repeats(ray_session):
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import collapse_repeats

    docs = [
        "a a b a",          # only the immediate repeat collapses
        "x x x x",          # run collapses to one
        "no repeats here",
        "",                 # empty doc stays empty
        "  spaced   out  ", # whitespace normalizes as a side effect
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
    })).repartition(2)
    out = collapse_repeats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == ["a b a", "x", "no repeats here", "", "spaced out"]
    assert out["n_tokens_in"].tolist() == [4, 4, 3, 0, 2]
    assert out["n_tokens_out"].tolist() == [3, 1, 3, 0, 2]


def test_collapse_repeats_batch_boundary(ray_session):
    """A repeat run must not leak across documents: last token of doc i ==
    first token of doc i+1 keeps both."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import collapse_repeats

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["end tok", "tok start"]),
    }))
    out = collapse_repeats(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["end tok", "tok start"]


def test_len_histogram_exact_counts():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import len_histogram

    docs = rd.from_items([{"text": "x" * n} for n in (3, 7, 10, 10, 25, 99, 100)])
    out = len_histogram(docs, width=10).to_pandas().sort_values("bucket")
    got = list(zip(out["bucket"], out["lo"], out["n_docs"]))
    assert got == [(0, 0, 2), (1, 10, 2), (2, 20, 1), (9, 90, 1), (10, 100, 1)]


def test_host_split_is_group_consistent():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import host_split

    rows = [
        {"page_id": i, "url": f"https://h{i % 17}.com/p/{i}"}
        for i in range(500)
    ]
    out = host_split(rd.from_items(rows)).to_pandas()
    # leakage-safety: one split per host, deterministic across runs
    per_host = out.groupby("host")["split"].nunique()
    assert (per_host == 1).all()
    out2 = host_split(rd.from_items(rows)).to_pandas().sort_values("page_id")
    assert (out.sort_values("page_id")["split"].to_numpy() == out2["split"].to_numpy()).all()
    assert set(out["split"]) <= {"train", "val", "test"}


def test_lang_confusion_counts_off_diagonal():
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import textstats
    from cuda_gis_smoothing_ray.stages.textops import lang_confusion

    # construct texts the marker heuristic will misclassify
    en = "the and for with that this from have the and"
    de = "der die und das nicht mit von ist der die"
    rows = (
        [{"doc_id": i, "lang": "en", "text": en} for i in range(10)]
        + [{"doc_id": 100 + i, "lang": "en", "text": de} for i in range(3)]  # mislabeled
        + [{"doc_id": 200 + i, "lang": "de", "text": de} for i in range(7)]
    )
    out = lang_confusion(rd.from_items(rows)).to_pandas()
    m = {(r.lang, r.pred_lang): r.n_docs for r in out.itertuples()}
    pred_en = textstats.lang_id(__import__("pyarrow").array([en]))[0]
    pred_de = textstats.lang_id(__import__("pyarrow").array([de]))[0]
    assert m[("en", pred_en)] == 10
    assert m[("en", pred_de)] == 3
    assert m[("de", pred_de)] == 7
    assert out["n_docs"].sum() == 20


def test_fuzzy_value_join_matches_brute_levenshtein():
    import itertools

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import fuzzy_value_join

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    vals = [
        "alpha", "alpho", "alph", "aalpha", "beta", "betas", "bela",
        "gamma", "gamma", "gxmma", "delta", "dolta", "del", "deltaa",
        "x", "xy", "y", "zzz",
    ]
    ds = rd.from_items([{"v": v} for v in vals])
    out = fuzzy_value_join(ds, "v").to_pandas()
    got = set(zip(out["a"], out["b"]))
    uniq = sorted(set(vals))
    want = {
        (a, b) for a, b in itertools.combinations(uniq, 2) if lev(a, b) <= 1
    }
    assert got == want and len(want) >= 6


def test_char_entropy_known_values():
    import math

    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import char_entropy

    docs = [
        {"doc_id": 1, "text": "aaaa"},          # entropy 0
        {"doc_id": 2, "text": "ab"},            # entropy 1 bit
        {"doc_id": 3, "text": "abcd"},          # entropy 2 bits
        {"doc_id": 4, "text": "aab"},           # -2/3 log2(2/3) - 1/3 log2(1/3)
    ]
    out = char_entropy(rd.from_items(docs)).to_pandas().set_index("doc_id")
    assert out.loc[1, "entropy"] == 0.0
    assert out.loc[2, "entropy"] == 1.0
    assert out.loc[3, "entropy"] == 2.0
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(out.loc[4, "entropy"] - want) < 1e-6
    assert out.loc[4, "n_chars"] == 3


def test_simhash_fnv_null_text_sanitized():
    """NULL text slots must hash like "" on the vectorized fnv path (the
    blake2b/md5 loops' `t or ""` analog) instead of crashing np.repeat."""
    import pyarrow as pa

    from cuda_gis_smoothing_ray.functions.hashing import simhash64

    got = simhash64(pa.array(["abc def", None, ""]), token_hash="fnv")
    want = simhash64(pa.array(["abc def", "", ""]), token_hash="fnv")
    assert (got == want).all()


def test_passage_dedup_window_semantics(ray_session):
    """Windows are NON-overlapping, aligned to position 0, tail dropped;
    dup = the window text appears in >= 2 distinct docs; docs shorter than
    w emit no row; within-doc repeats count every instance."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import passage_dedup

    docs = [
        "a b c d e",        # windows: "a b", "c d" ("e" tail dropped)
        "c d a b x y",      # windows: "c d", "a b", "x y"
        "a b a b",          # two instances of "a b" -> both dup
        "z",                # shorter than w: no row
        "b c d e",          # "b c", "d e" -- misaligned vs doc0: no dup
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
    })).repartition(3)
    out = passage_dedup(ds, w=2).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 1, 2, 4]
    assert out["n_passages"].tolist() == [2, 3, 2, 2]
    # "a b" in docs 0,1,2; "c d" in docs 0,1; "b c"/"d e"/"x y" unique
    assert out["n_dup_passages"].tolist() == [2, 2, 2, 0]


def test_host_gini_hand_math(ray_session):
    """Gini from the count histogram == the rank-formula on paper.
    Hosts: a.com x1, b.com x1, c.com x4  (sorted x: 1,1,4; i*x = 1+2+12)
    G = (2*15 - 4*6) / (3*6) = 6/18 = 0.333333.  One-host TLD -> G=0."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import host_gini

    urls = (["https://a.com/p/1"] + ["https://b.com/p/2"]
            + ["https://c.com/p/3"] * 4 + ["https://solo.net/p/9"] * 7)
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)})).repartition(3)
    out = host_gini(ds).to_pandas().sort_values("tld").reset_index(drop=True)
    assert out["tld"].tolist() == ["com", "net"]
    assert out["n_hosts"].tolist() == [3, 1]
    assert out["n_pages"].tolist() == [6, 7]
    assert out["gini"].tolist() == [0.333333, 0.0]


def test_snapshot_merge_semantics(ray_session):
    """Upsert replaces, delete removes, new-key upsert inserts, untouched
    base rows pass through; two changes for one key raise."""
    import pytest
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import snapshot_merge

    base = rd.from_arrow(pa.table({
        "key": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", "c"]),
    }))
    ch = rd.from_arrow(pa.table({
        "key": pa.array([2, 3, 9], pa.int64()),
        "text": pa.array(["B", "", "new"]),
        "op": pa.array(["upsert", "delete", "upsert"]),
    }))
    out = snapshot_merge(base, ch).to_pandas().sort_values("key")
    assert list(zip(out["key"], out["text"])) == [(1, "a"), (2, "B"), (9, "new")]

    dup = rd.from_arrow(pa.table({
        "key": pa.array([2, 2], pa.int64()),
        "text": pa.array(["x", "y"]),
        "op": pa.array(["upsert", "delete"]),
    }))
    with pytest.raises(Exception, match="compact the"):
        snapshot_merge(base, dup).to_pandas()


def test_len_percentile_tie_semantics(ray_session):
    """Ties share the minimum rank: lengths [3,3,5,9] -> strictly-less
    counts [0,0,2,3] over n-1=3."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import len_percentile

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "n_chars": pa.array([3, 3, 5, 9], pa.int64()),
    })).repartition(2)
    out = len_percentile(ds).to_pandas().sort_values("doc_id")
    assert out["pct_rank"].tolist() == [0.0, 0.0, 0.666667, 1.0]


def test_pareto_docs_anticorrelated_frontier(ray_session):
    """Adversarial skyline: n_tokens up while n_distinct down -> EVERY doc
    is on the frontier (the worst case the docstring declares)."""
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import pareto_docs

    texts = []
    for i in range(6):
        words = [f"w{j}" for j in range(6 - i)]
        texts.append(" ".join(words + ["w0"] * (2 * i)))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    out = pareto_docs(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == list(range(6))
    assert out["n_tokens"].tolist() == [6 + i for i in range(6)]
    assert out["n_distinct"].tolist() == [6 - i for i in range(6)]


def test_pareto_docs_duplicates_and_dominated(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import pareto_docs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c",      # (3, 3): frontier
            "a b c",      # (3, 3): equal point -> also frontier
            "a b",        # (2, 2): dominated by (3, 3)
            "a a b b",    # (4, 2): frontier (more tokens, fewer distinct)
        ], pa.string()),
    })).repartition(2)
    out = pareto_docs(ds).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 3]


def test_nb_lang_classify_tiebreak_and_inner_join(ray_session):
    """Score ties break to the lexicographically smallest lang; docs with
    no train-vocab token are absent."""
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import nb_lang_classify

    # train docs (ids 0, 2): one 'de', one 'en', disjoint vocab + one
    # shared token "x" with equal counts
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 2, 1, 3], pa.int64()),
        "lang": pa.array(["de", "en", "fr", "fr"], pa.string()),
        "text": pa.array([
            "hund x", "dog x",
            "x",            # scores de=1, en=1 -> tie -> "de"
            "zzz",          # no train token -> absent
        ], pa.string()),
    })).repartition(2)
    out = nb_lang_classify(ds, train_mod=2).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "pred_lang"] == "de"
    assert out.loc[1, "score"] == 1
    assert 3 not in out.index
    assert out.loc[0, "pred_lang"] == "de"  # own vocab dominates


def test_dup_span_coverage_interval_union(ray_session):
    """Two docs share a 10-token run -> overlapping marked windows must
    union to 10 covered tokens, not 3 windows x 8."""
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import dup_span_coverage

    shared = " ".join(f"s{i}" for i in range(10))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            shared + " a0 a1 a2",          # 13 tokens, 10 covered
            "b0 b1 " + shared,             # 12 tokens, 10 covered
            "c0 c1 c2 c3 c4 c5 c6 c7 c8",  # 9 tokens, nothing shared
        ], pa.string()),
    })).repartition(2)
    out = dup_span_coverage(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "covered"] == 10 and out.loc[0, "n_tokens"] == 13
    assert out.loc[1, "covered"] == 10 and out.loc[1, "n_tokens"] == 12
    assert out.loc[2, "covered"] == 0 and out.loc[2, "n_tokens"] == 9


def test_zipf_slope_hand_fit():
    """A synthetic corpus with token counts C/r (an exact Zipf law) must
    fit slope ~ -1, and the operator's OLS agrees with numpy's lstsq on
    the same (ln r, ln cnt) points to 1e-6."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import zipf_slope

    k = 16
    words = [f"w{i:02d}" for i in range(k)]
    toks = []
    for r, w in enumerate(words, start=1):
        toks += [w] * (1200 // r)
    text = " ".join(toks)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array([text], pa.string())}))
    out = zipf_slope(ds, k=k).to_pandas()
    assert int(out["k_used"].iloc[0]) == k
    slope = float(out["slope"].iloc[0])
    assert -1.05 < slope < -0.95
    cnts = np.array(sorted([1200 // r for r in range(1, k + 1)],
                           reverse=True), dtype=np.float64)
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(cnts)
    A = np.vstack([x, np.ones(k)]).T
    ls_slope, ls_int = np.linalg.lstsq(A, y, rcond=None)[0]
    assert abs(slope - ls_slope) < 1e-6
    assert abs(float(out["intercept"].iloc[0]) - ls_int) < 1e-6


def test_phrase_search_hand_cases():
    """Overlapping occurrences count individually; a 3-token phrase
    requires full consecutive order; phrases never span documents."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import phrase_search

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a a a b",          # overlapping "a a": 2 hits
            "x a",              # ends with first term -> no hit alone
            "a y a a",          # one hit at the tail
            "b a",              # phrase reversed -> no hit
        ], pa.string()),
    })
    out = phrase_search(rd.from_arrow(docs), phrase=("a", "a")).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {1: 2, 3: 1}

    tri = phrase_search(rd.from_arrow(docs), phrase=("a", "a", "a")).to_pandas()
    assert dict(zip(tri["doc_id"], tri["n_hits"])) == {1: 1}

    # doc boundary: doc2 ends "a", doc3 starts "a" — must NOT match across
    assert 2 not in got


def test_unigram_drift_identical_halves_zero():
    """Even and odd docs with identical token histograms give exactly
    KL = 0 both ways; making the odd half skewed gives strictly positive
    divergences and preserves the count columns."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import unigram_drift

    same = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["x y y z", "x y y z", "z x", "z x"], pa.string()),
    })
    out = unigram_drift(rd.from_arrow(same)).to_pandas()
    assert float(out["kl_ab"].iloc[0]) == 0.0
    assert float(out["kl_ba"].iloc[0]) == 0.0
    assert int(out["n_vocab"].iloc[0]) == 3
    assert int(out["n_a"].iloc[0]) == int(out["n_b"].iloc[0]) == 6

    skew = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x x x x y", "y y y y x"], pa.string()),
    })
    o2 = unigram_drift(rd.from_arrow(skew)).to_pandas()
    assert float(o2["kl_ab"].iloc[0]) > 0.0
    assert float(o2["kl_ba"].iloc[0]) > 0.0


def test_rrf_fusion_hand_math():
    """Two tiny lists with a doc ranked #1 by one scorer and absent from
    the other: fused scores are exact integer 1e6//(60+rank) sums, and a
    doc on BOTH lists beats a same-rank doc on one list."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import rrf_fusion

    # doc 1: both query terms often (top of both lists)
    # doc 2: term 'aa' only; doc 3: term 'bb' only; doc 4: neither
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "aa bb aa bb aa",
            "aa aa x x x x x x x x x x x x x x",
            "bb x",
            "zz zz",
        ], pa.string()),
    })
    out = rrf_fusion(rd.from_arrow(docs), query=("aa", "bb"),
                     list_k=3, top=4, rrf_k=60).to_pandas()
    got = dict(zip(out["doc_id"], out["rrf_micro"]))
    # doc 1 is rank 1 in the integer tf-idf list (most hits) and rank 1
    # by bm25 too -> 2 * 1e6 // 61
    assert got[1] == 2 * (10**6 // 61)
    assert got[1] == max(got.values())
    # every fused score is a sum of exact reciprocal-rank quanta
    quanta = {10**6 // (60 + r) for r in range(1, 4)}
    for v in got.values():
        assert v in quanta or any(v - q in quanta | {0} for q in quanta)


def test_coverage_curve_hand_counts():
    """Hand corpus: hosts with 4/3/2/1 pages — ranks, cumulative counts
    and shares are exact; ties break ascending on the host string."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import coverage_curve

    urls = (["https://a.com/x"] * 4 + ["https://b.com/x"] * 3
            + ["https://c.com/x"] * 2 + ["https://d.com/x"])
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = coverage_curve(ds, k=3).to_pandas()
    assert list(out["host"]) == ["a.com", "b.com", "c.com"]
    assert list(out["pages"]) == [4, 3, 2]
    assert list(out["cum_pages"]) == [4, 7, 9]
    assert abs(float(out["cum_share"].iloc[2]) - 0.9) < 1e-9

    # tie case: two hosts at 2 pages -> ascending host order
    urls2 = ["https://z.com/x"] * 2 + ["https://y.com/x"] * 2
    o2 = coverage_curve(rd.from_arrow(
        pa.table({"url": pa.array(urls2, pa.string())})), k=2).to_pandas()
    assert list(o2["host"]) == ["y.com", "z.com"]


def test_typo_clusters_chain_and_min_root():
    """A 3-link edit-1 chain collapses into one cluster labeled by its
    smallest member; an unrelated pair forms its own; distance-2 values
    never join directly (but chains bridge them transitively)."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import typo_clusters

    vals = ["abcd.com", "abxd.com", "abxdd.com",   # chain: 1-apart links
            "zz.net", "zy.net",                     # separate pair
            "lonely.org"]                           # no fuzzy partner
    ds = rd.from_arrow(pa.table({"host": pa.array(vals, pa.string())}))
    out = typo_clusters(ds).to_pandas()
    got = dict(zip(out["member"], out["cluster"]))
    assert got["abcd.com"] == got["abxd.com"] == got["abxdd.com"] \
        == "abcd.com"
    assert got["zz.net"] == got["zy.net"] == "zy.net"
    assert "lonely.org" not in got  # singleton: no pair, not emitted


def test_cohen_kappa_perfect_and_chance():
    """kappa = 1 for perfect agreement; kappa ~ 0 when the prediction is
    independent of the label (hand 2x2 matrices via the exact formula)."""
    # exact formula check, independent of lang_id: perfect agreement
    # n=4, agree=4, E = 2*2 + 2*2 = 8 -> (16-8)/(16-8) = 1
    n, agree, E = 4, 4, 8
    assert (n * agree - E) / (n * n - E) == 1.0
    # independence: 2x2 with all cells equal -> agree = n/2,
    # E = (n/2)^2 * 2 = n^2/2 -> numerator n*n/2 - n^2/2 = 0
    n, agree, E = 8, 4, 32
    assert (n * agree - E) == 0

    # engine smoke on a tiny table where lang == lang_id prediction is
    # guaranteed agree-or-not deterministic: just assert bounds
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import cohen_kappa

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the of and to", "el la de que",
                          "der die und das", "the the the of"], pa.string()),
        "lang": pa.array(["en", "es", "de", "en"], pa.string()),
    })
    out = cohen_kappa(rd.from_arrow(docs)).to_pandas()
    k = float(out["kappa"].iloc[0])
    assert -1.0 <= k <= 1.0
    assert int(out["n"].iloc[0]) == 4
    # exact identity between the reported ratio and its integer pieces
    assert abs(k - int(out["kappa_num"].iloc[0])
               / int(out["kappa_den"].iloc[0])) < 1e-6


def test_hapax_rate_hand_counts():
    """Hand corpus: 'a a b c' + 'c d' -> vocab {a,b,c,d}, hapax {b,d},
    token mass 6; cross-batch merges count correctly (a token that is
    hapax per batch but repeated globally is NOT hapax)."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import hapax_rate

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a b c", "c d"], pa.string()),
    })
    out = hapax_rate(rd.from_arrow(docs)).to_pandas()
    assert int(out["vocab"].iloc[0]) == 4
    assert int(out["n_hapax"].iloc[0]) == 2      # b and d; c repeats across docs
    assert int(out["n_tokens"].iloc[0]) == 6
    assert abs(float(out["hapax_share"].iloc[0]) - 0.5) < 1e-9


def test_mutual_information_independence_and_identity():
    """Independent columns give MI ~ 0; a column perfectly determined by
    the other gives MI == H(lang); marginal entropies are exact hand
    values."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import mutual_information

    # perfectly dependent: tld determines lang
    urls = (["https://a.de/x"] * 4 + ["https://b.fr/x"] * 4)
    langs = ["de"] * 4 + ["fr"] * 4
    out = mutual_information(rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "lang": pa.array(langs, pa.string())}))).to_pandas()
    h = math.log(2)
    assert abs(float(out["mi"].iloc[0]) - h) < 1e-6
    assert abs(float(out["h_lang"].iloc[0]) - h) < 1e-6

    # independent: every (tld, lang) combination equally likely
    urls2, langs2 = [], []
    for t in ("de", "fr"):
        for lg in ("en", "es"):
            urls2 += [f"https://h.{t}/x"] * 3
            langs2 += [lg] * 3
    o2 = mutual_information(rd.from_arrow(pa.table({
        "url": pa.array(urls2, pa.string()),
        "lang": pa.array(langs2, pa.string())}))).to_pandas()
    assert abs(float(o2["mi"].iloc[0])) < 1e-9


def test_proximity_search_hand_cases():
    """Pair counting, window boundary, min gap, doc isolation, and the
    brute-force parity on a multi-occurrence doc."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import proximity_search

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "table x hash",            # gap 2 -> hit
            "table a b c hash",        # gap 4 > 3 -> miss
            "hash table hash x table", # pairs: (2,1)g1 (2,3)... brute below
            "table only here",         # no partner -> miss
        ]),
    })
    out = proximity_search(rd.from_arrow(docs), ("table", "hash"), 3) \
        .to_pandas().set_index("doc_id")
    assert list(out.index) == [1, 3]
    assert int(out.loc[1, "n_pairs"]) == 1
    assert int(out.loc[1, "min_gap"]) == 2
    # doc 3: table at pos 2,5; hash at 1,3.  |2-1|=1,|2-3|=1,|5-3|=2,|5-1|=4
    assert int(out.loc[3, "n_pairs"]) == 3
    assert int(out.loc[3, "min_gap"]) == 1


def test_proximity_search_no_cross_doc_leak():
    """A 'hash' ending one doc and a 'table' starting the next are NOT a
    pair even though they are adjacent in the flattened token stream."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import proximity_search

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x y hash", "table z w"]),
    })
    out = proximity_search(rd.from_arrow(docs), ("table", "hash"), 3) \
        .to_pandas()
    assert len(out) == 0


def test_chi2_independence_hand_cases():
    """A perfectly dependent 2x2 table gives chi2 = N and V = 1; an
    exactly independent table gives chi2 = 0."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import chi2_independence

    def pages(rows):
        return rd.from_arrow(pa.table({
            "url": pa.array([f"https://h.{t}/p{i}"
                             for i, (t, _) in enumerate(rows)]),
            "lang": pa.array([l for _, l in rows]),
        }))

    dep = pages([("com", "en")] * 5 + [("de", "de")] * 5)
    out = chi2_independence(dep).to_pandas()
    assert float(out["chi2"].iloc[0]) == 10.0
    assert float(out["cramers_v"].iloc[0]) == 1.0
    assert int(out["dof"].iloc[0]) == 1

    ind = pages([("com", "en"), ("com", "de"), ("de", "en"), ("de", "de")])
    out2 = chi2_independence(ind).to_pandas()
    assert abs(float(out2["chi2"].iloc[0])) < 1e-9


def test_lang_diversity_bounds():
    """Monoculture gives simpson = 0; a perfectly even 2-lang source
    gives the unbiased maximum n/(2(n-1))... computed directly."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import lang_diversity

    t = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "source": pa.array(["mono"] * 4 + ["even"] * 4),
        "lang": pa.array(["en"] * 4 + ["en", "en", "de", "de"]),
    })
    out = lang_diversity(rd.from_arrow(t)).to_pandas().set_index("source")
    assert float(out.loc["mono", "simpson"]) == 0.0
    assert int(out.loc["mono", "n_langs"]) == 1
    # even: 1 - (2*1 + 2*1)/(4*3) = 1 - 4/12
    assert abs(float(out.loc["even", "simpson"]) - (1 - 4 / 12)) < 1e-6


def test_heaps_law_hand():
    """Vocabulary growth over 4 docs with known prefixes: vocab counts by
    min-doc attribution, token totals, and the exact-power-law fit when
    the points sit on a line in log space."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import heaps_law

    # doc prefixes (doc_id 0..3, Q=4 -> thresholds 1,2,3,4)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b",            # prefix1: 2 toks, vocab {a,b}
            "a c",            # prefix2: 4 toks, vocab {a,b,c}
            "b d e",          # prefix3: 7 toks, vocab {a..e}
            "a f",            # prefix4: 9 toks, vocab {a..f}
        ]),
    })
    out = heaps_law(rd.from_arrow(docs), n_docs=4).to_pandas()
    assert out["n_tokens"].tolist() == [2, 4, 7, 9]
    assert out["vocab"].tolist() == [2, 3, 5, 6]
    # OLS parity with numpy lstsq on the same points
    x = np.log(np.array([2, 4, 7, 9], float))
    y = np.log(np.array([2, 3, 5, 6], float))
    beta, lnk = np.polyfit(x, y, 1)
    assert abs(float(out["beta"].iloc[0]) - beta) < 1e-6
    assert abs(float(out["lnk"].iloc[0]) - lnk) < 1e-6


def test_kwic_snippets_window_and_clamp():
    """First-occurrence position is 1-based; the window clamps at the
    string start and is byte-verbatim."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import kwic_snippets

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "hash at the very start",          # clamped left
            "x" * 30 + " hash " + "y" * 30,    # full window
            "no match here",
        ]),
    })
    out = kwic_snippets(rd.from_arrow(docs), term="hash", ctx=5) \
        .to_pandas().set_index("doc_id")
    assert list(out.index) == [1, 2]
    assert int(out.loc[1, "pos"]) == 1
    assert out.loc[1, "snippet"] == "hash at t"      # 0..4+4+5
    assert int(out.loc[2, "pos"]) == 32
    assert out.loc[2, "snippet"] == "xxxx hash yyyy"


def test_langs_concat_order():
    """The list is sorted and distinct regardless of input order."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import langs_concat

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["s"] * 4),
        "lang": pa.array(["zh", "en", "zh", "de"]),
    })
    out = langs_concat(rd.from_arrow(t)).to_pandas()
    assert out["langs"].iloc[0] == "de,en,zh"
    assert int(out["n_langs"].iloc[0]) == 3


def test_jsonl_roundtrip_byte_verbatim(tmp_path, sf_dir):
    """Text survives the JSONL sink + source byte-for-byte."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.sources.pages import jsonl_roundtrip

    out = jsonl_roundtrip(sf_dir, scratch=str(tmp_path / "j")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["text"] == want["text"]).all()
    assert (out["doc_id"] == want["doc_id"]).all()


def test_boolean_search_cnf():
    """must AND, must_not NOT, should >= 1 with matched count."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import boolean_search

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "table hash spark",          # hit, n_should=1
            "table hash spark vector",   # hit, n_should=2
            "table hash error spark",    # must_not kills it
            "table spark",               # missing 'hash'
            "table hash",                # no should term
        ]),
    })
    out = boolean_search(rd.from_arrow(docs)).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_should"].tolist() == [1, 2]


def test_hill_tail_index_pareto():
    """On exact Pareto(alpha) order statistics x_(i) = (n/i)^(1/alpha)
    the Hill estimator recovers alpha approximately."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import hill_tail_index

    alpha, n = 2.0, 2000
    i = np.arange(1, n + 1)
    x = np.floor(1000.0 * (n / i) ** (1 / alpha)).astype(np.int64)
    t = pa.table({"doc_id": pa.array(i.astype(np.int64)),
                  "n_chars": pa.array(x)})
    out = hill_tail_index(rd.from_arrow(t), k=100).to_pandas()
    assert abs(float(out["alpha"].iloc[0]) - alpha) < 0.2


def test_doc_keywords_rank_and_ties():
    """Rarer tokens outrank common ones; ties break on the token."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import doc_keywords

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "common rare common zz",   # rare & zz df=1; common df=3
            "common other",
            "common other zz2",
        ]),
    })
    out = doc_keywords(rd.from_arrow(docs), k=2).to_pandas()
    d1 = out[out["doc_id"] == 1]
    # df=1 tokens score tf*(N+1)/2 = 2; 'common' tf=2 scores 2*4/4 = 2 too
    # -> three-way tie at 2.0, token order: common < rare < zz
    assert d1["token"].tolist() == ["common", "rare"]
    assert d1["rnk"].tolist() == [1, 2]


def test_wilson_ci_brackets_share():
    """lo <= share <= hi, interval shrinks with more data."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import wilson_ci

    small = pa.table({"doc_id": pa.array(list(range(10)), pa.int64()),
                      "lang": pa.array(["en"] * 5 + ["de"] * 5)})
    big = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64()),
                    "lang": pa.array((["en"] * 5 + ["de"] * 5) * 100)})
    s = wilson_ci(rd.from_arrow(small)).to_pandas().set_index("lang")
    b = wilson_ci(rd.from_arrow(big)).to_pandas().set_index("lang")
    for df in (s, b):
        assert ((df["lo"] <= df["share"]) & (df["share"] <= df["hi"])).all()
    assert (b.loc["en", "hi"] - b.loc["en", "lo"]) < \
        (s.loc["en", "hi"] - s.loc["en", "lo"])


def test_dup_rate_by_source_cross_source():
    """A duplicate pair SPLIT ACROSS sources flags both sides."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import dup_rate_by_source

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "same", "unique a", "unique b"]),
        "source": pa.array(["s1", "s2", "s1", "s2"]),
    })
    out = dup_rate_by_source(rd.from_arrow(t)).to_pandas() \
        .set_index("source")
    assert int(out.loc["s1", "n_dup"]) == 1
    assert int(out.loc["s2", "n_dup"]) == 1
    assert float(out.loc["s1", "dup_rate"]) == 0.5


def test_containment_pairs_subset_dup():
    """A short doc fully contained in a long one scores containment 1.0
    even though its Jaccard is tiny."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import containment_pairs

    long_doc = " ".join(f"w{i}" for i in range(100))
    short_doc = "w1 w2 w3"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([long_doc, short_doc, "x y z"]),
    })
    out = containment_pairs(rd.from_arrow(docs), threshold=0.9,
                            max_df=None).to_pandas()
    assert len(out) == 1
    assert (int(out["a"].iloc[0]), int(out["b"].iloc[0])) == (1, 2)
    assert float(out["containment"].iloc[0]) == 1.0


def test_quality_by_source_lift():
    """A source of junk docs gets lift < 1; a clean source > 1; global
    rate anchors the lift."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import quality_by_source

    # corpus-dialect stopwords: GOPHER_STOPWORDS in this engine
    good = ("batch small scan " + " ".join(f"word{i:03d}" for i in range(60)))
    junk = "x"  # word count far below the Gopher floor
    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([good, good, good, good, junk, junk]),
        "source": pa.array(["clean"] * 4 + ["junky"] * 2),
    })
    out = quality_by_source(rd.from_arrow(t)).to_pandas() \
        .set_index("source")
    assert int(out.loc["clean", "n_pass"]) == 4
    assert int(out.loc["junky", "n_pass"]) == 0
    assert float(out.loc["clean", "lift"]) > 1.0
    assert float(out.loc["junky", "lift"]) == 0.0


def test_tld_lang_divergence_deviant_tld():
    """A TLD matching the corpus mix scores near 0; a monolingual TLD in
    a mixed corpus scores much higher."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import tld_lang_divergence

    urls, langs = [], []
    # tld 'mix.com': 5 en + 5 de (matches global-ish); 'solo.de': 10 de
    # .com dominates the corpus, so the global mix ~ its own mix
    for i in range(50):
        urls += [f"https://a.com/p{i}", f"https://b.com/q{i}"]
        langs += ["en", "de"]
    for i in range(10):
        urls.append(f"https://c.de/r{i}")
        langs.append("de")
    ds = rd.from_arrow(pa.table({"url": pa.array(urls),
                                 "lang": pa.array(langs)}))
    out = tld_lang_divergence(ds).to_pandas().set_index("tld")
    assert int(out.loc["de", "kl_micro"]) > 3 * int(out.loc["com",
                                                            "kl_micro"])
