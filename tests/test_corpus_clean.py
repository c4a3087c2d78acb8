"""Boilerplate scrubbing, Gopher quality rules, near-dup clustering —
hand-built corpora with known answers (the sf-dir path is SQL-oracle-gated
via ``remove_boilerplate`` / ``gopher_quality`` / ``neardup_components``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cuda_gis_smoothing_ray.stages import textops
from cuda_gis_smoothing_ray.stages.cc import dedup_survivors


def _docs_ds(texts: list[str]):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


FOOTER = "subscribe to our newsletter for daily updates"  # 7 tokens


def test_remove_boilerplate_strips_shared_footer():
    texts = [
        f"unique alpha words one {FOOTER}",
        f"different beta content two {FOOTER}",
        f"third gamma thing three {FOOTER}",
        "totally unrelated document without footer",
    ]
    got = (
        textops.remove_boilerplate(_docs_ds(texts), n=5, min_df=2)
        .sort("doc_id")
        .to_pandas()
    )
    # the 7-token footer is covered by frequent 5-grams in docs 0-2
    assert list(got["clean_text"][:3]) == [
        "unique alpha words one",
        "different beta content two",
        "third gamma thing three",
    ]
    assert list(got["n_removed"][:3]) == [7, 7, 7]
    # the lone doc is untouched
    assert got["clean_text"][3] == texts[3]
    assert got["n_removed"][3] == 0


def test_remove_boilerplate_whole_doc_removed_and_empty():
    texts = ["a b c d e", "a b c d e", ""]
    got = (
        textops.remove_boilerplate(_docs_ds(texts), n=5, min_df=2)
        .sort("doc_id")
        .to_pandas()
    )
    assert list(got["clean_text"]) == ["", "", ""]
    assert list(got["n_removed"]) == [5, 5, 0]


def test_remove_boilerplate_min_df_not_reached():
    texts = ["one two three four five six", "seven eight nine ten eleven twelve"]
    got = (
        textops.remove_boilerplate(_docs_ds(texts), n=5, min_df=2)
        .sort("doc_id")
        .to_pandas()
    )
    assert list(got["clean_text"]) == texts
    assert list(got["n_removed"]) == [0, 0]


def test_gopher_quality_rules():
    # corpus-adapted stopword list: batch/small/scan/agg/data/customer/big/hash
    good = "batch data quick brown words jumps over scan rows again reach end " * 5
    short = "batch data scan"                 # stopwords ok, word count fails
    no_stops = "zebra xylophone quantum " * 30  # count ok, 0 stopword hits
    long_words = ("pneumonoultramicroscopic " * 60) + "batch data"  # mwl > 10
    got = (
        textops.gopher_quality(_docs_ds([good, short, no_stops, long_words]))
        .sort("doc_id")
        .to_pandas()
    )
    assert bool(got["passes"][0]) is True
    assert bool(got["passes"][1]) is False and got["word_count"][1] == 3
    assert bool(got["passes"][2]) is False and got["stop_hits"][2] == 0
    assert bool(got["passes"][3]) is False and got["mean_word_len"][3] > 10
    # stop_hits counts DISTINCT stopwords
    assert got["stop_hits"][1] == 3


def test_neardup_components_clusters_identical_docs():
    base = "the quick brown fox jumps over the lazy dog again and again padded "
    texts = [base * 4, base * 4, "completely different content here entirely " * 8]
    edges = textops.minhash_pairs(_docs_ds(texts), threshold=0.7)
    got = dedup_survivors(edges, _docs_ds(texts).select_columns(["doc_id"]))\
        .sort("doc_id").to_pandas()
    assert list(got["component"]) == [0, 0, 2]
    assert list(got["is_survivor"]) == [True, False, True]


def test_remove_boilerplate_frequent_gram_cap():
    import pytest

    texts = ["alpha beta gamma delta epsilon zeta"] * 40
    with pytest.raises(ValueError, match="frequent grams exceeds"):
        # every 5-gram is frequent; a cap of 1 must trip the guard
        textops.remove_boilerplate(
            _docs_ds(texts), n=5, min_df=2, max_freq_grams=1
        ).materialize()


def test_curate_corpus_composition():
    # stopword list is corpus-adapted: batch/small/scan/agg/data/customer/big/hash
    good = ("batch data words flow nicely through scan stages again " * 25).strip()
    dup = good
    no_stops = ("zebra quantum xylophone wobble " * 60).strip()
    got = (
        textops.curate_corpus(_docs_ds([good, dup, no_stops]), n=5, min_df=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc1 deduped away (identical to doc0); doc2 fails the stopword rule;
    # doc0 survives — wc >= 200 makes the resample rate 100%
    assert list(got["doc_id"]) == [0]
    assert got["word_count"][0] > 0
    # df is counted over SURVIVORS (distinct docs), so neither the removed
    # duplicate nor within-doc repetition marks any gram frequent — the
    # surviving text passes through unscrubbed
    assert got["clean_text"][0] == good


def test_bigram_pmi_hand_math():
    import numpy as np

    # one doc "x y x y": unigrams x=2 y=2, bigrams xy=2 yx=1, N=4
    got = (
        textops.bigram_pmi(_docs_ds(["x y x y"]), min_pair=1)
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    )
    assert list(got["w1"]) == ["x", "y"] and list(got["w2"]) == ["y", "x"]
    assert list(got["pair_count"]) == [2, 1]
    np.testing.assert_allclose(got["pmi"][0], np.log(2 * 4 / (2 * 2)), atol=1e-12)
    np.testing.assert_allclose(got["pmi"][1], np.log(1 * 4 / (2 * 2)), atol=1e-12)


def test_ab_lift_hand_math():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import ab_lift

    # users 0..9; conversion = purchase with value > 150
    uid = np.arange(10, dtype=np.int64)
    ev = pa.table(
        {
            "event_id": pa.array(uid),
            "ts": pa.array(np.zeros(10, dtype="datetime64[us]")),
            "user_id": pa.array(uid),
            "event_type": pa.array(["purchase"] * 5 + ["view"] * 5),
            "value": pa.array([200.0] * 5 + [0.0] * 5),
        }
    )
    got = ab_lift(rd.from_arrow(ev)).to_pandas()
    # arm assignment is the deterministic hash; totals must partition 10 users
    assert got["n_a"][0] + got["n_b"][0] == 10
    assert got["conv_a"][0] + got["conv_b"][0] == 5
    # recompute z from the table's own counts
    na, nb = int(got["n_a"][0]), int(got["n_b"][0])
    ca, cb = int(got["conv_a"][0]), int(got["conv_b"][0])
    pool = (ca + cb) / (na + nb)
    se = np.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    np.testing.assert_allclose(got["z_score"][0], (cb / nb - ca / na) / se, atol=1e-9)


def test_null_text_tolerated_by_ngram_family():
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["alpha beta gamma delta epsilon", None, ""], pa.string()),
            }
        )
    )
    got = textops.remove_boilerplate(ds, n=5, min_df=2).sort("doc_id").to_pandas()
    assert list(got["clean_text"]) == ["alpha beta gamma delta epsilon", "", ""]
    pmi = textops.bigram_pmi(ds, min_pair=1).to_pandas()
    assert len(pmi) == 4  # the 4 consecutive pairs of doc 0
