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
