"""Text-analysis + deduplication stages over the ``documents`` table — the
training-data-pipeline operator family (language ID, quality scoring, token
counting, fingerprinting; exact / MinHash-LSH / SimHash / n-gram-Jaccard
dedup).

Scale shape:

* per-doc stats are stateless whole-block ``map_batches`` (4 RE2 scans per
  block, no Python-per-row work except the md5 fingerprint);
* exact dedup shuffles ONLY ``(hash, doc_id)`` pairs (never text) and
  reduces with ``Min``;
* the similarity joins (Jaccard / MinHash / SimHash) are inverted-index
  shuffles: emit (key, doc) postings per batch, group by key, emit candidate
  pairs per group, reduce per pair.  Every stage's shuffle key is bounded
  (token / band / simhash-band), and per-doc set sizes ride along with the
  postings so the final reduce needs NO broadcast side table.

The reference engine has none of these (SURVEY §2.6: its only dedup is the
ring-2 ``std::set`` insert, ``hex_smooth_cuda_v5.cu:429-456``); they are the
north-rule's web-corpus additions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing, textstats
from ..functions.scale import default_parts


_PACK_LIMIT = np.int64(1) << np.int64(31)


def _check_pack_ids(ids: np.ndarray) -> None:
    """Packed-pair shuffle keys hold two ids in one int64 (``a<<31 | b``),
    so every doc id must be < 2^31.  At 10^12-doc scale the caller must
    re-id per shard before the pair stage; this guard turns silent key-space
    corruption into a descriptive error."""
    if len(ids) and ids.max() >= _PACK_LIMIT:
        raise ValueError(
            f"doc_id {int(ids.max())} >= 2^31: packed-pair keys require "
            "shard-local ids < 2^31 — re-id per shard before the pair stage"
        )


def read_documents(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# per-doc text analysis
# ---------------------------------------------------------------------------

def text_stats(ds):
    """documents -> (doc_id, n_chars, n_tokens, n_bpe_tokens, punct_ratio,
    stopword_ratio, mean_token_chars, quality_score, fingerprint)."""

    def f(batch: pa.Table) -> pa.Table:
        stats = textstats.text_stats(batch.column("text"))
        cols = {"doc_id": batch.column("doc_id")}
        cols.update({k: pa.array(v) for k, v in stats.items()})
        cols["fingerprint"] = pa.array(textstats.md5_hex(batch.column("text")))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def readability(ds):
    """documents -> (doc_id, n_tokens, n_sentences, n_vowel_runs, flesch):
    Flesch reading-ease PROXY per document — the classic readability
    quality-filter signal, with dependency-free syllable counting (RE2
    vowel-run count, the standard hyphenation-free approximation) and
    sentence count = sentence-terminator runs ("..." ends ONE sentence).
    ``206.835 - 1.015*(words/sentences) - 84.6*(vowel_runs/words)``,
    zero-count denominators clamped to 1, round6-quantized.  RE2 counts on
    both engines so the oracle agrees by construction; embarrassingly
    parallel — no shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column("text"), "")
        nt = textstats.count_re(t, textstats.TOKEN_RE)
        ns = textstats.count_re(t, textstats.SENTENCE_RE)
        nv = textstats.count_re(t, textstats.VOWEL_RUN_RE)
        w = np.maximum(nt, 1).astype(np.float64)
        s = np.maximum(ns, 1).astype(np.float64)
        fl = (textstats.FLESCH_BASE - textstats.FLESCH_WPS * (w / s)
              - textstats.FLESCH_SPW * (nv.astype(np.float64) / w))
        fl = np.floor(fl * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(nt),
            "n_sentences": pa.array(ns),
            "n_vowel_runs": pa.array(nv),
            "flesch": pa.array(fl),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def lang_id_eval(ds):
    """documents -> per-class (lang, n_true, n_pred, tp, prec, rec, f1):
    the CLASSIFIER-EVAL readout of the marker-token language-ID heuristic
    against the table's gold labels — the QA table a pipeline owner reads
    before trusting a filter stage.  Classes = union of gold and predicted
    labels, sorted.  Exact integer confusion counts (batch-local partials
    into ONE bounded <= |labels|^2-key reduce — the label vocabulary is an
    operator constant, so the finish is driver-side exact math, the
    bounded-finish discipline); each metric is ONE round6 float division
    of exact ints (f1 = 2*tp / (n_pred + n_true), zero denominators
    clamped to 1)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "pred": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "pred": textstats.lang_id(batch.column("text")),
        })
        g = df.groupby(["lang", "pred"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["lang", "pred"]).aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    classes = sorted(set(conf["lang"]) | set(conf["pred"]))
    by_true = conf.groupby("lang")["c"].sum()
    by_pred = conf.groupby("pred")["c"].sum()
    diag = conf[conf["lang"] == conf["pred"]].set_index("lang")["c"]
    n_true = np.array([int(by_true.get(k, 0)) for k in classes], np.int64)
    n_pred = np.array([int(by_pred.get(k, 0)) for k in classes], np.int64)
    tp = np.array([int(diag.get(k, 0)) for k in classes], np.int64)

    def r6(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        x = num.astype(np.float64) / np.maximum(den, 1).astype(np.float64)
        return np.floor(x * 1e6 + 0.5) / 1e6

    return pd.DataFrame({
        "lang": classes, "n_true": n_true, "n_pred": n_pred, "tp": tp,
        "prec": r6(tp, n_pred), "rec": r6(tp, n_true),
        "f1": r6(2 * tp, n_pred + n_true),
    })


def length_psi_by_source(ds, n_bins: int = 10):
    """documents -> (source, n_docs, psi_nano): Population Stability Index
    of each source's doc-length (``n_chars``) distribution against the
    GLOBAL length distribution, over exact global decile bins — the
    standard drift gauge (PSI < 0.1 stable / > 0.25 shifted) a pipeline
    owner reads per feed.  Integer nano-nat output via the once-quantized
    per-bin term discipline.

    Exactness: decile thresholds are EXACT order statistics from the
    bounded (value, count) length histogram (t_k = min value whose
    cumulative count >= ceil(k*n/bins)); ``bin = #(thresholds < value)``
    so threshold-valued docs land in the lower bin on both engines; add-1
    smoothing on both numerators (a zero bin otherwise makes PSI
    undefined), denominators n+bins.  Per-bin terms
    ``(p_s - p_g) * ln(p_s/p_g)`` are >= 0 and quantized once.

    Scale shape: ONE bounded (value, count) histogram reduce (distinct
    doc lengths — bounded by max doc bytes, not corpus size), thresholds
    broadcast into a second streaming scan emitting (source, bin)
    partials, ONE bounded |S| x bins reduce, driver-side exact finish."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "c": pa.array(c.astype(np.int64))})

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if h.empty:
        raise ValueError("length_psi_by_source: empty input")
    h = h.sort_values("v")
    vals = h["v"].to_numpy(np.int64)
    cc = np.cumsum(h["c"].to_numpy(np.int64))
    n = int(cc[-1])
    thr = np.array(
        [vals[np.searchsorted(cc, (k * n + n_bins - 1) // n_bins, "left")]
         for k in range(1, n_bins)], np.int64)

    def binned(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "bin": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        v = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = np.searchsorted(thr, v, side="left")  # = #(thresholds < v)
        df = pd.DataFrame({
            "source": batch.column("source").to_pandas(), "bin": b})
        g = df.groupby(["source", "bin"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    sb = (
        ds.map_batches(binned, batch_format="pyarrow")
        .groupby(["source", "bin"]).aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    sources = sorted(sb["source"].unique())
    C = np.zeros((len(sources), n_bins), np.int64)
    si = sb["source"].map({k: i for i, k in enumerate(sources)}).to_numpy()
    C[si, sb["bin"].to_numpy(np.int64)] = sb["c"].to_numpy(np.int64)
    ns = C.sum(axis=1)
    g = C.sum(axis=0)
    pg = (g + 1).astype(np.float64) / np.float64(n + n_bins)
    psi = np.zeros(len(sources), np.int64)
    for i in range(len(sources)):
        ps = (C[i] + 1).astype(np.float64) / np.float64(int(ns[i]) + n_bins)
        term = (ps - pg) * np.log(ps / pg)
        psi[i] = np.floor(term * 1e9 + 0.5).astype(np.int64).sum()
    return pd.DataFrame({"source": sources, "n_docs": ns,
                         "psi_nano": psi})


def lang_source_chi2(ds):
    """documents -> ONE row (n_docs, n_langs, n_sources, dof, chi2_nano):
    Pearson chi-squared INDEPENDENCE test of language x source — is the
    language mix homogeneous across feeds, the stratification check a
    mixture designer runs before pooling sources.  Zero cells of the full
    L x S grid contribute their expected count (the textbook definition).

    Float discipline: each cell term ``(o - e)^2 / e`` (``e = rt*ct/n``
    from exact int64 marginals) is quantized ONCE to nano-units, so the
    total is an order-free int64 sum.  Scale shape: batch-local (lang,
    source) partials into ONE bounded <= |L|x|S|-key reduce; the finish is
    driver-side exact math over the operator-constant label grid (the
    bounded-finish discipline)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "source": batch.column("source").to_pandas(),
        })
        g = df.groupby(["lang", "source"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["lang", "source"]).aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if conf.empty:
        raise ValueError("lang_source_chi2: empty input")
    langs = sorted(conf["lang"].unique())
    srcs = sorted(conf["source"].unique())
    O = np.zeros((len(langs), len(srcs)), np.int64)
    li = conf["lang"].map({k: i for i, k in enumerate(langs)}).to_numpy()
    si = conf["source"].map({k: i for i, k in enumerate(srcs)}).to_numpy()
    O[li, si] = conf["c"].to_numpy(np.int64)
    n = int(O.sum())
    rt, ct = O.sum(axis=1), O.sum(axis=0)
    # float-first marginal product (not int64*int64 -> cast): rt*ct
    # overflows int64 past ~3e9 docs per side; both engines multiply
    # doubles so the expression trees stay identical
    e = (rt.astype(np.float64)[:, None] * ct.astype(np.float64)[None, :]) \
        / np.float64(n)
    d = O.astype(np.float64) - e
    term = (d * d) / e
    chi2_nano = int(np.floor(term * 1e9 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_docs": [n], "n_langs": [len(langs)], "n_sources": [len(srcs)],
        "dof": [(len(langs) - 1) * (len(srcs) - 1)],
        "chi2_nano": [chi2_nano],
    })


def gopher_repetition(ds):
    """documents -> (doc_id, n_chars, top2_char_frac, top3_char_frac,
    dup5_frac): the REPETITION side of the Gopher rule family (Rae et al.
    2021 §A1.1) that :func:`gopher_quality` doesn't cover — per document,
    the character fraction covered by the single most frequent 2-gram and
    3-gram (``count * gram_chars / n_chars``; ties broken count-desc then
    gram-asc so both engines pick the same gram) and the duplicate 5-gram
    fraction (``(occurrences - distinct) / occurrences``).  Exact integer
    ratios quantized round6 once; docs with fewer than n tokens score 0.
    Pure map over the shared :func:`_doc_ngrams` tokenization — no shuffle,
    quality filtering streams at 100 TB."""
    import pandas as pd

    def topfrac(batch: pa.Table, n: int, doc: np.ndarray,
                nchars: np.ndarray) -> np.ndarray:
        di, grams = _doc_ngrams(batch, n)
        if len(di) == 0:
            return np.zeros(len(doc), np.float64)
        df = pd.DataFrame({"doc": di, "gram": grams.to_pandas()})
        g = df.groupby(["doc", "gram"], sort=False).size().reset_index(name="c")
        g = g.sort_values(["doc", "c", "gram"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.drop_duplicates("doc", keep="first")
        cover = pd.Series(
            (top["c"] * top["gram"].str.len()).to_numpy(np.int64),
            index=top["doc"].to_numpy())
        cov = pd.Series(doc).map(cover).fillna(0).to_numpy(np.int64)
        frac = cov.astype(np.float64) / np.maximum(nchars, 1).astype(np.float64)
        return np.floor(frac * 1e6 + 0.5) / 1e6

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        doc = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nchars = pc_.utf8_length(
            pc_.fill_null(batch.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        di5, _g5 = _doc_ngrams(batch, 5)
        if len(di5):
            df5 = pd.DataFrame({"doc": di5, "gram": _g5.to_pandas()})
            per = df5.groupby("doc").agg(
                tot=("gram", "size"), dis=("gram", "nunique"))
            dup = pd.Series(doc).map(
                (per["tot"] - per["dis"]).astype(np.float64)
                / per["tot"].astype(np.float64)).fillna(0.0) \
                .to_numpy(np.float64)
        else:
            dup = np.zeros(len(doc), np.float64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(nchars),
            "top2_char_frac": pa.array(topfrac(batch, 2, doc, nchars)),
            "top3_char_frac": pa.array(topfrac(batch, 3, doc, nchars)),
            "dup5_frac": pa.array(np.floor(dup * 1e6 + 0.5) / 1e6),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def lang_id(ds):
    """documents -> (doc_id, lang, pred_lang) via the marker-token heuristic."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "pred_lang": pa.array(textstats.lang_id(batch.column("text"))),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup: hash-partition + per-group min  (SURVEY §2.6 O3 general form)
# ---------------------------------------------------------------------------

def exact_dedup(ds):
    """documents -> one survivor row (text_md5, doc_id=min id) per distinct
    text.  Only (hash, id) pairs enter the shuffle."""
    from ray.data.aggregate import Min

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_md5": pa.array(textstats.md5_hex(batch.column("text"))),
                "doc_id": batch.column("doc_id"),
            }
        )

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def incremental_dedup(new_ds, prior_ds):
    """INCREMENTAL crawl dedup: keep rows of ``new_ds`` whose text md5 does
    not appear in ``prior_ds`` (the previous snapshot's corpus) — the
    delta-processing shape every recurring crawl runs: dedup the new
    increment against what's already ingested, never re-deduping the
    whole history.

    Both sides reduce to fingerprints before anything shuffles: the prior
    side ships DISTINCT md5s only, the anti-membership resolves per hash
    partition via :func:`..stages.join.hash_semi_join` (no broadcast — the
    prior corpus is the BIG side at 10^12 docs).  -> surviving new rows +
    ``text_md5``."""
    from .join import hash_semi_join

    def fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "text_md5", pa.array(textstats.md5_hex(batch.column("text")))
        )

    def prior_fp(batch: pa.Table) -> pa.Table:
        md5 = np.unique(textstats.md5_hex(batch.column("text")))
        return pa.table({"text_md5": pa.array(md5)})

    new_fp = new_ds.map_batches(fp, batch_format="pyarrow")
    prior = prior_ds.map_batches(prior_fp, batch_format="pyarrow")
    return hash_semi_join(new_fp, prior, left_key="text_md5", anti=True)


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard similarity join via inverted index
# ---------------------------------------------------------------------------

JACCARD_MAX_DF = 256  # default document-frequency cap (see jaccard_pairs)


def _segment_pairs(seg_start: np.ndarray,
                   seg_len: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j), vectorized: one
    ``np.triu_indices`` per DISTINCT segment length (<= max_df distinct
    values) broadcast across every segment of that length — no per-segment
    Python.  Returns global (ia, ib) index arrays into the sorted posting
    arrays; segment members are doc-id-ascending, so ia's doc < ib's doc."""
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    for k in np.unique(seg_len):
        if k < 2:
            continue
        starts = seg_start[seg_len == k]
        iu, ju = np.triu_indices(int(k), k=1)
        out_i.append((starts[:, None] + iu[None, :]).ravel())
        out_j.append((starts[:, None] + ju[None, :]).ravel())
    if not out_i:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(out_i), np.concatenate(out_j)


def _token_pair_candidates(posted, max_df: int | None, size_filter):
    """Shared candidate stage for the inverted-index similarity joins:
    postings (token, doc_id, set_size) -> (pk, na, nb) candidate rows.

    ONE coarse token-hash shuffle (``default_parts()`` partitions) with a
    vectorized per-partition solve — factorize tokens, lexsort by (token,
    doc), :func:`_segment_pairs` over the segment table — instead of
    ``groupby(token).map_groups`` paying Python dispatch per DISTINCT
    token (measured: the whole-vocab dispatch made jaccard_pairs 52 s /
    containment_pairs 75 s at 500 docs; this plan is ~3 s).  Tokens are
    grouped inside the partition by STRING (factorize), so 64-bit token-
    hash collisions cannot merge postings; ``size_filter(na, nb) -> keep``
    prunes per-metric (Jaccard's min/max bound; containment has none)."""
    import pandas as pd

    from ..functions import hashing
    from ..functions.scale import default_parts

    n_parts = default_parts()

    def add_tpart(batch: pa.Table) -> pa.Table:
        th = hashing.poly_hash64(batch.column("token")).view(np.int64)
        return batch.append_column(
            "tpart", pa.array(hashing.coarse_partition(th, n_parts)))

    def pairs_part(df: pd.DataFrame) -> dict:
        codes, _ = pd.factorize(df["token"], sort=False)
        ids = df["doc_id"].to_numpy(np.int64)
        sizes = df["set_size"].to_numpy(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids, sizes = codes[order], ids[order], sizes[order]
        seg_start = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        seg_len = np.diff(np.r_[seg_start, len(codes)])
        if max_df is not None:
            keep = seg_len <= max_df
            seg_start, seg_len = seg_start[keep], seg_len[keep]
        ia, ib = _segment_pairs(seg_start, seg_len)
        _check_pack_ids(ids)
        na = sizes[ia]
        nb = sizes[ib]
        if size_filter is not None:
            ok = size_filter(na, nb)
            ia, ib, na, nb = ia[ok], ib[ok], na[ok], nb[ok]
        return {
            "pk": (ids[ia] << np.int64(31)) | ids[ib],
            "na": na,
            "nb": nb,
        }

    return (
        posted.map_batches(add_tpart, batch_format="pyarrow",
                           batch_size=None)
        .groupby("tpart")
        .map_groups(pairs_part)
    )


def jaccard_pairs(ds, threshold: float = 0.8, max_df: int | None = JACCARD_MAX_DF):
    """documents -> (a, b, jaccard) pairs with word-set Jaccard >= threshold.

    Inverted-index plan: distinct (token, doc, set_size) postings -> one
    coarse token-hash shuffle with a vectorized per-partition candidate
    solve (:func:`_token_pair_candidates`: a<b pairs per token segment,
    sizes attached) -> packed-key pair reduce -> shared = pair count,
    jaccard = shared/(na+nb-shared).

    ``max_df`` drops tokens whose document frequency exceeds it: a
    stopword-grade token otherwise fans out quadratically inside ONE
    ``map_groups`` group (df=1M -> 5e11 candidate pairs from a single key),
    which is the classic prefix-filtering scale-killer.  The DEFAULT is the
    bounded path (df <= 256 -> <= 32,640 pairs per token) — candidate recall
    only drops for pairs whose every shared token is ultra-common, which sit
    far below any useful threshold.  Pass ``max_df=None`` for exact
    all-pairs semantics (what the sf0.01 SQL oracle checks).
    """
    EMPTY_POSTINGS = pa.schema(
        [("token", pa.string()), ("doc_id", pa.int64()), ("set_size", pa.int64())]
    )

    def postings(batch: pa.Table) -> pa.Table:
        # Arrow-native distinct-(doc, token) extraction: split -> flatten ->
        # dictionary-encode -> one np.unique over packed (row, code) int64
        # keys.  No per-row Python; cost is O(tokens log tokens) in C.
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_id) == 0:
            return EMPTY_POSTINGS.empty_table()
        split = pc.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return EMPTY_POSTINGS.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = row_idx * (codes.max() + 1) + codes
        _, uidx = np.unique(packed, return_index=True)
        u_row, u_code = row_idx[uidx], codes[uidx]
        set_size = np.bincount(u_row, minlength=len(doc_id)).astype(np.int64)
        return pa.table(
            {
                "token": dic.dictionary.take(pa.array(u_code)),
                "doc_id": pa.array(doc_id[u_row]),
                "set_size": pa.array(set_size[u_row]),
            }
        )

    def size_filter(na: np.ndarray, nb: np.ndarray) -> np.ndarray:
        # size filter (exact): J <= min/max because shared <= min and
        # union >= max; the bound is computed with the SAME float division
        # the final reduce applies at shared == min, so no qualifying pair
        # is ever dropped.  Kills the small-vs-huge candidate tail before
        # it shuffles.
        lo = np.minimum(na, nb).astype(np.float64)
        hi = np.maximum(na, nb).astype(np.float64)
        return lo / hi >= threshold

    N_PARTS = default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        # coarse hash-partition key: Ray's groupby().aggregate() pays Python
        # per DISTINCT key (124k pair keys -> ~47 s measured); default_parts()
        # coarse partitions + a vectorized per-partition reduce does the same
        # shuffle work in milliseconds
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(hashing.coarse_partition(pk, N_PARTS)))

    def reduce_part(df):
        pk = df["pk"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        na = df["na"].to_numpy()[order].astype(np.float64)
        nb = df["nb"].to_numpy()[order].astype(np.float64)
        uniq, first_idx, cnt = np.unique(pk, return_index=True, return_counts=True)
        sh = cnt.astype(np.float64)
        j = sh / (na[first_idx] + nb[first_idx] - sh)
        keep = j >= threshold
        return {
            "a": (uniq[keep] >> np.int64(31)).astype(np.int64),
            "b": (uniq[keep] & np.int64((1 << 31) - 1)).astype(np.int64),
            "jaccard": np.floor(j[keep] * 1e6 + 0.5) / 1e6,
        }

    posted = ds.map_batches(postings, batch_format="pyarrow")
    pairs = _token_pair_candidates(posted, max_df, size_filter)
    return (
        pairs.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(reduce_part)
    )


# ---------------------------------------------------------------------------
# shared high-cardinality pair-dedup helpers: Ray's groupby().aggregate()
# pays Python per distinct key, so pair streams are reduced with a coarse
# hash partition + one vectorized np.unique per partition instead
# ---------------------------------------------------------------------------

def _dedupe_packed_pairs(val_col: str):
    # cluster-sized at factory (= pipeline build) time
    n_parts = default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(hashing.coarse_partition(pk, n_parts)))

    return add_part


def _reduce_packed_pairs(val_col: str):
    def reduce_part(df):
        pk = df["pk"].to_numpy()
        val = df[val_col].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk, val = pk[order], val[order]
        uniq, first_idx = np.unique(pk, return_index=True)
        return {
            "a": (uniq >> np.int64(31)).astype(np.int64),
            "b": (uniq & np.int64((1 << 31) - 1)).astype(np.int64),
            val_col: val[first_idx],
        }

    return reduce_part


def doc_fingerprints(ds, k: int = 8, window: int = 6):
    """documents -> (doc_id, fp): winnowing fingerprints (Schleimer et al.
    2003, SIGMOD) — distinct sliding-window minima of the k-char shingle
    rolling hashes; the document-fingerprinting primitive for plagiarism /
    near-dup detection.  fp is the hash reinterpreted as signed int64 so the
    DuckDB oracle compares exactly (HUGEINT -> float64 loses > 2^53).

    Stateless map: the rolling hash + window-min per doc is vectorized
    numpy; no shuffle at all (fingerprints stay with their doc rows)."""
    def f(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        out_d, out_f = [], []
        for i, t in enumerate(texts):
            fp = hashing.winnow_fingerprints(t, k, window)
            out_d.append(np.full(len(fp), doc[i], dtype=np.int64))
            out_f.append(fp.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64)
                ),
                "fp": pa.array(
                    np.concatenate(out_f) if out_f else np.empty(0, np.int64)
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate candidate pairs
# ---------------------------------------------------------------------------

_MINHASHERS: dict = {}


def _hasher(num_perms: int, shingle_k: int, bands: int) -> hashing.MinHasher:
    key = (num_perms, shingle_k, bands)
    h = _MINHASHERS.get(key)
    if h is None:
        h = _MINHASHERS[key] = hashing.MinHasher(num_perms, shingle_k, bands)
    return h


def minhash_pairs(ds, threshold: float = 0.7, num_perms: int = 64,
                  shingle_k: int = 5, bands: int = 16,
                  n_parts: int | None = None,
                  max_bucket: int = 4096):
    """documents -> (a, b, est_jaccard) near-dup candidates.

    Shuffle-lean plan (round 2; the round-1 plan shipped the full signature
    x bands — ~8 KB/doc — through the bucket shuffle):

    1. **band rows**: (bucket, doc_id) only — 16 bytes x bands per doc;
    2. **bucket groupby** -> candidate pairs, packed to one int64 key and
       deduplicated across buckets with the coarse-hash-partition reduce;
    3. **signature verify** via two hash-partition sort-merge joins: pair
       rows keyed by a then by b pick up the signatures; est_jaccard is the
       per-perm equality fraction over the two signature matrices,
       vectorized per partition.

    Signatures are computed twice (band pass + verify pass) on purpose: 2x
    the cached-hasher CPU instead of materializing the signature matrix or
    shuffling it with every band row.  Output is identical to a
    carry-the-signature plan (est comes from the full signature either
    way); the tiny-parameter variant is SQL-oracle-checked bit-for-bit.

    ``max_bucket`` caps the per-bucket pair fan-out: an LSH bucket holding a
    boilerplate cluster of near-identical docs is inherently quadratic, so a
    bucket with more than ``max_bucket`` members is truncated
    DETERMINISTICALLY to its lowest doc_ids.  A true near-dup clique loses
    no recall in practice — every kept member still pairs with every other
    kept member, and dedup downstream needs the component, not all O(n^2)
    edges.  Pass ``None`` for exact semantics (the SQL-oracle queries at
    sf0.01 never approach the cap, so the default stays oracle-exact
    there).  Doc ids must be < 2^31 for the packed-pair key; use
    shard-local ids at 10^12-doc scale.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    mask31 = np.int64((1 << 31) - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        mh = _hasher(num_perms, shingle_k, bands)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        _check_pack_ids(doc)  # ids < 2^31: int32 band rows are lossless
        # Arrow column goes straight into the batched hasher (zero-copy
        # offsets/data buffers; no to_pylist round-trip)
        keys = mh.band_keys(mh.signatures(batch.column("text")))  # (n, bands) int64
        bucket = keys.ravel()
        # doc_id/__part as int32: the band shuffle is THE volume shuffle of
        # this operator (16 rows/doc) — 16 B/row instead of 24 B is a third
        # less sort spill at the 100 M-page scale the memstress drives
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "doc_id": pa.array(np.repeat(doc.astype(np.int32), bands)),
                "__part": pa.array(hashing.coarse_partition(bucket, n_parts)
                                   .astype(np.int32)),
            }
        )

    def bucket_solve(part_df) -> dict:
        # ONE coarse bucket-hash partition solves ALL its buckets
        # vectorized (the _token_pair_candidates discipline) instead of
        # groupby(bucket).map_groups paying dispatch per distinct bucket:
        # lexsort by (bucket, doc), dedupe, per-segment truncation to the
        # lowest max_bucket ids, _segment_pairs triu — bit-identical pk
        # stream to the per-bucket np.unique + triu_indices form
        b = part_df["bucket"].to_numpy(np.int64)
        d = part_df["doc_id"].to_numpy(np.int64)
        if len(b) == 0:
            return {"pk": np.empty(0, np.int64)}
        order = np.lexsort((d, b))
        b, d = b[order], d[order]
        keep = np.ones(len(b), bool)
        keep[1:] = (b[1:] != b[:-1]) | (d[1:] != d[:-1])
        b, d = b[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, len(b)])
        if max_bucket is not None and (lens > max_bucket).any():
            rank = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
            trunc = rank < max_bucket  # sorted ids: lowest survive
            b, d = b[trunc], d[trunc]
            starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
            lens = np.diff(np.r_[starts, len(b)])
        _check_pack_ids(d)
        ia, ib = _segment_pairs(starts, lens)
        if len(ia) == 0:
            return {"pk": np.empty(0, np.int64)}
        return {"pk": np.unique((d[ia] << np.int64(31)) | d[ib])}

    def add_part_pk(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        part = (pk.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
        return batch.append_column("part", pa.array((part % np.uint64(n_parts)).astype(np.int64)))

    def distinct_pk(df):
        return {"pk": np.unique(df["pk"].to_numpy())}

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_solve, batch_format="pandas")
        .map_batches(add_part_pk, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(distinct_pk)
    ).materialize()  # bounded distinct-pk stream; measured twice below

    # ---- endpoint semi-join filter (round 5) ----
    # The verify joins only ever match sig rows whose doc_id is a pair
    # ENDPOINT, but the naive plan unioned the signatures of EVERY doc
    # into both join shuffles — ~520 B/doc x 2, which the 100 M-page
    # memstress measured as the dominant spill (the full signature table
    # shipped twice while candidates referenced <1% of docs).  Endpoints
    # are bounded by 2x|pairs|, so up to VERIFY_BROADCAST_MAX_ENDPOINTS
    # the sorted endpoint ids broadcast once (ray.put, ~8 B/id) and docs
    # are filtered BEFORE the verify signature passes — which also cuts
    # the 2nd/3rd signature computations to endpoint docs only.  Beyond
    # the gate the full-stream plan stays (endpoint table corpus-sized).
    # Filtering cannot change results: non-endpoint sig rows match no
    # pair row in either join (parity pytest locks both arms).
    # Candidate pairs are heavily CLIQUED (a near-dup cluster of c docs is
    # C(c,2) pairs over only c endpoints), so the pair count wildly
    # over-bounds the endpoint count — gate the endpoint COLLECTION on the
    # pair count (driver transiently holds <= 2x pairs ids) and the
    # BROADCAST on the measured DISTINCT endpoint count.
    n_pairs = cand.count()
    sig_source = ds
    if n_pairs <= ENDPOINT_COLLECT_MAX_PAIRS:
        import ray as _ray

        def endpoints_of(batch: pa.Table) -> pa.Table:
            pk = batch.column("pk").to_numpy(zero_copy_only=False)
            ids = np.unique(np.concatenate(
                [pk >> np.int64(31), pk & mask31]))
            return pa.table({"id": pa.array(ids)})

        if n_pairs == 0:
            ep_sorted = np.empty(0, np.int64)  # no candidates: every sig
        else:                                  # row filters out (to_pandas
            ep_parts = cand.map_batches(       # of 0 rows is columnless)
                endpoints_of, batch_format="pyarrow",
                batch_size=None).to_pandas()
            ep_sorted = np.unique(ep_parts["id"].to_numpy(np.int64))
        if len(ep_sorted) <= VERIFY_BROADCAST_MAX_ENDPOINTS:
            ep_ref = _ray.put(ep_sorted)

            def sig_keep(batch: pa.Table) -> pa.Table:
                ids = _ray.get(ep_ref)
                doc = batch.column("doc_id").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(ids, doc)
                hit = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)]
                                          == doc)
                return batch.filter(pa.array(hit))

            sig_source = ds.map_batches(sig_keep, batch_format="pyarrow",
                                        batch_size=None)

    # ---- signature verify: two hash-partition sort-merge joins ----
    def _part_of(key: np.ndarray) -> np.ndarray:
        return hashing.coarse_partition(key, n_parts)

    EMPTY_SIG = pa.array([], pa.list_(pa.int64()))

    def sig_rows(batch: pa.Table) -> pa.Table:
        mh = _hasher(num_perms, shingle_k, bands)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = mh.signatures(batch.column("text")).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(doc),
                "kind": pa.array(np.zeros(len(doc), np.int8)),
                "pk": pa.array(np.zeros(len(doc), np.int64)),
                "sig_a": pa.array([[]] * len(doc), pa.list_(pa.int64())),
                "sig": pa.array(list(s), pa.list_(pa.int64())),
                "__part": pa.array(_part_of(doc).astype(np.int64)),
            }
        )

    def pair_rows_a(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        n = len(pk)
        return pa.table(
            {
                "key": pa.array(a),
                "kind": pa.array(np.ones(n, np.int8)),
                "pk": pa.array(pk),
                "sig_a": pa.array([[]] * n, pa.list_(pa.int64())),
                "sig": pa.array([[]] * n, pa.list_(pa.int64())),
                "__part": pa.array(_part_of(a).astype(np.int64)),
            }
        )

    def join_a(part: pa.Table) -> pa.Table:
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        sm = kind == 0
        sk = key[sm]
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        sig_col = part.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = sig_col.take(pa.array(np.nonzero(sm)[0][order]))
        pk = part.column("pk").to_numpy(zero_copy_only=False)[~sm]
        ek = key[~sm]
        if len(sk) == 0 or len(ek) == 0:
            return pa.table({"pk": pa.array([], pa.int64()), "sig_a": EMPTY_SIG})
        pos = np.searchsorted(sk, ek)
        ok = (pos < len(sk)) & (sk[np.minimum(pos, len(sk) - 1)] == ek)
        return pa.table(
            {"pk": pa.array(pk[ok]), "sig_a": sigs.take(pa.array(pos[ok]))}
        )

    def pair_rows_b(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        b = pk & mask31
        n = len(pk)
        return pa.table(
            {
                "key": pa.array(b),
                "kind": pa.array(np.ones(n, np.int8)),
                "pk": pa.array(pk),
                "sig_a": batch.column("sig_a"),
                "sig": pa.array([[]] * n, pa.list_(pa.int64())),
                "__part": pa.array(_part_of(b).astype(np.int64)),
            }
        )

    def join_b_verify(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        sm = kind == 0
        sk = key[sm]
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        sig_col = part.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = sig_col.take(pa.array(np.nonzero(sm)[0][order]))
        prows = np.nonzero(~sm)[0]
        pk = part.column("pk").to_numpy(zero_copy_only=False)[~sm]
        ek = key[~sm]
        if len(sk) == 0 or len(ek) == 0:
            return empty
        pos = np.searchsorted(sk, ek)
        ok = (pos < len(sk)) & (sk[np.minimum(pos, len(sk) - 1)] == ek)
        if not ok.any():
            return empty
        sa_col = part.column("sig_a")
        if isinstance(sa_col, pa.ChunkedArray):
            sa_col = sa_col.combine_chunks()
        sa = sa_col.take(pa.array(prows[ok]))
        sb = sigs.take(pa.array(pos[ok]))
        ma = sa.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perms)
        mb = sb.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perms)
        est = (ma == mb).mean(axis=1)
        keep = est >= threshold
        pkk = pk[ok][keep]
        return pa.table(
            {
                "a": pa.array(pkk >> np.int64(31)),
                "b": pa.array(pkk & mask31),
                "est_jaccard": pa.array(np.floor(est[keep] * 1e6 + 0.5) / 1e6),
            }
        )

    sig1 = sig_source.map_batches(sig_rows, batch_format="pyarrow")
    with_a = (
        sig1.union(cand.map_batches(pair_rows_a, batch_format="pyarrow", batch_size=None))
        .groupby("__part")
        .map_groups(join_a, batch_format="pyarrow")
    )
    sig2 = sig_source.map_batches(sig_rows, batch_format="pyarrow")
    return (
        sig2.union(with_a.map_batches(pair_rows_b, batch_format="pyarrow", batch_size=None))
        .groupby("__part")
        .map_groups(join_b_verify, batch_format="pyarrow")
    )


#: minhash verify endpoint gate: up to this many DISTINCT pair endpoints
#: the sorted id array broadcasts (8 B/id -> 32 MB at the cap) and sig
#: rows are filtered to endpoints before the verify joins; beyond it the
#: full-stream tagged-union plan runs unchanged
VERIFY_BROADCAST_MAX_ENDPOINTS = 4_000_000

#: above this candidate-pair count the endpoint ids are not pulled to the
#: driver at all (the transient pull is <= 2x pairs x 8 B; 50M pairs ->
#: 800 MB, the practical driver ceiling) and the full-stream plan runs
ENDPOINT_COLLECT_MAX_PAIRS = 50_000_000

#: below this doc count the endpoint-label table broadcasts (one ray.put,
#: read per task) instead of the two tagged-union shuffles — the
#: enrich_pages ENRICH_BROADCAST_MAX_CELLS discipline (smooth.py); 1M
#: (doc_id, source) rows is ~30 MB in the object store
CROSS_NEARDUP_BROADCAST_MAX_DOCS = 1_000_000


def cross_source_neardup(docs_ds, threshold: float = 0.7, num_perms: int = 64,
                         shingle_k: int = 5, bands: int = 16,
                         n_parts: int | None = None,
                         broadcast_max_docs: int | None = None):
    """Near-dup CONTAMINATION MATRIX across sources: MinHash-LSH near-dup
    pairs cross-tabulated by unordered source pair ->
    ``(source_a, source_b, n_pairs)`` with ``source_a <= source_b``
    lexicographically.  The corpus-curation readout that tells you WHICH
    feeds duplicate each other (mirrors, re-crawls, syndication) before
    deciding what to drop — within-source mass sits on the diagonal.

    Scale shape: the pair list is :func:`minhash_pairs` (banded, capped,
    never all-pairs).  Label attach is SIZE-GATED (the enrich_pages
    discipline): up to ``broadcast_max_docs`` the (doc_id, source) table is
    sorted once on the driver and broadcast (ONE ``ray.put``, searchsorted
    probe per batch, both endpoints in one pass); above the gate each
    endpoint's label is attached with ONE tagged-union coarse hash shuffle
    keyed by that endpoint's doc_id (the label table is corpus-sized, so
    it is never broadcast and no join actors spin up).  Either arm ends in
    the same reduce of batch-local partials onto the BOUNDED source-pair
    key set (|sources|^2/2 rows at most); a parity pytest locks the two
    arms to identical output."""
    from ray.data.aggregate import Sum

    from ..functions.scale import default_parts

    n_parts = default_parts() if n_parts is None else n_parts
    if broadcast_max_docs is None:
        broadcast_max_docs = CROSS_NEARDUP_BROADCAST_MAX_DOCS

    # materialize the 2-column label projection ONCE: the count that picks
    # the arm and the arm itself (broadcast to_pandas / shuffle union) then
    # both read the cached blocks instead of re-scanning docs_ds
    labels = docs_ds.map_batches(
        lambda b: b.select(["doc_id", "source"]), batch_format="pyarrow",
        batch_size=None).materialize()
    edges = minhash_pairs(docs_ds, threshold=threshold, num_perms=num_perms,
                          shingle_k=shingle_k, bands=bands, n_parts=n_parts)

    if labels.count() <= broadcast_max_docs:
        import pandas as pd
        import ray

        lab = labels.to_pandas()
        k = lab["doc_id"].to_numpy(np.int64)
        order = np.argsort(k, kind="stable")
        lab_ref = ray.put((k[order], lab["source"].to_numpy(object)[order]))

        def attach_both(b: pa.Table) -> "pd.DataFrame":
            k2, v2 = ray.get(lab_ref)
            a = b.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
            bb = b.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
            ia = np.searchsorted(k2, a)
            ib = np.searchsorted(k2, bb)
            # edges derive from the same docs_ds as labels, so every
            # endpoint MUST hit; fail loudly (mirroring the shuffle arm's
            # join semantics) instead of silently attaching a wrong source
            if len(a) and ((ia >= len(k2)).any() or (ib >= len(k2)).any()
                           or (k2[ia] != a).any() or (k2[ib] != bb).any()):
                raise ValueError(
                    "cross_source_neardup: edge endpoint doc_id missing "
                    "from the label table")
            sa = v2[ia]
            sb = v2[ib]
            g = pd.DataFrame({"source_a": np.minimum(sa, sb),
                              "source_b": np.maximum(sa, sb)})
            return g.groupby(["source_a", "source_b"], sort=False,
                             as_index=False).size() \
                .rename(columns={"size": "n_pairs"})

        return (
            edges.map_batches(attach_both, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        )

    def _attach(pairs, key_col: str, out_col: str, carry: list[str]):
        def tag_lab(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {"key": b.column("doc_id"), out_col: b.column("source"),
                    "kind": pa.array(np.zeros(n, np.int8))}
            for c in carry:
                cols[c] = (pa.nulls(n, pa.string()) if c.startswith("source")
                           else pa.nulls(n, pa.int64()))
            return pa.table(cols)

        def tag_pair(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {"key": b.column(key_col),
                    out_col: pa.nulls(n, pa.string()),
                    "kind": pa.array(np.ones(n, np.int8))}
            for c in carry:
                cols[c] = b.column(c)
            return pa.table(cols)

        def add_part(b: pa.Table) -> pa.Table:
            k = b.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "__part", pa.array(hashing.coarse_partition(k, n_parts)))

        def resolve(part: pa.Table) -> pa.Table:
            part = part.combine_chunks()
            kind = part.column("kind").to_numpy(zero_copy_only=False)
            key = part.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            lmask = kind == 0
            lk = key[lmask]
            lv = part.column(out_col).filter(pa.array(lmask))
            order = np.argsort(lk, kind="stable")
            lk = lk[order]
            rows = part.filter(pa.array(~lmask))
            rk = rows.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            out = {c: rows.column(c) for c in carry}
            if len(lk) == 0:
                out[out_col] = pa.nulls(len(rk), pa.string())
            else:
                # every pair endpoint's label hashes into THIS partition by
                # the same key, so the probe always hits
                pos = np.searchsorted(lk, rk)
                out[out_col] = lv.take(pa.array(order[np.minimum(pos, len(lk) - 1)]))
            return pa.table(out)

        tagged = labels.map_batches(tag_lab, batch_format="pyarrow",
                                    batch_size=None).union(
            pairs.map_batches(tag_pair, batch_format="pyarrow",
                              batch_size=None))
        return (
            tagged.map_batches(add_part, batch_format="pyarrow",
                               batch_size=None)
            .groupby("__part")
            .map_groups(resolve, batch_format="pyarrow")
        )

    with_a = _attach(edges, "a", "source_a", carry=["b"])
    with_ab = _attach(with_a, "b", "source_b", carry=["source_a"])

    def partial(b: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        sa = b.column("source_a").to_numpy(zero_copy_only=False)
        sb = b.column("source_b").to_numpy(zero_copy_only=False)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        g = pd.DataFrame({"source_a": lo, "source_b": hi})
        return g.groupby(["source_a", "source_b"], sort=False,
                         as_index=False).size().rename(columns={"size": "n_pairs"})

    return (
        with_ab.map_batches(partial, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


# ---------------------------------------------------------------------------
# SimHash near-duplicate pairs (Charikar 2002; banded blocking)
# ---------------------------------------------------------------------------

def simhash_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                  token_hash: str = "blake2b", max_bucket: int = 4096,
                  n_parts: int | None = None):
    """documents -> (a, b, hamming) pairs with simhash hamming <= max_hamming.

    Pigeonhole blocking: any pair within hamming<=3 agrees exactly on at
    least one of 4 16-bit bands; candidates resolve in ONE coarse
    bucket-hash partition with the shared vectorized segmented-triu solve
    (the :func:`minhash_pairs` / ``_token_pair_candidates`` discipline —
    never ``groupby(bucket).map_groups`` dispatch per distinct band
    value), then exact hamming verification per candidate.  ``max_bucket``
    bounds a hot band bucket's quadratic pair fan-out the same way
    :func:`minhash_pairs` does (deterministic lowest-id truncation;
    ``None`` = exact).
    """
    n_parts = default_parts() if n_parts is None else n_parts
    def sigs(batch: pa.Table) -> pa.Table:
        texts = (batch.column("text") if token_hash == "fnv"
                 else batch.column("text").to_pylist())
        sh = hashing.simhash64(texts, token_hash=token_hash)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(texts)
        bands = np.empty((n, n_bands), dtype=np.int64)
        width = 64 // n_bands
        mask = np.uint64((1 << width) - 1)
        for b in range(n_bands):
            bands[:, b] = ((sh >> np.uint64(b * width)) & mask).astype(np.int64)
            bands[:, b] |= np.int64(b) << np.int64(48)  # band id in key space
        bucket = bands.ravel()
        _check_pack_ids(doc)  # ids < 2^31: int32 doc/part rows are lossless
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "doc_id": pa.array(np.repeat(doc.astype(np.int32), n_bands)),
                "simhash": pa.array(np.repeat(sh.astype(np.int64), n_bands)),
                "__part": pa.array(hashing.coarse_partition(bucket, n_parts)
                                   .astype(np.int32)),
            }
        )

    def bucket_solve(part_df) -> dict:
        empty = {"pk": np.empty(0, np.int64), "hamming": np.empty(0, np.int64)}
        b = part_df["bucket"].to_numpy(np.int64)
        d = part_df["doc_id"].to_numpy(np.int64)
        sh = part_df["simhash"].to_numpy(np.int64)
        if len(b) == 0:
            return empty
        order = np.lexsort((d, b))
        b, d, sh = b[order], d[order], sh[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, len(b)])
        if max_bucket is not None and (lens > max_bucket).any():
            rank = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
            trunc = rank < max_bucket  # sorted ids: lowest survive
            b, d, sh = b[trunc], d[trunc], sh[trunc]
            starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
            lens = np.diff(np.r_[starts, len(b)])
        _check_pack_ids(d)
        ia, ib = _segment_pairs(starts, lens)
        if len(ia) == 0:
            return empty
        ham = hashing.hamming64(sh[ia].view(np.uint64), sh[ib].view(np.uint64))
        keep = ham <= max_hamming
        return {
            "pk": (d[ia][keep] << np.int64(31)) | d[ib][keep],
            "hamming": ham[keep].astype(np.int64),
        }

    posted = ds.map_batches(sigs, batch_format="pyarrow")
    pairs = posted.groupby("__part").map_groups(bucket_solve,
                                               batch_format="pandas")
    return pairs.map_batches(_dedupe_packed_pairs("hamming"),
                             batch_format="pyarrow", batch_size=None) \
        .groupby("part").map_groups(_reduce_packed_pairs("hamming"))


def tfidf(ds, n_docs: int | None = None, n_parts: int | None = None):
    """documents -> (doc_id, token, tf, df, score): term-frequency /
    document-frequency scoring over whitespace tokens.

    ``score = tf * (N + 1) / (df + 1)`` — a RATIONAL (log-free) idf
    smoothing, chosen deliberately: it ranks identically to the log form
    per token and is bit-reproducible in DuckDB (libm ``ln`` may differ in
    the last ulp between engines, which the round6 hash gate would catch).

    Plan: Arrow-native (doc, token, tf) extraction (dictionary-encode +
    one np.unique-with-counts per batch — a doc lives in one row, so rows
    are globally distinct); df via a token-HASH-keyed coarse-partition
    vectorized count joined back to the posting rows in the same shuffle
    (union + per-partition sort-merge) — Python cost per partition, never
    per vocab term."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64

    if n_docs is None:
        n_docs = ds.count()
    idf_num = np.float64(n_docs + 1)

    EMPTY = pa.schema(
        [("key", pa.int64()), ("kind", pa.int8()), ("doc_id", pa.int64()),
         ("token", pa.string()), ("tf", pa.int64()), ("__part", pa.int64())]
    )

    def _part_of(key: np.ndarray) -> np.ndarray:
        return hashing.coarse_partition(key, n_parts)

    def posting_rows(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_id) == 0:
            return EMPTY.empty_table()
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return EMPTY.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = row_idx * (codes.max() + 1) + codes
        _, uidx, tf = np.unique(packed, return_index=True, return_counts=True)
        u_row, u_code = row_idx[uidx], codes[uidx]
        tok_arr = dic.dictionary.take(pa.array(u_code))
        thash = fnv_token_hash64(tok_arr).view(np.int64)
        return pa.table(
            {
                "key": pa.array(thash),
                "kind": pa.array(np.ones(len(u_row), np.int8)),
                "doc_id": pa.array(doc_id[u_row]),
                "token": tok_arr,
                "tf": pa.array(tf.astype(np.int64)),
                "__part": pa.array(_part_of(thash).astype(np.int64)),
            }
        )

    postings = ds.map_batches(posting_rows, batch_format="pyarrow")

    def join_df(part: pa.Table) -> pa.Table:
        # every row of a token's postings lands in this partition: df is a
        # local np.unique count over the hash keys
        key = part.column("key").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        uniq, start, df_cnt = np.unique(key_s, return_index=True, return_counts=True)
        pos = np.searchsorted(uniq, key)
        df = df_cnt[pos].astype(np.float64)
        tf = part.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf * (idf_num / (df + 1.0))
        return pa.table(
            {
                "doc_id": part.column("doc_id"),
                "token": part.column("token"),
                "tf": part.column("tf"),
                "df": pa.array(df_cnt[pos].astype(np.int64)),
                "score": pa.array(np.floor(score * 1e6 + 0.5) / 1e6),
            }
        )

    return postings.groupby("__part").map_groups(join_df, batch_format="pyarrow")


SPLIT_MULT = 2654435761
SPLIT_MOD = 1_000_000
SPLIT_WEIGHTS = (("train", 900_000), ("val", 50_000), ("test", 50_000))


def split_assign(ds, id_col: str = "doc_id",
                 weights: tuple[tuple[str, int], ...] = SPLIT_WEIGHTS,
                 mult: int = SPLIT_MULT, mod: int = SPLIT_MOD):
    """-> input rows + a ``split`` column: deterministic train/val/test
    assignment by multiplicative hash bucket (ppm weights must sum to
    ``mod``).  Pure map — streams, no shuffle, identical assignment in SQL
    and across reruns/engines (the property a training-data split needs;
    ``ds.random_sample`` / ``train_test_split`` RNG is not reproducible
    across engines)."""
    names = [n for n, _ in weights]
    bounds = np.cumsum([w for _, w in weights])
    if bounds[-1] != mod:
        raise ValueError(f"split weights must sum to {mod}, got {bounds[-1]}")

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids % mod) * (mult % mod)) % mod  # overflow-free (see sample_hash)
        idx = np.searchsorted(bounds, h, side="right")
        split = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def profile_documents(ds):
    """One-row data-quality profile of the documents table: row count,
    empty/whitespace-only text count, min/max/avg byte length (avg round6),
    distinct languages.  Batch-local partials -> one tiny driver merge via
    Dataset.aggregate — the profiling pass a pipeline runs before training
    ingestion; never materializes rows."""
    import pyarrow.compute as pc_
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        ln = pc_.binary_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        stripped = pc_.utf8_trim_whitespace(batch.column("text"))
        n_blank = int(pc_.sum(
            pc_.cast(pc_.equal(stripped, ""), pa.int64())
        ).as_py() or 0)
        langs = batch.column("lang").unique()
        return pa.table(
            {
                "n_rows": pa.array([len(ln)], pa.int64()),
                "n_blank": pa.array([n_blank], pa.int64()),
                "min_len": pa.array([int(ln.min()) if len(ln) else 2**62], pa.int64()),
                "max_len": pa.array([int(ln.max()) if len(ln) else -1], pa.int64()),
                "sum_len": pa.array([int(ln.sum())], pa.int64()),
                # bounded-cardinality distinct: carry the per-batch lang set
                "langs": pa.array([",".join(sorted(langs.to_pylist()))], pa.string()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = parts.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_blank", alias_name="n_blank"),
        Min("min_len", alias_name="min_len"),
        Max("max_len", alias_name="max_len"),
        Sum("sum_len", alias_name="sum_len"),
    )
    # distinct langs: tiny per-batch sets union'd driver-side
    lang_sets = parts.select_columns(["langs"]).take_all()
    langs: set[str] = set()
    for row in lang_sets:
        langs.update(x for x in row["langs"].split(",") if x)
    n = int(agg["n_rows"])
    avg = np.floor(int(agg["sum_len"]) / n * 1e6 + 0.5) / 1e6 if n else 0.0
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "n_blank": pa.array([int(agg["n_blank"])], pa.int64()),
            "min_len": pa.array([int(agg["min_len"])], pa.int64()),
            "max_len": pa.array([int(agg["max_len"])], pa.int64()),
            "avg_len": pa.array([float(avg)], pa.float64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
        }
    )


def top_bigrams(ds, k: int = 20, n_parts: int | None = None):
    """documents -> top-k word bigrams by corpus count (w1, w2, cnt, rank),
    ties ascending on (w1, w2) — the n-gram counting op over consecutive
    whitespace tokens (within-doc adjacency only, no cross-doc pairs).

    Plan: batch-local bigram extraction + count (dictionary codes paired
    via shifted slices, one np.unique), bigram-HASH-partitioned vectorized
    global count (strings ride along), then local-top-k + single-partition
    merge — never a full sort, never per-bigram Python."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64
    from .gridops import topk

    def bigram_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "w1": pa.array([], pa.string()),
             "w2": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "__part": pa.array([], pa.int64())}
        )
        n_docs = len(batch)
        if n_docs == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = doc_idx[nonempty]
        toks = flat.filter(pa.array(nonempty))
        if len(toks) < 2:
            return empty
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        adj = doc_idx[1:] == doc_idx[:-1]  # consecutive tokens, same doc
        c1, c2 = codes[:-1][adj], codes[1:][adj]
        if len(c1) == 0:
            return empty
        packed = c1 * (codes.max() + 1) + c2
        uniq, uidx, cnt = np.unique(packed, return_index=True, return_counts=True)
        w1 = dic.dictionary.take(pa.array(c1[uidx]))
        w2 = dic.dictionary.take(pa.array(c2[uidx]))
        # one 64-bit key for the partitioned global count: hash of "w1 w2"
        joined = pc_.binary_join_element_wise(w1, w2, " ")
        key = fnv_token_hash64(joined).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table(
            {
                "key": pa.array(key),
                "w1": w1,
                "w2": w2,
                "cnt": pa.array(cnt.astype(np.int64)),
                "__part": pa.array(part.astype(np.int64)),
            }
        )

    def reduce_part(part: pa.Table) -> pa.Table:
        key = part.column("key").to_numpy(zero_copy_only=False)
        cnt = part.column("cnt").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key, return_inverse=True)
        total = np.bincount(inv, weights=cnt.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64)
        first = np.full(len(uniq), len(key), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(key)))
        take = pa.array(first)
        return pa.table(
            {
                "w1": part.column("w1").take(take),
                "w2": part.column("w2").take(take),
                "cnt": pa.array(total),
            }
        )

    counted = (
        ds.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
    return topk(counted, k, by="cnt", tie_cols=("w1", "w2"))


def zscore_text_len(ds, n_parts: int | None = None):
    """documents -> (doc_id, lang, len, z): per-language z-score of the
    text byte length — the per-group feature-normalization op a training
    pipeline runs before thresholding.

    Two-pass broadcast shape: pass 1 aggregates EXACT integer moments
    (n, sum, sum of squares — int64 sums of ints, no float order issues)
    per language into a tiny driver-side table; pass 2 broadcasts it and
    normalizes every row in place.  z = (len*n - sum) / (n * sqrt(var))
    with var from the integer moments and IEEE sqrt (correctly rounded →
    identical across engines), so the round6 output is bit-reproducible."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        ln = pc_.binary_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        df = pd_.DataFrame({"lang": lang, "n": 1, "s": ln, "ss": ln * ln})
        g = df.groupby("lang", sort=True).sum().reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "s": pa.array(g["s"].to_numpy().astype(np.int64)),
                "ss": pa.array(g["ss"].to_numpy().astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    mom = (
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
        .take_all()
    )  # |langs| rows on the driver — bounded
    stats = {
        r["lang"]: (int(r["n"]), int(r["s"]), int(r["ss"])) for r in mom
    }
    ref = ray.put(stats)

    def normalize(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        ln = pc_.binary_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ln), dtype=np.float64)
        for lg in np.unique(lang):
            n, s_, ss = st[lg]
            m = lang == lg
            # population variance from exact integer moments
            var = np.float64(n * ss - s_ * s_) / np.float64(n * n)
            sd = np.sqrt(var)
            z[m] = np.where(
                sd > 0.0,
                (ln[m].astype(np.float64) - np.float64(s_) / np.float64(n)) / sd,
                0.0,
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "len": pa.array(ln),
                "z": pa.array(np.floor(z * 1e6 + 0.5) / 1e6),
            }
        )

    return ds.map_batches(normalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination (word n-gram overlap against a held-out set)
# ---------------------------------------------------------------------------

def _doc_tokens(batch: pa.Table):
    """batch -> (per-token doc_id int64 array, token StringArray): the
    shared whitespace tokenization (empties filtered, NULL text treated as
    "" like every other tokenizing stage), no n-gram windowing."""
    import pyarrow.compute as pc_

    empty = (np.zeros(0, np.int64), pa.array([], pa.string()))
    if len(batch) == 0:
        return empty
    split = pc_.split_pattern_regex(pc_.fill_null(batch.column("text"), ""), r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(doc, counts)
    nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(nonempty))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return doc_idx[nonempty], toks


def _row_tokens(batch: pa.Table):
    """batch -> (per-token ROW-POSITION int64 array, token StringArray):
    the shared whitespace tokenization keyed by batch row position instead
    of ``doc_id`` — for stages that need a non-key column (``source``,
    ``lang``) per token without assuming doc_ids are sorted in the block."""
    import pyarrow.compute as pc_

    empty = (np.zeros(0, np.int64), pa.array([], pa.string()))
    if len(batch) == 0:
        return empty
    split = pc_.split_pattern_regex(pc_.fill_null(batch.column("text"), ""), r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)[nonempty]
    toks = flat.filter(pa.array(nonempty))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return row_idx, toks


def _doc_ngrams(batch: pa.Table, n: int):
    """batch -> (per-gram doc_id int64 array, space-joined gram StringArray):
    within-doc consecutive whitespace-token n-grams over the shared
    :func:`_doc_tokens` tokenization; all Arrow/numpy, no Python per row."""
    import pyarrow.compute as pc_

    empty = (np.zeros(0, np.int64), pa.array([], pa.string()))
    doc_idx, toks = _doc_tokens(batch)
    if len(toks) < n:
        return empty
    m = len(toks) - n + 1
    # window stays within one doc <=> endpoints share the doc (doc_idx is
    # nondecreasing, so equality at the ends implies it throughout)
    adj = doc_idx[n - 1 :] == doc_idx[:m]
    if not adj.any():
        return empty
    grams = pc_.binary_join_element_wise(*[toks.slice(j, m) for j in range(n)], " ")
    return doc_idx[:m][adj], grams.filter(pa.array(adj))


def contamination(ds, bench_mod: int = 10, n: int = 3):
    """documents -> (doc_id, n_overlap): for each corpus doc (doc_id %
    bench_mod != 0), the count of its DISTINCT word n-grams also present in
    the benchmark partition (doc_id % bench_mod == 0) — the decontamination
    scan of a training corpus against held-out eval sets.

    Scale shape: the benchmark side is SMALL (an eval suite) — its distinct
    n-gram set is reduced per batch, unioned once, and broadcast via
    ``ray.put``; the 100 TB corpus side then streams through ONE stateless
    ``map_batches`` doing a vectorized Arrow ``is_in`` membership test plus
    one ``np.unique`` pair-dedup per batch.  No shuffle: per-doc distinct
    counts are exact because a doc never splits across batches.
    """
    import ray
    import pyarrow.compute as pc_

    def bench_grams(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        _, grams = _doc_ngrams(b.filter(pa.array(doc % bench_mod == 0)), n)
        return pa.table({"gram": pc_.unique(grams)})

    bench_parts = ds.map_batches(
        bench_grams, batch_format="pyarrow", batch_size=None
    ).take_all()  # distinct grams per batch of the SMALL benchmark side
    value_set = pc_.unique(pa.array([r["gram"] for r in bench_parts], pa.string()))
    ref = ray.put(value_set)

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
        )
        vs = ray.get(ref)
        if len(vs) == 0:
            return empty
        doc_g, grams = _doc_ngrams(batch, n)
        if len(grams) == 0:
            return empty
        member = pc_.is_in(grams, value_set=vs).to_numpy(zero_copy_only=False)
        keep = member & ((doc_g % bench_mod) != 0)
        if not keep.any():
            return empty
        d = doc_g[keep]
        g = grams.filter(pa.array(keep)).dictionary_encode()
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        code = g.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uvals, dinv = np.unique(d, return_inverse=True)
        span = np.int64(code.max()) + 1
        upairs = np.unique(dinv.astype(np.int64) * span + code)  # distinct (doc, gram)
        di, cnt = np.unique(upairs // span, return_counts=True)
        return pa.table(
            {"doc_id": pa.array(uvals[di]), "n_overlap": pa.array(cnt.astype(np.int64))}
        )

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# sequence packing (GPT-style fixed-budget token stream chunking)
# ---------------------------------------------------------------------------

def pack_sequences(ds, cap: int = 2048):
    """documents -> (doc_id, n_tokens, seq_id, seq_offset): all docs'
    whitespace tokens concatenated in doc_id order into one global token
    stream, cut into fixed ``cap``-token training sequences; each doc begins
    in sequence ``prev_tokens // cap`` at offset ``prev_tokens % cap``.

    Distributed EXCLUSIVE PREFIX SUM with no shuffle: (1) one streamed pass
    projects and materializes the narrow (doc_id, n_tokens) table (16 B/row
    — the only multi-pass working set; text is scanned once); (2) per-BLOCK
    subtotals — one row per block — stitch to global block offsets on the
    driver, keyed by each block's first doc_id; (3) a second pass over the
    SAME materialized blocks adds the batch-local exclusive cumsum to its
    block's offset.  Blocks of a materialized dataset are immutable, so the
    first-doc keys align between passes regardless of task bundling.
    Assumes rows are globally doc_id-ordered (the source parquet's order;
    the reference's S6 original-order semantics).
    """
    import ray

    def project(b: pa.Table) -> pa.Table:
        nt = textstats.byte_class_counts(b.column("text"),
                                         need_bpe=False)["n_tokens"]
        return pa.table({"doc_id": b.column("doc_id"), "n_tokens": pa.array(nt)})

    narrow = ds.map_batches(project, batch_format="pyarrow", batch_size=None).materialize()

    def subtotal(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"first_doc": pa.array([], pa.int64()), "total": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "first_doc": pa.array([b.column("doc_id")[0].as_py()], pa.int64()),
                "total": pa.array([int(pc.sum(b.column("n_tokens")).as_py() or 0)], pa.int64()),
            }
        )

    parts = narrow.map_batches(subtotal, batch_format="pyarrow", batch_size=None).take_all()
    parts.sort(key=lambda r: r["first_doc"])
    firsts = np.array([r["first_doc"] for r in parts], np.int64)
    offsets = np.concatenate([[0], np.cumsum([r["total"] for r in parts], dtype=np.int64)[:-1]]) \
        if parts else np.zeros(0, np.int64)
    ref = ray.put((firsts, offsets))

    def finalize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_offset": pa.array([], pa.int64()),
                }
            )
        firsts_, offsets_ = ray.get(ref)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets_[np.searchsorted(firsts_, int(b.column("doc_id")[0].as_py()))]
        cum_prev = np.cumsum(nt) - nt + off
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(nt),
                "seq_id": pa.array(cum_prev // cap),
                "seq_offset": pa.array(cum_prev % cap),
            }
        )

    return narrow.map_batches(finalize, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# duplicated n-gram quality metric (Gopher-style repetition rule)
# ---------------------------------------------------------------------------

def dup_ngram_stats(ds, n: int = 3):
    """documents -> (doc_id, n_grams, n_dup, total_chars, dup_chars): the
    Gopher-style repetition quality signal — for each doc, how many of its
    consecutive word ``n``-grams belong to a gram that repeats within the
    doc, and how many characters those occurrences cover (the "fraction of
    characters in duplicate n-grams" filter rule, kept as exact integer
    numerator/denominator so the oracle is bit-exact and the caller picks
    the threshold).

    Scale shape: docs never split across batches, so the whole metric is
    one stateless ``map_batches`` — gram extraction via the shared Arrow
    kernel (:func:`_doc_ngrams`), per-(doc, gram) counts via one
    dictionary-encode + packed ``np.unique``, per-doc sums via bincount.
    No shuffle at all.
    """
    import pyarrow.compute as pc_

    def f(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
            "total_chars": pa.array([], pa.int64()),
            "dup_chars": pa.array([], pa.int64()),
        })
        doc_g, grams = _doc_ngrams(batch, n)
        if len(grams) == 0:
            return empty
        lens = pc_.utf8_length(grams).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = grams.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        udoc, dinv = np.unique(doc_g, return_inverse=True)
        span = np.int64(code.max()) + 1
        pack = dinv.astype(np.int64) * span + code
        _, pinv, pcnt = np.unique(pack, return_inverse=True, return_counts=True)
        occ_cnt = pcnt[pinv]          # per occurrence: its gram's in-doc count
        dup = occ_cnt >= 2
        nd = len(udoc)
        n_grams = np.bincount(dinv, minlength=nd).astype(np.int64)
        n_dup = np.bincount(dinv[dup], minlength=nd).astype(np.int64)
        total_chars = np.zeros(nd, np.int64)
        np.add.at(total_chars, dinv, lens)
        dup_chars = np.zeros(nd, np.int64)
        np.add.at(dup_chars, dinv[dup], lens[dup])
        return pa.table({
            "doc_id": pa.array(udoc),
            "n_grams": pa.array(n_grams),
            "n_dup": pa.array(n_dup),
            "total_chars": pa.array(total_chars),
            "dup_chars": pa.array(dup_chars),
        })

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# inverted index build (token -> df + ordered posting list)
# ---------------------------------------------------------------------------

def inverted_index(ds, min_df: int = 2, n_parts: int | None = None):
    """documents -> (token, df, doc_list): the retrieval-index build — for
    every whitespace token with document frequency >= ``min_df``, its df
    and the comma-joined ascending doc-id posting list.

    Plan: batch-local DISTINCT (doc, token) extraction (same Arrow kernels
    as :func:`tfidf`), one token-hash-keyed coarse-partition shuffle, then
    a per-partition vectorized assembly: sort postings, cut token runs,
    and emit each posting list via Arrow ``ListArray`` + ``binary_join`` —
    Python cost per PARTITION, never per vocabulary term.  Output work is
    inherently |index|-sized; nothing else is.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64

    def _part_of(key: np.ndarray) -> np.ndarray:
        return hashing.coarse_partition(key, n_parts)

    EMPTY = pa.schema(
        [("doc_id", pa.int64()), ("token", pa.string()), ("__part", pa.int64())]
    )

    def posting_rows(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_id) == 0:
            return EMPTY.empty_table()
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return EMPTY.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = row_idx * (codes.max() + 1) + codes
        _, uidx = np.unique(packed, return_index=True)
        tok_arr = dic.dictionary.take(pa.array(codes[uidx]))
        thash = fnv_token_hash64(tok_arr).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_id[row_idx[uidx]]),
                "token": tok_arr,
                "__part": pa.array(_part_of(thash).astype(np.int64)),
            }
        )

    postings = ds.map_batches(posting_rows, batch_format="pyarrow")

    def assemble(part: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "doc_list": pa.array([], pa.string())})
        if len(part) == 0:
            return empty
        enc = part.column("token").dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = part.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, code))
        code_s, doc_s = code[order], doc[order]
        uniq, counts = np.unique(code_s, return_counts=True)
        keep_run = counts >= min_df
        if not keep_run.any():
            return empty
        keep_row = np.repeat(keep_run, counts)
        doc_k = doc_s[keep_row]
        lens = counts[keep_run]
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        docstr = pc_.cast(pa.array(doc_k), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), docstr)
        return pa.table({
            "token": enc.dictionary.take(pa.array(uniq[keep_run])),
            "df": pa.array(lens.astype(np.int64)),
            "doc_list": pc_.binary_join(lists, ","),
        })

    return postings.groupby("__part").map_groups(assemble, batch_format="pyarrow")


CHUNK_SIZE = 200
CHUNK_STRIDE = 150  # 50-char overlap


def chunk_documents(ds, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """documents -> (doc_id, chunk_idx, chunk_text): overlapping
    fixed-width character chunks — the RAG/context-window chunking stage.
    Chunk i covers [i*stride, i*stride + size); a doc yields
    max(1, ceil(len/stride)) chunks (empty docs yield one empty chunk).

    Vectorized as a loop over CHUNK INDICES, not rows: for each index i
    (bounded by the longest doc in the batch, not the row count) one Arrow
    ``utf8_slice_codeunits`` kernel slices every doc at once; rows past
    their own chunk count are filtered by mask.  Fan-out happens inside the
    batch (flat_map semantics without per-row Python), so at 100 TB this is
    a pure streaming map stage with ~len/stride x output volume."""
    import pyarrow.compute as pc_

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lens = pc_.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(1, -(-lens // stride))
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids, idxs, texts = [], [], []
        for i in range(int(n_chunks.max())):
            mask = n_chunks > i
            sliced = pc_.utf8_slice_codeunits(text, start=i * stride,
                                              stop=i * stride + size)
            keep = pa.array(mask)
            ids.append(pa.array(doc_id[mask]))
            idxs.append(pa.array(np.full(int(mask.sum()), i, np.int64)))
            texts.append(pc_.filter(sliced, keep))
        return pa.table({"doc_id": pa.concat_arrays(ids),
                         "chunk_idx": pa.concat_arrays(idxs),
                         "chunk_text": pa.concat_arrays([t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t for t in texts])})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def collapse_repeats(ds):
    """documents -> (doc_id, text, n_tokens_in, n_tokens_out): remove
    consecutive duplicate tokens ("table table" -> "table") — the
    stutter/boilerplate-repeat cleaner of a web-text pipeline.  Whitespace
    runs normalize to single spaces as a side effect (split on ``\\s+``,
    rejoin with one space); the SQL oracle applies the identical list
    pipeline (``oracles_corpus.collapse_repeats_sql``).

    Fully vectorized and embarrassingly parallel (no shuffle): Arrow
    regex split, one shifted equality over the flattened token stream,
    ListArray rebuild + ``binary_join`` — no per-row Python."""

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        split = pc.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = doc_idx[nonempty]
        toks = flat.filter(pa.array(nonempty))
        n_in = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(toks):
            same_doc = np.empty(len(toks), bool)
            same_doc[0] = False
            same_doc[1:] = doc_idx[1:] == doc_idx[:-1]
            eq = np.empty(len(toks), bool)
            eq[0] = False
            eq[1:] = pc.equal(
                toks.slice(1), toks.slice(0, len(toks) - 1)
            ).to_numpy(zero_copy_only=False)
            keep = ~(same_doc & eq)
            kept = toks.filter(pa.array(keep))
            kept_idx = doc_idx[keep]
        else:
            kept = toks
            kept_idx = doc_idx
        n_out = np.bincount(kept_idx, minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(n_out, out=offsets[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()),
            kept.combine_chunks() if isinstance(kept, pa.ChunkedArray) else kept)
        text = pc.binary_join(lst, " ")
        return pa.table({"doc_id": batch.column("doc_id"), "text": text,
                         "n_tokens_in": pa.array(n_in),
                         "n_tokens_out": pa.array(n_out)})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def len_histogram(docs_ds, width: int = 200, text_col: str = "text"):
    """Document-length histogram: bucket = length // width, exact counts.

    Batch-local ``np.unique`` partials mean only |distinct buckets per batch|
    rows shuffle (bounded by max_len/width, not by rows) — the fixed-width
    histogram is the cheapest distribution profile a corpus pipeline runs.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column(text_col)).to_numpy(zero_copy_only=False).astype(np.int64)
        b, cnt = np.unique(n // width, return_counts=True)
        return pa.table({"bucket": pa.array(b), "n_part": pa.array(cnt.astype(np.int64))})

    def finalize(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "lo": pa.array(b * width),
                "n_docs": batch.column("sum(n_part)"),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_part"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def host_split(pages_ds, weights: tuple[tuple[str, int], ...] = SPLIT_WEIGHTS,
               mod: int = SPLIT_MOD):
    """Leakage-safe (group-aware) train/val/test split: the bucket is a hash
    of the HOST, so every page of a host lands in the same split — the
    assignment a training pipeline needs to stop near-duplicate pages of one
    site straddling train and test.  -> (page_id, host, split).

    Pure streaming map (the host hash is ``functions.hashing.poly_hash64``,
    whose uint64 arithmetic the SQL oracle reproduces in HUGEINT)."""
    from ..functions.hashing import poly_hash64

    names = [n for n, _ in weights]
    bounds = np.cumsum([w for _, w in weights])
    if bounds[-1] != mod:
        raise ValueError(f"split weights must sum to {mod}, got {bounds[-1]}")

    def f(batch: pa.Table) -> pa.Table:
        host = pc.list_element(pc.split_pattern(batch.column("url"), pattern="/"), 2)
        h = (poly_hash64(host) % np.uint64(mod)).astype(np.int64)
        idx = np.searchsorted(bounds, h, side="right")
        split = np.array(names, dtype=object)[idx]
        return pa.table(
            {
                "page_id": batch.column("page_id"),
                "host": host,
                "split": pa.array(split, pa.string()),
            }
        )

    return pages_ds.map_batches(f, batch_format="pyarrow")


def lang_confusion(ds):
    """Classifier-eval confusion matrix: stored label x predicted lang_id ->
    (lang, pred_lang, n_docs).  Batch-local pair counts shuffle (bounded by
    |langs|^2 rows/batch) — the standard eval pass a pipeline runs on its
    heuristic classifiers before trusting their filters at volume."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_numpy(zero_copy_only=False),
                "pred_lang": np.asarray(textstats.lang_id(batch.column("text"))),
            }
        )
        g = df.groupby(["lang", "pred_lang"], sort=False).size().reset_index(name="n_part")
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "pred_lang": batch.column("pred_lang"),
                "n_docs": batch.column("sum(n_part)"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n_part"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def _within_edit1(s: str, t: str) -> bool:
    """Exact edit-distance <= 1 check for a candidate pair (s != t)."""
    ls, lt = len(s), len(t)
    if abs(ls - lt) > 1:
        return False
    if ls == lt:
        return sum(a != b for a, b in zip(s, t)) <= 1
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    # t is s plus one inserted char: advance past the single mismatch
    i = 0
    while i < ls and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1:]


def fuzzy_value_join(ds, col: str, n_parts: int | None = None):
    """Similarity self-join at edit distance <= 1 via deletion-neighborhood
    blocking: every DISTINCT value emits itself plus each single-deletion
    variant as a blocking key; two values at distance <= 1 are guaranteed to
    share a key (substitution -> delete the differing position from both;
    insertion -> the shorter string IS a deletion variant of the longer).
    Candidates sharing a key get the exact O(len) <=1 check; surviving pairs
    dedupe through one hash-partition distinct.  -> (a, b) with a < b.

    Scale shape: only distinct values x (len+1) variant rows shuffle — the
    standard typo-dedup join (hosts, brand names, near-identical titles) at
    any cardinality; no all-pairs comparison ever happens."""
    n_parts = default_parts() if n_parts is None else n_parts
    from ..functions.hashing import md5_hash64
    from .join import distinct_values

    def variants(batch: pa.Table) -> pa.Table:
        vals = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        key_o, val_o = [], []
        for v in vals:
            s = str(v)
            key_o.append(s)
            val_o.append(s)
            for i in range(len(s)):
                key_o.append(s[:i] + s[i + 1:])
                val_o.append(s)
        return pa.table({"bkey": pa.array(key_o, pa.string()),
                         "val": pa.array(val_o, pa.string())})

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(group["val"].to_numpy())
        out_a, out_b = [], []
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                if _within_edit1(str(u[i]), str(u[j])):
                    out_a.append(u[i])
                    out_b.append(u[j])
        return pd.DataFrame({"pair": [f"{a}\x00{b}" for a, b in zip(out_a, out_b)]})

    import pandas as pd  # noqa: F401

    cand = (
        ds.map_batches(variants, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(pairs, batch_format="pandas")
    )
    deduped = distinct_values(cand, "pair", n_parts=n_parts)

    def split(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        parts = pc_.split_pattern(batch.column("pair"), pattern="\x00")
        return pa.table(
            {
                "a": pc_.list_element(parts, 0),
                "b": pc_.list_element(parts, 1),
            }
        )

    return deduped.map_batches(split, batch_format="pyarrow")


def char_entropy(ds, text_col: str = "text"):
    """Per-document character-distribution entropy (bits): the gibberish /
    boilerplate quality signal (low entropy = repeated chars, high =
    near-random).  -> (doc_id, n_chars, entropy).

    One vectorized pass: a single ``np.add.at`` scatter over
    (doc_index * 256 + byte) counts every document's byte histogram at once
    — no Python per document.  ASCII corpus assumption (byte == codepoint),
    matching the SQL oracle's per-codepoint split."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = col.cast(pa.string())
        buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset: arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        n_docs = len(arr)
        lens = (buf_off[1:] - buf_off[:-1]).astype(np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        sl = data[buf_off[0]: buf_off[-1]].astype(np.int64)
        counts = np.zeros(n_docs * 256, dtype=np.int64)
        np.add.at(counts, doc_idx * 256 + sl, 1)
        counts = counts.reshape(n_docs, 256)
        n = lens.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / n[:, None]
            terms = np.where(counts > 0, p * np.log2(np.where(counts > 0, p, 1.0)), 0.0)
        ent = -terms.sum(axis=1)
        ent[lens == 0] = 0.0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(lens),
                "entropy": pa.array(np.floor(ent * 1e6 + 0.5) / 1e6),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def remove_boilerplate(ds, n: int = 5, min_df: int = 2,
                       max_freq_grams: int = 1_000_000,
                       n_parts: int | None = None):
    """documents -> (doc_id, clean_text, n_removed): strip every token
    covered by an n-gram whose document frequency >= ``min_df`` — the
    CCNet/RefinedWeb-style boilerplate scrub (navigation chrome, cookie
    banners, shared footers repeat VERBATIM across pages; their spans are
    exactly the high-df n-grams).  Composition of the two phase helpers:
    :func:`frequent_grams` (global df count) then :func:`scrub_boilerplate`
    (broadcast set + streaming rewrite) — split out so the resumable
    curation job can manifest the frequent-gram set as its own phase
    artifact.  At 100 TB both passes stream; the only materialization is
    the frequent set itself."""
    n_parts = default_parts() if n_parts is None else n_parts
    return scrub_boilerplate(ds, frequent_grams(ds, n, min_df, max_freq_grams, n_parts), n)


def frequent_grams(ds, n: int = 5, min_df: int = 2,
                   max_freq_grams: int = 1_000_000,
                   n_parts: int | None = None) -> pa.Array:
    """Pass 1 of the boilerplate scrub: the corpus' n-grams with document
    frequency >= ``min_df``, as a (bounded, broadcastable) Arrow string
    array.  Batch-local distinct (doc, gram) extraction (:func:`_doc_ngrams`
    tokenization), gram-hash-partitioned vectorized global count with the
    gram STRINGS riding along (the top_bigrams reduce shape); only grams,
    never docs, enter the shuffle."""
    n_parts = default_parts() if n_parts is None else n_parts
    from ..functions.hashing import coarse_partition, fnv_token_hash64

    def gram_partials(batch: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(batch, n)
        if len(grams) == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "gram": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
            )
        # distinct (doc, gram) within the batch: docs never span batches,
        # so per-batch distinct-doc counts sum to the exact global df
        key = fnv_token_hash64(grams).view(np.int64)
        pair = np.stack([doc_idx, key], axis=1)
        uniq_pair, first = np.unique(pair, axis=0, return_index=True)
        k_u = uniq_pair[:, 1]
        uniq_k, inv, cnt = np.unique(k_u, return_inverse=True, return_counts=True)
        first_of_k = np.full(len(uniq_k), len(k_u), dtype=np.int64)
        np.minimum.at(first_of_k, inv, np.arange(len(k_u)))
        take = pa.array(first[first_of_k])
        return pa.table(
            {
                "key": pa.array(uniq_k),
                "gram": grams.take(take),
                "df": pa.array(cnt.astype(np.int64)),
                "__part": pa.array(coarse_partition(uniq_k, n_parts)),
            }
        )

    def reduce_df(part: pa.Table) -> pa.Table:
        key = part.column("key").to_numpy(zero_copy_only=False)
        df = part.column("df").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key, return_inverse=True)
        total = np.bincount(inv, weights=df.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64)
        keep = total >= min_df
        first = np.full(len(uniq), len(key), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(key)))
        return pa.table({"gram": part.column("gram").take(pa.array(first[keep]))})

    freq_tbls = (
        ds.map_batches(gram_partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_df, batch_format="pyarrow")
        .take_all()
    )
    freq = pa.array([r["gram"] for r in freq_tbls], pa.string())
    if len(freq) > max_freq_grams:
        raise ValueError(
            f"remove_boilerplate: {len(freq)} frequent grams exceeds "
            f"max_freq_grams={max_freq_grams} — raise min_df (a broadcast "
            "this large means the corpus is dominated by duplicated spans; "
            "near-dup dedup should run first)"
        )
    return freq


def scrub_boilerplate(ds, freq_grams: pa.Array, n: int = 5):
    """Pass 2 of the boilerplate scrub: documents -> (doc_id, clean_text,
    n_removed) given the frequent-gram set.  The set is broadcast via
    ``ray.put`` once; membership per batch is an exact Arrow ``index_in``
    on the gram strings, covered token positions come from a
    difference-array cumsum (grams never cross doc bounds, so one global
    pass), and per-doc texts rebuild with offsets + ``binary_join`` —
    zero Python per token."""
    import ray
    import pyarrow.compute as pc_

    freq_ref = ray.put(freq_grams)

    def scrub(batch: pa.Table) -> pa.Table:
        n_docs = len(batch)
        out_ids = batch.column("doc_id")
        if n_docs == 0:
            return pa.table(
                {"doc_id": out_ids, "clean_text": pa.array([], pa.string()),
                 "n_removed": pa.array([], pa.int64())}
            )
        split = pc_.split_pattern_regex(pc_.fill_null(batch.column("text"), ""), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        local_doc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        local_doc = local_doc[nonempty]
        toks = flat.filter(pa.array(nonempty))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        t = len(toks)
        tok_counts = np.bincount(local_doc, minlength=n_docs)
        covered = np.zeros(t, dtype=bool)
        if t >= n:
            m = t - n + 1
            adj = local_doc[n - 1:] == local_doc[:m]
            grams = pc_.binary_join_element_wise(
                *[toks.slice(j, m) for j in range(n)], " "
            )
            freq = ray.get(freq_ref)
            hit_local = pc_.is_valid(pc_.index_in(grams, value_set=freq)).to_numpy(
                zero_copy_only=False
            ) & adj
            starts = np.flatnonzero(hit_local)
            if len(starts):
                diff = np.zeros(t + n, dtype=np.int64)
                np.add.at(diff, starts, 1)
                np.add.at(diff, starts + n, -1)
                covered = np.cumsum(diff[:t]) > 0
        kept_mask = ~covered
        kept_toks = toks.filter(pa.array(kept_mask))
        kept_counts = np.bincount(local_doc[kept_mask], minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        if isinstance(kept_toks, pa.ChunkedArray):
            kept_toks = kept_toks.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_toks)
        clean = pc_.binary_join(lists, " ")
        return pa.table(
            {
                "doc_id": out_ids,
                "clean_text": clean,
                "n_removed": pa.array((tok_counts - kept_counts).astype(np.int64)),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


# the Gopher rule uses the language's 8 most common function words ("the",
# "be", "to", ...); the driver corpus is synthetic DB-jargon word soup, so
# the corpus-adapted equivalent is ITS 8 highest-df words — same rule,
# meaningful signal (the canonical English list matches <= 1 word here,
# which would make the filter vacuously reject everything)
GOPHER_STOPWORDS = ("batch", "small", "scan", "agg", "data", "customer", "big", "hash")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MIN_STOPS = 2


def _gopher_metrics(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One batch of texts -> (word_count, mean_word_len, stop_hits, passes)
    per doc — the Gopher rule kernel, shared by :func:`gopher_quality` and
    :func:`curate_corpus` (tokenize once, Arrow ``index_in`` stopword hits,
    one packed np.unique for the per-doc distinct count)."""
    import pyarrow.compute as pc_

    stop_set = pa.array(GOPHER_STOPWORDS, pa.string())
    n_docs = len(texts)
    split = pc_.split_pattern_regex(pc_.fill_null(texts, ""), r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    local_doc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
    local_doc = local_doc[nonempty]
    toks = flat.filter(pa.array(nonempty))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    wc = np.bincount(local_doc, minlength=n_docs).astype(np.int64)
    tlen = pc_.utf8_length(toks).to_numpy(zero_copy_only=False)
    lsum = np.bincount(local_doc, weights=tlen.astype(np.float64), minlength=n_docs)
    mwl = np.where(wc > 0, lsum / np.maximum(wc, 1), 0.0)
    codes = pc_.index_in(toks, value_set=stop_set)
    hit = pc_.is_valid(codes).to_numpy(zero_copy_only=False)
    code_np = codes.to_numpy(zero_copy_only=False)
    packed = local_doc[hit] * len(GOPHER_STOPWORDS) + code_np[hit].astype(np.int64)
    stops = np.zeros(n_docs, dtype=np.int64)
    if len(packed):
        u = np.unique(packed)
        np.add.at(stops, u // len(GOPHER_STOPWORDS), 1)
    passes = (
        (wc >= GOPHER_MIN_WORDS) & (wc <= GOPHER_MAX_WORDS)
        & (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
        & (stops >= GOPHER_MIN_STOPS)
    )
    return wc, mwl, stops, passes


def gopher_quality(ds):
    """documents -> (doc_id, word_count, mean_word_len, stop_hits, passes):
    the Gopher rule-based quality filter (Rae et al. 2021 §A1.1) — word
    count in [50, 100k], mean word length in [3, 10], and >= 2 distinct
    stopwords from the canonical 8-word list.  One tokenize pass per batch;
    stopword hits via Arrow ``index_in`` + one packed np.unique for the
    per-doc distinct count — no shuffle at all (pure map), which is the
    whole point at 100 TB: quality filtering streams.
    """

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"doc_id": batch.column("doc_id"),
                 "word_count": pa.array([], pa.int64()),
                 "mean_word_len": pa.array([], pa.float64()),
                 "stop_hits": pa.array([], pa.int64()),
                 "passes": pa.array([], pa.bool_())}
            )
        wc, mwl, stops, passes = _gopher_metrics(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "word_count": pa.array(wc),
                "mean_word_len": pa.array(mwl),
                "stop_hits": pa.array(stops),
                "passes": pa.array(passes),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def curate_corpus(ds, n: int = 5, min_df: int = 2, ppm_per_word: int = 5000,
                  mult: int | None = None, mod: int | None = None):
    """The end-to-end training-data curation pipeline, composed from the
    engine's own stages and streamed start to finish:

        exact dedup (keep min-id doc per distinct text)
        -> boilerplate scrub (df >= min_df n-gram spans removed, df counted
           over the SURVIVORS — duplicates must not inflate df)
        -> Gopher quality filter ON THE CLEANED TEXT
        -> length-proportional deterministic resample (DoReMi-lite)

    -> (doc_id, clean_text, word_count).  Shuffle inventory: one (hash, id)
    dedup reduce, one distinct-key semi join, one gram-df reduce — each
    individually oracle-gated; the composition is gated as a whole by
    curate_corpus_sql.  Everything between shuffles is batch-local Arrow/
    numpy, so the pipeline streams at 100 TB with only the frequent-gram
    set materialized."""
    from .gridops import SAMPLE_MOD, SAMPLE_MULT
    from .join import hash_semi_join

    mult = SAMPLE_MULT if mult is None else mult
    mod = SAMPLE_MOD if mod is None else mod

    surv_ids = exact_dedup(ds)  # (text_md5, doc_id)
    # materialize ONCE: frequent_grams eagerly consumes this dataset and
    # scrub_boilerplate reads it again — without the barrier the dedup
    # shuffle + semi join (the pipeline's heaviest stages) execute twice
    survivors = hash_semi_join(
        ds, surv_ids, left_key="doc_id", right_key="doc_id"
    ).materialize()
    cleaned = remove_boilerplate(survivors, n=n, min_df=min_df)
    return cleaned.map_batches(
        lambda b: curation_finalize(b, ppm_per_word, mult, mod),
        batch_format="pyarrow",
    )


def curation_finalize(batch: pa.Table, ppm_per_word: int,
                      mult: int, mod: int) -> pa.Table:
    """The curation tail shared by :func:`curate_corpus` and
    ``pipelines.resumable.curation_resumable``: Gopher filter on the
    cleaned text + length-proportional deterministic resample ->
    (doc_id, clean_text, word_count).  One definition keeps the one-shot
    and sharded-resumable paths bit-identical."""
    if len(batch) == 0:
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "clean_text": pa.array([], pa.string()),
             "word_count": pa.array([], pa.int64())}
        )
    wc, _, _, passes = _gopher_metrics(batch.column("clean_text"))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ppm = np.minimum(np.int64(mod), wc * np.int64(ppm_per_word))
    keep = passes & (((ids % mod) * (mult % mod)) % mod < ppm)
    out = batch.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": out.column("doc_id"),
            "clean_text": out.column("clean_text"),
            "word_count": pa.array(wc[keep]),
        }
    )


HOST_MIN_PAGES = 3
HOST_MIN_PASS_RATE = 0.34


def host_quality(pages_ds, min_pages: int = HOST_MIN_PAGES,
                 min_pass_rate: float = HOST_MIN_PASS_RATE,
                 level: str = "host", n_parts: int | None = None):
    """pages -> (host, n_pages, n_pass, pass_rate, blocked): per-DOMAIN
    quality gating (the UT1/RefinedWeb "bad domain" list, derived from the
    data instead of curated): aggregate the Gopher pass flag per domain;
    domains with >= ``min_pages`` pages and a pass rate below
    ``min_pass_rate`` are blocked (low-quality domains); smaller domains
    are never blocked (insufficient evidence).  ``level`` picks the
    grouping granularity: "host" (full hostname) or "tld" (registrable
    suffix — the driver corpus has ~1 page per host, so the TLD level is
    where the gate has statistical power).

    Scale shape: the Gopher kernel runs batch-local; only (host, n, pass)
    partials shuffle — one bounded host-keyed reduce (hosts ~ 10^7 at
    100 TB, far below page count); the blocklist this produces is
    broadcast-sized by construction and feeds a semi/anti join
    (:func:`..stages.join.hash_semi_join`) to filter the page stream."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd

    from ..functions.hashing import coarse_partition, fnv_token_hash64

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "host": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()), "p": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int64())}
            )
        host = pc.list_element(pc.split_pattern(batch.column("url"), pattern="/"), 2)
        if level == "tld":
            # Arrow list_element rejects negative indices; strip up to the
            # last dot instead (equivalent to split('.')[-1])
            host = pc.replace_substring_regex(host, r"^.*\.", "")
        _, _, _, passes = _gopher_metrics(batch.column("text"))
        dic = host.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(codes, minlength=len(dic.dictionary)).astype(np.int64)
        p = np.bincount(codes, weights=passes.astype(np.float64),
                        minlength=len(dic.dictionary)).astype(np.int64)
        key = fnv_token_hash64(dic.dictionary).view(np.int64)
        return pa.table(
            {
                "key": pa.array(key),
                "host": dic.dictionary,
                "n": pa.array(n),
                "p": pa.array(p),
                "__part": pa.array(coarse_partition(key, n_parts)),
            }
        )

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", sort=False)
        n = g["n"].sum()
        p = g["p"].sum()
        host = g["host"].first()
        rate = p.to_numpy(np.float64) / n.to_numpy(np.float64)
        blocked = (n.to_numpy(np.int64) >= min_pages) & (rate < min_pass_rate)
        return pd.DataFrame(
            {
                "host": host.to_numpy(object),
                "n_pages": n.to_numpy(np.int64),
                "n_pass": p.to_numpy(np.int64),
                "pass_rate": rate,
                "blocked": blocked,
            }
        )

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part)
    )


PMI_MIN_PAIR = 5


def bigram_pmi(ds, min_pair: int = PMI_MIN_PAIR, n_parts: int | None = None):
    """documents -> (w1, w2, pair_count, pmi): pointwise mutual information
    of consecutive within-doc token pairs — the classic collocation
    extractor (pairs that co-occur far above chance):

        pmi = ln(pair_count * N / (count(w1) * count(w2))),  N = total tokens

    Plan: unigram totals and bigram totals each reduce with the
    top_bigrams hash-partition shape (strings ride the int64 token-hash
    key); the bigram table then picks up both unigram counts through TWO
    keyed shuffle joins (vocabulary can be ~10^8 at web scale — never a
    broadcast); N is one scalar aggregate.  ``min_pair`` bounds the output
    to pairs with real evidence."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    from ray.data.aggregate import Sum

    from ..functions.hashing import coarse_partition, fnv_token_hash64

    def tok_partials(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _doc_tokens(batch)
        if len(toks) == 0:
            return pa.table(
                {"tkey": pa.array([], pa.int64()), "tok": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
            )
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(dic.dictionary)).astype(np.int64)
        key = fnv_token_hash64(dic.dictionary).view(np.int64)
        return pa.table(
            {
                "tkey": pa.array(key),
                "tok": dic.dictionary,
                "cnt": pa.array(cnt),
                "__part": pa.array(coarse_partition(key, n_parts)),
            }
        )

    def reduce_tok(part: pa.Table) -> pa.Table:
        key = part.column("tkey").to_numpy(zero_copy_only=False)
        cnt = part.column("cnt").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cnt.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        first = np.full(len(uniq), len(key), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(key)))
        return pa.table(
            {
                "tkey": pa.array(uniq),
                "tok": part.column("tok").take(pa.array(first)),
                "cnt": pa.array(tot),
            }
        )

    uni = (
        ds.map_batches(tok_partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_tok, batch_format="pyarrow")
        .materialize()
    )
    n_total = int(uni.aggregate(Sum("cnt", alias_name="s"))["s"])

    def bigram_partials(batch: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(batch, 2)
        empty = pa.table(
            {"k1": pa.array([], pa.int64()), "k2": pa.array([], pa.int64()),
             "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "pair_count": pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
        )
        if len(grams) == 0:
            return empty
        # gram strings are "w1 w2": split back once per distinct gram
        dic = grams.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(dic.dictionary)).astype(np.int64)
        parts = pc_.split_pattern(dic.dictionary, pattern=" ")
        w1 = pc_.list_element(parts, 0)
        w2 = pc_.list_element(parts, 1)
        k1 = fnv_token_hash64(w1).view(np.int64)
        k2 = fnv_token_hash64(w2).view(np.int64)
        return pa.table(
            {
                "k1": pa.array(k1),
                "k2": pa.array(k2),
                "w1": w1,
                "w2": w2,
                "pair_count": pa.array(cnt),
                "__part": pa.array(coarse_partition(
                    fnv_token_hash64(dic.dictionary).view(np.int64), n_parts)),
            }
        )

    def reduce_bigram(part: pa.Table) -> pa.Table:
        k1 = part.column("k1").to_numpy(zero_copy_only=False)
        k2 = part.column("k2").to_numpy(zero_copy_only=False)
        cnt = part.column("pair_count").to_numpy(zero_copy_only=False)
        pair = np.stack([k1, k2], axis=1)
        uniq, inv = np.unique(pair, axis=0, return_inverse=True)
        tot = np.bincount(inv, weights=cnt.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        first = np.full(len(uniq), len(k1), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(k1)))
        keep = tot >= min_pair
        take = pa.array(first[keep])
        return pa.table(
            {
                "k1": part.column("k1").take(take),
                "k2": part.column("k2").take(take),
                "w1": part.column("w1").take(take),
                "w2": part.column("w2").take(take),
                "pair_count": pa.array(tot[keep]),
            }
        )

    # materialize between the shuffles: three chained all-to-all stages in
    # one streaming plan can deadlock the executor's resource reservation
    # (the cc BSP loop materializes per round for the same reason)
    big = (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_bigram, batch_format="pyarrow")
        .materialize()
    )

    def attach(big_ds, key_col: str, out_col: str):
        """Attach the unigram count for ``key_col`` as ``out_col`` via ONE
        tagged-union hash-partition lookup (the cc/dedup join shape — no
        join-operator actors, works at any vocabulary size)."""

        def tag_uni(b: pa.Table) -> pa.Table:
            z = pa.nulls(len(b), pa.int64())
            zs = pa.nulls(len(b), pa.string())
            cols = {"key": b.column("tkey"), "cnt": b.column("cnt"),
                    "kind": pa.array(np.zeros(len(b), dtype=np.int8))}
            for c in big_ds.schema().names:
                if c != key_col:
                    cols[c] = zs if c in ("w1", "w2") else z
            return pa.table(cols)

        def tag_big(b: pa.Table) -> pa.Table:
            cols = {"key": b.column(key_col),
                    "cnt": pa.nulls(len(b), pa.int64()),
                    "kind": pa.array(np.ones(len(b), dtype=np.int8))}
            for c in big_ds.schema().names:
                if c != key_col:
                    cols[c] = b.column(c)
            return pa.table(cols)

        def add_part(b: pa.Table) -> pa.Table:
            k = b.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column("__part", pa.array(coarse_partition(k, n_parts)))

        def resolve(part: pa.Table) -> pa.Table:
            kind = part.column("kind").to_numpy(zero_copy_only=False)
            key = part.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            cnt = part.column("cnt").to_numpy(zero_copy_only=False)
            ukey = key[kind == 0]
            ucnt = cnt[kind == 0].astype(np.int64)
            order = np.argsort(ukey, kind="stable")
            ukey, ucnt = ukey[order], ucnt[order]
            rows = part.filter(pa.array(kind == 1))
            rk = rows.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(ukey, rk)
            # every bigram token exists in the unigram table by construction
            looked = ucnt[np.minimum(pos, max(len(ukey) - 1, 0))] if len(ukey) else np.zeros(len(rk), np.int64)
            out = {c: rows.column(c) for c in big_ds.schema().names if c != key_col}
            out[out_col] = pa.array(looked)
            return pa.table(out)

        tagged = uni.map_batches(tag_uni, batch_format="pyarrow").union(
            big_ds.map_batches(tag_big, batch_format="pyarrow")
        )
        return (
            tagged.map_batches(add_part, batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(resolve, batch_format="pyarrow")
        )

    j = attach(attach(big, "k1", "c1").materialize(), "k2", "c2")

    def pmi(batch: pa.Table) -> pa.Table:
        cab = batch.column("pair_count").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = batch.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        val = np.log((cab * float(n_total)) / (c1 * c2))
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "pair_count": batch.column("pair_count"),
                "pmi": pa.array(val),
            }
        )

    return j.map_batches(pmi, batch_format="pyarrow")


PASSAGE_W = 8


def passage_dedup(ds, w: int = PASSAGE_W, n_parts: int | None = None):
    """documents -> (doc_id, n_passages, n_dup_passages): chunk each doc
    into NON-OVERLAPPING full windows of ``w`` whitespace tokens (the
    RefinedWeb/CCNet passage-hashing granularity — tail tokens short of a
    full window are dropped), and count per doc how many of those passage
    instances also occur in at least one OTHER document.  Docs shorter than
    ``w`` tokens emit no row.

    Scale shape: one stateless tokenize+window ``map_batches`` pass emits
    (doc_id, passage_hash, cnt) with batch-local (doc, hash) dedup-to-
    counts — a doc never splits across batches, so these pairs are globally
    distinct and the heaviest shuffle moves 20 bytes per DISTINCT passage
    per doc, never text.  Passages then hash-partition (same
    partition-count pattern as :func:`..stages.join.grouped_distinct_count`)
    so "appears in >= 2 docs" is one vectorized ``value_counts`` per
    partition; per-doc rollup is a bounded Sum groupby.  The passage
    identity is :func:`..functions.hashing.poly_hash64` of the
    space-joined window — the ORACLE computes the identical hash (HUGEINT
    FNV fold + splitmix64), so even a 2^-64 collision cannot diverge the
    comparison.
    """

    n_parts = default_parts() if n_parts is None else n_parts
    def windows(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "__part": pa.array([], pa.int64()),
        })
        doc_idx, toks = _doc_tokens(batch)
        n = len(doc_idx)
        if n == 0:
            return empty
        bnd = np.flatnonzero(np.diff(doc_idx) != 0) + 1
        run_starts = np.concatenate((np.zeros(1, np.int64), bnd))
        run_lens = np.diff(np.concatenate((run_starts, [n])))
        pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, run_lens)
        rl = np.repeat(run_lens, run_lens)
        s = np.flatnonzero((pos % w == 0) & (pos + w <= rl))
        if len(s) == 0:
            return empty
        parts = [pc.take(toks, pa.array(s + j)) for j in range(w)]
        wins = pc.binary_join_element_wise(*parts, " ")
        if isinstance(wins, pa.ChunkedArray):
            wins = wins.combine_chunks()
        h = hashing.poly_hash64(wins).view(np.int64)
        wdoc = doc_idx[s]
        order = np.lexsort((h, wdoc))
        hs, ds_ = h[order], wdoc[order]
        new = np.ones(len(hs), dtype=bool)
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(hs)])))
        hu, du = hs[starts], ds_[starts]
        part = (hu.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(du),
            "h": pa.array(hu),
            "cnt": pa.array(cnt.astype(np.int64)),
            "__part": pa.array(part),
        })

    def mark(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        # rows are globally-distinct (doc, h) pairs: docs-per-passage is
        # the plain row count per h within its partition
        n_docs = df.groupby("h")["doc_id"].transform("size")
        dup = (n_docs >= 2).to_numpy()
        cnt = df["cnt"].to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_passages": cnt,
            "n_dup_passages": np.where(dup, cnt, 0).astype(np.int64),
        })

    from ..functions.reduce import hash_groupby

    return hash_groupby(
        ds.map_batches(windows, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(mark, batch_format="pandas"),
        "doc_id", ["n_passages", "n_dup_passages"], how="isum",
    )


def host_gini(pages_ds):
    """pages -> (tld, n_hosts, n_pages, gini): per-TLD Gini coefficient of
    the host page-count distribution — the crawl-concentration inequality
    metric (gini 0 = every host equal, -> 1 = one host dominates), the
    domain-diversity health check a corpus-curation pipeline runs before
    sampling.

    Exactness: ranks enter Gini only through ``sum(rank * x)`` over counts
    sorted ascending, which is TIE-ORDER INVARIANT — so the engine never
    ranks at all.  It reduces (tld, host) page counts (one shuffle over
    distinct hosts), histograms them to (tld, count_value, multiplicity)
    (bounded by distinct count VALUES — tiny), and closes the formula per
    run of equal values: a run of m hosts with count x starting at rank s
    contributes ``x * (m*s + m*(m-1)/2)``.  All moments are arbitrary-
    precision Python ints (n * total overflows int64 at web scale); the one
    float is the final ``(2*S1 - (n+1)*S0) / (n*S0)`` division, identical
    expression tree to the HUGEINT oracle."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def local(batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        host = pc.list_element(pc.split_pattern(url, pattern="/"), 2)
        tld = pc.list_element(
            pc.split_pattern(host, pattern=".", max_splits=1, reverse=True), 1
        )
        df = pd.DataFrame({
            "tld": tld.to_numpy(zero_copy_only=False),
            "host": host.to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["tld", "host"], sort=False).size().reset_index(name="x")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        pages_ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby(["tld", "host"])
        .aggregate(Sum("x", alias_name="x"))
    )

    def hist(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "tld": batch.column("tld").to_numpy(zero_copy_only=False),
            "x": batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby(["tld", "x"], sort=False).size().reset_index(name="m")
        return pa.Table.from_pandas(g, preserve_index=False)

    histo = (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby(["tld", "x"])
        .aggregate(Sum("m", alias_name="m"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tld, g in df.groupby("tld", sort=True):
            g = g.sort_values("x", kind="mergesort")
            s, s0, s1, n = 1, 0, 0, 0   # python ints: exact at any scale
            for x, m in zip(g["x"].tolist(), g["m"].tolist()):
                x, m = int(x), int(m)
                s1 += x * (m * s + m * (m - 1) // 2)
                s0 += x * m
                n += m
                s += m
            gini = float(2 * s1 - (n + 1) * s0) / float(n * s0)
            rows.append((tld, n, s0,
                         np.floor(gini * 1e6 + 0.5) / 1e6))
        return pd.DataFrame(rows, columns=["tld", "n_hosts", "n_pages", "gini"])

    return histo.repartition(1).map_batches(finish, batch_format="pandas",
                                            batch_size=None)


def snapshot_merge(base_ds, changes_ds, key_col: str = "key"):
    """MERGE INTO semantics in one key shuffle: apply a changeset of
    upserts and deletes to a base snapshot — the CDC-apply step of any
    incrementally-maintained corpus (crawl refresh with removals, GDPR
    deletes, re-extraction fixups).

    ``base_ds``: rows with ``key_col`` + payload columns.  ``changes_ds``:
    same payload columns plus ``op`` ('upsert' | 'delete'); at most one
    change per key (the caller's CDC compaction contract — violated input
    raises).  Result: base rows whose key has no change, minus deleted
    keys, plus upserted rows (replacing the base row when the key exists).

    Scale shape: both sides hash-partition by key (one all-to-all each, no
    broadcast — the changeset can be any size), and each partition resolves
    with one vectorized sorted-membership pass: a base row survives iff its
    key is absent from the change keys; upsert rows pass through."""
    import ray

    from ..functions.hashing import coarse_partition

    N_PARTS = default_parts()

    payload = [c for c in base_ds.schema().names if c != key_col]

    def tag_base(batch: pa.Table) -> pa.Table:
        # union needs identical schemas: base rows carry op='' (never read)
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.select([key_col, *payload])
        t = t.append_column("op", pa.array([""] * len(k), pa.string()))
        return t.append_column(
            "__kind", pa.array(np.zeros(len(k), np.int8))
        ).append_column("__part", pa.array(coarse_partition(k, N_PARTS)))

    def tag_change(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.select([key_col, *payload, "op"])
        return t.append_column(
            "__kind", pa.array(np.ones(len(k), np.int8))
        ).append_column("__part", pa.array(coarse_partition(k, N_PARTS)))

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ch = df[df["__kind"] == 1]
        ck = ch[key_col].to_numpy().astype(np.int64)
        if len(np.unique(ck)) != len(ck):
            raise ValueError(
                "snapshot_merge: multiple changes for one key — compact the "
                "changeset (latest change per key) before applying")
        base = df[df["__kind"] == 0]
        bk = base[key_col].to_numpy().astype(np.int64)
        cks = np.sort(ck)
        if len(cks):
            pos = np.minimum(np.searchsorted(cks, bk), len(cks) - 1)
            keep = cks[pos] != bk
        else:
            keep = np.ones(len(bk), bool)
        out = pd.concat(
            [base[keep][[key_col, *payload]],
             ch[ch["op"] == "upsert"][[key_col, *payload]]],
            ignore_index=True,
        )
        return out

    tagged = base_ds.map_batches(tag_base, batch_format="pyarrow") \
        .union(changes_ds.map_batches(tag_change, batch_format="pyarrow"))
    return tagged.groupby("__part").map_groups(resolve, batch_format="pandas")


def len_percentile(docs_ds):
    """documents -> (doc_id, n_chars, pct_rank): each document's exact
    percentile rank by length — ``percent_rank()``: (count of strictly
    shorter docs) / (n - 1), ties share the minimum rank.  The
    corpus-curation primitive behind 'drop the bottom X% by length'
    policies when the cut must be exact and reproducible.

    Scale shape: ONE bounded value-histogram shuffle (only (n_chars, count)
    pairs move — cardinality = |distinct lengths|), the cumulative
    strictly-less table broadcasts (tiny), and the label pass is a
    stateless searchsorted per batch.  The one float is the final
    division, identical expression tree to the SQL twin."""
    import ray

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        docs_ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        "value", ["cnt"], how="isum",
    ).to_pandas().sort_values("value")
    v = hist["value"].to_numpy().astype(np.int64)
    c = hist["cnt"].to_numpy().astype(np.int64)
    n = int(c.sum())
    if n < 2:
        raise ValueError("len_percentile: needs >= 2 documents — "
                         "percent_rank over n-1 is undefined")
    cum_lt = np.concatenate(([0], np.cumsum(c)[:-1]))  # strictly-less count
    ref = ray.put((v, cum_lt))

    def label(batch: pa.Table) -> pa.Table:
        vs, lts = ray.get(ref)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vs, x)  # x is always present in vs
        pct = lts[pos].astype(np.float64) / (n - 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(x),
            "pct_rank": pa.array(np.floor(pct * 1e6 + 0.5) / 1e6),
        })

    return docs_ds.map_batches(label, batch_format="pyarrow")


NB_TRAIN_MOD = 2


def nb_lang_classify(ds, train_mod: int = NB_TRAIN_MOD,
                     n_parts: int | None = None):
    """documents -> (doc_id, pred_lang, score): a multinomial
    naive-Bayes-style language classifier with EXACT INTEGER scoring —
    train per-(token, lang) instance counts on the ``doc_id % train_mod
    == 0`` half, then score every doc as ``sum over its token instances
    of the train count for each candidate lang`` and pick the argmax
    (ties -> lexicographically smallest lang).  Integer additive scoring
    (instead of log-prob floats) keeps train + inference bit-reproducible
    in DuckDB — the same reason :func:`tfidf` uses rational idf.

    Scale shape: ONE scan emits both sides tagged — (doc, token, tf)
    postings for every doc and per-batch-pre-aggregated (token, lang, cnt)
    model partials for train docs — keyed by the 64-bit token hash
    (:func:`..functions.hashing.fnv_token_hash64`, the tfidf df
    discipline: a 2^-64 cross-token collision is the accepted risk);
    each coarse hash partition then finishes the model counts and scores
    its postings with ONE pandas hash-merge.  Per-doc totals reduce
    through a packed (doc, lang) int64 hash_groupby, and the argmax is a
    coarse doc-keyed partition with one lexsort — Python per partition,
    never per doc.  Docs sharing no token with the train vocabulary are
    absent from the output (inner-join semantics, mirrored in SQL)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64
    from ..functions.reduce import hash_groupby

    langs = sorted(ds.unique("lang"))  # bounded label set (an aggregate)
    n_l = len(langs)
    lang_keys = pa.array(langs, pa.string())
    lang_np = np.array(langs)

    EMPTY = pa.schema([
        ("key", pa.int64()), ("kind", pa.int8()), ("doc_id", pa.int64()),
        ("lang_code", pa.int64()), ("n", pa.int64()), ("__part", pa.int64()),
    ])

    def tagged(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _doc_tokens(batch)
        if len(doc_idx) == 0:
            return EMPTY.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = codes.max() + 1
        # (doc, token) tf rows
        packed = doc_idx * n_codes + codes
        u, tf = np.unique(packed, return_counts=True)
        u_doc, u_code = u // n_codes, u % n_codes
        thash = fnv_token_hash64(dic.dictionary.take(pa.array(u_code))) \
            .view(np.int64)
        post = pa.table({
            "key": pa.array(thash),
            "kind": pa.array(np.ones(len(u), np.int8)),
            "doc_id": pa.array(u_doc),
            "lang_code": pa.array(np.zeros(len(u), np.int64)),
            "n": pa.array(tf.astype(np.int64)),
            "__part": pa.array(hashing.coarse_partition(thash, n_parts)),
        })
        # model partials: train docs only, (token, lang) instance counts
        lc_of_row = pc_.index_in(batch.column("lang"), value_set=lang_keys) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        d_ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # doc_idx holds doc IDS; recover batch row position to fetch lang
        # (ids are unique per batch; argsort+searchsorted handles any order)
        sort_idx = np.argsort(d_ids, kind="stable")
        row_of = sort_idx[np.searchsorted(d_ids[sort_idx], u_doc)]
        is_train = (u_doc % train_mod) == 0
        m_code, m_lang, m_tf = (u_code[is_train], lc_of_row[row_of[is_train]],
                                tf[is_train].astype(np.int64))
        mp = m_code * n_l + m_lang
        mu, minv = np.unique(mp, return_inverse=True)
        mcnt = np.zeros(len(mu), np.int64)
        np.add.at(mcnt, minv, m_tf)
        mhash = fnv_token_hash64(
            dic.dictionary.take(pa.array(mu // n_l))).view(np.int64)
        model = pa.table({
            "key": pa.array(mhash),
            "kind": pa.array(np.zeros(len(mu), np.int8)),
            "doc_id": pa.array(np.zeros(len(mu), np.int64)),
            "lang_code": pa.array(mu % n_l),
            "n": pa.array(mcnt),
            "__part": pa.array(hashing.coarse_partition(mhash, n_parts)),
        })
        return pa.concat_tables([post, model]).combine_chunks()

    def score_part(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        model = df[df["kind"] == 0]
        post = df[df["kind"] == 1]
        # finish the model counts (partials from many batches repeat keys);
        # lexsort + reduceat, NOT key*n_l packing — hash keys span the full
        # int64 range, so packing would wrap
        k = model["key"].to_numpy(np.int64)
        lc = model["lang_code"].to_numpy(np.int64)
        mn = model["n"].to_numpy(np.int64)
        order = np.lexsort((lc, k))
        k, lc, mn = k[order], lc[order], mn[order]
        if len(k):
            new = np.ones(len(k), dtype=bool)
            new[1:] = (k[1:] != k[:-1]) | (lc[1:] != lc[:-1])
            starts = np.flatnonzero(new)
            mtab = pd.DataFrame({"key": k[starts], "lang_code": lc[starts],
                                 "cnt": np.add.reduceat(mn, starts)})
        else:
            mtab = pd.DataFrame({"key": k, "lang_code": lc, "cnt": mn})
        m = post[["key", "doc_id", "n"]].merge(mtab, on="key")
        if m.empty:
            return pd.DataFrame({"pk": np.array([], np.int64),
                                 "score": np.array([], np.int64)})
        pk = m["doc_id"].to_numpy(np.int64) * n_l \
            + m["lang_code"].to_numpy(np.int64)
        sc = m["n"].to_numpy(np.int64) * m["cnt"].to_numpy(np.int64)
        pu, pinv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(pu), np.int64)
        np.add.at(acc, pinv, sc)
        return pd.DataFrame({"pk": pu, "score": acc})

    scores = hash_groupby(
        ds.map_batches(tagged, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(score_part, batch_format="pandas"),
        "pk", ["score"], how="isum",
    )

    def add_doc_part(batch: pa.Table) -> pa.Table:
        d = batch.column("pk").to_numpy(zero_copy_only=False) // n_l
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(d, n_parts)))

    def pick(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pk = df["pk"].to_numpy(np.int64)
        sc = df["score"].to_numpy(np.int64)
        doc, code = pk // n_l, pk % n_l
        order = np.lexsort((code, -sc, doc))
        doc, code, sc = doc[order], code[order], sc[order]
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        return pd.DataFrame({
            "doc_id": doc[first],
            "pred_lang": lang_np[code[first]],
            "score": sc[first],
        })

    return (
        scores.map_batches(add_doc_part, batch_format="pyarrow",
                           batch_size=None)
        .groupby("__part")
        .map_groups(pick, batch_format="pandas")
    )


def pareto_docs(ds):
    """documents -> (doc_id, n_tokens, n_distinct): the PARETO FRONTIER
    (skyline) of docs over (token count, distinct-token count) — rows not
    dominated by any other doc (``b`` dominates ``a`` iff ``b.x >= a.x``
    and ``b.y >= a.y`` with at least one strict).  The "best corpus
    exemplars under two criteria at once" query; no weighting needed.

    Scale shape: the skyline's defining property — batch-local pruning is
    SOUND (a row dominated inside its batch is dominated globally) — makes
    this a map-then-resolve plan: each batch reduces to its local frontier
    with one vectorized sort + group-cummax pass (expected frontier of n
    random points is O(log n)), survivors union into a single partition,
    and the same pass resolves the global frontier.  The final resolve is
    declared frontier-sized (worst case — a fully anti-correlated metric
    pair — degenerates to all rows; these two metrics are positively
    correlated, the favorable case)."""

    def _metrics(batch: pa.Table):
        doc_idx, toks = _doc_tokens(batch)
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = codes.max() + 1 if len(codes) else 1
        packed = doc_idx * n_codes + codes
        up = np.unique(packed)
        d_tok = np.zeros(len(docs), np.int64)
        d_dis = np.zeros(len(docs), np.int64)
        # doc ids are unique per batch: map via sorted positions
        order = np.argsort(docs, kind="stable")
        pos_tok = order[np.searchsorted(docs[order], doc_idx)]
        np.add.at(d_tok, pos_tok, 1)
        pos_dis = order[np.searchsorted(docs[order], up // n_codes)]
        np.add.at(d_dis, pos_dis, 1)
        keep = d_tok > 0  # empty docs have no tokens: not comparable, drop
        return docs[keep], d_tok[keep], d_dis[keep]

    def _frontier(doc: np.ndarray, x: np.ndarray, y: np.ndarray):
        # sort x desc, y desc; survivors: y == group-max(y) of their x AND
        # that max strictly exceeds the running max over greater x
        order = np.lexsort((doc, -y, -x))
        doc, x, y = doc[order], x[order], y[order]
        new_x = np.ones(len(x), dtype=bool)
        new_x[1:] = x[1:] != x[:-1]
        gid = np.cumsum(new_x) - 1
        gmax = y[new_x]  # first row of each x-group has its max y (sorted)
        before = np.concatenate(([np.iinfo(np.int64).min],
                                 np.maximum.accumulate(gmax)[:-1]))
        keep = (y == gmax[gid]) & (gmax[gid] > before[gid])
        return doc[keep], x[keep], y[keep]

    def local(batch: pa.Table) -> pa.Table:
        doc, x, y = _metrics(batch)
        doc, x, y = _frontier(doc, x, y)
        return pa.table({"doc_id": pa.array(doc), "n_tokens": pa.array(x),
                         "n_distinct": pa.array(y)})

    def resolve(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("n_distinct").to_numpy(zero_copy_only=False).astype(np.int64)
        doc, x, y = _frontier(doc, x, y)
        return pa.table({"doc_id": pa.array(doc), "n_tokens": pa.array(x),
                         "n_distinct": pa.array(y)})

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(resolve, batch_format="pyarrow", batch_size=None)
    )


def host_rank(ds):
    """documents -> (doc_id, host, rk, n_host): the per-HOST length rank
    window — ``rk`` = 1-based rank of the doc inside its host by
    (text length, doc_id) and ``n_host`` = host size; the within-site
    ordering a per-host quota sampler consumes.

    Scale shape: the events-family discipline — ONE coarse host-keyed
    shuffle, then each partition ranks every host it owns with one lexsort
    + segment-relative positions (Python per PARTITION, never per host)."""
    from ..functions import geocode

    def add_part(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        host = geocode.host_id(d)
        ln = pc.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(d), "host": pa.array(host),
            "len": pa.array(ln),
            "__part": pa.array(hashing.coarse_partition(host, 64)),
        })

    def solve(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        h = df["host"].to_numpy(np.int64)
        ln = df["len"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        order = np.lexsort((d, ln, h))
        h, ln, d = h[order], ln[order], d[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rk = np.arange(len(h), dtype=np.int64) - starts[seg] + 1
        sizes = np.diff(np.concatenate((starts, [len(h)])))
        return pd.DataFrame({"doc_id": d, "host": h, "rk": rk,
                             "n_host": sizes[seg]})

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(solve, batch_format="pandas")
    )


def cluster_terms(docs_ds, assign_ds, top_k: int = 5):
    """(documents, kmeans assignment) -> (cluster, rank, token, n): the
    top tokens per embedding cluster — the BERTopic-style "what is this
    cluster about" report, composing the exact fixed-point k-means
    assignment with the corpus tokenizer.

    Scale shape: assignment rows and per-doc (token, tf) partials meet in
    ONE doc-keyed tagged coarse-partition merge (both sides are |docs|-
    scale — neither broadcasts); each partition re-expands to (cluster,
    token) instance rows which feed :func:`..stages.gridops.grouped_topk`
    (its batch-local pre-count collapses them again before the bounded
    (cluster, token) shuffle).  Ties -> token ascending, matching SQL."""
    from .gridops import grouped_topk

    EMPTY = pa.schema([
        ("key", pa.int64()), ("kind", pa.int8()), ("token", pa.string()),
        ("tf", pa.int64()), ("cluster", pa.int64()), ("__part", pa.int64()),
    ])

    def doc_tokens(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _doc_tokens(batch)
        if len(doc_idx) == 0:
            return EMPTY.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = codes.max() + 1
        packed = doc_idx * n_codes + codes
        u, tf = np.unique(packed, return_counts=True)
        u_doc, u_code = u // n_codes, u % n_codes
        return pa.table({
            "key": pa.array(u_doc),
            "kind": pa.array(np.ones(len(u), np.int8)),
            "token": dic.dictionary.take(pa.array(u_code)),
            "tf": pa.array(tf.astype(np.int64)),
            "cluster": pa.array(np.zeros(len(u), np.int64)),
            "__part": pa.array(hashing.coarse_partition(u_doc, 64)),
        })

    def assign_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(v),
            "kind": pa.array(np.zeros(len(v), np.int8)),
            "token": pa.array([""] * len(v), pa.string()),
            "tf": pa.array(np.zeros(len(v), np.int64)),
            "cluster": batch.column("cluster"),
            "__part": pa.array(hashing.coarse_partition(v, 64)),
        })

    def join_expand(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        a = df[df["kind"] == 0][["key", "cluster"]]
        t = df[df["kind"] == 1][["key", "token", "tf"]]
        m = t.merge(a, on="key")
        idx = np.repeat(np.arange(len(m)), m["tf"].to_numpy(np.int64))
        return pd.DataFrame({
            "cluster": m["cluster"].to_numpy(np.int64)[idx],
            "token": m["token"].to_numpy()[idx],
        })

    joined = (
        docs_ds.map_batches(doc_tokens, batch_format="pyarrow")
        .union(assign_ds.map_batches(assign_rows, batch_format="pyarrow",
                                     batch_size=None))
        .groupby("__part")
        .map_groups(join_expand, batch_format="pandas")
    )
    return grouped_topk(joined, "cluster", "token", by="n", k=top_k)


def hosts_division(ds, lang: str = "en"):
    """documents -> (host, n_docs): hosts where EVERY doc is in ``lang`` —
    relational DIVISION (the "suppliers who supply all parts" operator
    shape), here "sites that are monolingually {lang}".

    Scale shape: one host-keyed exact reduce carrying (total, matching)
    counts — division closes batch-locally as total == matching; the
    shuffle moves two ints per distinct host."""
    import pyarrow.compute as pc_

    from ..functions import geocode
    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        host = geocode.host_id(d)
        is_l = pc_.equal(batch.column("lang"), lang).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(host, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        match = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, 1)
        np.add.at(match, inv, is_l)
        return pa.table({"host": pa.array(uniq), "tot": pa.array(tot),
                         "match": pa.array(match)})

    red = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "host", ["tot", "match"], how="isum",
    )

    def keep_all(batch: pa.Table) -> pa.Table:
        tot = batch.column("tot").to_numpy(zero_copy_only=False)
        match = batch.column("match").to_numpy(zero_copy_only=False)
        k = tot == match
        return pa.table({
            "host": pa.array(batch.column("host").to_numpy(
                zero_copy_only=False)[k]),
            "n_docs": pa.array(tot[k]),
        })

    return red.map_batches(keep_all, batch_format="pyarrow")


QUOTA_K = 20


def quota_sample(ds, group_col: str = "lang", k: int = QUOTA_K,
                 mult: int = SPLIT_MULT, mod: int = SPLIT_MOD):
    """documents -> (doc_id, <group_col>, bucket): a DETERMINISTIC k-PER-
    GROUP sample — each group keeps its k docs with the smallest
    multiplicative-hash bucket (ties -> doc_id), the quota/stratified
    sampler that gives every language equal representation regardless of
    prior (and, unlike RNG reservoirs, is reproducible across engines,
    reruns and partitionings — the :func:`split_assign` argument).

    Scale shape: per batch, each group pre-prunes to its local k BEFORE
    anything shuffles (a batch can only contribute k survivors per
    group), then one bounded groupwise resolve over <= k * n_batches
    candidate rows."""
    import pandas as pd

    def local(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        b = ((d % mod) * (mult % mod)) % mod
        df = pd.DataFrame({"doc_id": d, group_col: g, "bucket": b})
        df = df.sort_values(["bucket", "doc_id"], kind="mergesort") \
            .groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["bucket", "doc_id"], kind="mergesort") \
            .groupby(group_col, sort=False).head(k)
        return out.reset_index(drop=True)

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby(group_col)
        .map_groups(resolve, batch_format="pandas")
    )


SPAN_W = 8


def dup_span_coverage(ds, w: int = SPAN_W, n_parts: int | None = None):
    """documents -> (doc_id, n_tokens, covered): EXACT-SUBSTRING span
    coverage — slide an OVERLAPPING ``w``-token window (stride 1) over
    every doc, mark windows whose gram also appears in ANOTHER doc, and
    count per doc how many token positions fall under at least one marked
    window (the interval-union "how much of this doc is copied" metric;
    :func:`passage_dedup`'s non-overlapping windows count instances, this
    measures coverage).  Docs shorter than w emit no row.

    Scale shape: (gram-hash, doc, pos) rows hash-partition once — the
    cross-doc test is a distinct-doc count per hash inside its partition;
    surviving (doc, pos) rows take ONE doc-keyed coarse shuffle where a
    segmented sorted-starts pass closes the interval union
    (``sum min(next_start - start, w)`` + w per last run) — Python per
    partition, never per doc.  Gram identity is the 64-bit token-sequence
    hash (the tfidf df discipline: 2^-64 cross-gram collision accepted)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd
    import pyarrow.compute as pc_

    def grams(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "__part": pa.array([], pa.int64()),
        })
        doc_idx, toks = _doc_tokens(batch)
        n = len(doc_idx)
        if n == 0:
            return empty
        bnd = np.flatnonzero(np.diff(doc_idx) != 0) + 1
        run_starts = np.concatenate((np.zeros(1, np.int64), bnd))
        run_lens = np.diff(np.concatenate((run_starts, [n])))
        pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, run_lens)
        rl = np.repeat(run_lens, run_lens)
        s = np.flatnonzero(pos + w <= rl)  # every stride-1 window start
        meta_doc = doc_idx[run_starts]
        meta_len = run_lens
        keep_meta = meta_len >= w
        if len(s) == 0:
            return empty
        parts = [pc_.take(toks, pa.array(s + j)) for j in range(w)]
        wins = pc_.binary_join_element_wise(*parts, " ")
        if isinstance(wins, pa.ChunkedArray):
            wins = wins.combine_chunks()
        h = hashing.poly_hash64(wins).view(np.int64)
        meta = pa.table({
            "key": pa.array(np.zeros(int(keep_meta.sum()), np.int64)),
            "doc_id": pa.array(meta_doc[keep_meta]),
            "pos": pa.array(np.full(int(keep_meta.sum()), -1, np.int64)),
            "n_tokens": pa.array(meta_len[keep_meta]),
            "__part": pa.array(hashing.coarse_partition(
                meta_doc[keep_meta], n_parts) + n_parts),  # meta channel
        })
        gram_rows = pa.table({
            "key": pa.array(h),
            "doc_id": pa.array(doc_idx[s]),
            "pos": pa.array(pos[s]),
            "n_tokens": pa.array(np.zeros(len(s), np.int64)),
            "__part": pa.array(hashing.coarse_partition(h, n_parts)),
        })
        return pa.concat_tables([gram_rows, meta]).combine_chunks()

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "pos": np.array([], np.int64),
                                 "n_tokens": np.array([], np.int64)})
        if df["__part"].iloc[0] >= n_parts:
            return df[["doc_id", "pos", "n_tokens"]]  # meta passthrough
        k = df["key"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        order = np.lexsort((d, k))
        ks, ds_ = k[order], d[order]
        new_k = np.ones(len(ks), dtype=bool)
        new_k[1:] = ks[1:] != ks[:-1]
        new_kd = new_k.copy()
        new_kd[1:] |= ds_[1:] != ds_[:-1]
        seg = np.cumsum(new_k) - 1
        ndocs = np.bincount(seg[new_kd], minlength=seg[-1] + 1 if len(seg) else 0)
        dup = ndocs[seg] >= 2
        keep = np.zeros(len(df), dtype=bool)
        keep[order] = dup
        out = df[keep]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "pos": out["pos"].to_numpy(np.int64),
            "n_tokens": np.zeros(len(out), np.int64),
        })

    def add_doc_part(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__p2", pa.array(hashing.coarse_partition(d, n_parts)))

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        meta = df[df["pos"] < 0]
        posr = df[df["pos"] >= 0]
        d = posr["doc_id"].to_numpy(np.int64)
        p = posr["pos"].to_numpy(np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        cov = np.zeros(0, np.int64)
        du = np.zeros(0, np.int64)
        if len(d):
            new = np.ones(len(d), dtype=bool)
            new[1:] = d[1:] != d[:-1]
            seg = np.cumsum(new) - 1
            nseg = seg[-1] + 1
            gap = np.empty(len(d), np.int64)
            gap[:-1] = p[1:] - p[:-1]
            gap[-1] = w
            last = np.zeros(len(d), dtype=bool)
            last[:-1] = new[1:]
            last[-1] = True
            contrib = np.where(last, w, np.minimum(gap, w))
            cov = np.bincount(seg, weights=contrib, minlength=nseg) \
                .astype(np.int64)
            du = d[new]
        md = meta["doc_id"].to_numpy(np.int64)
        mn = meta["n_tokens"].to_numpy(np.int64)
        pos_map = pd.Series(cov, index=du)
        covered = pos_map.reindex(md).fillna(0).to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": md, "n_tokens": mn,
                             "covered": covered})

    rows = ds.map_batches(grams, batch_format="pyarrow", batch_size=None)
    marked = rows.groupby("__part").map_groups(mark, batch_format="pandas")
    return (
        marked.map_batches(add_doc_part, batch_format="pyarrow",
                           batch_size=None)
        .groupby("__p2")
        .map_groups(coverage, batch_format="pandas")
    )


OOV_VOCAB_K = 1000


def oov_rate(ds, vocab_k: int = OOV_VOCAB_K, n_parts: int | None = None):
    """documents -> (doc_id, n_tokens, n_oov, oov_rate): per-document
    out-of-vocabulary rate against a vocabulary LEARNED from the corpus —
    the top ``vocab_k`` whitespace tokens by document frequency
    (ties: token ascending).  The tokenizer-coverage diagnostic every
    vocab-bounded training pipeline needs (is this doc mostly tokens the
    model has never seen?).

    Scale shape: phase A reuses the distinct-(doc, token) partials of
    :func:`tfidf` -> one token-hash bounded shuffle for df -> per-partition
    local top-k, driver merges n_parts * k rows (k-bounded, never the
    vocabulary); phase B broadcasts the k-token vocab once (``ray.put``)
    and scans docs batch-locally — exact STRING membership via pandas
    ``isin`` on each batch's token dictionary (never per-token hash
    equality, which could silently collide).  No doc rows ever shuffle.
    Docs with zero tokens are absent (no denominator), matching the SQL.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64

    def df_partial(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_id) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = row_idx * (codes.max() + 1) + codes
        _, uidx = np.unique(packed, return_index=True)
        ucodes = codes[uidx]
        uniq_c, cnt = np.unique(ucodes, return_counts=True)
        tok_arr = dic.dictionary.take(pa.array(uniq_c))
        thash = fnv_token_hash64(tok_arr).view(np.int64)
        return pa.table({
            "token": tok_arr,
            "df": pa.array(cnt.astype(np.int64)),
            "__part": pa.array(hashing.coarse_partition(thash, n_parts)),
        })

    def topk_of_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["df"].sum().reset_index()
        g = g.sort_values(["df", "token"], ascending=[False, True],
                          kind="mergesort").head(vocab_k)
        return g[["token", "df"]]

    local = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(topk_of_part, batch_format="pandas")
        .to_pandas()  # n_parts * vocab_k rows — k-bounded, never |vocab|
    )
    local = local.sort_values(["df", "token"], ascending=[False, True],
                              kind="mergesort").head(vocab_k)
    vocab = set(local["token"].tolist())
    import ray
    vocab_ref = ray.put(vocab)

    def per_doc(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_oov": pa.array([], pa.int64()),
                          "oov_rate": pa.array([], pa.float64())})
        if len(doc_id) == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return empty
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        in_vocab = pd.Series(dic.dictionary.to_pandas()).isin(voc).to_numpy()
        n_tok = np.bincount(row_idx, minlength=len(doc_id)).astype(np.int64)
        oov = np.bincount(row_idx, weights=(~in_vocab[codes]).astype(np.float64),
                          minlength=len(doc_id)).astype(np.int64)
        has = n_tok > 0
        rate = np.floor(oov[has] / n_tok[has] * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": pa.array(doc_id[has]),
            "n_tokens": pa.array(n_tok[has]),
            "n_oov": pa.array(oov[has]),
            "oov_rate": pa.array(rate),
        })

    return ds.map_batches(per_doc, batch_format="pyarrow").sort("doc_id")


#: select docs (best n_chars first) until this fraction of total tokens
TOKEN_BUDGET_DEN = 4


def token_budget_select(ds, budget_den: int = TOKEN_BUDGET_DEN,
                        n_parts: int | None = None):
    """documents -> (doc_id, n_chars, n_tokens): greedy token-budget
    curation — walk docs in (n_chars DESC, doc_id ASC) order and keep
    every doc while the running token total stays <= total_tokens //
    ``budget_den`` (the "fill a 25% token budget with the longest docs
    first" selection a fixed-compute training run makes).

    Scale shape: ONE scan computes per-doc token counts and batch-local
    (n_chars, sum_tokens, n_docs) partials; the bounded value-histogram
    shuffles (distinct n_chars values, not docs); the driver walks the
    histogram CDF to find the threshold value and the leftover budget
    INSIDE the boundary bucket; only boundary-bucket docs (one histogram
    bin) go through the doc_id-ordered bounded resolve (the quota_sample
    discipline).  Full-bucket docs stream out with a batch-local filter.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd
    import pyarrow.compute as pc_

    from ..functions.reduce import hash_groupby

    def tok_counts(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_tok = np.bincount(row_idx[nonempty], minlength=len(doc_id)).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc_id), "n_chars": pa.array(nch),
                         "n_tokens": pa.array(n_tok)})

    counted = ds.map_batches(tok_counts, batch_format="pyarrow").materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        t = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(v, return_inverse=True)
        st = np.zeros(len(uniq), np.int64)
        np.add.at(st, inv, t)
        return pa.table({"n_chars": pa.array(uniq), "sum_tok": pa.array(st)})

    hist = hash_groupby(
        counted.map_batches(hist_partial, batch_format="pyarrow",
                            batch_size=None),
        "n_chars", ["sum_tok"], how="isum", n_parts=n_parts,
    ).to_pandas()  # bounded by distinct n_chars values
    hist = hist.sort_values("n_chars", ascending=False).reset_index(drop=True)
    total = int(hist["sum_tok"].sum())
    budget = total // budget_den
    cum = hist["sum_tok"].cumsum().to_numpy()
    vals = hist["n_chars"].to_numpy().astype(np.int64)
    # full buckets: every value v where cum(v) <= budget
    n_full = int(np.searchsorted(cum, budget, side="right"))
    thresh = int(vals[n_full - 1]) if n_full > 0 else None
    spent = int(cum[n_full - 1]) if n_full > 0 else 0
    boundary_val = int(vals[n_full]) if n_full < len(vals) else None
    remaining = budget - spent

    import ray
    full_ref = ray.put(thresh)

    def full_filter(batch: pa.Table) -> pa.Table:
        th = ray.get(full_ref)
        if th is None:
            return batch.slice(0, 0)
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v >= th))

    out_full = counted.map_batches(full_filter, batch_format="pyarrow",
                                   batch_size=None)
    if boundary_val is None or remaining <= 0:
        return out_full.sort("doc_id")

    # bounded resolve: ONE histogram bin of docs, doc_id-ordered prefix
    bval_ref = ray.put(boundary_val)

    def boundary_filter(batch: pa.Table) -> pa.Table:
        bv = ray.get(bval_ref)
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v == bv))

    bnd = counted.map_batches(boundary_filter, batch_format="pyarrow",
                              batch_size=None) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    bcum = bnd["n_tokens"].cumsum().to_numpy()
    keep = bnd[bcum <= remaining]
    import ray.data as rd
    out_bnd = rd.from_arrow(pa.table({
        "doc_id": pa.array(keep["doc_id"].to_numpy(np.int64)),
        "n_chars": pa.array(keep["n_chars"].to_numpy(np.int64)),
        "n_tokens": pa.array(keep["n_tokens"].to_numpy(np.int64)),
    }))
    return out_full.union(out_bnd).sort("doc_id")


def normalized_dedup(ds):
    """documents -> one survivor row (norm_md5, doc_id = min id, n_docs)
    per distinct NORMALIZED text — casefolded, whitespace runs collapsed —
    the canonicalizing dedup that catches trivially-reformatted copies
    exact_dedup misses (the CCNet/RefinedWeb "normalize before hashing"
    convention).  Both the lowercase and the \\s+ collapse are RE2/utf8
    kernels with identical semantics in DuckDB, so the oracle is exact.

    Scale shape: identical to exact_dedup — normalization + hashing are
    batch-local Arrow kernels; only (hash, id, 1) rows shuffle."""
    import pyarrow.compute as pc_

    from ..functions.reduce import hash_groupby
    from ray.data.aggregate import Count, Min

    def key(batch: pa.Table) -> pa.Table:
        norm = pc_.replace_substring_regex(
            pc_.utf8_lower(batch.column("text")), r"\s+", " ")
        return pa.table({
            "norm_md5": pa.array(textstats.md5_hex(norm)),
            "doc_id": batch.column("doc_id"),
        })

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("norm_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_docs"))
    )


BM25_QUERY = ("data", "web", "model", "train")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(ds, query: tuple = BM25_QUERY, k1: float = BM25_K1,
                b: float = BM25_B):
    """documents -> (doc_id, dl, bm25): Okapi BM25 relevance of every doc
    against a fixed ``query`` term set — the ranking function behind the
    inverted index (Lucene's +1 idf variant, so idf is never negative).

    Float parity with the oracle: the per-term scores are summed in ONE
    FIXED left-associative order (term 0 .. term Q-1 — SQL SUM order is
    unspecified, so the oracle pivots per-term columns and adds them with
    explicit parentheses, the polygon_density discipline); idf's ``ln``
    agrees with DuckDB within the canonical 1e-6 rounding (proven by the
    bigram_pmi / char_entropy oracles).

    Scale shape: two streaming scans — pass 1 reduces each batch to ONE
    row of corpus stats (N, total dl, per-term df); pass 2 recomputes
    tf/dl batch-locally and scores with the broadcast stats.  Nothing
    shuffles but the bounded stat partials."""
    import pyarrow.compute as pc_
    import ray
    import ray.data as rd

    q_terms = list(query)

    def _tf_dl(batch: pa.Table):
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = row_idx[nonempty]
        toks = flat.filter(pa.array(nonempty))
        dl = np.bincount(row_idx, minlength=len(doc_id)).astype(np.int64)
        tfs = []
        for t in q_terms:
            hit = pc_.equal(toks, t).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(row_idx[hit],
                                   minlength=len(doc_id)).astype(np.int64))
        return doc_id, dl, tfs

    def stats(batch: pa.Table) -> pa.Table:
        _, dl, tfs = _tf_dl(batch)
        cols = {"n_docs": pa.array([len(dl)], pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], pa.int64())}
        for i, tf in enumerate(tfs):
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    st = ds.map_batches(stats, batch_format="pyarrow") \
        .sum(["n_docs", "sum_dl"] + [f"df{i}" for i in range(len(q_terms))])
    n = int(st["sum(n_docs)"])
    sdl = int(st["sum(sum_dl)"])
    dfs = [int(st[f"sum(df{i})"]) for i in range(len(q_terms))]
    stats_ref = ray.put((n, sdl, dfs))

    def score(batch: pa.Table) -> pa.Table:
        n_, sdl_, dfs_ = ray.get(stats_ref)
        doc_id, dl, tfs = _tf_dl(batch)
        avgdl = float(sdl_) / n_
        total = np.zeros(len(dl), np.float64)
        dlf = dl.astype(np.float64)
        # FIXED left-associative term order — mirrors the oracle's
        # explicit parenthesized sum
        for i, tf in enumerate(tfs):
            idf = np.log((float(n_ - dfs_[i]) + 0.5)
                         / (float(dfs_[i]) + 0.5) + 1.0)
            tff = tf.astype(np.float64)
            s = idf * (tff * (k1 + 1.0)) \
                / (tff + k1 * (1.0 - b + b * dlf / avgdl))
            total = total + np.where(tf > 0, s, 0.0)
        return pa.table({
            "doc_id": pa.array(doc_id),
            "dl": pa.array(dl),
            "bm25": pa.array(np.floor(total * 1e6 + 0.5) / 1e6),
        })

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


ZIPF_K = 64


def zipf_slope(ds, k: int = ZIPF_K, n_parts: int | None = None):
    """documents -> ONE row (k_used, slope, intercept): the ZIPF-LAW fit
    of the corpus — OLS regression of ``ln(count)`` on ``ln(rank)`` over
    the top-``k`` whitespace tokens (rank ties ascending on the token, so
    the x-axis is deterministic).  A natural-language corpus sits near
    slope -1; boilerplate-heavy or templated crawls flatten it — the
    corpus-level health metric next to the per-doc Gopher rules.

    Float discipline (the ``linear_probe``/BM25 rules): token counts are
    exact ints; ``ln`` is the platform libm in both engines; the four
    moment sums fold LEFT-ASSOCIATIVELY in rank order (mirrored by the
    oracle's ``list_reduce(list(... ORDER BY r)))``); the two outputs
    round6.  Scale shape: batch-local unique-token counts, token-hash-
    partitioned vectorized global count, local-top-k + single-partition
    merge (``k * n_blocks`` rows move) — the regression itself is k rows
    on the driver."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions.hashing import fnv_token_hash64
    from ..functions import hashing
    from .gridops import topk

    def token_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "__part": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(nonempty))
        if len(toks) == 0:
            return empty
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(codes, return_counts=True)
        words = dic.dictionary.take(pa.array(uniq))
        key = fnv_token_hash64(words).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"tok": words, "cnt": pa.array(cnt.astype(np.int64)),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"tok": part.column("tok").to_pylist(),
                            "cnt": part.column("cnt").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby("tok", sort=False)["cnt"].sum().reset_index()
        return pa.table({"tok": pa.array(g["tok"], pa.string()),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64))})

    counted = (
        ds.map_batches(token_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
    top = topk(counted, k, by="cnt", tie_cols=("tok",)).to_pandas()
    if len(top) < 2:
        raise ValueError("zipf_slope: need at least 2 distinct tokens")
    cnts = top["cnt"].to_numpy(np.int64)  # already (cnt desc, tok) order
    n = len(cnts)
    sx = sy = sxy = sxx = 0.0
    first = True
    for r in range(1, n + 1):
        x = float(np.log(float(r)))
        y = float(np.log(float(cnts[r - 1])))
        if first:
            sx, sy, sxy, sxx = x, y, x * y, x * x
            first = False
        else:
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
    nf = float(n)
    slope = (nf * sxy - sx * sy) / (nf * sxx - sx * sx)
    intercept = (sy - slope * sx) / nf
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "k_used": pa.array([n], pa.int64()),
        "slope": pa.array([r6(slope)], pa.float64()),
        "intercept": pa.array([r6(intercept)], pa.float64()),
    }))


PHRASE = ("table", "hash")


def phrase_search(ds, phrase: tuple[str, ...] = PHRASE):
    """documents -> (doc_id, n_hits): exact PHRASE QUERY — documents whose
    token stream contains ``phrase`` as consecutive whitespace tokens,
    with the occurrence count (the positional-index primitive of an IR
    stack, run as the streaming form: position joins collapse to shifted
    vectorized equality masks because a document's tokens never cross a
    row boundary).

    Scale shape: NO shuffle at all — one map_batches pass, P-1 shifted
    AND masks over the flattened token array (with a same-doc guard),
    per-doc hit counts via np.unique on the match starts.  Exact integer
    output; the oracle is the classic pos-join chain."""
    import pyarrow.compute as pc_

    P = len(phrase)
    assert P >= 2, "phrase_search: need a multi-token phrase"

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        n_docs = len(batch)
        if n_docs == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        doc_pos = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_pos = doc_pos[nonempty]
        toks = flat.filter(pa.array(nonempty))
        T = len(toks)
        if T < P:
            return empty
        eq = [pc_.equal(toks, w).to_numpy(zero_copy_only=False)
              for w in phrase]
        m = eq[0][: T - P + 1].copy()
        for j in range(1, P):
            m &= eq[j][j: T - P + 1 + j]
        # same-doc guard: all P tokens in one document
        m &= doc_pos[: T - P + 1] == doc_pos[P - 1:]
        starts = np.flatnonzero(m)
        if len(starts) == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(doc_pos[starts], return_counts=True)
        return pa.table({"doc_id": pa.array(ids[uniq]),
                         "n_hits": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(scan, batch_format="pyarrow").sort("doc_id")


DRIFT_MAX_VOCAB = 65536


def source_divergence_matrix(ds, n_parts: int | None = None):
    """documents -> (source_a, source_b, n_tokens, jsd_nano): pairwise
    Jensen-Shannon divergence between every two sources' unigram
    distributions, in integer NANO-NATS — the MIXTURE-DESIGN readout:
    which feeds are lexically interchangeable (jsd ~ 0) and which add
    genuinely new text, the matrix a corpus-weighting pass reads before
    assigning sampling rates.  ``n_tokens`` is the pair's union
    vocabulary size.

    Float discipline: each (token, pair) term ``0.5*p1*ln(p1/m) +
    0.5*p2*ln(p2/m)`` (``m = (p1+p2)/2``; a side with c=0 contributes 0)
    is quantized ONCE to nano-nats, so every downstream sum is an
    order-free int64 (the :func:`~.stages.hotspot.cell_lang_entropy`
    discipline); JSD <= ln 2 keeps a pair's total under 7e8 — no overflow
    even at billion-token vocabularies.

    Scale shape: two streaming scans (token totals per source — a
    bounded |sources| reduce broadcast into the solve — then batch-local
    (source, token) partials into ONE coarse token-hash shuffle); each
    partition densifies its tokens x |sources| counts and scores all
    |S|^2/2 pairs vectorized; only |S|^2/2 partial rows per partition
    leave, and the final reduce is bounded.  The vocabulary never touches
    the driver and is never broadcast."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.hashing import coarse_partition, fnv_token_hash64

    n_parts = default_parts() if n_parts is None else n_parts

    def tok_counts(batch: pa.Table) -> pa.Table:
        row_idx, toks = _row_tokens(batch)
        if len(row_idx) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        src = batch.column("source").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src[row_idx], "tok": toks.to_pandas()})
        g = df.groupby(["source", "tok"], sort=False).size() \
            .reset_index(name="c")
        h = fnv_token_hash64(pa.array(g["tok"], pa.string())) \
            .astype(np.int64)
        g["__part"] = coarse_partition(h, n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def src_totals(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        # token COUNT only: count_re(\S+) == len(_row_tokens) by definition
        # (non-empty \s+ splits), at a fraction of the full split's cost —
        # the totals pass never needs the token strings
        per_row = textstats.count_re(
            pc_.fill_null(batch.column("text"), ""), textstats.TOKEN_RE)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "n": per_row.astype(np.int64)})
        g = df.groupby("source", sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = (
        ds.map_batches(src_totals, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    if totals.empty or (totals["n"] <= 0).any():
        raise ValueError("source_divergence_matrix: a source has no tokens")
    totals = totals.sort_values("source")
    sources = totals["source"].to_list()
    n_by_src = totals["n"].to_numpy(np.int64)
    s_index = {s: i for i, s in enumerate(sources)}
    S = len(sources)

    def solve(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["tok", "source"], sort=True,
                         as_index=False)["c"].sum()
        tok_codes, tok_uniq = pd.factorize(g["tok"], sort=True)
        sidx = g["source"].map(s_index).to_numpy(np.int64)
        M = np.zeros((len(tok_uniq), S), np.int64)
        M[tok_codes, sidx] = g["c"].to_numpy(np.int64)
        rows = {"source_a": [], "source_b": [], "n_tokens": [],
                "jsd_nano": []}
        for i in range(S):
            p1_full = M[:, i].astype(np.float64) / float(n_by_src[i])
            for j in range(i + 1, S):
                c1, c2 = M[:, i], M[:, j]
                mask = (c1 > 0) | (c2 > 0)
                p1 = p1_full[mask]
                p2 = c2[mask].astype(np.float64) / float(n_by_src[j])
                m = (p1 + p2) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    t1 = np.where(c1[mask] > 0, 0.5 * p1 * np.log(
                        np.where(p1 > 0, p1, 1.0) / m), 0.0)
                    t2 = np.where(c2[mask] > 0, 0.5 * p2 * np.log(
                        np.where(p2 > 0, p2, 1.0) / m), 0.0)
                q = np.floor((t1 + t2) * 1e9 + 0.5).astype(np.int64)
                rows["source_a"].append(sources[i])
                rows["source_b"].append(sources[j])
                rows["n_tokens"].append(int(mask.sum()))
                rows["jsd_nano"].append(int(q.sum()))
        return pd.DataFrame(rows)

    return (
        ds.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(solve, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("jsd_nano", alias_name="jsd_nano"))
    )


def unigram_drift(ds, max_vocab: int = DRIFT_MAX_VOCAB):
    """documents -> ONE row (n_vocab, n_a, n_b, kl_ab, kl_ba): corpus
    DRIFT between two snapshot halves (even vs odd ``doc_id`` — the
    deterministic stand-in for consecutive crawls) as the two
    add-1-smoothed unigram KL divergences — the distribution-shift
    monitor a training pipeline runs before mixing a new crawl in.

    ``KL(P||Q) = sum_t p_t * ln(p_t / q_t)`` with ``p_t = (a_t + 1) /
    (A + V)`` over the UNION vocabulary; the sum folds LEFT-ASSOCIATIVELY
    in token byte order, mirrored by the oracle's ``list_reduce(list(...
    ORDER BY token))``; outputs round6.  Scale shape: batch-local
    (token, a, b) partials, one token-keyed vectorized reduce; the fold
    runs on the bounded vocabulary histogram driver-side (``max_vocab``
    guards the pull — at web scale cap to top-K + an OTHER bucket
    first)."""
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions.hashing import fnv_token_hash64

    n_parts = default_parts()

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        did = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row = np.repeat(np.arange(len(did), dtype=np.int64), counts)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row = row[nonempty]
        toks = flat.filter(pa.array(nonempty))
        if len(toks) == 0:
            return empty
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        even = (did[row] % 2) == 0
        nv = len(dic.dictionary)
        a = np.bincount(codes[even], minlength=nv).astype(np.int64)
        b = np.bincount(codes[~even], minlength=nv).astype(np.int64)
        key = fnv_token_hash64(dic.dictionary).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"token": dic.dictionary, "a": pa.array(a),
                         "b": pa.array(b),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"token": part.column("token").to_pylist(),
                            "a": part.column("a").to_numpy(
                                zero_copy_only=False),
                            "b": part.column("b").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby("token", sort=False)[["a", "b"]].sum().reset_index()
        return pa.table({"token": pa.array(g["token"], pa.string()),
                         "a": pa.array(g["a"].to_numpy(np.int64)),
                         "b": pa.array(g["b"].to_numpy(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    ).to_pandas()
    if len(hist) > max_vocab:
        raise ValueError(
            f"unigram_drift: vocabulary {len(hist)} exceeds max_vocab="
            f"{max_vocab}; cap to top-K + OTHER before the fold")
    hist = hist.sort_values("token", kind="mergesort")
    a = hist["a"].to_numpy(np.int64)
    b = hist["b"].to_numpy(np.int64)
    V = len(hist)
    A, B = int(a.sum()), int(b.sum())
    kl_ab = kl_ba = 0.0
    first = True
    for i in range(V):
        p = (int(a[i]) + 1) / (A + V)
        q = (int(b[i]) + 1) / (B + V)
        t_ab = p * float(np.log(p / q))
        t_ba = q * float(np.log(q / p))
        if first:
            kl_ab, kl_ba, first = t_ab, t_ba, False
        else:
            kl_ab += t_ab
            kl_ba += t_ba
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_vocab": pa.array([V], pa.int64()),
        "n_a": pa.array([A], pa.int64()),
        "n_b": pa.array([B], pa.int64()),
        "kl_ab": pa.array([r6(kl_ab)], pa.float64()),
        "kl_ba": pa.array([r6(kl_ba)], pa.float64()),
    }))


RRF_K = 60
RRF_LIST = 50
RRF_TOP = 20


def rrf_fusion(ds, query: tuple = BM25_QUERY, list_k: int = RRF_LIST,
               top: int = RRF_TOP, rrf_k: int = RRF_K):
    """documents -> top-``top`` (doc_id, rrf_micro): RECIPROCAL RANK
    FUSION of two retrieval systems over the fixed ``query`` — the BM25
    list (:func:`bm25_scores`) and a rational-idf TF-IDF list — the
    standard way an IR stack merges heterogeneous scorers
    (``RRF(d) = sum_lists 1/(rrf_k + rank_d)``).

    EXACT fusion: ranks are deterministic (score desc, doc_id asc; the
    TF-IDF score is an exact INTEGER — each term's rational
    ``tf*(N+1)/(df+1)`` is put over the common denominator
    ``prod(df_j+1)``, so ranking needs no float at all), and the fused
    score is ``sum floor(1e6 / (rrf_k + rank))`` in pure ints.

    Scale shape: each list is a local-top-k + single-partition merge
    (never a global sort); the fusion runs on 2*``list_k`` driver rows."""
    import pyarrow.compute as pc_
    import ray
    import ray.data as rd

    from .gridops import topk

    q_terms = list(query)

    # ---- list 1: BM25 top-k ----
    bm = topk(bm25_scores(ds, query=query), list_k, by="bm25",
              tie_cols=("doc_id",)).to_pandas()

    # ---- list 2: exact-integer TF-IDF query score top-k ----
    def _tf(batch: pa.Table):
        doc_id = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = row_idx[nonempty]
        toks = flat.filter(pa.array(nonempty))
        tfs = []
        for t in q_terms:
            hit = pc_.equal(toks, t).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(row_idx[hit],
                                   minlength=len(doc_id)).astype(np.int64))
        return doc_id, tfs

    def stats(batch: pa.Table) -> pa.Table:
        doc_id, tfs = _tf(batch)
        cols = {"n_docs": pa.array([len(doc_id)], pa.int64())}
        for i, tf in enumerate(tfs):
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    st = ds.map_batches(stats, batch_format="pyarrow") \
        .sum(["n_docs"] + [f"df{i}" for i in range(len(q_terms))])
    n = int(st["sum(n_docs)"])
    dfs = [int(st[f"sum(df{i})"]) for i in range(len(q_terms))]
    den = [d + 1 for d in dfs]
    import math
    common = math.prod(den)
    mults = [(n + 1) * (common // d) for d in den]  # exact ints
    stats_ref = ray.put(mults)

    def score2(batch: pa.Table) -> pa.Table:
        m = ray.get(stats_ref)
        doc_id, tfs = _tf(batch)
        total = np.zeros(len(doc_id), np.int64)
        for i, tf in enumerate(tfs):
            total = total + tf * np.int64(m[i])
        return pa.table({"doc_id": pa.array(doc_id),
                         "score2": pa.array(total)})

    t2 = topk(ds.map_batches(score2, batch_format="pyarrow"),
              list_k, by="score2", tie_cols=("doc_id",)).to_pandas()

    # ---- fuse (2 * list_k driver rows) ----
    fused: dict[int, int] = {}
    for lst in (bm, t2):
        for rank, doc in enumerate(lst["doc_id"].tolist(), start=1):
            fused[int(doc)] = fused.get(int(doc), 0) \
                + 10**6 // (rrf_k + rank)
    rows = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rrf_micro": pa.array([r[1] for r in rows], pa.int64()),
    }))


COVERAGE_K = 20


def coverage_curve(pages_ds, k: int = COVERAGE_K):
    """pages -> k rows (rank, host, pages, cum_pages, cum_share): the
    corpus CONCENTRATION curve — what share of all pages the top-k hosts
    account for, cumulatively (the "is this crawl dominated by a handful
    of domains" diagnostic next to :func:`host_gini`; DoReMi-style mixture
    decisions read exactly this curve).

    EXACT: counts and cumulative counts are ints; ``cum_share`` is the one
    division, round6.  Scale shape: per-batch host counts,
    host-hash-partitioned vectorized reduce, local-top-k + single-
    partition merge (never a global sort); the cumulative pass is k
    driver rows."""
    import ray.data as rd

    from ..functions.hashing import fnv_token_hash64
    from ..functions import hashing
    from .gridops import topk
    from .sketch import _host_from_url

    n_parts = default_parts()

    def host_counts(batch: pa.Table) -> pa.Table:
        host = _host_from_url(batch)
        uniq, cnt = np.unique(host.astype(str), return_counts=True)
        harr = pa.array(uniq.astype(object), pa.string())
        key = fnv_token_hash64(harr).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"host": harr,
                         "pages": pa.array(cnt.astype(np.int64)),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"host": part.column("host").to_pylist(),
                            "pages": part.column("pages").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby("host", sort=False)["pages"].sum().reset_index()
        return pa.table({"host": pa.array(g["host"], pa.string()),
                         "pages": pa.array(g["pages"].to_numpy(np.int64))})

    counted = (
        pages_ds.map_batches(host_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    ).materialize()
    total = int(counted.sum("pages"))
    top = topk(counted, k, by="pages", tie_cols=("host",)).to_pandas()
    cum = 0
    rows = {"rank": [], "host": [], "pages": [], "cum_pages": [],
            "cum_share": []}
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    for i, rec in enumerate(top.itertuples(), start=1):
        cum += int(rec.pages)
        rows["rank"].append(i)
        rows["host"].append(rec.host)
        rows["pages"].append(int(rec.pages))
        rows["cum_pages"].append(cum)
        rows["cum_share"].append(r6(cum / total))
    return rd.from_arrow(pa.table({
        "rank": pa.array(rows["rank"], pa.int64()),
        "host": pa.array(rows["host"], pa.string()),
        "pages": pa.array(rows["pages"], pa.int64()),
        "cum_pages": pa.array(rows["cum_pages"], pa.int64()),
        "cum_share": pa.array(rows["cum_share"], pa.float64()),
    }))


def typo_clusters(values_ds, col: str = "host"):
    """values -> (member, cluster): TYPO CLUSTERS — connected components
    of the edit-distance-<=1 graph over distinct values, cluster id = the
    lexicographically smallest member (the entity-resolution step after
    :func:`fuzzy_value_join`: 'exampel.com' and 'example.com' collapse to
    one canonical host).  Only values participating in >= 1 fuzzy pair
    are emitted (singletons are their own trivial cluster).

    Scale shape: the distributed work is the deletion-neighborhood fuzzy
    join (distinct values x (len+1) variant rows — never all-pairs); the
    surviving pair set is SMALL by construction (real typos are rare), so
    the union-find runs on the bounded driver-side pair list — for an
    adversarial corpus where fuzzy pairs are dense, swap the finalize for
    :func:`..stages.cc.connected_components` (documented trade)."""
    import ray.data as rd

    pairs = fuzzy_value_join(values_ds, col).to_pandas()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(str(a)), find(str(b))
        if ra != rb:
            # union by MIN so the root is always the smallest member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted(parent)
    return rd.from_arrow(pa.table({
        "member": pa.array(members, pa.string()),
        "cluster": pa.array([find(m) for m in members], pa.string()),
    }))


def cohen_kappa(ds):
    """documents -> ONE row (n, agree, kappa_num, kappa_den, kappa):
    COHEN'S KAPPA between the stored ``lang`` label and the heuristic
    ``lang_id`` prediction — chance-corrected agreement, the one-number
    classifier-quality readout over :func:`lang_confusion`'s matrix
    (kappa ~ 0 means the classifier is no better than guessing the label
    marginals).

    EXACT: with N docs, ``agree`` the diagonal count and ``E = sum over
    classes of row_total * col_total``, the chance-cleared form is
    ``kappa = (N*agree - E) / (N*N - E)`` — integer numerator and
    denominator, ONE round6 float division.  Scale shape: rides the same
    bounded |langs|^2 confusion reduce; the kappa arithmetic is driver
    math on the tiny matrix."""
    import ray.data as rd

    conf = lang_confusion(ds).to_pandas()
    n = int(conf["n_docs"].sum())
    agree = int(conf[conf["lang"] == conf["pred_lang"]]["n_docs"].sum())
    row = conf.groupby("lang")["n_docs"].sum()
    col = conf.groupby("pred_lang")["n_docs"].sum()
    classes = set(row.index) | set(col.index)
    E = sum(int(row.get(c, 0)) * int(col.get(c, 0)) for c in classes)
    num = n * agree - E
    den = n * n - E
    if den == 0:
        raise ValueError("cohen_kappa: degenerate marginals")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "agree": pa.array([agree], pa.int64()),
        "kappa_num": pa.array([num], pa.int64()),
        "kappa_den": pa.array([den], pa.int64()),
        "kappa": pa.array([r6(float(num) / float(den))], pa.float64()),
    }))


def hapax_rate(ds, n_parts: int | None = None):
    """documents -> ONE row (vocab, n_hapax, n_tokens, hapax_share,
    token_share): HAPAX LEGOMENA statistics — how much of the vocabulary
    occurs exactly once (and what fraction of the token mass that is),
    the classic productivity/OOV-pressure diagnostic a tokenizer-training
    pipeline reads before fixing a vocab size (high hapax share = heavy
    tail = bigger vocab or aggressive normalization needed).

    EXACT integer counts; the two shares are round6 divisions.  Scale
    shape: batch-local token counts, token-hash-partitioned vectorized
    reduce, then a 3-scalar partial per partition — the vocabulary never
    reaches the driver."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions.hashing import fnv_token_hash64

    def token_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "__part": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(nonempty))
        if len(toks) == 0:
            return empty
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(codes, return_counts=True)
        words = dic.dictionary.take(pa.array(uniq))
        key = fnv_token_hash64(words).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"tok": words, "cnt": pa.array(cnt.astype(np.int64)),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"tok": part.column("tok").to_pylist(),
                            "cnt": part.column("cnt").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby("tok", sort=False)["cnt"].sum()
        c = g.to_numpy(np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "vocab": pa.array([len(c)], pa.int64()),
            "n_hapax": pa.array([int((c == 1).sum())], pa.int64()),
            "n_tokens": pa.array([int(c.sum())], pa.int64()),
        })

    red = (
        ds.map_batches(token_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    ).to_pandas()
    vocab = int(red["vocab"].sum())
    n_hapax = int(red["n_hapax"].sum())
    n_tokens = int(red["n_tokens"].sum())
    if vocab == 0:
        raise ValueError("hapax_rate: empty corpus")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "vocab": pa.array([vocab], pa.int64()),
        "n_hapax": pa.array([n_hapax], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "hapax_share": pa.array([r6(n_hapax / vocab)], pa.float64()),
        "token_share": pa.array([r6(n_hapax / n_tokens)], pa.float64()),
    }))


def mutual_information(pages_ds):
    """pages -> ONE row (n, n_cells, mi, h_tld, h_lang): the MUTUAL
    INFORMATION between a page's TLD and its language label (plus the two
    marginal entropies, so normalized variants are one division away) —
    the categorical-association readout a pipeline uses to decide whether
    a cheap column (TLD) can proxy an expensive one (language) for
    routing/stratification.

    ``MI = sum_ij p_ij * ln(p_ij * N / (r_i * c_j))`` over the bounded
    (tld, lang) contingency table; counts are exact ints and the float
    terms fold LEFT-ASSOCIATIVELY in (tld, lang) order, mirrored by the
    oracle's ``list_reduce(list(... ORDER BY tld, lang))``; round6.
    Scale shape: batch-local pair counts, one bounded two-key reduce; the
    fold runs on the tiny contingency table."""
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        parts = pc_.split_pattern(batch.column("url"), pattern="/")
        host = pc_.list_element(parts, 2)
        tld = pc_.list_element(
            pc_.split_pattern(host, pattern=".", max_splits=1, reverse=True),
            1)
        df = pd_.DataFrame({
            "tld": tld.to_pylist(),
            "lang": batch.column("lang").to_pylist(),
        })
        g = df.groupby(["tld", "lang"], sort=False).size().reset_index(
            name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tld", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas().sort_values(["tld", "lang"], kind="mergesort")
    n = int(conf["c"].sum())
    if n == 0:
        raise ValueError("mutual_information: no pages")
    row = conf.groupby("tld")["c"].sum()
    col = conf.groupby("lang")["c"].sum()
    mi = 0.0
    first = True
    for rec in conf.itertuples():
        p = int(rec.c)
        term = (p / n) * float(np.log(
            (p / n) * n * n / (int(row[rec.tld]) * int(col[rec.lang]))))
        if first:
            mi, first = term, False
        else:
            mi += term
    def ordered_entropy(series) -> float:
        h = 0.0
        first = True
        for c in series.sort_index():
            t = -(int(c) / n) * float(np.log(int(c) / n))
            if first:
                h, first = t, False
            else:
                h += t
        return h

    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_cells": pa.array([len(conf)], pa.int64()),
        "mi": pa.array([r6(mi)], pa.float64()),
        "h_tld": pa.array([r6(ordered_entropy(row))], pa.float64()),
        "h_lang": pa.array([r6(ordered_entropy(col))], pa.float64()),
    }))


PROX_TERMS = ("table", "hash")
PROX_WINDOW = 3


def proximity_search(ds, terms: tuple[str, str] = PROX_TERMS,
                     window: int = PROX_WINDOW):
    """documents -> (doc_id, n_pairs, min_gap): PROXIMITY QUERY — the
    IR companion to :func:`phrase_search` that relaxes adjacency to a
    token window: documents where ``terms[0]`` and ``terms[1]`` occur
    within ``window`` tokens of each other, with the qualifying
    (posA, posB) pair count and the closest gap.

    Scale shape: NO shuffle — one map_batches scan; within a batch the
    position lists collapse to ONE composite-key searchsorted pair
    (``doc * 2^32 + pos`` keeps windows from leaking across documents
    because 2^32 >> window), so pair counting is two binary searches per
    occurrence, never a quadratic expansion.  Exact integers; the oracle
    is the classic |posA - posB| <= w position self-join."""
    import pyarrow.compute as pc_

    ta, tb = terms
    assert ta != tb and window >= 1

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "min_gap": pa.array([], pa.int64())})
        n_docs = len(batch)
        if n_docs == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        doc_pos = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_pos = doc_pos[nonempty]
        toks = flat.filter(pa.array(nonempty))
        T = len(toks)
        if T == 0:
            return empty
        # 1-based position within each document's filtered token list
        # (mirrors the oracle's generate_subscripts)
        new_doc = np.flatnonzero(np.diff(doc_pos, prepend=np.int64(-1)))
        seg_len = np.diff(np.append(new_doc, T))
        seg_start = np.repeat(new_doc, seg_len)
        pos = np.arange(T, dtype=np.int64) - seg_start + 1
        key = doc_pos * (np.int64(1) << np.int64(32)) + pos
        ia = np.flatnonzero(pc_.equal(toks, ta).to_numpy(zero_copy_only=False))
        ib = np.flatnonzero(pc_.equal(toks, tb).to_numpy(zero_copy_only=False))
        if len(ia) == 0 or len(ib) == 0:
            return empty
        ka, kb = key[ia], key[ib]  # both ascending by construction
        lo = np.searchsorted(kb, ka - window, side="left")
        hi = np.searchsorted(kb, ka + window, side="right")
        cnt = hi - lo
        has = cnt > 0
        if not has.any():
            return empty
        # nearest in-window partner per A occurrence: the two neighbors
        # of the insertion point, clipped into [lo, hi)
        ip = np.searchsorted(kb, ka)
        gap = np.full(len(ka), np.int64(1) << np.int64(40))
        below_ok = (ip - 1 >= lo) & (ip - 1 < hi) & (ip >= 1)
        gap[below_ok] = ka[below_ok] - kb[(ip - 1)[below_ok]]
        above_ok = (ip >= lo) & (ip < hi) & (ip < len(kb))
        np.minimum.at(gap, np.flatnonzero(above_ok),
                      np.abs(kb[ip[above_ok]] - ka[above_ok]))
        docs_a = doc_pos[ia]
        n_pairs = np.zeros(n_docs, np.int64)
        np.add.at(n_pairs, docs_a, cnt)
        best = np.full(n_docs, np.int64(1) << np.int64(40))
        np.minimum.at(best, docs_a[has], gap[has])
        hit = np.flatnonzero(n_pairs > 0)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[hit]),
                         "n_pairs": pa.array(n_pairs[hit]),
                         "min_gap": pa.array(best[hit])})

    return ds.map_batches(scan, batch_format="pyarrow").sort("doc_id")


def chi2_independence(pages_ds):
    """pages -> ONE row (n, n_rows, n_cols, dof, chi2, cramers_v): the
    PEARSON CHI-SQUARE independence test between a page's TLD and its
    language label, with Cramer's V effect size — the significance
    companion to :func:`mutual_information` over the same bounded
    contingency table (MI measures shared information; chi2/V say
    whether the association survives a null model).

    Zero-observed cells are handled ALGEBRAICALLY: ``chi2 = N * sum_obs
    O_ij^2 / (r_i * c_j) - N`` (the missing-cell expected masses
    telescope into the -N), so only observed cells enter the float fold
    — LEFT-ASSOCIATIVE in (tld, lang) order, mirrored by the oracle's
    ``list_reduce(list(t ORDER BY tld, lang))``.  Counts are exact ints;
    chi2 and V are two divisions over the shared tree, round6.  Scale
    shape: batch-local pair counts, one bounded two-key reduce."""
    import math

    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        parts = pc_.split_pattern(batch.column("url"), pattern="/")
        host = pc_.list_element(parts, 2)
        tld = pc_.list_element(
            pc_.split_pattern(host, pattern=".", max_splits=1, reverse=True),
            1)
        df = pd_.DataFrame({
            "tld": tld.to_pylist(),
            "lang": batch.column("lang").to_pylist(),
        })
        g = df.groupby(["tld", "lang"], sort=False).size().reset_index(
            name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tld", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas().sort_values(["tld", "lang"], kind="mergesort")
    n = int(conf["c"].sum())
    if n == 0:
        raise ValueError("chi2_independence: no pages")
    row = conf.groupby("tld")["c"].sum()
    col = conf.groupby("lang")["c"].sum()
    n_rows, n_cols = len(row), len(col)
    dof = (n_rows - 1) * (n_cols - 1)
    if dof == 0:
        raise ValueError("chi2_independence: degenerate 1xK table")
    s = 0.0
    first = True
    for rec in conf.itertuples():
        p = int(rec.c)
        term = float(p * p) / float(int(row[rec.tld]) * int(col[rec.lang]))
        if first:
            s, first = term, False
        else:
            s += term
    chi2 = float(n) * s - float(n)
    kmin = min(n_rows - 1, n_cols - 1)
    v = math.sqrt(chi2 / float(n * kmin))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_rows": pa.array([n_rows], pa.int64()),
        "n_cols": pa.array([n_cols], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2": pa.array([r6(chi2)], pa.float64()),
        "cramers_v": pa.array([r6(v)], pa.float64()),
    }))


def lang_diversity(docs_ds):
    """documents -> one row per source (source, n, n_langs, simpson):
    the SIMPSON DIVERSITY index of language labels within each source —
    ``1 - sum_i n_i*(n_i - 1) / (N*(N - 1))``, the probability two
    random docs from the source differ in language.  The per-source
    mixture-health readout a curation pipeline uses to spot
    single-language collection bugs.

    EXACT rational until ONE round6 division per source (the unbiased
    finite-sample form, not p^2 — no per-class float enters).  Scale
    shape: batch-local (source, lang) pair counts, one bounded two-key
    reduce, driver finalize on the tiny contingency."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "lang": batch.column("lang").to_pylist(),
        })
        g = df.groupby(["source", "lang"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if conf.empty:
        raise ValueError("lang_diversity: no documents")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"source": [], "n": [], "n_langs": [], "simpson": []}
    for src, grp in conf.groupby("source", sort=True):
        cs = grp["c"].to_numpy(np.int64)
        n = int(cs.sum())
        if n < 2:
            raise ValueError(f"lang_diversity: source {src} has < 2 docs")
        num = sum(int(c) * (int(c) - 1) for c in cs)
        rows["source"].append(src)
        rows["n"].append(n)
        rows["n_langs"].append(len(cs))
        rows["simpson"].append(r6(1.0 - float(num) / float(n * (n - 1))))
    return rd.from_arrow(pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "n_langs": pa.array(rows["n_langs"], pa.int64()),
        "simpson": pa.array(rows["simpson"], pa.float64()),
    }))


HEAPS_Q = 4


def heaps_law(ds, n_docs: int, quarters: int = HEAPS_Q,
              n_parts: int | None = None):
    """documents -> ``quarters`` rows (q, n_tokens, vocab, beta, lnk):
    the HEAPS'-LAW vocabulary-growth fit — distinct-token count V(n)
    against total token occurrences n at each doc_id-prefix quartile of
    the corpus, with the OLS fit of ``ln V = lnk + beta * ln n`` (a
    natural corpus sits near beta ~ 0.5; templated crawls go flat).
    The companion to :func:`zipf_slope` on the other axis of vocabulary
    structure, and the planning input for vocab-size/OOV budgeting.

    EXACT counts: prefix membership is the integer test ``doc_id <
    (N*q)//Q``; vocabulary attribution is each token's min doc_id
    (order-free), so both channels are exact integer reduces.  The 2x2
    OLS over the Q points folds LEFT-ASSOCIATIVELY in q order (oracle:
    ``list_reduce(list(... ORDER BY q))``), round6.  Scale shape: one
    token-hash-partitioned min reduce (the vocabulary never reaches the
    driver — per-part quartile counts do), one Q-row count reduce."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions import hashing
    from ..functions.hashing import fnv_token_hash64
    from ..functions.reduce import hash_groupby

    Q = quarters
    ths = [(n_docs * j) // Q for j in range(1, Q + 1)]

    def tok_flat(batch: pa.Table):
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        return flat.filter(pa.array(nonempty)), doc_idx[nonempty]

    def min_doc_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], pa.string()),
                          "mind": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        toks, rows = tok_flat(batch)
        if len(toks) == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        did = ids[rows]
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, codes))
        codes_s, did_s = codes[order], did[order]
        first = np.flatnonzero(np.diff(codes_s, prepend=np.int64(-1)))
        uniq, mind = codes_s[first], did_s[first]
        words = dic.dictionary.take(pa.array(uniq))
        key = fnv_token_hash64(words).view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"tok": words, "mind": pa.array(mind),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_min(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"tok": part.column("tok").to_pylist(),
                            "mind": part.column("mind").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby("tok", sort=False)["mind"].min().reset_index()
        return pa.table({"tok": pa.array(g["tok"], pa.string()),
                         "mind": pa.array(g["mind"].to_numpy(np.int64))})

    def vocab_counts(batch: pa.Table) -> pa.Table:
        mind = batch.column("mind").to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array(np.arange(1, Q + 1, dtype=np.int64)),
            "v": pa.array([int((mind < t).sum()) for t in ths], pa.int64()),
        })

    voc = hash_groupby(
        ds.map_batches(min_doc_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_min, batch_format="pyarrow")
        .map_batches(vocab_counts, batch_format="pyarrow"),
        "q", ["v"], how="isum",
    ).to_pandas().sort_values("q")

    def ntok_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"q": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        _, rows = tok_flat(batch)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        did = ids[rows]
        return pa.table({
            "q": pa.array(np.arange(1, Q + 1, dtype=np.int64)),
            "c": pa.array([int((did < t).sum()) for t in ths], pa.int64()),
        })

    ntok = hash_groupby(
        ds.map_batches(ntok_partial, batch_format="pyarrow"),
        "q", ["c"], how="isum",
    ).to_pandas().sort_values("q")

    vs = voc["v"].to_numpy(np.int64)
    ns = ntok["c"].to_numpy(np.int64)
    if (vs <= 0).any() or (ns <= 0).any():
        raise ValueError("heaps_law: an empty prefix quartile")
    import math

    sx = sy = sxy = sxx = 0.0
    first = True
    for nn, vv in zip(ns, vs):
        x, y = math.log(float(nn)), math.log(float(vv))
        if first:
            sx, sy, sxy, sxx = x, y, x * y, x * x
            first = False
        else:
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
    den = Q * sxx - sx * sx
    if den == 0.0:
        raise ValueError("heaps_law: degenerate x values")
    beta = (Q * sxy - sx * sy) / den
    lnk = (sy - beta * sx) / Q
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "q": pa.array(np.arange(1, Q + 1, dtype=np.int64)),
        "n_tokens": pa.array(ns),
        "vocab": pa.array(vs),
        "beta": pa.array([r6(beta)] * Q, pa.float64()),
        "lnk": pa.array([r6(lnk)] * Q, pa.float64()),
    }))


KWIC_TERM = "hash"
KWIC_CTX = 20


def kwic_snippets(ds, term: str = KWIC_TERM, ctx: int = KWIC_CTX):
    """documents -> (doc_id, pos, snippet): KEYWORD IN CONTEXT — for
    every document containing ``term``, the 1-based character position
    of its FIRST occurrence and a ±``ctx``-character window around it
    (the search-result / eval-sheet extraction primitive; per-row
    byte-verbatim text discipline applies to the slice).

    Scale shape: NO shuffle — one vectorized map_batches pass
    (``pc.find_substring`` + ``pc.utf8_slice_codepoints``); only hit
    rows leave the task.  Offsets are codepoint-based on BOTH engines
    (Arrow slice_codepoints vs SQL substr) and the window clamps at the
    string start exactly like SQL's greatest(1, pos - ctx)."""
    import pyarrow.compute as pc_

    def scan(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        pos0 = pc_.find_substring(txt, term)  # 0-based, -1 = miss
        pos = pos0.to_numpy(zero_copy_only=False).astype(np.int64)
        hit = pos >= 0
        if not hit.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "snippet": pa.array([], pa.string())})
        idx = np.flatnonzero(hit)
        sub = txt.take(pa.array(idx))
        p = pos[idx]  # 0-based
        start = np.maximum(p - ctx, 0)
        stop = p + len(term) + ctx
        # per-row slice bounds differ -> loop over the (few) hits with
        # Arrow slices would be per-row anyway; use one python slice per
        # hit row (hits are a filtered minority; text stays verbatim)
        s_py = sub.to_pylist()
        snips = [t[int(a):int(b)] for t, a, b in zip(s_py, start, stop)]
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[idx]),
                         "pos": pa.array(p + 1),
                         "snippet": pa.array(snips, pa.string())})

    return ds.map_batches(scan, batch_format="pyarrow").sort("doc_id")


def langs_concat(docs_ds):
    """documents -> (source, n_langs, langs): ORDERED STRING AGGREGATION
    — the comma-joined sorted distinct language list per source
    (SQL's ``string_agg(DISTINCT ... ORDER BY ...)``), the report-
    formatting primitive that needs deterministic order to be
    comparable at all.

    Scale shape: batch-local (source, lang) distinct pairs, one bounded
    two-key reduce, driver joins the tiny per-source lists.  Exact
    string output."""
    import pandas as pd
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "lang": batch.column("lang").to_pylist(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .count()
    ).to_pandas()
    if pairs.empty:
        raise ValueError("langs_concat: no documents")
    rows = {"source": [], "n_langs": [], "langs": []}
    for src, grp in pairs.groupby("source", sort=True):
        ls = sorted(grp["lang"].tolist())
        rows["source"].append(src)
        rows["n_langs"].append(len(ls))
        rows["langs"].append(",".join(ls))
    return rd.from_arrow(pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n_langs": pa.array(rows["n_langs"], pa.int64()),
        "langs": pa.array(rows["langs"], pa.string()),
    }))


BOOL_MUST = ("table", "hash")
BOOL_SHOULD = ("spark", "vector")
BOOL_NOT = ("error",)


def boolean_search(ds, must: tuple[str, ...] = BOOL_MUST,
                   should: tuple[str, ...] = BOOL_SHOULD,
                   must_not: tuple[str, ...] = BOOL_NOT):
    """documents -> (doc_id, n_should): BOOLEAN QUERY — docs containing
    ALL ``must`` terms, NONE of the ``must_not`` terms, and AT LEAST ONE
    ``should`` term, with the matched-should count (the conjunctive-
    normal-form retrieval primitive; :func:`phrase_search` /
    :func:`proximity_search` are its positional refinements).

    Scale shape: NO shuffle — one vectorized scan; each term is one
    Arrow equality pass over the flattened token array, collapsed to a
    per-doc presence bit via np.bincount (whole-token matching, not
    substring).  Exact integers."""
    import pyarrow.compute as pc_

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_should": pa.array([], pa.int64())})
        n_docs = len(batch)
        if n_docs == 0:
            return empty
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        doc_pos = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

        def present(term: str) -> np.ndarray:
            m = pc_.equal(flat, term).to_numpy(zero_copy_only=False)
            return np.bincount(doc_pos[m], minlength=n_docs) > 0

        keep = np.ones(n_docs, bool)
        for t in must:
            keep &= present(t)
        for t in must_not:
            keep &= ~present(t)
        n_should = np.zeros(n_docs, np.int64)
        for t in should:
            n_should += present(t).astype(np.int64)
        keep &= n_should > 0
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_should": pa.array(n_should[keep])})

    return ds.map_batches(scan, batch_format="pyarrow").sort("doc_id")


HILL_K = 100


def hill_tail_index(docs_ds, k: int = HILL_K):
    """documents -> ONE row (k, x_k, hill, alpha): the HILL ESTIMATOR of
    the document-length tail index — ``hill = (1/k) * sum_{i<k}
    ln(x_(i) / x_(k))`` over the k largest lengths, ``alpha = 1/hill``
    (alpha ~ 1-2 = heavy Zipf-like tail; large alpha = thin tail).  The
    heavy-tail diagnostic that decides whether max-length truncation
    loses real mass; the order-statistics sibling of
    :func:`zipf_slope`.

    Scale shape: the k largest values (with multiplicity) come off the
    bounded value histogram — one histogram shuffle, driver fold.  The
    ln terms fold LEFT-ASSOCIATIVELY in descending-value order
    (mirrored by the oracle's ``list_reduce(list(... ORDER BY v
    DESC))``; ties share a value, so intra-tie order cannot matter),
    one division, round6."""
    import math

    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        docs_ds.map_batches(counts, batch_format="pyarrow"),
        "v", ["c"], how="isum",
    ).to_pandas().sort_values("v", ascending=False)
    vs = hist["v"].to_numpy(np.int64)
    cs = hist["c"].to_numpy(np.int64)
    n = int(cs.sum())
    if n <= k:
        raise ValueError("hill_tail_index: need more than k documents")
    top = np.repeat(vs, np.minimum(cs, k + 1))[:k + 1]
    if len(top) < k + 1:
        raise ValueError("hill_tail_index: histogram shorter than k+1")
    xk = int(top[k])  # the (k+1)-th largest is the threshold x_(k)
    if xk <= 0:
        raise ValueError("hill_tail_index: non-positive threshold")
    s = 0.0
    first = True
    for x in top[:k]:
        t = math.log(float(int(x))) - math.log(float(xk))
        if first:
            s, first = t, False
        else:
            s += t
    hill = s / k
    if hill == 0.0:
        raise ValueError("hill_tail_index: degenerate (all top values tied)")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "x_k": pa.array([xk], pa.int64()),
        "hill": pa.array([r6(hill)], pa.float64()),
        "alpha": pa.array([r6(1.0 / hill)], pa.float64()),
    }))


KEYWORDS_K = 3


def doc_keywords(ds, k: int = KEYWORDS_K):
    """documents -> (doc_id, rnk, token, score): per-document KEYWORD
    EXTRACTION — the top ``k`` tokens by the rational TF-IDF of
    :func:`tfidf`, ties broken on the token.  The summarization/tagging
    primitive ("what is this page about") next to the corpus-level
    :func:`top_bigrams`.

    Ordering floats across engines is safe HERE because the score is a
    ratio of exact ints evaluated identically on both sides (the tfidf
    gate hash-proves it) — unlike ln-derived keys (see
    ``weighted_sample``).  Scale shape: the tfidf plan, then one coarse
    doc-keyed shuffle with a vectorized grouped head-k per partition
    (pandas groupby.head — no per-doc Python)."""
    from ..functions import hashing

    scored = tfidf(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(d, 64)
                               .astype(np.int64)))

    def headk(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["doc_id", "score", "token"],
                           ascending=[True, False, True], kind="mergesort")
        top = d.groupby("doc_id", sort=False).head(k).copy()
        top["rnk"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return top[["doc_id", "rnk", "token", "score"]]

    return (
        scored.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
        .groupby("__part")
        .map_groups(headk)
        .sort(["doc_id", "rnk"])
    )


WILSON_Z6 = 1_959_964  # z_{0.975} = 1.959964 quantized to micro-units


def wilson_ci(docs_ds):
    """documents -> (lang, n, total, share, lo, hi): each language's
    corpus share with its 95% WILSON score interval — the ratio-metric
    CI that behaves at share ~ 0/1 where the normal interval collapses;
    what a curation dashboard should print next to every proportion.

    EXACT counts; z is the micro-unit constant ``WILSON_Z6 / 1e6``
    shared with the oracle, and lo/hi are one float tree each
    (sqrt is IEEE-exact), round6.  Scale shape: one bounded lang
    reduce."""
    import math

    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column("lang").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(g, return_counts=True)
        return pa.table({"lang": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (
        docs_ds.map_batches(counts, batch_format="pyarrow")
        .groupby("lang")
        .sum("n")
    ).to_pandas().sort_values("lang")
    col = "sum(n)"
    total = int(agg[col].sum())
    if total == 0:
        raise ValueError("wilson_ci: no documents")
    z = float(WILSON_Z6) / 1e6
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"lang": [], "n": [], "share": [], "lo": [], "hi": []}
    for lang, n in zip(agg["lang"], agg[col]):
        n = int(n)
        p = float(n) / float(total)
        denom = 1.0 + z * z / float(total)
        center = p + z * z / (2.0 * float(total))
        half = z * math.sqrt(p * (1.0 - p) / float(total)
                             + z * z / (4.0 * float(total) * float(total)))
        rows["lang"].append(lang)
        rows["n"].append(n)
        rows["share"].append(r6(p))
        rows["lo"].append(r6((center - half) / denom))
        rows["hi"].append(r6((center + half) / denom))
    return rd.from_arrow(pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "total": pa.array([total] * len(rows["n"]), pa.int64()),
        "share": pa.array(rows["share"], pa.float64()),
        "lo": pa.array(rows["lo"], pa.float64()),
        "hi": pa.array(rows["hi"], pa.float64()),
    }))


def dup_rate_by_source(docs_ds):
    """documents -> (source, n_docs, n_dup, dup_rate): per-source
    DUPLICATION HEALTH — how many of each source's documents share
    their exact text with ANY document corpus-wide (cross-source
    included), the per-feed report that localizes where duplication
    enters a crawl (exact_dedup says how much; this says from where).

    EXACT: grouping is by 64-bit content hash in the engine and by the
    text itself in the oracle (identical partitions barring a 2^-64
    collision — the :func:`exact_dedup` discipline); one round6
    division per source.  Scale shape: batch-local (hash, source)
    counts, one bounded two-key reduce, driver rollup over the bounded
    group table (at open-web volume the global-count flag joins back by
    hash co-partition instead)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.hashing import text_hash64

    def partial(batch: pa.Table) -> pa.Table:
        h = text_hash64(batch.column("text").to_pylist()).view(np.int64)
        df = pd.DataFrame({
            "h": h, "source": batch.column("source").to_pylist()})
        g = df.groupby(["h", "source"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["h", "source"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if pairs.empty:
        raise ValueError("dup_rate_by_source: no documents")
    glob = pairs.groupby("h")["c"].sum()
    dup_h = set(glob[glob > 1].index.tolist())
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"source": [], "n_docs": [], "n_dup": [], "dup_rate": []}
    for src, grp in pairs.groupby("source", sort=True):
        n = int(grp["c"].sum())
        d = int(grp.loc[grp["h"].isin(dup_h), "c"].sum())
        rows["source"].append(src)
        rows["n_docs"].append(n)
        rows["n_dup"].append(d)
        rows["dup_rate"].append(r6(float(d) / float(n)))
    return rd.from_arrow(pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n_docs": pa.array(rows["n_docs"], pa.int64()),
        "n_dup": pa.array(rows["n_dup"], pa.int64()),
        "dup_rate": pa.array(rows["dup_rate"], pa.float64()),
    }))


def containment_pairs(ds, threshold: float = 0.9,
                      max_df: int | None = JACCARD_MAX_DF):
    """documents -> (a, b, containment): near-dup pairs by SET
    CONTAINMENT ``|A & B| / min(|A|, |B|)`` — the asymmetric metric
    that catches SUBSET duplicates (a page embedded inside a longer
    one) which Jaccard structurally misses (a 100-word doc inside a
    10k-word doc has J ~ 0.01 but containment 1.0).  The
    :func:`jaccard_pairs` inverted-index plan with the size filter
    REMOVED — containment admits no min/max size pruning, that is its
    point — so ``max_df`` is the only fan-out bound (documented
    approximation, same as there).

    Exact integers until one float division per pair, shared with the
    oracle."""
    import pyarrow.compute as pc_

    def postings(batch: pa.Table) -> pa.Table:
        EMPTY = pa.schema([("token", pa.string()), ("doc_id", pa.int64()),
                           ("set_size", pa.int64())])
        doc_id = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(doc_id) == 0:
            return EMPTY.empty_table()
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        if len(toks) == 0:
            return EMPTY.empty_table()
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = row_idx * (codes.max() + 1) + codes
        _, uidx = np.unique(packed, return_index=True)
        u_row, u_code = row_idx[uidx], codes[uidx]
        set_size = np.bincount(u_row, minlength=len(doc_id)).astype(np.int64)
        return pa.table({
            "token": dic.dictionary.take(pa.array(u_code)),
            "doc_id": pa.array(doc_id[u_row]),
            "set_size": pa.array(set_size[u_row]),
        })

    N_PARTS = default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(hashing.coarse_partition(pk, N_PARTS)))

    def reduce_part(df):
        pk = df["pk"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        na = df["na"].to_numpy()[order].astype(np.float64)
        nb = df["nb"].to_numpy()[order].astype(np.float64)
        uniq, first_idx, cnt = np.unique(pk, return_index=True,
                                         return_counts=True)
        c = cnt.astype(np.float64) / np.minimum(na[first_idx], nb[first_idx])
        keep = c >= threshold
        return {
            "a": (uniq[keep] >> np.int64(31)).astype(np.int64),
            "b": (uniq[keep] & np.int64((1 << 31) - 1)).astype(np.int64),
            "containment": np.floor(c[keep] * 1e6 + 0.5) / 1e6,
        }

    posted = ds.map_batches(postings, batch_format="pyarrow")
    pairs = _token_pair_candidates(posted, max_df, None)
    return (
        pairs.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(reduce_part)
    )


def quality_by_source(ds):
    """documents -> (source, n, n_pass, rate, lift): the per-source
    GOPHER pass-rate report with lift against the corpus-wide rate —
    WHICH feed ships the junk, the triage view over the per-doc
    :func:`gopher_quality` flags (a source with lift << 1 gets its
    crawler inspected, not its documents).

    EXACT counts; rate and lift are two shared float trees (lift =
    per-source rate / global rate), round6.  Scale shape: the zero-
    shuffle gopher scan with the source column carried, one bounded
    source reduce."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        _, _, _, passes = _gopher_metrics(batch.column("text"))
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "p": passes.astype(np.int64),
        })
        g = df.groupby("source", sort=False).agg(
            n=("p", "size"), p=("p", "sum")).reset_index()
        return pa.table({"source": pa.array(g["source"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "p": pa.array(g["p"].to_numpy(np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("p", alias_name="p"))
    ).to_pandas().sort_values("source")
    if agg.empty:
        raise ValueError("quality_by_source: no documents")
    N = int(agg["n"].sum())
    P = int(agg["p"].sum())
    if P == 0:
        raise ValueError("quality_by_source: nothing passes globally")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"source": [], "n": [], "n_pass": [], "rate": [], "lift": []}
    for rec in agg.itertuples():
        n, p = int(rec.n), int(rec.p)
        rate = float(p) / float(n)
        lift = rate / (float(P) / float(N))
        rows["source"].append(rec.source)
        rows["n"].append(n)
        rows["n_pass"].append(p)
        rows["rate"].append(r6(rate))
        rows["lift"].append(r6(lift))
    return rd.from_arrow(pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "n_pass": pa.array(rows["n_pass"], pa.int64()),
        "rate": pa.array(rows["rate"], pa.float64()),
        "lift": pa.array(rows["lift"], pa.float64()),
    }))


def tld_lang_divergence(pages_ds):
    """pages -> (tld, n, kl_micro): per-TLD KL divergence of the
    language mix from the corpus-wide mix (add-1 smoothed over the
    global language set) — WHICH domains deviate from the corpus
    composition, the pointwise companion to :func:`mutual_information`
    (MI averages this map into one number).

    Float discipline: each (tld, lang) term
    ``floor(p * ln(p/q) * 1e6 + 0.5)`` quantizes ONCE (the
    :func:`~.stages.events.path_entropy` precedent), so per-TLD sums
    are order-free integers.  Scale shape: one bounded (tld, lang)
    reduce; the term table is |tlds| x |langs|."""
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        parts = pc_.split_pattern(batch.column("url"), pattern="/")
        host = pc_.list_element(parts, 2)
        tld = pc_.list_element(
            pc_.split_pattern(host, pattern=".", max_splits=1, reverse=True),
            1)
        df = pd_.DataFrame({
            "tld": tld.to_pylist(),
            "lang": batch.column("lang").to_pylist(),
        })
        g = df.groupby(["tld", "lang"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    conf = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tld", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if conf.empty:
        raise ValueError("tld_lang_divergence: no pages")
    langs = sorted(conf["lang"].unique().tolist())
    L = len(langs)
    glob = conf.groupby("lang")["c"].sum()
    N = int(glob.sum())
    rows = {"tld": [], "n": [], "kl_micro": []}
    for tld, grp in conf.groupby("tld", sort=True):
        cnt = {l: 0 for l in langs}
        for l, c in zip(grp["lang"], grp["c"]):
            cnt[l] = int(c)
        n = sum(cnt.values())
        kl = 0
        for l in langs:  # fixed lang order; terms are ints so order-free
            p = float(cnt[l] + 1) / float(n + L)
            q = float(int(glob.get(l, 0)) + 1) / float(N + L)
            kl += int(np.floor(p * np.log(p / q) * 1e6 + 0.5))
        rows["tld"].append(tld)
        rows["n"].append(n)
        rows["kl_micro"].append(kl)
    return rd.from_arrow(pa.table({
        "tld": pa.array(rows["tld"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "kl_micro": pa.array(rows["kl_micro"], pa.int64()),
    }))


VOCAB_TOPK = 100


def lang_vocab_overlap(ds, k: int = VOCAB_TOPK, n_parts: int | None = None):
    """documents -> (lang_a, lang_b, overlap, jaccard): the pairwise
    JACCARD of each language pair's top-``k`` token vocabulary — how
    much surface vocabulary the languages share (code-switching /
    shared-boilerplate diagnostic; near-zero for clean language
    separation, high when sources leak templates across languages).

    DETERMINISTIC top-k by (count DESC, token) per language (the
    :func:`zipf_slope` rank rule); the pair math runs on the bounded
    |langs| x k sets driver-side.  Scale shape: (lang, token)-hash-
    partitioned counts, per-partition local top-k, tiny merge — the
    vocabulary never reaches the driver, only k rows per language."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions import hashing
    from ..functions.hashing import fnv_token_hash64

    def token_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "tok": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row = row[nonempty]
        toks = flat.filter(pa.array(nonempty))
        if len(toks) == 0:
            return empty
        import pandas as pd_

        df = pd_.DataFrame({"lang": langs[row], "tok": toks.to_pylist()})
        g = df.groupby(["lang", "tok"], sort=False).size() \
            .reset_index(name="cnt")
        key = fnv_token_hash64(pa.array(g["tok"], pa.string())) \
            .view(np.int64)
        part = hashing.coarse_partition(key, n_parts)
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "tok": pa.array(g["tok"], pa.string()),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
                         "__part": pa.array(part.astype(np.int64))})

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame({"lang": part.column("lang").to_pylist(),
                            "tok": part.column("tok").to_pylist(),
                            "cnt": part.column("cnt").to_numpy(
                                zero_copy_only=False)})
        g = df.groupby(["lang", "tok"], sort=False)["cnt"].sum() \
            .reset_index()
        # local top-k per lang is SAFE: a token's global count lives in
        # exactly one token-hash partition
        g = g.sort_values(["lang", "cnt", "tok"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(g, preserve_index=False)

    top = (
        ds.map_batches(token_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    ).to_pandas()
    if top.empty:
        raise ValueError("lang_vocab_overlap: no tokens")
    sets = {}
    for lang, grp in top.groupby("lang", sort=True):
        g = grp.sort_values(["cnt", "tok"], ascending=[False, True],
                            kind="mergesort").head(k)
        sets[lang] = set(g["tok"].tolist())
    langs = sorted(sets)
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"lang_a": [], "lang_b": [], "overlap": [], "jaccard": []}
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            rows["lang_a"].append(a)
            rows["lang_b"].append(b)
            rows["overlap"].append(inter)
            rows["jaccard"].append(r6(float(inter) / float(union)))
    return rd.from_arrow(pa.table({
        "lang_a": pa.array(rows["lang_a"], pa.string()),
        "lang_b": pa.array(rows["lang_b"], pa.string()),
        "overlap": pa.array(rows["overlap"], pa.int64()),
        "jaccard": pa.array(rows["jaccard"], pa.float64()),
    }))
