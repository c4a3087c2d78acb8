"""Bigram language-model quality scoring — the CCNet-style perplexity
filtering slot (Wenzek et al. 2020: score every document with a small LM
trained on a reference subset, filter on the score), re-expressed as two
Ray Data passes with an exact fixed-point score.

**Train pass** (bounded model): documents with ``doc_id % train_mod == 0``
are the reference subset.  Batch-local token/bigram counting (Arrow
``split_pattern_regex``, dictionary-encoded pair packing — same kernel
shape as :func:`.textops.top_bigrams`), one hash-partitioned shuffle of
the distinct (token, cnt) / (bigram, cnt) partials, then the model is
capped deterministically: top ``vocab_max`` unigrams by (cnt DESC, token
ASC) and bigrams within the vocab with ``cnt >= min_count``.  The capped
model is the only thing that leaves the shuffle — bounded by ``vocab_max``
regardless of corpus size.

**Score pass** (broadcast, actor pool): the model is ``ray.put`` ONCE; a
callable-class stage builds sorted lookup arrays in ``__init__`` (once per
actor) and scores each batch with two ``np.searchsorted`` probes per
token stream — no shuffle at all, so the pass streams at read speed.

**Exact score**: per bigram position, ``term = ((c12 + 1) * 10^9) //
(c1 + V)`` — add-one-smoothed next-token probability in integer
nano-units.  Flooring each term before the sum makes the per-document
score order-independent int64 arithmetic, so the DuckDB oracle
(``sql/oracles_corpus.lm_score_sql``) matches bit-for-bit — the same
trick the engine uses everywhere it would otherwise depend on float
reduction order (see stages/pagerank.py).  ``score_fp`` is a likelihood
proxy (higher = more in-distribution), the filtering semantics of CCNet's
perplexity without the float log.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scale import default_parts

TRAIN_MOD = 2
MIN_COUNT = 2
VOCAB_MAX = 50_000
SCALE = 10**9

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _tokens(batch: pa.Table):
    """text column -> (doc_idx, tokens Arrow array) with empties dropped;
    identical tokenization to textops.top_bigrams (SQL:
    ``list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '')``)."""
    import pyarrow.compute as pc

    n = len(batch)
    split = pc.split_pattern_regex(pc.fill_null(batch.column("text"), ""),
                                   r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = split.flatten()
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc_idx[nonempty], flat.filter(pa.array(nonempty))


def _count_partial(batch: pa.Table, n_parts: int = 64) -> pa.Table:
    """Batch-local (gram, n, cnt) partial counts: n=1 rows are unigrams
    (gram = token), n=2 rows are bigrams (gram = 'w1 w2', within-doc
    consecutive pairs).  Tokens never contain whitespace, so the joined
    key is collision-free.  ``n_parts`` is bound at pipeline build time
    via ``default_parts()`` (cluster-sized coarse gram shuffle)."""
    import pyarrow.compute as pc

    empty = pa.table({"gram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int8()),
                      "cnt": pa.array([], pa.int64()),
                      "__part": pa.array([], pa.int64())})
    doc_idx, toks = _tokens(batch)
    if len(toks) == 0:
        return empty
    dic = toks.dictionary_encode()
    if isinstance(dic, pa.ChunkedArray):
        dic = dic.combine_chunks()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ucode, ucnt = np.unique(codes, return_counts=True)
    grams = [dic.dictionary.take(pa.array(ucode))]
    ns = [np.full(len(ucode), 1, np.int8)]
    cnts = [ucnt.astype(np.int64)]
    adj = doc_idx[1:] == doc_idx[:-1]
    c1, c2 = codes[:-1][adj], codes[1:][adj]
    if len(c1):
        packed = c1 * (codes.max() + 1) + c2
        uniq, uidx, bcnt = np.unique(packed, return_index=True, return_counts=True)
        w1 = dic.dictionary.take(pa.array(c1[uidx]))
        w2 = dic.dictionary.take(pa.array(c2[uidx]))
        grams.append(pc.binary_join_element_wise(w1, w2, " "))
        ns.append(np.full(len(uniq), 2, np.int8))
        cnts.append(bcnt.astype(np.int64))
    gram = pa.concat_arrays([g.combine_chunks() if isinstance(g, pa.ChunkedArray)
                             else g for g in grams])
    from ..functions.hashing import poly_hash64

    part = ((poly_hash64(gram) * _GOLDEN) >> np.uint64(52)) % np.uint64(n_parts)
    return pa.table({"gram": gram, "n": pa.array(np.concatenate(ns)),
                     "cnt": pa.array(np.concatenate(cnts)),
                     "__part": pa.array(part.astype(np.int64))})


def _merge_counts(df: pd.DataFrame) -> pd.DataFrame:
    out = df.groupby(["gram", "n"], sort=False)["cnt"].sum().reset_index()
    return out[["gram", "n", "cnt"]]


def train_bigram_lm(docs_ds, train_mod: int = TRAIN_MOD,
                    min_count: int = MIN_COUNT, vocab_max: int = VOCAB_MAX):
    """documents -> bounded LM dict with sorted numpy lookup tables:
    ``vocab`` (sorted tokens), ``vcnt`` (aligned counts), ``bkey``
    (sorted id1 * vocab_size + id2), ``bcnt``, ``V`` (vocab size)."""

    def in_train(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(d % train_mod == 0))

    counted = (
        docs_ds.map_batches(in_train, batch_format="pyarrow", batch_size=None)
        .map_batches(_count_partial, batch_format="pyarrow", batch_size=None,
                     fn_kwargs={"n_parts": default_parts()})
        .groupby("__part")
        .map_groups(_merge_counts)
        .to_pandas()
    )
    if counted.empty:  # zero docs -> columnless frame; raise the contract
        raise ValueError(
            f"train_bigram_lm: empty vocabulary — the doc_id % {train_mod} "
            "== 0 training subset has no tokens; widen train_mod or check "
            "the input (scoring would otherwise divide by V=0)")
    uni = counted[counted["n"] == 1]
    # deterministic vocab cap: (cnt DESC, token ASC), top vocab_max
    uni = uni.sort_values(["cnt", "gram"], ascending=[False, True],
                          kind="mergesort").head(vocab_max)
    order = np.argsort(uni["gram"].to_numpy())
    vocab = uni["gram"].to_numpy()[order]
    vcnt = uni["cnt"].to_numpy(np.int64)[order]
    if len(vocab) == 0:
        raise ValueError(
            f"train_bigram_lm: empty vocabulary — the doc_id % {train_mod} "
            "== 0 training subset has no tokens; widen train_mod or check "
            "the input (scoring would otherwise divide by V=0)")
    bi = counted[(counted["n"] == 2) & (counted["cnt"] >= min_count)]
    w12 = bi["gram"].str.split(" ", n=1, expand=True) if len(bi) else None
    V = len(vocab)
    if len(bi):
        i1 = np.searchsorted(vocab, w12[0].to_numpy())
        i2 = np.searchsorted(vocab, w12[1].to_numpy())
        ok = (
            (i1 < V) & (i2 < V)
            & (vocab[np.minimum(i1, V - 1)] == w12[0].to_numpy())
            & (vocab[np.minimum(i2, V - 1)] == w12[1].to_numpy())
        )
        bkey = i1[ok] * V + i2[ok]
        bcnt = bi["cnt"].to_numpy(np.int64)[ok]
        border = np.argsort(bkey)
        bkey, bcnt = bkey[border], bcnt[border]
    else:
        bkey = np.array([], np.int64)
        bcnt = np.array([], np.int64)
    return {"vocab": vocab, "vcnt": vcnt, "bkey": bkey, "bcnt": bcnt, "V": V}


class LmScorer:
    """Actor-pool scoring stage: model ObjectRef resolved + lookup arrays
    bound once per actor in ``__init__``; ``__call__`` is two vectorized
    searchsorted probes per batch."""

    def __init__(self, model_ref):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.vocab = m["vocab"]
        self.vcnt = m["vcnt"]
        self.bkey = m["bkey"]
        self.bcnt = m["bcnt"]
        self.V = m["V"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx, toks = _tokens(batch)
        n_bg = np.zeros(n, np.int64)
        score = np.zeros(n, np.int64)
        if len(toks):
            # probe the vocab once per DISTINCT token in the batch, then
            # fan results back out through the dictionary codes
            dic = toks.dictionary_encode()
            if isinstance(dic, pa.ChunkedArray):
                dic = dic.combine_chunks()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uarr = dic.dictionary.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.vocab, uarr)
            np.clip(pos, 0, max(self.V - 1, 0), out=pos)
            uknown = (self.vocab[pos] == uarr) if self.V else np.zeros(len(uarr), bool)
            uids = np.where(uknown, pos, -1)
            ucnt1 = np.where(uknown, self.vcnt[pos], 0) if self.V \
                else np.zeros(len(uarr), np.int64)
            ids = uids[codes]
            cnt1 = ucnt1[codes]
            adj = doc_idx[1:] == doc_idx[:-1]
            d = doc_idx[:-1][adj]
            i1, i2 = ids[:-1][adj], ids[1:][adj]
            c1 = cnt1[:-1][adj]
            c12 = np.zeros(len(i1), np.int64)
            both = (i1 >= 0) & (i2 >= 0)
            if both.any() and len(self.bkey):
                key = i1[both] * self.V + i2[both]
                bp = np.searchsorted(self.bkey, key)
                np.clip(bp, 0, len(self.bkey) - 1, out=bp)
                hit = self.bkey[bp] == key
                found = np.zeros(both.sum(), np.int64)
                found[hit] = self.bcnt[bp[hit]]
                c12[both] = found
            term = ((c12 + 1) * SCALE) // (c1 + self.V)
            np.add.at(n_bg, d, 1)
            np.add.at(score, d, term)
        return pa.table({"doc_id": pa.array(doc_ids),
                         "n_bigrams": pa.array(n_bg),
                         "score_fp": pa.array(score)})


def lm_score(docs_ds, train_mod: int = TRAIN_MOD, min_count: int = MIN_COUNT,
             vocab_max: int = VOCAB_MAX, concurrency: int = 4):
    """documents -> (doc_id, n_bigrams, score_fp): every document scored
    by the bounded bigram LM trained on the ``doc_id % train_mod == 0``
    subset.  Two passes; the model is broadcast once via ``ray.put``."""
    import ray

    model = train_bigram_lm(docs_ds, train_mod, min_count, vocab_max)
    ref = ray.put(model)
    return docs_ds.map_batches(
        LmScorer, fn_constructor_kwargs={"model_ref": ref},
        concurrency=concurrency, batch_format="pyarrow", batch_size=1024,
    )


BPE_ROUNDS = 6


def _word_histogram(docs_ds):
    """documents -> (word, cnt) over the shared whitespace tokenization:
    batch-local counts, poly_hash64 word partitions (cluster-sized via
    ``default_parts()`` at build time), one pandas merge per partition —
    only (word, partial-count) rows shuffle."""
    from ..functions.hashing import poly_hash64

    n_parts = default_parts()

    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _tokens(batch)
        vals, cnts = np.unique(flat.to_numpy(zero_copy_only=False),
                               return_counts=True)
        part = poly_hash64(pa.array(vals, pa.string())) % np.uint64(n_parts)
        return pa.table(
            {
                "word": pa.array(vals, pa.string()),
                "cnt": pa.array(cnts.astype(np.int64)),
                "__part": pa.array(part.astype(np.int64)),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("word", sort=False)["cnt"].sum()
                .reset_index()[["word", "cnt"]])

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge, batch_format="pandas")
    )


def bpe_merges(docs_ds, rounds: int = BPE_ROUNDS):
    """Distributed BPE tokenizer training: learn the first ``rounds``
    byte-pair merges of the corpus — the vocabulary-construction step of
    every modern LLM data pipeline, run as a Ray pipeline over the WORD-
    TYPE table (count once, merge on types — the standard Sennrich trick,
    and the scale win: the type table is orders of magnitude smaller than
    the corpus).

    Per round: adjacent-symbol pair counts (batch-local pandas partials,
    bounded (s1, s2) groupby-sum), global argmax via local-head
    :func:`..stages.gridops.topk` (ties (total DESC, s1, s2) — identical
    to the oracle's ORDER BY), then one vectorized merge application over
    the type table, re-materialized so later rounds never recompute
    earlier ones.  Merge semantics (shared with the SQL twin, both
    left-to-right non-overlapping ``replace`` on the space-joined symbol
    string with sentinel spaces): a run like ``a a a`` merges once —
    documented deviation from run-greedy BPE, chosen because Python
    ``str.replace`` and DuckDB ``replace`` implement it identically, so
    the whole training loop is bit-exact cross-engine.
    -> (rank, left_sym, right_sym, merged, pair_count)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .gridops import topk

    words = _word_histogram(docs_ds)

    def init_seq(batch: pa.Table) -> pa.Table:
        # rtrim ONE kind of char — the ' ' separator — so words containing
        # exotic whitespace codepoints (which survive the RE2 \s+ split)
        # keep them as symbols, exactly like the oracle's array_to_string
        seq = pc.utf8_rtrim(pc.replace_substring_regex(
            batch.column("word"), pattern="(.)", replacement=r"\1 "),
            characters=" ")
        return batch.append_column("seq", seq)

    words = words.map_batches(init_seq, batch_format="pyarrow").materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern(batch.column("seq"), " ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten().to_numpy(zero_copy_only=False)
        lens = split.value_lengths().to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "total": pa.array([], pa.int64())})
        mask = np.ones(len(flat), bool)
        mask[np.cumsum(lens) - 1] = False  # last symbol of each word: no pair
        i = np.nonzero(mask)[0]
        if len(i) == 0:  # typed empty (from_pandas would infer null cols)
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "total": pa.array([], pa.int64())})
        df = pd.DataFrame(
            {
                "s1": flat[i],
                "s2": flat[i + 1],
                "total": np.repeat(cnt, np.maximum(lens - 1, 0)),
            }
        )
        g = df.groupby(["s1", "s2"], sort=False)["total"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_rank, out_l, out_r, out_m, out_c = [], [], [], [], []
    for r in range(1, rounds + 1):
        pairs = (
            words.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["s1", "s2"])
            .aggregate(Sum("total", alias_name="total"))
        )
        top = topk(pairs, k=1, by="total", tie_cols=("s1", "s2")).take_all()
        if not top:  # nothing left to merge (all words single-symbol)
            break
        a, b = str(top[0]["s1"]), str(top[0]["s2"])
        out_rank.append(r)
        out_l.append(a)
        out_r.append(b)
        out_m.append(a + b)
        out_c.append(int(top[0]["total"]))
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply(batch: pa.Table, pat=pat, rep=rep) -> pa.Table:
            s = batch.column("seq").to_pandas()
            # strip(' ') not strip(): only the sentinel separators, never a
            # whitespace SYMBOL at a word edge (SQL trim() is spaces-only)
            s = (" " + s + " ").str.replace(pat, rep, regex=False).str.strip(" ")
            idx = batch.column_names.index("seq")
            return batch.set_column(idx, "seq", pa.array(s, pa.string()))

        words = words.map_batches(apply, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            "left_sym": pa.array(out_l, pa.string()),
            "right_sym": pa.array(out_r, pa.string()),
            "merged": pa.array(out_m, pa.string()),
            "pair_count": pa.array(out_c, pa.int64()),
        }
    )


def bpe_tokenize(docs_ds, merges: pa.Table):
    """Apply a learned BPE merge table (:func:`bpe_merges` output, applied
    in rank order with the same sentinel-space replace semantics) to every
    document and count the resulting tokens — the "how many tokens is this
    corpus under MY tokenizer" pass that sizes every training run.

    The merge table is rank-ordered and tiny (it rides the task closure);
    per batch the merges run over the batch's UNIQUE words only (the same
    type/token compression the trainer exploits — word-soup corpora repeat
    words heavily) and token counts map back through the inverse index;
    everything else is Arrow-vectorized.  -> (doc_id, n_tokens) with 0 for
    empty documents."""
    import pyarrow.compute as pc

    pats = [(f" {l} {r} ", f" {m} ") for l, r, m in zip(
        merges.column("left_sym").to_pylist(),
        merges.column("right_sym").to_pylist(),
        merges.column("merged").to_pylist())]

    def f(batch: pa.Table) -> pa.Table:
        owner, words = _tokens(batch)
        uniq, inv = np.unique(words.to_numpy(zero_copy_only=False),
                              return_inverse=True)
        seq = pc.utf8_rtrim(pc.replace_substring_regex(
            pa.array(uniq, pa.string()), pattern="(.)", replacement=r"\1 "),
            characters=" ")
        s = (" " + seq.to_pandas() + " ")
        for pat, rep in pats:
            s = s.str.replace(pat, rep, regex=False)
        arr = pa.array(s, pa.string())
        # tokens per unique word = separator spaces - 1 (sentinels add 2)
        per_uniq = pc.count_substring(arr, " ").to_numpy(
            zero_copy_only=False) - 1
        n = np.bincount(owner, weights=per_uniq[inv].astype(np.float64),
                        minlength=len(batch)).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n)})

    return docs_ds.map_batches(f, batch_format="pyarrow")


BUCKET_QS = (1.0 / 3.0, 2.0 / 3.0)


def ccnet_buckets(docs_ds, train_mod: int = TRAIN_MOD, min_count: int = MIN_COUNT,
                  vocab_max: int = VOCAB_MAX, concurrency: int = 4):
    """CCNet's head/middle/tail perplexity bucketing: score every document
    with the bigram LM, take exact tercile thresholds of ``score_fp`` over
    the corpus, and label each doc ``head`` (top third, best-modeled),
    ``middle`` or ``tail`` by VALUE comparison against the thresholds (so
    threshold ties land deterministically in one bucket on both engines).

    Thresholds come from :func:`..stages.sketch.quantiles` — the exact
    value-histogram plan (only (value, count) pairs shuffle), same
    rank-``floor((n-1)q)`` definition the SQL twin computes.  The scored
    stream is consumed twice (threshold pass + label pass): two scans is
    the honest cost of EXACT terciles at scale — production CCNet
    thresholds on a sampled histogram for one scan, at the price of
    exactness.  -> (doc_id, score_fp, bucket)."""
    from .sketch import quantiles

    scored = lm_score(docs_ds, train_mod, min_count, vocab_max, concurrency)

    def score_of(batch: pa.Table):
        return batch.column("score_fp").to_numpy(zero_copy_only=False).astype(
            np.int64)

    th = quantiles(scored, score_of, qs=BUCKET_QS)
    t1, t2 = (int(v) for v in th.column("value").to_pylist())

    def label(batch: pa.Table) -> pa.Table:
        s = score_of(batch)
        bucket = np.where(s > t2, "head", np.where(s > t1, "middle", "tail"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_fp": batch.column("score_fp"),
                "bucket": pa.array(bucket.astype(object), pa.string()),
            }
        )

    return scored.map_batches(label, batch_format="pyarrow")
