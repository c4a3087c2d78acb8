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


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard similarity join via inverted index
# ---------------------------------------------------------------------------

JACCARD_MAX_DF = 256  # default document-frequency cap (see jaccard_pairs)


def jaccard_pairs(ds, threshold: float = 0.8, max_df: int | None = JACCARD_MAX_DF):
    """documents -> (a, b, jaccard) pairs with word-set Jaccard >= threshold.

    Inverted-index plan: distinct (token, doc, set_size) postings ->
    groupby(token) -> per-group candidate pairs (a<b, sizes attached) ->
    groupby(a,b) -> shared = group size, jaccard = shared/(na+nb-shared).

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

    def pairs_of_group(df):
        # df: pandas group for one token, columns doc_id/set_size.
        # Pairs are packed into ONE int64 key (a<<31 | b): a single numeric
        # shuffle key aggregates ~10x faster than a 4-column tuple key.
        # (Packing assumes doc ids < 2^31 per shard; shard-local ids at scale.)
        d = df.sort_values("doc_id")
        ids = d["doc_id"].to_numpy()
        sizes = d["set_size"].to_numpy()
        if max_df is not None and len(ids) > max_df:
            return {"pk": np.empty(0, np.int64), "na": np.empty(0, np.int64),
                    "nb": np.empty(0, np.int64)}
        iu, ju = np.triu_indices(len(ids), k=1)
        return {
            "pk": (ids[iu].astype(np.int64) << np.int64(31)) | ids[ju].astype(np.int64),
            "na": sizes[iu].astype(np.int64),
            "nb": sizes[ju].astype(np.int64),
        }

    N_PARTS = 64

    def add_part(batch: pa.Table) -> pa.Table:
        # coarse hash-partition key: Ray's groupby().aggregate() pays Python
        # per DISTINCT key (124k pair keys -> ~47 s measured); 64 coarse
        # partitions + a vectorized per-partition reduce does the same
        # shuffle work in milliseconds
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        part = (pk.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
        return batch.append_column("part", pa.array(part.astype(np.int64) % N_PARTS))

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
    pairs = posted.groupby("token").map_groups(pairs_of_group)
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

_PAIR_PARTS = 64


def _dedupe_packed_pairs(val_col: str):
    def add_part(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        part = (pk.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
        return batch.append_column("part", pa.array(part.astype(np.int64) % _PAIR_PARTS))

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
                  shingle_k: int = 5, bands: int = 16):
    """documents -> (a, b, est_jaccard) near-dup candidates.

    shingle -> minhash signature -> per-band bucket keys -> groupby(band
    bucket) -> pairs -> groupby(a,b) first -> verify est_jaccard >= threshold
    from the signatures (carried through the shuffle as fixed-width
    list<uint64> columns).  State (the permutation family) is built once per
    worker via the module cache.
    """
    def sigs(batch: pa.Table) -> pa.Table:
        mh = _hasher(num_perms, shingle_k, bands)
        texts = batch.column("text").to_pylist()
        s = mh.signatures(texts)  # (n, P) uint64
        keys = mh.band_keys(s)  # (n, bands) int64
        n = len(texts)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(keys.ravel()),
                "doc_id": pa.array(np.repeat(doc, bands)),
                "sig": pa.array(
                    list(s.astype(np.int64)[np.repeat(np.arange(n), bands)]),
                    pa.list_(pa.int64(), num_perms),
                ),
            }
        )

    def pairs_of_bucket(df):
        d = df.sort_values("doc_id")
        ids = d["doc_id"].to_numpy()
        if len(ids) < 2:
            return {"pk": np.empty(0, np.int64), "est_jaccard": np.empty(0, np.float64)}
        sig = np.stack(d["sig"].to_numpy())  # (g, P)
        iu, ju = np.triu_indices(len(ids), k=1)
        est = (sig[iu] == sig[ju]).mean(axis=1)
        keep = est >= threshold
        return {
            "pk": (ids[iu][keep].astype(np.int64) << np.int64(31))
            | ids[ju][keep].astype(np.int64),
            "est_jaccard": np.floor(est[keep] * 1e6 + 0.5) / 1e6,
        }

    posted = ds.map_batches(sigs, batch_format="pyarrow")
    pairs = posted.groupby("bucket").map_groups(pairs_of_bucket)
    # a pair found in several bands collapses to one row (est is identical in
    # every band — it's computed from the full signature)
    return pairs.map_batches(_dedupe_packed_pairs("est_jaccard"),
                             batch_format="pyarrow", batch_size=None) \
        .groupby("part").map_groups(_reduce_packed_pairs("est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash near-duplicate pairs (Charikar 2002; banded blocking)
# ---------------------------------------------------------------------------

def simhash_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                  token_hash: str = "blake2b"):
    """documents -> (a, b, hamming) pairs with simhash hamming <= max_hamming.

    Pigeonhole blocking: any pair within hamming<=3 agrees exactly on at
    least one of 4 16-bit bands -> groupby(band value) -> verify true
    hamming per candidate pair.
    """
    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sh = hashing.simhash64(texts, token_hash=token_hash)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(texts)
        bands = np.empty((n, n_bands), dtype=np.int64)
        width = 64 // n_bands
        mask = np.uint64((1 << width) - 1)
        for b in range(n_bands):
            bands[:, b] = ((sh >> np.uint64(b * width)) & mask).astype(np.int64)
            bands[:, b] |= np.int64(b) << np.int64(48)  # band id in key space
        return pa.table(
            {
                "bucket": pa.array(bands.ravel()),
                "doc_id": pa.array(np.repeat(doc, n_bands)),
                "simhash": pa.array(np.repeat(sh.astype(np.int64), n_bands)),
            }
        )

    def pairs_of_bucket(df):
        d = df.sort_values("doc_id")
        ids = d["doc_id"].to_numpy()
        if len(ids) < 2:
            return {"pk": np.empty(0, np.int64), "hamming": np.empty(0, np.int64)}
        sh = d["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        ham = hashing.hamming64(sh[iu], sh[ju])
        keep = ham <= max_hamming
        return {
            "pk": (ids[iu][keep].astype(np.int64) << np.int64(31))
            | ids[ju][keep].astype(np.int64),
            "hamming": ham[keep],
        }

    posted = ds.map_batches(sigs, batch_format="pyarrow")
    pairs = posted.groupby("bucket").map_groups(pairs_of_bucket)
    return pairs.map_batches(_dedupe_packed_pairs("hamming"),
                             batch_format="pyarrow", batch_size=None) \
        .groupby("part").map_groups(_reduce_packed_pairs("hamming"))
