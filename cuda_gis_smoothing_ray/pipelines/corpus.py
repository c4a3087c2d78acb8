"""Corpus-throughput pipeline: per-page text quality metrics aggregated by
language — the bench headline for the text-analysis operator family.

Same scale shape as the flagship: pages flow through ONE fused stateless
map_batches chain (build -> RE2 stat scans -> batch-local partial agg);
only (lang, partial-sum) rows — a handful per block — enter the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import textstats
from ..sources.pages import read_pages


def text_quality_by_lang(sf_dir: str, replicate: int = 1):
    """pages -> (lang, n_pages, mean quality/punct/stop/token metrics)."""
    from ray.data.aggregate import Sum

    # CPU-heavy consumer (~4 s of kernel CPU per 1M pages after the
    # need_bpe cut): task size balances per-task serial dispatch (~25-50 ms
    # on this box) against core spread — r5 sweep at 10 M pages / 32 CPUs:
    # 150k/230k/320k/450k/650k -> 4.58/3.43/3.39/3.52/4.11 s, 300k best;
    # columns= prunes the synthesized page_id/warc_ts/url this pipeline
    # never reads (the at-scale parquet-pruning rule applied to the source)
    pages = read_pages(sf_dir, replicate=replicate, include_html=False,
                       pages_per_task=300_000, columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        # need_bpe=False: this pipeline never reads n_bpe_tokens, and the
        # BPE masks + their reduceat pass are ~15% of the class kernel
        st = textstats.text_stats(batch.column("text"), need_bpe=False)
        # dictionary_encode (C) + bincount, not a pandas groupby: the lang
        # key has a handful of distinct values, so the whole batch-local
        # reduce is 4 weighted bincounts over int32 codes
        enc = batch.column("lang").combine_chunks().dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        langs = enc.dictionary.to_pylist()
        k = len(langs)
        order = np.argsort(np.asarray(langs, dtype=object), kind="stable")
        n = np.bincount(codes, minlength=k)
        s_q = np.bincount(codes, weights=st["quality_score"], minlength=k)
        s_p = np.bincount(codes, weights=st["punct_ratio"], minlength=k)
        s_s = np.bincount(codes, weights=st["stopword_ratio"], minlength=k)
        s_t = np.bincount(codes, weights=st["n_tokens"].astype(np.float64),
                          minlength=k)
        return pa.table({
            "lang": pa.array(np.asarray(langs, dtype=object)[order]),
            "n": pa.array(n[order].astype(np.int64)),
            "s_q": pa.array(s_q[order]),
            "s_p": pa.array(s_p[order]),
            "s_s": pa.array(s_s[order]),
            "s_t": pa.array(s_t[order]),
        })

    reduced = (
        pages.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s_q", alias_name="s_q"),
            Sum("s_p", alias_name="s_p"),
            Sum("s_s", alias_name="s_s"),
            Sum("s_t", alias_name="s_t"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_pages": pa.array(n.astype(np.int64)),
                "mean_quality": pa.array(batch.column("s_q").to_numpy(zero_copy_only=False) / n),
                "mean_punct_ratio": pa.array(batch.column("s_p").to_numpy(zero_copy_only=False) / n),
                "mean_stopword_ratio": pa.array(batch.column("s_s").to_numpy(zero_copy_only=False) / n),
                "mean_tokens": pa.array(batch.column("s_t").to_numpy(zero_copy_only=False) / n),
            }
        )

    return reduced.map_batches(finalize, batch_format="pyarrow")
