"""Common-Crawl-style ``pages`` source (the ``input_hint`` table shape).

Schema: ``(page_id:int64, url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)`` — synthesized *deterministically* from the
driver's ``documents`` parquet (no external data), so the DuckDB oracle can
reconstruct the identical table with pure SQL expressions.

``text`` is carried verbatim from ``documents.text`` — the per-row invariant
(byte-identical ``text`` per ``url`` through every stage, ``BASELINE.json``
input_hint) is checked against this column.

At bench scale the table is replicated ``replicate``x with distinct page_ids
(rep * REP_STRIDE + doc_id) to create volume; oracle queries always use
replicate=1.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import geocode

REP_STRIDE = 1_000_000
WARC_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

PAGES_SCHEMA = pa.schema(
    [
        ("page_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_from_documents_batch(batch: pa.Table, replicate: int = 1,
                               include_html: bool = True,
                               columns: list[str] | None = None) -> pa.Table:
    """documents batch (doc_id, text, lang, ...) -> pages batch.

    Vectorized Arrow/numpy; zero Python-per-row work except the cheap
    url-string join (pyarrow kernel).  Used inside ``map_batches``.

    ``include_html=False`` skips html SYNTHESIS entirely (not build-then-
    drop: at replicate=2000 the html bytes are ~half the replication memcpy,
    and every headline consumer runs html-free).  ``columns`` prunes the
    SYNTHESIS the same way a parquet reader prunes a scan: only requested
    columns are built and replicated (a text+lang consumer at replicate=2000
    otherwise pays 10M-row page_id/warc_ts allocations and the url
    build+memcpy for columns it drops)."""
    want = set(PAGES_SCHEMA.names if columns is None else columns)
    if not include_html:
        want.discard("html")
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch.column("text")
    base_cols: dict = {}
    if "url" in want:
        hid = geocode.host_id(doc_id)
        idx = geocode.tld_index(doc_id)
        tlds = np.array([t[0] for t in geocode.TLD_TABLE])
        # all-Arrow string build (np.char.* is a Python loop per element;
        # the int->string casts + joins below stay in C for the whole column)
        base_cols["url"] = pc.binary_join_element_wise(
            "https://h",
            pc.cast(pa.array(hid), pa.string()),
            ".",
            pa.array(tlds[idx]),
            "/p/",
            pc.cast(pa.array(doc_id), pa.string()),
            "",
        )
    if "html" in want:
        base_cols["html"] = pc.binary_join_element_wise(
            pa.scalar(b"<html><body>", pa.binary()),
            text.cast(pa.binary()),
            pa.scalar(b"</body></html>", pa.binary()),
            b"",
        )
    if "text" in want:
        base_cols["text"] = text
    if "lang" in want:
        base_cols["lang"] = batch.column("lang")
    # page_id/warc_ts are per-replica; everything else is the SAME Arrow
    # buffers referenced `replicate` times (zero-copy chunked concat, no
    # Python loop over replicas)
    per_rep: dict = {}
    if "page_id" in want or "warc_ts" in want:
        page_id = (
            np.arange(replicate, dtype=np.int64)[:, None] * np.int64(REP_STRIDE)
            + doc_id[None, :]
        ).ravel()
        if "page_id" in want:
            per_rep["page_id"] = pa.array(page_id)
        if "warc_ts" in want:
            per_rep["warc_ts"] = pa.array(
                WARC_EPOCH
                + page_id.astype("timedelta64[s]").astype("timedelta64[us]"))
    if replicate > 1 and base_cols:
        base = pa.table(base_cols)
        # combine_chunks: one contiguous buffer instead of `replicate` tiny
        # chunks — downstream Arrow kernels pay per chunk, and thousands of
        # micro-chunks cost more than the one memcpy here
        rep = pa.concat_tables([base] * replicate).combine_chunks()
        base_cols = {c: rep.column(c) for c in base_cols}
    out_cols = {nm: (per_rep.get(nm) if nm in per_rep else base_cols.get(nm))
                for nm in PAGES_SCHEMA.names if nm in want}
    return pa.table(
        out_cols, schema=pa.schema([PAGES_SCHEMA.field(nm) for nm in out_cols]))


def read_pages(sf_dir: str, replicate: int = 1, include_html: bool = True,
               pages_per_task: int = 1_000_000,
               columns: list[str] | None = None):
    """documents.parquet -> pages Dataset.

    Column-pruned read (only doc_id/text/lang leave storage); html synthesis
    is optional so downstream pipelines that never touch html skip the bytes
    entirely (the "project the wide column away ASAP" rule — at 100 TB the
    html column dominates the object store otherwise).  ``columns`` extends
    the same pruning to the SYNTHESIZED columns: a consumer that only reads
    (text, lang) skips the per-replica page_id/warc_ts allocations and the
    url build entirely (see pages_from_documents_batch).
    """
    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    # ~1M expanded pages per task, floored at cpus/2 tasks: each task pays
    # ~25-50 ms of serial dispatch/handoff on this box, so wall time scales
    # LINEARLY with task count once per-task compute is small (measured
    # 16/32/64/128 blocks -> 1.7/2.1/3.7/6.4 s for the same 10 M-page
    # partials pipeline); too-large batches cost worker heap instead
    # (measured ~20% at replicate=16000 with one giant batch per task)
    override = None
    if replicate > 1:
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        cpus = 32
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 32))
        except Exception:
            pass
        # pages_per_task trades dispatch overhead against parallelism: CPU-
        # light consumers (flagship: ~0.2 s/1M pages) want few big tasks;
        # CPU-heavy ones (text-quality kernels: ~13 s/1M pages) pass a
        # smaller value so the work spreads across every core
        override = max(max(4, cpus // 2), (n_docs * replicate) // pages_per_task + 1)
        override = min(override, n_docs)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=override,
    )

    def build(batch: pa.Table) -> pa.Table:
        return pages_from_documents_batch(batch, replicate=replicate,
                                          include_html=include_html,
                                          columns=columns)

    # batch_size=None = one batch per block: the replicate fan-out then runs
    # one task per input block (SplitBlocks gives ~2 blocks/CPU on small
    # files) and every downstream batch stays whole-block vectorized.  A
    # fixed batch_size here would make the fused chain re-slice the expanded
    # output into tiny batches (measured 100x UDF overhead).
    return ds.map_batches(build, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Standalone fixture generator (pytest F1 fixture): seeded pages with ~10% of
# rows embedding an explicit "lat X lon Y" mention to exercise the extractor.
# ---------------------------------------------------------------------------

_WORDS = (
    "the data web page crawl index token model train batch shard stream "
    "filter merge sort group join scan query table row column value"
).split()


def generate_pages_table(n: int, seed: int = 42, mention_rate: float = 0.1) -> pa.Table:
    rng = np.random.default_rng(seed)
    doc_id = np.arange(n, dtype=np.int64)
    n_words = rng.integers(5, 40, size=n)
    texts = []
    for i in range(n):
        words = rng.choice(_WORDS, size=n_words[i]).tolist()
        if rng.random() < mention_rate:
            lat = round(float(rng.uniform(-60, 60)), 4)
            lon = round(float(rng.uniform(-170, 170)), 4)
            words.insert(int(rng.integers(0, len(words))), f"lat {lat:.4f} lon {lon:.4f}")
        texts.append(" ".join(words))
    langs = rng.choice(["en", "de", "fr", "sw", "es"], size=n)
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
        }
    )
    return pages_from_documents_batch(tbl)


def jsonl_roundtrip(sf_dir: str, scratch: str | None = None):
    """documents -> write JSONL shards -> read them back: the
    source/sink ROUND-TRIP proof for the JSONL format (the other
    interchange format a crawl pipeline meets besides Parquet/CSV/.bin).
    Returns the re-read (doc_id, lang, n_chars, text) — the oracle
    compares against the original table directly, so a MATCH proves the
    sink and source preserve every row BYTE-VERBATIM (text goes through
    JSON escaping and back).

    Scale shape: ``write_json`` streams one shard per block (resumable-
    output discipline: a directory of shards, never one giant file);
    the re-read is a plain streaming source."""
    import shutil

    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    out = scratch or f"/tmp/graft_jsonl/{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rd.read_parquet(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "n_chars", "text"]) \
        .write_json(out)
    return rd.read_json(out) \
        .select_columns(["doc_id", "lang", "n_chars", "text"]).sort("doc_id")
