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
from ..functions.scale import default_parts

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


#: default PII/entity patterns a production redactor ships with; the
#: oracle-checked query uses a pattern that actually occurs in the synthetic
#: corpus so the check is non-vacuous (emails/phones never appear in it).
PII_EMAIL = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
PII_PHONE = r"\b\+?[0-9][0-9()\-. ]{7,}[0-9]\b"
#: the oracle-checked query's pattern/replacement (shared with sql/ gen)
REDACT_QUERY_PATTERN = r"\b(customer|spark)\b"
REDACT_QUERY_REPLACEMENT = "<ENT>"


def redact_terms(ds, pattern: str, replacement: str = "<REDACTED>",
                 text_col: str = "text"):
    """documents -> (doc_id, text, n_redactions): regex redaction — the
    PII-scrubbing slot of a training-data pipeline (emails, phone numbers,
    credential-looking strings masked before the corpus ships).

    One stateless ``map_batches`` over Arrow string kernels
    (``replace_substring_regex`` + ``count_substring_regex``, both RE2):
    no Python per row, no shuffle, nothing materialized — the stage is a
    pure streaming map, so at 100 TB it scales with read bandwidth exactly
    like the reference's per-cell value transforms
    (``src/cpu/hex_smooth_naive.cpp:48-76`` touch each record once; so does
    this).  DuckDB's ``regexp_replace`` is also RE2, so oracle parity is
    engine-exact, not approximate.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        red = pc.replace_substring_regex(text, pattern=pattern,
                                         replacement=replacement)
        n = pc.cast(pc.count_substring_regex(text, pattern=pattern),
                    pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": red,
            "n_redactions": n,
        })

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


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


def latest_capture(ds, n_parts: int | None = None):
    """pages (possibly many crawl snapshots per url) -> newest row per url:
    DISTINCT ON (url) ORDER BY warc_ts DESC — the Common-Crawl "keep the
    latest capture of each page" dedup that fronts every crawl-refresh
    pipeline.

    Delegates to :func:`..stages.relagg.argmax_by` (batch-local candidate
    per url, coarse hash partitions via the vectorized url rolling hash,
    ONE pandas sort + tail-of-run per partition — Python per PARTITION,
    never per url).  ``text`` is carried through verbatim so the driver's
    value-hash proves the byte-identity invariant survives the dedup.
    -> (url, page_id, warc_ts, text)."""
    n_parts = default_parts() if n_parts is None else n_parts
    from .relagg import argmax_by

    out = argmax_by(ds, "url", ["warc_ts", "page_id"], ["text"],
                    n_parts=n_parts)
    return out.select_columns(["url", "page_id", "warc_ts", "text"])


def recrawl_stats(ds, n_parts: int | None = None):
    """pages (many crawl snapshots) -> per-host recapture-interval stats:
    (host, n_gaps, min_gap_s, max_gap_s, mean_gap_s) over the gaps between
    SUCCESSIVE captures of each host (any page of the host counts as a
    capture) — the crawl-scheduling diagnostic behind refresh policies
    (how stale does a host get between visits?).  Hosts with a single
    capture have no interval and are absent, like the SQL LAG.

    Scale shape: (host, t) rows shuffle ONCE by coarse host hash; each
    partition lexsorts (host, t) and takes segmented diffs (np.diff with
    run boundaries dropped) -> per-host (n, sum, min, max) partials; a
    host-keyed mixed reduce (isum/min/max in ONE shuffle) finishes.
    Python cost per PARTITION, never per host."""
    n_parts = default_parts() if n_parts is None else n_parts
    import numpy as np
    import pandas as pd

    from ..functions import geocode, hashing
    from ..functions.reduce import hash_groupby

    def emit(batch: pa.Table) -> pa.Table:
        from ..sources.pages import REP_STRIDE

        pid = batch.column("page_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        host = geocode.host_id(pid % REP_STRIDE)  # doc_id = page_id % stride
        t = batch.column("warc_ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1_000_000
        return pa.table({
            "host": pa.array(host.astype(np.int64)),
            "t": pa.array(t),
            "__part": pa.array(hashing.coarse_partition(
                host.astype(np.int64), n_parts)),
        })

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        h = df["host"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        order = np.lexsort((t, h))
        h, t = h[order], t[order]
        same = h[1:] == h[:-1]
        gap = np.diff(t)[same]
        gh = h[1:][same]
        if len(gh) == 0:
            return pd.DataFrame({"host": np.array([], np.int64),
                                 "n_gaps": np.array([], np.int64),
                                 "sum_gap": np.array([], np.int64),
                                 "min_gap_s": np.array([], np.int64),
                                 "max_gap_s": np.array([], np.int64)})
        uniq, inv = np.unique(gh, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, gap)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, gap)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, gap)
        return pd.DataFrame({"host": uniq, "n_gaps": n, "sum_gap": s,
                             "min_gap_s": mn, "max_gap_s": mx})

    agg = hash_groupby(
        ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(solve, batch_format="pandas"),
        "host", ["n_gaps", "sum_gap", "min_gap_s", "max_gap_s"],
        how={"n_gaps": "isum", "sum_gap": "isum",
             "min_gap_s": "min", "max_gap_s": "max"},
        n_parts=n_parts,
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np_

        n = batch.column("n_gaps").to_numpy(zero_copy_only=False)
        s = batch.column("sum_gap").to_numpy(zero_copy_only=False)
        mean = np_.floor(s.astype(np_.float64) / n * 1e6 + 0.5) / 1e6
        return pa.table({
            "host": batch.column("host"),
            "n_gaps": batch.column("n_gaps"),
            "min_gap_s": batch.column("min_gap_s"),
            "max_gap_s": batch.column("max_gap_s"),
            "mean_gap_s": pa.array(mean),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None).sort("host")
