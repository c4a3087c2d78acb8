"""Incremental aggregate maintenance for the flagship cell table — the
delta-ingest path a continuously-refreshed 100 TB crawl needs: merge a new
crawl increment into STORED per-cell partials instead of rescanning the
whole base corpus.

Model: the cell table's additive state (``flagship.PARTIAL_COLS`` — count
and integer-valued metric sums) is persisted as partitioned parquet plus a
manifest line recording lineage (row count, partial checksum).  Applying a
delta is then:

    stored partials  UNION  delta partials  ->  ONE cell-keyed re-reduce

which touches only |cells| + |delta pages| rows — never the base pages.
Because every sum is integer-valued (exact in float64 below 2^53), the
merged result equals the full-rescan result EXACTLY, in any grouping
order; ``tests/test_resumable.py`` pins that parity.

This composes with :mod:`.manifest` (shard-resumable writes) and
:mod:`.zonemap` (clustered pruned reads): partials are just another
checkpointable table.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def write_partials(geocoded_ds, out_dir: str) -> dict:
    """Reduce geocoded pages to per-cell partials and persist them under
    ``out_dir`` (partitioned parquet + ``_incr_manifest.json`` lineage).
    Returns the manifest dict."""
    from ..pipelines.flagship import PARTIAL_COLS, cell_partials

    ds = cell_partials(geocoded_ds)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    import ray.data as rd

    stored = rd.read_parquet(out_dir, columns=["cell", "n"])
    man = {
        "rows_cells": stored.count(),
        "pages": int(stored.sum("n")),
        "cols": PARTIAL_COLS,
    }
    with open(os.path.join(out_dir, "_incr_manifest.json"), "w") as f:
        json.dump(man, f)
    return man


def merge_delta(stored_dir: str, delta_geocoded_ds):
    """Stored partials + a delta of NEW geocoded pages -> the UPDATED
    partial Dataset (lazy; write with :func:`write_partials`-style
    ``write_parquet`` or finalize directly).  Cost: one scan of the delta
    plus one |cells|-bounded re-reduce — the base page corpus is never
    read."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby_sum
    from ..pipelines.flagship import PARTIAL_COLS, cell_partials

    stored = rd.read_parquet(
        stored_dir, columns=["cell", *PARTIAL_COLS])
    delta = cell_partials(delta_geocoded_ds)
    return hash_groupby_sum(stored.union(delta), "cell", PARTIAL_COLS)


def incremental_metrics(stored_dir: str, delta_geocoded_ds):
    """Updated cell METRIC table from stored partials + a delta — the
    user-facing one-call form."""
    from ..pipelines.flagship import finalize_metrics

    return finalize_metrics(merge_delta(stored_dir, delta_geocoded_ds))
