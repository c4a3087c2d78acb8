"""Flagship pipeline: pages -> geocode -> H3-encode -> per-cell metrics ->
k-ring smoothing (SURVEY §3.4).

Scale shape: the page-level data (the 100 TB side) is touched ONLY by
stateless/actor-pool ``map_batches`` with batch-local partial aggregation —
the only shuffles in the whole pipeline run over *cell-level* rows (bounded by
the number of distinct hex cells, millions at res 9, not by page count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.pages import read_pages
from ..stages.geoencode import geo_encode
from ..stages.smooth import smooth_cells

#: the 4 fused metric columns (the reference's NDVI/MNDWI/EVI/NDWI analog,
#: ``src/cuda/hex_smooth_cuda_v4.cu:26,359-363``)
METRIC_COLS = ["page_count", "chars_mean", "en_share", "mention_rate"]


def _partial_metrics(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation of page metrics by cell."""
    cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    chars = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.float64)
    is_en = pc.equal(batch.column("lang"), "en").to_numpy(zero_copy_only=False).astype(np.float64)
    mention = batch.column("has_mention").to_numpy(zero_copy_only=False).astype(np.float64)
    uniq, inv = np.unique(cell, return_inverse=True)
    ones = np.ones(len(cell), dtype=np.float64)
    return pa.table(
        {
            "cell": pa.array(uniq),
            "n": pa.array(np.bincount(inv, weights=ones, minlength=len(uniq))),
            "s_chars": pa.array(np.bincount(inv, weights=chars, minlength=len(uniq))),
            "s_en": pa.array(np.bincount(inv, weights=is_en, minlength=len(uniq))),
            "s_mention": pa.array(np.bincount(inv, weights=mention, minlength=len(uniq))),
        }
    )


PARTIAL_COLS = ["n", "s_chars", "s_en", "s_mention"]


def cell_partials(geocoded_ds):
    """Geocoded pages -> mergeable per-cell PARTIAL table (cell, n,
    s_chars, s_en, s_mention).  All sums are integer-valued (counts and
    0/1 flags and byte counts), so merging partials in ANY grouping order
    reproduces the full-scan result exactly below 2^53 — the property
    :mod:`..state.incr` relies on for incremental maintenance."""
    from ..functions.reduce import hash_groupby_sum

    return hash_groupby_sum(
        geocoded_ds.map_batches(_partial_metrics, batch_format="pyarrow", batch_size=None),
        "cell",
        PARTIAL_COLS,
    )


def finalize_metrics(partials_ds):
    """Partial table -> the cell metric table (the divide step)."""

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": batch.column("cell"),
                "page_count": pa.array(n.astype(np.int64)),
                "chars_mean": pa.array(batch.column("s_chars").to_numpy(zero_copy_only=False) / n),
                "en_share": pa.array(batch.column("s_en").to_numpy(zero_copy_only=False) / n),
                "mention_rate": pa.array(batch.column("s_mention").to_numpy(zero_copy_only=False) / n),
            }
        )

    return partials_ds.map_batches(finalize, batch_format="pyarrow")


def cell_metrics(geocoded_ds):
    """Geocoded pages -> cell table with the 4 fused metric columns.

    Partial-agg inside map_batches, then a small groupby over partials — the
    page->cell reduction never ships page rows through the shuffle.
    """
    return finalize_metrics(cell_partials(geocoded_ds))


def flagship(sf_dir: str, res: int = 7, k: int = 1, profile: str = "gaussian",
             replicate: int = 1, fused: bool = True, config=None):
    """Full pipeline -> smoothed cell table Dataset (cell + *_sm columns).

    Kwargs are sugar over :class:`..pipelines.config.PipelineConfig` (the
    ref §2.10 option surface); pass ``config=`` to reuse one across stages.
    Note: whole-block batches throughout — the fused build->GeoEncode chain
    processes one input block per task with a single vectorized GeoEncode
    call over the expanded output (a fixed batch_size would both
    under-parallelize the input bundling and re-slice the fan-out).
    """
    from .config import PipelineConfig

    cfg = config or PipelineConfig(res=res, k=k, profile=profile,
                                   replicate=replicate, fused=fused)
    return cfg.flagship(sf_dir)
