"""Zero-row inputs: every operator family must stream an empty result (or
raise its documented contract error), never crash on missing segments,
empty buckets, or zero-length Arrow buffers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _empty_docs():
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )


def _empty_events():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array(np.array([], dtype="datetime64[us]")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    )


def _rows(ds) -> int:
    return sum(b.num_rows for b in ds.iter_batches(batch_size=None,
                                                   batch_format="pyarrow"))


def test_text_and_dedup_family_on_empty_docs():
    from cuda_gis_smoothing_ray.stages import textops

    assert _rows(textops.text_stats(_empty_docs())) == 0
    assert _rows(textops.exact_dedup(_empty_docs())) == 0
    assert _rows(textops.jaccard_pairs(_empty_docs(), threshold=0.5)) == 0
    assert _rows(textops.minhash_pairs(_empty_docs())) == 0
    assert _rows(textops.simhash_pairs(_empty_docs(), token_hash="fnv")) == 0


def test_event_family_on_empty_events():
    from cuda_gis_smoothing_ray.stages import events

    assert _rows(events.sessionize(_empty_events())) == 0
    assert _rows(events.running_totals(_empty_events())) == 0
    assert _rows(events.window_aggregate(_empty_events())) == 0


def test_cell_metrics_on_empty_geocoded():
    import ray.data as rd

    from cuda_gis_smoothing_ray.pipelines.flagship import cell_metrics

    empty_geo = pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "has_mention": pa.array([], pa.bool_()),
        }
    )
    assert _rows(cell_metrics(rd.from_arrow(empty_geo))) == 0


def test_latest_capture_empty_pages():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.extract import latest_capture

    ds = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array(np.array([], dtype="datetime64[us]")),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert _rows(latest_capture(ds)) == 0


def test_mixture_sample_empty_docs():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import mixture_sample

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "source": pa.array([], pa.string())})
    )
    out = mixture_sample(ds)
    assert _rows(out) == 0


def test_ccnet_buckets_empty_raises_contract_error():
    """An empty corpus cannot train the LM: the documented descriptive
    error from train_bigram_lm surfaces, never a ZeroDivisionError."""
    import pytest

    from cuda_gis_smoothing_ray.stages.lm import ccnet_buckets

    with pytest.raises(ValueError, match="empty"):
        ccnet_buckets(_empty_docs())
