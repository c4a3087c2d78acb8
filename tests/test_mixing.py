"""Hand-checkable fixtures for the crawl-refresh dedup (latest_capture)
and the training-data mixing resample (mixture_sample) — both are also
oracle-gated end-to-end at sf0.01; these pin the semantics on planted
inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pages_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    np.array([r[2] for r in rows], dtype="datetime64[us]")
                ),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def test_latest_capture_keeps_newest_snapshot_per_url():
    from cuda_gis_smoothing_ray.stages.extract import latest_capture

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        (1, "https://a.com/x", t0, "old a"),
        (2, "https://a.com/x", t0 + np.timedelta64(5, "s"), "new a"),
        (3, "https://b.com/y", t0 + np.timedelta64(1, "s"), "only b"),
        (4, "https://a.com/x", t0 + np.timedelta64(2, "s"), "mid a"),
    ]
    out = latest_capture(_pages_ds(rows)).to_pandas().sort_values("url")
    assert out["page_id"].tolist() == [2, 3]
    # text carried byte-verbatim through the dedup
    assert out["text"].tolist() == ["new a", "only b"]
    assert list(out.columns) == ["url", "page_id", "warc_ts", "text"]


def test_latest_capture_ts_tie_breaks_by_page_id():
    from cuda_gis_smoothing_ray.stages.extract import latest_capture

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        (10, "https://a.com/x", t0, "ten"),
        (11, "https://a.com/x", t0, "eleven"),  # same warc_ts: max page_id wins
    ]
    out = latest_capture(_pages_ds(rows)).to_pandas()
    assert out["page_id"].tolist() == [11]


def test_mixture_sample_rates_hand_math():
    """3 sources with counts (4, 2, 1) and weights (1, 2, 3): scores w/n =
    (0.25, 1.0, 3.0) -> reference group src2 keeps 1e6 ppm; the others get
    floor(1e6 * w_s * n_m / (n_s * w_m)) = floor(1e6*1*1/(4*3)) = 83333 and
    floor(1e6*2*1/(2*3)) = 333333."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import (
        SAMPLE_MOD, SAMPLE_MULT, mixture_sample,
    )

    src = ["src0"] * 4 + ["src1"] * 2 + ["src2"]
    ids = list(range(7))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "source": pa.array(src, pa.string())})
    )
    out = mixture_sample(ds).to_pandas().sort_values("doc_id")
    expected_ppm = {"src0": 83_333, "src1": 333_333, "src2": 1_000_000}
    for _, row in out.iterrows():
        assert row["keep_ppm"] == expected_ppm[row["source"]]
    # the kept set is exactly the modular-hash rule applied to those rates
    kept = set(out["doc_id"])
    for i, s in zip(ids, src):
        should = ((i % SAMPLE_MOD) * (SAMPLE_MULT % SAMPLE_MOD)) % SAMPLE_MOD \
            < expected_ppm[s]
        assert (i in kept) == should
    # the most-underrepresented source is never downsampled
    assert 6 in kept


def test_mixture_weight_suffix():
    from cuda_gis_smoothing_ray.stages.gridops import mixture_weight

    assert mixture_weight("src0") == 1
    assert mixture_weight("src19") == 20


def test_incremental_dedup_planted():
    """New increment keeps only texts absent from the prior snapshot."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import incremental_dedup

    prior = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 2], pa.int64()),
        "text": pa.array(["seen before", "also seen"], pa.string()),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 3, 5], pa.int64()),
        "text": pa.array(["seen before", "brand new", "also seen"], pa.string()),
    }))
    out = incremental_dedup(new, prior).to_pandas()
    assert out["doc_id"].tolist() == [3]
    assert out["text"].tolist() == ["brand new"]
