"""Skew / worst-case fixtures (the standing regression class for the scale
guards): hot cell, hot user, hot LSH bucket, and 2^31 doc-id overflow.

Each test plants the adversarial distribution the guard exists for and
asserts BOTH bounded behavior (the guard fires / the fan-out is capped) and
correctness (the capped / vectorized path still matches a local oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(doc_ids, texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


IDENTICAL = (
    "the same boilerplate footer text repeated across every page of the "
    "site with enough tokens for shingles"
)


# ---------------------------------------------------------------------------
# hot LSH bucket: thousands of identical docs land in ONE bucket
# ---------------------------------------------------------------------------


def test_minhash_hot_bucket_pair_fanout_is_capped():
    from cuda_gis_smoothing_ray.stages.textops import minhash_pairs

    n, cap = 300, 16
    ds = _docs_ds(list(range(n)), [IDENTICAL] * n)
    capped = minhash_pairs(
        ds, threshold=0.5, num_perms=4, shingle_k=3, bands=2, max_bucket=cap
    ).to_pandas()
    # lowest `cap` ids survive per bucket -> exactly C(cap,2) verified pairs
    assert len(capped) == cap * (cap - 1) // 2
    assert capped["a"].max() < cap and capped["b"].max() < cap

    exact = minhash_pairs(
        _docs_ds(list(range(40)), [IDENTICAL] * 40),
        threshold=0.5, num_perms=4, shingle_k=3, bands=2, max_bucket=None,
    ).to_pandas()
    assert len(exact) == 40 * 39 // 2  # None = exact quadratic semantics


def test_simhash_hot_bucket_pair_fanout_is_capped():
    from cuda_gis_smoothing_ray.stages.textops import simhash_pairs

    n, cap = 300, 16
    ds = _docs_ds(list(range(n)), [IDENTICAL] * n)
    capped = simhash_pairs(ds, token_hash="fnv", max_bucket=cap).to_pandas()
    assert len(capped) == cap * (cap - 1) // 2
    assert (capped["hamming"] == 0).all()

    exact = simhash_pairs(
        _docs_ds(list(range(40)), [IDENTICAL] * 40),
        token_hash="fnv", max_bucket=None,
    ).to_pandas()
    assert len(exact) == 40 * 39 // 2


# ---------------------------------------------------------------------------
# 2^31 id overflow: packed-pair keys must refuse, not corrupt
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("op", ["minhash", "simhash", "jaccard"])
def test_packed_pair_id_overflow_raises(op):
    from cuda_gis_smoothing_ray.stages import textops

    big = 1 << 31
    ds = _docs_ds([big, big + 1], [IDENTICAL, IDENTICAL])
    # the guard may fire at BUILD time (minhash_pairs measures its
    # candidate set eagerly for plan selection) or at consumption — the
    # contract is refuse-not-corrupt, so both build and consume are in
    # the raises block
    with pytest.raises(Exception, match=r"2\^31"):
        if op == "minhash":
            out = textops.minhash_pairs(ds, threshold=0.5, num_perms=4,
                                        shingle_k=3, bands=2)
        elif op == "simhash":
            out = textops.simhash_pairs(ds, token_hash="fnv")
        else:
            out = textops.jaccard_pairs(ds, threshold=0.5, max_df=None)
        out.to_pandas()


# ---------------------------------------------------------------------------
# hot cell: one cell holds ~95% of all pages
# ---------------------------------------------------------------------------


def test_hot_cell_metrics_match_pandas_oracle():
    import ray.data as rd

    from cuda_gis_smoothing_ray.pipelines.flagship import cell_metrics

    rng = np.random.default_rng(7)
    n = 20_000
    cell = np.where(rng.random(n) < 0.95, 42, rng.integers(0, 10, n)).astype(np.int64)
    lang = np.where(rng.random(n) < 0.3, "en", "de")
    text = np.array(["x" * int(k) for k in rng.integers(1, 40, n)], dtype=object)
    mention = rng.random(n) < 0.5
    tbl = pa.table(
        {
            "cell": pa.array(cell),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "has_mention": pa.array(mention),
        }
    )
    got = (
        cell_metrics(rd.from_arrow(tbl).repartition(8))
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["chars"] = df["text"].str.len().astype(float)
    df["is_en"] = (df["lang"] == "en").astype(float)
    df["m"] = df["has_mention"].astype(float)
    want = (
        df.groupby("cell")
        .agg(page_count=("cell", "size"), chars_mean=("chars", "mean"),
             en_share=("is_en", "mean"), mention_rate=("m", "mean"))
        .reset_index()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
    assert (got["page_count"].to_numpy() == want["page_count"].to_numpy()).all()
    for c in ("chars_mean", "en_share", "mention_rate"):
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(),
                                   rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# hot user: one user holds ~90% of all events
# ---------------------------------------------------------------------------


def test_hot_user_running_totals_match_pandas_oracle():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import running_totals

    rng = np.random.default_rng(11)
    n = 20_000
    uid = np.where(rng.random(n) < 0.9, 7, rng.integers(100, 150, n)).astype(np.int64)
    ts = np.datetime64("2026-01-01", "us") + rng.integers(0, 10**9, n).astype(
        "timedelta64[us]"
    )
    val = np.round(rng.random(n) * 100, 2)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(uid),
            "event_type": pa.array(np.full(n, "view"), pa.string()),
            "value": pa.array(val),
        }
    )
    got = (
        running_totals(rd.from_arrow(tbl).repartition(8))
        .to_pandas()
        .sort_values(["user_id", "seq"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    df["cents"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df["cum_cents"] = df.groupby("user_id")["cents"].cumsum()
    df["seq"] = df.groupby("user_id").cumcount() + 1
    assert len(got) == n
    for c in ("event_id", "user_id", "seq", "cum_cents"):
        assert (got[c].to_numpy() == df[c].to_numpy()).all(), c


def test_parts_for_rows_scales_with_volume():
    """Data-aware partition sizing: CPU floor at small volume, linear in
    rows above it, capped."""
    from cuda_gis_smoothing_ray.functions.scale import (default_parts,
                                                        parts_for_rows)

    floor = default_parts(cpus=32)
    assert parts_for_rows(1_000, cpus=32) == floor
    assert parts_for_rows(960_000_000, cpus=32) == 480  # 60M pages x 16
    assert parts_for_rows(10**18, cpus=32) == 65536  # capped


def test_minhash_wide_bands_subset_of_narrow():
    """r=8 bands can only LOSE candidates vs r=4 over the same perms —
    and every pair both emit carries the identical est_jaccard (the
    verify is band-independent)."""
    from cuda_gis_smoothing_ray.stages import textops

    ds = _docs_ds(list(range(12)), [IDENTICAL] * 6 + [
        f"totally different document number {i} about topic {i * 7}"
        for i in range(6)])
    narrow = textops.minhash_pairs(ds, threshold=0.5).to_pandas()
    wide = textops.minhash_pairs(ds, threshold=0.5, bands=8).to_pandas()
    n = set(zip(narrow["a"], narrow["b"]))
    w = set(zip(wide["a"], wide["b"]))
    assert w <= n
    assert (0, 1) in w  # exact dups always collide in every band
    m = narrow.merge(wide, on=["a", "b"], suffixes=("_n", "_w"))
    assert (m["est_jaccard_n"] == m["est_jaccard_w"]).all()
