"""Distinct-count / HLL / quantile operator tests (stages/sketch.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def id_ds(ray_session):
    """Dataset with a known number of distinct 'url-like' values."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vals = [f"https://h{i % 1777}.com/p/{i}" for i in range(20000)]
    rng.shuffle(vals)
    return rd.from_pandas(pd.DataFrame({"url": vals})).repartition(8)


def test_distinct_count_exact(id_ds):
    from cuda_gis_smoothing_ray.stages.sketch import distinct_count

    out = distinct_count(id_ds)
    assert out.column("n_distinct").to_pylist() == [1777]


def test_hll_within_error(id_ds):
    from cuda_gis_smoothing_ray.stages.sketch import hll_count

    est = hll_count(id_ds).column("n_distinct_est").to_pylist()[0]
    # p=12 -> standard error ~1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - 1777) / 1777 < 0.07, est


def test_hll_deterministic(id_ds):
    from cuda_gis_smoothing_ray.stages.sketch import hll_count

    a = hll_count(id_ds).column("n_distinct_est").to_pylist()[0]
    b = hll_count(id_ds).column("n_distinct_est").to_pylist()[0]
    assert a == b


def test_quantiles_match_numpy(ray_session):
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import quantiles

    rng = np.random.default_rng(5)
    v = rng.integers(0, 3000, 25000)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(6)
    out = quantiles(ds, lambda b: b.column("x").to_numpy(zero_copy_only=False),
                    qs=(0.1, 0.5, 0.9, 0.99)).to_pandas()
    sv = np.sort(v)
    for _, row in out.iterrows():
        k = int(np.floor((len(v) - 1) * row["q"]))
        assert row["value"] == sv[k], (row["q"], row["value"], sv[k])


def test_sliding_window_fanout(sf_dir):
    from cuda_gis_smoothing_ray.stages import events as ev

    tumbling = ev.window_aggregate(ev.read_events(sf_dir)).to_pandas()
    sliding = ev.sliding_window_aggregate(ev.read_events(sf_dir)).to_pandas()
    # every event is in exactly 2 hopping windows (width = 2 x hop)
    assert sliding["n_events"].sum() == 2 * tumbling["n_events"].sum()
    # a tumbling window's (start, type) bucket also exists as a hopping window
    m = sliding.set_index(["window_start", "event_type"])["n_events"]
    for _, r in tumbling.head(20).iterrows():
        assert (r["window_start"], r["event_type"]) in m.index


def test_quantile_filter_band(sf_dir):
    """Survivors sit inside the per-group [p05, p95] band; band edges are
    the exact lower quantiles."""
    import numpy as np
    import pyarrow.compute as pc

    from cuda_gis_smoothing_ray.stages.sketch import grouped_quantiles, quantile_filter

    def text_len(batch):
        return pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    out = quantile_filter(docs, "lang", text_len, lo=0.05, hi=0.95).to_pandas()
    th = grouped_quantiles(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]),
        "lang", text_len, qs=(0.05, 0.95),
    ).to_pandas()
    for lang, g in out.groupby("lang"):
        lo_v = th[(th["lang"] == lang) & (th["q"] == 0.05)]["value"].iloc[0]
        hi_v = th[(th["lang"] == lang) & (th["q"] == 0.95)]["value"].iloc[0]
        assert g["value"].between(lo_v, hi_v).all()
    assert 0 < len(out) < 500  # something trimmed, something kept


def test_grouped_corr_exact_moments():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import grouped_corr

    # lang a: perfectly correlated (y = token count grows with chars);
    # texts chosen so chars/tokens are hand-checkable
    ds = rd.from_arrow(pa.table({
        "text": pa.array(["aa bb", "aaa bbb cc", "a", "bb cc"]),
        "lang": pa.array(["en", "en", "de", "de"]),
    }))
    out = grouped_corr(ds).to_pandas().sort_values("lang").reset_index(drop=True)
    assert out["lang"].tolist() == ["de", "en"]
    assert out["n_docs"].tolist() == [2, 2]
    # de: (x,y) = (1,1), (5,2); en: (5,2), (10,3) -> both perfectly linear
    assert out["corr_chars_tokens"].tolist() == [1.0, 1.0]
    # population covariance: de mean x=3,y=1.5 -> cov = (2*.5 + 2*.5)/2 = 1
    assert out["cov_chars_tokens"].tolist() == [1.0, 1.25]


def test_heavy_hitters_exact_two_pass():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import heavy_hitters

    # stream of 20 tokens split across 4 single-doc batches; "hot" appears
    # 8 times (40%), "warm" 4 (20%), everything else below the 20% bar
    docs = [
        "hot hot warm x1 x2",
        "hot hot warm x3 x4",
        "hot hot warm x5 x6",
        "hot hot warm x7 x8",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(docs),
    })).repartition(4)
    out = (
        heavy_hitters(ds, phi_den=5)  # threshold = ceil(20/5) = 4
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert out["token"].tolist() == ["hot", "warm"]
    assert out["cnt"].tolist() == [8, 4]


def test_window_distinct_users_dedups_across_batches():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import window_distinct_users

    # user 1 appears twice in window 0 across two partitions -> counted once
    ts = np.array([5, 8, 15, 7], dtype="datetime64[us]")
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts),
        "user_id": pa.array([1, 2, 1, 1], pa.int64()),
    })).repartition(3)
    out = (
        window_distinct_users(ds, window_us=10)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert out["window_start"].to_numpy().astype(np.int64).tolist() == [0, 10]
    assert out["n_users"].tolist() == [2, 1]


def test_cms_overestimates_only_and_matches_brute():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import (
        CMS_A, CMS_B, CMS_P, cms_user_counts)

    # planted skew: user 7 hot, plus enough distinct users (> width=8) to
    # force bucket collisions so n_est > n_true actually occurs
    rng_users = np.concatenate([np.full(50, 7), np.arange(100, 130).repeat(2)])
    ds = rd.from_arrow(pa.table({"user_id": pa.array(rng_users, pa.int64())})
                       ).repartition(4)
    out = cms_user_counts(ds, width=8).to_pandas().sort_values("user_id")

    # exact side is exact
    true = {7: 50, **{u: 2 for u in range(100, 130)}}
    assert dict(zip(out["user_id"], out["n_true"])) == true
    # CMS never underestimates
    assert (out["n_est"] >= out["n_true"]).all()
    # brute-force sketch agrees cell-for-cell
    sk = np.zeros((4, 8), np.int64)
    for j in range(4):
        bkt = ((rng_users.astype(np.int64) * CMS_A[j] + CMS_B[j]) % CMS_P) % 8
        np.add.at(sk[j], bkt, 1)
    for u, est in zip(out["user_id"], out["n_est"]):
        want = min(sk[j][((u * CMS_A[j] + CMS_B[j]) % CMS_P) % 8] for j in range(4))
        assert est == want
    # collisions present (otherwise the min-over-depths is vacuous)
    assert (out["n_est"] > out["n_true"]).any()


def test_poly_hash64_matches_scalar_reference():
    from cuda_gis_smoothing_ray.functions.hashing import (
        _FNV_PRIME, poly_hash64, splitmix64)

    def ref(t: str) -> int:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in t.encode():
                h = h * _FNV_PRIME + np.uint64(b)
        return int(splitmix64(np.array([h]))[0])

    ss = ["", "a", "host42.example.co.uk", "x" * 200, "h9.com"]
    assert [int(v) for v in poly_hash64(ss)] == [ref(s) for s in ss]


def test_hll_registers_estimate_consistent(id_ds):
    """The register table the SQL oracle certifies must reproduce the HLL
    estimate within the standard error bound (same registers, same math)."""
    from cuda_gis_smoothing_ray.stages.sketch import HLL_P, hll_registers

    merged = hll_registers(id_ds).to_pandas()
    m = 1 << HLL_P
    reg = np.zeros(m, np.float64)
    reg[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg))
    zeros = float(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    assert abs(est - 1777) / 1777 < 0.05


def test_quantiles_cont_matches_numpy_linear():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import quantiles_cont

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, 501)
    ds = rd.from_items([{"v": int(x)} for x in vals])
    out = quantiles_cont(
        ds, lambda b: b.column("v").to_numpy(zero_copy_only=False), qs=(0.25, 0.5, 0.9)
    ).to_pandas().set_index("q")
    for q in (0.25, 0.5, 0.9):
        want = np.quantile(vals, q, method="linear")
        assert abs(out.loc[q, "value"] - want) < 1e-5, (q, out.loc[q, "value"], want)


def test_grouped_quantiles_cont_matches_numpy_per_group():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import grouped_quantiles_cont

    rng = np.random.default_rng(9)
    rows = [{"g": f"g{i % 3}", "v": int(x)} for i, x in enumerate(rng.integers(0, 500, 400))]
    out = grouped_quantiles_cont(
        rd.from_items(rows),
        "g",
        lambda b: b.column("v").to_numpy(zero_copy_only=False),
        qs=(0.5, 0.9),
    ).to_pandas().set_index(["g", "q"])
    import pandas as pd

    df = pd.DataFrame(rows)
    for g in ("g0", "g1", "g2"):
        vals = df[df["g"] == g]["v"].to_numpy()
        for q in (0.5, 0.9):
            want = np.quantile(vals, q, method="linear")
            assert abs(out.loc[(g, q), "value"] - want) < 1e-5


def test_sampled_quantiles_error_gate():
    """The deterministic hash-sample quantiles track the exact quantiles:
    on 20k skewed values a 20% sample must land within 5% relative error
    at every q (and be exactly reproducible run-to-run)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import quantiles, sampled_quantiles

    rng = np.random.default_rng(7)
    n = 20_000
    vals = np.floor(np.exp(rng.normal(6.0, 1.0, n))).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(vals),
    })).repartition(4)

    def col(batch: pa.Table) -> np.ndarray:
        return batch.column("v").to_numpy(zero_copy_only=False)

    exact = quantiles(ds, col).to_pandas().set_index("q")["value"]
    got1 = sampled_quantiles(ds, col).to_pandas().set_index("q")["value"]
    got2 = sampled_quantiles(ds, col).to_pandas().set_index("q")["value"]
    assert (got1 == got2).all()  # deterministic, not an RNG sample
    for q in exact.index:
        rel = abs(got1[q] - exact[q]) / max(exact[q], 1)
        assert rel < 0.05, (q, got1[q], exact[q])


def test_linear_probe_hand_fit():
    """y = 10x + 7 exactly: slope 10, intercept 7, r2 = 1 on planted docs
    (n_chars = len(text), n_tokens = whitespace tokens)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import linear_probe

    # k tokens of 9 chars + (k-1) separators = 10k - 1 chars... build texts
    # with EXACT n_chars = 10 * n_tokens + 7: pad with leading spaces
    texts = []
    for k in (1, 2, 3, 5, 8):
        body = " ".join(["x" * 9] * k)          # 10k - 1 chars, k tokens
        texts.append(" " * 8 + body)            # +8 -> 10k + 7 chars
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })).repartition(2)
    out = linear_probe(ds).to_pandas()
    assert out["n_docs"].tolist() == [5]
    assert out["slope"].tolist() == [10.0]
    assert out["intercept"].tolist() == [7.0]
    assert out["r2"].tolist() == [1.0]


def test_linear_probe_degenerate_raises():
    import pytest
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import linear_probe

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b", "c d"], pa.string()),  # constant n_tokens
    }))
    with pytest.raises(ValueError, match="singular"):
        linear_probe(ds)


def test_robust_stats_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import robust_stats

    rng = np.random.default_rng(7)
    g = rng.integers(0, 3, 500)
    v = rng.integers(0, 40, 500).astype(np.int64)
    v[g == 2] += 1000  # distinct location per group
    ds = rd.from_arrow(pa.table({"grp": pa.array(g.astype(np.int64)),
                                 "v": pa.array(v)})).repartition(8)
    out = robust_stats(
        ds, "grp", lambda b: b.column("v").to_numpy(zero_copy_only=False)
    ).to_pandas().sort_values("grp").reset_index(drop=True)

    for i in range(3):
        x = np.sort(v[g == i])
        n = len(x)
        med = int(x[(n - 1) // 2])
        mad = int(np.sort(np.abs(x - med))[(n - 1) // 2])
        t = int(np.floor(n * 0.1))
        kept = x[t:n - t]
        tmean = np.floor(kept.sum() / len(kept) * 1e6 + 0.5) / 1e6
        row = out.iloc[i]
        assert (row["n"], row["median"], row["mad"]) == (n, med, mad)
        assert row["trimmed_mean"] == tmean


def test_ks_test_hand_math(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import ks_test

    # a: {1,2,3,4}, b: {3,4,5,6} -> D = 1/2 at v=2
    g = np.array(["a"] * 4 + ["b"] * 4)
    v = np.array([1, 2, 3, 4, 3, 4, 5, 6], np.int64)
    ds = rd.from_arrow(pa.table({"lang": pa.array(g), "v": pa.array(v)})) \
        .repartition(3)
    out = ks_test(ds, "lang",
                  lambda b: b.column("v").to_numpy(zero_copy_only=False),
                  groups=("a", "b")).to_pandas().iloc[0]
    assert out["at_value"] == 2
    assert out["n_a"] == 4 and out["n_b"] == 4
    assert out["ks_d"] == 0.5


def test_ks_test_identical_distributions(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import ks_test

    v = np.tile(np.arange(10, dtype=np.int64), 2)
    g = np.array(["a"] * 10 + ["b"] * 10)
    ds = rd.from_arrow(pa.table({"lang": pa.array(g), "v": pa.array(v)}))
    out = ks_test(ds, "lang",
                  lambda b: b.column("v").to_numpy(zero_copy_only=False),
                  groups=("a", "b")).to_pandas().iloc[0]
    assert out["ks_d"] == 0.0
    assert out["at_value"] == 0  # ties -> smallest v


def test_benford_deviation_hand_counts():
    """First digits extracted by integer division: 1.23 -> 123 -> 1,
    0.05 -> 5, 99.0 -> 9900 -> 9; zero values are excluded; obs sums to
    the positive-row count and expected micro-counts follow Benford."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import benford_deviation

    vals = [1.23, 0.05, 99.0, 0.0, 2.5, 19.99, 0.01]
    ds = rd.from_arrow(pa.table({
        "value": pa.array(vals, pa.float64()),
    }))
    out = benford_deviation(ds).to_pandas().sort_values("digit")
    obs = dict(zip(out["digit"], out["obs"]))
    # digits: 123->1, 5->5, 9900->9, (0 skipped), 250->2, 1999->1, 1->1
    assert obs == {1: 3, 2: 1, 3: 0, 4: 0, 5: 1, 6: 0, 7: 0, 8: 0, 9: 1}
    n = 6
    import math
    for d in range(1, 10):
        e = n * math.log10(1 + 1 / d)
        row = out[out["digit"] == d].iloc[0]
        assert int(row["exp_micro"]) == int(math.floor(e * 1e6 + 0.5))
        assert abs(float(row["chi2_contrib"])
                   - (obs[d] - e) ** 2 / e) < 1e-5


def test_spearman_matches_scipy_formula(sf_dir):
    """The histogram-rank Spearman equals a direct average-tie-rank
    Pearson computed with pandas rank(method='average') on the same
    per-doc (chars, tokens) pairs."""
    import re

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import sketch
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    out = sketch.spearman_corr(
        read_documents(sf_dir, columns=("doc_id", "text", "n_chars"))
    ).to_pandas()
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["text", "n_chars"]).to_pandas()
    toks = t["text"].map(
        lambda s: len([w for w in re.split(r"\s+", s) if w]))
    ra = t["n_chars"].rank(method="average")
    rb = toks.rank(method="average")
    want = np.corrcoef(ra, rb)[0, 1]
    assert abs(float(out["rho"].iloc[0]) - want) < 1e-6
    assert int(out["n"].iloc[0]) == len(t)


def test_weighted_median_len_hand():
    """One long doc holding most tokens dominates the weighted median:
    docs of length (10, 20, 30) with token masses (1, 1, 8) -> the
    weighted median is 30 even though the unweighted median is 20."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import weighted_median_len

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", " ".join(["w"] * 8)], pa.string()),
        "n_chars": pa.array([10, 20, 30], pa.int64()),
    })
    out = weighted_median_len(rd.from_arrow(docs)).to_pandas()
    assert int(out["median_len"].iloc[0]) == 30
    assert int(out["total_tokens"].iloc[0]) == 10
    assert int(out["mass_below"].iloc[0]) == 10


def test_mann_whitney_brute_force(sf_dir):
    """The histogram U/AUC/z equal a direct all-pairs computation with
    the textbook tie-corrected normal approximation."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.sketch import mann_whitney
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    out = mann_whitney(
        read_documents(sf_dir, columns=("doc_id", "n_chars", "lang"))
    ).to_pandas()
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["n_chars", "lang"]).to_pandas()
    a = t.loc[t["lang"] == "en", "n_chars"].to_numpy()
    b = t.loc[t["lang"] == "de", "n_chars"].to_numpy()
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u2 = int(2 * gt + eq)
    assert int(out["u2"].iloc[0]) == u2
    na, nb = len(a), len(b)
    n = na + nb
    _, tc = np.unique(np.concatenate([a, b]), return_counts=True)
    sum_t = int((tc.astype(object) ** 3 - tc).sum())
    var = na * nb * ((n + 1) * n * (n - 1) - sum_t) / (12 * n * (n - 1))
    z = (u2 / 2 - na * nb / 2) / math.sqrt(var)
    assert abs(float(out["z"].iloc[0]) - z) < 1e-6
    assert abs(float(out["auc"].iloc[0]) - u2 / (2 * na * nb)) < 1e-6


def test_mann_whitney_dominance_hand():
    """A group strictly above B gives AUC = 1 and positive z."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import mann_whitney

    t = pa.table({
        "lang": pa.array(["en"] * 3 + ["de"] * 3),
        "n_chars": pa.array([10, 11, 12, 1, 2, 3], pa.int64()),
    })
    out = mann_whitney(rd.from_arrow(t)).to_pandas()
    assert float(out["auc"].iloc[0]) == 1.0
    assert int(out["u2"].iloc[0]) == 18
    assert float(out["z"].iloc[0]) > 0


def test_kmv_distinct_exact_tail_and_estimate():
    """A type with <= k distinct users reports the exact count; a type
    above k estimates with the (k-1)*2^64/h_k rule and bounded error."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import kmv_distinct

    small_users = list(range(10))            # exact tail
    big_users = list(range(1000, 1500))      # 500 > k=64 -> estimated
    t = pa.table({
        "event_type": pa.array(["s"] * 10 + ["b"] * 500),
        "user_id": pa.array(small_users + big_users, pa.int64()),
    })
    out = kmv_distinct(rd.from_arrow(t), k=64).to_pandas() \
        .set_index("event_type")
    assert int(out.loc["s", "n_distinct"]) == 10
    assert int(out.loc["s", "kmv_est"]) == 10
    assert int(out.loc["s", "kmv_k"]) == 10
    assert int(out.loc["b", "n_distinct"]) == 500
    assert int(out.loc["b", "kmv_k"]) == 64
    # ~1/sqrt(k-2) ~ 13% expected error; assert a generous 3-sigma bound
    assert abs(float(out.loc["b", "rel_err"])) < 0.4


def test_kmv_distinct_duplicates_collapse():
    """Repeated (type, user) events do not inflate the distinct count."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import kmv_distinct

    t = pa.table({
        "event_type": pa.array(["x"] * 9),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 3], pa.int64()),
    })
    out = kmv_distinct(rd.from_arrow(t)).to_pandas()
    assert int(out["n_distinct"].iloc[0]) == 3
    assert int(out["kmv_est"].iloc[0]) == 3
    assert float(out["rel_err"].iloc[0]) == 0.0


def test_kruskal_wallis_matches_pandas_ranks():
    """H equals the textbook formula computed with pandas average ranks,
    including the tie correction; identical groups give H ~ 0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import kruskal_wallis

    vals = [5, 7, 7, 9, 1, 2, 2, 3, 7, 8, 8, 10]
    grps = ["a"] * 4 + ["b"] * 4 + ["c"] * 4
    out = kruskal_wallis(rd.from_arrow(pa.table({
        "lang": pa.array(grps), "n_chars": pa.array(vals, pa.int64()),
    }))).to_pandas()
    df = pd.DataFrame({"g": grps, "v": vals})
    df["r"] = df["v"].rank(method="average")
    n = len(df)
    s = sum(g["r"].sum() ** 2 / len(g) for _, g in df.groupby("g"))
    h = 12 * s / (n * (n + 1)) - 3 * (n + 1)
    _, tc = np.unique(vals, return_counts=True)
    h_tie = h / (1 - (tc.astype(float) ** 3 - tc).sum() / (n**3 - n))
    assert abs(float(out["h"].iloc[0]) - h) < 1e-6
    assert abs(float(out["h_tie"].iloc[0]) - h_tie) < 1e-6
    assert int(out["n_groups"].iloc[0]) == 3


def test_welch_ttest_textbook():
    """t and dof match the textbook Welch formulas computed directly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import welch_ttest

    a = np.array([10, 12, 14, 16, 50], dtype=np.int64)   # high variance
    b = np.array([11, 11, 12, 12], dtype=np.int64)       # low variance
    t = pa.table({
        "lang": pa.array(["en"] * len(a) + ["de"] * len(b)),
        "n_chars": pa.array(np.concatenate([a, b]), pa.int64()),
    })
    out = welch_ttest(rd.from_arrow(t)).to_pandas()
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    tt = (a.mean() - b.mean()) / np.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert abs(float(out["t"].iloc[0]) - tt) < 1e-6
    assert abs(float(out["dof"].iloc[0]) - dof) < 1e-6


def test_cume_dist_len_matches_pandas():
    """cume equals pandas' ECDF rank (count <= v) / n within each group."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import cume_dist_len

    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "lang": pa.array(["en", "en", "en", "de", "de", "de"]),
        "n_chars": pa.array([5, 5, 9, 1, 2, 3], pa.int64()),
    })
    out = cume_dist_len(rd.from_arrow(t)).to_pandas()
    want = [2 / 3, 2 / 3, 1.0, 1 / 3, 2 / 3, 1.0]
    for got, w in zip(out.sort_values("doc_id")["cume"], want):
        assert abs(float(got) - w) < 1e-6


def test_top_docs_by_lang_ties():
    """dense_rank <= 2 keeps ALL docs tied at a surviving value."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import top_docs_by_lang

    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "lang": pa.array(["en"] * 6),
        "n_chars": pa.array([9, 9, 7, 7, 7, 1], pa.int64()),
    })
    out = top_docs_by_lang(rd.from_arrow(t), k=2).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2, 3, 4]
    assert out.set_index("doc_id")["rnk"].to_dict() == {
        0: 1, 1: 1, 2: 2, 3: 2, 4: 2}


def test_weighted_sample_deterministic_and_weighted():
    """The draw is a pure function of doc_id (two runs agree), holds
    exactly k rows, and heavy docs are overrepresented vs uniform."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import weighted_sample

    n = 400
    w = np.where(np.arange(n) < 40, 5000, 10).astype(np.int64)  # 10% heavy
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "n_chars": pa.array(w)})
    a = weighted_sample(rd.from_arrow(t), k=40).to_pandas()
    b = weighted_sample(rd.from_arrow(t), k=40).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 40
    heavy = (a["doc_id"] < 40).sum()
    # heavy docs hold 95% of the weight; uniform would give ~4 of 40
    assert heavy >= 20


def test_anova_eta_textbook():
    """F and eta2 match the textbook one-way ANOVA computed directly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import anova_eta

    groups = {"a": [1, 2, 3, 4], "b": [8, 9, 10, 11], "c": [2, 3, 4, 5]}
    langs = [g for g, vs in groups.items() for _ in vs]
    vals = [v for vs in groups.values() for v in vs]
    out = anova_eta(rd.from_arrow(pa.table({
        "lang": pa.array(langs), "n_chars": pa.array(vals, pa.int64()),
    }))).to_pandas()
    all_v = np.array(vals, float)
    gm = all_v.mean()
    ssb = sum(len(v) * (np.mean(v) - gm) ** 2 for v in groups.values())
    ssw = sum(((np.array(v, float) - np.mean(v)) ** 2).sum()
              for v in groups.values())
    k, n = len(groups), len(all_v)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(float(out["f_stat"].iloc[0]) - f) < 1e-5
    assert abs(float(out["eta2"].iloc[0]) - ssb / (ssb + ssw)) < 1e-6


def test_kendall_tau_hand():
    """tau-b = 1 on a strictly monotone relation; ~0 with direction
    flips; matches the brute pair formula with ties."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import kendall_tau

    texts = ["w", "w w", "w w w", "w w", "w w w w w"]
    chars = [1, 2, 3, 2, 9]  # tied x at 2 (both with y=2 -> tie both)
    out = kendall_tau(rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts),
        "n_chars": pa.array(chars, pa.int64()),
    }))).to_pandas()
    x = np.array(chars)
    y = np.array([1, 2, 3, 2, 5])
    C = D = 0
    for i in range(5):
        for j in range(i + 1, 5):
            s = (x[j] - x[i]) * (y[j] - y[i])
            C += s > 0
            D += s < 0
    n0 = 10
    n1 = sum(t * (t - 1) // 2 for t in np.unique(x, return_counts=True)[1])
    n2 = sum(t * (t - 1) // 2 for t in np.unique(y, return_counts=True)[1])
    want = (C - D) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    assert abs(float(out["tau_b"].iloc[0]) - want) < 1e-6
    assert int(out["nc"].iloc[0]) == C and int(out["nd"].iloc[0]) == D


def test_source_len_drift_detects_shift():
    """A source with uniformly longer docs dominates the drift table."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import source_len_drift

    lens = list(range(100, 120)) * 2 + list(range(500, 520))
    srcs = ["norm_a"] * 20 + ["norm_b"] * 20 + ["shifted"] * 20
    out = source_len_drift(rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "n_chars": pa.array(lens, pa.int64()),
        "source": pa.array(srcs),
    }))).to_pandas().set_index("source")
    assert float(out.loc["shifted", "ks_d"]) == 1.0
    assert float(out.loc["norm_a", "ks_d"]) < 0.6


def _bh_reference(p6, m):
    """Textbook BH step-up on already-quantized p values."""
    import math

    order = sorted(range(m), key=lambda i: p6[i])
    adj = [0.0] * m
    best = math.inf
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        best = min(best, p6[i] * m / rank)
        adj[i] = min(1.0, best)
    return adj


def test_bh_fdr_hand(ray_session):
    """Two event types with a planted weekend effect, one without: the
    effected types reject, the null type doesn't, and p_adj matches the
    textbook step-up ladder recomputed from the emitted p values."""
    import ray.data as rd

    rows = {"ts": [], "event_type": [], "value": []}
    # 2021-01-04 is a Monday (weekday); 2021-01-09 a Saturday (weekend)
    wk = np.datetime64("2021-01-04T12:00:00", "us")
    we = np.datetime64("2021-01-09T12:00:00", "us")
    rng = np.random.default_rng(7)
    for et, lift in (("buy", 50.0), ("view", 0.0), ("click", 80.0)):
        for i in range(40):
            rows["ts"].append(wk + np.timedelta64(i, "m"))
            rows["event_type"].append(et)
            rows["value"].append(
                float(np.floor(10 * 100 + rng.normal(0, 2) * 100) / 100))
        for i in range(40):
            rows["ts"].append(we + np.timedelta64(i, "m"))
            rows["event_type"].append(et)
            rows["value"].append(
                float(np.floor((10 + lift) * 100 + rng.normal(0, 2) * 100) / 100))
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
    })).repartition(5)

    from cuda_gis_smoothing_ray.stages.sketch import bh_fdr

    got = bh_fdr(ds).to_pandas().set_index("event_type")
    assert bool(got.loc["buy", "reject"]) and bool(got.loc["click", "reject"])
    assert not bool(got.loc["view", "reject"])
    # the ladder is reproducible from the emitted p values
    p6 = got["p_value"].to_list()
    ref = _bh_reference(p6, len(p6))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    assert [r6(a) for a in ref] == got["p_adj"].to_list()
    # BH adjusted p is monotone in raw p
    s = got.sort_values("p_value")
    assert (np.diff(s["p_adj"].to_numpy()) >= -1e-12).all()


def test_bh_fdr_contract_errors(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "ts": pa.array([np.datetime64("2021-01-04T12:00:00", "us")] * 3,
                       pa.timestamp("us")),
        "event_type": pa.array(["only_weekday"] * 3, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    }))
    from cuda_gis_smoothing_ray.stages.sketch import bh_fdr

    with pytest.raises(ValueError, match="weekday and weekend"):
        bh_fdr(ds).to_pandas()
