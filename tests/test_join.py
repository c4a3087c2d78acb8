"""Relational join tests (stages/join.py): broadcast lookup vs pandas merge,
left-join null semantics, shuffle-join row parity."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_broadcast_inner_matches_pandas(sf_dir, ray_session):
    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join, read_table

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    got = (
        broadcast_hash_join(cust, sf_dir, "nation", "c_nationkey", "n_nationkey", ["n_name"])
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    want = (
        c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .drop(columns="n_nationkey")
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_broadcast_left_join_nulls(sf_dir, ray_session):
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join

    # keys 0..24 exist in nation; 98/99 don't
    df = pd.DataFrame({"k": [0, 5, 98, 24, 99]})
    out = (
        broadcast_hash_join(
            rd.from_pandas(df), sf_dir, "nation", "k", "n_nationkey", ["n_name"], how="left"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out.loc[out["k"].isin([98, 99]), "n_name"].isna().all()
    assert out.loc[~out["k"].isin([98, 99]), "n_name"].notna().all()


def test_shuffle_join_matches_pandas(sf_dir, ray_session):
    from cuda_gis_smoothing_ray.stages.join import read_table, shuffle_join

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    got = (
        shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=4)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    want = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["o_orderkey"].to_numpy() == want["o_orderkey"].to_numpy()).all()
    assert (got["c_nationkey"].to_numpy() == want["c_nationkey"].to_numpy()).all()


def test_broadcast_join_empty_small_side(tmp_path, ray_session):
    """Empty small table: inner drops everything, left yields all-null take
    cols (previously wrapped around to sk[-1] and fabricated matches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join, read_table

    d = str(tmp_path)
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10.0, 20.0, 30.0])}),
        f"{d}/big.parquet",
    )
    pq.write_table(
        pa.table({"rk": pa.array([], pa.int64()), "name": pa.array([], pa.string())}),
        f"{d}/dim.parquet",
    )
    big = read_table(d, "big", ["k", "v"])
    inner = broadcast_hash_join(big, d, "dim", "k", "rk", ["name"]).to_pandas()
    assert len(inner) == 0
    left = broadcast_hash_join(big, d, "dim", "k", "rk", ["name"], how="left").to_pandas()
    assert len(left) == 3 and left["name"].isna().all()


def test_broadcast_join_rejects_duplicate_right_keys(tmp_path, ray_session):
    """Non-unique right keys would silently return one arbitrary match per
    left row instead of SQL row multiplication — must fail loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join, read_table

    d = str(tmp_path)
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])}), f"{d}/big.parquet"
    )
    pq.write_table(
        pa.table({"rk": pa.array([1, 1], pa.int64()), "name": pa.array(["a", "b"])}),
        f"{d}/dim.parquet",
    )
    big = read_table(d, "big", ["k", "v"])
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_hash_join(big, d, "dim", "k", "rk", ["name"])


def test_bloom_no_false_negatives_and_prefilter_drops(ray_session):
    """Bloom membership: every true key passes (no false negatives); the
    vast majority of non-keys are dropped (probabilistic, generous bound)."""
    import numpy as np

    from cuda_gis_smoothing_ray.stages.join import _bloom_hashes, bloom_contains

    m_bits = 1 << 16
    keys = np.arange(0, 5000, 7, dtype=np.int64)  # ~715 keys
    # build locally via the same probe math the distributed build uses
    h1, h2 = _bloom_hashes(keys)
    bitmap = np.zeros(m_bits // 64, np.uint64)
    for i in range(4):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bitmap, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    assert bloom_contains(bitmap, keys, m_bits).all()
    probe = np.arange(100000, 200000, dtype=np.int64)  # disjoint from keys
    fp_rate = bloom_contains(bitmap, probe, m_bits).mean()
    assert fp_rate < 0.05


def test_bloom_semi_join_equals_hash_semi_join(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import bloom_semi_join, hash_semi_join

    rng = np.random.default_rng(7)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 10000, 5000), pa.int64()),
            "v": pa.array(rng.standard_normal(5000)),
        }
    )
    right = pa.table({"rk": pa.array(rng.integers(0, 10000, 300), pa.int64())})
    a = (
        bloom_semi_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk",
                        m_bits=1 << 16)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    b = (
        hash_semi_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert len(a) and a.equals(b)


def test_hash_semi_join_string_keys(ray_session):
    """String keys: partition hash is md5-based, membership resolves on the
    exact values (a partition-hash collision can't change the result)."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import hash_semi_join

    left = pa.table({"k": pa.array(["a", "b", "c", "a", "d"])})
    right = pa.table({"rk": pa.array(["b", "d", "zz"])})
    semi = hash_semi_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk")
    anti = hash_semi_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", anti=True)
    assert sorted(semi.to_pandas()["k"]) == ["b", "d"]
    assert sorted(anti.to_pandas()["k"]) == ["a", "a", "c"]


def test_left_outer_shuffle_join_null_fill():
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import shuffle_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"]),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 3], pa.int64()),
        "v": pa.array([10, 30], pa.int64()),
    }))
    out = (
        shuffle_join(left, right, on="k", right_on="rk",
                     num_partitions=2, join_type="left_outer")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].isna().tolist() == [False, True, False]


def test_distinct_values_and_grouped_distinct_count():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import distinct_values, grouped_distinct_count

    rows = [{"g": f"g{i % 3}", "v": f"v{i % 7}"} for i in range(100)]
    ds = rd.from_items(rows)
    dv = sorted(distinct_values(ds, "v").to_pandas()["v"])
    assert dv == sorted({r["v"] for r in rows})
    out = grouped_distinct_count(ds, "g", "v").to_pandas().set_index("g")
    import pandas as pd

    want = pd.DataFrame(rows).groupby("g")["v"].nunique()
    for g, n in want.items():
        assert out.loc[g, "n_distinct"] == n
    # int-keyed path too
    ds2 = rd.from_items([{"g": i % 2, "v": i % 9} for i in range(50)])
    assert sorted(distinct_values(ds2, "v").to_pandas()["v"]) == list(range(9))
