"""Planted-fixture tests for the round-2 relational/window additions
(range join, pivot, running totals, semi/anti join, grouped quantiles,
tfidf) — the oracle gate covers them end-to-end; these pin the semantics
on hand-checkable inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[us]")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows]),
            }
        )
    )


US = 1_000_000


def test_range_join_window_semantics():
    from cuda_gis_smoothing_ray.stages.events import range_join

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, t0, 7, "view", 0),
        (2, t0 + np.timedelta64(10, "s"), 7, "view", 0),
        (3, t0 + np.timedelta64(20, "s"), 7, "purchase", 5),
        (4, t0 + np.timedelta64(21, "s"), 7, "view", 0),     # after purchase
        (5, t0, 8, "purchase", 1),                             # other user, no views
        (6, t0 + np.timedelta64(3600, "s"), 7, "purchase", 2), # 1h later
    ]
    out = (
        range_join(_events_ds(rows), window_us=15 * US)
        .to_pandas()
        .sort_values(["event_id", "matched_event_id"])
    )
    pairs = list(zip(out["event_id"], out["matched_event_id"]))
    # purchase 3 sees view 2 (10s before) but not view 1 (20s) or view 4 (after)
    assert pairs == [(3, 2)]
    assert out["lag_us"].tolist() == [10 * US]


def test_pivot_counts_and_running_totals():
    from cuda_gis_smoothing_ray.stages.events import pivot_counts, running_totals

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, t0, 7, "view", 1.25),
        (2, t0 + np.timedelta64(1, "s"), 7, "click", 2.5),
        (3, t0 + np.timedelta64(2, "s"), 7, "view", 0.25),
        (4, t0, 8, "purchase", 10.0),
    ]
    pv = pivot_counts(_events_ds(rows)).to_pandas().sort_values("user_id")
    assert pv["n_view"].tolist() == [2, 0]
    assert pv["n_click"].tolist() == [1, 0]
    assert pv["n_purchase"].tolist() == [0, 1]
    assert np.allclose(pv["sum_value"].to_numpy(), [4.0, 10.0])

    rt = running_totals(_events_ds(rows)).to_pandas().sort_values("event_id")
    assert rt["seq"].tolist() == [1, 2, 3, 1]
    assert rt["cum_cents"].tolist() == [125, 375, 400, 1000]


def test_hash_semi_anti_join_partition(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.join import hash_semi_join, read_table

    d = str(tmp_path)
    pq.write_table(
        pa.table({"k": pa.array(range(10), pa.int64()),
                  "v": pa.array([float(i) for i in range(10)])}),
        f"{d}/left.parquet",
    )
    pq.write_table(
        pa.table({"rk": pa.array([2, 3, 3, 5, 99], pa.int64())}), f"{d}/right.parquet"
    )
    left = read_table(d, "left", ["k", "v"])
    right = read_table(d, "right", ["rk"])
    semi = hash_semi_join(left, right, "k", "rk").to_pandas().sort_values("k")
    assert semi["k"].tolist() == [2, 3, 5]
    anti = hash_semi_join(left, right, "k", "rk", anti=True).to_pandas().sort_values("k")
    assert anti["k"].tolist() == [0, 1, 4, 6, 7, 8, 9]


def test_grouped_quantiles_matches_numpy():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import grouped_quantiles

    rng = np.random.default_rng(2)
    g = np.repeat(np.array(["a", "b", "c"]), 200)
    v = rng.integers(0, 50, 600)
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v.astype(np.int64))}))
    out = (
        grouped_quantiles(ds, "g", lambda b: b.column("v").to_numpy(zero_copy_only=False),
                          qs=(0.5, 0.9))
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    for grp in "abc":
        vals = np.sort(v[g == grp])
        for q in (0.5, 0.9):
            want = vals[int(np.floor((len(vals) - 1) * q))]
            got = out[(out["g"] == grp) & (out["q"] == q)]["value"].iloc[0]
            assert got == want, (grp, q)


def test_tfidf_planted():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import tfidf

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["x x y", "x z", "z z z"], pa.string()),
        }
    )
    out = tfidf(rd.from_arrow(docs)).to_pandas()
    d = {(r.doc_id, r.token): (r.tf, r.df, r.score) for r in out.itertuples()}
    # N=3; score = tf * (4 / (df+1))
    assert d[(0, "x")] == (2, 2, np.floor(2 * (4 / 3) * 1e6 + 0.5) / 1e6)
    assert d[(0, "y")] == (1, 1, 2.0)
    assert d[(2, "z")] == (3, 2, 4.0)
    assert (0, "z") not in d


def test_event_gaps_lag_semantics():
    from cuda_gis_smoothing_ray.stages.events import event_gaps

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, t0, 7, "view", 0),
        (2, t0 + np.timedelta64(10, "s"), 7, "view", 0),
        (3, t0 + np.timedelta64(10, "s"), 7, "view", 0),  # ts tie -> event_id order
        (4, t0, 9, "view", 0),  # only event for user 9 -> dropped
    ]
    got = event_gaps(_events_ds(rows)).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == [2, 3]
    assert got["prev_event_id"].tolist() == [1, 2]
    assert got["gap_us"].tolist() == [10 * US, 0]
    assert got["gap_us"].dtype == np.int64


def test_event_ranks_tie_semantics():
    from cuda_gis_smoothing_ray.stages.events import event_ranks

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    # user 7 cents: 300, 300, 200, 100 -> rnk 1,1,3,4  drnk 1,1,2,3
    rows = [
        (1, t0, 7, "view", 3.0),
        (2, t0, 7, "view", 3.0),
        (3, t0, 7, "view", 2.0),
        (4, t0, 7, "view", 1.0),
        (5, t0, 9, "view", 5.0),
    ]
    got = event_ranks(_events_ds(rows)).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got["rnk"].tolist() == [1, 1, 3, 4, 1]
    assert got["drnk"].tolist() == [1, 1, 2, 3, 1]
    assert got["cents"].tolist() == [300, 300, 200, 100, 500]


def test_moving_sum_bounded_frame():
    from cuda_gis_smoothing_ray.stages.events import moving_sum

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (i, t0 + np.timedelta64(i, "s"), 7, "view", float(i + 1)) for i in range(6)
    ]  # cents 100..600
    got = moving_sum(_events_ds(rows), preceding=2).to_pandas().sort_values("event_id")
    assert got["win_n"].tolist() == [1, 2, 3, 3, 3, 3]
    assert got["win_cents"].tolist() == [100, 300, 600, 900, 1200, 1500]


def test_rollup_sums_levels():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import rollup_sums

    tbl = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["p", "q", "p"]),
            "n": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = (
        rollup_sums(rd.from_arrow(tbl), ["a", "b"], ["n"])
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 3,
        ("x", "ALL"): 3, ("y", "ALL"): 3, ("ALL", "ALL"): 6,
    }
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == want


def test_argmax_by_latest_semantics():
    from cuda_gis_smoothing_ray.stages.relagg import argmax_by

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, t0, 7, "view", 0),
        (2, t0 + np.timedelta64(5, "s"), 7, "buy", 0),
        (3, t0 + np.timedelta64(5, "s"), 7, "view", 0),  # ts tie -> id 3 wins
        (4, t0, 9, "view", 0),
    ]
    got = (
        argmax_by(_events_ds(rows), "user_id", ["ts", "event_id"], ["event_type"])
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [7, 9]
    assert got["event_id"].tolist() == [3, 4]
    assert got["event_type"].tolist() == ["view", "view"]


def test_cube_sums_all_grouping_sets():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import cube_sums

    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y"]),
        "b": pa.array(["p", "q", "p"]),
        "v": pa.array([1, 2, 4], pa.int64()),
    }))
    out = (
        cube_sums(ds, ["a", "b"], ["v"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = {(r.a, r.b): r.v for r in out.itertuples()}
    assert got == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,   # fine
        ("x", "ALL"): 3, ("y", "ALL"): 4,              # by a
        ("ALL", "p"): 5, ("ALL", "q"): 2,              # by b  (not in ROLLUP)
        ("ALL", "ALL"): 7,                             # grand total
    }


def test_event_ntiles_buckets_and_pct():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import event_ntiles

    # 5 rows, one type, k=4 -> NTILE sizes (2,1,1,1); pct_rank = pos/4
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(np.zeros(5, dtype="datetime64[us]")),
        "user_id": pa.array([9] * 5, pa.int64()),
        "event_type": pa.array(["a"] * 5),
        "value": pa.array([0.5, 0.1, 0.3, 0.2, 0.4]),
    }))
    out = event_ntiles(ds, k=4).to_pandas().sort_values("event_id").reset_index(drop=True)
    # cents order: e2(10) e4(20) e3(30) e5(40) e1(50) -> pos 4,0,2,1,3
    assert out["ntile"].tolist() == [4, 1, 2, 1, 3]
    assert out["pct_rank"].tolist() == [1.0, 0.0, 0.5, 0.25, 0.75]


def test_revenue_by_month_calendar_buckets():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import revenue_by_month

    # two orders in 1995-12, one in 1996-01 (month boundary), one in 2003-07
    ds = rd.from_arrow(pa.table({
        "o_orderdate": pa.array(np.array(
            ["1995-12-01", "1995-12-31", "1996-01-01", "2003-07-15"],
            dtype="datetime64[us]")),
        "o_totalprice": pa.array([10.004, 20.006, 5.0, 1.115]),
    }))
    out = revenue_by_month(ds).to_pandas().sort_values(["yr", "mon"]).reset_index(drop=True)
    got = {(r.yr, r.mon): (r.n_orders, r.revenue_cents) for r in out.itertuples()}
    # cents are floor(x*100+0.5): 10.004->1000, 20.006->2001, 1.115->112 (fp repr)
    assert got == {(1995, 12): (2, 3001), (1996, 1): (1, 500), (2003, 7): (1, 112)}


def test_event_context_lead_and_bookends():
    from cuda_gis_smoothing_ray.stages.events import event_context

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, t0, 7, "view", 0),
        (2, t0 + np.timedelta64(10, "s"), 7, "view", 0),
        (3, t0 + np.timedelta64(10, "s"), 7, "view", 0),  # ts tie -> id order
        (4, t0, 9, "view", 0),  # single-event user -> no rows
    ]
    got = (event_context(_events_ds(rows))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [1, 2]       # last row (3) dropped
    assert got["next_event_id"].tolist() == [2, 3]  # LEAD
    assert got["first_event_id"].tolist() == [1, 1]
    assert got["last_event_id"].tolist() == [3, 3]
    assert all(got[c].dtype == np.int64 for c in got.columns)


def test_user_activity_full_outer_regions():
    from cuda_gis_smoothing_ray.stages.events import user_activity_full

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        # user 1: buyer only (cents 150000 >= 100000), 0 views
        (1, t0, 1, "purchase", 1500.0),
        # user 2: viewer only (2 views >= 2), no purchases
        (2, t0, 2, "view", 0.0),
        (3, t0, 2, "view", 0.0),
        # user 3: both sides qualify
        (4, t0, 3, "purchase", 2000.0),
        (5, t0, 3, "view", 0.0),
        (6, t0, 3, "view", 0.0),
        # user 4: neither side qualifies (small purchase, 1 view)
        (7, t0, 4, "purchase", 1.0),
        (8, t0, 4, "view", 0.0),
    ]
    got = (user_activity_full(_events_ds(rows), cents_min=100_000, views_min=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["purchase_cents"].tolist() == [150000, 0, 200000]
    assert got["n_views"].tolist() == [0, 2, 2]
    assert got["purchase_cents"].dtype == np.int64


def test_pricing_summary_planted():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import pricing_summary

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", "N", "A"]),
        "l_linestatus": pa.array(["F", "F", "O", "F"]),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 5.0]),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.0]),
        "l_tax": pa.array([0.0, 0.1, 0.0, 0.0]),
        "l_shipdate": pa.array(np.array(
            ["1999-01-01", "1999-06-01", "1999-06-01", "2001-01-01"],
            dtype="datetime64[us]")),
    })
    got = (pricing_summary(rd.from_arrow(t), cutoff="2000-01-01")
           .to_pandas().sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    # row 4 excluded by cutoff; A/F: qty 300, base 3000, disc 900+2000,
    # charge 900 + 2000*1.1=2200; N/O: disc 1500
    assert got["l_returnflag"].tolist() == ["A", "N"]
    assert got["n_rows"].tolist() == [2, 1]
    assert got["qty_cents"].tolist() == [300, 300]
    assert got["base_cents"].tolist() == [3000, 3000]
    assert got["disc_cents"].tolist() == [2900, 1500]
    assert got["charge_cents"].tolist() == [3100, 1500]


def test_ratio_to_report_shares_sum_to_one():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import ratio_to_report

    ds = rd.from_items([{"g": "a"}] * 30 + [{"g": "b"}] * 60 + [{"g": "c"}] * 10)
    out = ratio_to_report(ds, "g").to_pandas().set_index("g")
    assert out.loc["a", "share"] == 0.3 and out.loc["b", "share"] == 0.6
    assert out["n_rows"].sum() == 100


def test_group_head_first_n_per_group():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.relagg import group_head

    rows = [
        {"g": i % 4, "o": (i * 7) % 23, "id": i} for i in range(100)
    ]
    out = group_head(rd.from_items(rows), "g", ["o", "id"], 3, ["id", "o"]).to_pandas()
    import pandas as pd

    df = pd.DataFrame(rows)
    for g in range(4):
        want = df[df["g"] == g].sort_values(["o", "id"]).head(3)
        got = out[out["g"] == g].sort_values("rank")
        assert got["id"].tolist() == want["id"].tolist()
        assert got["rank"].tolist() == [1, 2, 3]


def _write_pq(path, tbl):
    import pyarrow.parquet as pq

    pq.write_table(tbl, path)


def test_tpch_q13_zero_bucket(tmp_path):
    """Customers with no orders land in the arithmetically-derived zero
    bucket; ordering is (custdist DESC, c_count DESC)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q13

    _write_pq(tmp_path / "customer.parquet", pa.table(
        {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}))
    _write_pq(tmp_path / "orders.parquet", pa.table(
        {"o_custkey": pa.array([1, 1, 2], pa.int64())}))
    out = tpch_q13(str(tmp_path)).to_pandas()
    assert out.values.tolist() == [[0, 2], [2, 1], [1, 1]]


def test_tpch_q22_exact_average_and_dormancy(tmp_path):
    """Above-average uses bal_centi * cnt > sum_centi over POSITIVE
    balances only; a recent order disqualifies."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q22

    _write_pq(tmp_path / "customer.parquet", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "c_acctbal": pa.array([300.0, 250.0, 100.0, -50.0]),
    }))
    # avg over positives = 650/3; bal > avg for custkeys 1 and 2;
    # custkey 1 has a recent order -> only customer 2 survives
    _write_pq(tmp_path / "orders.parquet", pa.table({
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["2001-01-01", "1999-01-01", "2001-01-01"], dtype="datetime64[us]")),
    }))
    out = tpch_q22(str(tmp_path)).to_pandas().values.tolist()
    assert out == [[1, 1, 25000]]


def test_tpch_q18_no_survivors(tmp_path):
    """A threshold no order clears yields an empty report with the full
    schema (the broadcast-survivor path handles the empty set)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q18

    _write_pq(tmp_path / "lineitem.parquet", pa.table({
        "l_orderkey": pa.array([10, 10, 20], pa.int64()),
        "l_quantity": pa.array([5.0, 7.0, 3.0]),
    }))
    _write_pq(tmp_path / "orders.parquet", pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["1996-01-01", "1996-02-01"], dtype="datetime64[us]")),
        "o_totalprice": pa.array([100.0, 200.0]),
    }))
    _write_pq(tmp_path / "customer.parquet", pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
    }))
    ds = tpch_q18(str(tmp_path), min_qty=1000)
    # ray's to_pandas() drops columns on zero-row datasets; the schema is
    # the contract here
    assert set(ds.schema().names) >= {"c_custkey", "c_name", "o_orderkey",
                                      "o_orderdate", "o_totalprice", "sum_qty"}
    assert ds.count() == 0
    # and a low threshold returns both orders, highest totalprice first
    out2 = tpch_q18(str(tmp_path), min_qty=2).to_pandas()
    assert out2["o_orderkey"].tolist() == [20, 10]
    assert out2["sum_qty"].tolist() == [3.0, 12.0]


def test_tpch_q15_keeps_every_tied_top_supplier(tmp_path):
    """Two suppliers with identical max revenue both survive the == max
    filter (the spec's deliberate edge)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q15

    _write_pq(tmp_path / "lineitem.parquet", pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 60.0, 40.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(np.array(
            ["1996-02-01"] * 4, dtype="datetime64[us]")),
    }))
    _write_pq(tmp_path / "supplier.parquet", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
        "s_acctbal": pa.array([1.0, 2.0, 3.0]),
    }))
    out = tpch_q15(str(tmp_path)).to_pandas().sort_values("s_suppkey")
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["total_revenue_cents"].tolist() == [10000, 10000]


def test_tpch_q19_no_matching_arm(tmp_path):
    """Lines matching no arm yield the zero row (coalesce contract)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q19

    _write_pq(tmp_path / "lineitem.parquet", pa.table({
        "l_partkey": pa.array([1], pa.int64()),
        "l_quantity": pa.array([99.0]),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0]),
    }))
    _write_pq(tmp_path / "part.parquet", pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": pa.array(["Brand#11"], pa.string()),
        "p_size": pa.array([3], pa.int32()),
    }))
    out = tpch_q19(str(tmp_path)).to_pandas()
    assert out["revenue_cents"].tolist() == [0]
    assert out["n_lines"].tolist() == [0]


def test_trailing_window_sum_range_semantics():
    """RANGE frame hand case: same-ts peers are BOTH in each other's
    frame; an event exactly window_us earlier is included (inclusive
    bound); one microsecond earlier than that is out; users never share
    frames."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import (TRAIL_WINDOW_US,
                                                      trailing_window_sum)

    W = TRAIL_WINDOW_US
    base = np.datetime64("2024-03-01T12:00:00", "us").astype(np.int64)
    rows = [
        # user 1: boundary + peers
        (1, 1, base - W - 1, 1.00),   # 1us out of frame for event 3
        (2, 1, base - W, 2.00),       # exactly W before -> IN frame
        (3, 1, base, 4.00),
        (4, 1, base, 8.00),           # peer of 3 (same ts)
        # user 2: same timestamps, must not mix with user 1
        (5, 2, base, 16.00),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype=np.int64).view("datetime64[us]")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    out = trailing_window_sum(rd.from_arrow(t)).to_pandas()
    got = {int(r.event_id): (int(r.win_n), int(r.win_cents))
           for r in out.itertuples()}
    assert got[1] == (1, 100)
    assert got[2] == (2, 300)            # includes event 1 (within W of it)
    assert got[3] == (3, 1400)           # event 2 + both peers, event 1 out
    assert got[4] == (3, 1400)           # identical frame (peer semantics)
    assert got[5] == (1, 1600)           # user 2 isolated
