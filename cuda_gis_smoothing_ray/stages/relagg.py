"""Multi-level (ROLLUP / grouping-sets) aggregation.

The reference's aggregations are single-level (SURVEY §2.5); a corpus
pipeline routinely wants subtotals + a grand total in one pass (revenue by
(priority, flag), by priority, overall).  The scale-correct plan is ONE
shuffle to the finest grouping, then deriving every coarser level from the
fine-level result — which is distinct-key-combination sized, i.e. small by
the same assumption any GROUP BY makes — in a single-partition pass.  Base
data is never re-scanned and never shuffled twice.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ..functions.scale import default_parts


def rollup_sums(ds, keys: list[str], sum_cols: list[str], all_label: str = "ALL"):
    """ds -> ROLLUP(keys) over integer ``sum_cols``: the finest level plus
    each prefix subtotal and the grand total, rolled-up key columns set to
    ``all_label`` (a sentinel string, not NULL, so dtypes stay non-nullable
    and exactly comparable).  ``sum_cols`` must be exact integers (cents),
    as always for oracle-checked sums."""
    from ray.data.aggregate import Sum

    fine = ds.groupby(keys).aggregate(*[Sum(c, alias_name=c) for c in sum_cols])

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        levels = [df]
        for n_keep in range(len(keys) - 1, -1, -1):
            kept = keys[:n_keep]
            g = (
                df.groupby(kept, sort=False)[sum_cols].sum().reset_index()
                if kept
                else df[sum_cols].sum().to_frame().T
            )
            for k in keys[n_keep:]:
                g[k] = all_label
            levels.append(g[keys + sum_cols])
        out = pd.concat(levels, ignore_index=True)[keys + sum_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    # repartition(1): the fine level IS the whole rollup input and is
    # distinct-combos sized; one task sees it all, no second shuffle
    return fine.repartition(1).map_batches(expand, batch_format="pyarrow")


def revenue_by_month(ds):
    """orders -> (yr, mon, n_orders, revenue_cents): calendar-bucketed
    revenue — the date-function family (EXTRACT year/month) the reference
    lacks entirely (its keys are spatial, SURVEY §2.5).

    Two-phase like every aggregate here: month buckets are computed
    vectorized from the timestamp column (months-since-epoch arithmetic,
    no per-row datetime objects) and partial-summed INSIDE map_batches,
    so the shuffle moves (yr, mon) partial rows — bounded by the calendar,
    not the data."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = ts.astype("datetime64[M]").astype(np.int64)  # months since 1970-01
        yr = 1970 + m // 12
        mon = m % 12 + 1
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"yr": yr, "mon": mon, "c": cents})
        g = df.groupby(["yr", "mon"], sort=True)["c"].agg(["count", "sum"]).reset_index()
        return pa.table({
            "yr": pa.array(g["yr"].to_numpy(np.int64)),
            "mon": pa.array(g["mon"].to_numpy(np.int64)),
            "n_orders": pa.array(g["count"].to_numpy(np.int64)),
            "revenue_cents": pa.array(g["sum"].to_numpy(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["yr", "mon"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
    )


#: pricing_summary shipdate cutoff (TPC-H Q1 shape; filters ~28% of rows at
#: every sf so the predicate is non-vacuous)
PRICING_CUTOFF = "2000-01-01"


def pricing_summary(ds, cutoff: str = PRICING_CUTOFF):
    """lineitem -> the TPC-H Q1 pricing-summary report per (l_returnflag,
    l_linestatus): row count and exact integer-cent sums of quantity, base
    price, discounted price and charge, over rows shipped on/before
    ``cutoff``.

    The classic scan-heavy aggregate: the predicate and ALL the arithmetic
    run vectorized inside ``map_batches`` and reduce batch-locally to at
    most 6 partial rows (|flags| x |statuses|), so the shuffle is constant
    regardless of fact-table size — at 100 TB this stage is pure read
    bandwidth, like the reference's per-cell metric pass
    (``src/cuda/hex_smooth_cuda_v4.cu:59-111`` fuses all 4 variables into
    one sweep for the same reason).  Per-row cents quantization
    (``floor(x*100+0.5)``) happens BEFORE summation so engine and oracle
    add identical integers in any order.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    cut = np.datetime64(cutoff, "us")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        m = ship <= cut
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_pandas()[m],
            "l_linestatus": batch.column("l_linestatus").to_pandas()[m],
        })
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)[m]
        tx = batch.column("l_tax").to_numpy(zero_copy_only=False)[m]
        qt = batch.column("l_quantity").to_numpy(zero_copy_only=False)[m]
        df["n_rows"] = np.ones(len(df), np.int64)
        df["qty_cents"] = np.floor(qt * 100.0 + 0.5).astype(np.int64)
        df["base_cents"] = np.floor(ep * 100.0 + 0.5).astype(np.int64)
        df["disc_cents"] = np.floor(
            ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        df["charge_cents"] = np.floor(
            ep * (1.0 - dc) * (1.0 + tx) * 100.0 + 0.5).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cols = ["n_rows", "qty_cents", "base_cents", "disc_cents", "charge_cents"]
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


def argmax_by(ds, group_col: str, order_cols: list[str], keep_cols: list[str],
              n_parts: int | None = None):
    """ds -> one row per group: the row with the LARGEST (order_cols) tuple
    (ties impossible by construction when the last order col is unique, e.g.
    an id).  DISTINCT ON / deduplicate-to-latest — the standard "keep newest
    crawl per url" op.

    Two-phase: each batch reduces to one candidate row per group it sees
    (vectorized lexsort + last-of-run), so only |groups-per-batch| rows
    shuffle; candidates then hash-partition into ``n_parts`` COARSE groups
    (``functions/hashing.coarse_partition`` for int64 keys, the vectorized
    ``poly_hash64`` rolling hash otherwise) and each partition resolves
    with ONE pandas sort + tail per run — Python cost per partition, never
    per distinct group (a ``groupby(group).map_groups`` finish would
    dispatch Python once per DISTINCT key: fatal for per-user / per-url
    argmax at corpus scale)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import numpy as np

    from ..functions.hashing import coarse_partition, poly_hash64

    cols = [group_col, *order_cols, *[c for c in keep_cols if c not in order_cols]]

    def local_best(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select(cols).to_pandas()
        # stable sort by (group, *order): last row of each group run is the max
        df = df.sort_values([group_col, *order_cols], kind="stable")
        best = df.groupby(group_col, sort=False).tail(1)
        k = best[group_col].to_numpy()
        if np.issubdtype(k.dtype, np.integer):
            part = coarse_partition(k.astype(np.int64), n_parts)
        else:
            # partition-only hash (resolution keys on exact values); the
            # astype(str) fallback covers nullable-int -> float64 frames
            try:
                arr = pa.array(k, pa.string())
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                arr = pa.array(k.astype(str), pa.string())
            part = (poly_hash64(arr) % np.uint64(n_parts)).astype(np.int64)
        return pa.Table.from_pandas(best.assign(__part=part),
                                    preserve_index=False)

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.sort_values([group_col, *order_cols], kind="stable")
        return g.groupby(group_col, sort=False).tail(1)[cols]

    return (
        ds.map_batches(local_best, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(resolve, batch_format="pandas")
    )


def cube_sums(ds, keys: list[str], sum_cols: list[str], all_label: str = "ALL"):
    """ds -> CUBE(keys): every subset grouping set (2^len(keys) of them),
    collapsed keys set to the ``all_label`` sentinel (same non-nullable
    contract as :func:`rollup_sums`).  ``sum_cols`` must be exact integers.

    Same one-shuffle shape as ROLLUP: only the finest grouping set
    aggregates the fact table; every coarser set re-aggregates the
    distinct-combos-sized fine result in a single task."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    fine = ds.groupby(keys).aggregate(*[Sum(c, alias_name=c) for c in sum_cols])

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        levels = [df]
        for n_keep in range(len(keys) - 1, -1, -1):
            for kept in combinations(keys, n_keep):
                g = (
                    df.groupby(list(kept), sort=False)[sum_cols].sum().reset_index()
                    if kept
                    else df[sum_cols].sum().to_frame().T
                )
                for k in keys:
                    if k not in kept:
                        g[k] = all_label
                levels.append(g[keys + sum_cols])
        out = pd.concat(levels, ignore_index=True)[keys + sum_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    return fine.repartition(1).map_batches(expand, batch_format="pyarrow")


Q3_CUTOFF = "1998-06-15"
Q3_SEGMENT = "BUILDING"
Q3_K = 10


def tpch_q3(sf_dir: str, cutoff: str = Q3_CUTOFF, segment: str = Q3_SEGMENT,
            k: int = Q3_K):
    """TPC-H Q3 shipping-priority: top-k unshipped orders by revenue for one
    market segment — the canonical 3-table join + grouped top-k composition.

    Scale plan: the segment filter shrinks customer to keys only, which
    semi-join ONTO orders without a broadcast (hash_semi_join: distinct keys
    shuffle, not rows); lineitem and the surviving orders meet in one
    orderkey shuffle join; revenue partials pre-aggregate per batch keyed by
    orderkey (o_orderdate / o_orderpriority ride along — they are
    functionally dependent on the key); the final top-k is local-k + one
    k*blocks merge, never a full sort.  Exact integer cents throughout.
    """
    import numpy as np

    from .gridops import topk
    from .join import hash_semi_join, read_table, shuffle_join

    cutoff_ns = np.datetime64(cutoff, "ns")

    def date_filter(col: str, before: bool):
        def f(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False).astype("datetime64[ns]")
            return batch.filter(pa.array(v < cutoff_ns if before else v > cutoff_ns))
        return f

    cust = (
        read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(
                pa.array(b.column("c_mktsegment").to_numpy(zero_copy_only=False)
                         == segment)).select(["c_custkey"]),
            batch_format="pyarrow", batch_size=None)
    )
    orders = (
        read_table(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
        .map_batches(date_filter("o_orderdate", before=True),
                     batch_format="pyarrow", batch_size=None)
    )
    orders = hash_semi_join(orders, cust, left_key="o_custkey",
                            right_key="c_custkey")
    li = (
        read_table(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(date_filter("l_shipdate", before=False),
                     batch_format="pyarrow", batch_size=None)
        .map_batches(lambda b: b.select(["l_orderkey", "l_extendedprice",
                                         "l_discount"]),
                     batch_format="pyarrow", batch_size=None)
    )
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    from ..functions.hashing import coarse_partition
    from ..functions.scale import default_parts

    n_parts = default_parts()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cents = np.floor(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
            * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(),
            "o_orderdate": df["o_orderdate"].to_numpy(),
            "o_orderpriority": df["o_orderpriority"].to_numpy(),
            "revenue_cents": cents,
        })
        g = (
            df.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                       sort=False, as_index=False)["revenue_cents"].sum()
        )
        g["__part"] = coarse_partition(
            g["l_orderkey"].to_numpy(dtype=np.int64), n_parts)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # ONE coarse orderkey-hash partition, not one dispatch per orderkey
        # (the events._by_user lesson: per-key map_groups costs ~0.4 ms of
        # scheduling per group — ruinous at ~100k surviving orders)
        return df.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                          sort=False, as_index=False)["revenue_cents"].sum()

    per_order = (
        j.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )
    return topk(per_order, k, by="revenue_cents", tie_cols=("l_orderkey",))


def ratio_to_report(ds, group_col: str, n_parts_hint: int = 1):
    """Share-of-total per group (the RATIO_TO_REPORT window function):
    -> (group_col, n_rows, share).  Bounded-key count shuffle, then the
    grand total is computed inside ONE single-block pass over the tiny
    per-group table — no driver materialization, no second scan of the
    input."""
    import numpy as np

    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count()).repartition(1)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        total = float(n.sum())
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": pa.array(n),
                "share": pa.array(np.floor(n.astype(np.float64) / total * 1e6 + 0.5) / 1e6),
            }
        )

    return counts.map_batches(finalize, batch_format="pyarrow")


def group_head(ds, group_col: str, order_cols: list[str], n: int,
               keep_cols: list[str]):
    """First ``n`` rows per group by ascending (order_cols) — the LIMIT-
    per-group / "first N events per user" op.  Two-phase like
    :func:`argmax_by`: each batch reduces to at most n candidates per group
    it sees, so only n x |groups-per-batch| rows shuffle; the final
    per-group head re-applies the same ordering and stamps 1-based ranks."""
    import numpy as np

    cols = [group_col, *order_cols, *[c for c in keep_cols if c not in order_cols]]

    def local_head(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values([group_col, *order_cols], kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(n), preserve_index=False
        )

    def final_head(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(order_cols, kind="stable").head(n).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(local_head, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final_head, batch_format="pandas")
    )


Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def tpch_q5(sf_dir: str, region: str = Q5_REGION,
            start: str = Q5_START, end: str = Q5_END):
    """TPC-H Q5 local-supplier volume: revenue by nation where customer and
    supplier share the nation, for one region and order year — the 6-table
    join composed from the engine's join family.

    Scale plan: region+nation collapse driver-side to a nationkey set +
    name map (50 rows total at any SF); supplier is a broadcast dim
    (suppkey -> nationkey, the :func:`..stages.join.broadcast_hash_join`
    unique-key guard applies); customer pre-filters to region nations
    BEFORE its custkey shuffle with date-filtered orders; lineitem meets
    the surviving orders in one orderkey shuffle; the same-nation predicate
    and integer-cent revenue partials are batch-local; the final groupby
    has <= 25 keys (nations), so Ray's aggregate is fine.  Two fact
    shuffles total — the minimum for this join graph."""
    import numpy as np
    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join, read_table, shuffle_join

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    rkeys = {
        int(k): str(n)
        for k, n in zip(reg.column("r_regionkey").to_pylist(),
                        reg.column("r_name").to_pylist())
    }
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    nr = nat.column("n_regionkey").to_numpy(zero_copy_only=False)
    names = nat.column("n_name").to_pylist()
    in_region = {int(k): names[i] for i, k in enumerate(nk)
                 if rkeys[int(nr[i])] == region}
    nation_keys = np.array(sorted(in_region), dtype=np.int64)
    name_of = {k: in_region[k] for k in in_region}

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")

    def order_filter(batch: pa.Table) -> pa.Table:
        v = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        return batch.filter(pa.array((v >= start_ns) & (v < end_ns))).select(
            ["o_orderkey", "o_custkey"]
        )

    def cust_filter(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nation_keys, ck)
        ok = (pos < len(nation_keys))
        ok &= np.where(ok, nation_keys[np.minimum(pos, len(nation_keys) - 1)] == ck, False)
        return batch.filter(pa.array(ok)).select(["c_custkey", "c_nationkey"])

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_filter, batch_format="pyarrow", batch_size=None)
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow", batch_size=None)
    oc = shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey",
                      num_partitions=None)
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = shuffle_join(li, oc, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)
    j = broadcast_hash_join(j, sf_dir, "supplier", left_key="l_suppkey",
                            right_key="s_suppkey", take_cols=["s_nationkey"])

    name_arr = pa.array([name_of[int(k)] for k in nation_keys], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sn = batch.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        same = cn == sn
        cn = cn[same]
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[same]
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False)[same])
            * 100.0 + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(nation_keys, cn)
        uniq, inv = np.unique(pos, return_inverse=True)
        rev = np.bincount(inv, weights=cents.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "n_name": name_arr.take(pa.array(uniq)),
                "revenue_cents": pa.array(rev),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_MAX_QTY = 24.0


def tpch_q6(sf_dir: str):
    """TPC-H Q6 forecasting-revenue-change: one filtered aggregate — the
    predicate-pushdown showcase.  The date/discount/quantity predicates are
    handed to ``read_parquet`` as a pyarrow dataset filter, so row groups
    whose min/max statistics exclude the range never leave storage (the
    "prune at the read" rule); only 3 columns are read.  Revenue =
    sum(l_extendedprice * l_discount) in exact integer cents per row.
    -> one-row table (revenue_cents, n_rows)."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .. import tune_data_context
    tune_data_context()

    f = (
        (pads.field("l_shipdate") >= np.datetime64(Q6_START, "ns"))
        & (pads.field("l_shipdate") < np.datetime64(Q6_END, "ns"))
        & (pads.field("l_discount") >= Q6_DISC_LO)
        & (pads.field("l_discount") <= Q6_DISC_HI)
        & (pads.field("l_quantity") < Q6_MAX_QTY)
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=f,
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * batch.column("l_discount").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"c": pa.array(c)})

    agg = li.map_batches(cents, batch_format="pyarrow").aggregate(
        Sum("c", alias_name="revenue_cents"), Count(alias_name="n_rows")
    )
    return pa.table(
        {
            "revenue_cents": pa.array([int(agg["revenue_cents"])], pa.int64()),
            "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        }
    )


Q4_START, Q4_END = "1996-04-01", "1996-07-01"
Q4_LATE_DAYS = 90


def tpch_q4(sf_dir: str, start: str = Q4_START, end: str = Q4_END,
            late_days: int = Q4_LATE_DAYS):
    """TPC-H Q4 analog — order-priority checking with an EXISTS semi-join.

    The driver's lineitem has no commit/receipt dates, so the lateness
    predicate is re-based on the columns that exist: an order placed in the
    quarter counts if ANY of its lineitems shipped >= ``late_days`` after
    ``o_orderdate``.  The correlated-EXISTS shape (probe-side predicate
    needs a build-side column) is what's new vs :func:`..stages.join
    .hash_semi_join` — the predicate can't be evaluated until the rows
    meet, so it runs as join -> filter -> DISTINCT orderkey count.

    Scale plan: lineitem is pre-filtered at the read (l_shipdate >=
    start + late_days, the earliest a qualifying late shipment can exist —
    row groups outside never leave storage); orders pre-filters to the
    quarter.  One orderkey fact shuffle; after the lateness filter only
    (priority, orderkey) pairs survive, and the distinct-per-priority
    count uses :func:`..stages.join.grouped_distinct_count` (batch-local
    pair dedup, distinct pairs shuffle once, never raw rows).
    -> (o_orderpriority, order_count)."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd

    from .join import grouped_distinct_count, read_table, shuffle_join

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")
    lag = np.timedelta64(late_days, "D")

    def order_filter(batch: pa.Table) -> pa.Table:
        v = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[ns]")
        return batch.filter(pa.array((v >= start_ns) & (v < end_ns))).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_filter, batch_format="pyarrow", batch_size=None)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=pads.field("l_shipdate") >= (start_ns + lag),
    )
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def late_pairs(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[ns]")
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[ns]")
        # the join drops the right-side key column; l_orderkey == o_orderkey
        return batch.filter(pa.array(ship >= od + lag)).select(
            ["o_orderpriority", "l_orderkey"]
        )

    pairs = j.map_batches(late_pairs, batch_format="pyarrow")
    return grouped_distinct_count(pairs, "o_orderpriority", "l_orderkey",
                                  out_col="order_count")


Q12_START, Q12_END = "1996-01-01", "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def tpch_q12(sf_dir: str, start: str = Q12_START, end: str = Q12_END):
    """TPC-H Q12 analog — shipping-class priority counts (conditional
    aggregation over a fact-fact join).

    The driver's lineitem has no l_shipmode, so the report dimension is
    ``l_returnflag``; the measure pair is the canonical Q12 CASE split:
    lines whose order is high-priority (1-URGENT / 2-HIGH) vs everything
    else, for lineitems shipped inside one year.

    Scale plan: shipdate year predicate pushed into the parquet read;
    one orderkey fact shuffle; the CASE split is a batch-local Arrow
    ``is_in`` + bincount partial, so the final groupby sees only
    (returnflag, 2 ints) partial rows — 3 keys total.
    -> (l_returnflag, high_line_count, low_line_count)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import read_table, shuffle_join

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"],
        filter=(pads.field("l_shipdate") >= start_ns)
        & (pads.field("l_shipdate") < end_ns),
    )
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        hi = pc.is_in(
            batch.column("o_orderpriority"),
            value_set=pa.array(list(Q12_HIGH)),
        ).to_numpy(zero_copy_only=False)
        flags = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flags, return_inverse=True)
        high = np.bincount(inv, weights=hi.astype(np.float64),
                           minlength=len(uniq)).astype(np.int64)
        low = np.bincount(inv, weights=(~hi).astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": pa.array([str(u) for u in uniq], pa.string()),
                "high_line_count": pa.array(high),
                "low_line_count": pa.array(low),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
    )


Q14_START, Q14_END = "1996-03-01", "1996-04-01"
Q14_PROMO = "PROMO"


def tpch_q14(sf_dir: str, start: str = Q14_START, end: str = Q14_END):
    """TPC-H Q14 analog — promotion-effect revenue share (ratio of two
    conditional sums through a dimension join).

    The driver's p_type is a single word, so the promo predicate is
    equality to ``'PROMO'`` rather than LIKE 'PROMO%'.  Revenue per row is
    exact integer cents; the final percentage is the one float, computed
    with the shared floor(x*1e6+0.5)/1e6 rounding so the DuckDB oracle
    reproduces it bit-for-bit.

    Scale plan: ship-month predicate pushed into the read (one month of
    lineitem survives); part joins broadcast (partkey -> p_type only); the
    promo/total split is a batch-local partial, so the driver sees exactly
    one (promo_cents, total_cents) pair.
    -> one row (promo_cents, total_cents, promo_pct)."""
    import math

    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= start_ns)
        & (pads.field("l_shipdate") < end_ns),
    )
    j = broadcast_hash_join(li, sf_dir, "part", left_key="l_partkey",
                            right_key="p_partkey", take_cols=["p_type"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        promo = batch.column("p_type").to_numpy(zero_copy_only=False) == Q14_PROMO
        return pa.table(
            {
                "promo_cents": pa.array([int(cents[promo].sum())], pa.int64()),
                "total_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_cents", alias_name="promo_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    # empty filtered month -> Ray Sums come back None; report zeros (the
    # oracle COALESCEs to the same row) instead of int(None)/div-by-zero
    promo_c = int(agg["promo_cents"] or 0)
    total_c = int(agg["total_cents"] or 0)
    pct = (math.floor(100.0 * promo_c / total_c * 1e6 + 0.5) / 1e6
           if total_c else 0.0)
    return pa.table(
        {
            "promo_cents": pa.array([promo_c], pa.int64()),
            "total_cents": pa.array([total_c], pa.int64()),
            "promo_pct": pa.array([pct], pa.float64()),
        }
    )


Q10_START, Q10_END = "1996-01-01", "1996-04-01"
Q10_K = 20


def tpch_q10(sf_dir: str, start: str = Q10_START, end: str = Q10_END,
             k: int = Q10_K):
    """TPC-H Q10 analog — returned-item revenue top customers (multi-join
    grouped report + global top-k).

    Scale plan: lineitem pre-filters to l_returnflag='R' at the read;
    orders pre-filters to the quarter; ONE orderkey fact shuffle, then
    batch-local custkey->cents partials so only per-customer partials
    reach the custkey groupby.  The per-customer revenue table (bounded by
    |customers with returns|) joins customer with a custkey shuffle — the
    fact table is never re-shuffled — and the 25-row nation map is a
    driver-side broadcast lookup.  Top-k is local-head + one-partition
    merge (:func:`..stages.gridops.topk`), never a full sort.
    -> k rows (c_custkey, c_name, revenue_cents, c_acctbal, n_name, rank)."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .gridops import topk
    from .join import broadcast_hash_join, read_table, shuffle_join

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")

    def order_filter(batch: pa.Table) -> pa.Table:
        v = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[ns]")
        return batch.filter(pa.array((v >= start_ns) & (v < end_ns))).select(
            ["o_orderkey", "o_custkey"]
        )

    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_filter, batch_format="pyarrow", batch_size=None)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    )
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        rev = np.bincount(inv, weights=cents.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        return pa.table({"o_custkey": pa.array(uniq),
                         "revenue_cents": pa.array(rev)})

    rev = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    enriched = shuffle_join(rev, cust, on="o_custkey", right_on="c_custkey",
                            num_partitions=None)
    # 25-row nation dim: the guarded broadcast lookup (unique-key check,
    # unmatched rows dropped like the SQL inner join)
    enriched = broadcast_hash_join(enriched, sf_dir, "nation",
                                   left_key="c_nationkey",
                                   right_key="n_nationkey",
                                   take_cols=["n_name"])

    def tidy(batch: pa.Table) -> pa.Table:
        # the custkey join dropped right key c_custkey; o_custkey carries it
        batch = batch.drop_columns(["c_nationkey"])
        return batch.rename_columns(
            ["c_custkey" if c == "o_custkey" else c for c in batch.column_names]
        )

    out = enriched.map_batches(tidy, batch_format="pyarrow")
    return topk(out, k=k, by="revenue_cents", tie_cols=("c_custkey",))


def tpch_q13(sf_dir: str):
    """TPC-H Q13 analog — customer order-count distribution.

    The canonical plan is customer LEFT JOIN orders -> per-customer count
    -> histogram of counts.  Join-free re-plan: the left join only exists
    to surface zero-order customers, so compute the histogram over
    customers that DO order (orders-side double aggregation, no customer
    rows ever shuffle) and derive the zero bucket arithmetically as
    |customer| - |distinct ordering customers| — two scalars.

    Scale plan: orders scan reads only o_custkey; batch-local
    (custkey, n) partials -> custkey groupby -> batch-local histogram
    partials -> c_count groupby (result bounded by the max per-customer
    order count, ~dozens of rows).  The customer table contributes ONE
    count aggregate.  -> (c_count, custdist), custdist DESC, c_count DESC.
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import read_table

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    per_cust = (
        read_table(sf_dir, "orders", ["o_custkey"])
        .map_batches(per_cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c_count").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"c_count": pa.array(uniq),
                         "custdist": pa.array(cnt.astype(np.int64))})

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()  # bounded: one row per distinct order count
    )
    n_customers = read_table(sf_dir, "customer", ["c_custkey"]).count()
    n_ordering = int(hist["custdist"].sum())
    if n_customers > n_ordering:  # the LEFT JOIN's zero bucket
        hist.loc[len(hist)] = [0, n_customers - n_ordering]
    hist = hist.sort_values(["custdist", "c_count"], ascending=[False, False],
                            kind="mergesort").reset_index(drop=True)
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return rd.from_pandas(hist)


Q17_BRAND = "Brand#23"


def tpch_q17(sf_dir: str, brand: str = Q17_BRAND):
    """TPC-H Q17 analog — small-quantity-order revenue for one brand
    (per-key correlated-average threshold).

    The correlated subquery ``l_quantity < 0.2 * avg(l_quantity) per
    part`` needs every part's average before any row can qualify, so it is
    two passes over the SAME brand-pruned scan: pass 1 aggregates
    (sum_qty, cnt) per partkey; pass 2 re-reads and qualifies each line.
    The threshold compare is exact integer math — ``qty < sum/(5*cnt)``
    rewritten as ``qty_centi * cnt * 5 < sum_centi * 100`` (quantities
    scaled x100; no float division anywhere), so the DuckDB oracle matches
    bit-for-bit regardless of summation order.

    Scale plan: the brand's partkeys (|parts|/|brands|, small) broadcast
    once as a sorted membership array; both lineitem scans read 3 columns
    and drop non-brand rows batch-locally, so only one brand's lines ever
    aggregate.  The per-part threshold table (same small cardinality)
    broadcasts back for pass 2.  One-row result: exact total cents of
    qualifying lines, their count, and avg_yearly_cents = total // 7.
    """
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    mask = pc.equal(part.column("p_brand"), brand)
    brand_keys = np.sort(
        part.filter(mask).column("p_partkey").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    keys_ref = ray.put(brand_keys)

    def brand_lines(batch: pa.Table) -> pa.Table:
        bk = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(bk) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(bk, pk), len(bk) - 1)
        return batch.filter(pa.array(bk[pos] == pk))

    def scan():
        return rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        ).map_batches(brand_lines, batch_format="pyarrow", batch_size=None)

    def qty_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qc = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=qc.astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(uniq), "sum_qc": pa.array(s),
                         "cnt": pa.array(n)})

    stats = (
        scan().map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sum_qc", alias_name="sum_qc"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()  # one row per part of ONE brand — small by construction
    )
    pk_sorted = stats["l_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk_sorted, kind="stable")
    thr_ref = ray.put((pk_sorted[order],
                       stats["sum_qc"].to_numpy().astype(np.int64)[order],
                       stats["cnt"].to_numpy().astype(np.int64)[order]))

    def qualify_partial(batch: pa.Table) -> pa.Table:
        pks, sums, cnts = ray.get(thr_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pks) == 0:
            keep = np.zeros(len(pk), dtype=bool)
            total = np.int64(0)
        else:
            pos = np.minimum(np.searchsorted(pks, pk), len(pks) - 1)
            hit = pks[pos] == pk
            qc = np.floor(
                batch.column("l_quantity").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64)
            # qty < sum/(5*cnt)  <=>  qc * cnt * 5 < sum_qc * 100  (exact)
            keep = hit & (qc * cnts[pos] * 5 < sums[pos] * 100)
            cents = np.floor(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64)
            total = cents[keep].sum()
        return pa.table({"total_cents": pa.array([int(total)], pa.int64()),
                         "n_lines": pa.array([int(keep.sum())], pa.int64())})

    agg = scan().map_batches(qualify_partial, batch_format="pyarrow") \
        .sum(["total_cents", "n_lines"])
    total = int(agg["sum(total_cents)"])
    return rd.from_arrow(pa.table({
        "total_cents": pa.array([total], pa.int64()),
        "n_lines": pa.array([int(agg["sum(n_lines)"])], pa.int64()),
        "avg_yearly_cents": pa.array([total // 7], pa.int64()),
    }))


Q18_MIN_QTY = 300
Q18_K = 100


def tpch_q18(sf_dir: str, min_qty: int = Q18_MIN_QTY, k: int = Q18_K):
    """TPC-H Q18 analog — large-volume-customer report (GROUP BY ... HAVING
    semi-join back into the fact's parents).

    Scale plan: lineitem reads 2 columns; batch-local per-order qty
    partials -> one orderkey groupby; the HAVING filter leaves a tiny
    survivor table (orders whose total quantity clears ``min_qty``) that
    broadcasts into the orders scan — orders and customer never shuffle.
    Quantities aggregate as exact x100 integers; the reported sum_qty is
    sum_centi/100.0, exact in float64 for any realistic magnitude.  Final
    report is top-k by (o_totalprice DESC, o_orderkey) via local-head +
    single-partition merge.  -> (c_custkey, c_name, o_orderkey,
    o_orderdate, o_totalprice, sum_qty)."""
    import numpy as np
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .gridops import topk
    from .join import broadcast_hash_join, read_table

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qc = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=qc.astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        return pa.table({"l_orderkey": pa.array(uniq), "sum_qc": pa.array(s)})

    per_order = (
        read_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qc", alias_name="sum_qc"))
    )
    big = per_order.filter(
        expr=f"sum_qc > {int(min_qty) * 100}"
    ).to_pandas()  # HAVING survivors: tiny by construction
    if big.empty:  # zero survivors: typed empty (repartition on all-empty
        # blocks loses the schema downstream, so don't run the probe at all)
        return rd.from_arrow(pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "sum_qty": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }))
    ok = big["l_orderkey"].to_numpy().astype(np.int64)
    sq = big["sum_qc"].to_numpy().astype(np.int64)
    order = np.argsort(ok, kind="stable")
    surv_ref = ray.put((ok[order], sq[order]))

    def pick_orders(batch: pa.Table) -> pa.Table:
        ks, sq = ray.get(surv_ref)
        okey = batch.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0:
            return batch.slice(0, 0).append_column(
                "sum_qty", pa.array([], pa.float64()))
        pos = np.minimum(np.searchsorted(ks, okey), len(ks) - 1)
        hit = ks[pos] == okey
        out = batch.filter(pa.array(hit))
        return out.append_column(
            "sum_qty", pa.array(sq[pos][hit] / 100.0, pa.float64()))

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(pick_orders, batch_format="pyarrow", batch_size=None)
    enriched = broadcast_hash_join(orders, sf_dir, "customer",
                                   left_key="o_custkey", right_key="c_custkey",
                                   take_cols=["c_name"])

    def tidy(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(
            ["c_custkey" if c == "o_custkey" else c for c in batch.column_names]
        )
        return batch.select(["c_custkey", "c_name", "o_orderkey",
                             "o_orderdate", "o_totalprice", "sum_qty"])

    return topk(enriched.map_batches(tidy, batch_format="pyarrow"),
                k=k, by="o_totalprice", tie_cols=("o_orderkey",))


Q22_CUTOFF = "2000-07-01"


def tpch_q22(sf_dir: str, cutoff: str = Q22_CUTOFF):
    """TPC-H Q22 analog — global sales opportunity (broadcast-scalar
    correlated average + windowed NOT EXISTS anti-join).

    The driver's customer has no phone, so the report dimension is
    c_nationkey, and "has no orders" is re-based on the columns that
    exist: no order ON OR AFTER ``cutoff`` (dormant customers).  The
    above-average predicate is exact integer math — ``bal > sum/cnt`` over
    positive balances rewritten as ``bal_centi * cnt > sum_centi`` — so no
    float average is ever materialized.

    Scale plan: pass 1 over customer produces two scalars (sum, count of
    positive balances) via batch partials; the anti-join uses
    :func:`..stages.join.hash_semi_join` (distinct recent custkeys
    shuffle, never order rows); the final per-nation aggregate sees only
    qualifying customers.  -> (c_nationkey, numcust, totacctbal_cents)."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import hash_semi_join, read_table

    def bal_partial(batch: pa.Table) -> pa.Table:
        bc = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = bc > 0
        return pa.table({"s": pa.array([int(bc[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    agg = read_table(sf_dir, "customer", cust_cols) \
        .map_batches(bal_partial, batch_format="pyarrow").sum(["s", "n"])
    sum_c, cnt = int(agg["sum(s)"]), int(agg["sum(n)"])
    if cnt == 0:
        raise ValueError("tpch_q22: no customer with positive acctbal — "
                         "the above-average predicate is undefined")

    def rich(batch: pa.Table) -> pa.Table:
        bc = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        # bal > sum/cnt  <=>  bal_centi * cnt > sum_centi  (exact)
        keep = bc * cnt > sum_c
        return batch.filter(pa.array(keep)).append_column(
            "bal_cents", pa.array(bc[keep], pa.int64()))

    rich_cust = read_table(sf_dir, "customer", cust_cols) \
        .map_batches(rich, batch_format="pyarrow", batch_size=None)
    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= np.datetime64(cutoff, "ns"),
    )
    dormant = hash_semi_join(rich_cust, recent, left_key="c_custkey",
                             right_key="o_custkey", anti=True)

    def nation_partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        bc = batch.column("bal_cents").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nk, return_inverse=True)
        s = np.bincount(inv, weights=bc.astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"c_nationkey": pa.array(uniq),
                         "numcust": pa.array(n),
                         "totacctbal_cents": pa.array(s)})

    return (
        dormant.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("totacctbal_cents", alias_name="totacctbal_cents"))
    )


Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def tpch_q15(sf_dir: str, start: str = Q15_START, end: str = Q15_END):
    """TPC-H Q15 analog — top supplier(s) by quarterly revenue (the
    revenue VIEW + global-max tie filter).

    Scale plan: lineitem reads 3 columns with the quarter pushed into the
    parquet scan; batch-local (suppkey, cents) partials -> one suppkey
    groupby (bounded by |suppliers|); the global max is a driver scalar
    over that aggregate, the == max filter keeps EVERY tied supplier (the
    spec's deliberate edge), and the supplier dim joins by broadcast.
    Revenue is exact integer cents.  -> (s_suppkey, s_name, s_acctbal,
    total_revenue_cents), suppkey order."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= start_ns)
        & (pads.field("l_shipdate") < end_ns),
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(sk, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({"s_suppkey": pa.array(uniq),
                         "total_revenue_cents": pa.array(acc)})

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_revenue_cents", alias_name="total_revenue_cents"))
        .materialize()  # |suppliers| rows; read twice (max + filter)
    )
    best = rev.max("total_revenue_cents")
    if best is None:
        raise ValueError(f"tpch_q15: no lineitem shipped in [{start}, {end})")
    top = rev.filter(expr=f"total_revenue_cents == {int(best)}")
    return broadcast_hash_join(
        top, sf_dir, "supplier", left_key="s_suppkey", right_key="s_suppkey",
        take_cols=["s_name", "s_acctbal"],
    ).map_batches(
        lambda b: b.select(["s_suppkey", "s_name", "s_acctbal",
                            "total_revenue_cents"]),
        batch_format="pyarrow",
    )


Q19_ARMS = (("Brand#11", 1, 5, 1, 11), ("Brand#22", 1, 10, 10, 20),
            ("Brand#33", 1, 15, 20, 30))


def tpch_q19(sf_dir: str, arms: tuple = Q19_ARMS):
    """TPC-H Q19 analog — discounted-revenue sum under a DISJUNCTION of
    per-brand (size range x quantity range) arms (the OR-of-ANDs predicate
    the classic plan must not decompose into three scans).

    Scale plan: ONE lineitem scan (3 columns); part's (brand, size)
    broadcast once as aligned sorted arrays; the whole predicate is a
    batch-local vectorized mask (one searchsorted + |arms| compares), so
    the driver receives a single (revenue_cents, n_lines) row."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk, kind="stable")
    ref = ray.put((pk[order],
                   part.column("p_brand").to_numpy(zero_copy_only=False)[order],
                   part.column("p_size").to_numpy(zero_copy_only=False)
                   .astype(np.int64)[order]))

    def partial(batch: pa.Table) -> pa.Table:
        pks, brands, sizes = ray.get(ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pks, lpk), max(len(pks) - 1, 0))
        hit = (pks[pos] == lpk) if len(pks) else np.zeros(len(lpk), bool)
        keep = np.zeros(len(lpk), bool)
        for brand, s_lo, s_hi, q_lo, q_hi in arms:
            keep |= (hit & (brands[pos] == brand)
                     & (sizes[pos] >= s_lo) & (sizes[pos] <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            "revenue_cents": pa.array([int(cents[keep].sum())], pa.int64()),
            "n_lines": pa.array([int(keep.sum())], pa.int64()),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = li.map_batches(partial, batch_format="pyarrow") \
        .sum(["revenue_cents", "n_lines"])
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([int(agg["sum(revenue_cents)"])], pa.int64()),
        "n_lines": pa.array([int(agg["sum(n_lines)"])], pa.int64()),
    }))


Q7_START, Q7_END = "1996-01-01", "1998-01-01"
Q7_NATIONS = (1, 2)


def tpch_q7(sf_dir: str, start: str = Q7_START, end: str = Q7_END,
            nations: tuple[int, int] = Q7_NATIONS):
    """TPC-H Q7 analog — volume shipping between two nations: revenue of
    lines whose SUPPLIER sits in one of the two nations and whose
    CUSTOMER sits in the other, by (supp_nation, cust_nation, ship year).

    Scale plan: the customer nation rides the ORDERS side — orders
    shuffle-join customer once (both keyed by custkey; the fact table is
    not involved), then the fact joins that enriched-orders table with its
    single orderkey shuffle; supplier nationkey is a broadcast dim.  The
    two-nation filter drops rows batch-locally BEFORE the year split, so
    the final groupby sees (2 x |years|) partial keys.  Names come from
    the 25-row nation map on the driver.  -> (supp_nation, cust_nation,
    l_year, revenue_cents)."""
    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join, read_table, shuffle_join

    n1, n2 = nations
    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_enr = shuffle_join(orders, cust, on="o_custkey",
                              right_on="c_custkey", num_partitions=None)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= start_ns)
        & (pads.field("l_shipdate") < end_ns),
    )
    li = broadcast_hash_join(li, sf_dir, "supplier", left_key="l_suppkey",
                             right_key="s_suppkey", take_cols=["s_nationkey"])
    j = shuffle_join(li, orders_enr, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        sn = batch.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((sn == n1) & (cn == n2)) | ((sn == n2) & (cn == n1))
        t = batch.filter(pa.array(keep))
        sn, cn = sn[keep], cn[keep]
        year = t.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        key = sn * 10000 + year  # (supp_nation, year) packed; cust follows
        uniq, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({"key": pa.array(uniq), "revenue_cents": pa.array(acc)})

    red = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()  # 2 nations x |years| rows
    )
    if red.empty:  # no qualifying pair-nation lines: typed empty
        return rd.from_arrow(pa.table({
            "supp_nation": pa.array([], pa.string()),
            "cust_nation": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }))
    names = pq.read_table(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    nmap = dict(zip(names.column("n_nationkey").to_numpy(zero_copy_only=False),
                    names.column("n_name").to_pylist()))
    key = red["key"].to_numpy().astype(np.int64)
    sn = key // 10000
    year = key % 10000
    cn = np.where(sn == n1, n2, n1)
    out = pa.table({
        "supp_nation": pa.array([nmap[int(v)] for v in sn], pa.string()),
        "cust_nation": pa.array([nmap[int(v)] for v in cn], pa.string()),
        "l_year": pa.array(year),
        "revenue_cents": pa.array(
            red["revenue_cents"].to_numpy().astype(np.int64)),
    })
    return rd.from_arrow(out).sort(["supp_nation", "cust_nation", "l_year"])


Q8_TYPE = "PROMO"
Q8_REGION = "ASIA"
Q8_NATION = 7
Q8_START, Q8_END = "1996-01-01", "1998-01-01"


def tpch_q8(sf_dir: str, p_type: str = Q8_TYPE, region: str = Q8_REGION,
            nation: int = Q8_NATION, start: str = Q8_START,
            end: str = Q8_END):
    """TPC-H Q8 analog — national market share: for orders placed by
    customers in one REGION on parts of one TYPE, the share of revenue
    supplied by one NATION, per order year.

    Scale plan: part and supplier are broadcast dims (p_type string and
    s_nationkey ride the fact batches; the type filter drops rows
    batch-locally right after the part lookup so the orderkey shuffle only
    moves qualifying lines).  The region predicate collapses driver-side
    to a nationkey set via the 25/5-row nation+region tables (Q5 pattern);
    customer pre-filters to it BEFORE its custkey shuffle with the
    date-filtered orders.  The numerator/denominator split is a CASE
    inside the batch-local partial, so the final groupby sees |years|
    keys.  Exact int64 cents; the share itself is emitted as the one
    derived double, rounded to 1e-6 with the oracle's own expression.
    -> (o_year, nation_cents, total_cents, mkt_share)."""
    import numpy as np
    import pyarrow.parquet as pq_
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join, read_table, shuffle_join

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    rname = dict(zip(reg.column("r_regionkey").to_pylist(),
                     reg.column("r_name").to_pylist()))
    nation_keys = np.array(sorted(
        int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_regionkey").to_pylist())
        if rname[int(r)] == region), dtype=np.int64)

    start_ns = np.datetime64(start, "ns")
    end_ns = np.datetime64(end, "ns")

    def order_filter(batch: pa.Table) -> pa.Table:
        v = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]")
        return batch.filter(pa.array((v >= start_ns) & (v < end_ns)))

    def cust_filter(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(nation_keys, ck)
        ok = pos < len(nation_keys)
        ok &= np.where(
            ok, nation_keys[np.minimum(pos, len(nation_keys) - 1)] == ck,
            False)
        return batch.filter(pa.array(ok)).select(["c_custkey"])

    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_filter, batch_format="pyarrow", batch_size=None)
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow", batch_size=None)
    oc = shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey",
                      num_partitions=None)

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"])
    li = broadcast_hash_join(li, sf_dir, "part", left_key="l_partkey",
                             right_key="p_partkey", take_cols=["p_type"])

    def type_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return batch.filter(pc_.equal(batch.column("p_type"), p_type)) \
            .select(["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])

    li = li.map_batches(type_filter, batch_format="pyarrow", batch_size=None)
    li = broadcast_hash_join(li, sf_dir, "supplier", left_key="l_suppkey",
                             right_key="s_suppkey", take_cols=["s_nationkey"])
    j = shuffle_join(li, oc, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        year = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        is_n = (batch.column("s_nationkey").to_numpy(zero_copy_only=False)
                .astype(np.int64) == nation)
        uniq, inv = np.unique(year, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        nc = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cents)
        np.add.at(nc, inv, np.where(is_n, cents, 0))
        return pa.table({"o_year": pa.array(uniq),
                         "nation_cents": pa.array(nc),
                         "total_cents": pa.array(tot)})

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch.column("nation_cents").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tot = batch.column("total_cents").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        share = np.floor(nc / tot * 1e6 + 0.5) / 1e6
        return batch.append_column("mkt_share", pa.array(share))

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nation_cents", alias_name="nation_cents"),
                   Sum("total_cents", alias_name="total_cents"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("o_year")
    )


Q21_LATE_DAYS = 90
Q21_NATION = 3


def tpch_q21(sf_dir: str, late_days: int = Q21_LATE_DAYS,
             nation: int = Q21_NATION, n_parts: int | None = None):
    """TPC-H Q21 analog — suppliers who kept orders waiting: for finished
    ('F') multi-supplier orders where EXACTLY ONE supplier shipped late,
    count per supplier (in one nation) how many orders it alone held up.

    ADAPTATION (declared): the testdata lineitem has no
    l_commitdate/l_receiptdate, so "late" is ``l_shipdate > o_orderdate +
    late_days`` — the exists/not-exists self-join STRUCTURE of Q21 is
    preserved exactly (>=2 distinct suppliers on the order; exactly 1
    distinct late supplier).

    Scale plan: one orderkey shuffle joins the fact to status-filtered
    orders; the per-order exists/anti-exists logic then runs on COARSE
    hash partitions of orderkey (never per distinct order — the
    events-family segmented-solve discipline): each partition sorts by
    (orderkey, suppkey) once and resolves every order's distinct-supplier
    and distinct-late-supplier counts with np.diff segment math.  Only
    (suppkey, 1) survivors leave the partition; supplier name + nation are
    a broadcast dim on that tiny stream.  -> (s_name, numwait) ordered by
    (numwait desc, s_name)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import numpy as np
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions import hashing
    from .join import broadcast_hash_join, read_table, shuffle_join

    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderstatus", "o_orderdate"])

    def status_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc_.equal(batch.column("o_orderstatus"), "F")
        ).select(["o_orderkey", "o_orderdate"])

    orders = orders.map_batches(status_filter, batch_format="pyarrow",
                                batch_size=None)
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    late_ns = np.timedelta64(late_days, "D").astype("timedelta64[ns]")

    def add_part(batch: pa.Table) -> pa.Table:
        ok_ = batch.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]")
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]")
        return pa.table({
            "l_orderkey": pa.array(ok_),
            "l_suppkey": batch.column("l_suppkey"),
            "late": pa.array(ship > od + late_ns),
            "__part": pa.array(hashing.coarse_partition(ok_, n_parts)),
        })

    def solve(df: "pd.DataFrame") -> "pd.DataFrame":
        ok_ = df["l_orderkey"].to_numpy().astype(np.int64)
        sk = df["l_suppkey"].to_numpy().astype(np.int64)
        late = df["late"].to_numpy().astype(bool)
        order = np.lexsort((sk, ok_))
        ok_, sk, late = ok_[order], sk[order], late[order]
        n = len(ok_)
        if n == 0:
            return pd.DataFrame({"l_suppkey": np.array([], np.int64),
                                 "numwait": np.array([], np.int64)})
        new_o = np.ones(n, dtype=bool)
        new_o[1:] = ok_[1:] != ok_[:-1]
        new_s = new_o.copy()
        new_s[1:] |= sk[1:] != sk[:-1]
        seg = np.cumsum(new_o) - 1  # order segment id per row
        nseg = seg[-1] + 1
        nsupp = np.bincount(seg, weights=new_s.astype(np.int64),
                            minlength=nseg).astype(np.int64)
        # distinct LATE suppliers per order: a (order, supp) run counts
        # once if ANY of its rows is late
        run = np.cumsum(new_s) - 1
        run_late = np.bincount(run[late], minlength=run[-1] + 1) > 0
        run_seg = seg[new_s]
        run_sk = sk[new_s]
        nlate = np.bincount(run_seg, weights=run_late.astype(np.int64),
                            minlength=nseg).astype(np.int64)
        # the sole late supplier of each qualifying order: min late suppkey
        # (unique when nlate == 1, so min is exact)
        big = np.int64(2**62)
        late_sk = np.where(run_late, run_sk, big)
        sole = np.full(nseg, big, np.int64)
        np.minimum.at(sole, run_seg, late_sk)
        keep = (nsupp >= 2) & (nlate == 1)
        winners = sole[keep]
        u, c = np.unique(winners, return_counts=True)
        return pd.DataFrame({"l_suppkey": u, "numwait": c.astype(np.int64)})

    from ..functions.reduce import hash_groupby

    waits = hash_groupby(
        j.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(solve, batch_format="pandas"),
        "l_suppkey", ["numwait"], how="isum",
    )
    waits = broadcast_hash_join(waits, sf_dir, "supplier",
                                left_key="l_suppkey", right_key="s_suppkey",
                                take_cols=["s_name", "s_nationkey"])

    def nation_filter(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.filter(pa.array(nk == nation)) \
            .select(["s_name", "numwait"])

    return (
        waits.map_batches(nation_filter, batch_format="pyarrow",
                          batch_size=None)
        .sort(["numwait", "s_name"], descending=[True, False])
    )


def unpivot(ds, id_col: str, value_cols: list[str]):
    """Wide -> long (UNPIVOT / melt): (id_col, metric, value) with one row
    per (row, metric).  Pure streaming map — each batch emits its own
    melted rows, no shuffle; value columns cast to float64 (the common
    supertype of the cell-metrics family)."""
    import numpy as np
    import pyarrow as pa_

    def melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_id = np.tile(ids, len(value_cols))
        metric = np.repeat(np.array(value_cols, dtype=object), n)
        vals = np.concatenate([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in value_cols
        ])
        return pa_.table({
            id_col: pa_.array(out_id),
            "metric": pa_.array(metric.astype(str), pa.string()),
            "value": pa_.array(vals),
        })

    return ds.map_batches(melt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 / Q11 / Q16 / Q20 analogs (the remaining report queries).
# The testdata schema has no partsupp table, so the four queries that price
# against ps_supplycost/ps_availqty are ADAPTED (declared per query) to the
# lineitem evidence of the same join/filter/report STRUCTURE — exactly how
# tpch_q21 re-derived "late" without l_receiptdate.
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"


def tpch_q2(sf_dir: str, region: str = Q2_REGION, p_type: str = Q2_TYPE):
    """TPC-H Q2 analog — minimum-cost supplier per part: for every part of
    one TYPE, the region-resident supplier that sold it at the lowest unit
    price, with the supplier's nation attached.

    ADAPTATION (declared): no partsupp/ps_supplycost exists, so "cost" is
    the minimum observed unit price on lineitem — ``unit_micro =
    floor(cents * 10^6 / qty_centi)`` (both x100 fixed point), an exact
    integer both engines compute identically.  The correlated MIN subquery
    + region filter + dimension report of Q2 are preserved.

    Scale plan: the region's supplier keys and the type's part keys are
    broadcast membership arrays (dim-sized); lineitem is scanned ONCE with
    both filters applied batch-locally, then two bounded part-keyed
    reduces (min unit price, then min suppkey among lines achieving it —
    the q17 two-pass shape).  Dimension names attach driver-side to the
    part-sized result.  -> (p_partkey, p_type, min_unit_micro, s_suppkey,
    s_name, n_name, s_acctbal) sorted by p_partkey."""
    import numpy as np
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    from ..functions.reduce import hash_groupby
    from .join import read_table

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    rname = dict(zip(reg.column("r_regionkey").to_pylist(),
                     reg.column("r_name").to_pylist()))
    region_nations = {
        int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_regionkey").to_pylist())
        if rname[int(r)] == region
    }
    nat_name = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))
    sup = pq_.read_table(f"{sf_dir}/supplier.parquet").combine_chunks()
    s_key = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    s_nat = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    in_region = np.array([int(n) in region_nations for n in s_nat], dtype=bool)
    region_supp = np.sort(s_key[in_region])
    s_name = dict(zip(s_key.tolist(), sup.column("s_name").to_pylist()))
    s_bal = dict(zip(s_key.tolist(),
                     sup.column("s_acctbal").to_numpy(zero_copy_only=False).tolist()))
    s_natkey = dict(zip(s_key.tolist(), s_nat.tolist()))

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_type"]).combine_chunks()
    pmask = pc_.equal(part.column("p_type"), p_type)
    type_parts = np.sort(
        part.filter(pmask).column("p_partkey")
        .to_numpy(zero_copy_only=False).astype(np.int64))
    supp_ref = ray.put(region_supp)
    part_ref = ray.put(type_parts)

    def qualify(batch: pa.Table) -> pa.Table:
        rs = ray.get(supp_ref)
        tp = ray.get(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(pk), dtype=bool)
        if len(rs) and len(tp):
            pos_p = np.minimum(np.searchsorted(tp, pk), len(tp) - 1)
            pos_s = np.minimum(np.searchsorted(rs, sk), len(rs) - 1)
            keep = (tp[pos_p] == pk) & (rs[pos_s] == sk)
        qc = np.floor(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        cents = np.floor(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        keep &= qc > 0
        micro = np.zeros(len(pk), np.int64)
        np.floor_divide(cents * 1_000_000, np.where(qc > 0, qc, 1),
                        out=micro, where=qc > 0)
        return pa.table({
            "p_partkey": pa.array(pk[keep]),
            "s_suppkey": pa.array(sk[keep]),
            "unit_micro": pa.array(micro[keep]),
        })

    def scan():
        return read_table(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_quantity",
                           "l_extendedprice"]) \
            .map_batches(qualify, batch_format="pyarrow", batch_size=None)

    # pass 1: min unit price per part (part-dim bounded)
    mins = hash_groupby(scan(), "p_partkey", ["unit_micro"], how="min") \
        .to_pandas()
    mp = mins["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(mp, kind="stable")
    min_ref = ray.put((mp[order],
                       mins["unit_micro"].to_numpy().astype(np.int64)[order]))

    def at_min(batch: pa.Table) -> pa.Table:
        pks, micros = ray.get(min_ref)
        if len(pks) == 0:
            return batch.slice(0, 0)
        pk = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        um = batch.column("unit_micro").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pks, pk), len(pks) - 1)
        return batch.filter(pa.array((pks[pos] == pk) & (micros[pos] == um)))

    # pass 2: min suppkey among achieving lines (deterministic tie-break)
    best = hash_groupby(scan().map_batches(at_min, batch_format="pyarrow",
                                           batch_size=None),
                        "p_partkey", ["s_suppkey", "unit_micro"],
                        how={"s_suppkey": "min", "unit_micro": "min"}) \
        .to_pandas()
    best = best.sort_values("p_partkey").reset_index(drop=True)
    sk = best["s_suppkey"].to_numpy().astype(np.int64)
    return rd.from_arrow(pa.table({
        "p_partkey": pa.array(best["p_partkey"].to_numpy().astype(np.int64)),
        "p_type": pa.array([p_type] * len(best), pa.string()),
        "min_unit_micro": pa.array(best["unit_micro"].to_numpy().astype(np.int64)),
        "s_suppkey": pa.array(sk),
        "s_name": pa.array([s_name[int(k)] for k in sk], pa.string()),
        "n_name": pa.array([nat_name[int(s_natkey[int(k)])] for k in sk],
                           pa.string()),
        "s_acctbal": pa.array([float(s_bal[int(k)]) for k in sk], pa.float64()),
    }))


Q9_NAME_SUB = "widget"


def tpch_q9(sf_dir: str, name_sub: str = Q9_NAME_SUB):
    """TPC-H Q9 analog — product-type profit per (nation, year): revenue
    of lineitems whose part NAME contains ``name_sub``, grouped by the
    supplier's nation and the order year.

    ADAPTATION (declared): profit is revenue-only (exact cents of
    ``extendedprice * (1 - discount)``) — ps_supplycost does not exist in
    the testdata schema; the 6-table join STRUCTURE (lineitem x part-name
    filter x supplier->nation x orders->year) is Q9's.

    Scale plan: matching partkeys broadcast (dim-sized membership array,
    dropping non-matching lines BEFORE anything wide); supplier->nation is
    a broadcast dim; the only all-to-all is the orderkey shuffle against
    a (o_orderkey, o_year) projection of orders (q8 pattern).  Partials
    reduce batch-locally to (nationkey, year) rows so the final groupby
    sees |nations| x |years| keys.  -> (n_name, o_year, profit_cents)
    sorted by (n_name, o_year desc)."""
    import numpy as np
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import broadcast_hash_join, read_table, shuffle_join

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"]).combine_chunks()
    pmask = pc_.match_substring(part.column("p_name"), name_sub)
    keys = np.sort(part.filter(pmask).column("p_partkey")
                   .to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(keys)

    def part_filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(ks, pk), len(ks) - 1)
        return batch.filter(pa.array(ks[pos] == pk)) \
            .select(["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"]) \
        .map_batches(part_filter, batch_format="pyarrow", batch_size=None)
    li = broadcast_hash_join(li, sf_dir, "supplier", left_key="l_suppkey",
                             right_key="s_suppkey", take_cols=["s_nationkey"])

    def project_orders(batch: pa.Table) -> pa.Table:
        yr = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "o_year": pa.array(yr)})

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(project_orders, batch_format="pyarrow", batch_size=None)
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        yr = batch.column("o_year").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0 + 0.5
        ).astype(np.int64)
        pair = nk * 10_000 + yr  # |nations| x |years| — bounded key space
        uniq, inv = np.unique(pair, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({"nk": pa.array(uniq // 10_000),
                         "o_year": pa.array(uniq % 10_000),
                         "profit_cents": pa.array(acc)})

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    nat_name = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))

    def finish(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nat_name[int(k)] for k in nk], pa.string()),
            "o_year": batch.column("o_year"),
            "profit_cents": batch.column("profit_cents"),
        })

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "o_year"])
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["n_name", "o_year"], descending=[False, True])
    )


Q11_REGION = "EUROPE"
#: report parts whose value exceeds (Q11_MULT_NUM / Q11_MULT_DEN) x the
#: MEAN per-part value — scale-free (a fixed share-of-total threshold
#: empties out as the part table grows with sf; a mean-relative one
#: selects a stable tail at every scale), compared exactly as
#: value * n_parts * DEN > total * NUM
Q11_MULT_NUM = 3
Q11_MULT_DEN = 2


def tpch_q11(sf_dir: str, region: str = Q11_REGION,
             mult_num: int = Q11_MULT_NUM, mult_den: int = Q11_MULT_DEN):
    """TPC-H Q11 analog — important stock identification: parts whose
    traded value through one REGION's suppliers exceeds a fixed fraction
    of the total, with the per-part value reported.

    ADAPTATION (declared): value is lineitem revenue (exact cents of
    extendedprice x (1-discount)) restricted to the region's suppliers —
    partsupp/ps_availqty does not exist; Q11's grouped-value +
    global-threshold HAVING structure is preserved, and the threshold
    compare is the exact integer cross-multiplication
    ``value * n_parts * mult_den > total * mult_num`` (no float division
    on either side; mean-relative so the report is non-degenerate at
    every sf).

    Scale plan: region suppliers broadcast as a membership array; ONE
    fact scan reduces batch-locally per partkey, one part-keyed bounded
    shuffle completes the sums; the total is the scalar sum of that
    part-dim-sized table, computed driver-side where the HAVING filter
    also runs.  -> (l_partkey, value_cents) sorted by value desc, partkey."""
    import numpy as np
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    from ..functions.reduce import hash_groupby
    from .join import read_table

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    rname = dict(zip(reg.column("r_regionkey").to_pylist(),
                     reg.column("r_name").to_pylist()))
    region_nations = {
        int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_regionkey").to_pylist())
        if rname[int(r)] == region
    }
    sup = pq_.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).combine_chunks()
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    region_supp = np.sort(sk[np.array([int(n) in region_nations for n in sn])])
    supp_ref = ray.put(region_supp)

    def partial(batch: pa.Table) -> pa.Table:
        rs = ray.get(supp_ref)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(rs) == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "value_cents": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(rs, s), len(rs) - 1)
        keep = rs[pos] == s
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * (1.0 - batch.column("l_discount")
               .to_numpy(zero_copy_only=False)[keep])
            * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({"l_partkey": pa.array(uniq),
                         "value_cents": pa.array(acc)})

    per_part = hash_groupby(
        read_table(sf_dir, "lineitem",
                   ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        "l_partkey", ["value_cents"], how="isum",
    ).to_pandas()  # part-dim bounded
    total = int(per_part["value_cents"].sum())
    v = per_part["value_cents"].to_numpy().astype(np.int64)
    n_parts = len(per_part)
    # object dtype: arbitrary-precision compare, no int64 overflow
    keep = v.astype(object) * n_parts * mult_den > total * mult_num
    out = per_part[keep].sort_values(
        ["value_cents", "l_partkey"], ascending=[False, True],
        kind="mergesort").reset_index(drop=True)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "l_partkey": pa.array(out["l_partkey"].to_numpy().astype(np.int64)),
        "value_cents": pa.array(out["value_cents"].to_numpy().astype(np.int64)),
    }))


Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)
#: "customer complaints" analog — the testdata supplier table has no
#: comment column, so the exclusion predicate is a deterministic attribute
#: filter of the same shape (suppliers below an account-balance floor)
Q16_MIN_BAL = 1_000.0


def tpch_q16(sf_dir: str, excl_brand: str = Q16_EXCL_BRAND,
             excl_type: str = Q16_EXCL_TYPE, sizes: tuple = Q16_SIZES,
             min_bal: float = Q16_MIN_BAL):
    """TPC-H Q16 analog — parts/supplier relationship: how many distinct
    qualifying suppliers have SOLD each (brand, type, size) combination,
    excluding one brand, one type, sizes outside a fixed set, and
    "complained-about" suppliers.

    ADAPTATION (declared): supplier-offers-part evidence comes from
    lineitem (partsupp does not exist), and the complaints LIKE predicate
    becomes the deterministic ``s_acctbal >= min_bal`` filter (same
    anti-join shape).

    Scale plan: part attributes and the excluded-supplier set broadcast
    (dim-sized); each fact batch maps l_partkey -> a dense combo id
    (|brands| x |types| x |sizes| — bounded), batch-locally dedupes
    (combo, suppkey) pairs, and ONE pair-keyed bounded shuffle finishes
    the distinct; a second combo-keyed reduce counts suppliers per combo.
    The pair pack is ``suppkey * 8192 + combo`` — documented shard-local
    suppkey < 2^50 assumption, same class as the engine's other packed
    pairs.  -> (p_brand, p_type, p_size, supplier_cnt) sorted by
    (cnt desc, brand, type, size)."""
    import numpy as np
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    from ..functions.reduce import hash_groupby
    from .join import read_table

    part = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"]).combine_chunks()
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    ptype = np.asarray(part.column("p_type").to_pylist(), dtype=object)
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    size_set = set(int(s) for s in sizes)
    ok = np.array([
        b != excl_brand and t != excl_type and int(s) in size_set
        for b, t, s in zip(brand, ptype, size)
    ], dtype=bool)
    # dense combo ids over the qualifying parts only
    combos = sorted({(b, t, int(s))
                     for b, t, s in zip(brand[ok], ptype[ok], size[ok])})
    combo_id = {c: i for i, c in enumerate(combos)}
    pk_ok = pk[ok]
    cid = np.array([combo_id[(b, t, int(s))]
                    for b, t, s in zip(brand[ok], ptype[ok], size[ok])],
                   dtype=np.int64)
    order = np.argsort(pk_ok, kind="stable")
    part_ref = ray.put((pk_ok[order], cid[order]))

    sup = pq_.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"]).combine_chunks()
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sb = sup.column("s_acctbal").to_numpy(zero_copy_only=False)
    good_supp = np.sort(sk[sb >= min_bal])
    supp_ref = ray.put(good_supp)

    def pairs(batch: pa.Table) -> pa.Table:
        pks, cids = ray.get(part_ref)
        gs = ray.get(supp_ref)
        lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ls = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pks) == 0 or len(gs) == 0:
            return pa.table({"pair": pa.array([], pa.int64())})
        pos_p = np.minimum(np.searchsorted(pks, lp), len(pks) - 1)
        pos_s = np.minimum(np.searchsorted(gs, ls), len(gs) - 1)
        keep = (pks[pos_p] == lp) & (gs[pos_s] == ls)
        if ls[keep].size and int(ls[keep].max()) >= (1 << 50):
            raise ValueError(
                "tpch_q16 pair pack assumes suppkey < 2^50; re-shard "
                "supplier ids (documented pack-width limit)")
        pair = ls[keep] * 8192 + cids[pos_p[keep]]
        return pa.table({"pair": pa.array(np.unique(pair))})

    distinct = hash_groupby(
        read_table(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=None),
        "pair", ["pair"], how="min",
    )

    def to_combo(batch: pa.Table) -> pa.Table:
        p = batch.column("pair").to_numpy(zero_copy_only=False)
        return pa.table({"combo": pa.array(p % 8192),
                         "one": pa.array(np.ones(len(p), np.int64))})

    counts = hash_groupby(
        distinct.map_batches(to_combo, batch_format="pyarrow",
                             batch_size=None),
        "combo", ["one"], how="isum",
    ).to_pandas()  # bounded by |brands| x |types| x |sizes|
    cc = counts["combo"].to_numpy().astype(np.int64)
    n = counts["one"].to_numpy().astype(np.int64)
    rows = sorted(
        ((int(nn), combos[int(c)][0], combos[int(c)][1], combos[int(c)][2])
         for c, nn in zip(cc, n)),
        key=lambda r: (-r[0], r[1], r[2], r[3]))
    return rd.from_arrow(pa.table({
        "p_brand": pa.array([r[1] for r in rows], pa.string()),
        "p_type": pa.array([r[2] for r in rows], pa.string()),
        "p_size": pa.array([r[3] for r in rows], pa.int64()),
        "supplier_cnt": pa.array([r[0] for r in rows], pa.int64()),
    }))


Q20_NAME_PREFIX = "small"
Q20_NATION_NAME = "NATION_3"
Q20_YEAR = 1996
#: share threshold: supplier's shipped qty of a part > total/Q20_SHARE_DEN
Q20_SHARE_DEN = 5


def tpch_q20(sf_dir: str, name_prefix: str = Q20_NAME_PREFIX,
             nation_name: str = Q20_NATION_NAME, year: int = Q20_YEAR,
             share_den: int = Q20_SHARE_DEN):
    """TPC-H Q20 analog — potential part promotion: suppliers in one
    NATION who in one YEAR shipped more than 1/``share_den`` of the total
    shipped quantity of some part whose name starts with ``name_prefix``.

    ADAPTATION (declared): ps_availqty does not exist, so "holds excess
    stock" becomes "carried an outsized share of the year's movement" —
    the exact integer compare ``qty_pair * share_den > qty_total`` (x100
    fixed-point sums on both sides; no division).  Q20's
    nested-exists structure (supplier qualified through a part-scoped
    quantity subquery) is preserved.

    Scale plan: prefix partkeys broadcast; the year+part-filtered scan
    reduces batch-locally per (partkey, suppkey) pair — packed
    ``partkey * 2^24 + suppkey`` is NOT safe generically, so the pair uses
    the engine's generic string pair-hash partition ONLY for routing while
    the true keys ride alongside (grouped_topk discipline).  Per-part
    totals are a second bounded reduce of the pair table, broadcast back
    for the share compare.  -> (s_suppkey, s_name) sorted."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    from ..functions import hashing
    from ..functions.reduce import hash_groupby
    from .join import read_table

    part = pq_.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"]).combine_chunks()
    pmask = pc_.starts_with(part.column("p_name"), name_prefix)
    keys = np.sort(part.filter(pmask).column("p_partkey")
                   .to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(keys)
    y0 = np.datetime64(f"{year}-01-01", "ns")
    y1 = np.datetime64(f"{year + 1}-01-01", "ns")

    def pair_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]")
        keep = (ship >= y0) & (ship < y1)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, pk), len(ks) - 1)
            keep &= ks[pos] == pk
        else:
            keep[:] = False
        pk = pk[keep]
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        qc = np.floor(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)[keep] * 100.0 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({"p": pk, "s": sk, "q": qc})
        g = df.groupby(["p", "s"], sort=False)["q"].sum().reset_index()
        pair = pa.array(np.char.add(np.char.add(
            g["p"].to_numpy().astype(str), "\x1f"),
            g["s"].to_numpy().astype(str)))
        h = hashing.poly_hash64(pair).view(np.int64)
        return pa.table({
            "p": pa.array(g["p"].to_numpy(np.int64)),
            "s": pa.array(g["s"].to_numpy(np.int64)),
            "q": pa.array(g["q"].to_numpy(np.int64)),
            "__part": pa.array(hashing.coarse_partition(h, 64)),
        })

    def finish_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["p", "s"], sort=False)["q"].sum().reset_index()

    pair_q = (
        read_table(sf_dir, "lineitem",
                   ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(finish_pairs, batch_format="pandas")
        .materialize()
    )
    totals = hash_groupby(pair_q, "p", ["q"], how="isum").to_pandas()
    tp = totals["p"].to_numpy().astype(np.int64)
    order = np.argsort(tp, kind="stable")
    tot_ref = ray.put((tp[order],
                       totals["q"].to_numpy().astype(np.int64)[order]))

    def qualify(batch: pa.Table) -> pa.Table:
        tps, tqs = ray.get(tot_ref)
        if len(tps) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        p = batch.column("p").to_numpy(zero_copy_only=False)
        q = batch.column("q").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(tps, p), len(tps) - 1)
        keep = (tps[pos] == p) & (q.astype(object) * share_den
                                  > tqs[pos].astype(object))
        s = batch.column("s").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"s_suppkey": pa.array(np.unique(s))})

    winners = hash_groupby(
        pair_q.map_batches(qualify, batch_format="pyarrow", batch_size=None),
        "s_suppkey", ["s_suppkey"], how="min",
    ).to_pandas()  # supplier-dim bounded

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    nk = {int(k): n for k, n in zip(nat.column("n_nationkey").to_pylist(),
                                    nat.column("n_name").to_pylist())}
    sup = pq_.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name", "s_nationkey"]) \
        .combine_chunks()
    s_name = dict(zip(sup.column("s_suppkey").to_pylist(),
                      sup.column("s_name").to_pylist()))
    s_nat = dict(zip(sup.column("s_suppkey").to_pylist(),
                     sup.column("s_nationkey").to_pylist()))
    out = sorted(int(s) for s in winners["s_suppkey"].tolist()
                 if nk[int(s_nat[int(s)])] == nation_name)
    return rd.from_arrow(pa.table({
        "s_suppkey": pa.array(out, pa.int64()),
        "s_name": pa.array([s_name[s] for s in out], pa.string()),
    }))
