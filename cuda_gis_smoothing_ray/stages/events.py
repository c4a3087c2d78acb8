"""Windowed / sessionized operators over the ``events`` stream table —
the engine's streaming-shaped additions (the reference has none,
SURVEY §2.9; semantics follow the standard tumbling-window / gap-session
definitions).

Scale shape: tumbling windows pre-aggregate INSIDE map_batches (partials
keyed by (window, event_type) — bounded cardinality), so the shuffle moves
partial rows, not events.  Sessionization shuffles by ``user_id`` once and
solves each user locally in ``map_groups`` — the partitioning assumption is
"one user's events fit one group", the same assumption any engine makes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_US = 3_600_000_000  # 1h tumbling
SESSION_GAP_US = 1_800_000_000  # 30min inactivity gap
#: user_activity_full HAVING thresholds — chosen so left-only, right-only
#: and matched regions are ALL non-empty at sf0.001/0.01/0.1 (verified),
#: i.e. the full-outer null paths are exercised, not vacuous.
PURCHASE_CENTS_MIN = 100_000
VIEWS_MIN = 12


def read_events(sf_dir: str, columns=("event_id", "ts", "user_id", "event_type", "value")):
    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(columns))


def window_aggregate(ds, window_us: int = WINDOW_US):
    """events -> (window_start, event_type, n_events, sum_value, n_users??)
    tumbling-window counts/sums.  Two-phase: batch-local partials, then a
    small groupby over (window_start, event_type)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        epoch = ts.astype(np.int64)
        win = (epoch // window_us) * window_us
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"w": win, "t": et, "v": val})
        g = df.groupby(["w", "t"], sort=True)["v"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                "window_start": pa.array(g["w"].to_numpy().astype("datetime64[us]")),
                "event_type": pa.array(g["t"], pa.string()),
                "n_events": pa.array(g["count"].to_numpy().astype(np.int64)),
                "sum_value": pa.array(g["sum"].to_numpy()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """events -> (event_id, user_id, session_idx, session_start): gap-based
    sessions per user; session_idx is 0-based in ts order (ties: event_id)."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_sess = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sidx = np.cumsum(new_sess) - 1
        start = ts[np.flatnonzero(new_sess)][sidx]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "session_idx": sidx.astype(np.int64),
                "session_start": start.astype("datetime64[us]"),
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def asof_join(ds, left_type: str = "purchase", right_type: str = "view"):
    """Per-user as-of join: for each ``left_type`` event, the most recent
    ``right_type`` event by the same user with ``ts <= left.ts`` (ties at
    equal ts: the LATEST — highest event_id — right event wins, matching
    the SQL oracle's max-over-ties).  Inner semantics:
    left events with no prior right event are dropped.  Emits
    (event_id, user_id, matched_event_id, lag_us).

    The reference has no joins at all (SURVEY §2.4); this is the
    training-pipeline as-of operator from the task brief, built as the same
    shuffle-by-user + local solve as :func:`sessionize` — one partitioning
    key (user_id) shared across every events operator, so at 100 TB these
    stages chain without re-shuffling.  The local solve is a vectorized
    merge: sort, forward-fill the last right-event index via
    ``np.maximum.accumulate``, no Python per-row work.
    """

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        is_r = (g["event_type"] == right_type).to_numpy()
        is_l = (g["event_type"] == left_type).to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        # order rows so that at equal ts the right side precedes the left
        order = np.lexsort((eid, ~is_r, ts))
        is_r, is_l, ts, eid = is_r[order], is_l[order], ts[order], eid[order]
        idx = np.arange(len(g))
        last_r = np.maximum.accumulate(np.where(is_r, idx, -1))
        li = np.flatnonzero(is_l)
        m = last_r[li]
        li, m = li[m >= 0], m[m >= 0]
        return pd.DataFrame(
            {
                "event_id": eid[li],
                "user_id": g["user_id"].to_numpy()[order][li],
                "matched_event_id": eid[m].astype(np.int64),
                "lag_us": (ts[li] - ts[m]).astype(np.int64),
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def sliding_window_aggregate(ds, width_us: int = WINDOW_US, hop_us: int = WINDOW_US // 2):
    """Hopping/sliding windows: width ``width_us``, advancing by ``hop_us``
    (width must be a multiple of hop).  Each event lands in
    ``width/hop`` windows; expansion happens batch-locally and partials
    pre-aggregate before the (window_start, event_type)-keyed shuffle, so
    shuffle volume stays bounded by window-cardinality x fan-out, not rows.
    """
    from ray.data.aggregate import Sum

    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    fan = width_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        epoch = ts.astype(np.int64)
        base = (epoch // hop_us) * hop_us  # last hop boundary <= ts
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        wins, types, vals = [], [], []
        for k in range(fan):
            w = base - k * hop_us  # event in window [w, w + width)
            wins.append(w)
            types.append(et)
            vals.append(val)
        df = pd.DataFrame(
            {"w": np.concatenate(wins), "t": np.concatenate(types), "v": np.concatenate(vals)}
        )
        g = df.groupby(["w", "t"], sort=True)["v"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                "window_start": pa.array(g["w"].to_numpy().astype("datetime64[us]")),
                "event_type": pa.array(g["t"], pa.string()),
                "n_events": pa.array(g["count"].to_numpy().astype(np.int64)),
                "sum_value": pa.array(g["sum"].to_numpy()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )


RANGE_WINDOW_US = WINDOW_US  # 1h lookback for the range join


def range_join(ds, left_type: str = "purchase", right_type: str = "view",
               window_us: int = RANGE_WINDOW_US):
    """Per-user RANGE join (the task brief's interval-join operator): for
    each ``left_type`` event, EVERY ``right_type`` event by the same user
    with ``left.ts - window_us <= right.ts <= left.ts`` — one output row per
    qualifying pair (unlike :func:`asof_join`, which keeps only the latest).
    Emits (event_id, user_id, matched_event_id, lag_us), lag_us >= 0.

    Same shuffle-by-user shape as every events operator (one shared
    partitioning key); the local solve is two vectorized ``searchsorted``
    bounds over the user's time-sorted right events + a repeat/arange pair
    expansion — fan-out is bounded by events-per-user-per-window, no
    Python per row."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype=group["user_id"].dtype),
                "matched_event_id": pd.Series([], dtype="int64"),
                "lag_us": pd.Series([], dtype="int64"),
            }
        )
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy().astype(np.int64)
        et = group["event_type"].to_numpy()
        is_r = et == right_type
        is_l = et == left_type
        if not is_r.any() or not is_l.any():
            return empty
        # right side sorted by (ts, event_id) for deterministic emission order
        r_order = np.lexsort((eid[is_r], ts[is_r]))
        rts, rid = ts[is_r][r_order], eid[is_r][r_order]
        lts, lid = ts[is_l], eid[is_l]
        lo = np.searchsorted(rts, lts - window_us, side="left")
        hi = np.searchsorted(rts, lts, side="right")
        n = hi - lo
        total = int(n.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lid)), n)
        ri = np.repeat(lo, n) + (np.arange(total) - np.repeat(np.cumsum(n) - n, n))
        return pd.DataFrame(
            {
                "event_id": lid[li],
                "user_id": np.repeat(group["user_id"].to_numpy()[is_l], n),
                "matched_event_id": rid[ri],
                "lag_us": lts[li] - rts[ri],
            }
        )

    return ds.groupby("user_id").map_groups(solve)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(ds, types: tuple[str, ...] = EVENT_TYPES):
    """events -> (user_id, n_<type>..., sum_value): pivot event_type into
    count columns per user (conditional-aggregation pivot).  Partials
    pivot batch-locally (one pandas crosstab-style groupby), then a
    user-keyed vectorized sum — shuffle volume is |users| x (|types|+1)
    partial rows per batch, never event rows."""
    from ..functions.reduce import hash_groupby_sum

    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(uid, return_inverse=True)
        out = {"user_id": pa.array(uniq)}
        for t, c in zip(types, cols):
            out[c] = pa.array(np.bincount(inv, weights=(et == t).astype(np.float64),
                                          minlength=len(uniq)))
        out["sum_value"] = pa.array(np.bincount(inv, weights=val, minlength=len(uniq)))
        return pa.table(out)

    reduced = hash_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "user_id", cols + ["sum_value"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        out = {"user_id": batch.column("user_id")}
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            out[c] = pa.array(np.floor(v + 0.5).astype(np.int64))
        sv = batch.column("sum_value").to_numpy(zero_copy_only=False)
        out["sum_value"] = pa.array(np.floor(sv * 1e6 + 0.5) / 1e6)
        return pa.table(out)

    return reduced.map_batches(finalize, batch_format="pyarrow")


def running_totals(ds):
    """events -> (event_id, user_id, seq, cum_cents): per-user running
    totals in (ts, event_id) order — the cumulative window-function family
    (SUM OVER ROWS UNBOUNDED PRECEDING).  Values are accumulated as exact
    integer cents (floor(value*100+0.5)), so the running sum is
    deterministic across engines regardless of float addition order (DuckDB
    evaluates running windows with a segment tree — float order differs).
    Same shuffle-by-user key as every events operator."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype(np.int64),
                "user_id": g["user_id"].to_numpy(),
                "seq": np.arange(1, len(g) + 1, dtype=np.int64),
                "cum_cents": np.cumsum(cents),
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def user_event_paths(ds, max_len: int = 50):
    """events -> (user_id, n_events, path): each user's chronological
    event-type sequence joined with ',' (first ``max_len`` events, (ts,
    event_id) order) plus the total count — collect_list / string_agg, the
    sequence-construction op behavioral models train on.  Cost is one
    string join per USER (not per event); the cap bounds the output row
    width the way any sequence model bounds context."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": np.array([len(g)], np.int64),
                "path": [",".join(g["event_type"].head(max_len))],
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def moving_sum(ds, preceding: int = 3):
    """events -> (event_id, user_id, win_n, win_cents): bounded moving
    window (ROWS ``preceding`` PRECEDING AND CURRENT ROW) over per-user
    (ts, event_id) order — the bounded complement of
    :func:`running_totals`'s unbounded frame.  Sum kept in exact integer
    cents via cumsum difference (O(n) per group, vectorized); the window
    row count is emitted instead of a float mean so every column stays
    exactly comparable."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        cum = np.cumsum(cents)
        n = len(g)
        win_cents = cum.copy()
        if n > preceding + 1:
            win_cents[preceding + 1:] = cum[preceding + 1:] - cum[:-(preceding + 1)]
        win_n = np.minimum(np.arange(n, dtype=np.int64) + 1, preceding + 1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype(np.int64),
                "user_id": g["user_id"].to_numpy(),
                "win_n": win_n,
                "win_cents": win_cents,
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def event_gaps(ds):
    """events -> (event_id, user_id, prev_event_id, gap_us): the LAG window
    function — for each event (after the user's first), the previous event
    in (ts, event_id) order and the elapsed microseconds.  First-per-user
    rows are dropped rather than emitted as NULL so every column stays a
    non-nullable int64 (NULL ints become float64 through pandas and break
    exact comparison).  Same user_id shuffle key as every events operator."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": eid[1:],
                "user_id": g["user_id"].to_numpy()[1:],
                "prev_event_id": eid[:-1],
                "gap_us": ts_us[1:] - ts_us[:-1],
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def user_activity_full(ds, cents_min: int = PURCHASE_CENTS_MIN,
                       views_min: int = VIEWS_MIN):
    """events -> (user_id, purchase_cents, n_views): FULL OUTER join of two
    per-user aggregates — purchase spend (HAVING >= cents_min) and view
    count (HAVING >= views_min) — zero-filled on both sides.

    The join inputs are the AGGREGATES, not raw events: each side
    pre-reduces batch-locally then through one bounded user-keyed shuffle
    (:func:`..functions.reduce.hash_groupby`), so the full-outer exchange
    moves one row per qualifying user, never the event stream."""
    from ..functions.reduce import hash_groupby

    def purchase_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table({"user_id": pa.array(uniq),
                         "purchase_cents": pa.array(tot)})

    def view_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"user_id": pa.array(uniq), "n_views": pa.array(n)})

    buyers = hash_groupby(
        ds.filter(expr="event_type == 'purchase'")
          .map_batches(purchase_partial, batch_format="pyarrow", batch_size=None),
        "user_id", ["purchase_cents"], how="isum",
    ).filter(expr=f"purchase_cents >= {cents_min}")
    viewers = hash_groupby(
        ds.filter(expr="event_type == 'view'")
          .map_batches(view_partial, batch_format="pyarrow", batch_size=None),
        "user_id", ["n_views"], how="isum",
    ).filter(expr=f"n_views >= {views_min}")

    # FULL OUTER of two unique-keyed aggregates == union with the missing
    # metric zero-filled, then one more per-key sum (each user contributes
    # at most one row per side, so the sums ARE the coalesce).  This avoids
    # ``Dataset.join(join_type="full_outer")``, which crashes when a hash
    # partition receives zero blocks from one side (the empty builder emits
    # a zero-COLUMN table and acero can't find the key field — hit here
    # because the HAVING filters leave only ~11 buyers at sf0.01), and it
    # reuses the same bounded user-keyed shuffle instead of a second
    # exchange mechanism.

    def tag_buyers(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_views", pa.array(np.zeros(len(batch), np.int64)))

    def tag_viewers(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "purchase_cents", pa.array(np.zeros(len(batch), np.int64)))
        return t.select(["user_id", "purchase_cents", "n_views"])

    unioned = buyers.map_batches(tag_buyers, batch_format="pyarrow").union(
        viewers.map_batches(tag_viewers, batch_format="pyarrow"))
    return hash_groupby(unioned, "user_id", ["purchase_cents", "n_views"],
                        how="isum")


def event_context(ds):
    """events -> (event_id, user_id, next_event_id, first_event_id,
    last_event_id): the LEAD / FIRST_VALUE / LAST_VALUE window functions in
    ONE per-user pass — each event's successor in (ts, event_id) order plus
    the partition's bookend events.  Last-per-user rows are dropped (their
    LEAD is NULL) so every column stays non-nullable int64, same contract
    as :func:`event_gaps`.  One shuffle on the shared user_id key; the
    per-group solve is pure numpy slicing."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        eid = g["event_id"].to_numpy().astype(np.int64)
        n = len(eid)
        if n < 2:
            return pd.DataFrame({
                "event_id": np.empty(0, np.int64),
                "user_id": np.empty(0, np.int64),
                "next_event_id": np.empty(0, np.int64),
                "first_event_id": np.empty(0, np.int64),
                "last_event_id": np.empty(0, np.int64),
            })
        return pd.DataFrame({
            "event_id": eid[:-1],
            "user_id": g["user_id"].to_numpy()[:-1],
            "next_event_id": eid[1:],
            "first_event_id": np.full(n - 1, eid[0], np.int64),
            "last_event_id": np.full(n - 1, eid[-1], np.int64),
        })

    return ds.groupby("user_id").map_groups(solve)


def event_ranks(ds):
    """events -> (event_id, user_id, cents, rnk, drnk): RANK and DENSE_RANK
    of each event's value (exact integer cents) within its user, highest
    first.  Ties share a rank: rank() leaves gaps, dense_rank() doesn't —
    both computed vectorized from the sorted cents run-lengths (no Python
    per row).  Ties on cents are real (values quantize to cents), so the
    tie semantics are actually exercised."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(group["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.argsort(-cents, kind="stable")
        sorted_cents = cents[order]
        # run starts in the descending-sorted array: rank = position of the
        # run's first element (1-based); dense_rank = run index (1-based)
        new_run = np.empty(len(cents), dtype=bool)
        if len(cents):
            new_run[0] = True
            new_run[1:] = sorted_cents[1:] != sorted_cents[:-1]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run.view(np.int8), dtype=np.int64) - 1
        rnk = (starts + 1)[run_id] if len(cents) else np.empty(0, dtype=np.int64)
        drnk = run_id + 1
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order), dtype=np.int64)
        return pd.DataFrame(
            {
                "event_id": group["event_id"].to_numpy().astype(np.int64),
                "user_id": group["user_id"].to_numpy(),
                "cents": cents,
                "rnk": rnk[inv],
                "drnk": drnk[inv],
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def gap_fill(ds, bucket_us: int = WINDOW_US):
    """Per-user time-series densification (resample): every ``bucket_us``
    bucket from the user's first to last event, with n_events and exact
    integer-cent sums, zero-filled where the user was inactive — the
    temporal gap-filling operator every feature/training pipeline needs
    before windowed models (the SQL ``generate_series + LEFT JOIN`` idiom).

    Emits (user_id, bucket_start, n_events, sum_cents), one row per
    (user, bucket) in the user's active range.

    Same single shuffle key (user_id) as every events operator; the local
    solve is one ``np.bincount`` over bucket offsets — densification cost
    is O(span/bucket) per user, created inside the group (never on the
    driver), and output rows stream straight out of the group task.
    """

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(group["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        bkt = ts // bucket_us
        lo = bkt.min()
        off = bkt - lo
        n = int(off.max()) + 1
        counts = np.bincount(off, minlength=n).astype(np.int64)
        sums = np.zeros(n, np.int64)
        np.add.at(sums, off, cents)  # exact int64 (bincount weights = lossy float)
        buckets = (lo + np.arange(n, dtype=np.int64)) * bucket_us
        return pd.DataFrame(
            {
                "user_id": np.full(n, group["user_id"].iat[0], np.int64),
                "bucket_start": buckets.astype("datetime64[us]"),
                "n_events": counts,
                "sum_cents": sums,
            }
        )

    return ds.groupby("user_id").map_groups(solve)


def event_ntiles(ds, k: int = 4):
    """events -> (event_id, event_type, cents, ntile, pct_rank): NTILE(k)
    buckets and PERCENT_RANK over exact value cents within each event type,
    deterministic ORDER BY (cents, event_id) so both engines agree on tie
    placement.  pct_rank is round6-rounded at the boundary like every
    checked float.

    Same single-shuffle-by-group + vectorized local solve shape as the
    rest of the window family (:func:`event_ranks` etc.), but keyed on a
    64-bit hash of the type string: Ray's sort-based groupby is ~15x
    faster on int64 keys than on strings (measured 6.5 s -> 0.4 s here),
    and the hash is injective for any realistic type vocabulary."""
    from ..functions.hashing import fnv_token_hash64

    def add_key(batch: pa.Table) -> pa.Table:
        h = fnv_token_hash64(batch.column("event_type")).view(np.int64)
        return batch.append_column("__g", pa.array(h))

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(group["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        eid = group["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, cents))
        n = len(cents)
        pos = np.empty(n, np.int64)
        pos[order] = np.arange(n, dtype=np.int64)
        # NTILE: first n % k buckets take ceil(n/k) rows, the rest floor(n/k)
        big, rem = divmod(n, k)
        cut = rem * (big + 1)
        tile = np.where(
            pos < cut,
            pos // max(big + 1, 1),
            rem + (pos - cut) // max(big, 1) if big else rem,
        ).astype(np.int64) + 1
        pct = pos.astype(np.float64) / max(n - 1, 1)
        return pd.DataFrame(
            {
                "event_id": eid,
                "event_type": group["event_type"].to_numpy(),
                "cents": cents,
                "ntile": tile,
                "pct_rank": np.floor(pct * 1e6 + 0.5) / 1e6,
            }
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None)
        .groupby("__g")
        .map_groups(solve)
    )


FUNNEL_WINDOW_US = 86_400_000_000  # 24h per-step conversion window


def funnel(ds, steps: tuple[str, ...] = ("view", "click", "purchase"),
           window_us: int = FUNNEL_WINDOW_US):
    """events -> (user_id, stage, ts_1..ts_k): ordered funnel conversion
    with a per-step window — for each user, the earliest time of step 1,
    then the earliest step-2 event at-or-after it AND within ``window_us``
    of it, and so on (first-touch semantics); ``stage`` counts completed
    steps and missing steps carry the -1 sentinel (int64 epoch micros
    throughout, so the driver compare stays non-nullable).

    Same shuffle-by-user + vectorized local solve as the rest of the
    event family: per step it's one boolean mask + a ``min`` over the
    tail of the user's sorted timestamps — O(k * events-per-user)."""

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = group["event_type"].to_numpy()
        out_ts = np.full(len(steps), np.int64(-1))
        prev = None
        stage = 0
        for i, s in enumerate(steps):
            m = et == s
            if prev is not None:
                m &= (ts >= prev) & (ts <= prev + window_us)
            if not m.any():
                break
            prev = ts[m].min()
            out_ts[i] = prev
            stage += 1
        row = {"user_id": [np.int64(group["user_id"].iat[0])],
               "stage": [np.int64(stage)]}
        for i in range(len(steps)):
            row[f"ts_{i + 1}"] = [out_ts[i]]
        return pd.DataFrame(row)

    return ds.groupby("user_id").map_groups(solve)


DAY_US = 86_400_000_000


def cohort_retention(ds, bucket_us: int = DAY_US):
    """Cohort retention: users bucketed by their FIRST-activity day, counted
    per (cohort_day, day_offset) of later activity -> (cohort_day,
    day_offset, n_users).  All-integer arithmetic (exact across engines).

    One user-keyed hash-partition pass computes per-user cohort + distinct
    activity buckets and reduces to partial (cohort, offset) counts inside
    the partition, so the final shuffle carries only |cohorts x offsets|
    rows — the analytics query every event pipeline ships."""
    from ray.data.aggregate import Sum

    n_parts = 64
    _G = np.uint64(0x9E3779B97F4A7C15)

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[us]").astype(np.int64) // bucket_us
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        part = ((df["user_id"].to_numpy().view(np.uint64) * _G) >> np.uint64(52)) % np.uint64(n_parts)
        return pa.Table.from_pandas(df.assign(__part=part.astype(np.int64)), preserve_index=False)

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        df = group.drop_duplicates(["user_id", "day"]).copy()
        df["cohort_day"] = df.groupby("user_id")["day"].transform("min")
        df["day_offset"] = df["day"] - df["cohort_day"]
        out = (
            df.groupby(["cohort_day", "day_offset"], sort=False)
            .size()
            .reset_index(name="n_part")
        )
        return out

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": batch.column("cohort_day"),
                "day_offset": batch.column("day_offset"),
                "n_users": batch.column("sum(n_part)"),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(solve, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_part"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def cooccurrence(ds, window_us: int = WINDOW_US, max_users_per_window: int | None = None):
    """User co-occurrence graph from the event log: pairs of users active in
    the same time window, weighted by shared-window count ->
    (a, b, n_windows) with a < b.

    The log-to-graph step (session co-visitation, co-editing, co-citation):
    distinct (user, window) pairs shuffle once keyed by window, each window
    group emits its user pairs vectorized (triu indices), and pair counts
    reduce via a packed-int64 hash partition (Python per partition).  A hot
    window is inherently quadratic in its user count — ``max_users_per_window``
    caps it explicitly (truncating deterministically to the lowest ids)
    rather than letting one viral hour produce 10^12 pairs silently."""
    from ..functions.reduce import hash_groupby

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        w = ts.astype("datetime64[us]").astype(np.int64) // window_us
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"w": w, "user_id": uid}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(group["user_id"].to_numpy())
        if max_users_per_window is not None and len(u) > max_users_per_window:
            u = u[:max_users_per_window]
        if len(u) < 2:
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "n_part": pd.Series([], dtype="int64")})
        ai, bi = np.triu_indices(len(u), k=1)
        key = (u[ai] << np.int64(32)) | u[bi]  # user ids < 2^31 by contract
        return pd.DataFrame({"key": key, "n_part": np.ones(len(key), dtype=np.int64)})

    pair_rows = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("w")
        .map_groups(expand, batch_format="pandas")
    )
    counted = hash_groupby(pair_rows, "key", ["n_part"], how="isum")

    def unpack(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(key >> np.int64(32)),
                "b": pa.array(key & np.int64((1 << 32) - 1)),
                "n_windows": batch.column("n_part"),
            }
        )

    return counted.map_batches(unpack, batch_format="pyarrow")


def ohlc_bars(ds, window_us: int = WINDOW_US):
    """OHLC downsampling: per (tumbling window, event_type) the opening /
    high / low / closing value in exact integer cents, plus the event count
    -> (window_start, event_type, n_events, open_cents, high_cents,
    low_cents, close_cents).  The time-series resample every metrics store
    runs; open/close tie-break is (ts, event_id).

    Combinable-partial plan: each batch reduces its rows to ONE partial row
    per (window, type) carrying (open@min-key, close@max-key, hi, lo, n);
    the final per-group merge applies the same semantics to the partials —
    so only |windows x types| rows per batch shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64)
        w = (epoch // window_us) * window_us
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"w": w, "event_type": et, "epoch": epoch, "eid": eid,
                           "cents": cents})
        df = df.sort_values(["w", "event_type", "epoch", "eid"], kind="stable")
        g = df.groupby(["w", "event_type"], sort=False)
        out = g.agg(
            open_cents=("cents", "first"),
            close_cents=("cents", "last"),
            high_cents=("cents", "max"),
            low_cents=("cents", "min"),
            n_events=("cents", "size"),
            open_key=("epoch", "first"),
            close_key=("epoch", "last"),
            open_eid=("eid", "first"),
            close_eid=("eid", "last"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["open_key", "open_eid"], kind="stable")
        first = g.iloc[0]
        g2 = group.sort_values(["close_key", "close_eid"], kind="stable")
        last = g2.iloc[-1]
        return pd.DataFrame(
            {
                "window_start": [pd.Timestamp(int(first["w"]), unit="us")],
                "event_type": [first["event_type"]],
                "n_events": [int(group["n_events"].sum())],
                "open_cents": [int(first["open_cents"])],
                "high_cents": [int(group["high_cents"].max())],
                "low_cents": [int(group["low_cents"].min())],
                "close_cents": [int(last["close_cents"])],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w", "event_type"])
        .map_groups(merge, batch_format="pandas")
        .select_columns(["window_start", "event_type", "n_events", "open_cents",
                         "high_cents", "low_cents", "close_cents"])
    )
