"""Windowed / sessionized operators over the ``events`` stream table —
the engine's streaming-shaped additions (the reference has none,
SURVEY §2.9; semantics follow the standard tumbling-window / gap-session
definitions).

Scale shape: tumbling windows pre-aggregate INSIDE map_batches (partials
keyed by (window, event_type) — bounded cardinality), so the shuffle moves
partial rows, not events.  The per-user family (sessionize, asof, ranks,
windows, funnel, ...) shuffles ONCE on a coarse hash of ``user_id``
(:func:`_by_user`, ~64 partitions) and solves ALL users in a partition with
one vectorized segmented pass (:func:`_user_segments`) — Python cost is per
PARTITION, never per distinct user.  ``groupby(user).map_groups(fn)`` pays
Python dispatch per DISTINCT key (measured ~47 s / 124k keys on this box,
``functions/reduce.py``); at 10^8+ users that is hours of dispatch, so every
op below is written against segment boundaries instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import hashing
from ..functions.scale import default_parts

def _by_user(ds, solve, n_parts: int | None = None):
    """ONE coarse user-keyed shuffle + ONE vectorized solve per partition.

    ``solve`` receives a pandas DataFrame holding EVERY row of ~1/n_parts of
    the users (all of each user's rows co-located, the same co-location
    guarantee ``groupby(user_id)`` gives) and must handle many users per
    call — see :func:`_user_segments`.  The ``__part`` key is int64 (Ray's
    sort-based groupby is ~15x faster on ints than strings).

    Contract: ``user_id`` must be an integer column (the events data
    model); the segmented solves sort/segment int64 ids.  A non-integer
    id column raises descriptively here instead of deep inside a solve."""

    n_parts = default_parts() if n_parts is None else n_parts
    def add_part(batch: pa.Table) -> pa.Table:
        if not pa.types.is_integer(batch.schema.field("user_id").type):
            raise TypeError(
                f"events user_id must be an integer column (got "
                f"{batch.schema.field('user_id').type}); the vectorized "
                "per-user solves segment int64 ids — re-id string users "
                "(e.g. functions.hashing.poly_hash64) before these operators")
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(uid, n_parts)))

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(solve, batch_format="pandas")
    )


def _user_segments(sorted_uid: np.ndarray):
    """Segment structure of a user-major-sorted id array.

    Returns ``(new_user, starts, seg)``: boolean first-row-of-user mask,
    segment start indices, and the 0-based segment id of every row.  All the
    per-user solves below are expressed against these three arrays so the
    whole partition is processed in O(n) numpy passes."""
    n = len(sorted_uid)
    new_user = np.empty(n, dtype=bool)
    if n:
        new_user[0] = True
        new_user[1:] = sorted_uid[1:] != sorted_uid[:-1]
    starts = np.flatnonzero(new_user)
    seg = np.cumsum(new_user) - 1
    return new_user, starts, seg


def _seg_searchsorted(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                      targets: np.ndarray, side: str = "left") -> np.ndarray:
    """Vectorized per-element binary search inside [lo, hi) windows of a
    piecewise-sorted array — ``searchsorted`` restricted to each target's own
    segment, all targets at once (~log2(max window) numpy passes, no Python
    per element).  Used by :func:`range_join`, whose right-events array is
    sorted by ts only WITHIN each user's segment."""
    lo = lo.astype(np.int64, copy=True)
    hi = hi.astype(np.int64, copy=True)
    if len(vals) == 0 or len(lo) == 0:
        return lo
    cap = len(vals) - 1
    while True:
        active = lo < hi
        if not active.any():
            return lo
        mid = (lo + hi) >> 1
        mv = vals[np.minimum(mid, cap)]
        if side == "left":
            go_right = active & (mv < targets)
        else:
            go_right = active & (mv <= targets)
        lo = np.where(go_right, mid + 1, lo)
        hi = np.where(active & ~go_right, mid, hi)

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
    sessions per user; session_idx is 0-based in ts order (ties: event_id).

    Segmented solve: one (user, ts, event_id) lexsort per partition, then
    session boundaries are ``new_user | gap`` and the per-user 0-based index
    is the global session counter re-based at each user's first row."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        new_user, starts, seg = _user_segments(uid)
        n = len(uid)
        new_sess = new_user.copy()
        if n > 1:
            new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        idx = np.arange(n, dtype=np.int64)
        sess_global = np.cumsum(new_sess) - 1
        start_idx = np.maximum.accumulate(np.where(new_sess, idx, -1))
        sidx = sess_global - sess_global[starts][seg]
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "session_idx": sidx.astype(np.int64),
                "session_start": ts[start_idx].astype("datetime64[us]"),
            }
        )

    return _by_user(ds, solve)


def asof_join(ds, left_type: str = "purchase", right_type: str = "view"):
    """Per-user as-of join: for each ``left_type`` event, the most recent
    ``right_type`` event by the same user with ``ts <= left.ts`` (ties at
    equal ts: the LATEST — highest event_id — right event wins, matching
    the SQL oracle's max-over-ties).  Inner semantics:
    left events with no prior right event are dropped.  Emits
    (event_id, user_id, matched_event_id, lag_us).

    The reference has no joins at all (SURVEY §2.4); this is the
    training-pipeline as-of operator from the task brief, built as the same
    shuffle-by-user + segmented solve as :func:`sessionize` — one
    partitioning key (user_id) shared across every events operator, so at
    100 TB these stages chain without re-shuffling.  The partition solve is
    a vectorized merge over ALL users at once: user-major lexsort,
    forward-fill the last right-event index via ``np.maximum.accumulate``,
    and reject fills that cross a user boundary (``m >= starts[seg]``).
    """

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        is_r = et == right_type
        is_l = et == left_type
        # within (user, ts) ties the right side precedes the left
        order = np.lexsort((eid, ~is_r, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        is_r, is_l = is_r[order], is_l[order]
        _, starts, seg = _user_segments(uid)
        idx = np.arange(len(uid), dtype=np.int64)
        last_r = np.maximum.accumulate(np.where(is_r, idx, -1))
        li = np.flatnonzero(is_l)
        m = last_r[li]
        ok = m >= starts[seg[li]]  # matched right event is the SAME user's
        li, m = li[ok], m[ok]
        return pd.DataFrame(
            {
                "event_id": eid[li],
                "user_id": uid[li],
                "matched_event_id": eid[m],
                "lag_us": (ts[li] - ts[m]).astype(np.int64),
            }
        )

    return _by_user(ds, solve)


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
    partitioning key); the partition solve handles ALL users at once: right
    events sort user-major, each left event's user segment comes from two
    ``searchsorted`` calls on the right uid array, and the time bounds
    INSIDE the segment from :func:`_seg_searchsorted` (vectorized bisection
    — the right ts array is only sorted within each user's segment).
    Fan-out stays bounded by events-per-user-per-window, no Python per
    user or row."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "matched_event_id": pd.Series([], dtype="int64"),
                "lag_us": pd.Series([], dtype="int64"),
            }
        )
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        is_r = et == right_type
        is_l = et == left_type
        if not is_r.any() or not is_l.any():
            return empty
        # right side user-major, (ts, event_id) within user
        r_order = np.lexsort((eid[is_r], ts[is_r], uid[is_r]))
        r_uid = uid[is_r][r_order]
        rts, rid = ts[is_r][r_order], eid[is_r][r_order]
        l_uid, lts, lid = uid[is_l], ts[is_l], eid[is_l]
        seg_lo = np.searchsorted(r_uid, l_uid, side="left")
        seg_hi = np.searchsorted(r_uid, l_uid, side="right")
        lo = _seg_searchsorted(rts, seg_lo, seg_hi, lts - window_us, side="left")
        hi = _seg_searchsorted(rts, lo, seg_hi, lts, side="right")
        n = hi - lo
        total = int(n.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lid)), n)
        ri = np.repeat(lo, n) + (np.arange(total) - np.repeat(np.cumsum(n) - n, n))
        return pd.DataFrame(
            {
                "event_id": lid[li],
                "user_id": l_uid[li],
                "matched_event_id": rid[ri],
                "lag_us": lts[li] - rts[ri],
            }
        )

    return _by_user(ds, solve)


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
    Same shuffle-by-user key as every events operator; the segmented solve
    is one global cumsum re-based at each user's first row."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        _, starts, seg = _user_segments(uid)
        idx = np.arange(len(uid), dtype=np.int64)
        cum = np.cumsum(cents)
        base = cum[starts] - cents[starts]  # running sum BEFORE each user
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "seq": idx - starts[seg] + 1,
                "cum_cents": cum - base[seg],
            }
        )

    return _by_user(ds, solve)


def user_event_paths(ds, max_len: int = 50):
    """events -> (user_id, n_events, path): each user's chronological
    event-type sequence joined with ',' (first ``max_len`` events, (ts,
    event_id) order) plus the total count — collect_list / string_agg, the
    sequence-construction op behavioral models train on.  Cost is one
    string join per USER (not per event; the join itself is irreducibly
    per-user, but it runs inside ONE pandas groupby per partition — no Ray
    dispatch per user); the cap bounds the output row width the way any
    sequence model bounds context."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        _, starts, seg = _user_segments(uid)
        n = len(uid)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        pos = np.arange(n, dtype=np.int64) - starts[seg]
        keep = pos < max_len
        # pos 0 is always kept, so every segment id appears exactly once
        paths = pd.Series(et[keep]).groupby(seg[keep], sort=True).agg(",".join)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": counts,
                "path": paths.to_numpy(),
            }
        )

    return _by_user(ds, solve)


def moving_sum(ds, preceding: int = 3):
    """events -> (event_id, user_id, win_n, win_cents): bounded moving
    window (ROWS ``preceding`` PRECEDING AND CURRENT ROW) over per-user
    (ts, event_id) order — the bounded complement of
    :func:`running_totals`'s unbounded frame.  Sum kept in exact integer
    cents via cumsum difference (O(n) per partition, vectorized across all
    users: the frame is clamped at each user's first row); the window row
    count is emitted instead of a float mean so every column stays exactly
    comparable."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        _, starts, seg = _user_segments(uid)
        idx = np.arange(len(uid), dtype=np.int64)
        pos = idx - starts[seg]
        cum = np.cumsum(cents)
        base = (cum[starts] - cents[starts])[seg]  # sum before the user
        in_frame = pos >= preceding + 1
        prev_cum = np.where(
            in_frame, cum[np.maximum(idx - (preceding + 1), 0)], base
        )
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "win_n": np.minimum(pos + 1, preceding + 1),
                "win_cents": cum - prev_cum,
            }
        )

    return _by_user(ds, solve)


TRAIL_WINDOW_US = 3_600_000_000  # 1 hour


def trailing_window_sum(ds, window_us: int = TRAIL_WINDOW_US):
    """events -> (event_id, user_id, win_n, win_cents): TIME-based window
    frame — for each event, the count and exact-cents sum of the same
    user's events with ``ts`` in ``[ts_i - window, ts_i]`` (SQL ``RANGE
    BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``; peers at the same
    timestamp are IN the frame on both sides, per RANGE semantics —
    unlike the ROWS frame of :func:`moving_sum`).

    Vectorized across all users in a partition with NO per-user Python:
    after the (user, ts) lexsort, timestamps are re-based per user
    segment — ``t' = (ts - min_ts) + (seg + 1) * (span + window + 1)`` —
    so the partition-wide array is strictly segment-separated and ONE
    pair of global ``np.searchsorted`` calls yields every row's frame
    bounds without crossing a user boundary.  Frame sums come from the
    cumsum difference.  Exact integer cents end to end."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
        _, _, seg = _user_segments(uid)
        span = int(ts.max() - ts.min()) if len(ts) else 0
        stride = np.int64(span + window_us + 1)
        # guard the composite-key construction against int64 overflow
        n_seg = int(seg[-1]) + 1 if len(seg) else 0
        if n_seg and (n_seg + 1) > (2**62) // max(int(stride), 1):
            raise OverflowError(
                "trailing_window_sum: segment-offset key would overflow "
                "int64; raise n_parts or shrink the window")
        tp = (ts - (ts.min() if len(ts) else 0)) + (seg + 1) * stride
        lo = np.searchsorted(tp, tp - window_us, side="left")
        hi = np.searchsorted(tp, tp, side="right")
        cum = np.cumsum(cents)
        win = cum[hi - 1] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        return pd.DataFrame({"event_id": eid, "user_id": uid,
                             "win_n": (hi - lo).astype(np.int64),
                             "win_cents": win})

    return _by_user(ds, solve)


def event_gaps(ds):
    """events -> (event_id, user_id, prev_event_id, gap_us): the LAG window
    function — for each event (after the user's first), the previous event
    in (ts, event_id) order and the elapsed microseconds.  First-per-user
    rows are dropped rather than emitted as NULL so every column stays a
    non-nullable int64 (NULL ints become float64 through pandas and break
    exact comparison).  Same user_id shuffle key as every events operator;
    segmented solve: one lexsort, keep every row whose predecessor is the
    same user."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        new_user, _, _ = _user_segments(uid)
        keep = np.flatnonzero(~new_user)  # row i-1 is the same user's
        return pd.DataFrame(
            {
                "event_id": eid[keep],
                "user_id": uid[keep],
                "prev_event_id": eid[keep - 1],
                "gap_us": ts[keep] - ts[keep - 1],
            }
        )

    return _by_user(ds, solve)


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
    segmented solve keeps every row whose successor is the same user and
    broadcasts the per-user bookends via the segment-id gather."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        _, starts, seg = _user_segments(uid)
        n = len(uid)
        ends = np.append(starts[1:], n) - 1
        is_last = np.zeros(n, dtype=bool)
        if n:
            is_last[ends] = True
        keep = np.flatnonzero(~is_last)  # row i+1 is the same user's
        return pd.DataFrame({
            "event_id": eid[keep],
            "user_id": uid[keep],
            "next_event_id": eid[keep + 1],
            "first_event_id": eid[starts][seg[keep]],
            "last_event_id": eid[ends][seg[keep]],
        })

    return _by_user(ds, solve)


def event_ranks(ds):
    """events -> (event_id, user_id, cents, rnk, drnk): RANK and DENSE_RANK
    of each event's value (exact integer cents) within its user, highest
    first.  Ties share a rank: rank() leaves gaps, dense_rank() doesn't —
    both computed vectorized from run boundaries in ONE user-major
    descending-cents sort per partition (no Python per user or row).  Ties
    on cents are real (values quantize to cents), so the tie semantics are
    actually exercised."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((-cents, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        new_user, starts, seg = _user_segments(uid)
        n = len(uid)
        new_run = new_user.copy()
        if n > 1:
            new_run[1:] |= cents[1:] != cents[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, -1))
        rnk = run_start - starts[seg] + 1  # run head's 1-based user position
        run_global = np.cumsum(new_run) - 1
        drnk = run_global - run_global[starts][seg] + 1
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "cents": cents,
                "rnk": rnk,
                "drnk": drnk,
            }
        )

    return _by_user(ds, solve)


def gap_fill(ds, bucket_us: int = WINDOW_US):
    """Per-user time-series densification (resample): every ``bucket_us``
    bucket from the user's first to last event, with n_events and exact
    integer-cent sums, zero-filled where the user was inactive — the
    temporal gap-filling operator every feature/training pipeline needs
    before windowed models (the SQL ``generate_series + LEFT JOIN`` idiom).

    Emits (user_id, bucket_start, n_events, sum_cents), one row per
    (user, bucket) in the user's active range.

    Same single shuffle key (user_id) as every events operator; the
    segmented solve densifies ALL users in one pass: per-user bucket spans
    from the segment bookends, the dense output laid out contiguously via a
    prefix sum over span lengths, and counts/sums scattered with ONE
    ``np.bincount`` / ``np.add.at`` over global output offsets — no Python
    per user, densified rows created inside the partition task (never on
    the driver)."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        bkt = ts // bucket_us
        order = np.lexsort((bkt, uid))
        uid, bkt, cents = uid[order], bkt[order], cents[order]
        _, starts, seg = _user_segments(uid)
        n = len(uid)
        ends = np.append(starts[1:], n) - 1
        lo, hi = bkt[starts], bkt[ends]  # per-user first/last active bucket
        n_user = hi - lo + 1
        total = int(n_user.sum())
        out_start = np.cumsum(n_user) - n_user
        out_seg = np.repeat(np.arange(len(starts), dtype=np.int64), n_user)
        intra = np.arange(total, dtype=np.int64) - out_start[out_seg]
        off = out_start[seg] + (bkt - lo[seg])  # each event's output slot
        counts = np.bincount(off, minlength=total).astype(np.int64)
        sums = np.zeros(total, np.int64)
        np.add.at(sums, off, cents)  # exact int64 (bincount weights = lossy float)
        return pd.DataFrame(
            {
                "user_id": uid[starts][out_seg],
                "bucket_start": ((lo[out_seg] + intra) * bucket_us).astype("datetime64[us]"),
                "n_events": counts,
                "sum_cents": sums,
            }
        )

    return _by_user(ds, solve)


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

    Same shuffle-by-user shape as the rest of the event family; the
    segmented solve advances ALL users one funnel step per pass (k numpy
    passes total): step i's per-user earliest qualifying timestamp is a
    masked segmented min (``np.minimum.at``), and a user whose step failed
    carries the -1 sentinel forward, which the ``prev >= 0`` guard locks
    out of every later step — O(k * partition rows), no Python per user."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.argsort(uid, kind="stable")
        uid, ts, et = uid[order], ts[order], et[order]
        _, starts, seg = _user_segments(uid)
        n_users = len(starts)
        sentinel = np.iinfo(np.int64).max
        stage = np.zeros(n_users, np.int64)
        prev = None
        row = {"user_id": uid[starts], "stage": None}
        for i, s in enumerate(steps):
            m = et == s
            if prev is not None:
                p = prev[seg]
                m &= (p >= 0) & (ts >= p) & (ts <= p + window_us)
            acc = np.full(n_users, sentinel, np.int64)
            np.minimum.at(acc, seg[m], ts[m])
            found = acc != sentinel
            prev = np.where(found, acc, np.int64(-1))
            stage += found
            row[f"ts_{i + 1}"] = prev
        row["stage"] = stage
        return pd.DataFrame(row)

    return _by_user(ds, solve)


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

    n_parts = default_parts()

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[us]").astype(np.int64) // bucket_us
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        part = hashing.coarse_partition(df["user_id"].to_numpy(), n_parts)
        return pa.Table.from_pandas(df.assign(__part=part), preserve_index=False)

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


AB_MULT = 2654435761
AB_MOD = 1_000_000
AB_CONV_VALUE = 150.0


def ab_lift(ds, conv_type: str = "purchase", conv_value: float = AB_CONV_VALUE,
            mult: int = AB_MULT, mod: int = AB_MOD):
    """events -> one-row A/B experiment readout: users split into two arms
    by the deterministic sample hash (arm = hash(user) % 2), conversion =
    user has >= 1 ``conv_type`` event with value > ``conv_value`` (the
    plain event is near-universal in the driver data — the value floor
    makes the rate informative); reports per-arm user counts,
    conversion rates, relative lift of B over A, and the pooled
    two-proportion z statistic — the experiment-analysis op every event
    pipeline ends in.

    Scale shape: per-batch (user, converted) partials pre-aggregate, ONE
    user-keyed vectorized max-reduce (distinct users with their flag), then
    per-arm sums are a 2-key aggregate; the z arithmetic is driver-side on
    four scalars."""
    from ray.data.aggregate import Sum

    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        conv = ((et == conv_type) & (val > conv_value)).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        c = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(c, inv, conv)
        return pa.table({"user_id": pa.array(uniq), "conv": pa.array(c)})

    # the flag is max-combining but a user's rows can span batches, so
    # reduce the per-batch maxima with isum and clamp: sum >= 1 <=> converted
    users = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", ["conv"], how="isum",
    )

    def arm_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        conv = batch.column("conv").to_numpy(zero_copy_only=False) >= 1
        arm = (((uid % mod) * (mult % mod)) % mod) % 2
        n = np.bincount(arm, minlength=2).astype(np.int64)
        c = np.bincount(arm, weights=conv.astype(np.float64), minlength=2).astype(np.int64)
        return pa.table(
            {"arm": pa.array(np.arange(2, dtype=np.int64)),
             "n": pa.array(n), "c": pa.array(c)}
        )

    agg = users.map_batches(arm_partial, batch_format="pyarrow").groupby("arm").aggregate(
        Sum("n", alias_name="n"), Sum("c", alias_name="c")
    )
    rows = {int(r["arm"]): (int(r["n"]), int(r["c"])) for r in agg.take_all()}
    na, ca = rows.get(0, (0, 0))
    nb, cb = rows.get(1, (0, 0))
    if na == 0 or nb == 0:
        raise ValueError("ab_lift: an arm has no users — cannot compare")
    pa_ = ca / na
    pb = cb / nb
    pool = (ca + cb) / (na + nb)
    se = np.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    z = (pb - pa_) / se if se > 0 else 0.0
    lift = pb / pa_ - 1.0 if pa_ > 0 else 0.0
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "conv_a": pa.array([ca], pa.int64()),
            "conv_b": pa.array([cb], pa.int64()),
            "rate_a": pa.array([pa_], pa.float64()),
            "rate_b": pa.array([pb], pa.float64()),
            "lift": pa.array([float(lift)], pa.float64()),
            "z_score": pa.array([float(z)], pa.float64()),
        }
    )


RFM_QS = (1.0 / 3.0, 2.0 / 3.0)
_DAY_US = 86_400_000_000


def rfm_segments(events_ds):
    """events -> (user_id, recency_days, frequency, monetary_cents, r_seg,
    f_seg, m_seg): classic RFM customer segmentation — recency = whole days
    between the user's last event (any type) and the latest event in the
    data, frequency = total event count, monetary = exact cents of
    'purchase' values; each dimension labeled 1..3 by VALUE comparison
    against exact corpus terciles (3 = best: most recent / most frequent /
    highest spend), so threshold ties land deterministically in one bucket
    on both engines.

    Scale shape: ONE user shuffle builds the narrow per-user table
    (batch-local max/count/sum partials through the mixed-reduction
    :func:`..functions.reduce.hash_groupby`), materialized once — the
    honest cost of exact terciles, which need the global max timestamp and
    three value-histogram quantile passes (:func:`..stages.sketch
    .quantiles`: only (value, count) pairs shuffle) before the label pass
    re-reads it.  Raw events are scanned exactly once."""
    from .sketch import quantiles
    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        is_buy = batch.column("event_type").to_numpy(zero_copy_only=False) == "purchase"
        cents = np.where(
            is_buy, np.floor(val * 100.0 + 0.5).astype(np.int64), np.int64(0))
        uniq, inv = np.unique(u, return_inverse=True)
        last = np.full(len(uniq), np.iinfo(np.int64).min)
        np.maximum.at(last, inv, ts)
        m = np.zeros(len(uniq), np.int64)
        np.add.at(m, inv, cents)
        return pa.table({
            "user_id": pa.array(uniq),
            "last_ts": pa.array(last),
            "frequency": pa.array(np.bincount(inv, minlength=len(uniq))
                                  .astype(np.int64)),
            "monetary_cents": pa.array(m),
        })

    per_user = hash_groupby(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", ["last_ts", "frequency", "monetary_cents"],
        how={"last_ts": "max", "frequency": "isum", "monetary_cents": "isum"},
    ).materialize()  # narrow |users| rows; 5 cheap passes follow

    gmax = int(per_user.max("last_ts"))

    def days_of(batch: pa.Table) -> np.ndarray:
        last = batch.column("last_ts").to_numpy(zero_copy_only=False).astype(np.int64)
        return (gmax - last) // _DAY_US

    def freq_of(batch: pa.Table) -> np.ndarray:
        return batch.column("frequency").to_numpy(zero_copy_only=False).astype(np.int64)

    def money_of(batch: pa.Table) -> np.ndarray:
        return batch.column("monetary_cents").to_numpy(zero_copy_only=False).astype(np.int64)

    tr = [int(v) for v in quantiles(per_user, days_of, qs=RFM_QS)
          .column("value").to_pylist()]
    tf = [int(v) for v in quantiles(per_user, freq_of, qs=RFM_QS)
          .column("value").to_pylist()]
    tm = [int(v) for v in quantiles(per_user, money_of, qs=RFM_QS)
          .column("value").to_pylist()]

    def label(batch: pa.Table) -> pa.Table:
        d = days_of(batch)
        f = freq_of(batch)
        m = money_of(batch)
        r_seg = 3 - ((d > tr[0]).astype(np.int64) + (d > tr[1]).astype(np.int64))
        f_seg = 1 + (f > tf[0]).astype(np.int64) + (f > tf[1]).astype(np.int64)
        m_seg = 1 + (m > tm[0]).astype(np.int64) + (m > tm[1]).astype(np.int64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "recency_days": pa.array(d),
            "frequency": pa.array(f),
            "monetary_cents": pa.array(m),
            "r_seg": pa.array(r_seg),
            "f_seg": pa.array(f_seg),
            "m_seg": pa.array(m_seg),
        })

    return per_user.map_batches(label, batch_format="pyarrow")


OVERLAP_BUCKET_US = 3_600_000_000  # 1h time buckets for the interval join


def session_overlap(events_ds, gap_us: int = SESSION_GAP_US,
                    bucket_us: int = OVERLAP_BUCKET_US):
    """events -> (user_a, sess_a, user_b, sess_b, overlap_us): the INTERVAL
    OVERLAP JOIN — every pair of concurrent sessions belonging to DIFFERENT
    users (inclusive endpoints: s_a <= e_b AND s_b <= e_a), each pair
    exactly once, with the overlap length in microseconds.  The concurrency
    graph behind co-browsing/fraud-ring analysis.

    Scale shape (the temporal analog of :func:`..stages.spatialjoin
    .distance_join`'s bucket+halo plan): sessions reduce per user first
    (ONE user shuffle, segmented min/max — never raw events into the join),
    then each interval scatters to every ``bucket_us`` time bucket it
    spans; pairs are generated per bucket with one vectorized O(k^2) mask
    and DEDUPED BY OWNERSHIP — a pair is emitted only by the bucket
    containing ``max(s_a, s_b)``, which every overlapping pair hits exactly
    once (the overlap starts there).  Gap-based sessions are bounded by
    activity, so per-interval bucket fan-out stays small; pair order is
    user_a < user_b (one user's sessions never overlap by construction)."""

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user, starts, _seg = _user_segments(uid)
        new_sess = new_user.copy()
        if len(uid) > 1:
            new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sess_global = np.cumsum(new_sess) - 1
        sidx = sess_global - sess_global[starts][_seg]
        bounds = np.flatnonzero(new_sess)
        s_us = ts[bounds]
        e_us = np.concatenate((ts[bounds[1:] - 1], ts[-1:]))
        return pd.DataFrame({
            "user_id": uid[bounds],
            "session_idx": sidx[bounds],
            "s_us": s_us,
            "e_us": e_us,
        })

    iv = _by_user(events_ds, intervals)

    def scatter(batch: pa.Table) -> pa.Table:
        s = batch.column("s_us").to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch.column("e_us").to_numpy(zero_copy_only=False).astype(np.int64)
        b0, b1 = s // bucket_us, e // bucket_us
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), reps)
        off = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        return pa.table({
            "bucket": pa.array(b0[idx] + off),
            "user_id": pa.array(
                batch.column("user_id").to_numpy(zero_copy_only=False)
                .astype(np.int64)[idx]),
            "session_idx": pa.array(
                batch.column("session_idx").to_numpy(zero_copy_only=False)
                .astype(np.int64)[idx]),
            "s_us": pa.array(s[idx]),
            "e_us": pa.array(e[idx]),
        })

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_a": pd.Series([], dtype="int64"),
            "sess_a": pd.Series([], dtype="int64"),
            "user_b": pd.Series([], dtype="int64"),
            "sess_b": pd.Series([], dtype="int64"),
            "overlap_us": pd.Series([], dtype="int64"),
        })
        k = len(df)
        if k < 2:
            return empty
        bucket = int(df["bucket"].iloc[0])
        uid = df["user_id"].to_numpy().astype(np.int64)
        sid = df["session_idx"].to_numpy().astype(np.int64)
        s = df["s_us"].to_numpy().astype(np.int64)
        e = df["e_us"].to_numpy().astype(np.int64)
        i, j = np.triu_indices(k, k=1)
        lo = np.maximum(s[i], s[j])
        hi = np.minimum(e[i], e[j])
        # overlap, cross-user, owned by THIS bucket (where the overlap starts)
        hit = (lo <= hi) & (uid[i] != uid[j]) & (lo // bucket_us == bucket)
        i, j = i[hit], j[hit]
        flip = uid[i] > uid[j]
        ia, ib = np.where(flip, j, i), np.where(flip, i, j)
        out = pd.DataFrame({
            "user_a": uid[ia], "sess_a": sid[ia],
            "user_b": uid[ib], "sess_b": sid[ib],
            "overlap_us": (np.minimum(e[ia], e[ib])
                           - np.maximum(s[ia], s[ib])).astype(np.int64),
        })
        return out if len(out) else empty

    return (
        iv.map_batches(scatter, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(solve, batch_format="pandas")
    )


def event_transitions(ds):
    """events -> (from_type, to_type, n, prob): the first-order Markov
    transition matrix of event types — for every consecutive pair of a
    user's events in (ts, event_id) order, count (from, to) occurrences
    and row-normalize into transition probabilities.

    Scale shape: the pair extraction is the LAG pattern
    (:func:`event_gaps`) on the shared coarse user shuffle, but what
    leaves each partition is the PRE-AGGREGATED (from, to, n) matrix —
    |types|^2 rows per partition, never the pair stream.  The global
    reduce is a bounded two-key groupby; normalization runs on the final
    |types|^2-row table in one single-partition pass (its per-from totals
    need the whole matrix, which is aggregate-sized by construction).
    ``prob`` is the one derived double, rounded floor(x*1e6+0.5)/1e6 with
    the oracle."""
    from ray.data.aggregate import Sum

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        new_user, _, _ = _user_segments(uid)
        keep = np.flatnonzero(~new_user)
        types, codes = np.unique(et, return_inverse=True)
        key = codes[keep - 1].astype(np.int64) * len(types) + codes[keep]
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "from_type": types[uk // len(types)],
            "to_type": types[uk % len(types)],
            "n": cnt.astype(np.int64),
        })

    def normalize(batch: pa.Table) -> pa.Table:
        ft = batch.column("from_type").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(ft, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        prob = np.floor(n.astype(np.float64) / tot[inv] * 1e6 + 0.5) / 1e6
        return batch.append_column("prob", pa.array(prob))

    return (
        _by_user(ds, solve)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(normalize, batch_format="pyarrow", batch_size=None)
        .sort(["from_type", "to_type"])
    )


ATTR_TOUCH = "view"
ATTR_CONV = "purchase"


def attribution(ds, touch: str = ATTR_TOUCH, conv: str = ATTR_CONV):
    """events -> (event_id, user_id, touch_event_id, lag_us): LAST-TOUCH
    attribution — for every ``conv`` event, the user's most recent
    STRICTLY-PRIOR ``touch`` event (by (ts, event_id) order) and the
    elapsed microseconds; conversions with no prior touch are dropped
    (non-nullable int64 columns, the :func:`event_gaps` convention).

    Scale shape: the shared coarse user shuffle; per partition ONE lexsort
    + a running last-touch-index forward fill (np.maximum.accumulate over
    touch positions, reset per user via the segment floor) — no per-user
    Python, no self-join."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, et = uid[order], ts[order], eid[order], et[order]
        n = len(uid)
        _, starts, seg = _user_segments(uid)
        pos = np.arange(n, dtype=np.int64)
        # index of the latest touch at-or-before each row, floored at the
        # user's segment start (so no cross-user bleed)
        touch_pos = np.where(et == touch, pos, -1)
        last_touch = np.maximum.accumulate(touch_pos)
        valid = last_touch >= starts[seg]
        is_conv = et == conv
        # STRICTLY prior: a conversion row that is itself... conv != touch
        # by construction, so at-or-before == strictly-before here
        keep = np.flatnonzero(is_conv & valid)
        lt = last_touch[keep]
        return pd.DataFrame({
            "event_id": eid[keep],
            "user_id": uid[keep],
            "touch_event_id": eid[lt],
            "lag_us": ts[keep] - ts[lt],
        })

    if touch == conv:
        raise ValueError("attribution: touch and conv types must differ")
    return _by_user(ds, solve)


ACF_LAGS = 3


def event_autocorr(ds, lags: int = ACF_LAGS):
    """events -> (lag, n_hours, r): the AUTOCORRELATION FUNCTION of the
    hourly event-count series at lags 1..``lags`` — the seasonality /
    burstiness diagnostic of a crawl or traffic stream (r(24) high = daily
    cycle).  Missing hours count as ZERO events (the series is made dense
    over [min hour, max hour] — silently skipping empty buckets would
    correlate the wrong neighbors).

    EXACT: the ACF closed form is cleared of the rational mean mu = S/n
    by multiplying through by n^2 — numerator ``n^2*P - n*S*(A+B) +
    (n-k)*S^2`` and denominator ``n^2*Q - n*S^2`` are arbitrary-precision
    Python ints (P = sum x_t*x_{t+k}, A/B = edge partial sums, Q = sum
    x^2); one float division at the end, shared rounding.  Scale shape:
    ONE bounded hour-keyed count reduce (|hours| rows — an aggregate);
    the lag products run on the dense driver-side series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    x = np.zeros(hi - lo + 1, dtype=object)
    x[hs - lo] = hist["cnt"].to_numpy(np.int64)
    x = np.array([int(v) for v in x], dtype=object)
    n = len(x)
    if n <= lags:
        raise ValueError(f"event_autocorr: need > {lags} hours, got {n}")
    S = int(np.sum(x))
    Q = int(np.sum(x * x))
    den = n * n * Q - n * S * S
    if den == 0:
        raise ValueError("event_autocorr: constant series — ACF undefined")
    out_lag, out_r = [], []
    for k in range(1, lags + 1):
        P = int(np.sum(x[:-k] * x[k:]))
        A = int(np.sum(x[:-k]))
        B = int(np.sum(x[k:]))
        num = n * n * P - n * S * (A + B) + (n - k) * S * S
        out_lag.append(k)
        # float() each side FIRST (mirrors SQL CAST(... AS DOUBLE) /
        # CAST(... AS DOUBLE)) — exact-ratio division could differ in the
        # last ulp once num/den exceed 2^53
        out_r.append(np.floor(float(num) / float(den) * 1e6 + 0.5) / 1e6)
    return rd.from_arrow(pa.table({
        "lag": pa.array(out_lag, pa.int64()),
        "n_hours": pa.array([n] * lags, pa.int64()),
        "r": pa.array(out_r, pa.float64()),
    }))


#: burst threshold in sigmas (integer so the compare stays exact)
BURST_SIGMAS = 2


def burst_hours(ds, sigmas: int = BURST_SIGMAS):
    """events -> (hr, cnt): the hours whose event count exceeds
    ``mean + sigmas * std`` of the dense hourly series — burst / anomaly
    detection over a crawl or traffic stream (the alerting counterpart of
    :func:`event_autocorr`; same dense zero-filled series, missing hours
    ARE data).

    EXACT: the threshold is cleared of the rational mean/variance —
    flag iff ``c*n - S1 > 0`` AND ``(c*n - S1)^2 > sigmas^2 * (n*S2 -
    S1^2)`` with arbitrary-precision Python ints (S1/S2 the series
    moments), so the HUGEINT oracle matches bit-for-bit with no float
    anywhere.  Scale shape: ONE bounded hour-keyed count reduce (an
    aggregate, |hours| rows); the moment pass runs on the dense
    driver-side series like the ACF."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("burst_hours: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[hs - lo] = hist["cnt"].to_numpy(np.int64)
    n = len(x)
    s1 = int(x.sum())
    s2 = int((x.astype(object) * x.astype(object)).sum())
    var_n2 = n * s2 - s1 * s1  # n^2 * variance, exact
    dev = x.astype(object) * n - s1  # n * (c - mean)
    flag = (dev > 0) & (dev * dev > sigmas * sigmas * var_n2)
    keep = np.flatnonzero(np.asarray(flag, dtype=bool))
    return rd.from_arrow(pa.table({
        "hr": pa.array((lo + keep).astype(np.int64)),
        "cnt": pa.array(x[keep]),
    }))


def cusum_change(ds):
    """events -> ONE row (chg_hr, cusum, n_hours): CUSUM change-point
    detection over the dense hourly event-count series — the hour ``t``
    maximizing ``|S_t|`` where ``S_t = sum_{i<=t} (n*x_i - S1)`` (the
    mean-cleared cumulative sum scaled by ``n`` so every term is an exact
    integer; ``S1`` the series total).  The classic "where did the level
    shift" statistic for crawl-rate / traffic monitoring, sibling of
    :func:`burst_hours` (same dense zero-filled series — missing hours ARE
    data) and :func:`event_autocorr`.

    EXACT: arbitrary-precision Python ints end to end; ties on ``|S_t|``
    resolve to the EARLIEST hour, so the HUGEINT window oracle matches
    bit-for-bit.  Scale shape: ONE bounded hour-keyed count reduce
    (|hours| rows); the cumulative pass runs on the bounded driver-side
    series like the ACF/burst ops."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("cusum_change: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[hs - lo] = hist["cnt"].to_numpy(np.int64)
    n = len(x)
    s1 = int(x.sum())
    cum = np.cumsum(x.astype(object) * n - s1)  # exact object ints
    mag = np.abs(cum)
    best = int(np.argmax(mag))  # np.argmax returns the FIRST maximum
    return rd.from_arrow(pa.table({
        "chg_hr": pa.array([lo + best], pa.int64()),
        "cusum": pa.array([int(cum[best])], pa.int64()),
        "n_hours": pa.array([n], pa.int64()),
    }))


EMA_WINDOW = 8


def ema_win(ds, window: int = EMA_WINDOW):
    """events -> (event_id, user_id, n_terms, ema_scaled): EXACT
    exponential moving average with alpha = 1/2 over the last ``window``
    events per user in (ts, event_id) order — the j-th most recent event
    weighs ``2^(window-1-j)``, so the weighted sum is a pure int64
    (``ema_scaled = sum cents_j * 2^(window-1-j)``; divide by
    ``2^window - 1``-ish normalizers downstream if a float EMA is wanted;
    keeping the scaled integer makes the oracle bit-exact).  Rows with
    fewer than ``window`` predecessors use the terms that exist
    (``n_terms``), like SQL LAG chains.

    Scale shape: the events-family standard — coarse user-hash shuffle,
    ONE lexsort per partition, the window as ``window`` shifted-array
    adds with segment-boundary masking (vectorized across all users, no
    per-user Python)."""

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        n = len(uid)
        ema = np.zeros(n, np.int64)
        terms = np.zeros(n, np.int64)
        for j in range(window):
            w = np.int64(1) << np.int64(window - 1 - j)
            if j == 0:
                ema += cents * w
                terms += 1
                continue
            valid = np.zeros(n, dtype=bool)
            valid[j:] = uid[j:] == uid[:-j]
            shifted = np.zeros(n, np.int64)
            shifted[j:] = cents[:-j]
            ema += np.where(valid, shifted, 0) * w
            terms += valid
        return pd.DataFrame({"event_id": eid, "user_id": uid,
                             "n_terms": terms, "ema_scaled": ema})

    return _by_user(ds, solve)


def events_by_segment(ds, sf_dir: str):
    """events x customer dimension -> (mktsegment, event_type, n_events,
    sum_cents): behavioral rollup by CUSTOMER ATTRIBUTE — the
    fact-to-dimension enrichment shape (events carry only a user id; the
    segment lives in the customer table).  Inner-join semantics: events
    whose user has no customer row are dropped, like the SQL.

    Scale shape: customer is the broadcast dim (``ray.put`` of two
    parallel sorted arrays, read once per worker); each fact batch maps
    user -> segment and reduces batch-locally to |segments| x |types|
    partial rows, so the final groupby sees a bounded key space.  Exact
    integer cents."""
    import pyarrow.parquet as pq_
    import ray

    cust = pq_.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"]).combine_chunks()
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)
    segs = sorted(set(seg.tolist()))
    seg_id = {s: i for i, s in enumerate(segs)}
    sid = np.array([seg_id[s] for s in seg], dtype=np.int64)
    order = np.argsort(ck, kind="stable")
    dim_ref = ray.put((ck[order], sid[order]))

    def partial(batch: pa.Table) -> pa.Table:
        cks, sids = ray.get(dim_ref)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(cks) == 0:
            return pa.table({"seg": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_cents": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(cks, uid), len(cks) - 1)
        hit = cks[pos] == uid
        s = sids[pos[hit]]
        et = np.asarray(batch.column("event_type").to_pylist(),
                        dtype=object)[hit]
        cents = np.floor(batch.column("value")
                         .to_numpy(zero_copy_only=False)[hit] * 100.0 + 0.5) \
            .astype(np.int64)
        etc, et_inv = np.unique(et.astype(str), return_inverse=True)
        pair = s * len(etc) + et_inv
        uniq, inv = np.unique(pair, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sc = np.zeros(len(uniq), np.int64)
        np.add.at(sc, inv, cents)
        return pa.table({
            "seg": pa.array(uniq // len(etc)),
            "event_type": pa.array(etc[uniq % len(etc)].tolist(), pa.string()),
            "n_events": pa.array(n),
            "sum_cents": pa.array(sc),
        })

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["seg", "event_type"])
        .aggregate(_Sum("n_events", alias_name="n_events"),
                   _Sum("sum_cents", alias_name="sum_cents"))
        .to_pandas()  # |segments| x |types| — bounded
    )
    agg = agg.sort_values(["seg", "event_type"]).reset_index(drop=True)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "c_mktsegment": pa.array([segs[int(s)] for s in agg["seg"]],
                                 pa.string()),
        "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
        "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
        "sum_cents": pa.array(agg["sum_cents"].to_numpy(np.int64)),
    }))


def cuped_lift(ds, mult: int = AB_MULT, mod: int = AB_MOD):
    """events -> one-row CUPED experiment readout: the A/B lift on
    per-user POST-period spend, variance-reduced with the user's
    PRE-period spend as the covariate (theta = cov(X, Y)/var(X) pooled
    across arms; Y_adj = Y - theta * (X - mean(X))) — the standard
    experimentation-platform estimator next to :func:`ab_lift`'s
    two-proportion z.

    Period split: the midpoint of the observed event time range
    ((min+max)//2 epoch-us, one tiny pre-pass aggregate); PRE = ts <
    mid, POST = ts >= mid.  Arms = the same deterministic user hash as
    ``ab_lift``.

    Exactness: X/Y are integer cents; all five moments (n, Sx, Sy, Sxx,
    Sxy) reduce as exact int64 sums; theta and the adjusted means are ONE
    shared float expression tree over those integers (mirrored verbatim
    in the oracle), outputs round6.  Scale shape: per-batch (user, x, y)
    partials -> ONE user-keyed reduce -> 2-row arm aggregate; finalize is
    driver math on ten scalars."""
    from ray.data.aggregate import Sum

    from ..functions.reduce import hash_groupby

    lohi = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([b.column("ts").to_numpy(zero_copy_only=False)
                            .astype("datetime64[us]").astype(np.int64).min()]),
            "hi": pa.array([b.column("ts").to_numpy(zero_copy_only=False)
                            .astype("datetime64[us]").astype(np.int64).max()]),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    mid = (int(lohi["lo"].min()) + int(lohi["hi"].max())) // 2

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        x = np.zeros(len(uniq), np.int64)
        y = np.zeros(len(uniq), np.int64)
        pre = ts < mid
        np.add.at(x, inv[pre], cents[pre])
        np.add.at(y, inv[~pre], cents[~pre])
        return pa.table({"user_id": pa.array(uniq), "x": pa.array(x),
                         "y": pa.array(y)})

    users = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", ["x", "y"], how="isum",
    )

    def arm_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        arm = (((uid % mod) * (mult % mod)) % mod) % 2
        out = {"arm": np.arange(2, dtype=np.int64)}
        out["n"] = np.bincount(arm, minlength=2).astype(np.int64)
        # int64 np.add.at, NOT float-weighted bincount: batch sums of x*x
        # can exceed 2^53 and would silently round in float64
        for name, v in (("sx", x), ("sy", y), ("sxx", x * x), ("sxy", x * y)):
            acc = np.zeros(2, np.int64)
            np.add.at(acc, arm, v.astype(np.int64))
            out[name] = acc
        return pa.table({k: pa.array(v) for k, v in out.items()})

    agg = users.map_batches(arm_partial, batch_format="pyarrow") \
        .groupby("arm").aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"))
    rows = {int(r["arm"]): r for r in agg.take_all()}
    if 0 not in rows or 1 not in rows:
        raise ValueError("cuped_lift: an arm has no users — cannot compare")
    n_a, n_b = int(rows[0]["n"]), int(rows[1]["n"])
    sx_a, sx_b = int(rows[0]["sx"]), int(rows[1]["sx"])
    sy_a, sy_b = int(rows[0]["sy"]), int(rows[1]["sy"])
    n = n_a + n_b
    sx, sy = sx_a + sx_b, sy_a + sy_b
    sxx = int(rows[0]["sxx"]) + int(rows[1]["sxx"])
    sxy = int(rows[0]["sxy"]) + int(rows[1]["sxy"])
    den = n * sxx - sx * sx  # exact object int
    theta = float(n * sxy - sx * sy) / float(den) if den != 0 else 0.0
    xbar = float(sx) / n
    mean_raw_a = float(sy_a) / n_a
    mean_raw_b = float(sy_b) / n_b
    mean_adj_a = (float(sy_a) - theta * (float(sx_a) - n_a * xbar)) / n_a
    mean_adj_b = (float(sy_b) - theta * (float(sx_b) - n_b * xbar)) / n_b
    lift_adj = mean_adj_b - mean_adj_a
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "theta": pa.array([r6(theta)], pa.float64()),
        "mean_raw_a": pa.array([r6(mean_raw_a)], pa.float64()),
        "mean_raw_b": pa.array([r6(mean_raw_b)], pa.float64()),
        "mean_adj_a": pa.array([r6(mean_adj_a)], pa.float64()),
        "mean_adj_b": pa.array([r6(mean_adj_b)], pa.float64()),
        "lift_adj": pa.array([r6(lift_adj)], pa.float64()),
    })


ALS_SWEEPS = 2
ALS_USCALE = 10**4
ALS_VSCALE = 10**6


def als_rank1(ds, sweeps: int = ALS_SWEEPS, uscale: int = ALS_USCALE,
              vscale: int = ALS_VSCALE):
    """events -> (event_type, v): ``sweeps`` rank-1 ALS sweeps over the
    user x event-type spend matrix ``R`` (total cents) — the distributed
    matrix-factorization / recommender primitive, in EXACT integers.

    Per sweep, with the item vector ``v`` broadcast (|types| entries):
    ``u_i = floor(sum_j R_ij v_j * uscale / sum_j v_j^2)`` per user, then
    ``v_j = floor(sum_i R_ij u_i * vscale / sum_i u_i^2)`` per type — the
    alternating least-squares normal equations for rank 1, each half-step
    quantized by ONE exact floor division (the HITS renorm discipline),
    so the unrolled-CTE oracle matches bit-for-bit.  All quantities are
    nonneg, so ``//`` truncation == floor in both engines.

    Scale shape: R materializes once ((user, type) cents, ONE user-hash
    shuffle); each sweep is ONE co-partitioned pass over R — ``u`` is
    computed AND consumed inside the partition (per-type partial products
    + the u^2 partial leave, |types|+1 rows per partition); the per-type
    division runs on the driver with arbitrary-precision ints (numerator
    * vscale exceeds int64 by design; the table is |types| rows)."""
    import ray.data as rd

    types_tbl = sorted(set(
        ds.map_batches(
            lambda b: pa.table({"t": pa.array(
                list(set(b.column("event_type").to_pylist())), pa.string())}),
            batch_format="pyarrow",
        ).to_pandas()["t"]))
    t_id = {t: i for i, t in enumerate(types_tbl)}
    nt = len(types_tbl)

    def r_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        tid = np.array([t_id[t] for t in et], dtype=np.int64)
        pack = uid * nt + tid
        uniq, inv = np.unique(pack, return_inverse=True)
        r = np.zeros(len(uniq), np.int64)
        np.add.at(r, inv, cents)
        return pa.table({"key": pa.array(uniq), "r": pa.array(r)})

    from ..functions.reduce import hash_groupby

    R = hash_groupby(
        ds.map_batches(r_partial, batch_format="pyarrow"),
        "key", ["r"], how="isum",
    ).materialize()

    v = np.full(nt, vscale, dtype=object)
    for _ in range(sweeps):
        vq = [int(x) for x in v]
        den_v = sum(x * x for x in vq)

        def sweep(df: pd.DataFrame, vq=vq, den_v=den_v) -> pd.DataFrame:
            key = df["key"].to_numpy(np.int64)
            r = df["r"].to_numpy(np.int64)
            uid, tid = key // nt, key % nt
            order = np.argsort(uid, kind="stable")
            uid, tid, r = uid[order], tid[order], r[order]
            varr = np.array(vq, dtype=np.int64)
            prod = r * varr[tid]  # R_ij * v_j, int64
            uu, starts = np.unique(uid, return_index=True)
            num = np.add.reduceat(prod, starts)
            u = (num * np.int64(uscale)) // np.int64(den_v)
            urow = u[np.searchsorted(uu, uid)]
            tnum = np.zeros(nt, np.int64)
            np.add.at(tnum, tid, r * urow)
            u2 = int((u.astype(object) * u.astype(object)).sum())
            return pd.DataFrame({
                "tid": np.concatenate([np.arange(nt, dtype=np.int64),
                                       [np.int64(-1)]]),
                "num": np.concatenate([tnum, [np.int64(0)]]),
                "u2a": np.concatenate([np.zeros(nt, np.int64),
                                       [np.int64(u2)]]),
            })

        parts = hash_groupby(
            R.map_batches(_als_add_part(nt), batch_format="pyarrow",
                          batch_size=None)
            .groupby("__part")
            .map_groups(sweep),
            "tid", ["num", "u2a"], how="isum",
        ).to_pandas().sort_values("tid")
        num = {int(t): int(n) for t, n in zip(parts["tid"], parts["num"])}
        u2 = int(parts[parts["tid"] == -1]["u2a"].sum())
        if u2 == 0:
            raise ValueError("als_rank1: zero user vector — no signal")
        v = np.array([(num.get(j, 0) * vscale) // u2 for j in range(nt)],
                     dtype=object)
        # HITS-style renorm keeps v <= vscale so the next sweep's int64
        # products stay bounded (rank-1 ALS direction is scale-invariant)
        mv = max(int(x) for x in v)
        d = max(1, -(-mv // vscale))
        v = np.array([int(x) // d for x in v], dtype=object)

    return rd.from_arrow(pa.table({
        "event_type": pa.array(types_tbl, pa.string()),
        "v": pa.array([int(x) for x in v], pa.int64()),
    }))


def _als_add_part(nt: int):
    from ..functions import hashing

    # cluster-sized at factory (= pipeline build) time, like _by_user
    n_parts = default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        uid = k // nt
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(uid, n_parts)
                               .astype(np.int64)))

    return add_part


KM_CONV_TYPE = "purchase"


def km_survival(ds, conv_type: str = KM_CONV_TYPE):
    """events -> (t, n_risk, n_events, surv): the KAPLAN-MEIER survival
    curve of TIME TO FIRST CONVERSION — per user, hours from the first
    event to the first ``conv_type`` event (a death); users who never
    convert are right-CENSORED at their last observed event.  The
    standard time-to-event analysis over an event log.

    ``S(t_k) = prod_{j<=k} (1 - d_j / n_j)`` with d_j = conversions at
    t_j and n_j = users still at risk (duration >= t_j; censored users at
    the same t remain in the risk set, per convention); the prefix
    product folds left-associatively in t order, mirrored by the oracle's
    correlated ``list_reduce`` (the identical incremental fold), round6.
    Counts are exact ints.

    Scale shape: ONE user-keyed min/min/max reduce (first event, first
    conversion, last event), then a bounded (hours in range) duration
    histogram to the driver — the dense-series discipline of
    :func:`burst_hours`."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    SENT = np.iinfo(np.int64).max  # "never converted" sentinel (min-stable)

    def spans(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        first = np.full(len(uniq), SENT, np.int64)
        last = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        fconv = np.full(len(uniq), SENT, np.int64)
        np.minimum.at(first, inv, ts)
        np.maximum.at(last, inv, ts)
        conv = et == conv_type
        np.minimum.at(fconv, inv[conv], ts[conv])
        return pa.table({"user_id": pa.array(uniq), "first": pa.array(first),
                         "last": pa.array(last), "fconv": pa.array(fconv)})

    users = hash_groupby(
        ds.map_batches(spans, batch_format="pyarrow"),
        "user_id", ["first", "last", "fconv"],
        how={"first": "min", "last": "max", "fconv": "min"},
    )

    def durations(batch: pa.Table) -> pa.Table:
        f = batch.column("first").to_numpy(zero_copy_only=False)
        l = batch.column("last").to_numpy(zero_copy_only=False)
        fc = batch.column("fconv").to_numpy(zero_copy_only=False)
        cens = fc == SENT
        end = np.where(cens, l, fc)
        t = (end - f) // 3_600_000_000  # whole hours
        key = t * 2 + cens.astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    tab = hash_groupby(
        users.map_batches(durations, batch_format="pyarrow"),
        "key", ["n"], how="isum",
    ).to_pandas()
    key = tab["key"].to_numpy(np.int64)
    cnt = tab["n"].to_numpy(np.int64)
    t_all = key // 2
    cens = (key % 2).astype(bool)
    ts_sorted = np.unique(t_all)
    # at-risk at t = users with duration >= t (censored still at risk AT t)
    total_at = {int(t): 0 for t in ts_sorted}
    deaths_at = {int(t): 0 for t in ts_sorted}
    for t, c, n in zip(t_all, cens, cnt):
        total_at[int(t)] += int(n)
        if not c:
            deaths_at[int(t)] += int(n)
    n_users = int(cnt.sum())
    out_t, out_r, out_d, out_s = [], [], [], []
    at_risk = n_users
    surv = 1.0
    first = True
    for t in ts_sorted.tolist():
        d = deaths_at[t]
        if d > 0:
            f = 1.0 - d / at_risk
            surv = f if first else surv * f
            first = False
            out_t.append(t)
            out_r.append(at_risk)
            out_d.append(d)
            out_s.append(float(np.floor(surv * 1e6 + 0.5) / 1e6))
        at_risk -= total_at[t]
    return rd.from_arrow(pa.table({
        "t": pa.array(out_t, pa.int64()),
        "n_risk": pa.array(out_r, pa.int64()),
        "n_events": pa.array(out_d, pa.int64()),
        "surv": pa.array(out_s, pa.float64()),
    }))


def seasonality_profile(ds):
    """events -> 24 rows (how, n_hours, cnt_sum, mean_micro): the
    HOUR-OF-DAY seasonal profile of the event stream over the DENSE
    hourly series — missing hours count as zero (they ARE data, the
    :func:`burst_hours` discipline), which is what makes this different
    from a plain GROUP BY hour(ts): an hour-of-day that the crawl never
    hits still divides by its full slot count.

    EXACT: ``mean_micro = cnt_sum * 1e6 // n_hours`` (integer floor
    division, no float).  Scale shape: ONE bounded hour-keyed count
    reduce; the dense fold is 24-slot driver arithmetic."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("seasonality_profile: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[hs - lo] = hist["cnt"].to_numpy(np.int64)
    how = (lo + np.arange(len(dense), dtype=np.int64)) % 24
    n_slots = np.bincount(how, minlength=24).astype(np.int64)
    sums = np.zeros(24, np.int64)
    np.add.at(sums, how, dense)
    mean_micro = np.where(n_slots > 0,
                          (sums * np.int64(10**6)) // np.maximum(n_slots, 1),
                          0)
    return rd.from_arrow(pa.table({
        "how": pa.array(np.arange(24, dtype=np.int64)),
        "n_hours": pa.array(n_slots),
        "cnt_sum": pa.array(sums),
        "mean_micro": pa.array(mean_micro.astype(np.int64)),
    }))


XCORR_TYPES = ("click", "purchase")
XCORR_MAX_LAG = 3


def cross_correlation(ds, types: tuple[str, str] = XCORR_TYPES,
                      max_lag: int = XCORR_MAX_LAG):
    """events -> (lag, m, corr): the CROSS-CORRELATION between two event
    types' dense hourly count series at lags ``-max_lag..max_lag`` —
    "do clicks lead purchases?", the signal-processing sibling of
    :func:`event_autocorr` (corr(a_t, b_{t+lag}) over the overlap).

    EXACT moments (m, Sa, Sb, Sab, Saa, Sbb) in arbitrary-precision ints
    per lag, cleared of the rational means; the one float expression is
    ``(m*Sab - Sa*Sb) / (sqrt(m*Saa - Sa^2) * sqrt(m*Sbb - Sb^2))`` with
    IEEE sqrt, shared verbatim with the oracle, round6 (0.0 when either
    variance is zero).  Scale shape: ONE bounded (type, hour) count
    reduce; the lag loop is driver arithmetic on the bounded dense
    series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    ta, tb = types

    def counts(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        keep = (et == ta) | (et == tb)
        hh = h[keep]
        is_b = (et[keep] == tb).astype(np.int64)
        key = hh * 2 + is_b
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "key", ["cnt"], how="isum",
    ).to_pandas()
    if len(hist) == 0:
        raise ValueError(f"cross_correlation: no {ta}/{tb} events")
    key = hist["key"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    hr = key // 2
    lo, hi = int(hr.min()), int(hr.max())
    n = hi - lo + 1
    a = np.zeros(n, np.int64)
    b = np.zeros(n, np.int64)
    is_b = (key % 2).astype(bool)
    a[hr[~is_b] - lo] = cnt[~is_b]
    b[hr[is_b] - lo] = cnt[is_b]
    out_lag, out_m, out_c = [], [], []
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    import math
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            av, bv = a[: n - lag], b[lag:]
        else:
            av, bv = a[-lag:], b[: n + lag]
        m = len(av)
        sa, sb = int(av.sum()), int(bv.sum())
        sab = int((av.astype(object) * bv.astype(object)).sum())
        saa = int((av.astype(object) * av.astype(object)).sum())
        sbb = int((bv.astype(object) * bv.astype(object)).sum())
        da = m * saa - sa * sa
        db = m * sbb - sb * sb
        if m == 0 or da == 0 or db == 0:
            c = 0.0
        else:
            c = float(m * sab - sa * sb) / (
                math.sqrt(float(da)) * math.sqrt(float(db)))
        out_lag.append(lag)
        out_m.append(m)
        out_c.append(r6(c))
    return rd.from_arrow(pa.table({
        "lag": pa.array(out_lag, pa.int64()),
        "m": pa.array(out_m, pa.int64()),
        "corr": pa.array(out_c, pa.float64()),
    }))


MARKOV_STEPS = 8
MARKOV_SCALE = 10**6


def markov_stationary(ds, steps: int = MARKOV_STEPS,
                      scale: int = MARKOV_SCALE):
    """events -> (event_type, pi): the (approximate) STATIONARY
    DISTRIBUTION of the event-type Markov chain — ``steps`` exact-integer
    power-iteration steps of pi' = pi P over the transition counts of
    :func:`event_transitions`, the "where does user behavior settle"
    readout.

    EXACT: each step's term is the FLOORED rational
    ``(pi_i * n_ij) // r_i`` (r_i = row total), summed per destination in
    pure ints, then ceil-shift renormalized to ``scale`` (the HITS
    discipline) — so the unrolled-CTE oracle matches bit-for-bit.  Types
    with no outgoing transitions drop out of the chain (their mass is
    redistributed by the renorm), a documented convention shared with the
    oracle's inner join.

    Scale shape: the distributed work is the bounded |types|^2 transition
    count reduce; the iteration runs on that driver-side matrix."""
    import ray.data as rd

    counts = event_transitions(ds).to_pandas()  # (from_type, to_type, n, ...)
    frm = counts["from_type"].to_numpy()
    to = counts["to_type"].to_numpy()
    n = counts["n"].to_numpy(np.int64)
    types = sorted(set(frm) | set(to))
    tid = {t: i for i, t in enumerate(types)}
    fi = np.array([tid[t] for t in frm], np.int64)
    ti = np.array([tid[t] for t in to], np.int64)
    r = np.zeros(len(types), dtype=object)
    for i, c in zip(fi, n):
        r[i] += int(c)
    pi = np.full(len(types), int(scale), dtype=object)
    for _ in range(steps):
        w = np.zeros(len(types), dtype=object)
        for i, j, c in zip(fi, ti, n):
            w[j] += (int(pi[i]) * int(c)) // int(r[i])
        mx = max(int(x) for x in w) if len(w) else 0
        d = max(1, -(-mx // int(scale)))
        pi = np.array([int(x) // d for x in w], dtype=object)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "pi": pa.array([int(x) for x in pi], pa.int64()),
    }))


HAAR_LEVELS = 10  # 2^10 = 1024 hourly slots (~6 weeks)


def haar_energy(ds, levels: int = HAAR_LEVELS):
    """events -> (level, n_coeffs, energy): the unnormalized HAAR WAVELET
    energy spectrum of the dense hourly event-count series — per dyadic
    level j, ``sum of (a - b)^2`` over the level's pair differences
    (smooth channel ``a + b`` cascades up).  Level 1 = hour-to-hour
    roughness, high levels = day/week-scale structure: the multi-scale
    decomposition a traffic monitor reads next to :func:`event_autocorr`
    and :func:`cross_correlation`.

    EXACT: the series is zero-padded to ``2^levels`` slots and every
    coefficient is a pure integer (unnormalized Haar needs no sqrt2 —
    the 2^j normalization is a deterministic constant the reader can
    apply); energies are exact int sums, HUGEINT in the oracle.  Raises
    if the span exceeds the padded length (documented cap — raise
    ``levels`` for longer windows).  Scale shape: ONE bounded hour-keyed
    count reduce; the cascade is driver arithmetic on 2^levels ints."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("haar_energy: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo = int(hs[0])
    span = int(hs[-1]) - lo + 1
    N = 1 << levels
    if span > N:
        raise ValueError(
            f"haar_energy: span {span}h exceeds 2^{levels} slots — raise "
            "levels")
    s = np.zeros(N, dtype=object)
    s[hs - lo] = hist["cnt"].to_numpy(np.int64)
    out_lvl, out_n, out_e = [], [], []
    for j in range(1, levels + 1):
        a, b = s[0::2], s[1::2]
        d = a - b
        s = a + b
        out_lvl.append(j)
        out_n.append(len(d))
        out_e.append(int((d * d).sum()))
    return rd.from_arrow(pa.table({
        "level": pa.array(out_lvl, pa.int64()),
        "n_coeffs": pa.array(out_n, pa.int64()),
        "energy": pa.array(out_e, pa.int64()),
    }))


def type_burstiness(ds):
    """events -> (event_type, n_hours, total, fano): per-type BURSTINESS
    of the dense hourly count series — the Fano factor ``var/mean`` (1 =
    Poisson; > 1 = bursty, < 1 = regular), computed per event type over
    the GLOBAL hour range (missing hours are zeros for every type, so
    types are comparable).

    EXACT moments: with n = slot count, S1 = total, S2 = sum of squares,
    ``fano = (n*S2 - S1^2) / (n * S1)`` — one float division of two
    arbitrary-precision integers, round6 (the population-variance/mean
    identity cleared of rational means).  Scale shape: ONE bounded
    (type, hour) count reduce; the moment pass is |types| x |hours|
    driver arithmetic."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        df = pd_.DataFrame({"t": et, "h": h})
        g = df.groupby(["t", "h"], sort=True).size().reset_index(name="c")
        return pa.table({"t": pa.array(g["t"], pa.string()),
                         "h": pa.array(g["h"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    raw = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["t", "h"])
        .sum("c")
    ).to_pandas()
    if len(raw) == 0:
        raise ValueError("type_burstiness: no events")
    raw = raw.rename(columns={"sum(c)": "c"})
    lo, hi = int(raw["h"].min()), int(raw["h"].max())
    n = hi - lo + 1
    out_t, out_n, out_s1, out_f = [], [], [], []
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    for t, grp in raw.groupby("t", sort=True):
        c = grp["c"].to_numpy(np.int64)
        s1 = int(c.sum())
        s2 = int((c.astype(object) * c.astype(object)).sum())
        fano = float(n * s2 - s1 * s1) / float(n * s1)
        out_t.append(str(t))
        out_n.append(n)
        out_s1.append(s1)
        out_f.append(r6(fano))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "n_hours": pa.array(out_n, pa.int64()),
        "total": pa.array(out_s1, pa.int64()),
        "fano": pa.array(out_f, pa.float64()),
    }))


THEIL_MAX_DAYS = 30


def theil_sen_trend(ds, max_days: int = THEIL_MAX_DAYS):
    """events -> ONE row (n_days, n_pairs, slope): the THEIL-SEN robust
    trend of the dense DAILY event-count series — the median of all
    pairwise slopes ``(y_j - y_i)/(j - i)``, the outlier-immune
    alternative to the OLS trend (one crawler outage day cannot bend it).

    EXACT median of RATIONALS: every slope is scaled by ``L = lcm(1..D-1)``
    (D <= ``max_days`` + 1 dense days; L(30) ~ 2.3e12 fits int64) so the
    candidate set is pure integers with a total order — no float enters
    the selection.  ``slope = round6(med2 / (2 * L))`` where ``med2`` is
    the middle value doubled (odd count) or the sum of the two middles
    (even), ONE shared float division.  Scale shape: one bounded
    day-keyed count reduce; the O(D^2) pair set (<= 465 rows) is driver
    arithmetic."""
    import ray.data as rd

    from math import gcd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "d", ["cnt"], how="isum",
    ).to_pandas().sort_values("d")
    if len(hist) == 0:
        raise ValueError("theil_sen_trend: no events")
    dd = hist["d"].to_numpy(np.int64)
    lo, hi = int(dd[0]), int(dd[-1])
    D = hi - lo + 1
    if D - 1 > max_days:
        raise ValueError(
            f"theil_sen_trend: {D} days exceeds max_days={max_days} — the "
            "lcm scale would overflow; bucket to weeks first")
    y = np.zeros(D, dtype=np.int64)
    y[dd - lo] = hist["cnt"].to_numpy(np.int64)
    # FIXED scale L = lcm(1..max_days) (constant, shared with the oracle —
    # a data-dependent lcm could not be interpolated into the SQL)
    L = 1
    for i in range(1, max_days + 1):
        L = L * i // gcd(L, i)
    slopes = []
    for i in range(D):
        for j in range(i + 1, D):
            slopes.append((int(y[j]) - int(y[i])) * (L // (j - i)))
    slopes.sort()
    n_pairs = len(slopes)
    if n_pairs == 0:
        raise ValueError("theil_sen_trend: need >= 2 days")
    if n_pairs % 2 == 1:
        med2 = 2 * slopes[n_pairs // 2]
    else:
        med2 = slopes[n_pairs // 2 - 1] + slopes[n_pairs // 2]
    slope = float(med2) / float(2 * L)
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_days": pa.array([D], pa.int64()),
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "slope": pa.array([r6(slope)], pa.float64()),
    }))


def hot_runs(ds):
    """events -> (run_start, run_len): the ISLANDS of the hourly series —
    maximal runs of consecutive hours whose count clears the exact series
    mean (``x*n >= S1``), ordered by start hour.  The gaps-and-islands
    pattern (SQL: row_number difference groups) over the same dense
    zero-filled series as :func:`burst_hours` — "how long do hot periods
    last", complementing the per-hour flags.

    EXACT integer threshold and run arithmetic; scale shape: one bounded
    hour-keyed reduce, the run-length pass is a vectorized np.diff on the
    bounded dense series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("hot_runs: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[hs - lo] = hist["cnt"].to_numpy(np.int64)
    n = len(x)
    s1 = int(x.sum())
    hot = (x.astype(object) * n >= s1)
    hot = np.asarray(hot, dtype=bool)
    padded = np.concatenate([[False], hot, [False]])
    d = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return rd.from_arrow(pa.table({
        "run_start": pa.array((lo + starts).astype(np.int64)),
        "run_len": pa.array((ends - starts).astype(np.int64)),
    }))


def mann_kendall(ds):
    """events -> ONE row (n_days, s, var4, z): the MANN-KENDALL trend
    TEST over the dense daily count series — ``S = sum over pairs of
    sign(y_j - y_i)``, the non-parametric "is there a monotone trend"
    significance companion to :func:`theil_sen_trend`'s slope.

    EXACT: S is an integer; the tie-corrected variance is rational with
    denominator 18 — ``var18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)`` is the
    exact integer ``18*Var`` (no division before the final z);
    ``z = (S -+ 1) / sqrt(var18 / 18.0)`` with the continuity correction,
    one shared float expression, round6.  Scale shape: one bounded
    day-keyed reduce; the O(D^2) pair scan is driver arithmetic on <= 31
    days (the dense-series discipline)."""
    import math

    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "d", ["cnt"], how="isum",
    ).to_pandas().sort_values("d")
    if len(hist) == 0:
        raise ValueError("mann_kendall: no events")
    dd = hist["d"].to_numpy(np.int64)
    lo, hi = int(dd[0]), int(dd[-1])
    D = hi - lo + 1
    y = np.zeros(D, dtype=np.int64)
    y[dd - lo] = hist["cnt"].to_numpy(np.int64)
    s = 0
    for i in range(D):
        for j in range(i + 1, D):
            v = int(y[j]) - int(y[i])
            s += (v > 0) - (v < 0)
    # tie groups over the VALUE domain
    _, tcnt = np.unique(y, return_counts=True)
    tie_term = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tcnt)
    var18 = D * (D - 1) * (2 * D + 5) - tie_term  # 18 * Var, exact
    if var18 <= 0:
        z = 0.0
    else:
        var = var18 / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_days": pa.array([D], pa.int64()),
        "s": pa.array([s], pa.int64()),
        "var18": pa.array([var18], pa.int64()),
        "z": pa.array([r6(z)], pa.float64()),
    }))


DFT_HARMONICS = (1, 2, 3)
#: cos/sin of 2*pi*k/24 quantized to micro-units ONCE here — both the
#: engine kernel and the SQL oracle interpolate THIS table, so the
#: integer dot products agree bit-for-bit.
DFT_COS24 = tuple(int(np.floor(np.cos(2 * np.pi * k / 24) * 1e6 + 0.5))
                  for k in range(24))
DFT_SIN24 = tuple(int(np.floor(np.sin(2 * np.pi * k / 24) * 1e6 + 0.5))
                  for k in range(24))


def dft_power24(ds, harmonics: tuple[int, ...] = DFT_HARMONICS):
    """events -> one row per harmonic (harmonic, n, re, im, amp_ratio):
    the DIURNAL SPECTRUM — discrete-Fourier power of the event stream at
    1, 2 and 3 cycles/day, the quantitative companion to
    :func:`seasonality_profile` (the profile shows the shape; the
    harmonic amplitudes say how MUCH of the traffic is periodic and
    whether the day has one peak or two).

    EXACT integer dot products: each event at epoch-hour h contributes
    the micro-unit table entries ``DFT_COS24[(h*m) % 24]`` /
    ``DFT_SIN24[(h*m) % 24]`` (quantized ONCE, shared with the oracle),
    so re/im are order-free int sums; ``amp_ratio = sqrt(re^2 + im^2) /
    (n * 1e6)`` is the one float tree (the normalized amplitude in
    [0, ~1]).  Missing hours contribute nothing to a sum, so the dense
    series is implicit.  Scale shape: per-batch 3-row partials -> one
    |harmonics|-keyed reduce; nothing per-event leaves a partition."""
    import math

    import ray.data as rd

    from ..functions.reduce import hash_groupby

    cos_t = np.array(DFT_COS24, dtype=np.int64)
    sin_t = np.array(DFT_SIN24, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        ms, res, ims, ns = [], [], [], []
        for m in harmonics:
            ph = (h * m) % 24
            ms.append(m)
            res.append(int(cos_t[ph].sum()))
            ims.append(int(sin_t[ph].sum()))
            ns.append(len(h))
        return pa.table({"m": pa.array(ms, pa.int64()),
                         "re": pa.array(res, pa.int64()),
                         "im": pa.array(ims, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "m", ["re", "im", "n"], how="isum",
    ).to_pandas().sort_values("m")
    if agg.empty:
        raise ValueError("dft_power24: no events")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    amp = [r6(math.sqrt(float(int(re) * int(re) + int(im) * int(im)))
              / float(int(n) * 10**6))
           for re, im, n in zip(agg["re"], agg["im"], agg["n"])]
    return rd.from_arrow(pa.table({
        "harmonic": pa.array(agg["m"].to_numpy(np.int64)),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "re": pa.array(agg["re"].to_numpy(np.int64)),
        "im": pa.array(agg["im"].to_numpy(np.int64)),
        "amp_ratio": pa.array(amp, pa.float64()),
    }))


def holt_linear(ds):
    """events -> ONE row (n_days, level, trend, forecast): HOLT'S LINEAR
    (double exponential) smoothing of the dense daily count series with
    alpha = beta = 1/2 — the one-step-ahead load forecast a crawl
    scheduler runs nightly; the trend-aware upgrade of the plain EMA
    (:func:`ema_win`).

    EXACT integers throughout the recursion: with l_1 = y_1, b_1 =
    y_2 - y_1 and both states scaled by 4^(t-1) —
    ``L_t = 2^(2t-3) * y_t + 2*(L_{t-1} + B_{t-1})`` and
    ``B_t = 2^(2t-4) * y_t - L_{t-1} + 3*B_{t-1}`` — halvings never
    divide (power-of-two denominators are carried, Python bigints /
    HUGEINT); level/trend/forecast each divide ONCE at the end, round6.
    The oracle runs the identical recursion as a recursive CTE with
    HUGEINT shifts.  Scale shape: one bounded day-keyed count reduce;
    the recursion is driver arithmetic on <= |days| slots (the dense-
    series discipline — missing days are zeros and move the forecast).
    Denominator bound: 4^(days-1) needs HUGEINT headroom, fine for
    month-scale windows; re-base the scaling for year-long series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "d", ["cnt"], how="isum",
    ).to_pandas().sort_values("d")
    if len(hist) == 0:
        raise ValueError("holt_linear: no events")
    dd = hist["d"].to_numpy(np.int64)
    lo, hi = int(dd[0]), int(dd[-1])
    T = hi - lo + 1
    if T < 2:
        raise ValueError("holt_linear: need at least 2 days")
    y = np.zeros(T, dtype=np.int64)
    y[dd - lo] = hist["cnt"].to_numpy(np.int64)
    L, B = int(y[0]), int(y[1]) - int(y[0])
    for t in range(2, T + 1):  # 1-indexed day t
        yt = int(y[t - 1])
        L, B = ((1 << (2 * t - 3)) * yt + 2 * (L + B),
                (1 << (2 * t - 4)) * yt - L + 3 * B)
    den = 1 << (2 * (T - 1))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_days": pa.array([T], pa.int64()),
        "level": pa.array([r6(float(L) / float(den))], pa.float64()),
        "trend": pa.array([r6(float(B) / float(den))], pa.float64()),
        "forecast": pa.array([r6(float(L + B) / float(den))], pa.float64()),
    }))


def trigram_transitions(ds, min_n: int = 2):
    """events -> (t1, t2, t3, n): the SECOND-ORDER Markov transition
    counts — every three consecutive events of a user in (ts, event_id)
    order — the sequence-mining upgrade of :func:`event_transitions`
    (first-order chains can't see "view -> click -> purchase" vs
    "click -> view -> purchase"); rows below ``min_n`` are pruned (the
    support threshold of frequent-sequence mining).

    Scale shape: the shared coarse user shuffle; each partition emits
    its PRE-AGGREGATED |types|^3-bounded count table (two same-user
    shifted-array guards, never a triple stream), then one bounded
    three-key reduce."""
    from ray.data.aggregate import Sum

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        new_user, _, _ = _user_segments(uid)
        # position i anchors (i-2, i-1, i): needs both i and i-1 to be
        # non-segment-starts
        ok = ~new_user.copy()
        ok[1:] &= ~new_user[:-1]
        keep = np.flatnonzero(ok)
        keep = keep[keep >= 2]
        types, codes = np.unique(et, return_inverse=True)
        T = np.int64(len(types))
        key = (codes[keep - 2].astype(np.int64) * T * T
               + codes[keep - 1].astype(np.int64) * T + codes[keep])
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "t1": types[uk // (T * T)],
            "t2": types[(uk // T) % T],
            "t3": types[uk % T],
            "n": cnt.astype(np.int64),
        })

    def prune(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(n >= min_n))

    return (
        _by_user(ds, solve)
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
        .sort(["t1", "t2", "t3"])
    )


MAD_K = 3


def mad_outlier_days(ds, k: int = MAD_K):
    """events -> (day, cnt, dev, med, mad): ROBUST daily anomaly
    detection over the dense daily count series — days where
    ``|cnt - median| > k * MAD`` (median absolute deviation), the
    outlier rule that a single crawler-gone-wild day cannot poison,
    unlike :func:`burst_hours`' mean+sigma (one huge day inflates sigma
    and hides itself).

    EXACT integers end to end: both medians use the rank
    ``floor((n-1)*0.5)`` rule on sorted values (the
    :func:`~.sketch.robust_stats` definition), deviations and the
    ``k * MAD`` comparison never touch floats, and missing days are
    zeros (the dense-series discipline).  Scale shape: one bounded
    day-keyed count reduce; the scan is driver arithmetic on the dense
    series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "d", ["cnt"], how="isum",
    ).to_pandas().sort_values("d")
    if len(hist) == 0:
        raise ValueError("mad_outlier_days: no events")
    dd = hist["d"].to_numpy(np.int64)
    lo, hi = int(dd[0]), int(dd[-1])
    T = hi - lo + 1
    y = np.zeros(T, dtype=np.int64)
    y[dd - lo] = hist["cnt"].to_numpy(np.int64)
    med = int(np.sort(y)[(T - 1) // 2])
    dev = np.abs(y - med)
    mad = int(np.sort(dev)[(T - 1) // 2])
    out = np.flatnonzero(dev > k * mad)
    return rd.from_arrow(pa.table({
        "day": pa.array(lo + out),
        "cnt": pa.array(y[out]),
        "dev": pa.array(dev[out]),
        "med": pa.array(np.full(len(out), med, np.int64)),
        "mad": pa.array(np.full(len(out), mad, np.int64)),
    }))


def path_entropy(ds):
    """events -> (user_id, n_events, n_types, h_micro): per-user
    BEHAVIORAL DIVERSITY — the Shannon entropy of each user's
    event-type distribution in micro-nats, the single-number "does this
    account do one thing or many" feature behind bot filtering and
    engagement segmentation.

    Float discipline (the :func:`~.triangles.adamic_adar` trick): each
    type's term is quantized ONCE —
    ``floor(-(c/n) * ln(c/n) * 1e6 + 0.5)`` int64 — so the per-user
    entropy is a pure INTEGER sum, order-independent across engines.
    Scale shape: the shared coarse user shuffle, per-partition
    vectorized segmented solve (sort by (user, type), one np.add.at) —
    never per-user Python."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        _, tcode = np.unique(et, return_inverse=True)
        order = np.lexsort((tcode, uid))
        uid, tcode = uid[order], tcode[order].astype(np.int64)
        key = uid * np.int64(1 << 16) + tcode
        uk, counts = np.unique(key, return_counts=True)
        users = uk >> np.int64(16)
        uu, inv = np.unique(users, return_inverse=True)
        n_ev = np.zeros(len(uu), np.int64)
        np.add.at(n_ev, inv, counts)
        p = counts.astype(np.float64) / n_ev[inv].astype(np.float64)
        terms = np.floor(-p * np.log(p) * 1e6 + 0.5).astype(np.int64)
        h = np.zeros(len(uu), np.int64)
        np.add.at(h, inv, terms)
        n_ty = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        return pd.DataFrame({"user_id": uu, "n_events": n_ev,
                             "n_types": n_ty, "h_micro": h})

    return _by_user(ds, solve).sort("user_id")


def forecast_backtest(ds):
    """events -> 3 rows (model, n_preds, sum_abs_err, mae, mase): a
    ONE-STEP-AHEAD BACKTEST of the three naive forecasters over the
    dense hourly count series — ``last_value`` (y_hat = y_{t-1}),
    ``seasonal_24`` (y_hat = y_{t-24}) and ``drift2`` (y_hat =
    2*y_{t-1} - y_{t-2}) — scored where every input lag exists.  MASE
    (error relative to last_value) is THE scale-free forecast metric;
    this is the evaluation harness a forecasting stage (e.g.
    :func:`holt_linear`) is judged against.

    EXACT: absolute errors are integers (drift2's prediction is an
    integer expression), summed order-free; mae / mase divide once
    each, round6.  All three models score over the SAME prediction
    window (t >= 24), so their counts match and MASE is comparable.
    Scale shape: one bounded hour-keyed count reduce; the backtest is
    driver arithmetic on the dense series."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "h", ["cnt"], how="isum",
    ).to_pandas().sort_values("h")
    if len(hist) == 0:
        raise ValueError("forecast_backtest: no events")
    hs = hist["h"].to_numpy(np.int64)
    lo, hi = int(hs[0]), int(hs[-1])
    T = hi - lo + 1
    if T < 26:
        raise ValueError("forecast_backtest: need > 25 dense hours")
    y = np.zeros(T, dtype=np.int64)
    y[hs - lo] = hist["cnt"].to_numpy(np.int64)
    t = np.arange(24, T)
    preds = {
        "drift2": 2 * y[t - 1] - y[t - 2],
        "last_value": y[t - 1],
        "seasonal_24": y[t - 24],
    }
    base = int(np.abs(y[t] - preds["last_value"]).sum())
    if base == 0:
        raise ValueError("forecast_backtest: constant series")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"model": [], "n_preds": [], "sum_abs_err": [], "mae": [],
            "mase": []}
    for name in sorted(preds):
        e = int(np.abs(y[t] - preds[name]).sum())
        rows["model"].append(name)
        rows["n_preds"].append(len(t))
        rows["sum_abs_err"].append(e)
        rows["mae"].append(r6(float(e) / float(len(t))))
        rows["mase"].append(r6(float(e) / float(base)))
    return rd.from_arrow(pa.table({
        "model": pa.array(rows["model"], pa.string()),
        "n_preds": pa.array(rows["n_preds"], pa.int64()),
        "sum_abs_err": pa.array(rows["sum_abs_err"], pa.int64()),
        "mae": pa.array(rows["mae"], pa.float64()),
        "mase": pa.array(rows["mase"], pa.float64()),
    }))


def event_doc_join(events_ds, sf_dir: str):
    """events ⋈ documents -> (lang, n_events, n_docs, sum_cents): the
    CROSS-TABLE enrichment join — each event's JSON ``props`` carries a
    document reference ``{"k": <doc_id>}``; extract it, broadcast-join
    the (bounded) documents dimension, and roll event counts / distinct
    referenced docs / exact cent totals up to the document's language.
    The "clickstream joined to content metadata" report every web
    pipeline runs.

    Scale shape: the dimension is ``ray.put`` ONCE (the
    :func:`events_by_segment` discipline — never re-shipped per batch);
    extraction is one vectorized regexp; partials are |langs|-bounded
    with a per-partial distinct-doc BITSET (docs are the bounded
    500-row table, so a (lang, doc) dedup rides as exact per-batch
    distinct pairs).  Cents are exact ``floor(value*100 + 0.5)``
    integers."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = pq_.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "lang"]).combine_chunks()
    did = docs.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lang = np.asarray(docs.column("lang").to_pylist(), dtype=object)
    order = np.argsort(did, kind="stable")
    dim_ref = ray.put((did[order], lang[order]))

    def partial(batch: pa.Table) -> pa.Table:
        dids, langs = ray.get(dim_ref)
        k = pc_.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        ks = pc_.struct_field(k, "k")
        valid = pc_.is_valid(ks).to_numpy(zero_copy_only=False)
        kk = np.where(valid,
                      pc_.cast(ks, pa.int64()).fill_null(0)
                      .to_numpy(zero_copy_only=False), -1).astype(np.int64)
        pos = np.minimum(np.searchsorted(dids, kk),
                         max(len(dids) - 1, 0))
        hit = valid & (len(dids) > 0) & (dids[pos] == kk)
        cents = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        lg = langs[pos[hit]]
        cc = cents[hit]
        dd = kk[hit]
        df = pd.DataFrame({"lang": lg, "doc": dd, "cents": cc})
        g = df.groupby(["lang", "doc"], sort=False).agg(
            n=("cents", "size"), s=("cents", "sum")).reset_index()
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "doc": pa.array(g["doc"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s": pa.array(g["s"].to_numpy(np.int64)),
        })

    pairs = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "doc"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    ).to_pandas()
    if pairs.empty:
        raise ValueError("event_doc_join: no joinable events")
    rows = {"lang": [], "n_events": [], "n_docs": [], "sum_cents": []}
    for lg, grp in pairs.groupby("lang", sort=True):
        rows["lang"].append(lg)
        rows["n_events"].append(int(grp["n"].sum()))
        rows["n_docs"].append(len(grp))
        rows["sum_cents"].append(int(grp["s"].sum()))
    return rd.from_arrow(pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "n_events": pa.array(rows["n_events"], pa.int64()),
        "n_docs": pa.array(rows["n_docs"], pa.int64()),
        "sum_cents": pa.array(rows["sum_cents"], pa.int64()),
    }))


def transition_dwell(ds):
    """events -> (from_type, to_type, n, total_gap_us, mean_gap_us): the
    TIME-WEIGHTED transition matrix — for every consecutive same-user
    event pair, how long the user dwelt on ``from_type`` before moving
    to ``to_type``.  :func:`event_transitions` says where users go;
    this says how fast — the input to dwell-time Markov models and
    engagement scoring.

    EXACT: gaps are integer microseconds summed order-free;
    ``mean_gap_us = total // n`` is FLOOR division (no float).  Scale
    shape: identical to :func:`event_transitions` — pre-aggregated
    |types|^2 partials on the shared coarse user shuffle."""
    from ray.data.aggregate import Sum

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        new_user, _, _ = _user_segments(uid)
        keep = np.flatnonzero(~new_user)
        gaps = ts[keep] - ts[keep - 1]
        types, codes = np.unique(et, return_inverse=True)
        key = codes[keep - 1].astype(np.int64) * len(types) + codes[keep]
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, gaps)
        return pd.DataFrame({
            "from_type": types[uk // len(types)],
            "to_type": types[uk % len(types)],
            "n": n,
            "g": tot,
        })

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        g = batch.column("g").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "from_type": batch.column("from_type"),
            "to_type": batch.column("to_type"),
            "n": pa.array(n),
            "total_gap_us": pa.array(g),
            "mean_gap_us": pa.array(g // n),
        })

    return (
        _by_user(ds, solve)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("g", alias_name="g"))
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
        .sort(["from_type", "to_type"])
    )


ACTIVE_WINDOW_US = 5 * 60 * 1_000_000


def active_time(ds, window_us: int = ACTIVE_WINDOW_US):
    """events -> (user_id, n_spans, active_us): per-user ACTIVE TIME —
    the measure of the UNION of [ts, ts + window) intervals, the
    engagement-minutes metric that double-counts nothing no matter how
    events cluster (a burst of 50 events in one minute is ~6 active
    minutes, not 250).  The interval-union primitive behind billing
    and engagement dashboards.

    EXACT integer microseconds: within each user's sorted timestamps a
    new span starts where ``gap > window`` (the sessionize rule);
    covered time = sum over spans of (last - first + window).  Scale
    shape: the shared coarse user shuffle, one vectorized segmented
    sweep (sort + diff + boundary flags) per partition — never per-user
    Python."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user, _, _ = _user_segments(uid)
        gap = np.empty(len(ts), np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_span = new_user | (gap > window_us)
        span_id = np.cumsum(new_span) - 1
        n_sp = int(span_id[-1]) + 1 if len(span_id) else 0
        first = np.full(n_sp, np.iinfo(np.int64).max, np.int64)
        last = np.full(n_sp, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(first, span_id, ts)
        np.maximum.at(last, span_id, ts)
        span_user = uid[np.flatnonzero(new_span)]
        dur = last - first + window_us
        uu, inv = np.unique(span_user, return_inverse=True)
        n_spans = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        act = np.zeros(len(uu), np.int64)
        np.add.at(act, inv, dur)
        return pd.DataFrame({"user_id": uu, "n_spans": n_spans,
                             "active_us": act})

    return _by_user(ds, solve).sort("user_id")


def bounce_rate(ds, gap_us: int = SESSION_GAP_US):
    """events -> (day, n_sessions, n_bounce, rate): per-day BOUNCE RATE
    — the share of sessions (the :func:`sessionize` 30-min-gap rule)
    containing exactly ONE event, keyed by the session's START day.
    The classic engagement-health KPI over the sessionized stream.

    EXACT: session boundaries and single-event flags are integer tests;
    one round6 division per day.  Scale shape: the shared coarse user
    shuffle; each partition emits a bounded (day, partial) table from
    one segmented sweep."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user, _, _ = _user_segments(uid)
        gap = np.empty(len(ts), np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = new_user | (gap > gap_us)
        sess_id = np.cumsum(new_sess) - 1
        n_sess = int(sess_id[-1]) + 1 if len(sess_id) else 0
        size = np.bincount(sess_id, minlength=n_sess)
        start = ts[np.flatnonzero(new_sess)]
        day = start // 86_400_000_000
        uniq, inv = np.unique(day, return_inverse=True)
        tot = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        bounce = np.zeros(len(uniq), np.int64)
        np.add.at(bounce, inv, (size == 1).astype(np.int64))
        return pd.DataFrame({"day": uniq, "n_sessions": tot,
                             "n_bounce": bounce})

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_sessions").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = batch.column("n_bounce").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rate = np.floor(b.astype(np.float64) / n.astype(np.float64)
                        * 1e6 + 0.5) / 1e6
        return pa.table({"day": batch.column("day"),
                         "n_sessions": pa.array(n),
                         "n_bounce": pa.array(b),
                         "rate": pa.array(rate)})

    return (
        _by_user(ds, solve)
        .groupby("day")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                   Sum("n_bounce", alias_name="n_bounce"))
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
        .sort("day")
    )


def returning_users(ds):
    """events -> (day, dau, ret_users, rate): per-day ACTIVE USERS and
    the share who were ALSO active the previous calendar day — the
    day-over-day retention KPI (stickiness) next to
    :func:`cohort_retention`'s cohort matrix.

    EXACT: activity is a (user, day) dedup; "ret_users" is the integer
    test ``day - prev_active_day == 1`` inside each user's sorted day
    list.  Scale shape: the shared coarse user shuffle; each partition
    emits bounded (day, dau_partial, returning_partial) rows from one
    segmented diff — never the (user, day) stream."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        day = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        key = uid * np.int64(1 << 20) + day  # days since epoch < 2^20
        uk = np.unique(key)
        u = uk >> np.int64(20)
        d = uk & np.int64((1 << 20) - 1)
        new_user = np.empty(len(u), bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        ret = np.zeros(len(u), np.int64)
        ret[1:] = ((~new_user[1:]) & (d[1:] - d[:-1] == 1)).astype(np.int64)
        uniq, inv = np.unique(d, return_inverse=True)
        dau = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        rr = np.zeros(len(uniq), np.int64)
        np.add.at(rr, inv, ret)
        return pd.DataFrame({"day": uniq, "dau": dau, "ret_users": rr})

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("dau").to_numpy(
            zero_copy_only=False).astype(np.int64)
        r = batch.column("ret_users").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rate = np.floor(r.astype(np.float64) / n.astype(np.float64)
                        * 1e6 + 0.5) / 1e6
        return pa.table({"day": batch.column("day"), "dau": pa.array(n),
                         "ret_users": pa.array(r), "rate": pa.array(rate)})

    return (
        _by_user(ds, solve)
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"),
                   Sum("ret_users", alias_name="ret_users"))
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
        .sort("day")
    )


DECAY_HALF_LIFE_H = 12
DECAY_UNIT = 1_000_000


def decayed_counts(ds, half_life_h: int = DECAY_HALF_LIFE_H):
    """events -> (event_type, n, decayed_micro): TIME-DECAYED counts —
    each event contributes ``10^6 >> min(age // half_life, 40)``
    micro-units of weight relative to the stream's LAST timestamp, the
    streaming-freshness score behind trending-topics dashboards (an
    event one half-life old counts half).

    EXACT: the decay is a pure integer RIGHT SHIFT on the bucketed age
    (power-of-two halving — floats and pow() never appear, so there is
    no cross-engine exp/ln hazard; cf. the ``weighted_sample`` ulp
    note), summed order-free.  Two streaming scans: one bounded max-ts
    reduce, one weighted count reduce (the :func:`~.textops.oov_rate`
    two-pass cost class)."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def ts_max(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "m": pa.array([int(t.max()) if len(t) else
                                        -(1 << 62)], pa.int64())})

    mx = hash_groupby(
        ds.map_batches(ts_max, batch_format="pyarrow"),
        "k", ["m"], how="max",
    ).to_pandas()
    t_max = int(mx["m"].iloc[0])
    hl_us = half_life_h * 3_600_000_000

    def weights(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        t = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        bucket = np.minimum((t_max - t) // hl_us, 40).astype(np.int64)
        w = np.right_shift(np.int64(DECAY_UNIT), bucket)
        df = pd_.DataFrame({"event_type": et, "w": w})
        g = df.groupby("event_type", sort=False).agg(
            n=("w", "size"), s=("w", "sum")).reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s": pa.array(g["s"].to_numpy(np.int64)),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(weights, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("s", alias_name="decayed_micro"))
        .sort("event_type")
    )


def spend_gini(ds):
    """events -> ONE row (n_users, total_cents, gini): the GINI
    coefficient of per-user total spend — the monetization-inequality
    readout ("do 1% of users carry the revenue?"), the user-side twin
    of :func:`~.textops.host_gini` and the scalar summary behind
    :func:`~.textops.coverage_curve`-style concentration reports.

    EXACT: per-user cent totals reduce on the shared coarse user
    shuffle; the rank term ``sum(i * x)`` is tie-order invariant, so
    the engine closes the formula from the (total -> multiplicity)
    HISTOGRAM per run of equal values — Python bigints, one float
    division, round6."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"user_id": pa.array(uniq), "c": pa.array(tot)})

    totals = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("c", alias_name="c"))
    )

    def hist(batch: pa.Table) -> pa.Table:
        x = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, m = np.unique(x, return_counts=True)
        return pa.table({"x": pa.array(uniq),
                         "m": pa.array(m.astype(np.int64))})

    histo = (
        totals.map_batches(hist, batch_format="pyarrow")
        .groupby("x")
        .sum("m")
    ).to_pandas().sort_values("x")
    if histo.empty:
        raise ValueError("spend_gini: no events")
    col = "sum(m)"
    s, s0, s1, n = 1, 0, 0, 0
    for x, m in zip(histo["x"].tolist(), histo[col].tolist()):
        x, m = int(x), int(m)
        s1 += x * (m * s + m * (m - 1) // 2)
        s0 += x * m
        n += m
        s += m
    if n < 2 or s0 == 0:
        raise ValueError("spend_gini: degenerate spend distribution")
    gini = float(2 * s1 - (n + 1) * s0) / float(n * s0)
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_users": pa.array([n], pa.int64()),
        "total_cents": pa.array([s0], pa.int64()),
        "gini": pa.array([r6(gini)], pa.float64()),
    }))


def type_drift_days(ds):
    """events -> (day, n, chi2): per-day CHI-SQUARE drift of the
    event-type mix against the global composition — the monitoring
    timeline that flags WHICH day the traffic mix broke (the pointwise
    companion to :func:`~.textops.unigram_drift`'s two-half KL).

    Algebra: with global type totals G_t (sum N), ``chi2_d =
    (N / n_d) * sum_t O_dt^2 / G_t - n_d`` — zero-observed cells
    contribute EXACTLY 0.0 so only present (day, type) cells enter the
    LEFT-ASSOCIATIVE per-day fold (ORDER BY type, mirrored by
    list_reduce; adding 0.0 is an IEEE identity, so skipping absent
    cells is exact).  Counts are integers; two divisions per day.
    Scale shape: one bounded (day, type) reduce + a |types| broadcast."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": d, "event_type": et})
        g = df.groupby(["day", "event_type"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas().sort_values(["day", "event_type"], kind="mergesort")
    if agg.empty:
        raise ValueError("type_drift_days: no events")
    glob = agg.groupby("event_type")["c"].sum()
    N = int(glob.sum())
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"day": [], "n": [], "chi2": []}
    for day, grp in agg.groupby("day", sort=True):
        nd = int(grp["c"].sum())
        s = 0.0
        first = True
        for et, o in zip(grp["event_type"], grp["c"]):
            t = float(int(o) * int(o)) / float(int(glob[et]))
            if first:
                s, first = t, False
            else:
                s += t
        chi2 = float(N) / float(nd) * s - float(nd)
        rows["day"].append(int(day))
        rows["n"].append(nd)
        rows["chi2"].append(r6(chi2))
    return rd.from_arrow(pa.table({
        "day": pa.array(rows["day"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "chi2": pa.array(rows["chi2"], pa.float64()),
    }))


def spend_rate(ds, window_us: int = ACTIVE_WINDOW_US):
    """events -> (user_id, cents, active_us, rate): per-user SPEND PER
    ACTIVE SECOND — total exact cents over :func:`active_time`'s
    interval-union engagement time, fused into ONE segmented solve (the
    two metrics share the same sorted-user sweep, so computing them
    together costs one pass, not a join of two aggregates).  The
    monetization-intensity feature behind "whales vs grazers"
    segmentation.

    EXACT integers; ``rate`` = cents per active SECOND, one round6
    division.  Scale shape: the shared coarse user shuffle, one
    vectorized sweep."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts, cents = uid[order], ts[order], cents[order]
        new_user, _, _ = _user_segments(uid)
        gap = np.empty(len(ts), np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_span = new_user | (gap > window_us)
        span_id = np.cumsum(new_span) - 1
        n_sp = int(span_id[-1]) + 1 if len(span_id) else 0
        first = np.full(n_sp, np.iinfo(np.int64).max, np.int64)
        last = np.full(n_sp, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(first, span_id, ts)
        np.maximum.at(last, span_id, ts)
        span_user = uid[np.flatnonzero(new_span)]
        dur = last - first + window_us
        uu, inv = np.unique(span_user, return_inverse=True)
        act = np.zeros(len(uu), np.int64)
        np.add.at(act, inv, dur)
        cu, cinv = np.unique(uid, return_inverse=True)
        spend = np.zeros(len(cu), np.int64)
        np.add.at(spend, cinv, cents)
        assert (cu == uu).all()  # same partition, same users
        rate = np.floor(spend.astype(np.float64)
                        / (act.astype(np.float64) / 1e6) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"user_id": uu, "cents": spend,
                             "active_us": act, "rate": rate})

    return _by_user(ds, solve).sort("user_id")


def entry_paths(ds, max_len: int = 3, min_users: int = 2):
    """events -> (path, n_users, min_user): ENTRY-PATH analysis —
    groups of users sharing the same first-``max_len`` event-type
    sequence, the "how do sessions start" funnel-entry report (at
    max_len = 50 the same op is a behavioral-clone / bot-ring detector;
    the synthetic streams have no full-length clones, so the gate runs
    the entry form).

    EXACT strings; groups below ``min_users`` are dropped; the sample
    member is the smallest user id.  Scale shape: the
    :func:`user_event_paths` coarse-user solve, then one path-keyed
    groupby whose min/count partials are mergeable — the path string is
    the shuffle key (a fingerprint hash replaces it at open-web
    volume)."""
    from ray.data.aggregate import Count, Min, Sum

    paths = user_event_paths(ds, max_len=max_len)

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "path": batch.column("path"),
            "u": batch.column("user_id"),
            "one": pa.array(np.ones(len(batch), np.int64)),
        })

    agg = (
        paths.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("path")
        .aggregate(Sum("one", alias_name="n_users"),
                   Min("u", alias_name="min_user"))
    )

    def keep(batch: pa.Table) -> pa.Table:
        n = batch.column("n_users").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(n >= min_users))

    return agg.map_batches(keep, batch_format="pyarrow",
                           batch_size=None).sort("path")


def weekend_lift(ds):
    """events -> (event_type, n_weekday, n_weekend, lift): the
    WEEKEND-BEHAVIOR lift per event type — weekend events-per-day over
    weekday events-per-day (normalized by how many weekend/weekday
    CALENDAR DAYS the observed range contains, so a Saturday-launch
    crawl cannot fake a weekend effect).  The day-of-week seasonality
    readout next to :func:`seasonality_profile`'s hour-of-day.

    EXACT: ``dow = (epoch_day + 3) % 7`` (Monday = 0 — pure integer,
    identical on both engines), weekend = dow >= 5; day denominators
    come from the dense day range.  One round6 division chain per type.
    Scale shape: one bounded (type, is_weekend) reduce + one day-range
    scalar reduce."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        we = ((d + 3) % 7 >= 5).astype(np.int64)
        df = pd.DataFrame({"event_type": et, "we": we,
                           "dlo": d, "dhi": d})
        g = df.groupby(["event_type", "we"], sort=False).agg(
            n=("we", "size"), dlo=("dlo", "min"), dhi=("dhi", "max")) \
            .reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "we": pa.array(g["we"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "dlo": pa.array(g["dlo"].to_numpy(np.int64)),
            "dhi": pa.array(g["dhi"].to_numpy(np.int64)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "we"])
        .aggregate(Sum("n", alias_name="n"), Min("dlo", alias_name="dlo"),
                   Max("dhi", alias_name="dhi"))
    ).to_pandas()
    if agg.empty:
        raise ValueError("weekend_lift: no events")
    lo, hi = int(agg["dlo"].min()), int(agg["dhi"].max())
    days = np.arange(lo, hi + 1)
    n_we_days = int(((days + 3) % 7 >= 5).sum())
    n_wd_days = len(days) - n_we_days
    if n_we_days == 0 or n_wd_days == 0:
        raise ValueError("weekend_lift: range lacks both day kinds")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"event_type": [], "n_weekday": [], "n_weekend": [], "lift": []}
    for et, grp in agg.groupby("event_type", sort=True):
        nwd = int(grp.loc[grp["we"] == 0, "n"].sum())
        nwe = int(grp.loc[grp["we"] == 1, "n"].sum())
        if nwd == 0:
            raise ValueError(f"weekend_lift: no weekday events for {et}")
        lift = (float(nwe) / float(n_we_days)) \
            / (float(nwd) / float(n_wd_days))
        rows["event_type"].append(et)
        rows["n_weekday"].append(nwd)
        rows["n_weekend"].append(nwe)
        rows["lift"].append(r6(lift))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        "n_weekday": pa.array(rows["n_weekday"], pa.int64()),
        "n_weekend": pa.array(rows["n_weekend"], pa.int64()),
        "lift": pa.array(rows["lift"], pa.float64()),
    }))


OUTLIER_SIGMAS = 3


def spend_outliers(ds, k: int = OUTLIER_SIGMAS):
    """events -> (event_id, user_id, cents): events whose value sits
    more than ``k`` standard deviations ABOVE the same user's own
    spending history — the self-normalized fraud/anomaly flag (a $100
    event is an outlier for a $1 user and routine for a whale; global
    thresholds can't see that).

    PURE-INTEGER test, no float ever: with per-user moments (n, S1,
    S2), ``z > k`` is the cross-multiplied
    ``n*x - S1 > 0 AND (n*x - S1)^2 > k^2 * (n*S2 - S1^2)`` — exact at
    any scale (the :func:`burst_hours` discipline per user).  Users
    with n < 2 never flag.  Scale shape: the shared coarse user
    shuffle; moments and flags happen in the same segmented pass."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, eid, cents = uid[order], eid[order], cents[order]
        uu, inv = np.unique(uid, return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(object)
        s1 = np.zeros(len(uu), dtype=object)
        s2 = np.zeros(len(uu), dtype=object)
        np.add.at(s1, inv, cents.astype(object))
        np.add.at(s2, inv, cents.astype(object) * cents.astype(object))
        dev = n[inv] * cents.astype(object) - s1[inv]
        var_n = n[inv] * s2[inv] - s1[inv] * s1[inv]
        flag = (n[inv] >= 2) & (dev > 0) & (dev * dev > k * k * var_n)
        flag = flag.astype(bool)
        return pd.DataFrame({"event_id": eid[flag], "user_id": uid[flag],
                             "cents": cents[flag]})

    return _by_user(ds, solve).sort("event_id")


def top_type_share(ds):
    """events -> (user_id, top_type, n_events, share): each user's
    dominant event type and its share of their activity — the
    behavioral-concentration feature (share ~ 1 = single-purpose
    account; the argmax counterpart to :func:`path_entropy`'s entropy).

    EXACT: per-(user, type) counts, argmax with (count DESC, type ASC)
    ties (mirrored by the oracle's row_number), one round6 division.
    Scale shape: the shared coarse user shuffle, one segmented
    argmax."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        types, tcode = np.unique(et, return_inverse=True)
        key = uid * np.int64(1 << 16) + tcode.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        users = uk >> np.int64(16)
        codes = uk & np.int64((1 << 16) - 1)
        # argmax per user under (cnt DESC, type ASC): codes ascend within
        # a user in uk order, so a stable sort by (-cnt) with user as the
        # primary key keeps the smallest type first among count ties
        order = np.lexsort((codes, -cnt, users))
        users_s = users[order]
        first = np.flatnonzero(np.diff(users_s, prepend=np.int64(-1)))
        sel = order[first]
        n_ev = np.zeros(len(first), np.int64)
        uu, inv = np.unique(users, return_inverse=True)
        tot = np.zeros(len(uu), np.int64)
        np.add.at(tot, inv, cnt)
        share = np.floor(cnt[sel].astype(np.float64)
                         / tot.astype(np.float64) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "user_id": users[sel],
            "top_type": types[codes[sel]],
            "n_events": tot,
            "share": share,
        })

    return _by_user(ds, solve).sort("user_id")


WAU_WINDOW = 7


def wau_curve(ds, window: int = WAU_WINDOW):
    """events -> (day, wau): the ROLLING 7-DAY ACTIVE USERS curve —
    for each calendar day, how many distinct users were active at least
    once in the trailing ``window`` days.  THE engagement headline
    metric (DAU is :func:`returning_users`' dau column; WAU/MAU need
    the window dedup this op does).

    EXACT: (user, active-day) dedup -> each active day projects onto
    ``window`` target days -> a SECOND per-(user, target) dedup keeps a
    user counted once per window (both dedups are segmented np.unique
    passes on the coarse user shuffle — never per-user Python) -> one
    bounded day-keyed count reduce.  Days outside the observed range
    are trimmed (declared: the curve covers [min_day, max_day])."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        day = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        key = np.unique(uid * np.int64(1 << 20) + day)
        u = key >> np.int64(20)
        d = key & np.int64((1 << 20) - 1)
        tgt = (d[:, None] + np.arange(window, dtype=np.int64)[None, :]) \
            .ravel()
        uu = np.repeat(u, window)
        key2 = np.unique(uu * np.int64(1 << 20) + tgt)
        t2 = key2 & np.int64((1 << 20) - 1)
        days, cnt = np.unique(t2, return_counts=True)
        return pd.DataFrame({"day": days, "wau": cnt.astype(np.int64)})

    curve = hash_groupby(
        _by_user(ds, solve), "day", ["wau"], how="isum",
    ).to_pandas().sort_values("day")

    # trim to the observed day range (projection spills past max_day)
    def drange(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "lo": pa.array([int(d.min())], pa.int64()),
                         "hi": pa.array([int(d.max())], pa.int64())})

    rng = hash_groupby(
        ds.map_batches(drange, batch_format="pyarrow"),
        "k", ["lo", "hi"], how={"lo": "min", "hi": "max"},
    ).to_pandas()
    lo, hi = int(rng["lo"].iloc[0]), int(rng["hi"].iloc[0])
    keep = (curve["day"] >= lo) & (curve["day"] <= hi)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "day": pa.array(curve["day"].to_numpy(np.int64)[keep]),
        "wau": pa.array(curve["wau"].to_numpy(np.int64)[keep]),
    })).sort("day")


def gaps_by_type(ds):
    """events -> (event_type, gap_us): every consecutive same-user gap,
    keyed by the FROM event's type (the dwell attribution of
    :func:`transition_dwell`, kept per-gap for distributional stats).
    One segmented pass on the coarse user shuffle."""
    def solve(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        new_user, _, _ = _user_segments(uid)
        keep = np.flatnonzero(~new_user)
        return pd.DataFrame({"event_type": et[keep - 1],
                             "gap_us": ts[keep] - ts[keep - 1]})

    return _by_user(ds, solve)


SPEND_TOP_K = 20


def spend_concentration(ds, k: int = SPEND_TOP_K):
    """events -> k rows (rnk, user_id, cents, cum_cents, cum_share):
    the SPEND CONCENTRATION curve — the top-``k`` spenders by exact
    cent totals with cumulative revenue shares ("the top 20 accounts
    carry X% of revenue"), the scalar :func:`spend_gini`'s
    who-exactly companion and the user-side mirror of
    :func:`~.textops.coverage_curve`.

    DETERMINISTIC: ranks by (cents DESC, user_id); cumulative sums are
    exact ints; one round6 share per row.  Scale shape: per-user cent
    reduce on the coarse user shuffle, per-partition local top-k, tiny
    merge, plus one scalar total."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def cents(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"user_id": pa.array(uniq), "c": pa.array(tot)})

    totals = hash_groupby(
        ds.map_batches(cents, batch_format="pyarrow"),
        "user_id", ["c"], how="isum",
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((u, -c))[: min(k, len(u))]
        tot = int(c.sum())
        return pa.table({"user_id": pa.array(u[order]),
                         "c": pa.array(c[order]),
                         "tot": pa.array(np.full(len(order), tot,
                                                 np.int64))})

    part = totals.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    if part.empty:
        raise ValueError("spend_concentration: no events")
    # the grand total comes from its own scalar reduce (per-block 'tot'
    # columns are partial sums and cannot be disentangled from the rows)
    def tot_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([int(c.sum())], pa.int64())})

    g = hash_groupby(
        totals.map_batches(tot_partial, batch_format="pyarrow"),
        "k", ["s"], how="isum",
    ).to_pandas()
    grand = int(g["s"].sum())
    part = part.sort_values(["c", "user_id"], ascending=[False, True],
                            kind="mergesort").head(k)
    cum = part["c"].to_numpy(np.int64).cumsum()
    r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return rd.from_arrow(pa.table({
        "rnk": pa.array(np.arange(1, len(part) + 1, dtype=np.int64)),
        "user_id": pa.array(part["user_id"].to_numpy(np.int64)),
        "cents": pa.array(part["c"].to_numpy(np.int64)),
        "cum_cents": pa.array(cum),
        "cum_share": pa.array(r6(cum.astype(np.float64) / float(grand))),
    }))


def integrity_audit(ds):
    """events -> ONE row (n_rows, n_dup_ids, n_subcent, n_nonpos,
    ts_span_days): the DATA-CONTRACT audit a pipeline runs before
    trusting a feed — duplicate primary keys, values with sub-cent
    precision (a currency column that was divided somewhere), non-
    positive amounts, and the timestamp span.  Zero rows in the dup
    column IS the assertion the rest of the engine relies on (exact
    cents assume one event per id).

    EXACT: dup ids via one id-keyed count reduce; the sub-cent test is
    the integer comparison ``floor(v*100+0.5)/100 != v`` evaluated on
    identical IEEE doubles in both engines.  Scale shape: one id
    reduce + one scalar reduce."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def idcounts(batch: pa.Table) -> pa.Table:
        e = batch.column("event_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(e, return_counts=True)
        return pa.table({"id": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64))})

    ids = hash_groupby(
        ds.map_batches(idcounts, batch_format="pyarrow"),
        "id", ["c"], how="isum",
    )

    def dup_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "d": pa.array([int((c[c > 1]).sum())], pa.int64())})

    dups = hash_groupby(
        ids.map_batches(dup_partial, batch_format="pyarrow"),
        "k", ["d"], how="isum",
    ).to_pandas()
    n_dup = int(dups["d"].sum())

    def scalar_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        cents = np.floor(v * 100.0 + 0.5)
        subcent = int((cents / 100.0 != v).sum())
        nonpos = int((v <= 0.0).sum())
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n": pa.array([len(v)], pa.int64()),
            "sc": pa.array([subcent], pa.int64()),
            "np_": pa.array([nonpos], pa.int64()),
            "lo": pa.array([int(t.min())], pa.int64()),
            "hi": pa.array([int(t.max())], pa.int64()),
        })

    sc = hash_groupby(
        ds.map_batches(scalar_partial, batch_format="pyarrow"),
        "k", ["n", "sc", "np_", "lo", "hi"],
        how={"n": "isum", "sc": "isum", "np_": "isum",
             "lo": "min", "hi": "max"},
    ).to_pandas()
    return rd.from_arrow(pa.table({
        "n_rows": pa.array([int(sc["n"].iloc[0])], pa.int64()),
        "n_dup_ids": pa.array([n_dup], pa.int64()),
        "n_subcent": pa.array([int(sc["sc"].iloc[0])], pa.int64()),
        "n_nonpos": pa.array([int(sc["np_"].iloc[0])], pa.int64()),
        "ts_span_days": pa.array(
            [int(sc["hi"].iloc[0]) - int(sc["lo"].iloc[0])], pa.int64()),
    }))
