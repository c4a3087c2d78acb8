"""k-ring neighborhood smoothing — the reference's kernel family (SURVEY §2.3,
K1-K10) re-expressed as a Ray Data scatter -> shuffle -> weighted-mean reduce.

Semantics (identical to ``src/cpu/hex_smooth_naive.cpp:48-83`` and every CUDA
variant): ``out[i] = (sum_j w(d(i,j)) * v[j]) / (sum_j w(d(i,j)))`` over
``j in {i} + ring1(i) [+ ring2(i)]`` restricted to cells *present* in the
dataset — a missing neighbor contributes to neither numerator nor denominator
(the bounds-check at ``hex_smooth_naive.cpp:55``), so a 0-neighbor cell's
output equals its input.

Execution plan (scales: the only all-to-all is over *cell-level* rows, never
page-level rows):

1. **Contribution expansion + map-side partial aggregation** (stateless
   ``map_batches``, numpy): each cell row emits ``(target_cell, w*v, w,
   is_center)`` for itself and each k-ring offset (fan-out x7 for k=1, x19 for
   k=2 — mirroring avg 5.99 1st-order + 11.96 2nd-order neighbors in the
   reference logs), then contributions are combined *within the batch* by
   target cell before anything is shuffled.  The batch-local combine is the
   salt: a hot cell's contributions arrive at the reducer as one partial row
   per batch, not one row per page.
2. **Weighted-mean reduce**: ``groupby(cell).aggregate(Sum(...))`` over the
   partials — Ray Data's shuffle moves only the (small) partial rows.
3. **Finalize**: filter to cells whose center contribution arrived (drops
   phantom targets outside the data), one vectorized divide.

Multi-variable fusion (K5-K7, the ``float4`` kernels) = passing several value
columns through the *same* expansion/shuffle — one neighbor "lookup" amortized
over all variables, exactly the reference's fusion win.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import hexgrid
from ..functions.weights import ring_weights
from ..functions.scale import default_parts


def _offsets_and_weights(k: int, profile: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    w = ring_weights(profile, k)
    offs: list[tuple[int, int]] = [(0, 0)]
    ws: list[float] = [w[0]]
    for ring in range(1, k + 1):
        ring_offs = hexgrid.ring_offsets(ring)
        offs += ring_offs
        ws += [w[ring]] * len(ring_offs)
    dq = np.array([o[0] for o in offs], dtype=np.int64)
    dr = np.array([o[1] for o in offs], dtype=np.int64)
    return dq, dr, np.array(ws, dtype=np.float64)


def expand_contributions(
    batch: pa.Table, value_cols: list[str], dq: np.ndarray, dr: np.ndarray, w: np.ndarray
) -> pa.Table:
    """One batch of the cell table -> batch-combined partial contributions.

    Output columns: ``cell, w_sum, c_sum, wv_<col>...`` — at most
    ``n_distinct_targets`` rows regardless of input batch size.
    """
    cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    res, q, r = hexgrid.unpack(cell)
    res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
    n, m = len(cell), len(dq)
    targets = hexgrid.pack(res0, q[:, None] + dq[None, :], r[:, None] + dr[None, :]).ravel()
    w_flat = np.broadcast_to(w[None, :], (n, m)).ravel()
    is_center = np.broadcast_to((dq == 0) & (dr == 0), (n, m)).ravel().astype(np.float64)

    uniq, inv = np.unique(targets, return_inverse=True)
    out = {
        "cell": pa.array(uniq),
        "w_sum": pa.array(np.bincount(inv, weights=w_flat, minlength=len(uniq))),
        "c_sum": pa.array(np.bincount(inv, weights=is_center, minlength=len(uniq))),
    }
    for col in value_cols:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        wv = (np.broadcast_to(v[:, None], (n, m)) * np.broadcast_to(w[None, :], (n, m))).ravel()
        out[f"wv_{col}"] = pa.array(np.bincount(inv, weights=wv, minlength=len(uniq)))
    return pa.table(out)


def smooth_cells(cells_ds, value_cols: list[str], k: int = 1, profile: str = "gaussian",
                 salted: bool = False, out_suffix: str = "_sm"):
    """Cell-table Dataset (cell + value columns) -> smoothed cell table.

    ``salted=True`` demonstrates the explicit two-phase hot-key path: a salt
    column spreads each cell's partials over ``NSALT`` reducer keys, a first
    ``groupby((cell, salt))`` combines within salt buckets, and a second tiny
    ``groupby(cell)`` finishes.  With the batch-local combine in
    :func:`expand_contributions` the implicit path is already skew-safe; a
    pytest asserts both paths agree bit-for-bit after rounding.
    """
    from ray.data.aggregate import Sum

    dq, dr, w = _offsets_and_weights(k, profile)

    def expand(batch: pa.Table) -> pa.Table:
        return expand_contributions(batch, value_cols, dq, dr, w)

    partials = cells_ds.map_batches(expand, batch_format="pyarrow")

    agg_cols = ["w_sum", "c_sum"] + [f"wv_{c}" for c in value_cols]
    if salted:
        NSALT = 16

        def add_salt(batch: pa.Table) -> pa.Table:
            c = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
            salt = ((c * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) % np.uint64(NSALT)
            return batch.append_column("salt", pa.array(salt.astype(np.int64)))

        stage1 = (
            partials.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["cell", "salt"])
            .aggregate(*[Sum(c, alias_name=c) for c in agg_cols])
        )
        reduced = stage1.groupby("cell").aggregate(
            *[Sum(c, alias_name=c) for c in agg_cols]
        )
    else:
        # vectorized hash-partition reduce: Ray's aggregate pays Python per
        # distinct cell — fatal at res-9 cardinalities (see functions/reduce)
        from ..functions.reduce import hash_groupby_sum

        reduced = hash_groupby_sum(partials, "cell", agg_cols)

    def finalize(batch: pa.Table) -> pa.Table:
        c_sum = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c_sum > 0.5
        cell = batch.column("cell").to_numpy(zero_copy_only=False)[mask]
        w_sum = batch.column("w_sum").to_numpy(zero_copy_only=False)[mask]
        out = {"cell": pa.array(cell)}
        for col in value_cols:
            wv = batch.column(f"wv_{col}").to_numpy(zero_copy_only=False)[mask]
            out[f"{col}{out_suffix}"] = pa.array(wv / w_sum)
        return pa.table(out)

    return reduced.map_batches(finalize, batch_format="pyarrow")


def neighbor_counts(cells_ds, ring: int = 1):
    """(cell, n_neighbors) — number of ring-``ring`` neighbors *present* in
    the data, the engine analog of the reference's printStats input (SURVEY
    §2.5 A1; ``ring=2`` is the standalone ring-2 stat, A4 — the reference
    logs its average as "ring2 size", extended_neighborhoods_study:142).

    Derived from the uniform smoothing reduce over (center + that ring
    only): w_sum = 1 + n_present."""
    import numpy as np_
    import pyarrow.compute as pc_

    ring_offs = hexgrid.ring_offsets(ring)
    dq = np_.array([0] + [o[0] for o in ring_offs], dtype=np_.int64)
    dr = np_.array([0] + [o[1] for o in ring_offs], dtype=np_.int64)
    w = np_.ones(len(ring_offs) + 1, dtype=np_.float64)

    def expand(batch: pa.Table) -> pa.Table:
        return expand_contributions(batch, [], dq, dr, w)

    from ray.data.aggregate import Sum

    reduced = (
        cells_ds.map_batches(expand, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("w_sum", alias_name="w_sum"), Sum("c_sum", alias_name="c_sum"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc_.greater(batch.column("c_sum"), 0.5))
        n_nbr = pc_.cast(
            pc_.round(pc_.subtract(t.column("w_sum"), 1.0)), pa.int64()
        )
        return pa.table({"cell": t.column("cell"), "n_neighbors": n_nbr})

    return reduced.map_batches(finalize, batch_format="pyarrow")


#: above this many distinct cells the smoothed table stops being
#: "broadcast-sized": res 7 is hundreds of cells, but res 9 over 100 TB is
#: 10^7-10^8 — a driver-side to_pandas + per-task copy would be multi-GB.
ENRICH_BROADCAST_MAX_CELLS = 1_000_000


def enrich_pages(geocoded_ds, cells_ds, value_cols: list[str], k: int = 1,
                 profile: str = "gaussian", id_col: str = "page_id",
                 broadcast_max_cells: int = ENRICH_BROADCAST_MAX_CELLS):
    """Feature-enrichment join: stamp every PAGE with its cell's smoothed
    metrics — the serve-side step that turns the aggregated spatial model
    back into per-row training features.

    -> (id_col, cell, <col>_sm ...).  Size-gated plan: when the smoothed
    cell table is genuinely broadcast-sized (<= ``broadcast_max_cells``
    rows) it is pulled once and shipped via ``ray.put`` (sorted keys +
    searchsorted lookup per batch, same discipline as
    ``join.broadcast_hash_join``) and the page stream never shuffles.
    Above the gate (high res x 100 TB) nothing touches the driver: both
    sides hash-partition on ``cell`` and each partition does one
    vectorized sort-merge lookup — the standard shuffle join, with the
    small side still being cells, not pages."""
    import ray

    sm = smooth_cells(cells_ds, value_cols, k=k, profile=profile).materialize()
    if sm.count() > broadcast_max_cells:
        return _enrich_shuffle_join(sm, geocoded_ds, value_cols, id_col)
    sm_pd = sm.to_pandas().sort_values("cell")
    keys = sm_pd["cell"].to_numpy().astype(np.int64)
    vals = {
        c: np.floor(sm_pd[f"{c}_sm"].to_numpy() * 1e6 + 0.5) / 1e6
        for c in value_cols
    }
    ref = ray.put((keys, vals))

    def lookup(batch: pa.Table) -> pa.Table:
        k_sorted, v = ray.get(ref)
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k_sorted, cell)
        pos_c = np.minimum(pos, len(k_sorted) - 1)
        hit = k_sorted[pos_c] == cell  # every page's cell is in the table
        out = {id_col: batch.column(id_col), "cell": batch.column("cell")}
        for c in value_cols:
            out[f"{c}_sm"] = pa.array(np.where(hit, v[c][pos_c], np.nan))
        return pa.table(out)

    return geocoded_ds.map_batches(lookup, batch_format="pyarrow")


def _enrich_shuffle_join(sm, geocoded_ds, value_cols: list[str], id_col: str,
                         n_parts: int | None = None):
    """Cell-keyed shuffle-join arm of :func:`enrich_pages`: union the
    smoothed cell rows (kind 0) with the page rows (kind 1), ONE coarse
    hash-partition shuffle on cell, then a vectorized per-partition
    sort-merge lookup.  Output is identical to the broadcast arm (same
    1e-6 rounding of the smoothed values)."""
    n_parts = default_parts() if n_parts is None else n_parts
    from ..functions.hashing import coarse_partition

    def _part(cell: np.ndarray) -> pa.Array:
        return pa.array(coarse_partition(cell, n_parts))

    def cell_rows(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "cell": pa.array(cell),
            "kind": pa.array(np.zeros(len(cell), np.int8)),
            id_col: pa.array(np.zeros(len(cell), np.int64)),
        }
        for c in value_cols:
            v = batch.column(f"{c}_sm").to_numpy(zero_copy_only=False)
            out[f"{c}_sm"] = pa.array(np.floor(v * 1e6 + 0.5) / 1e6)
        out["__part"] = _part(cell)
        return pa.table(out)

    def page_rows(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "cell": pa.array(cell),
            "kind": pa.array(np.ones(len(cell), np.int8)),
            id_col: batch.column(id_col),
        }
        for c in value_cols:
            out[f"{c}_sm"] = pa.array(np.zeros(len(cell), np.float64))
        out["__part"] = _part(cell)
        return pa.table(out)

    def join(part: pd.DataFrame) -> pd.DataFrame:
        is_cell = part["kind"].to_numpy() == 0
        ck = part["cell"].to_numpy()[is_cell]
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        pages = part[~is_cell]
        pc_ = pages["cell"].to_numpy()
        pos = np.searchsorted(ck, pc_)
        pos_c = np.minimum(pos, max(len(ck) - 1, 0))
        hit = (ck[pos_c] == pc_) if len(ck) else np.zeros(len(pc_), bool)
        out = {id_col: pages[id_col].to_numpy(), "cell": pc_}
        for c in value_cols:
            cv = part[f"{c}_sm"].to_numpy()[is_cell][order]
            out[f"{c}_sm"] = np.where(
                hit, cv[pos_c] if len(ck) else np.nan, np.nan)
        return pd.DataFrame(out)

    unioned = sm.map_batches(cell_rows, batch_format="pyarrow",
                             batch_size=None).union(
        geocoded_ds.map_batches(page_rows, batch_format="pyarrow",
                                batch_size=None))
    return unioned.groupby("__part").map_groups(join, batch_format="pandas")


def hex_gradient(cells_ds, value_col: str, ring: int = 1):
    """Cell-table Dataset -> (cell, n_neighbors, grad): per-cell maximum
    absolute difference of ``value_col`` against its PRESENT ring-``ring``
    neighbors — the high-pass (edge-detection) complement of the K-family
    smoothing low-pass.  Cells with no present neighbor emit no row (a
    gradient over an empty set is undefined).

    Scale shape: same scatter -> shuffle discipline as
    :func:`smooth_cells` — each cell emits its value toward its neighbors
    (and itself, flagged), contributions batch-combine by target before the
    ONE cell-level shuffle, and the reduce is mixed max/min/sum in a single
    vectorized :func:`..functions.reduce.hash_groupby` pass (no per-cell
    Python).  max|v_n - v_c| finalizes as
    ``max(max_n v_n - v_c, v_c - min_n v_n)`` — IEEE-identical to the
    per-pair form because subtraction by a constant is monotone and exactly
    rounded, which is what lets the reduce ship 2 floats per target instead
    of every pair."""
    import pyarrow.compute as pc_

    from ..functions.reduce import hash_groupby

    ring_offs = hexgrid.ring_offsets(ring)
    dq = np.array([o[0] for o in ring_offs], dtype=np.int64)
    dr = np.array([o[1] for o in ring_offs], dtype=np.int64)

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        n, m = len(cell), len(dq)
        nbr_targets = hexgrid.pack(
            res0, q[:, None] + dq[None, :], r[:, None] + dr[None, :]
        ).ravel()
        targets = np.concatenate((cell, nbr_targets))
        vals = np.concatenate((v, np.repeat(v, m)))
        is_ctr = np.concatenate((np.ones(n, bool), np.zeros(n * m, bool)))
        uniq, inv = np.unique(targets, return_inverse=True)
        nbr_max = np.full(len(uniq), -np.inf)
        np.maximum.at(nbr_max, inv[~is_ctr], vals[~is_ctr])
        neg_nbr_min = np.full(len(uniq), -np.inf)
        np.maximum.at(neg_nbr_min, inv[~is_ctr], -vals[~is_ctr])
        center_val = np.full(len(uniq), -np.inf)
        np.maximum.at(center_val, inv[is_ctr], vals[is_ctr])
        return pa.table({
            "cell": pa.array(uniq),
            "nbr_max": pa.array(nbr_max),
            "neg_nbr_min": pa.array(neg_nbr_min),
            "center_val": pa.array(center_val),
            "n_nbr": pa.array(np.bincount(inv[~is_ctr], minlength=len(uniq))
                              .astype(np.int64)),
            "c_cnt": pa.array(np.bincount(inv[is_ctr], minlength=len(uniq))
                              .astype(np.int64)),
        })

    reduced = hash_groupby(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell",
        ["nbr_max", "neg_nbr_min", "center_val", "n_nbr", "c_cnt"],
        how={"nbr_max": "max", "neg_nbr_min": "max", "center_val": "max",
             "n_nbr": "isum", "c_cnt": "isum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        keep = pc_.and_(pc_.greater(batch.column("c_cnt"), 0),
                        pc_.greater(batch.column("n_nbr"), 0))
        t = batch.filter(keep)
        vc = t.column("center_val").to_numpy(zero_copy_only=False)
        up = t.column("nbr_max").to_numpy(zero_copy_only=False) - vc
        dn = vc - (-t.column("neg_nbr_min").to_numpy(zero_copy_only=False))
        return pa.table({
            "cell": t.column("cell"),
            "n_neighbors": t.column("n_nbr"),
            "grad": pa.array(np.maximum(up, dn)),
        })

    return reduced.map_batches(finalize, batch_format="pyarrow")


def kde_density(cells_ds, value_col: str = "page_count", k: int = 2,
                profile: str = "gaussian"):
    """Cell-table Dataset -> (cell, density): kernel-density heat
    accumulation — ``density(c) = sum over j in {c} + rings<=k of
    w(ring(j)) * v(j)`` — the UN-normalized numerator of the K-family
    weighted mean, i.e. a choropleth heatmap (each page radiates weighted
    mass into its k-ring) rather than a low-pass filter.  Missing neighbors
    simply contribute nothing; cells absent from the data emit no row.

    Scale shape: identical to :func:`smooth_cells` — the same
    :func:`expand_contributions` scatter with batch-local combine and ONE
    vectorized cell-level reduce; only the finalize differs (no divide)."""
    from ..functions.reduce import hash_groupby_sum

    dq, dr, w = _offsets_and_weights(k, profile)

    def expand(batch: pa.Table) -> pa.Table:
        return expand_contributions(batch, [value_col], dq, dr, w)

    reduced = hash_groupby_sum(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", ["w_sum", "c_sum", f"wv_{value_col}"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        c_sum = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c_sum > 0.5
        return pa.table({
            "cell": pa.array(
                batch.column("cell").to_numpy(zero_copy_only=False)[mask]),
            "density": pa.array(
                batch.column(f"wv_{value_col}").to_numpy(
                    zero_copy_only=False)[mask]),
        })

    return reduced.map_batches(finalize, batch_format="pyarrow")


def smooth_residuals(cells_ds, value_col: str = "page_count", k: int = 1,
                     profile: str = "uniform", pct_num: int = 9,
                     pct_den: int = 10):
    """cell table -> (cell, page_count, resid_micro, thr_micro): the
    SMOOTHING QA layer — cells whose |raw - smoothed| residual sits in
    the top decile, i.e. where the k-ring kernel disagrees most with
    the data (genuine hotspots, sensor glitches, or boundary cells the
    kernel cannot explain).  The diagnostic a smoothing pipeline ships
    next to its output.

    EXACT selection: the smoothed mean quantizes ONCE to micro-units
    (``floor(sm * 1e6 + 0.5)`` — the engine and oracle compute
    identical IEEE doubles from identical sum trees, observed exact in
    the K-family gates), so residuals and the rank-``floor((n-1) *
    9/10)`` threshold compare as integers.  Scale shape: the
    :func:`smooth_cells` plan plus a driver join/threshold on the
    bounded cell table."""
    import ray.data as rd

    sm = smooth_cells(cells_ds, [value_col], k=k, profile=profile) \
        .to_pandas()
    raw = cells_ds.to_pandas()
    j = raw[["cell", value_col]].merge(
        sm[["cell", f"{value_col}_sm"]], on="cell")
    pc_i = j[value_col].to_numpy(np.int64)
    smv = j[f"{value_col}_sm"].to_numpy(np.float64)
    sm_micro = np.floor(smv * 1e6 + 0.5).astype(np.int64)
    rm = pc_i * np.int64(10**6) - sm_micro
    n = len(rm)
    if n == 0:
        raise ValueError("smooth_residuals: no cells")
    a = np.sort(np.abs(rm))
    thr = int(a[((n - 1) * pct_num) // pct_den])
    keep = np.abs(rm) >= thr
    cells = j["cell"].to_numpy(np.int64)
    order = np.argsort(cells[keep])
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells[keep][order]),
        "page_count": pa.array(pc_i[keep][order]),
        "resid_micro": pa.array(rm[keep][order]),
        "thr_micro": pa.array(np.full(int(keep.sum()), thr, np.int64)),
    }))


CHORO_CLASSES = 4


def choropleth_classes(cells_ds, value_col: str = "page_count",
                       k: int = 1, profile: str = "uniform",
                       n_classes: int = CHORO_CLASSES):
    """cell table -> (cell, sm_micro, cls): QUANTILE CLASSING of the
    smoothed density surface — each cell's equal-count class
    ``1..n_classes`` (the cartographic "quartile choropleth" styling
    step that turns the smoothed field into a legend; equal-count
    classes are the standard default because equal-interval ones
    collapse under heavy tails).

    DETERMINISTIC: cells rank by ``(sm_micro, cell)`` (the smoothed
    mean quantized once to micro-units — identical IEEE doubles on both
    engines) and ``cls = ((rank - 1) * n_classes) // n + 1`` is pure
    integer arithmetic, so class boundaries cannot disagree.  Scale
    shape: the :func:`smooth_cells` plan + a driver rank over the
    bounded cell table."""
    import ray.data as rd

    sm = smooth_cells(cells_ds, [value_col], k=k, profile=profile) \
        .to_pandas()
    smv = sm[f"{value_col}_sm"].to_numpy(np.float64)
    sm_micro = np.floor(smv * 1e6 + 0.5).astype(np.int64)
    cells = sm["cell"].to_numpy(np.int64)
    n = len(cells)
    if n == 0:
        raise ValueError("choropleth_classes: no cells")
    order = np.lexsort((cells, sm_micro))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(1, n + 1)
    cls = (rank - 1) * n_classes // n + 1
    o = np.argsort(cells)
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells[o]),
        "sm_micro": pa.array(sm_micro[o]),
        "cls": pa.array(cls[o]),
    }))
