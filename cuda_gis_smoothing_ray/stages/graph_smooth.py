"""K-family smoothing over an EXPLICIT adjacency graph — the reference's
actual data model (stored neighbor lists, ``hex_smooth_naive.cpp:9-12``),
for grids whose adjacency is NOT derivable from a cell id (arbitrary
graphs, the reference's ``hex_data.bin``).

Covers the full kernel family on explicit graphs:

* ring-1, single variable (K1/K2 — ``hex_smooth_naive.cpp:48-83``);
* ring-2 "both orders" (K4 — ``hex_smooth_cuda_v5.cu:146-170``), with the
  2nd-order neighborhood DERIVED distributedly from the stored 1st-order
  lists, matching ``hex_smooth_cuda_v5.cu:423-463``: n2 reachable via a
  valid n1, n2 valid, n2 != i, n2 not already 1st-order, deduplicated,
  ascending, truncated to MAX_NEIGHBORS_2ND=12 (the std::set + padded-write
  semantics — also the O4 ring-2 truncation rule);
* fused multi-variable (K5-K7 — ``hex_smooth_cuda_v4.cu:59-111``): several
  value columns share ONE neighbor gather and one shuffle.

Ray Data has no join operator, so every neighbor-value gather
(``values[neighbor_idx]``, ``hex_smooth_cuda_v1.cu:51-53``) is a
hash-partition sort-merge join: rows are bucketed by a coarse hash of the
join key (``groupby("__part")`` moves each key's rows to one group), and
each partition is joined with ONE vectorized numpy pass (sort +
searchsorted) — Python cost per PARTITION (~64), never per cell, the same
workaround as :mod:`..functions.reduce` for Ray's per-distinct-key
aggregate cost.

Out-of-range neighbor ids simply find no value row in the join and
contribute nothing — the reference's bounds check (M1,
``hex_smooth_naive.cpp:55``) falls out of the join semantics.

Scale: every shuffle is keyed by cell id (bounded fan-out: <=6 ring-1,
<=12 ring-2); no broadcast, no driver materialization — works for graphs
of any size.  Weight constants come from :mod:`..functions.weights`
(center 1.0, ring-1 0.6065 Gaussian / 1.0 uniform, ring-2 0.1353 —
``hex_smooth_cuda_v5.cu:37-39``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.weights import ring_weights
from ..functions.scale import default_parts

MAX_NEIGHBORS_2ND = 12  # hex_smooth_cuda_v5.cu:30
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _part_of(key: np.ndarray, n_parts: int | None = None) -> np.ndarray:
    n_parts = default_parts() if n_parts is None else n_parts
    return (
        (key.astype(np.int64).view(np.uint64) * _GOLDEN) >> np.uint64(52)
    ) % np.uint64(n_parts)


def _adjacency_flat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (cell ids, per-cell counts, flattened neighbor ids)."""
    src = batch.column("cell_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    neigh = batch.column("neighbors")
    if isinstance(neigh, pa.ChunkedArray):
        neigh = neigh.combine_chunks()
    offs = neigh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = neigh.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return src, offs[1:] - offs[:-1], flat


def _kinded(key, kind, src, n_parts=None) -> pa.Table:
    n_parts = default_parts() if n_parts is None else n_parts
    t = pa.table(
        {
            "key": pa.array(key.astype(np.int64)),
            "kind": pa.array(np.full(len(key), kind, np.int8)),
            "src": pa.array(src.astype(np.int64)),
        }
    )
    return t.append_column("__part", pa.array(_part_of(key, n_parts).astype(np.int64)))


_EDGES_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def second_order_edges(ds, n_parts: int | None = None):
    """Dataset(cell_idx, neighbors) -> Dataset(src, dst) of 2nd-order edges,
    reference semantics (``hex_smooth_cuda_v5.cu:423-463``): for each cell i,
    dst ranges over the <=12 smallest ids reachable through a present
    1st-order neighbor, excluding i itself, ids on i's raw 1st-order list,
    and ids not present in the data.

    Three hash-partition supersteps (all keyed by cell id):
    A. expand: join edge readers (i -> n1) with n1's stored list -> (i, n2);
    B. validate: drop candidates whose n2 has no cell row;
    C. finalize: per i, dedupe / exclude self + ring-1 / truncate to 12.
    """

    # --- A: key = n1; kind 0 rows carry n1's list entries, kind 1 rows the readers
    n_parts = default_parts() if n_parts is None else n_parts
    def expand_rows(batch: pa.Table) -> pa.Table:
        src, counts, flat = _adjacency_flat(batch)
        owners = np.repeat(src, counts)
        lists = _kinded(owners, 0, flat, n_parts)   # key=owner, src=entry
        readers = _kinded(flat, 1, np.repeat(src, counts), n_parts)  # key=n1, src=i
        return pa.concat_tables([lists, readers])

    def join_expand(part: pa.Table) -> pa.Table:
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        src = part.column("src").to_numpy(zero_copy_only=False)
        lm = kind == 0
        lk, lv = key[lm], src[lm]
        rk, ri = key[~lm], src[~lm]
        if len(lk) == 0 or len(rk) == 0:
            return _EDGES_SCHEMA.empty_table()
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        uk, ustart = np.unique(lk, return_index=True)
        ucount = np.diff(np.append(ustart, len(lk)))
        pos = np.searchsorted(uk, rk)
        ok = (pos < len(uk)) & (uk[np.minimum(pos, len(uk) - 1)] == rk)
        ri, pos = ri[ok], pos[ok]
        reps = ucount[pos]  # list length of each reader's key
        total = int(reps.sum())
        if total == 0:
            return _EDGES_SCHEMA.empty_table()
        out_src = np.repeat(ri, reps)
        starts = np.repeat(ustart[pos], reps)
        local = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        out_dst = lv[starts + local]
        return pa.table({"src": pa.array(out_src), "dst": pa.array(out_dst)})

    candidates = (
        ds.map_batches(expand_rows, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(join_expand, batch_format="pyarrow")
    )

    # --- B: key = n2; kind 0 = cell presence, kind 1 = candidate
    def presence_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("cell_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        return _kinded(src, 0, src, n_parts)

    def cand_rows(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return _kinded(dst, 1, batch.column("src").to_numpy(zero_copy_only=False), n_parts)

    def join_validate(part: pa.Table) -> pa.Table:
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        src = part.column("src").to_numpy(zero_copy_only=False)
        lm = kind == 0
        present = np.unique(key[lm])
        ck, ci = key[~lm], src[~lm]
        if len(present) == 0 or len(ck) == 0:
            return _EDGES_SCHEMA.empty_table()
        pos = np.searchsorted(present, ck)
        ok = (pos < len(present)) & (present[np.minimum(pos, len(present) - 1)] == ck)
        return pa.table({"src": pa.array(ci[ok]), "dst": pa.array(ck[ok])})

    presence = ds.map_batches(presence_rows, batch_format="pyarrow", batch_size=None)
    validated = (
        presence.union(candidates.map_batches(cand_rows, batch_format="pyarrow", batch_size=None))
        .groupby("__part")
        .map_groups(join_validate, batch_format="pyarrow")
    )

    # --- C: key = i; kind 0 = raw ring-1 entries of i, kind 1 = validated n2
    def ring1_rows(batch: pa.Table) -> pa.Table:
        src, counts, flat = _adjacency_flat(batch)
        return _kinded(np.repeat(src, counts), 0, flat, n_parts)

    def cand_by_src(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return _kinded(src, 1, batch.column("dst").to_numpy(zero_copy_only=False), n_parts)

    def finalize(part: pa.Table) -> pa.Table:
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        src = part.column("src").to_numpy(zero_copy_only=False)
        lm = kind == 0
        # validated dsts are real cell ids (>= 0, < 2^31): pack (i, dst)
        ck, cd = key[~lm], src[~lm]
        if len(ck) == 0:
            return _EDGES_SCHEMA.empty_table()
        cand_pk = np.unique((ck << np.int64(31)) | cd)  # sorted (i, dst) asc
        ek, ed = key[lm], src[lm]
        valid_e = (ed >= 0) & (ed < (1 << 31))
        excl_pk = (ek[valid_e] << np.int64(31)) | ed[valid_e]
        i_of = cand_pk >> np.int64(31)
        d_of = cand_pk & np.int64((1 << 31) - 1)
        keep = (d_of != i_of) & ~np.isin(cand_pk, excl_pk)
        i_of, d_of = i_of[keep], d_of[keep]
        # truncate to the 12 smallest dst per i (std::set order + padded write)
        _, first, counts = np.unique(i_of, return_index=True, return_counts=True)
        rank = np.arange(len(i_of)) - np.repeat(first, counts)
        keep2 = rank < MAX_NEIGHBORS_2ND
        return pa.table({"src": pa.array(i_of[keep2]), "dst": pa.array(d_of[keep2])})

    return (
        ds.map_batches(ring1_rows, batch_format="pyarrow", batch_size=None)
        .union(validated.map_batches(cand_by_src, batch_format="pyarrow", batch_size=None))
        .groupby("__part")
        .map_groups(finalize, batch_format="pyarrow")
    )


def graph_smooth(ds, profile: str = "uniform", value_col: str = "ndvi",
                 value_cols: list[str] | None = None, k: int = 1,
                 n_parts: int | None = None):
    """Dataset(cell_idx, <value cols>, neighbors:list<int32>) -> smoothed.

    Single variable (default): output (cell_idx, smoothed).
    Fused multi-variable (``value_cols=[...]``): output (cell_idx,
    <col>_sm ...) — all columns share one edge expansion, one value-gather
    join and one shuffle (the reference's fusion win, K5-K7).
    ``k=2`` adds the derived 2nd-order ring (weights per ``profile``).
    """
    n_parts = default_parts() if n_parts is None else n_parts
    cols = list(value_cols) if value_cols is not None else [value_col]
    fused = value_cols is not None
    w = ring_weights(profile, k)

    def edge_rows(batch: pa.Table) -> pa.Table:
        src, counts, flat = _adjacency_flat(batch)
        key = np.concatenate([src, flat])
        esrc = np.concatenate([src, np.repeat(src, counts)])
        ew = np.concatenate([np.full(len(src), w[0]), np.full(len(flat), w[1])])
        t = pa.table(
            {
                "key": pa.array(key),
                "kind": pa.array(np.ones(len(key), np.int8)),
                "src": pa.array(esrc),
                "w": pa.array(ew),
            }
        )
        for c in cols:
            t = t.append_column(f"v_{c}", pa.array(np.zeros(len(key))))
        return t.append_column("__part", pa.array(_part_of(key, n_parts).astype(np.int64)))

    def ring2_edge_rows(batch: pa.Table) -> pa.Table:
        key = batch.column("dst").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "key": pa.array(key),
                "kind": pa.array(np.ones(len(key), np.int8)),
                "src": batch.column("src"),
                "w": pa.array(np.full(len(key), w[2])),
            }
        )
        for c in cols:
            t = t.append_column(f"v_{c}", pa.array(np.zeros(len(key))))
        return t.append_column("__part", pa.array(_part_of(key, n_parts).astype(np.int64)))

    def value_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("cell_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "key": pa.array(src),
                "kind": pa.array(np.zeros(len(src), np.int8)),
                "src": pa.array(src),
                "w": pa.array(np.zeros(len(src))),
            }
        )
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            t = t.append_column(f"v_{c}", pa.array(v))
        return t.append_column("__part", pa.array(_part_of(src, n_parts).astype(np.int64)))

    def gather(part: pa.Table) -> pa.Table:
        """Sort-merge the partition: each edge reads its key's value row;
        dangling keys (no value row) contribute nothing (M1)."""
        kind = part.column("kind").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        lm = kind == 0
        vk = key[lm]
        order = np.argsort(vk, kind="stable")
        vk = vk[order]
        ek, esrc = key[~lm], part.column("src").to_numpy(zero_copy_only=False)[~lm]
        ew = part.column("w").to_numpy(zero_copy_only=False)[~lm]
        pos = np.searchsorted(vk, ek)
        ok = (pos < len(vk)) & (vk[np.minimum(pos, max(len(vk) - 1, 0))] == ek) if len(vk) else np.zeros(len(ek), bool)
        out = {
            "src": pa.array(esrc[ok]),
            "w": pa.array(ew[ok]),
        }
        for c in cols:
            v = part.column(f"v_{c}").to_numpy(zero_copy_only=False)[lm][order]
            out[f"wv_{c}"] = pa.array(ew[ok] * v[pos[ok]])
        return pa.table(out)

    edges = ds.map_batches(edge_rows, batch_format="pyarrow", batch_size=None)
    if k == 2:
        r2 = second_order_edges(ds, n_parts)
        edges = edges.union(r2.map_batches(ring2_edge_rows, batch_format="pyarrow", batch_size=None))
    vals = ds.map_batches(value_rows, batch_format="pyarrow", batch_size=None)

    from ..functions.reduce import hash_groupby_sum

    contribs = (
        edges.union(vals).groupby("__part").map_groups(gather, batch_format="pyarrow")
    )
    reduced = hash_groupby_sum(contribs, "src", ["w"] + [f"wv_{c}" for c in cols],
                               n_parts=n_parts)

    def finalize(batch: pa.Table) -> pa.Table:
        ws = batch.column("w").to_numpy(zero_copy_only=False)
        out = {"cell_idx": batch.column("src")}
        for c in cols:
            wv = batch.column(f"wv_{c}").to_numpy(zero_copy_only=False)
            out["smoothed" if not fused else f"{c}_sm"] = pa.array(wv / ws)
        return pa.table(out)

    return reduced.map_batches(finalize, batch_format="pyarrow")


def second_order_numpy(neighbors: list[list[int]]) -> list[list[int]]:
    """Single-process oracle of the reference's 2nd-order derivation
    (``hex_smooth_cuda_v5.cu:423-463``) for golden diffs."""
    n = len(neighbors)
    out = []
    for i in range(n):
        s: set[int] = set()
        for n1 in neighbors[i]:
            if 0 <= n1 < n:
                for n2 in neighbors[n1]:
                    if 0 <= n2 < n and n2 != i and n2 not in neighbors[i]:
                        s.add(n2)
    # std::set iterates ascending; padded write keeps the first 12
        out.append(sorted(s)[:MAX_NEIGHBORS_2ND])
    return out


def graph_smooth_numpy(ndvi: np.ndarray, neighbors: list[list[int]],
                       profile: str = "uniform", k: int = 1) -> np.ndarray:
    """Single-process oracle — a literal transcription of the reference's
    accumulation loops (``hex_smooth_naive.cpp:48-83`` for ring-1,
    ``hex_smooth_cuda_v5.cu:146-170`` for both-orders) for golden diffs."""
    w = ring_weights(profile, k)
    n = len(ndvi)
    ring2 = second_order_numpy(neighbors) if k == 2 else None
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        ws, wv = w[0], w[0] * ndvi[i]
        for j in neighbors[i]:
            if 0 <= j < n:
                ws += w[1]
                wv += w[1] * ndvi[j]
        if ring2 is not None:
            for j in ring2[i]:
                ws += w[2]
                wv += w[2] * ndvi[j]
        out[i] = wv / ws
    return out
