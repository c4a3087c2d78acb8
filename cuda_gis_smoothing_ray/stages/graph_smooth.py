"""K-family smoothing over an EXPLICIT adjacency graph — the reference's
actual data model (stored neighbor lists, ``hex_smooth_naive.cpp:9-12``),
for grids whose adjacency is NOT derivable from a cell id (arbitrary
graphs, the reference's ``hex_data.bin``).

Ray Data has no join operator, so the neighbor-value gather
(``values[neighbor_idx]``, ``hex_smooth_cuda_v1.cu:51-53``) becomes a
groupby-based repartition join:

1. explode adjacency into edge rows ``(src, dst)`` + self edges (weight w0);
2. union edge rows with value rows, both keyed by the VALUE-side id;
3. ``groupby(key).map_groups``: each group holds one cell's value + every
   edge that reads it -> emit ``(src, value, weight)`` contributions;
4. ``groupby(src)``: weighted-mean reduce (same math as stages/smooth.py).

Out-of-range neighbor ids simply find no value row in step 3 and contribute
nothing — the reference's bounds check (M1, ``hex_smooth_naive.cpp:55``)
falls out of the join semantics.

Scale: both shuffles are keyed by cell id (bounded, uniform for <=6-degree
grids); no broadcast, no driver materialization — works for graphs of any
size.  Weight constants come from :mod:`..functions.weights` (center 1.0,
ring-1 0.6065 Gaussian / 1.0 uniform — ``hex_smooth_cuda_v5.cu:37-39``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.weights import ring_weights


def graph_smooth(ds, profile: str = "uniform", value_col: str = "ndvi"):
    """Dataset(cell_idx, <value_col>, neighbors:list<int32>) ->
    Dataset(cell_idx, smoothed) — one K1/K2 sweep."""
    w0, w1 = (float(x) for x in ring_weights(profile, 1))

    def explode(batch: pa.Table) -> pa.Table:
        src = batch.column("cell_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        neigh = batch.column("neighbors")
        if isinstance(neigh, pa.ChunkedArray):
            neigh = neigh.combine_chunks()
        offs = neigh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = neigh.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        counts = offs[1:] - offs[:-1]
        # edge rows keyed by the value they read (dst); value rows keyed by
        # themselves.  kind 0 = value carrier, 1 = edge reader.
        edge_src = np.repeat(src, counts)
        key = np.concatenate([src, src, flat])
        kind = np.concatenate(
            [np.zeros(len(src), np.int8), np.ones(len(src), np.int8),
             np.ones(len(flat), np.int8)]
        )
        esrc = np.concatenate([src, src, edge_src])  # for kind=1: reader id
        weight = np.concatenate(
            [np.zeros(len(src)), np.full(len(src), w0), np.full(len(flat), w1)]
        )
        value = np.concatenate([val, np.zeros(len(src)), np.zeros(len(flat))])
        return pa.table(
            {
                "key": pa.array(key),
                "kind": pa.array(kind),
                "src": pa.array(esrc),
                "w": pa.array(weight),
                "v": pa.array(value),
            }
        )

    def emit_contribs(group: pd.DataFrame) -> pd.DataFrame:
        vals = group[group["kind"] == 0]
        if len(vals) == 0:  # dangling neighbor id: contributes nothing (M1)
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "wv": pd.Series([], dtype="float64"),
                                 "w": pd.Series([], dtype="float64")})
        v = float(vals["v"].iloc[0])
        readers = group[group["kind"] == 1]
        return pd.DataFrame(
            {
                "src": readers["src"].to_numpy(dtype=np.int64),
                "wv": readers["w"].to_numpy() * v,
                "w": readers["w"].to_numpy(),
            }
        )

    from ray.data.aggregate import Sum

    contribs = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby("key")
        .map_groups(emit_contribs)
        .groupby("src")
        .aggregate(Sum("wv", alias_name="wv"), Sum("w", alias_name="w"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_idx": batch.column("src"),
                "smoothed": pa.array(
                    batch.column("wv").to_numpy(zero_copy_only=False)
                    / batch.column("w").to_numpy(zero_copy_only=False)
                ),
            }
        )

    return contribs.map_batches(finalize, batch_format="pyarrow")


def graph_smooth_numpy(ndvi: np.ndarray, neighbors: list[list[int]],
                       profile: str = "uniform") -> np.ndarray:
    """Single-process oracle — a literal transcription of the reference's
    accumulation loop (``hex_smooth_naive.cpp:48-83``) for golden diffs."""
    w0, w1 = (float(x) for x in ring_weights(profile, 1))
    n = len(ndvi)
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        ws, wv = w0, w0 * ndvi[i]
        for j in neighbors[i]:
            if 0 <= j < n:
                ws += w1
                wv += w1 * ndvi[j]
        out[i] = wv / ws
    return out
