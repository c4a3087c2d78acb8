"""Reader/writer for the reference's custom binary grid format (S1 in
SURVEY §2.1): little-endian ``int32 n`` then per cell ``float32 ndvi;
int32 n_neighbors; int32 neighbor_idx * n_neighbors``
(``src/cpu/hex_smooth_naive.cpp:26-42``) — so a user of the reference can
run their existing ``hex_data.bin`` through this engine unchanged.

Also the S5/S6 sink: one smoothed value per line, headerless CSV, original
cell order (``hex_smooth_naive.cpp:110-116``) for golden-file diffs against
the reference's published outputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HEX_GRAPH_SCHEMA = pa.schema(
    [
        ("cell_idx", pa.int64()),
        ("ndvi", pa.float64()),
        ("neighbors", pa.list_(pa.int32())),
    ]
)


def read_hexbin_table(path: str) -> pa.Table:
    """Parse the whole file -> Arrow table.

    The variable-length record walk is a sequential dependency (each
    record's start depends on the previous count), so it is one int-only
    Python loop over cells; every value/neighbor gather after it is a
    vectorized numpy pass."""
    raw = np.fromfile(path, dtype=np.int32)
    n = int(raw[0])
    # walk the variable-length records once to find offsets (cheap: n ints)
    counts = np.empty(n, dtype=np.int64)
    pos = 1
    for i in range(n):
        counts[i] = raw[pos + 1]
        pos += 2 + counts[i]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # record start index of each cell: 1 + 2*i + prefix_neighbors
    starts = 1 + 2 * np.arange(n, dtype=np.int64) + offsets[:-1]
    ndvi = raw.view(np.float32)[starts].astype(np.float64)
    # gather all neighbor ids: for each cell, indices starts[i]+2 .. +2+counts[i]
    idx = np.repeat(starts + 2, counts) + (
        np.arange(offsets[-1]) - np.repeat(offsets[:-1], counts)
    )
    flat = raw[idx]
    return pa.table(
        {
            "cell_idx": pa.array(np.arange(n, dtype=np.int64)),
            "ndvi": pa.array(ndvi),
            "neighbors": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
            ),
        },
        schema=HEX_GRAPH_SCHEMA,
    )


def read_hexbin(path: str, parallelism: int = 16):
    """-> Ray Dataset over the parsed grid (split into ``parallelism``
    blocks; the parse itself is a single sequential scan — the format has no
    row groups, which is exactly why the engine's native format is Parquet)."""
    import ray.data as rd

    t = read_hexbin_table(path)
    ds = rd.from_arrow(t)
    return ds.repartition(min(parallelism, max(1, t.num_rows // 64 or 1)))


def write_hexbin(table: pa.Table, path: str) -> None:
    """Arrow grid table -> reference binary format (byte-exact round-trip)."""
    t = table.sort_by("cell_idx")
    n = t.num_rows
    ndvi = t.column("ndvi").to_numpy(zero_copy_only=False).astype(np.float32)
    neigh = t.column("neighbors")
    if isinstance(neigh, pa.ChunkedArray):
        neigh = neigh.combine_chunks()
    offsets = neigh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = neigh.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    counts = (offsets[1:] - offsets[:-1]).astype(np.int32)
    total = 1 + 2 * n + len(flat)
    out = np.empty(total, dtype=np.int32)
    out[0] = n
    starts = 1 + 2 * np.arange(n, dtype=np.int64) + offsets[:-1]
    out.view(np.float32)[starts] = ndvi
    out[starts + 1] = counts
    idx = np.repeat(starts + 2, counts) + (
        np.arange(offsets[-1]) - np.repeat(offsets[:-1], counts)
    )
    out[idx] = flat
    out.tofile(path)


def save_results_csv(values_in_cell_order: np.ndarray, path: str) -> None:
    """S5 sink: one value per line, 6 decimals, original order
    (``hex_smooth_naive.cpp:110-116`` uses default float formatting; we pin
    6 decimals for diffable goldens)."""
    np.savetxt(path, values_in_cell_order, fmt="%.6f")


def make_demo_grid(n_side: int = 40, seed: int = 42) -> pa.Table:
    """Deterministic axial-hex demo grid with the reference's structure
    (<=6 neighbors, boundary cells fewer, values in [0,1)) for fixtures."""
    rng = np.random.default_rng(seed)
    n = n_side * n_side
    q, r = np.divmod(np.arange(n), n_side)
    coord_to_idx = {(int(qq), int(rr)): i for i, (qq, rr) in enumerate(zip(q, r))}
    offs = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
    neighbors = []
    for i in range(n):
        lst = []
        for dq, dr in offs:
            j = coord_to_idx.get((int(q[i]) + dq, int(r[i]) + dr))
            if j is not None:
                lst.append(j)
        neighbors.append(lst)
    return pa.table(
        {
            "cell_idx": pa.array(np.arange(n, dtype=np.int64)),
            "ndvi": pa.array(rng.random(n)),
            "neighbors": pa.array(neighbors, pa.list_(pa.int32())),
        },
        schema=HEX_GRAPH_SCHEMA,
    )
