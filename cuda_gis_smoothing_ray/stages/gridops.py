"""Grid-level operators beyond the smoothing kernels: multi-resolution
encoding (res 5..9 in one pass), raster->vector tile polygons, scalable
top-k, and deterministic hash sampling.

Reference parity notes:

* Multi-resolution encode realizes the north-star requirement "encoded to H3
  cells at resolutions 5-9" as ONE streamed pass: each page's (lat, lon) is
  encoded at every resolution inside a single ``map_batches`` (the per-page
  work is 5 vectorized transforms over the same Arrow batch — the analog of
  the reference's fused multi-variable kernels, ``hex_smooth_cuda_v4.cu:59-111``,
  which amortize one gather over several outputs).  Because ``hexgrid.pack``
  stores the resolution in the id's top byte, the five per-res count tables
  reduce through ONE cell-keyed shuffle (``functions.reduce.hash_groupby``),
  not five.
* ``tile_vector`` closes the raster<->vector loop from the north rule:
  ``tile_assign`` (in ``__ray_entry__``) is vector->raster; this is the
  inverse — per-tile aggregate plus the tile's polygon (west/south/east/north
  bounds in degrees), i.e. vectorizing the raster.
* ``topk`` / ``sample_hash`` are the §2.6 gaps the reference simply lacks
  ("No limits, top-k, sampling ... in the reference" — SURVEY §2.6): top-k is
  per-block local top-k then a single-partition merge (never a full sort);
  sampling is a deterministic multiplicative-hash Bernoulli filter so the
  DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hexgrid
from ..functions.reduce import hash_groupby
from ..functions.scale import default_parts

RES_ALL = tuple(range(hexgrid.RES_MIN, hexgrid.RES_MAX + 1))  # 5..9

# sample_hash constants (mirrored in sql/oracles.py::sample_pages_sql)
SAMPLE_MULT = 2654435761  # Knuth multiplicative constant, < 2^32
SAMPLE_MOD = 1_000_000


def multires_counts(geocoded, resolutions=RES_ALL, n_parts: int | None = None):
    """geocoded(lat, lon, ...) -> (res, cell, page_count) for every res.

    One map_batches emits the concatenated per-res cell ids (fan-out x5 on a
    16-byte row — tiny next to the dropped text column), then one hash-
    partitioned vectorized count reduce; res is recovered from the id's top
    byte afterwards.  At 100 TB the shuffle moves only (cell, partial-count)
    rows because counts pre-aggregate per batch below.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    rs = tuple(resolutions)

    def expand(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cells = np.concatenate([hexgrid.latlon_to_cell(lat, lon, r) for r in rs])
        # batch-local pre-aggregation: shuffle partial counts, not pages
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "page_count": pa.array(cnt.astype(np.int64))})

    counts = hash_groupby(
        geocoded.map_batches(expand, batch_format="pyarrow"),
        "cell",
        ["page_count"],
        how="sum",
        n_parts=n_parts,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        res = cell >> np.int64(56)
        n = batch.column("page_count").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "res": pa.array(res),
                "cell": pa.array(cell),
                "page_count": pa.array(n.astype(np.int64)),
            }
        )

    return counts.map_batches(finalize, batch_format="pyarrow")


def tile_vector(geocoded, zoom: int, n_parts: int | None = None):
    """geocoded -> per-tile (tile_id, tile_x, tile_y, page_count, west,
    south, east, north): the raster grid re-emitted as vector bounding
    polygons (axis-aligned; corners listed as W/S/E/N degree bounds).
    """
    n_parts = default_parts() if n_parts is None else n_parts
    n = 1 << zoom

    def assign(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        ty = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
        tid = ty * n + tx
        uniq, cnt = np.unique(tid, return_counts=True)
        return pa.table(
            {"tile_id": pa.array(uniq), "page_count": pa.array(cnt.astype(np.int64))}
        )

    counts = hash_groupby(
        geocoded.map_batches(assign, batch_format="pyarrow"),
        "tile_id",
        ["page_count"],
        how="sum",
        n_parts=n_parts,
    )

    def vectorize(batch: pa.Table) -> pa.Table:
        tid = batch.column("tile_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = batch.column("page_count").to_numpy(zero_copy_only=False).astype(np.int64)
        tx = tid % n
        ty = tid // n
        west = tx.astype(np.float64) / n * 360.0 - 180.0
        east = (tx + 1).astype(np.float64) / n * 360.0 - 180.0
        north = 90.0 - ty.astype(np.float64) / n * 180.0
        south = 90.0 - (ty + 1).astype(np.float64) / n * 180.0
        return pa.table(
            {
                "tile_id": pa.array(tid),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "page_count": pa.array(cnt),
                "west": pa.array(west),
                "south": pa.array(south),
                "east": pa.array(east),
                "north": pa.array(north),
            }
        )

    return counts.map_batches(vectorize, batch_format="pyarrow")


def topk(ds, k: int, by: str, tie_cols: tuple[str, ...] = ()):
    """Scalable descending top-k: per-block local top-k (map_batches), then a
    single-partition merge.  Moves at most ``k * n_blocks`` rows through the
    shuffle — never sorts the dataset.  Ties break ascending on ``tie_cols``
    so the result is deterministic and oracle-comparable.
    """
    cols = [by, *tie_cols]
    asc = [False] + [True] * len(tie_cols)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(cols, ascending=asc, kind="mergesort").head(k)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return (
        ds.map_batches(local, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def sample_hash(ds, id_col: str, keep_ppm: int, mult: int = SAMPLE_MULT, mod: int = SAMPLE_MOD):
    """Deterministic Bernoulli sample: keep rows where
    ``(id * mult) % mod < keep_ppm`` (keep_ppm per million).  Pure filter —
    streams, no shuffle; identical row set in SQL, so it is an oracle-checked
    sampling operator (unlike ``ds.random_sample``, whose RNG is not
    reproducible across engines).
    """

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # (id % mod) * (mult % mod) stays < 1e12: no int64 overflow at any id
        # (DuckDB BIGINT errors on overflow; numpy silently wraps — neither ok)
        keep = ((ids % mod) * (mult % mod)) % mod < keep_ppm
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds,
    group_col: str,
    id_col: str,
    rates_ppm: dict[str, int],
    default_ppm: int = 0,
    mult: int = SAMPLE_MULT,
    mod: int = SAMPLE_MOD,
):
    """Deterministic STRATIFIED sample: per-group keep rates (ppm), e.g.
    down-sample dominant languages while keeping all of a rare one — the
    standard corpus-rebalancing op.  The rates table is tiny and rides into
    the closure (broadcast once per task by Ray's capture, never shuffled);
    the per-row decision reuses sample_hash's exact integer hash so the row
    set is oracle-checkable in SQL.  Pure filter: streams, no shuffle, and
    at 100 TB the output is written partition-by-partition like any map op.
    """
    keys = pa.array(list(rates_ppm.keys()), pa.string())
    # unmatched groups -> index len(rates): the default_ppm slot
    vals = pa.array(list(rates_ppm.values()) + [default_ppm], pa.int64())

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(
            pc.index_in(batch.column(group_col), value_set=keys), len(rates_ppm)
        )
        ppm = pc.take(vals, idx).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((ids % mod) * (mult % mod)) % mod < ppm
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_topk(ds, group_col: str, key_col: str, by: str, k: int):
    """Per-group descending top-k (e.g. top hosts per language).

    Two-phase: batch-local (group, key) partial counts shrink the shuffle,
    one groupby over (group, key) completes the counts, then a per-group
    local top-k via ``map_groups`` (each group's distinct-key table fits a
    worker by the same assumption every engine makes for per-group ops).
    Ties break ascending on ``key_col``; emits ``rank`` 1..k per group.
    """

    from ..functions import hashing

    def _pair_part(g: np.ndarray, key: np.ndarray) -> np.ndarray:
        # coarse partition on the (group, key) PAIR — generic over dtypes
        # via the string render + poly_hash64 (partition-only, like every
        # string partitioner in the engine)
        pair = pa.array(np.char.add(np.char.add(
            g.astype(str), "\x1f"), key.astype(str)))
        h = hashing.poly_hash64(pair).view(np.int64)
        return hashing.coarse_partition(h, 64)

    def local(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_numpy(zero_copy_only=False),
                key_col: batch.column(key_col).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([group_col, key_col], sort=False).size().reset_index(name=by)
        g["__part"] = _pair_part(g[group_col].to_numpy(), g[key_col].to_numpy())
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish_counts(df: pd.DataFrame) -> pd.DataFrame:
        # all partials of a (group, key) pair land here: ONE vectorized
        # groupby-sum per partition — never Ray's native many-key
        # aggregate (measured ~12 s / 158k rows x 64 blocks, scaling with
        # blocks x distinct keys)
        out = df.groupby([group_col, key_col], sort=False)[by].sum() \
            .reset_index()
        return out

    counts = (
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(finish_counts, batch_format="pandas")
    )

    def head(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values([by, key_col], ascending=[False, True], kind="mergesort").head(k)
        out = out.reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[[group_col, "rank", key_col, by]]

    return counts.groupby(group_col).map_groups(head)


def morton_locality(cells_ds):
    """A5 locality metric (``hex_smooth_cuda_v5.cu:551-559``) for Morton
    order — see :func:`_curve_locality`."""
    return _curve_locality(cells_ds, "morton", hexgrid.morton_key)


def hilbert_locality(cells_ds):
    """The A5 locality metric for HILBERT order — the layout experiment the
    reference's Morton study points at next (Hilbert preserves neighbor
    locality strictly better than Z-order on average)."""
    return _curve_locality(cells_ds, "hilbert", hexgrid.hilbert_key)


def _curve_locality(cells_ds, key_name: str, key_fn):
    """Average |original index difference| between consecutive cells in
    space-filling-curve order (``key_fn`` over (q, r)), original index =
    rank in cell-id order (the canonical layout).

    Distributed shape: two sorts over the CELL table (already aggregated,
    bounded by distinct-cell count); the driver only ever holds ONE summary
    row per block — never the cell table itself.  Global ranks come from
    per-block offsets (blocks are disjoint key ranges after a sort);
    consecutive-pair distances are summed inside each block vectorized, and
    the #blocks-1 boundary pairs are stitched driver-side from the
    summaries.  -> one-row table (avg_distance, n_pairs)."""

    # pass A: rank by cell id
    by_cell = cells_ds.select_columns(["cell"]).sort("cell").materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"min_cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = batch.column("cell").to_numpy(zero_copy_only=False)
        return pa.table({"min_cell": pa.array([int(c[0])]),
                         "n": pa.array([len(c)], pa.int64())})

    sums = sorted(
        by_cell.map_batches(block_summary, batch_format="pyarrow",
                            batch_size=None).take_all(),
        key=lambda r: r["min_cell"],
    )
    start = {}
    acc = 0
    for r in sums:
        start[int(r["min_cell"])] = acc
        acc += int(r["n"])

    def assign_rank(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        c = batch.column("cell").to_numpy(zero_copy_only=False)
        off = start[int(c[0])]
        return pa.table(
            {"cell": batch.column("cell"),
             "rank": pa.array(off + np.arange(len(c), dtype=np.int64))}
        )

    ranked = by_cell.map_batches(assign_rank, batch_format="pyarrow", batch_size=None)

    # pass B: curve order; per-block partials + boundary stitching
    def add_key(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        _, q, r = hexgrid.unpack(cell)
        return batch.append_column(key_name, pa.array(key_fn(q, r)))

    by_morton = (
        ranked.map_batches(add_key, batch_format="pyarrow")
        .sort([key_name, "cell"])
        .materialize()
    )

    def dist_summary(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"min_morton": pa.array([], pa.int64()), "min_cell": pa.array([], pa.int64()),
             "first_rank": pa.array([], pa.int64()), "last_rank": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()), "dist_sum": pa.array([], pa.int64())}
        )
        if len(batch) == 0:
            return empty
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_morton": pa.array([int(batch.column(key_name)[0].as_py())]),
                "min_cell": pa.array([int(batch.column("cell")[0].as_py())]),
                "first_rank": pa.array([int(rk[0])]),
                "last_rank": pa.array([int(rk[-1])]),
                "n": pa.array([len(rk)], pa.int64()),
                "dist_sum": pa.array([int(np.abs(np.diff(rk)).sum()) if len(rk) > 1 else 0]),
            }
        )

    parts = sorted(
        by_morton.map_batches(dist_summary, batch_format="pyarrow",
                              batch_size=None).take_all(),
        key=lambda r: (r["min_morton"], r["min_cell"]),
    )
    total = sum(int(r["dist_sum"]) for r in parts)
    n_rows = sum(int(r["n"]) for r in parts)
    for prev, cur in zip(parts, parts[1:]):
        total += abs(int(cur["first_rank"]) - int(prev["last_rank"]))
    n_pairs = max(n_rows - 1, 0)
    avg = total / n_pairs if n_pairs else 0.0
    return pa.table(
        {
            "avg_distance": pa.array([np.floor(avg * 1e6 + 0.5) / 1e6]),
            "n_pairs": pa.array([n_pairs], pa.int64()),
        }
    )


def cell_counts(geocoded, n_parts: int | None = None):
    """geocoded -> distinct (cell, page_count): batch-local ``np.unique``
    partials, one bounded hash-partition sum — the light cell table every
    hex-API op below starts from (no metric columns computed)."""

    n_parts = default_parts() if n_parts is None else n_parts
    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq), "page_count": pa.array(cnt.astype(np.int64))}
        )

    return hash_groupby(
        geocoded.map_batches(partial, batch_format="pyarrow"),
        "cell", ["page_count"], how="isum", n_parts=n_parts,
    )


#: pointy-top hex corner multipliers: vertex i at
#: (clat + FL[i]*s/2, clon + FW[i]*(s*sqrt(3)/2)); circumradius = edge = s.
_CORNER_FL = np.array([2, 1, -1, -2, -1, 1], dtype=np.int64)
_CORNER_FW = np.array([0, 1, 1, 0, -1, -1], dtype=np.int64)


def cell_boundary(geocoded, n_parts: int | None = None):
    """H3 ``cell_to_boundary`` analog: the 6 vertex coordinates of every
    distinct populated cell -> (cell, vertex, vlat, vlon)."""

    n_parts = default_parts() if n_parts is None else n_parts
    def vertices(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        s = hexgrid.edge_size(res0)
        clat, clon = hexgrid.axial_to_latlon(q, r, res0)
        n = len(cell)
        vlat = clat[:, None] + _CORNER_FL[None, :] * s / 2.0
        vlon = clon[:, None] + _CORNER_FW[None, :] * (s * hexgrid.SQRT3 / 2.0)
        return pa.table(
            {
                "cell": pa.array(np.repeat(cell, 6)),
                "vertex": pa.array(np.tile(np.arange(6, dtype=np.int64), n)),
                "vlat": pa.array(np.floor(vlat.ravel() * 1e6 + 0.5) / 1e6),
                "vlon": pa.array(np.floor(vlon.ravel() * 1e6 + 0.5) / 1e6),
            }
        )

    return cell_counts(geocoded, n_parts).map_batches(vertices, batch_format="pyarrow")


def cell_parent_rollup(geocoded, parent_res: int, n_parts: int | None = None):
    """H3 ``cell_to_parent`` analog + hierarchy rollup: re-encode each
    populated cell's CENTER at ``parent_res`` and aggregate ->
    (parent_cell, n_children, n_pages).

    The parent relation is arithmetic (center re-encode with the shared
    cube-rounding), so the rollup is one bounded shuffle of distinct-cell
    rows — pages never reshuffle."""

    n_parts = default_parts() if n_parts is None else n_parts
    def to_parent(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        clat, clon = hexgrid.axial_to_latlon(q, r, res0)
        parent = hexgrid.latlon_to_cell(clat, clon, parent_res)
        uniq, inv = np.unique(parent, return_inverse=True)
        nch = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        npg = np.bincount(
            inv,
            weights=batch.column("page_count").to_numpy(zero_copy_only=False).astype(np.float64),
            minlength=len(uniq),
        ).astype(np.int64)
        return pa.table(
            {
                "parent_cell": pa.array(uniq),
                "n_children": pa.array(nch),
                "n_pages": pa.array(npg),
            }
        )

    return hash_groupby(
        cell_counts(geocoded, n_parts).map_batches(to_parent, batch_format="pyarrow"),
        "parent_cell", ["n_children", "n_pages"], how="isum", n_parts=n_parts,
    )


def grid_disk(geocoded, k: int = 1, n_parts: int | None = None):
    """H3 ``grid_disk`` analog: for every distinct populated cell, all cells
    at hex distance <= k with their ring index -> (cell, neighbor, ring).
    Pure integer offset arithmetic (no adjacency stored), mirroring the
    smoothing kernels' neighbor derivation."""
    n_parts = default_parts() if n_parts is None else n_parts
    offs = [(0, 0, 0)]
    for ring in range(1, k + 1):
        offs += [(dq, dr, ring) for dq, dr in hexgrid.ring_offsets(ring)]
    dq = np.array([o[0] for o in offs], dtype=np.int64)
    dr = np.array([o[1] for o in offs], dtype=np.int64)
    rg = np.array([o[2] for o in offs], dtype=np.int64)

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        n, m = len(cell), len(dq)
        neighbor = hexgrid.pack(res0, q[:, None] + dq[None, :], r[:, None] + dr[None, :])
        return pa.table(
            {
                "cell": pa.array(np.repeat(cell, m)),
                "neighbor": pa.array(neighbor.ravel()),
                "ring": pa.array(np.tile(rg, n)),
            }
        )

    return cell_counts(geocoded, n_parts).map_batches(expand, batch_format="pyarrow")


#: geohash base-32 alphabet (standard; no a/i/l/o).
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_BYTES = np.frombuffer(_B32.encode(), dtype=np.uint8)


def geohash_encode(geocoded, precision: int = 6, id_col: str = "page_id"):
    """Standard geohash string per page (precision chars, 5 bits each).

    Bit-exact across engines: quantize lon/lat to ``5*precision/2`` bits,
    Morton-interleave (lon takes the even=leading bits, per the geohash
    spec), then slice 5-bit groups into the base-32 alphabet.  The SQL
    oracle reuses the integer Morton spread, so the string is reproduced
    character-for-character.  Pure streaming map — no shuffle."""
    if precision != 6:
        raise ValueError("precision 6 (30 bits) is the SQL-mirrored variant")
    nbits = 15  # per axis

    def encode(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lon_q = np.minimum(np.floor((lon + 180.0) / 360.0 * 32768.0), 32767.0).astype(np.int64)
        lat_q = np.minimum(np.floor((lat + 90.0) / 180.0 * 32768.0), 32767.0).astype(np.int64)

        def spread(v):
            v = v & np.int64(0xFFFF)
            v = (v | (v << np.int64(8))) & np.int64(0x00FF00FF)
            v = (v | (v << np.int64(4))) & np.int64(0x0F0F0F0F)
            v = (v | (v << np.int64(2))) & np.int64(0x33333333)
            v = (v | (v << np.int64(1))) & np.int64(0x55555555)
            return v

        g = (spread(lon_q) << np.int64(1)) | spread(lat_q)  # 30 bits, lon leads
        codes = np.empty((len(g), 6), dtype=np.uint8)
        for c in range(6):
            codes[:, c] = _B32_BYTES[(g >> np.int64(25 - 5 * c)) & np.int64(31)]
        gh = codes.view(f"S6").ravel().astype("U6")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "geohash": pa.array(gh),
            }
        )

    return geocoded.map_batches(encode, batch_format="pyarrow")


def grid_distance_field(cells_ds):
    """Cell table -> (cell, dist_to_hotspot): axial hex-grid distance from
    every cell to the densest cell (max page_count, ties -> min cell id) —
    the H3 ``grid_distance`` analog as a whole-surface field.  Finding the
    hotspot is a 1-row top-k (local top-k + tiny merge, never a full
    sort); the distance map is then a pure streaming batch transform with
    the hotspot coords as closure constants."""
    hot = topk(
        cells_ds.select_columns(["cell", "page_count"]), 1,
        by="page_count", tie_cols=("cell",),
    ).take_all()
    _, hq_arr, hr_arr = hexgrid.unpack(np.array([hot[0]["cell"]], dtype=np.int64))
    hq, hr = int(hq_arr[0]), int(hr_arr[0])

    def f(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        _, q, r = hexgrid.unpack(cell)
        return pa.table(
            {
                "cell": pa.array(cell),
                "dist_to_hotspot": pa.array(hexgrid.hex_distance(q, r, hq, hr)),
            }
        )

    return cells_ds.map_batches(f, batch_format="pyarrow")


def grid_path(cells_ds) -> pa.Table:
    """Hex line between the two densest cells (H3 ``grid_path_cells``
    analog): cube-coordinate lerp at t = i/N for i in 0..N (N = hex
    distance) rounded with the shared :func:`..functions.hexgrid._cube_round`
    — identical floor(x+0.5) + tie-fix chain as the geocoder, so the SQL
    oracle reproduces every intermediate.  Endpoint discovery is a 2-row
    top-k; the path itself is aggregate-sized (<= grid diameter rows), so
    it computes driver-side like every scalar-result op."""
    top2 = topk(
        cells_ds.select_columns(["cell", "page_count"]), 2,
        by="page_count", tie_cols=("cell",),
    ).take_all()
    if len(top2) < 2:
        raise ValueError("grid_path needs >= 2 cells")
    ends = np.array([top2[0]["cell"], top2[1]["cell"]], dtype=np.int64)
    res, qe, re_ = hexgrid.unpack(ends)
    q1, r1, q2, r2 = int(qe[0]), int(re_[0]), int(qe[1]), int(re_[1])
    n = int(hexgrid.hex_distance(q1, r1, q2, r2))
    i = np.arange(n + 1, dtype=np.int64)
    t = i.astype(np.float64) / n if n > 0 else np.zeros(1)
    qf = q1 + (q2 - q1) * t
    rf = r1 + (r2 - r1) * t
    pq, pr = hexgrid._cube_round(qf, rf)
    return pa.table(
        {
            "step": pa.array(i),
            "cell": pa.array(hexgrid.pack(int(res[0]), pq, pr)),
        }
    )


def quality_resample(ds, id_col: str = "doc_id", text_col: str = "text",
                     ppm_per_word: int = 5000,
                     mult: int = SAMPLE_MULT, mod: int = SAMPLE_MOD):
    """Importance resampling by a PER-DOC feature (DoReMi/DSIR-lite): keep
    probability proportional to the doc's word count, capped at 1 —
    ``keep iff (id*mult) % mod < min(mod, word_count * ppm_per_word)``.
    Unlike :func:`stratified_sample` (per-GROUP constant rates) the rate
    here is a function of the row itself, so long documents survive at a
    higher rate (the standard length-debiasing resample).  Deterministic
    integer hash -> SQL-reproducible row set; pure streaming filter."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern_regex(pc.fill_null(batch.column(text_col), ""), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        local = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        wc = np.bincount(local[nonempty], minlength=len(batch)).astype(np.int64)
        ppm = np.minimum(np.int64(mod), wc * np.int64(ppm_per_word))
        keep = ((ids % mod) * (mult % mod)) % mod < ppm
        return batch.filter(pa.array(keep)).append_column(
            "keep_ppm", pa.array(ppm[keep])
        )

    return ds.map_batches(f, batch_format="pyarrow")


def spatiotemporal_counts(geo_ds):
    """Space x crawl-time cube: (cell, day, page_count) over geocoded
    pages — the spatiotemporal aggregation every recurring crawl analysis
    starts from (which areas were captured when, densification over
    snapshots).

    Batch-local partial counts (one pandas groupby inside the batch) mean
    only (cell, day, cnt) partials shuffle — the output is cell-table x
    |distinct days| sized, the same boundedness assumption as any GROUP
    BY report.  ``day`` stays a TIMESTAMP (midnight) for exact
    cross-engine comparison with DuckDB's ``date_trunc('day', ...)``."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("warc_ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype("datetime64[us]")
        df = pd.DataFrame(
            {"cell": batch.column("cell").to_numpy(zero_copy_only=False),
             "day": day}
        )
        g = df.groupby(["cell", "day"], sort=False).size().reset_index(
            name="page_count")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        geo_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell", "day"])
        .aggregate(Sum("page_count", alias_name="page_count"))
    )


def route_corridor(cells_ds, k: int = 1):
    """Corridor query: cells (with their page counts) within ``k`` rings of
    the hex ROUTE between the two densest cells — the compose-three-
    primitives query (grid_path -> k-ring dilation -> cell semi-join) every
    "what's near this route" analysis runs.

    The path and its dilated corridor are aggregate-sized (<= grid diameter
    x ring size) and broadcast in the task closure; the cell table streams
    through one vectorized sorted-membership filter.
    -> (cell, page_count) for corridor cells that have pages."""
    from ..functions import hexgrid

    path = grid_path(cells_ds)
    pcells = path.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    corridor = np.unique(
        hexgrid.kring_cells(pcells, k, include_center=True).ravel())

    def f(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(corridor, cell)
        hit = (pos < len(corridor))
        hit &= np.where(hit, corridor[np.minimum(pos, len(corridor) - 1)] == cell,
                        False)
        return batch.select(["cell", "page_count"]).filter(pa.array(hit))

    return cells_ds.map_batches(f, batch_format="pyarrow")


def mixture_weight(source: str) -> int:
    """Deterministic per-source target weight for :func:`mixture_sample`:
    the numeric suffix of the source name + 1 ('src0' -> 1 ... 'src19' ->
    20) — a skewed target so the reweighting is non-vacuous on the
    uniform synthetic corpus.  SQL twin: CAST(substr(source, 4) AS BIGINT)
    + 1."""
    return int(source[3:]) + 1


def mixture_sample(ds, group_col: str = "source", id_col: str = "doc_id",
                   mult: int = SAMPLE_MULT, mod: int = SAMPLE_MOD):
    """Training-data MIXING (DoReMi-style): resample the corpus so group
    proportions move toward target weights.  Two-phase:

    1. count rows per group (bounded-key shuffle — partial counts only);
    2. acceptance rate per group ∝ target_weight / observed_count, scaled
       so the most-underrepresented group keeps everything:
       ``keep_ppm_s = (1e6 * w_s * n_m) // (n_s * w_m)`` where ``m``
       maximizes ``w/n`` (all-integer once ``m`` is fixed, so the SQL twin
       reproduces the exact row set); then one streaming filter with the
       shared ``(id*mult) % mod`` hash rule.

    The argmax uses float64 ``w/n`` with a group-name tiebreak — the same
    IEEE doubles DuckDB computes, so both engines pick the same ``m``.
    Unlike :func:`stratified_sample` (given constant rates) the rates here
    are DERIVED from the data's own group histogram — the "reweight the
    crawl toward the target mixture" op.  -> kept rows + keep_ppm."""
    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count(alias_name="n")).take_all()
    n_of = {r[group_col]: int(r["n"]) for r in counts}
    if not n_of:  # zero-row corpus: nothing to reweight, stream empty
        def empty(batch: pa.Table) -> pa.Table:
            return batch.slice(0, 0).append_column(
                "keep_ppm", pa.array([], pa.int64()))

        return ds.map_batches(empty, batch_format="pyarrow")
    w_of = {s: mixture_weight(s) for s in n_of}
    # highest w/n wins; exact-tie falls to the SMALLEST name (= the SQL
    # twin's ORDER BY score DESC, source ASC LIMIT 1)
    m = min(n_of, key=lambda s: (-(w_of[s] / n_of[s]), s))
    n_m, w_m = n_of[m], w_of[m]
    ppm_of = {
        s: (1_000_000 * w_of[s] * n_m) // (n_of[s] * w_m) for s in n_of
    }
    keys = np.array(sorted(ppm_of), dtype=object)
    ppms = np.array([ppm_of[s] for s in keys], dtype=np.int64)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch.column(group_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, src)
        ppm = ppms[pos]
        keep = ((ids % mod) * (mult % mod)) % mod < ppm
        return batch.filter(pa.array(keep)).append_column(
            "keep_ppm", pa.array(ppm[keep])
        )

    return ds.map_batches(f, batch_format="pyarrow")


def compact_cells(geocoded, res: int, n_parts: int | None = None):
    """H3 ``compact_cells`` analog: replace every COMPLETE sibling group of
    populated cells at ``res`` with its parent cell at ``res - 1``, keep
    incomplete groups as-is -> (cell, is_parent) where ``cell`` is either
    a parent id (complete group, is_parent=1) or an original populated
    cell (is_parent=0).

    "Complete" is arithmetic, no stored hierarchy: a child belongs to
    parent P iff its center cube-rounds into P (the shared
    ``cell_to_parent`` relation), and P's full child set is enumerated by
    re-encoding the parent center back at ``res`` and probing its k-ring-2
    disc (19 candidates — a child center lies within 2 parent-edge
    lengths = 2x the child circumradius of the parent center, so hex
    distance <= floor(3s / s*sqrt(3)) = 2 from the anchor; the aperture-4
    grid has ~4 true children among the 19).

    Scale shape: distinct-cell partials, ONE parent-keyed bounded shuffle
    for group sizes (expected counts are computed vectorized on the
    parent rows, 19 probes wide), one parent-keyed co-partitioned merge
    to emit the cover — pages never reshuffle, the driver holds nothing.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd

    from ..functions import hashing

    if res - 1 < hexgrid.RES_MIN:
        raise ValueError(f"compact_cells needs res-1 >= {hexgrid.RES_MIN}")
    parent_res = res - 1

    def to_pairs(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        _, q, r = hexgrid.unpack(cell)
        clat, clon = hexgrid.axial_to_latlon(q, r, res)
        parent = hexgrid.latlon_to_cell(clat, clon, parent_res)
        return pa.table({"cell": pa.array(cell), "parent": pa.array(parent),
                         "one": pa.array(np.ones(len(cell), np.int64))})

    pairs = cell_counts(geocoded, n_parts).map_batches(
        to_pairs, batch_format="pyarrow", batch_size=None).materialize()

    counts = hash_groupby(
        pairs.map_batches(
            lambda b: pa.table({"parent": b.column("parent"),
                                "one": b.column("one")}),
            batch_format="pyarrow", batch_size=None),
        "parent", ["one"], how="isum", n_parts=n_parts,
    )

    offs = hexgrid.ring_offsets(1) + hexgrid.ring_offsets(2) + [(0, 0)]
    dq = np.array([o[0] for o in offs], dtype=np.int64)
    dr = np.array([o[1] for o in offs], dtype=np.int64)

    def flag(batch: pa.Table) -> pa.Table:
        parent = batch.column("parent").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_present = batch.column("one").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, pq, pr = hexgrid.unpack(parent)
        plat, plon = hexgrid.axial_to_latlon(pq, pr, parent_res)
        aq, ar = hexgrid.latlon_to_axial(plat, plon, res)
        cq = aq[:, None] + dq[None, :]
        cr = ar[:, None] + dr[None, :]
        clat, clon = hexgrid.axial_to_latlon(cq, cr, res)
        pq2, pr2 = hexgrid.latlon_to_axial(clat, clon, parent_res)
        expected = ((pq2 == pq[:, None]) & (pr2 == pr[:, None])) \
            .sum(axis=1).astype(np.int64)
        return pa.table({"parent": pa.array(parent),
                         "compact": pa.array(n_present == expected)})

    flags = counts.map_batches(flag, batch_format="pyarrow", batch_size=None)

    def tag_flag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("parent"),
            "a": pa.array(batch.column("compact").to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "kind": pa.array(np.zeros(len(batch), np.int8)),
        })

    def tag_pair(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("parent"),
                         "a": batch.column("cell"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(k, n_parts)))

    def emit_cover(df: pd.DataFrame) -> pd.DataFrame:
        fl = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "compact"})
        ch = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "cell"})
        m = ch.merge(fl, on="key")
        keep_child = m[m["compact"] == 0]
        parents = fl[fl["compact"] == 1]
        return pd.DataFrame({
            "cell": np.concatenate([parents["key"].to_numpy(np.int64),
                                    keep_child["cell"].to_numpy(np.int64)]),
            "is_parent": np.concatenate([
                np.ones(len(parents), np.int64),
                np.zeros(len(keep_child), np.int64)]),
        })

    return (
        flags.map_batches(tag_flag, batch_format="pyarrow", batch_size=None)
        .union(pairs.map_batches(tag_pair, batch_format="pyarrow",
                                 batch_size=None))
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(emit_cover)
        .sort("cell")
    )


def uncompact_cells(geocoded, res: int, n_parts: int | None = None):
    """H3 ``uncompact_cells`` analog — the inverse of
    :func:`compact_cells`: expand every parent row of the compacted cover
    back to its FULL child set at ``res`` and pass child rows through
    -> (cell,) at uniform resolution ``res``, sorted.

    Round-trip law (regression-tested): uncompact(compact(cells)) == the
    original populated-cell set — parents expand to exactly the sibling
    groups that were complete.  Expansion is the same arithmetic 19-probe
    candidate enumeration as compact (k-ring-2 of the anchor, keep
    candidates whose center cube-rounds back into the parent); purely
    batch-local, no shuffle beyond compact's own."""
    n_parts = default_parts() if n_parts is None else n_parts
    cover = compact_cells(geocoded, res=res, n_parts=n_parts)
    parent_res = res - 1
    offs = hexgrid.ring_offsets(1) + hexgrid.ring_offsets(2) + [(0, 0)]
    dq = np.array([o[0] for o in offs], dtype=np.int64)
    dr = np.array([o[1] for o in offs], dtype=np.int64)

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        isp = batch.column("is_parent").to_numpy(zero_copy_only=False) \
            .astype(bool)
        out = [cell[~isp]]
        par = cell[isp]
        if len(par):
            _, pq, pr = hexgrid.unpack(par)
            plat, plon = hexgrid.axial_to_latlon(pq, pr, parent_res)
            aq, ar = hexgrid.latlon_to_axial(plat, plon, res)
            cq = aq[:, None] + dq[None, :]
            cr = ar[:, None] + dr[None, :]
            clat, clon = hexgrid.axial_to_latlon(cq, cr, res)
            pq2, pr2 = hexgrid.latlon_to_axial(clat, clon, parent_res)
            ok = (pq2 == pq[:, None]) & (pr2 == pr[:, None])
            out.append(hexgrid.pack(res, cq[ok], cr[ok]))
        return pa.table({"cell": pa.array(np.concatenate(out))})

    return cover.map_batches(expand, batch_format="pyarrow",
                             batch_size=None).sort("cell")


FLOW_STEPS = 8


def flow_accumulation(geocoded, steps: int = FLOW_STEPS, n_parts: int | None = None):
    """Steepest-descent drainage over the populated-cell surface ->
    (cell, drain_to, acc): each cell drains to its strictly-LOWER
    minimum-``page_count`` ring-1 neighbor (ties: lowest neighbor id;
    no lower neighbor = sink, drain_to = -1), and ``acc`` counts the
    cells within ``steps`` drainage hops upstream (itself included) —
    the raster-hydrology flow-accumulation operator, the missing sibling
    of the k-ring smoothing family (a DIRECTED per-cell stencil instead
    of a symmetric one).

    Exactness: values are int64 page counts, the drain choice is an
    integer argmin, and the accumulation recurrence ``acc_{t+1} = 1 +
    sum(acc_t over in-drains)`` is pure integer BSP — the K-step unrolled
    MATERIALIZED-CTE oracle matches bit-for-bit (K fixed, like the
    pagerank/BFS oracles; on a surface deeper than K hops acc is the
    declared K-step partial sum).

    Scale shape: one ring-1 value scatter (x7 fan-out over CELL rows, the
    smoothing shuffle), argmin resolved per coarse target partition with
    one vectorized lexsort; then ``steps`` co-partitioned pushes of
    (cell, acc) int rows along drain edges — every table is
    distinct-cell bounded, nothing touches pages after the first reduce.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd

    from ..functions import hashing

    cells = cell_counts(geocoded, n_parts).materialize()

    r1 = hexgrid.ring_offsets(1) + [(0, 0)]
    dq = np.array([o[0] for o in r1], dtype=np.int64)
    dr = np.array([o[1] for o in r1], dtype=np.int64)

    def scatter_vals(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column("page_count").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        tgt = hexgrid.pack(res0, q[:, None] + dq[None, :],
                           r[:, None] + dr[None, :]).reshape(-1)
        n = len(cell)
        return pa.table({
            "tgt": pa.array(tgt),
            "frm": pa.array(np.repeat(cell, len(dq))),
            "val": pa.array(np.repeat(val, len(dq))),
            "__part": pa.array(hashing.coarse_partition(tgt, n_parts)),
        })

    def resolve_drain(df: pd.DataFrame) -> pd.DataFrame:
        # per target cell: its own value rides the (0,0) offset row
        # (frm == tgt); among strictly-lower neighbors pick (min val,
        # min id) — one lexsort, run boundaries via flag cumsum
        t = df["tgt"].to_numpy(np.int64)
        f = df["frm"].to_numpy(np.int64)
        v = df["val"].to_numpy(np.int64)
        self_rows = t == f
        own = pd.Series(v[self_rows], index=t[self_rows])
        # drop targets that are not populated cells (halo of the scatter)
        pop = own.index.to_numpy()
        if len(pop) == 0:
            return pd.DataFrame({"cell": np.array([], np.int64),
                                 "drain_to": np.array([], np.int64)})
        order = np.argsort(pop, kind="stable")
        pop_sorted = pop[order]
        own_sorted = own.to_numpy()[order]
        pos = np.searchsorted(pop_sorted, t)
        ok = (pos < len(pop_sorted))
        pos_c = np.minimum(pos, len(pop_sorted) - 1)
        ok &= pop_sorted[pos_c] == t
        ok &= ~self_rows
        lower = ok & (v < own_sorted[pos_c])
        tt, ff, vv = t[lower], f[lower], v[lower]
        o2 = np.lexsort((ff, vv, tt))
        tt, ff = tt[o2], ff[o2]
        first = np.ones(len(tt), dtype=bool)
        first[1:] = tt[1:] != tt[:-1]
        drain = pd.DataFrame({"cell": tt[first], "drain_to": ff[first]})
        sinks = np.setdiff1d(pop_sorted, tt[first], assume_unique=False)
        return pd.concat([drain, pd.DataFrame({
            "cell": sinks, "drain_to": np.full(len(sinks), -1, np.int64)})],
            ignore_index=True)

    drains = (
        cells.map_batches(scatter_vals, batch_format="pyarrow",
                          batch_size=None)
        .groupby("__part")
        .map_groups(resolve_drain, batch_format="pandas")
        .materialize()
    )

    # BSP: acc_{t+1}(v) = 1 + sum over in-drains of acc_t
    def init_acc(batch: pa.Table) -> pa.Table:
        return pa.table({"cell": batch.column("cell"),
                         "acc": pa.array(np.ones(len(batch), np.int64))})

    acc = cells.map_batches(init_acc, batch_format="pyarrow",
                            batch_size=None).materialize()

    def tag_acc(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("cell"), "a": batch.column("acc"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("cell"),
                         "a": batch.column("drain_to"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def add_part_key(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(k, n_parts)))

    def push(df: pd.DataFrame) -> pd.DataFrame:
        ac = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "acc"})
        ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "dst"})
        ed = ed[ed["dst"] >= 0]
        m = ed.merge(ac, on="key")
        return pd.DataFrame({
            "cell": np.concatenate([m["dst"].to_numpy(np.int64),
                                    ac["key"].to_numpy(np.int64)]),
            "inflow": np.concatenate([m["acc"].to_numpy(np.int64),
                                      np.zeros(len(ac), np.int64)]),
        })

    for _ in range(steps):
        pushed = (
            acc.map_batches(tag_acc, batch_format="pyarrow", batch_size=None)
            .union(drains.map_batches(tag_edge, batch_format="pyarrow",
                                      batch_size=None))
            .map_batches(add_part_key, batch_format="pyarrow",
                         batch_size=None)
            .groupby("__part")
            .map_groups(push, batch_format="pandas")
        )
        summed = hash_groupby(pushed, "cell", ["inflow"], how="isum",
                              n_parts=n_parts)

        def bump(batch: pa.Table) -> pa.Table:
            s = batch.column("inflow").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"cell": batch.column("cell"),
                             "acc": pa.array(1 + s)})

        acc = summed.map_batches(bump, batch_format="pyarrow",
                                 batch_size=None).repartition(16).materialize()

    def tag_final_acc(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("cell"), "a": batch.column("acc"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def zip_out(df: pd.DataFrame) -> pd.DataFrame:
        ac = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "acc"})
        ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "drain_to"})
        m = ac.merge(ed, on="key")
        return pd.DataFrame({"cell": m["key"].to_numpy(np.int64),
                             "drain_to": m["drain_to"].to_numpy(np.int64),
                             "acc": m["acc"].to_numpy(np.int64)})

    return (
        acc.map_batches(tag_final_acc, batch_format="pyarrow",
                        batch_size=None)
        .union(drains.map_batches(tag_edge, batch_format="pyarrow",
                                  batch_size=None))
        .map_batches(add_part_key, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(zip_out, batch_format="pandas")
        .sort("cell")
    )


WATERSHED_JUMPS = 6


def watershed(geocoded, jumps: int = WATERSHED_JUMPS, n_parts: int | None = None):
    """Watershed labeling of the populated-cell surface -> (cell, sink):
    every cell labeled with the terminal sink its steepest-descent drain
    path reaches — the basin decomposition that pairs with
    :func:`flow_accumulation` (same drain forest).

    POINTER DOUBLING, not path walking: after k jump supersteps every
    cell sees its 2^k-hop ancestor, so ``jumps = 6`` resolves any path up
    to 64 hops (declared bound, the pagerank-style fixed-K contract; the
    oracle unrolls the same jumps).  Each jump is ONE co-partitioned
    self-join of the (cell, p) pointer table — cells-bounded, integer,
    order-free.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd

    from ..functions import hashing

    cells = cell_counts(geocoded, n_parts).materialize()
    r1 = hexgrid.ring_offsets(1) + [(0, 0)]
    dq = np.array([o[0] for o in r1], dtype=np.int64)
    dr = np.array([o[1] for o in r1], dtype=np.int64)

    def scatter_vals(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column("page_count").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        tgt = hexgrid.pack(res0, q[:, None] + dq[None, :],
                           r[:, None] + dr[None, :]).reshape(-1)
        return pa.table({
            "tgt": pa.array(tgt),
            "frm": pa.array(np.repeat(cell, len(dq))),
            "val": pa.array(np.repeat(val, len(dq))),
            "__part": pa.array(hashing.coarse_partition(tgt, n_parts)),
        })

    def resolve_p0(df: pd.DataFrame) -> pd.DataFrame:
        t = df["tgt"].to_numpy(np.int64)
        f = df["frm"].to_numpy(np.int64)
        v = df["val"].to_numpy(np.int64)
        self_rows = t == f
        pop = t[self_rows]
        if len(pop) == 0:
            return pd.DataFrame({"cell": np.array([], np.int64),
                                 "p": np.array([], np.int64)})
        own = v[self_rows]
        order = np.argsort(pop, kind="stable")
        pop_sorted, own_sorted = pop[order], own[order]
        pos = np.searchsorted(pop_sorted, t)
        ok = pos < len(pop_sorted)
        pos_c = np.minimum(pos, len(pop_sorted) - 1)
        ok &= pop_sorted[pos_c] == t
        lower = ok & ~self_rows & (v < own_sorted[pos_c])
        tt, ff, vv = t[lower], f[lower], v[lower]
        o2 = np.lexsort((ff, vv, tt))
        tt, ff = tt[o2], ff[o2]
        first = np.ones(len(tt), dtype=bool)
        first[1:] = tt[1:] != tt[:-1]
        # sinks: p = self.  data MUST be a copy — sharing one buffer for
        # index and data lets the .loc write below mutate the index labels
        # (pandas does not copy on construction)
        p = pd.Series(index=pop_sorted, data=pop_sorted.copy())
        p.loc[tt[first]] = ff[first]
        return pd.DataFrame({"cell": p.index.to_numpy(np.int64),
                             "p": p.to_numpy(np.int64)})

    ptr = (
        cells.map_batches(scatter_vals, batch_format="pyarrow",
                          batch_size=None)
        .groupby("__part")
        .map_groups(resolve_p0, batch_format="pandas")
        .repartition(16).materialize()
    )

    def tag_both(batch: pa.Table) -> pa.Table:
        # ONE pass emits the table in both roles (lookup keyed by cell,
        # probe keyed by the current pointer) — self-union of one
        # materialized dataset in a single DAG is avoided deliberately
        cell = batch.column("cell").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = batch.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([cell, p])
        a = np.concatenate([p, cell])
        kind = np.concatenate([np.zeros(len(cell), np.int8),
                               np.ones(len(cell), np.int8)])
        return pa.table({
            "key": pa.array(key), "a": pa.array(a), "kind": pa.array(kind),
            "__part": pa.array(hashing.coarse_partition(key, n_parts)),
        })

    def jump(df: pd.DataFrame) -> pd.DataFrame:
        lk = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "p"})
        pr = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "cell"})
        m = pr.merge(lk, on="key")  # p(cell) := p(p(cell))
        return pd.DataFrame({"cell": m["cell"].to_numpy(np.int64),
                             "p": m["p"].to_numpy(np.int64)})

    for _ in range(jumps):
        ptr = (
            ptr.map_batches(tag_both, batch_format="pyarrow",
                            batch_size=None)
            .groupby("__part")
            .map_groups(jump, batch_format="pandas")
            .materialize()
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"cell": batch.column("cell"),
                         "sink": batch.column("p")})

    return ptr.map_batches(rename, batch_format="pyarrow",
                           batch_size=None).sort("cell")


COST_ROUNDS = 10


def cheapest_path_cost(geocoded, rounds: int = COST_ROUNDS,
                       n_parts: int | None = None):
    """Weighted shortest-path COST field over the populated-cell surface
    -> (cell, cost_dist): from the densest cell (max page_count, ties by
    smallest id; cost_dist 0 there), the minimum total cost of any ring-1
    path, where entering cell v costs ``page_count(v)`` — the
    cost-surface routing operator (least-cost corridor analysis), i.e.
    Dijkstra as ``rounds`` Bellman-Ford relaxation supersteps (fixed K,
    the bfs_hops contract; unreached-within-K cells are absent).

    Scale shape: the adjacency is arithmetic (ring-1 offsets between
    populated cells, one value scatter to derive it); each round is one
    co-partitioned scatter of (cell, dist) along edges + a min-combine —
    all integer, all cells-bounded."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd

    from ..functions import hashing

    cells = cell_counts(geocoded, n_parts).materialize()

    # seed: argmax(page_count), tie min cell — two tiny aggregates
    mx = cells.max("page_count")
    seed_df = cells.map_batches(
        lambda b: b.filter(pa.array(
            b.column("page_count").to_numpy(zero_copy_only=False) == mx)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    seed = int(seed_df["cell"].min())

    r1 = hexgrid.ring_offsets(1) + [(0, 0)]
    dq = np.array([o[0] for o in r1], dtype=np.int64)
    dr = np.array([o[1] for o in r1], dtype=np.int64)

    def scatter_vals(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column("page_count").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(res[0]) if len(res) else hexgrid.RES_MIN
        tgt = hexgrid.pack(res0, q[:, None] + dq[None, :],
                           r[:, None] + dr[None, :]).reshape(-1)
        return pa.table({
            "tgt": pa.array(tgt),
            "frm": pa.array(np.repeat(cell, len(dq))),
            "val": pa.array(np.repeat(val, len(dq))),
            "__part": pa.array(hashing.coarse_partition(tgt, n_parts)),
        })

    def edges_of(df: pd.DataFrame) -> pd.DataFrame:
        # keep (src=frm -> dst=tgt, dst_cost) where BOTH endpoints are
        # populated: the self row carries the target's own cost
        t = df["tgt"].to_numpy(np.int64)
        f = df["frm"].to_numpy(np.int64)
        v = df["val"].to_numpy(np.int64)
        self_rows = t == f
        pop = t[self_rows]
        if len(pop) == 0:
            return pd.DataFrame({"src": np.array([], np.int64),
                                 "dst": np.array([], np.int64),
                                 "dst_cost": np.array([], np.int64)})
        own = v[self_rows]
        order = np.argsort(pop, kind="stable")
        pop_sorted, own_sorted = pop[order], own[order]
        pos = np.searchsorted(pop_sorted, t)
        ok = pos < len(pop_sorted)
        pos_c = np.minimum(pos, len(pop_sorted) - 1)
        ok &= pop_sorted[pos_c] == t
        keep = ok & ~self_rows
        return pd.DataFrame({"src": f[keep], "dst": t[keep],
                             "dst_cost": own_sorted[pos_c[keep]]})

    edges = (
        cells.map_batches(scatter_vals, batch_format="pyarrow",
                          batch_size=None)
        .groupby("__part")
        .map_groups(edges_of, batch_format="pandas")
        .materialize()
    )

    import ray.data as rd
    dist = rd.from_arrow(pa.table({
        "cell": pa.array([seed], pa.int64()),
        "d": pa.array([0], pa.int64()),
    })).materialize()

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("src"), "a": batch.column("dst"),
                         "b": batch.column("dst_cost"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def tag_dist(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("cell"), "a": batch.column("d"),
                         "b": pa.array(np.zeros(len(batch), np.int64)),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def add_part_key(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__part", pa.array(hashing.coarse_partition(k, n_parts)))

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        dt = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "d"})
        ed = df[df["kind"] == 1][["key", "a", "b"]].rename(
            columns={"a": "dst", "b": "dst_cost"})
        m = ed.merge(dt, on="key")
        return pd.DataFrame({
            "cell": np.concatenate([dt["key"].to_numpy(np.int64),
                                    m["dst"].to_numpy(np.int64)]),
            "d": np.concatenate([dt["d"].to_numpy(np.int64),
                                 m["d"].to_numpy(np.int64)
                                 + m["dst_cost"].to_numpy(np.int64)]),
        })

    from ..functions.reduce import hash_groupby as hgb
    for _ in range(rounds):
        pushed = (
            dist.map_batches(tag_dist, batch_format="pyarrow",
                             batch_size=None)
            .union(edges.map_batches(tag_edge, batch_format="pyarrow",
                                     batch_size=None))
            .map_batches(add_part_key, batch_format="pyarrow",
                         batch_size=None)
            .groupby("__part")
            .map_groups(relax, batch_format="pandas")
        )
        dist = hgb(pushed, "cell", ["d"], how="min",
                   n_parts=n_parts).repartition(16).materialize()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"cell": batch.column("cell"),
                         "cost_dist": batch.column("d")})

    return dist.map_batches(rename, batch_format="pyarrow",
                            batch_size=None).sort("cell")


def spatial_thin(points_ds, n_parts: int | None = None):
    """geocoded pages -> (cell, page_id, lat, lon, n_in_cell): SPATIAL
    THINNING — one deterministic representative page per hex cell (the
    smallest page_id), with the cell's total count.  The standard
    cartographic/ML decluttering step: a map (or a spatially-balanced
    training sample) wants one point per cell, not a thousand.

    Scale shape: batch-local per-cell argmin partials CARRY the
    winner's payload (page_id, lat, lon) plus the local count; one
    coarse cell-keyed shuffle re-runs the same vectorized argmin per
    partition with counts summed — min-by-key with payload is
    mergeable, so the winning row's coordinates survive verbatim and
    nothing is re-derived or re-scanned.  Exact integers."""
    n_parts = default_parts() if n_parts is None else n_parts
    import ray.data as rd

    from ..functions import hashing

    def argmin_partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pid = batch.column(
            "pid" if "pid" in batch.schema.names else "page_id"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        if "n" in batch.schema.names:
            n = batch.column("n").to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            n = np.ones(len(cell), np.int64)
        order = np.lexsort((pid, cell))
        cs = cell[order]
        first = np.flatnonzero(np.diff(cs, prepend=np.int64(-1)))
        seg = np.diff(np.append(first, len(cs)))
        tot = np.add.reduceat(n[order], first) if len(cs) else n[:0]
        sel = order[first]
        return pa.table({
            "cell": pa.array(cell[sel]),
            "pid": pa.array(pid[sel]),
            "lat": pa.array(lat[sel]),
            "lon": pa.array(lon[sel]),
            "n": pa.array(tot.astype(np.int64)),
            "__part": pa.array(hashing.coarse_partition(
                cell[sel], n_parts).astype(np.int64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(
            df.drop(columns="__part"), preserve_index=False)
        out = argmin_partial(t)
        return out.drop(["__part"]).to_pandas()

    return (
        points_ds.map_batches(argmin_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge)
        .map_batches(lambda t: pa.table({
            "cell": t.column("cell"), "page_id": t.column("pid"),
            "lat": t.column("lat"), "lon": t.column("lon"),
            "n_in_cell": t.column("n")}), batch_format="pyarrow")
        .sort("cell")
    )


TLD_TOPK = 3


def top_cells_by_tld(points_ds, k: int = TLD_TOPK):
    """geocoded pages -> (tld, rnk, cell, pages): each TLD's ``k``
    densest hex cells — the grouped spatial top-k behind per-domain
    map callouts ("where does .de concentrate?"), the grouped sibling
    of :func:`top_cells`.

    DETERMINISTIC ranks by (pages DESC, cell); exact integers.  Scale
    shape: one bounded (tld, cell) count reduce, per-partition local
    top-k (safe: a (tld, cell) pair lives in one partition), tiny
    merge."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions import geocode
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = geocode.tld_index(pid % REP_STRIDE).astype(np.int64)
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"tid": idx, "cell": cell})
        g = df.groupby(["tid", "cell"], sort=False).size() \
            .reset_index(name="pages")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tid", "cell"])
        .aggregate(Sum("pages", alias_name="pages"))
    ).to_pandas()
    if agg.empty:
        raise ValueError("top_cells_by_tld: no pages")
    agg = agg.sort_values(["tid", "pages", "cell"],
                          ascending=[True, False, True], kind="mergesort")
    top = agg.groupby("tid", sort=True).head(k).copy()
    top["rnk"] = top.groupby("tid", sort=False).cumcount() + 1
    names = [geocode.TLD_TABLE[int(t)][0] for t in top["tid"]]
    return rd.from_arrow(pa.table({
        "tld": pa.array(names, pa.string()),
        "rnk": pa.array(top["rnk"].to_numpy(np.int64)),
        "cell": pa.array(top["cell"].to_numpy(np.int64)),
        "pages": pa.array(top["pages"].to_numpy(np.int64)),
    })).sort(["tld", "rnk"])
