"""Relational joins — the general-purpose complement to the engine's
cell-keyed spatial shuffle (the reference has no relational joins at all,
SURVEY §2.4; these are the corpus-pipeline operators from the task brief).

Two shapes, picked by side size:

* :func:`broadcast_hash_join` — the small side (dimension table) is read
  once driver-side, ``ray.put`` into the object store, and every task maps
  keys through a vectorized lookup (np.searchsorted over the sorted key
  array).  The big side streams; NO shuffle.  This is the only correct plan
  when one side is orders of magnitude smaller — a shuffle join would move
  100 TB to join against kilobytes.

* :func:`shuffle_join` — thin wrapper over Ray Data's native hash shuffle
  ``Dataset.join`` for genuinely large-large joins; both sides hash-
  partition by key.  ``num_partitions`` is the scale knob (rule of thumb:
  total bytes / 128 MB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..functions.scale import default_parts


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def broadcast_hash_join(ds, sf_dir: str, small_table: str, left_key: str,
                        right_key: str, take_cols: list[str], how: str = "inner"):
    """ds JOIN small_table ON ds[left_key] = small[right_key], appending
    ``take_cols`` from the small side.  Small side is broadcast once; the
    lookup is a sorted-key binary search per batch (vectorized).

    ``how``: "inner" drops unmatched left rows; "left" keeps them with
    nulls in ``take_cols``.
    """
    import pyarrow.parquet as pq

    import ray

    small = pq.read_table(
        f"{sf_dir}/{small_table}.parquet", columns=[right_key, *take_cols]
    ).combine_chunks()
    keys = small.column(right_key).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    # the binary-search lookup returns ONE match per left row — that is
    # dimension-table semantics; duplicate right keys would silently diverge
    # from SQL join row multiplication, so fail loudly instead
    if len(sorted_keys) > 1 and (sorted_keys[1:] == sorted_keys[:-1]).any():
        raise ValueError(
            f"broadcast_hash_join: duplicate {right_key!r} keys in "
            f"{small_table!r}; use shuffle_join for non-unique right sides"
        )
    cols = {c: small.column(c).take(pa.array(order)) for c in take_cols}
    ref = ray.put((sorted_keys, cols))

    def lookup(batch: pa.Table) -> pa.Table:
        sk, sc = ray.get(ref)
        lk = batch.column(left_key).to_numpy(zero_copy_only=False)
        if len(sk) == 0:  # empty small side: no row matches
            pos_c = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        else:
            pos = np.searchsorted(sk, lk)
            pos_c = np.minimum(pos, len(sk) - 1)
            hit = sk[pos_c] == lk
        if how == "inner":
            batch = batch.filter(pa.array(hit))
            pos_c = pos_c[hit]
            for c in take_cols:
                batch = batch.append_column(c, sc[c].take(pa.array(pos_c)))
        else:  # left
            import pyarrow.compute as pc

            hit_arr = pa.array(hit)
            for c in take_cols:
                if len(sk) == 0:
                    taken = pa.nulls(len(hit), type=sc[c].type)
                else:
                    taken = sc[c].take(pa.array(pos_c))  # undefined where miss
                batch = batch.append_column(
                    c, pc.if_else(hit_arr, taken, pa.nulls(len(hit), type=taken.type))
                )
        return batch

    return ds.map_batches(lookup, batch_format="pyarrow")


def shuffle_join(left, right, on: str, right_on: str | None = None,
                 num_partitions: int | None = None, join_type: str = "inner"):
    """Large-large hash shuffle join (native Ray Data ``Dataset.join``).

    ``num_partitions=None`` (the default every call site should use) sizes
    the shuffle to the cluster via :func:`..functions.scale.join_parts` —
    Ray's join runs one ACTOR per partition, so the count tracks CPUs
    divided down (8 at 32 CPUs), not the coarse-shuffle ``default_parts``."""
    from ..functions.scale import join_parts

    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or join_parts(),
        on=(on,),
        right_on=(right_on or on,),
    )


_BLOOM_C1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing bases (h1, h2) for int64 keys; probe i uses
    (h1 + i*h2) % m_bits (Kirsch-Mitzenmacher)."""
    k = keys.astype(np.int64).view(np.uint64)
    h1 = k * _BLOOM_C1
    h1 ^= h1 >> np.uint64(33)
    h2 = (k * _BLOOM_C2) | np.uint64(1)
    return h1, h2


def build_bloom(ds, key: str, m_bits: int = 1 << 22, k_hashes: int = 4) -> np.ndarray:
    """Distributed Bloom-filter build over ``ds[key]``: each batch sets its
    bits into a LOCAL bitmap and emits only that bitmap (m_bits/8 bytes —
    512 KB at the default — regardless of batch row count); the driver ORs
    the per-block bitmaps.  Nothing key-sized ever leaves a worker, so this
    scales to any right-side cardinality the bit budget tolerates
    (~1% false positives at m_bits = 10x keys, k=4)."""
    n_words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64))
        h1, h2 = _bloom_hashes(keys)
        bitmap = np.zeros(n_words, np.uint64)
        for i in range(k_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            # ufunc .at: duplicates within one probe round must all land
            np.bitwise_or.at(bitmap, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bitmap": pa.array([bitmap.tobytes()], pa.large_binary())})

    agg = np.zeros(n_words, np.uint64)
    # one tiny row per block streams back; the driver holds only the bitmap
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("bitmap"):
            agg |= np.frombuffer(buf.as_py(), np.uint64)
    return agg


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, m_bits: int,
                   k_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe (definite-no / probable-yes)."""
    h1, h2 = _bloom_hashes(keys)
    hit = np.ones(len(keys), bool)
    for i in range(k_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        hit &= (bitmap[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1) == 1
    return hit


def bloom_semi_join(left, right, left_key: str, right_key: str | None = None,
                    m_bits: int = 1 << 22, k_hashes: int = 4, n_parts: int | None = None):
    """Semi join with a Bloom pre-filter: build a bitmap of the right keys
    (512 KB default), broadcast it once (``ray.put``), drop definite-miss
    left rows BEFORE the shuffle, then resolve exactly with
    :func:`hash_semi_join` on the survivors.  The result is EXACT — false
    positives only cost shuffle bytes — while the shuffle input shrinks from
    |left| to |matches| + eps.  This is the standard plan when the left side
    is 100 TB and most rows don't match; the pure :func:`hash_semi_join` is
    the fallback when most rows DO match (bitmap buys nothing)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import ray

    rk = right_key or left_key
    bitmap_ref = ray.put(build_bloom(right, rk, m_bits, k_hashes))

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bitmap_ref)
        keys = batch.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(bloom_contains(bm, keys, m_bits, k_hashes)))

    pref = left.map_batches(prefilter, batch_format="pyarrow")
    return hash_semi_join(pref, right, left_key, rk, n_parts=n_parts)


def hash_semi_join(left, right, left_key: str, right_key: str | None = None,
                   anti: bool = False, n_parts: int | None = None):
    """Scale-safe semi/anti join: keep left rows whose key does (semi) or
    does not (anti) appear in ``right``.  Only DISTINCT right keys shuffle
    (deduped per batch, then partitioned); each hash partition resolves
    membership with one vectorized sorted-membership pass — no broadcast of
    the right side, works at any right-side cardinality."""
    n_parts = default_parts() if n_parts is None else n_parts
    rk = right_key or left_key
    _G = np.uint64(0x9E3779B97F4A7C15)

    def _part(key: np.ndarray) -> np.ndarray:
        """Partition id per key.  int64 keys: multiplicative hash (fast
        path).  String keys: vectorized rolling hash over the Arrow buffers
        (:func:`..functions.hashing.poly_hash64` — one numpy pass per byte
        POSITION, not per row).  Membership itself is resolved on the EXACT
        values below, so a partition-hash collision can never change the
        result, only co-locate more keys."""
        if np.issubdtype(key.dtype, np.integer):
            return (
                (key.astype(np.int64).view(np.uint64) * _G) >> np.uint64(52)
            ) % np.uint64(n_parts)
        from ..functions.hashing import poly_hash64

        try:
            arr = pa.array(key, pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arr = pa.array(key.astype(str), pa.string())
        return poly_hash64(arr) % np.uint64(n_parts)

    def _keys_of(batch: pa.Table, col: str) -> np.ndarray:
        k = batch.column(col).to_numpy(zero_copy_only=False)
        return k.astype(np.int64) if np.issubdtype(k.dtype, np.integer) else k

    def right_rows(batch: pa.Table) -> pa.Table:
        k = np.unique(_keys_of(batch, rk))
        t = pa.table({"__key": pa.array(k), "__kind": pa.array(np.zeros(len(k), np.int8))})
        return t.append_column("__part", pa.array(_part(k).astype(np.int64)))

    def left_rows(batch: pa.Table) -> pa.Table:
        k = _keys_of(batch, left_key)
        batch = batch.append_column("__key", pa.array(k))
        batch = batch.append_column("__kind", pa.array(np.ones(len(k), np.int8)))
        return batch.append_column("__part", pa.array(_part(k).astype(np.int64)))

    # union needs identical schemas: pad right rows with null left columns
    left_schema = left.schema()

    def right_rows_padded(batch: pa.Table) -> pa.Table:
        t = right_rows(batch)
        out = pa.table(
            {
                **{f.name: pa.nulls(len(t), f.type) for f in left_schema.base_schema},
                "__key": t.column("__key"),
                "__kind": t.column("__kind"),
                "__part": t.column("__part"),
            }
        )
        return out

    def resolve(part: pa.Table) -> pa.Table:
        kind = part.column("__kind").to_numpy(zero_copy_only=False)
        key = part.column("__key").to_numpy(zero_copy_only=False)
        present = np.unique(key[kind == 0])
        lm = kind == 1
        lk = key[lm]
        pos = np.searchsorted(present, lk)
        hit = (
            (pos < len(present)) & (present[np.minimum(pos, max(len(present) - 1, 0))] == lk)
            if len(present)
            else np.zeros(len(lk), bool)
        )
        keep = ~hit if anti else hit
        rows = part.filter(pa.array(lm)).filter(pa.array(keep))
        return rows.drop_columns(["__key", "__kind", "__part"])

    both = left.map_batches(left_rows, batch_format="pyarrow").union(
        right.map_batches(right_rows_padded, batch_format="pyarrow")
    )
    return both.groupby("__part").map_groups(resolve, batch_format="pyarrow")


def distinct_values(ds, col: str, n_parts: int | None = None):
    """Exact DISTINCT over ``col`` at any cardinality: batch-local
    ``np.unique`` shrinks each block to its distinct values, a 64-bit hash
    partitions them (Python cost per batch-distinct STRING value, vectorized
    for ints), and each partition finishes with one ``np.unique`` — Python
    per partition, never per global key.  The UNION set operation is
    ``distinct_values(a.union(b), col)``."""
    n_parts = default_parts() if n_parts is None else n_parts
    from ..functions.hashing import md5_hash64

    def local(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        u = np.unique(v)
        if np.issubdtype(u.dtype, np.integer):
            part = ((u.astype(np.int64).view(np.uint64) * _BLOOM_C1) >> np.uint64(52)) % np.uint64(n_parts)
        else:
            part = md5_hash64(u) % np.uint64(n_parts)
        return pa.table({col: pa.array(u), "__part": pa.array(part.astype(np.int64))})

    def reduce_part(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame({col: np.unique(df[col].to_numpy())})

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pandas")
    )


def grouped_distinct_count(ds, group_col: str, value_col: str, n_parts: int | None = None,
                           out_col: str = "n_distinct"):
    """Exact ``count(DISTINCT value) GROUP BY group``: batch-local dedup of
    (group, value) pairs, hash-partition by VALUE (so each distinct pair is
    counted once even when a group spans partitions), per-partition
    vectorized pair-dedup + per-group partial counts, then one bounded-key
    sum.  Only distinct pairs shuffle, never raw rows."""
    n_parts = default_parts() if n_parts is None else n_parts
    from ray.data.aggregate import Sum

    from ..functions.hashing import poly_hash64

    def local(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_numpy(zero_copy_only=False),
                value_col: batch.column(value_col).to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        v = df[value_col].to_numpy()
        if np.issubdtype(v.dtype, np.integer):
            part = ((v.astype(np.int64).view(np.uint64) * _BLOOM_C1) >> np.uint64(52)) % np.uint64(n_parts)
        else:
            # partition-only hash: vectorized (correctness never depends on
            # it — pairs dedupe on exact values within their partition)
            part = poly_hash64(pa.array(v, pa.string())) % np.uint64(n_parts)
        return pa.Table.from_pandas(
            df.assign(__part=part.astype(np.int64)), preserve_index=False
        )

    def count_part(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            df.drop_duplicates([group_col, value_col])
            .groupby(group_col, sort=False)[value_col]
            .size()
            .reset_index(name="__n")
        )
        return g

    partials = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_part, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch.column(group_col),
                out_col: batch.column("sum(__n)"),
            }
        )

    return (
        partials.groupby(group_col).aggregate(Sum("__n")).map_batches(finalize, batch_format="pyarrow")
    )
