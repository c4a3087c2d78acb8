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
                 num_partitions: int = 16, join_type: str = "inner"):
    """Large-large hash shuffle join (native Ray Data ``Dataset.join``)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )
