"""Vectorized high-cardinality groupby-sum.

``ray.data.Dataset.groupby().aggregate(Sum)`` pays Python-level work per
DISTINCT key in the reduce (measured ~47 s for 124k keys on this box) —
fine for bounded keys (languages, windows), fatal for cell tables at res 9
over 100 TB (millions of cells).  This helper keeps the same shuffle shape
but reduces each coarse hash partition with one ``np.unique`` +
``np.bincount`` pass: Python cost is per PARTITION (fixed, ~64), not per
key.

Float note: addition order within a key differs from Ray's aggregate (both
differ from DuckDB's); all cross-engine comparisons round via
``floor(x*1e6+0.5)/1e6`` as everywhere else in the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from .scale import default_parts

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash_groupby(ds, key_col: str, cols: list[str],
                 how: str | dict[str, str] = "sum", n_parts: int | None = None):
    """Dataset -> Dataset(key_col, *cols) with a per-key reduction.

    ``how``: "sum" (float64 sums), "isum" (exact int64 sums), "min" or
    "max" (dtype-preserving int/float extremes) — one string for every
    column, or a dict mapping each column to its own reduction (mixed
    sum/min/max in ONE shuffle).
    Keys may be any int64-compatible column.  One all-to-all (by coarse hash
    partition), vectorized reduce, no per-key Python.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    hows = {c: how for c in cols} if isinstance(how, str) else dict(how)
    missing = [c for c in cols if c not in hows]
    if missing:
        raise ValueError(f"hash_groupby: no reduction given for {missing}")

    def add_part(batch: pa.Table) -> pa.Table:
        from .hashing import coarse_partition

        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__part", pa.array(coarse_partition(k, n_parts)))

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key_col].to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        out = {key_col: uniq}
        for c in cols:
            v = df[c].to_numpy()
            h = hows[c]
            if h == "sum":
                out[c] = np.bincount(
                    inv, weights=v.astype(np.float64), minlength=len(uniq)
                )
            elif h == "isum":
                # exact int64 sum (np.bincount weights are float64 — lossy
                # past 2^53); order-independent, for fixed-point pipelines
                acc = np.zeros(len(uniq), np.int64)
                np.add.at(acc, inv, v.astype(np.int64))
                out[c] = acc
            elif h == "min":
                acc = np.full(len(uniq), np.iinfo(np.int64).max if v.dtype.kind == "i"
                              else np.inf, dtype=v.dtype)
                np.minimum.at(acc, inv, v)
                out[c] = acc
            elif h == "max":
                acc = np.full(len(uniq), np.iinfo(np.int64).min if v.dtype.kind == "i"
                              else -np.inf, dtype=v.dtype)
                np.maximum.at(acc, inv, v)
                out[c] = acc
            else:
                raise ValueError(f"unknown how={h!r}")
        return pd.DataFrame(out)

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_part)
    )


def hash_groupby_sum(ds, key_col: str, sum_cols: list[str], n_parts: int | None = None):
    n_parts = default_parts() if n_parts is None else n_parts
    return hash_groupby(ds, key_col, sum_cols, how="sum", n_parts=n_parts)


def ensure_cols(df, cols):
    """Reindex a group DataFrame to a schema-stable column set.

    The tagged-union joins (two map_batches streams with DIFFERENT columns
    unioned, coarse-partitioned, solved per group) rely on Ray unifying the
    block schemas with nulls — which holds when a group block spans both
    input schemas but NOT when a partition happens to contain rows of only
    one side: that group arrives with only that side's columns and a plain
    column selection raises KeyError (observed once in a full-registry
    sweep at 16 CPUs — block-layout-dependent).  Calling this first makes
    every kind-filtered selection total: missing columns materialize as
    null, and the side that owns them is empty in exactly that case."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        df = df.reindex(columns=[*df.columns, *missing])
    return df
