"""Local driver-simulation: run each queries() entry on Ray and its
oracle_sql() on DuckDB over the same sf dir, compare row count + schema +
order-insensitive values.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> bool:
    a, b = canon(ray_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] SCHEMA MISMATCH ray={list(a.columns)} oracle={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  [{name}] ROWCOUNT MISMATCH ray={len(a)} oracle={len(b)}")
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            ok = np.array_equal(av, bv, equal_nan=True)
        else:
            ok = (av == bv).all() if len(av) else True
        if not ok:
            bad = np.nonzero(~(av == bv) if av.dtype.kind != "f" else ~(np.isclose(av, bv, rtol=0, atol=0) | (pd.isna(av) & pd.isna(bv))))[0][:5]
            print(f"  [{name}] VALUE MISMATCH col={c} rows={bad.tolist()}")
            for i in bad[:3]:
                print(f"      ray={av[i]!r} oracle={bv[i]!r}")
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    passed = failed = nosql = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"  [{name}] RAY ERROR: {type(ex).__name__}: {ex}")
            failed += 1
            continue
        t1 = time.time()
        if name not in sqls:
            print(f"~ {name}: rows-only ({len(ray_df)} rows, {t1-t0:.1f}s)")
            nosql += 1
            continue
        try:
            ora_df = con.execute(sqls[name]).df()
        except Exception as ex:
            print(f"  [{name}] SQL ERROR: {type(ex).__name__}: {ex}")
            failed += 1
            continue
        if compare(name, ray_df, ora_df):
            print(f"+ {name}: MATCH ({len(ray_df)} rows, ray {t1-t0:.1f}s)")
            passed += 1
        else:
            failed += 1
    print(f"\n{passed} matched, {failed} failed, {nosql} rows-only")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
