"""Full-registry correctness sweep -> ONE machine-readable JSON artifact.

The driver samples ~50 of the registry per round; this tool runs EVERY
``queries()`` entry against its ``oracle_sql()`` twin over the same sf dir
and writes per-query ``{kind, match, rows, ray_s, oracle_s, err}`` so the
claim "N/N MATCH" is checkable in one read (VERDICT r3 item 1).

Usage:
    python tools/full_sweep.py [sf_dir] --out CORRECTNESS_FULL_r4.json \
        [--exclude q1,q2] [--only q1,q2] [--oracle-timeout SECS] [--cpus N]

Excluded queries (documented-expensive oracles at larger sfs) are recorded
in the artifact by name with ``kind="excluded"`` — never silently dropped.
A DuckDB oracle that exceeds ``--oracle-timeout`` is interrupted and
recorded as ``kind="oracle_timeout"`` (the Ray side still ran; its row
count is kept) — distinct from a mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from tools.check_correctness import TABLES, canon, to_pandas


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> tuple[bool, str]:
    a, b = canon(ray_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        return False, f"schema ray={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount ray={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64),
                                equal_nan=True)
        else:
            ok = bool((av == bv).all()) if len(av) else True
        if not ok:
            return False, f"values col={c}"
    return True, ""


def run_oracle(con, sql: str, timeout_s: float) -> pd.DataFrame:
    """Run one oracle with a wall-clock budget; interrupt + raise on excess."""
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    finally:
        timer.cancel()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--exclude", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--oracle-timeout", type=float, default=300.0)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    ap.add_argument("--order-by", default=None,
                    help="prior sweep artifact: run cheapest-first by its "
                         "per-query ray_s+oracle_s (max coverage early if "
                         "the run is cut short)")
    args = ap.parse_args()
    excluded = [q for q in args.exclude.split(",") if q]
    only = {q for q in args.only.split(",") if q}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    if args.order_by:
        with open(args.order_by) as f:
            prior = json.load(f)["queries"]

        def cost(name: str) -> float:
            r = prior.get(name) or {}
            return (r.get("ray_s") or 0.0) + (r.get("oracle_s") or 0.0)

        qs = dict(sorted(qs.items(), key=lambda kv: cost(kv[0])))
    out: dict = {
        "sf_dir": args.sf_dir,
        "num_cpus": args.cpus,
        "oracle_timeout_s": args.oracle_timeout,
        "started_unix": time.time(),
        "excluded": excluded,
        "queries": {},
    }
    t_all = time.time()
    dest = args.out or f"/tmp/full_sweep_{os.path.basename(args.sf_dir)}.json"

    def flush() -> None:
        out.update(
            wall_s=round(time.time() - t_all, 1),
            n_queries=len(out["queries"]),
            n_match=n_match,
            n_fail=n_fail,
            n_rows_only=n_rows_only,
            n_oracle_timeout=n_timeout,
        )
        tmp = dest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, dest)

    n_match = n_fail = n_rows_only = n_timeout = 0
    for i, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        if name in excluded:
            out["queries"][name] = {"kind": "excluded"}
            flush()
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(args.sf_dir))
            rec["rows"] = int(len(ray_df))
            rec["ray_s"] = round(time.time() - t0, 3)
        except Exception as ex:
            rec.update(kind="sql" if name in sqls else "rows_only",
                       match=False, err=f"ray: {type(ex).__name__}: {ex}")
            n_fail += 1
            out["queries"][name] = rec
            flush()
            print(f"[{i+1}/{len(qs)}] {name}: RAY ERROR {ex}", flush=True)
            traceback.print_exc()
            continue
        if name not in sqls:
            rec["kind"] = "rows_only"
            n_rows_only += 1
            out["queries"][name] = rec
            flush()
            print(f"[{i+1}/{len(qs)}] {name}: rows-only "
                  f"({rec['rows']} rows, {rec['ray_s']}s)", flush=True)
            continue
        t1 = time.time()
        try:
            ora_df = run_oracle(con, sqls[name], args.oracle_timeout)
        except Exception as ex:
            msg = str(ex)
            if "INTERRUPT" in msg.upper() or "interrupt" in msg:
                rec.update(kind="oracle_timeout")
                n_timeout += 1
                print(f"[{i+1}/{len(qs)}] {name}: ORACLE TIMEOUT "
                      f">{args.oracle_timeout}s", flush=True)
            else:
                rec.update(kind="sql", match=False,
                           err=f"oracle: {type(ex).__name__}: {ex}")
                n_fail += 1
                print(f"[{i+1}/{len(qs)}] {name}: SQL ERROR {ex}", flush=True)
            out["queries"][name] = rec
            flush()
            continue
        rec["oracle_s"] = round(time.time() - t1, 3)
        ok, reason = compare(ray_df, ora_df)
        rec["kind"] = "sql"
        rec["match"] = ok
        if ok:
            n_match += 1
        else:
            rec["err"] = reason
            n_fail += 1
        out["queries"][name] = rec
        flush()
        print(f"[{i+1}/{len(qs)}] {name}: {'MATCH' if ok else 'FAIL ' + reason}"
              f" ({rec['rows']} rows, ray {rec['ray_s']}s, "
              f"oracle {rec['oracle_s']}s)", flush=True)

    flush()
    print(f"\n{n_match} matched, {n_fail} failed, {n_rows_only} rows-only, "
          f"{n_timeout} oracle-timeout -> {dest}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
