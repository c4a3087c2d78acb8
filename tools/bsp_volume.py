"""Volume datapoint for the BSP graph arms (VERDICT r4 item 6): drive the
distributed superstep machinery itself — ``pagerank._rank_loop`` and the
``connected_components`` min-label BSP arm (``driver_max_edges=0``) — on a
>= 10 M-edge synthetic host graph and record wall time per superstep.  The
bounded driver finish is already measured (it exists because sf-scale
graphs fit one cache); this measures the beyond-cap scale arm it guards.

    python tools/bsp_volume.py [--hosts N] [--deg D] [--cpus N] [--iters K]

Graph shape: ``deg`` deterministic out-links per host over the ``hosts``-id
space (edge h -> (h*131 + 7 + k) % hosts for k in 0..deg-1, self-loops
dropped) — 100k hosts x 100 = 10 M distinct edges, the dense-web regime
where the per-superstep scatter/gather shuffle cost dominates.  The
production ``host_graph`` derivation is NOT used here on purpose: its link
rule yields <= 2 distinct out-edges per host by construction (edge volume
tracks the 100k-host space, not the doc count), so it cannot reach the
edge volume this datapoint is about.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=100_000)
    ap.add_argument("--deg", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/bsp_volume.json")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from cuda_gis_smoothing_ray.stages.pagerank import (
        DAMP_DEN, DAMP_NUM, SCALE, _rank_loop)

    H, D = args.hosts, args.deg

    def edge_block(b: pa.Table) -> pa.Table:
        # each input row is one host id; emit its deg out-links
        h = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(h, D)
        k = np.tile(np.arange(D, dtype=np.int64), len(h))
        dst = (src * 131 + 7 + k) % H
        keep = src != dst
        n = int(keep.sum())
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
                         "outdeg": pa.array(np.full(n, D, np.int64))})

    hosts_ds = rd.range(H, override_num_blocks=max(64, args.cpus * 2))
    edges = hosts_ds.map_batches(edge_block, batch_format="pyarrow",
                                 batch_size=None).materialize()
    n_edges = edges.count()
    report: dict = {"n_hosts": H, "out_degree": D, "n_edges": n_edges,
                    "num_cpus": args.cpus, "iterations": args.iters,
                    "runs": {}}
    print(f"graph: {n_edges} edges / {H} hosts", flush=True)

    # --- pagerank supersteps (the exact int64 fixed-point _rank_loop) ---
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * H)
    init = SCALE // H

    def damp_fn(host: np.ndarray, s: np.ndarray) -> np.ndarray:
        return base + (DAMP_NUM * s) // DAMP_DEN

    ranks = hosts_ds.map_batches(
        lambda b: pa.table({
            "host": b.column("id"),
            "rank": pa.array(np.full(len(b), init, np.int64))}),
        batch_format="pyarrow", batch_size=None).materialize()
    t0 = time.time()
    out = _rank_loop(edges, ranks, args.iters, damp_fn)
    rows = sum(len(b) for b in out.iter_batches(batch_size=None,
                                                batch_format="pyarrow"))
    wall = time.time() - t0
    report["runs"]["pagerank_bsp"] = {
        "wall_s": round(wall, 1),
        "sec_per_superstep": round(wall / args.iters, 2),
        "edges_per_sec_per_superstep": round(n_edges * args.iters / wall, 1),
        "out_rows": rows,
    }
    print(f"pagerank_bsp: {wall:.1f} s / {args.iters} supersteps = "
          f"{wall / args.iters:.2f} s/superstep "
          f"({n_edges * args.iters / wall / 1e6:.1f} M edge-visits/s)",
          flush=True)

    # --- connected-components min-label BSP (driver_max_edges=0) ---
    from cuda_gis_smoothing_ray.stages.cc import connected_components

    cc_edges = edges.map_batches(
        lambda b: pa.table({"a": b.column("src"), "b": b.column("dst")}),
        batch_format="pyarrow", batch_size=None)
    nodes = hosts_ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    cc = connected_components(cc_edges, nodes, driver_max_edges=0)
    rows = sum(len(b) for b in cc.iter_batches(batch_size=None,
                                               batch_format="pyarrow"))
    wall = time.time() - t0
    report["runs"]["cc_bsp"] = {"wall_s": round(wall, 1), "out_rows": rows}
    print(f"cc_bsp: {wall:.1f} s, {rows} rows", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
