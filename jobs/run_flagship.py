"""`ray job submit` entrypoint for the flagship pipeline (north_rule run
mode: "run via ray job submit on a fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- python jobs/run_flagship.py \
        --sf-dir /data/pages --out-dir /data/out --second-order --uniform

Inside a submitted job the Ray client address is provided by the job
runtime (RAY_ADDRESS), so `ray.init()` attaches to the cluster; run
standalone it starts a local session.  Flags after the I/O options are the
reference's own CLI surface (``PipelineConfig.from_args``:
--second-order --uniform --single --salted --levels N).  Output is
partitioned Parquet; with --resumable each shard writes through the
lineage/metrics manifest and a re-submitted job skips finished shards —
the restart story the north rule requires.

This script OWNS its Ray session (like bench.py); the library never calls
ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `ray job submit --working-dir .` ships the repo root as cwd; make the
# library importable whether the job runs from the repo root or from the
# jobs/ directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", default="/tmp/hexray_out")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--resumable", action="store_true")
    args, passthrough = ap.parse_known_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")

    from cuda_gis_smoothing_ray.pipelines.config import PipelineConfig

    cfg = PipelineConfig.from_args(passthrough)
    if args.replicate != 1:
        cfg = type(cfg)(**{**cfg.__dict__, "replicate": args.replicate})

    t0 = time.perf_counter()
    if args.resumable:
        result = cfg.resumable(args.sf_dir, args.out_dir, n_shards=args.n_shards)
        n_rows = result if isinstance(result, int) else sum(result.values()) if isinstance(result, dict) else -1
    else:
        ds = cfg.flagship(args.sf_dir).sort("cell")
        ds.write_parquet(args.out_dir)
        n_rows = None  # count from the written files below, without re-running

    import glob

    import pyarrow.dataset as pads

    # count only parquet shards (the resumable layout also holds the
    # manifest.jsonl lineage/metrics file at the output root)
    files = glob.glob(os.path.join(args.out_dir, "**", "*.parquet"), recursive=True)
    n_out = pads.dataset(files).count_rows() if files else 0
    print(json.dumps({
        "job": "flagship_resumable" if args.resumable else "flagship",
        "config": cfg.__dict__,
        "out_dir": args.out_dir,
        "rows_written": n_out,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
