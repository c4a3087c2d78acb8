"""`ray job submit` entrypoint for the end-to-end corpus curation pipeline
(textops.curate_corpus semantics with checkpointed, partitioned output).

    ray job submit --working-dir . -- python jobs/run_curation.py \
        --sf-dir /data/docs --out-dir /data/curated --n-shards 64

Phase A (global artifacts: dedup survivor table, frequent-gram set) and
every output shard are recorded in the lineage manifest; a re-submitted
job skips finished work — the restart story the north rule requires,
applied to the LLM-corpus flagship.  This script OWNS its Ray session
(like bench.py); the library never calls ray.init().
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", default="/tmp/hexray_curated")
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--min-df", type=int, default=2)
    ap.add_argument("--ppm-per-word", type=int, default=5000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")

    from cuda_gis_smoothing_ray.pipelines.resumable import curation_resumable

    t0 = time.perf_counter()
    ds = curation_resumable(
        args.sf_dir, args.out_dir, n_shards=args.n_shards,
        n=args.ngram, min_df=args.min_df, ppm_per_word=args.ppm_per_word,
        verbose=True,
    )
    n_rows = ds.count()
    print(json.dumps({
        "rows": n_rows,
        "out_dir": args.out_dir,
        "n_shards": args.n_shards,
        "sec": round(time.perf_counter() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
