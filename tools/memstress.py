"""Memory-ceiling stress datapoint (VERDICT r3 item 7): run the flagship
and passage_dedup pipelines at 100 M pages (replicate=20000 over the sf0.1
documents) and record wall time, throughput, per-operator peak heap, object
store usage and any spilling — the 128 GiB sandbox's closest stand-in for
the 100 TB memory question.

    python tools/memstress.py [sf_dir] [--replicate N] [--cpus N] [--out FILE]

The pipelines must stream: success = no OOM, bounded per-operator peak
heap, and object-store usage well under the store size (spill acceptable,
crash not).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_heaps(stats: str) -> dict[str, float]:
    """ds.stats() -> {operator: peak heap MiB (max across tasks)}."""
    out: dict[str, float] = {}
    op = None
    for line in stats.splitlines():
        m = re.match(r"\s*(?:Sub)?[Oo]perator \d+ (.+?):", line)
        if m:
            op = m.group(1)
        m = re.search(r"Peak heap memory usage \(MiB\): .* ([0-9.]+) max", line)
        if m and op:
            out[op] = max(out.get(op, 0.0), float(m.group(1)))
    return out


def object_store_report() -> str:
    try:
        from ray._private.internal_api import memory_summary

        return memory_summary(stats_only=True)
    except Exception as ex:  # API moved / grpc absent — record why
        return f"unavailable: {type(ex).__name__}: {ex}"


def spill_report() -> str:
    """Last spill line from the live session's raylet log — cumulative
    '(raylet) Spilled N MiB, M objects, write throughput T MiB/s'."""
    import glob

    try:
        import ray

        d = ray._private.worker.global_worker.node.get_session_dir_path()
        last = ""
        for p in glob.glob(os.path.join(d, "logs", "raylet.out")):
            with open(p, errors="replace") as f:
                for line in f:
                    if "Spilled" in line:
                        last = line.strip()
        return last or "no spill lines in raylet.out"
    except Exception as ex:
        return f"unavailable: {type(ex).__name__}: {ex}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=20_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/memstress.json")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{args.sf_dir}/documents.parquet").metadata.num_rows
    n_pages = n_docs * args.replicate
    report: dict = {"sf_dir": args.sf_dir, "replicate": args.replicate,
                    "n_pages": n_pages, "num_cpus": args.cpus, "runs": {}}

    def run(name: str, make):
        t0 = time.time()
        ds = make()
        n_rows = 0
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            n_rows += len(b)
        wall = time.time() - t0
        heaps = peak_heaps(ds.stats())
        rec = {
            "wall_s": round(wall, 1),
            "pages_per_sec": round(n_pages / wall, 1),
            "out_rows": n_rows,
            "peak_task_heap_mib": heaps,
            "driver_peak_rss_mib": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
            "object_store": object_store_report(),
            "spill": spill_report(),
        }
        report["runs"][name] = rec
        print(f"{name}: {wall:.1f}s, {rec['pages_per_sec']:.0f} pages/s, "
              f"{n_rows} rows, max task heap "
              f"{max(heaps.values()) if heaps else 0:.0f} MiB", flush=True)

    def _flagship():
        from cuda_gis_smoothing_ray.pipelines.flagship import flagship

        return flagship(args.sf_dir, replicate=args.replicate)

    def _passage():
        import pyarrow as pa

        from cuda_gis_smoothing_ray.sources.pages import read_pages
        from cuda_gis_smoothing_ray.stages.textops import passage_dedup

        pages = read_pages(args.sf_dir, replicate=args.replicate,
                           include_html=False, pages_per_task=250_000,
                           columns=["page_id", "text"])

        def as_docs(batch: pa.Table) -> pa.Table:
            return batch.select(["page_id", "text"]).rename_columns(
                ["doc_id", "text"])

        return passage_dedup(pages.map_batches(
            as_docs, batch_format="pyarrow", batch_size=None))

    def _neardup_cc():
        # the dedup-at-volume story end-to-end (VERDICT r4 item 8):
        # minhash LSH banding -> candidate pairs -> connected components
        # over every replicated page.  Corpus shape mirrors a real crawl:
        # reps 0-9 of each doc keep the ORIGINAL text (10-way exact-mirror
        # cliques — the pair + CC stages do real work, bounded by the
        # max_bucket cap), every other replica gets UNIQUE pseudo-random
        # text (15 splitmix64 values rendered as decimal tokens, ~300 B)
        # so cross-replica Jaccard is ~0.003 and band-collision probability
        # ~J^4 is negligible — candidates stay linear.  A concat-of-halves
        # construction was tried first and rejected: halves shared across
        # replicas give J~0.45, band-collision p~5%, and the candidate
        # stream goes quadratic in the replication factor (measured 118M
        # uncapped pairs at just 100k docs — that measures the synthetic
        # corpus, not the engine).
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq_

        from cuda_gis_smoothing_ray.functions.hashing import splitmix64
        from cuda_gis_smoothing_ray.sources.pages import REP_STRIDE, read_pages
        from cuda_gis_smoothing_ray.stages.cc import connected_components
        from cuda_gis_smoothing_ray.stages.textops import minhash_pairs

        n_docs = pq_.ParquetFile(
            f"{args.sf_dir}/documents.parquet").metadata.num_rows
        pages = read_pages(args.sf_dir, replicate=args.replicate,
                           include_html=False, pages_per_task=250_000,
                           columns=["page_id", "text"])

        def as_docs(batch: pa.Table) -> pa.Table:
            pid = batch.column("page_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            rep = pid // REP_STRIDE
            orig = pid % REP_STRIDE
            did = rep * n_docs + orig  # sequential: < 2^31 at 100M pages
            text = batch.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            # 15 BASE36 splitmix64 tokens per row (13 chars each), keyed by
            # doc id.  Base36, not decimal, on purpose: digit-only tokens
            # give a ~10^5 5-gram shingle space, and at 60 M docs the
            # r=4-row LSH bands then produce ~J^4 * N^2 accidental
            # candidate mass (measured: candidates blew the 4 M endpoint
            # gate and the full-signature fallback spilled 67 GB).  36^5
            # ~ 6e7 shingles pushes cross-doc Jaccard to ~2e-6 and the
            # noise to zero — the realistic entropy of web text.
            n = len(did)
            T, L = 15, 13
            keys = (did[:, None] * np.int64(16)
                    + np.arange(T, dtype=np.int64)[None, :])
            v = splitmix64(keys.ravel().view(np.uint64))
            CH = np.frombuffer(b"0123456789abcdefghijklmnopqrstuvwxyz",
                               dtype=np.uint8)
            buf = np.empty((L + 1, n * T), np.uint8)
            x = v.copy()
            for i in range(L):
                buf[i] = CH[(x % np.uint64(36)).astype(np.int64)]
                x //= np.uint64(36)
            buf[L] = 32  # space separator
            w = T * (L + 1)
            data = np.ascontiguousarray(buf.T.reshape(n, w)[:, :w - 1])
            offs = np.arange(0, (n + 1) * (w - 1), w - 1, dtype=np.int32)
            uniq = pa.StringArray.from_buffers(
                n, pa.py_buffer(offs.tobytes()),
                pa.py_buffer(data.tobytes()))
            mixed = pc.if_else(pa.array(rep < 10), text, uniq)
            return pa.table({"doc_id": pa.array(did), "text": mixed})

        docs = pages.map_batches(as_docs, batch_format="pyarrow",
                                 batch_size=None)
        # data-aware bucket partitions: one coarse partition is later one
        # pandas group in bucket_solve, so size by band-row volume (16
        # rows/page), not just CPUs — 64 CPU-sized partitions OOM-looped
        # at 60 M pages (~240 MB -> ~1 GB+ per group with conversion)
        from cuda_gis_smoothing_ray.functions.scale import parts_for_rows

        pairs = minhash_pairs(
            docs, n_parts=parts_for_rows(n_pages * 16))

        def as_ab(b: pa.Table) -> pa.Table:
            return pa.table({"a": b.column("a"), "b": b.column("b")})

        nodes = docs.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id")}),
            batch_format="pyarrow", batch_size=None)
        return connected_components(
            pairs.map_batches(as_ab, batch_format="pyarrow",
                              batch_size=None), nodes)

    jobs = {"flagship": _flagship, "passage_dedup": _passage,
            "neardup_cc": _neardup_cc}
    for name, make in jobs.items():
        if args.only and name != args.only:
            continue
        run(name, make)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
