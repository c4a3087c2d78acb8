"""Checkpointed, resumable flagship run (north_rule: resume after ``ray job
submit`` restarts, skipping finished partitions).

Two phases:

1. **Sharded narrow phase** (resumable per shard): each input shard — a
   contiguous ``doc_id`` range — runs pages -> geocode/H3-encode ->
   batch-local partial cell metrics and persists the *partials* under
   ``out_dir/part=<shard>/``.  One manifest line per shard records lineage
   (input file fingerprint) + metrics (rows, wall).  A restarted job skips
   every shard whose fingerprint matches.

2. **Global reduce** (cheap, re-runnable): read ALL partials, merge with one
   small cell-level groupby, k-ring smooth, write ``final/``.  Recorded in
   the same manifest keyed on the combined shard fingerprint, so it re-runs
   iff any shard changed.

Persisting the pre-shuffle partials (cell-level rows, ~|cells| per shard,
not |pages|) is the scale-correct checkpoint: the expensive page scan never
repeats, while the all-to-all stays an ephemeral re-derivable step.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa

from ..state.manifest import file_fingerprint, run_partitioned
from .flagship import METRIC_COLS, _partial_metrics


def _shard_bounds(sf_dir: str, n_shards: int) -> list[tuple[int, int]]:
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    # doc_id is dense from 0 in the driver tables; stat-derived bounds keep
    # this correct for arbitrary id ranges
    lo, hi = None, None
    for rg in range(meta.metadata.num_row_groups):
        st = meta.metadata.row_group(rg).column(0).statistics
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    span = hi - lo + 1
    step = (span + n_shards - 1) // n_shards
    return [(lo + i * step, min(lo + (i + 1) * step, hi + 1)) for i in range(n_shards)]


def flagship_resumable(sf_dir: str, out_dir: str, n_shards: int = 8, res: int = 7,
                       k: int = 1, profile: str = "gaussian", replicate: int = 1,
                       verbose: bool = False, config=None):
    """Run (or resume) the checkpointed flagship; returns the smoothed cell
    table as a Ray Dataset reading from ``out_dir/final/``.  Kwargs are
    sugar over :class:`..pipelines.config.PipelineConfig`."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..sources.pages import pages_from_documents_batch
    from ..stages.geoencode import geo_encode
    from ..stages.smooth import smooth_cells
    from .config import PipelineConfig

    cfg = config or PipelineConfig(res=res, k=k, profile=profile, replicate=replicate)
    res, k, profile, replicate = cfg.res, cfg.k, cfg.profile, cfg.replicate

    fp = file_fingerprint(f"{sf_dir}/documents.parquet")
    bounds = _shard_bounds(sf_dir, n_shards)
    # the shard fingerprint binds every knob that changes the PARTIALS
    # (res/replicate); the smoothing-only knobs (k/profile/fused/salted)
    # bind only the final reduce below — a config change re-runs exactly
    # the phases it affects
    fp = f"{fp}:res{res}:rep{replicate}"
    shard_fps = {f"shard{i:04d}": f"{fp}:rows[{lo},{hi})" for i, (lo, hi) in enumerate(bounds)}
    shard_of = {f"shard{i:04d}": (lo, hi) for i, (lo, hi) in enumerate(bounds)}

    def run_shard(pid: str, pdir: str) -> int:
        lo, hi = shard_of[pid]
        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang"],
            filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
        )

        def build(batch: pa.Table) -> pa.Table:
            return pages_from_documents_batch(batch, replicate=replicate).drop_columns(["html"])

        pages = ds.map_batches(build, batch_format="pyarrow", batch_size=None)
        partials = geo_encode(pages, res=res, batch_size=None).map_batches(
            _partial_metrics, batch_format="pyarrow", batch_size=None
        )
        partials.write_parquet(pdir)
        return pads.dataset(pdir).count_rows()

    man = run_partitioned(shard_fps, run_shard, out_dir, verbose=verbose)

    # ----- global reduce (re-runs iff any shard changed) -----
    from ray.data.aggregate import Sum

    final_fp = "|".join(shard_fps[p] for p in sorted(shard_fps)) + (
        f"|k{k}:{profile}:fused{cfg.fused}:salted{cfg.salted}"
    )
    final_dir = os.path.join(out_dir, "final")
    if not (man.done("final", final_fp) and os.path.isdir(final_dir)):
        import glob

        part_files = sorted(
            f for p in shard_fps
            for f in glob.glob(os.path.join(out_dir, f"part={p}", "*.parquet"))
        )
        parts = rd.read_parquet(part_files)
        reduced = parts.groupby("cell").aggregate(
            Sum("n", alias_name="n"),
            Sum("s_chars", alias_name="s_chars"),
            Sum("s_en", alias_name="s_en"),
            Sum("s_mention", alias_name="s_mention"),
        )

        def finalize(batch: pa.Table) -> pa.Table:
            n = batch.column("n").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cell": batch.column("cell"),
                    "page_count": pa.array(n.astype(np.int64)),
                    "chars_mean": pa.array(
                        batch.column("s_chars").to_numpy(zero_copy_only=False) / n
                    ),
                    "en_share": pa.array(batch.column("s_en").to_numpy(zero_copy_only=False) / n),
                    "mention_rate": pa.array(
                        batch.column("s_mention").to_numpy(zero_copy_only=False) / n
                    ),
                }
            )

        cells = reduced.map_batches(finalize, batch_format="pyarrow")
        sm = smooth_cells(cells, cfg.smooth_cols, k=k, profile=profile,
                          salted=cfg.salted)
        import shutil
        import time

        shutil.rmtree(final_dir, ignore_errors=True)
        t0 = time.perf_counter()
        sm.write_parquet(final_dir)
        import pyarrow.dataset as pads2

        man.record("final", final_fp, pads2.dataset(final_dir).count_rows(),
                   final_dir, time.perf_counter() - t0)
    return rd.read_parquet(final_dir)


def curation_resumable(sf_dir: str, out_dir: str, n_shards: int = 8,
                       n: int = 5, min_df: int = 2, ppm_per_word: int = 5000,
                       verbose: bool = False):
    """Run (or resume) the checkpointed end-to-end corpus curation
    (textops.curate_corpus semantics) with PARTITIONED output — the 100 TB
    curation job shape:

    * **phase A (global artifacts, manifested once)**: the exact-dedup
      survivor id table (written sorted by doc_id so phase B's per-shard
      read prunes row groups) and the frequent-gram set (counted over
      SURVIVORS, small by construction) — each re-runs only if the input
      fingerprint changes;
    * **phase B (per shard)**: read the shard's doc-id range, semi-join its
      slice of the survivor table, scrub with the broadcast gram set,
      Gopher-filter + length-proportional resample, write
      ``part=shardNNNN/``.  A re-submitted job skips finished shards.

    Returns the curated corpus as a Dataset over the shard outputs."""
    import glob

    import pyarrow.dataset as pads
    import ray.data as rd

    from ..stages import textops
    from ..stages.join import hash_semi_join
    from ..state.manifest import CheckpointManifest, file_fingerprint, run_partitioned

    fp = file_fingerprint(f"{sf_dir}/documents.parquet")
    params = f"n{n}:df{min_df}:ppm{ppm_per_word}"
    man = CheckpointManifest(out_dir)

    # ----- phase A: global artifacts -----
    surv_dir = os.path.join(out_dir, "survivors")
    surv_fp = f"{fp}:dedup"
    if not (man.done("survivors", surv_fp) and os.path.isdir(surv_dir)):
        t0 = time.perf_counter()
        shutil.rmtree(surv_dir, ignore_errors=True)
        docs = textops.read_documents(sf_dir)
        textops.exact_dedup(docs).select_columns(["doc_id"]).sort(
            "doc_id").write_parquet(surv_dir)
        man.record("survivors", surv_fp,
                   pads.dataset(surv_dir).count_rows(), surv_dir,
                   time.perf_counter() - t0)

    grams_path = os.path.join(out_dir, "grams")
    grams_fp = f"{surv_fp}:{params}"
    if not (man.done("grams", grams_fp) and os.path.isdir(grams_path)):
        t0 = time.perf_counter()
        shutil.rmtree(grams_path, ignore_errors=True)
        docs = textops.read_documents(sf_dir)
        surv = rd.read_parquet(surv_dir)
        survivors = hash_semi_join(docs, surv, left_key="doc_id",
                                   right_key="doc_id")
        freq = textops.frequent_grams(survivors, n=n, min_df=min_df)
        os.makedirs(grams_path, exist_ok=True)
        import pyarrow.parquet as pq_

        pq_.write_table(pa.table({"gram": freq}),
                        os.path.join(grams_path, "grams.parquet"))
        man.record("grams", grams_fp, len(freq), grams_path,
                   time.perf_counter() - t0)

    # ----- phase B: per-shard scrub + filter + resample -----
    import pyarrow.parquet as pq_

    freq = pq_.read_table(
        os.path.join(grams_path, "grams.parquet")).column("gram").combine_chunks()
    from ..stages.gridops import SAMPLE_MOD, SAMPLE_MULT

    bounds = _shard_bounds(sf_dir, n_shards)
    shard_fps = {
        f"shard{i:04d}": f"{grams_fp}:rows[{lo},{hi})"
        for i, (lo, hi) in enumerate(bounds)
    }
    shard_of = {f"shard{i:04d}": (lo, hi) for i, (lo, hi) in enumerate(bounds)}

    def run_shard(pid: str, pdir: str) -> int:
        lo, hi = shard_of[pid]
        rng = (pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi)
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"], filter=rng)
        # the survivor table is doc_id-sorted: the same range filter prunes
        # its row groups, so each shard touches only its slice
        surv = rd.read_parquet(surv_dir, filter=rng)
        survivors = hash_semi_join(docs, surv, left_key="doc_id",
                                   right_key="doc_id")
        cleaned = textops.scrub_boilerplate(survivors, freq, n=n)
        cleaned.map_batches(
            lambda b: textops.curation_finalize(
                b, ppm_per_word, SAMPLE_MULT, SAMPLE_MOD),
            batch_format="pyarrow",
        ).write_parquet(pdir)
        return pads.dataset(pdir).count_rows()

    run_partitioned(shard_fps, run_shard, out_dir, verbose=verbose)
    part_files = sorted(
        f for p in shard_fps
        for f in glob.glob(os.path.join(out_dir, f"part={p}", "*.parquet"))
    )
    return rd.read_parquet(part_files)
