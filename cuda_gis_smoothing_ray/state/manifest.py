"""Per-partition checkpoint manifest + resume-skip (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Model: a job is a list of independent PARTITIONS (input shards / key
ranges).  Each partition runs its own (small) Ray Data pipeline and writes
its output under ``out_dir/part=<id>/``; on success one JSONL line is
appended to ``out_dir/manifest.jsonl`` recording lineage (partition id,
input fingerprint) and metrics (rows, wall seconds).  A restarted job
replays the manifest and SKIPS every partition whose fingerprint still
matches — only missing/stale partitions recompute.  Output files are
keyed by partition id, so re-running a partition overwrites its own files
idempotently (never a half-merged global file).

The wide (all-to-all) stages are checkpointed at their *input* instead:
partition-local partial aggregates are what get persisted, and the final
small reduce re-runs cheaply on resume — re-deriving a shuffle is cheaper
and safer than trying to checkpoint shuffle state mid-flight.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class PartitionRecord:
    partition: str
    fingerprint: str
    rows: int
    path: str
    wall_s: float
    extra: dict


class CheckpointManifest:
    """JSONL manifest in ``out_dir``; append-only, last record per
    partition wins (a rewritten partition simply appends a fresh line)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)
        self._records: dict[str, PartitionRecord] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        d = json.loads(line)
                        self._records[d["partition"]] = PartitionRecord(**d)

    def done(self, partition: str, fingerprint: str) -> bool:
        rec = self._records.get(partition)
        return rec is not None and rec.fingerprint == fingerprint

    def record(self, partition: str, fingerprint: str, rows: int, path: str,
               wall_s: float, **extra: Any) -> None:
        rec = PartitionRecord(partition, fingerprint, rows, path, round(wall_s, 3), extra)
        self._records[partition] = rec
        with open(self.path, "a") as f:
            f.write(json.dumps(rec.__dict__) + "\n")

    @property
    def records(self) -> dict[str, PartitionRecord]:
        return dict(self._records)

    def metrics(self) -> dict[str, Any]:
        rows = sum(r.rows for r in self._records.values())
        return {
            "partitions": len(self._records),
            "rows": rows,
            "wall_s": round(sum(r.wall_s for r in self._records.values()), 3),
        }


def file_fingerprint(path: str) -> str:
    """Cheap input-lineage fingerprint: path + size + mtime_ns."""
    st = os.stat(path)
    return f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"


def run_partitioned(
    partitions: dict[str, str],
    fn: Callable[[str, str], int],
    out_dir: str,
    verbose: bool = False,
) -> CheckpointManifest:
    """Run ``fn(partition_id, part_out_dir) -> rows`` for every partition
    whose manifest record is missing or stale.

    ``partitions`` maps partition id -> input fingerprint.  Completed
    partitions are skipped; each completed run appends lineage + metrics.
    """
    import shutil

    man = CheckpointManifest(out_dir)
    for pid, fp in partitions.items():
        if man.done(pid, fp):
            if verbose:
                print(f"[manifest] skip {pid} (checkpointed)")
            continue
        pdir = os.path.join(out_dir, f"part={pid}")
        # a partition that runs is by definition missing or stale: wipe any
        # leftover files first — Ray's write_parquet adds uniquely-named
        # files, so appending next to a crashed/stale run's output would
        # make the final glob read old AND new rows
        shutil.rmtree(pdir, ignore_errors=True)
        os.makedirs(pdir, exist_ok=True)
        t0 = time.perf_counter()
        rows = fn(pid, pdir)
        man.record(pid, fp, rows, pdir, time.perf_counter() - t0)
    return man
