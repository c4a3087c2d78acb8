"""Cluster-aware sizing for coarse hash shuffles.

Every wide stage in the engine that can't use Ray's native groupby (per-user
segmented solves, pair-generation shuffles, k-bounded local top-k merges)
hash-partitions its keys into ``n_parts`` coarse groups.  Historically that
count was a fixed 64 — right for the 32-CPU sandbox, but a parallelism cap on
the real fixed-size multi-node target (hundreds of cores would leave
``n_parts - CPUs`` cores idle during the solve stage, and each pandas
partition fattens linearly with total data).

:func:`default_parts` sizes the count to the *cluster*:

    n_parts = min(cap, max(floor, per_cpu * total_cluster_CPUs))

* ``floor=64`` keeps today's verified single-box behavior bit-identical
  (32 CPUs -> 64; the pytest fixture's 4 CPUs -> 64).
* ``per_cpu=2`` gives every core ~2 partitions so stragglers overlap.
* ``cap=4096`` is the documented per-partition memory + driver-merge bound:
  several stages finish with a driver-side merge of ``n_parts x k`` rows
  (zone_terms, oov_rate, grouped top-k) — at 4096 parts and k<=100 that is
  <=410k tiny rows, still trivially driver-safe; and a coarse partition of a
  100 TB per-user solve at 4096 parts is ~25 GB of *input* split across the
  solve's own batching, the practical heap ceiling for a 64 GiB worker.
  Clusters larger than 2048 cores should raise ``per_cpu`` data-size-aware
  rather than the cap.

Partition COUNT never changes query results — every consumer either reduces
per key (aggregates), solves segmented per key inside the partition, or does
a tie-consistent local top-k whose global merge is exact — so this value is
purely a performance knob; the full-registry oracle sweep is the regression
gate.
"""

from __future__ import annotations


def default_parts(floor: int = 64, per_cpu: int = 2, cap: int = 4096,
                  cpus: float | None = None) -> int:
    """Coarse-shuffle partition count sized to the current Ray cluster.

    ``cpus`` overrides discovery (for tests / offline sizing).  Outside a Ray
    session this returns ``floor`` — callers only ever execute inside one.
    """
    if cpus is None:
        try:
            import ray

            if ray.is_initialized():
                cpus = float(ray.cluster_resources().get("CPU", 0.0))
            else:
                cpus = 0.0
        except Exception:
            cpus = 0.0
    return int(min(cap, max(floor, per_cpu * int(cpus))))
