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


def join_parts(floor: int = 8, cpu_div: int = 4, cap: int = 1024,
               cpus: float | None = None) -> int:
    """Partition count for the NATIVE Ray ``Dataset.join`` hash shuffle.

    Deliberately much lower than :func:`default_parts`: Ray's join
    materializes one *actor* per output partition (measured on this box:
    3-table TPC-H joins over 10 M rows run 2.3-3.0 s at 8 partitions but
    6-8.8 s at 32 and slower still at 64, with 400+ worker processes
    spawned), so partitions cost real per-actor overhead and the count
    should track cluster CPUs divided down, not multiplied up:

        n = min(cap, max(floor, CPUs // cpu_div))

    32 CPUs -> 8 (today's verified single-box optimum, bit-identical
    results); a 256-node x 64-core cluster -> 1024, where each join
    partition of a 100 TB lineitem-scale side is ~100 GB of input streamed
    through that actor's shuffle bucket — the cap is the point at which
    per-partition input size, not actor count, should drive sizing (raise
    ``cap`` data-size-aware beyond that).  Partition count never changes
    join results — purely a performance knob."""
    if cpus is None:
        try:
            import ray

            if ray.is_initialized():
                cpus = float(ray.cluster_resources().get("CPU", 0.0))
            else:
                cpus = 0.0
        except Exception:
            cpus = 0.0
    return int(min(cap, max(floor, int(cpus) // cpu_div)))


def parts_for_rows(n_rows: int, rows_per_part: int = 2_000_000,
                   cap: int = 65536, floor: int | None = None,
                   cpus: float | None = None) -> int:
    """DATA-AWARE coarse-partition count: enough partitions that one
    partition holds ~``rows_per_part`` rows, floored at the cluster-sized
    :func:`default_parts`.  Use when the shuffled row count is known (or
    cheaply estimable) at build time — the CPU-based default keeps every
    core busy but lets per-partition volume grow linearly with data, and a
    coarse partition that is later materialized as ONE pandas group must
    fit a worker heap (the 60 M-page neardup memstress OOM-looped at 64
    partitions x ~240 MB before this helper).  Partition count never
    changes results — same contract as :func:`default_parts`."""
    return int(min(cap, max(default_parts(cpus=cpus) if floor is None
                            else floor,
                            n_rows // max(rows_per_part, 1))))
