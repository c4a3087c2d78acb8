"""Ray-Data-native spatial + training-data engine (see SURVEY.md)."""

from __future__ import annotations

_CTX_TUNED = False


def tune_data_context() -> None:
    """Engine-wide Ray Data context tuning; idempotent, called by every
    pipeline entry point (sources/readers).

    ``op_resource_reservation_enabled = False``: the streaming executor's
    default 50% operator resource reservation halves (or worse) map-operator
    concurrency whenever ANY all-to-all op (groupby/repartition/sort) appears
    downstream — measured map concurrency 1-2 of 4 CPUs and 2x wall time on
    the corpus pipeline.  In this engine shuffles move either batch-local
    PARTIALS (bounded cardinality: cells, langs, windows, bands, distinct
    join keys) or deliberately bounded row streams (events keyed by user,
    candidate-pair keys) — never the page-level stream — so reserving half
    the cluster for the shuffle starves the stage doing ~all the work.
    Pipelines with big shuffles still backpressure correctly via the
    object-store memory budget; a future pipeline that DOES shuffle
    page-level rows should re-enable the reservation for itself.
    """
    global _CTX_TUNED
    if _CTX_TUNED:
        return
    from ray.data import DataContext

    DataContext.get_current().op_resource_reservation_enabled = False
    _CTX_TUNED = True


_ALLOC_TUNED = False


def tune_worker_allocator() -> None:
    """Per-process allocator tuning; idempotent, called from worker-side
    stage constructors (and harmless on the driver).

    This sandbox faults in fresh mmap'd pages at ~150 MB/s, and both glibc
    and jemalloc return large freed blocks to the OS immediately — so every
    task re-faults its ~100-200 MB of big temporaries (the replicated page
    batch, Arrow concat outputs), inflating a 0.16 s task to ~0.9 s.  Keep
    freed pages resident instead:

    * jemalloc (Arrow's pool): very long dirty/muzzy decay -> freed Arrow
      buffers stay mapped and are reused by the next batch.
    * glibc (numpy/python): raise M_MMAP_THRESHOLD so big numpy buffers come
      from the (retained) heap, and M_TRIM_THRESHOLD so the heap isn't
      returned either.

    Per-worker steady-state cost is bounded by the largest batch working set
    (~200 MB), which is exactly what the worker needs anyway.
    """
    global _ALLOC_TUNED
    if _ALLOC_TUNED:
        return
    try:
        import pyarrow as pa

        if pa.default_memory_pool().backend_name == "jemalloc":
            pa.jemalloc_set_decay_ms(600_000)
    except Exception:
        pass
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: big allocs on heap
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: keep freed heap
    except Exception:
        pass
    _ALLOC_TUNED = True
