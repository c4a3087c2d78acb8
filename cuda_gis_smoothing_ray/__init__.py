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
    the corpus pipeline.  In this engine every shuffle moves batch-local
    PARTIALS (bounded cardinality: cells, langs, windows, bands), never the
    page-level stream, so reserving half the cluster for the shuffle starves
    the stage doing ~all the work.  Pipelines with big shuffles still
    backpressure correctly via the object-store memory budget.
    """
    global _CTX_TUNED
    if _CTX_TUNED:
        return
    from ray.data import DataContext

    DataContext.get_current().op_resource_reservation_enabled = False
    _CTX_TUNED = True
