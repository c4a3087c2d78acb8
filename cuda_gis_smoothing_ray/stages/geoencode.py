"""Geocode + H3-style cell encode stage.

An **actor-pool** ``map_batches`` stage (callable class -> state built once per
actor, per SURVEY §2.7): the TLD centroid table and the compiled lat/lon regex
live in ``__init__``; ``__call__`` is fully vectorized per Arrow batch.

Output adds ``lat, lon, has_mention, cell`` columns.  ``text`` passes through
untouched (byte-identity invariant).  The wide ``html`` column, if present, is
dropped *before* this stage's output enters any shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geocode, hexgrid
from ..sources.pages import REP_STRIDE


class GeoEncode:
    def __init__(self, res: int = 7, drop_html: bool = True, id_col: str = "page_id"):
        from .. import tune_worker_allocator

        tune_worker_allocator()
        # one Arrow compute thread per worker: Arrow's internal pool defaults
        # to ALL cores, silently breaking Ray's num_cpus accounting (a task
        # "using 1 CPU" would fan RE2 scans across the node); per-task
        # single-threading is what a multi-node deployment sees anyway
        pa.set_cpu_count(1)
        self.res = res
        self.drop_html = drop_html
        self.id_col = id_col
        self.extract = geocode.LatLonExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.drop_html and "html" in batch.column_names:
            batch = batch.drop_columns(["html"])
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # doc-identity for the deterministic centroid path is the id modulo the
        # replication stride (replicated pages land on the same coordinates)
        doc_id = ids % np.int64(REP_STRIDE)
        _, clat, clon = geocode.centroid_latlon(doc_id)
        ex_lat, ex_lon, found = self.extract(batch.column("text"))
        lat = np.where(found, ex_lat, clat)
        lon = np.where(found, ex_lon, clon)
        cell = hexgrid.latlon_to_cell(lat, lon, self.res)
        return (
            batch.append_column("lat", pa.array(lat))
            .append_column("lon", pa.array(lon))
            .append_column("has_mention", pa.array(found))
            .append_column("cell", pa.array(cell))
        )


#: per-worker-process encoder cache — the "build once, reuse every batch"
#: state for the TASK form of the stage (Ray reuses warm worker processes
#: across tasks, so this is constructed once per worker, like an actor's
#: ``__init__``, without actor-pool spin-up cost)
_ENCODERS: dict = {}


def _cached_encoder(res: int, drop_html: bool, id_col: str) -> GeoEncode:
    key = (res, drop_html, id_col)
    enc = _ENCODERS.get(key)
    if enc is None:
        enc = _ENCODERS[key] = GeoEncode(res=res, drop_html=drop_html, id_col=id_col)
    return enc


def geo_encode(ds, res: int = 7, drop_html: bool = True, id_col: str = "page_id",
               concurrency=None, batch_size: int = 8192, use_actors: bool = False):
    """pages Dataset -> geocoded Dataset (adds lat/lon/has_mention/cell).

    Default is a TASK stage with per-worker cached state: the geocoder's
    state (compiled regex + TLD centroid table) is cheap to build, and an
    actor pool pays a real price for it — a fresh pool spins up per
    execution (~2 s/actor here, a serial ramp that capped 4->16 CPU scaling
    at ~1.0x), while a fixed-size pool reserves CPUs and starves producer
    stages.  Tasks run on already-warm worker processes immediately.

    ``use_actors=True`` selects the actor-pool form (the right choice when
    per-actor state is genuinely expensive — model weights, big indexes);
    ``concurrency`` then defaults to an autoscaling ``(1, ~cluster CPUs)``.
    """
    if not use_actors:
        def encode(batch: pa.Table) -> pa.Table:
            return _cached_encoder(res, drop_html, id_col)(batch)

        return ds.map_batches(encode, batch_format="pyarrow", batch_size=batch_size)
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(4, cpus))
    return ds.map_batches(
        GeoEncode,
        fn_constructor_kwargs={"res": res, "drop_html": drop_html, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
