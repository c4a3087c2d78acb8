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


def geo_encode(ds, res: int = 7, drop_html: bool = True, id_col: str = "page_id",
               concurrency=None, batch_size: int = 8192):
    """pages Dataset -> geocoded Dataset (adds lat/lon/has_mention/cell).

    ``concurrency`` defaults to an AUTOSCALING ``(1, ~cluster CPUs)`` pool: a
    fixed-size pool that reserves ``max`` CPUs can starve sibling stages
    (read/sort) and deadlock the streaming executor on small clusters, while a
    hard cap (e.g. 4) throttles the hot stage on big ones.
    """
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        # autoscale from 1: a high min reserves CPUs before the pool has
        # work and starves the producer stages (measured 2x slower here)
        concurrency = (1, max(4, cpus))
    return ds.map_batches(
        GeoEncode,
        fn_constructor_kwargs={"res": res, "drop_html": drop_html, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
