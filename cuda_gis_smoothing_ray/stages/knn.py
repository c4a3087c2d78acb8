"""kNN over geocoded points (north_star: "kNN over cell-bucketed points").

Two strategies:

* :func:`knn_broadcast` — the small side (a query set) is broadcast; every
  batch computes its local top-k per query with numpy (vectorized distance
  matrix + argpartition), then a tiny ``groupby(query_id).map_groups`` merges
  per-batch candidates.  Exact, no shuffle of the big side; this is also the
  brute-force baseline for the embedding ANN stage.

* :func:`knn_cell_bucketed` — point-vs-point self-kNN at scale: points are
  bucketed by their *parent* (coarser-resolution) hex cell, each bucket plus
  its ring-1 halo is searched locally (``groupby(bucket).map_groups``).
  Exact whenever the true kth neighbor lies within one parent-cell ring —
  the partitioning assumption, asserted in its docstring and tested with a
  tolerance fixture (see tests/test_spatial.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import hexgrid

#: fixed query set for the oracle-checked kNN join (constants shared with SQL).
QUERY_POINTS: list[tuple[int, float, float]] = [
    (0, 39.5, -97.5),
    (1, 51.0, 10.0),
    (2, 36.0, 138.0),
    (3, 35.5, 104.0),
    (4, 61.0, 105.0),
    (5, -14.0, -52.0),
    (6, 21.0, 79.0),
    (7, 41.5, 12.5),
    (8, 40.0, -3.5),
    (9, 56.0, -106.0),
    (10, -25.0, 134.0),
    (11, 52.0, 5.0),
    (12, 60.0, 18.5),
    (13, 47.0, 8.0),
    (14, -7.0, 72.0),
    (15, 54.5, -2.5),
]


def knn_broadcast(points_ds, k: int = 5, queries: list[tuple[int, float, float]] | None = None,
                  id_col: str = "page_id"):
    """-> (query_id, rank, id, dist2): k nearest points per query point,
    squared equirectangular degrees, ties broken by id (deterministic)."""
    import ray

    qs = queries if queries is not None else QUERY_POINTS
    q_ref = ray.put(np.array([[q[1], q[2]] for q in qs], dtype=np.float64))
    q_ids = np.array([q[0] for q in qs], dtype=np.int64)

    def local_topk(batch: pa.Table) -> pa.Table:
        qmat = ray.get(q_ref)  # (m, 2) — fetched from object store, zero-copy
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dlat = lat[None, :] - qmat[:, 0:1]
        dlon = lon[None, :] - qmat[:, 1:2]
        d2 = dlat * dlat + dlon * dlon  # (m, n)
        kk = min(k, d2.shape[1])
        out_q, out_id, out_d = [], [], []
        for qi in range(d2.shape[0]):
            d = d2[qi]
            # tie-consistent local prune (mirrors knn_haversine): keep every
            # candidate at or under the kth distance, then (dist2, id)
            # lexsort — so a batch boundary can never drop the tied candidate
            # the oracle's ORDER BY dist2, id would keep.
            thresh = np.partition(d, kk - 1)[kk - 1]
            cand = np.flatnonzero(d <= thresh)
            sel = cand[np.lexsort((ids[cand], d[cand]))][:kk]
            out_q.append(np.full(len(sel), q_ids[qi]))
            out_id.append(ids[sel])
            out_d.append(d[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "dist2": pa.array(np.concatenate(out_d)),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist2", id_col], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", id_col, "dist2"]]

    return (
        points_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def knn_cell_bucketed(points_ds, k: int = 3, bucket_res: int = 5, id_col: str = "page_id"):
    """Self-kNN: for every point, its k nearest other points.

    Partitioning: bucket = parent cell at ``bucket_res``; each point is
    replicated into its own bucket and the 6 ring-1 halo buckets, then each
    bucket solves kNN locally for the points it OWNS (non-halo copies) against
    all copies.  Exactness assumption: the kth neighbor is within one
    ``bucket_res`` cell ring (edge_size(bucket_res) degrees slack) — holds for
    clustered web-page data with small k; documented per north_rule.
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = hexgrid.latlon_to_cell(lat, lon, bucket_res)
        disc = hexgrid.kring_cells(cell, 1)  # (n, 7): own bucket + halo
        n, m = disc.shape
        return pa.table(
            {
                "bucket": pa.array(disc.ravel()),
                id_col: pa.array(np.repeat(ids, m)),
                "lat": pa.array(np.repeat(lat, m)),
                "lon": pa.array(np.repeat(lon, m)),
                "owned": pa.array(np.tile(np.arange(m) == 0, n)),
            }
        )

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        own = group[group["owned"]]
        if own.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "dist2": pd.Series([], dtype="float64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        # candidates pre-sorted by id so a per-row STABLE distance argsort
        # breaks ties by ascending id — the whole solve is vectorized
        # (hot urban buckets: no Python per owned point); owned rows are
        # processed in slabs so the dense matrix stays O(slab x bucket)
        srt = np.argsort(group[id_col].to_numpy(), kind="stable")
        alat = group["lat"].to_numpy()[srt]
        alon = group["lon"].to_numpy()[srt]
        aid = group[id_col].to_numpy()[srt]
        olat = own["lat"].to_numpy()
        olon = own["lon"].to_numpy()
        oid = own[id_col].to_numpy()
        kk = min(k, len(aid) - 1)
        slab = 2048
        out = []
        for s in range(0, len(oid), slab):
            e = min(s + slab, len(oid))
            d2 = (olat[s:e, None] - alat[None, :]) ** 2 \
                + (olon[s:e, None] - alon[None, :]) ** 2
            d2[oid[s:e, None] == aid[None, :]] = np.inf  # exclude self copies
            order = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            out.append(
                pd.DataFrame(
                    {
                        id_col: np.repeat(oid[s:e], kk),
                        "neighbor_id": aid[order].ravel(),
                        "dist2": np.take_along_axis(d2, order, axis=1).ravel(),
                        "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), e - s),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return (
        points_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(solve, batch_format="pandas")
    )


#: mean Earth radius, km (shared with sql/oracles.knn_haversine_sql).
EARTH_R_KM = 6371.0


def knn_haversine(points_ds, k: int = 5,
                  queries: list[tuple[int, float, float]] | None = None,
                  id_col: str = "page_id"):
    """Great-circle kNN: -> (query_id, rank, id, dist_km), haversine
    distance on the sphere, ties broken by id.

    Same broadcast + local-top-k + per-query merge shape as
    :func:`knn_broadcast`; only the metric differs.  The trig expression is
    mirrored term-for-term in the SQL oracle; sub-ulp libm differences
    between numpy and DuckDB sit ~6 orders of magnitude below the 1e-6 km
    output rounding."""
    import ray

    qs = queries if queries is not None else QUERY_POINTS
    q_ref = ray.put(np.array([[q[1], q[2]] for q in qs], dtype=np.float64))
    q_ids = np.array([q[0] for q in qs], dtype=np.int64)

    def local_topk(batch: pa.Table) -> pa.Table:
        qmat = ray.get(q_ref)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        qlat, qlon = qmat[:, 0:1], qmat[:, 1:2]
        s_lat = np.sin(np.radians(lat[None, :] - qlat) / 2.0)
        s_lon = np.sin(np.radians(lon[None, :] - qlon) / 2.0)
        a = s_lat * s_lat + np.cos(np.radians(qlat)) * np.cos(np.radians(lat[None, :])) * (s_lon * s_lon)
        dkm = 2.0 * EARTH_R_KM * np.arcsin(np.sqrt(a))  # (m, n)
        kk = min(k, dkm.shape[1])
        out_q, out_id, out_d = [], [], []
        for qi in range(dkm.shape[0]):
            d = dkm[qi]
            # tie-consistent local prune: keep EVERYTHING at or under the
            # kth distance, then (dist, id) lexsort — so the batch-local
            # cut never drops a tie the oracle's ORDER BY dist_km, id keeps
            thresh = np.partition(d, kk - 1)[kk - 1]
            cand = np.flatnonzero(d <= thresh)
            sel = cand[np.lexsort((ids[cand], d[cand]))][:kk]
            out_q.append(np.full(len(sel), q_ids[qi]))
            out_id.append(ids[sel])
            out_d.append(d[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "dist_km": pa.array(np.concatenate(out_d)),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist_km", id_col], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["dist_km"] = np.floor(g["dist_km"].to_numpy() * 1e6 + 0.5) / 1e6
        return g[["query_id", "rank", id_col, "dist_km"]]

    return (
        points_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )
