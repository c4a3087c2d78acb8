"""Polyfill (vector -> raster) and radius distance join (SURVEY §2.4 family).

Completes the spatial-join surface around :mod:`.pip` (raster -> vector
containment) and :mod:`.knn`:

* :func:`polyfill` — H3-style polyfill: every hex cell at resolution ``res``
  whose *center* lies inside a polygon, computed as r-stripe candidate
  generation + the exact same even-odd ray-casting predicate as
  ``pip.points_in_polygon``.  The polygon side is tiny; the work unit is one
  ``(poly_id, r)`` latitude stripe so a continent-sized polygon at res 9
  parallelizes across stripes instead of landing in one task.
* :func:`distance_join` — all page pairs within ``radius`` degrees, the
  classic self-spatial-join: each point is replicated to its home bucket plus
  the 6 ring-1 halo buckets at ``bucket_res`` (same discipline as
  ``knn.knn_cell_bucketed``), then every bucket emits the pairs whose
  LOWER-id endpoint it owns — each qualifying pair is produced exactly once,
  with no post-hoc dedup shuffle.

Exactness contract with the DuckDB oracles
(``sql/oracles.polyfill_sql`` / ``distance_join_sql``): candidate stripe
bounds may differ by ±1 between engine and SQL (any center outside the
polygon's bbox fails the identical PIP predicate on both sides), but the
crossing rule, the center arithmetic ``lat = size*1.5*r``,
``lon = size*sqrt(3)*(q + r/2)``, and the pair distance
``(alat-blat)^2 + (alon-blon)^2`` (a = lower page_id) are the same float
expressions evaluated in the same order.

Scale notes (100 TB): polyfill's cost is polygon-area-proportional and
independent of the page table — it runs on a from_items Dataset of stripes.
distance_join streams the page table once; only (bucket, id, lat, lon) times
7 copies shuffle, never text/html payloads.  The per-bucket solve is a
slab-blocked dense distance matrix — a hot bucket (dense TLD cluster) costs
O(slab x bucket) memory, not O(bucket^2); the guarantee radius <=
edge_size(bucket_res) keeps halo depth at 1 (point gap between non-adjacent
buckets is >= one edge length).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions import hexgrid
from .pip import POLYGONS, points_in_polygon
from ..functions.scale import default_parts


def _stripe_items(res: int, polygons) -> list[dict]:
    """Driver-side (tiny): one work item per (polygon, r-stripe)."""
    size = hexgrid.edge_size(res)
    items = []
    for pid, ring in polygons:
        lats = [y for y, _ in ring]
        lons = [x for _, x in ring]
        ymin, ymax = min(lats), max(lats)
        xmin, xmax = min(lons), max(lons)
        r0 = int(np.floor(ymin / (1.5 * size)))
        r1 = int(np.floor(ymax / (1.5 * size))) + 1
        for r in range(r0, r1 + 1):
            items.append(
                {"poly_id": pid, "r": r, "xmin": xmin, "xmax": xmax}
            )
    return items


def polyfill(res: int = 7, polygons=None, parallelism: int | None = None):
    """All cells at ``res`` whose center is inside each polygon.

    Returns a Dataset with columns (poly_id, cell, q, r) — one row per
    covered cell per polygon (overlapping polygons each list the cell).
    """
    polygons = polygons or POLYGONS
    rings = {pid: ring for pid, ring in polygons}
    size = hexgrid.edge_size(res)
    items = _stripe_items(res, polygons)
    rings_ref = ray.put(rings)

    def fill_stripe(batch: pa.Table) -> pa.Table:
        local = ray.get(rings_ref)
        pids = batch.column("poly_id").to_numpy(zero_copy_only=False)
        rs = batch.column("r").to_numpy(zero_copy_only=False)
        xmins = batch.column("xmin").to_numpy(zero_copy_only=False)
        xmaxs = batch.column("xmax").to_numpy(zero_copy_only=False)
        out_pid, out_q, out_r = [], [], []
        for pid, r, xmin, xmax in zip(pids, rs, xmins, xmaxs):
            q0 = int(np.floor(xmin / (size * hexgrid.SQRT3) - r / 2.0))
            q1 = int(np.floor(xmax / (size * hexgrid.SQRT3) - r / 2.0)) + 1
            q = np.arange(q0, q1 + 1, dtype=np.int64)
            rr = np.full(len(q), r, dtype=np.int64)
            clat, clon = hexgrid.axial_to_latlon(q, rr, res)
            inside = points_in_polygon(clat, clon, local[int(pid)])
            out_pid.append(np.full(int(inside.sum()), pid, dtype=np.int64))
            out_q.append(q[inside])
            out_r.append(rr[inside])
        pid_a = np.concatenate(out_pid) if out_pid else np.array([], dtype=np.int64)
        q_a = np.concatenate(out_q) if out_q else np.array([], dtype=np.int64)
        r_a = np.concatenate(out_r) if out_r else np.array([], dtype=np.int64)
        return pa.table(
            {
                "poly_id": pa.array(pid_a),
                "cell": pa.array(hexgrid.pack(res, q_a, r_a)),
                "q": pa.array(q_a),
                "r": pa.array(r_a),
            }
        )

    ds = ray.data.from_items(items, override_num_blocks=parallelism)
    return ds.map_batches(fill_stripe, batch_format="pyarrow")


def distance_join(points_ds, radius: float = 1.0, bucket_res: int = 6,
                  id_col: str = "page_id"):
    """Every pair of points within ``radius`` degrees (equirectangular), as
    rows (a, b, dist2) with a < b, each pair exactly once.

    Requires ``radius < edge_size(bucket_res)`` STRICTLY: the minimum
    point-to-point gap between non-ring-1-adjacent hex buckets is one edge
    length, and the pair predicate is INCLUSIVE (d2 <= r2) — at exact
    equality a qualifying pair at precisely one edge-length separation
    across non-adjacent buckets would sit outside the ring-1 halo, so
    equality is rejected too.
    """
    size = hexgrid.edge_size(bucket_res)
    if radius >= size:
        raise ValueError(
            f"radius {radius} >= edge_size({bucket_res}) = {size}: ring-1 "
            "halo would miss boundary pairs (the d2 <= r2 predicate is "
            "inclusive); lower bucket_res"
        )
    r2 = radius * radius

    def bucketize(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = hexgrid.latlon_to_cell(lat, lon, bucket_res)
        disc = hexgrid.kring_cells(cell, 1)  # (n, 7): home + 6 halo
        n, m = disc.shape
        return pa.table(
            {
                "bucket": pa.array(disc.ravel()),
                "pid": pa.array(np.repeat(ids, m)),
                "lat": pa.array(np.repeat(lat, m)),
                "lon": pa.array(np.repeat(lon, m)),
                "owned": pa.array(np.tile(np.arange(m) == 0, n)),
            }
        )

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "dist2": pd.Series([], dtype="float64"),
            }
        )
        own = group[group["owned"]]
        if own.empty:
            return empty
        alat = group["lat"].to_numpy()
        alon = group["lon"].to_numpy()
        aid = group["pid"].to_numpy()
        olat = own["lat"].to_numpy()
        olon = own["lon"].to_numpy()
        oid = own["pid"].to_numpy()
        slab = 2048
        outs = []
        for s in range(0, len(oid), slab):
            e = min(s + slab, len(oid))
            # orientation matches the oracle: a (owner, lower id) minus b
            d2 = (olat[s:e, None] - alat[None, :]) ** 2 \
                + (olon[s:e, None] - alon[None, :]) ** 2
            hit = (aid[None, :] > oid[s:e, None]) & (d2 <= r2)
            ai, bi = np.nonzero(hit)
            if len(ai):
                outs.append(
                    pd.DataFrame(
                        {
                            "a": oid[s:e][ai],
                            "b": aid[bi],
                            "dist2": np.floor(d2[ai, bi] * 1e6 + 0.5) / 1e6,
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return (
        points_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(solve, batch_format="pandas")
    )


def zonal_stats(points_ds):
    """Per-polygon zonal statistics over the page stream: page count, mean
    text length, english share.

    Scale shape: each Arrow batch is ray-cast against the (broadcast-small)
    polygon set and reduced to ONE partial row per polygon — only
    ``n_polygons`` rows per batch ever shuffle, never pages.  Sums are exact
    integers (BIGINT-safe), so the result is order-independent and matches
    the DuckDB oracle bit-for-bit; means are rounded to 1e-6 on both sides.
    """
    import pyarrow.compute as pc

    polys = POLYGONS

    def partials(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        en = (pc.equal(batch.column("lang"), "en").to_numpy(zero_copy_only=False)).astype(np.int64)
        pid_o, n_o, s_o, e_o = [], [], [], []
        for pid, ring in polys:
            inside = points_in_polygon(lat, lon, ring)
            pid_o.append(pid)
            n_o.append(int(inside.sum()))
            s_o.append(int(tlen[inside].sum()))
            e_o.append(int(en[inside].sum()))
        return pa.table(
            {
                "poly_id": pa.array(pid_o, type=pa.int64()),
                "n_pages": pa.array(n_o, type=pa.int64()),
                "sum_len": pa.array(s_o, type=pa.int64()),
                "n_en": pa.array(e_o, type=pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_pages)").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("sum(sum_len)").to_numpy(zero_copy_only=False).astype(np.float64)
        e = batch.column("sum(n_en)").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = n > 0
        return pa.table(
            {
                "poly_id": batch.column("poly_id"),
                "n_pages": batch.column("sum(n_pages)"),
                "mean_len": pa.array(np.floor(np.divide(s, n, out=np.zeros_like(s), where=keep) * 1e6 + 0.5) / 1e6),
                "en_share": pa.array(np.floor(np.divide(e, n, out=np.zeros_like(e), where=keep) * 1e6 + 0.5) / 1e6),
            }
        ).filter(pa.array(keep))

    from ray.data.aggregate import Sum

    agg = (
        points_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("poly_id")
        .aggregate(Sum("n_pages"), Sum("sum_len"), Sum("n_en"))
    )
    return agg.map_batches(finalize, batch_format="pyarrow")


#: fixed-point scale for IDW weights: w = floor(1e9 / (1 + dist2) + 0.5).
IDW_SCALE = 1_000_000_000


def idw_interpolate(points_ds, radius: float = 25.0, queries=None):
    """Inverse-distance-weighted interpolation of text length at query
    points — the reference's weighted-mean smoothing kernel
    (``src/cuda/hex_smooth_cuda_v5.cu`` center+ring weights) generalized to
    arbitrary sample sites.

    ``w = floor(1e9 / (1 + dist2) + 0.5)`` (integer, so the weighted sums are
    exact and order-independent across engines; the +1 bounds w and avoids a
    zero-distance pole).  Pages beyond ``radius`` degrees contribute nothing.

    Scale shape: query points broadcast (tiny), each batch emits one partial
    (num, den) pair per query — only ``n_queries`` rows shuffle per batch.
    int64 headroom: w <= 1e9, textlen < 2^20 -> ~2^50 per term; partial sums
    overflow only past ~2^13 in-radius terms per batch-query pair, far above
    any real batch; the final reduce sums per-batch partials (few thousand
    blocks at 100 TB — still < 2^63).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .knn import QUERY_POINTS

    qs = queries if queries is not None else QUERY_POINTS
    qid = np.array([q[0] for q in qs], dtype=np.int64)
    qlat = np.array([q[1] for q in qs], dtype=np.float64)
    qlon = np.array([q[2] for q in qs], dtype=np.float64)
    r2 = radius * radius

    def partials(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        # (n_queries, n_pages) — same orientation as the oracle (q - p)
        d2 = (qlat[:, None] - lat[None, :]) ** 2 + (qlon[:, None] - lon[None, :]) ** 2
        w = np.floor(IDW_SCALE / (1.0 + d2) + 0.5).astype(np.int64)
        w[d2 > r2] = 0
        return pa.table(
            {
                "query_id": pa.array(qid),
                "num": pa.array((w * tlen[None, :]).sum(axis=1)),
                "den": pa.array(w.sum(axis=1)),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        num = batch.column("sum(num)").to_numpy(zero_copy_only=False).astype(np.float64)
        den = batch.column("sum(den)").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = den > 0
        return pa.table(
            {
                "query_id": batch.column("query_id"),
                "n_weight": batch.column("sum(den)"),
                "idw_len": pa.array(np.floor(np.divide(num, den, out=np.zeros_like(num), where=keep) * 1e6 + 0.5) / 1e6),
            }
        ).filter(pa.array(keep))

    agg = (
        points_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Sum("num"), Sum("den"))
    )
    return agg.map_batches(finalize, batch_format="pyarrow")


def nearest_polygon(points_ds, id_col: str = "page_id"):
    """Reverse-geocode flavor: for every point, the polygon with the nearest
    boundary (exact point-to-segment distance, ties to the lower poly_id).

    -> (id_col, poly_id, dist2).  Broadcast join: the edge table is tiny and
    lives in each task; pages stream through, nothing shuffles.  The clamp
    ``t = min(max(raw, 0), 1)`` and the distance expression are mirrored
    verbatim in ``sql/oracles.nearest_polygon_sql`` (min over edges is exact
    — no float accumulation — so cross-engine argmin is deterministic).
    """
    from .pip import polygon_edges

    edges = polygon_edges()
    pids = sorted({e[0] for e in edges})

    def nearest(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        best_d2 = np.full(len(lat), np.inf)
        best_pid = np.zeros(len(lat), dtype=np.int64)
        for pid in pids:
            d2p = np.full(len(lat), np.inf)
            for epid, y1, x1, y2, x2 in edges:
                if epid != pid:
                    continue
                len2 = (y2 - y1) * (y2 - y1) + (x2 - x1) * (x2 - x1)
                t = ((lat - y1) * (y2 - y1) + (lon - x1) * (x2 - x1)) / len2
                t = np.minimum(np.maximum(t, 0.0), 1.0)
                dy = lat - (y1 + t * (y2 - y1))
                dx = lon - (x1 + t * (x2 - x1))
                d2p = np.minimum(d2p, dy * dy + dx * dx)
            # strict < keeps the LOWER poly_id on exact ties (pids ascending)
            take = d2p < best_d2
            best_d2 = np.where(take, d2p, best_d2)
            best_pid = np.where(take, pid, best_pid)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "poly_id": pa.array(best_pid),
                "dist2": pa.array(np.floor(best_d2 * 1e6 + 0.5) / 1e6),
            }
        )

    return points_ds.map_batches(nearest, batch_format="pyarrow")


def pip_anti(points_ds, id_col: str = "page_id"):
    """Spatial ANTI join: points contained by NO polygon (the complement of
    ``pip.pip_join`` under the identical crossing rule).  Pure streaming
    filter — broadcast-small polygon set, no shuffle."""

    def keep_outside(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        inside_any = np.zeros(len(lat), dtype=bool)
        for _, ring in POLYGONS:
            inside_any |= points_in_polygon(lat, lon, ring)
        return pa.table({id_col: batch.column(id_col).filter(pa.array(~inside_any))})

    return points_ds.map_batches(keep_outside, batch_format="pyarrow")


#: default demo bbox for the range query (Europe-ish), shared with the oracle.
BBOX = (20.0, 50.0, -10.0, 30.0)  # lat_min, lat_max, lon_min, lon_max


def bbox_query(points_ds, bbox=BBOX, id_col: str = "page_id"):
    """Spatial range query: points with lat/lon inside an axis-aligned box
    (inclusive bounds) -> (id_col, lat, lon, lang).  Pure streaming filter;
    at 100 TB this composes with the Parquet reader's row-group pruning when
    lat/lon are stored sorted by cell."""
    lat_min, lat_max, lon_min, lon_max = bbox

    def in_box(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        m = (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
        keep = pa.array(m)
        return pa.table(
            {
                id_col: batch.column(id_col).filter(keep),
                "lat": pa.array(np.floor(lat[m] * 1e6 + 0.5) / 1e6),
                "lon": pa.array(np.floor(lon[m] * 1e6 + 0.5) / 1e6),
                "lang": batch.column("lang").filter(keep),
            }
        )

    return points_ds.map_batches(in_box, batch_format="pyarrow")


def _cover_cells(res: int, polygons) -> dict[int, list[int]]:
    """cell -> candidate poly_ids: all cells whose center lies within each
    polygon's bbox EXPANDED by one cell circumradius (any cell that contains
    a point of the bbox has its center within one edge length of it), via
    the same stripe enumeration as :func:`polyfill`.  Driver-side and tiny:
    O(bbox area / cell area) per polygon — this is the engine's analog of an
    S2 covering of the polygon set."""
    size = hexgrid.edge_size(res)
    cover: dict[int, list[int]] = {}
    for pid, ring in polygons:
        lats = [y for y, _ in ring]
        lons = [x for _, x in ring]
        ymin, ymax = min(lats) - size, max(lats) + size
        xmin, xmax = min(lons) - size, max(lons) + size
        r0 = int(np.floor(ymin / (1.5 * size)))
        r1 = int(np.floor(ymax / (1.5 * size))) + 1
        for r in range(r0, r1 + 1):
            q0 = int(np.floor(xmin / (size * hexgrid.SQRT3) - r / 2.0))
            q1 = int(np.floor(xmax / (size * hexgrid.SQRT3) - r / 2.0)) + 1
            q = np.arange(q0, q1 + 1, dtype=np.int64)
            for c in hexgrid.pack(res, q, np.full(len(q), r, dtype=np.int64)):
                cover.setdefault(int(c), []).append(pid)
    return cover


def pip_join_indexed(points_ds, res: int = 7, polygons=None,
                     id_col: str = "page_id"):
    """Exact PIP join accelerated by a broadcast cell-cover index (the
    north_star's "ray-casting on covered polygon partitions").

    The polygon set is pre-covered with hex cells at ``res`` (bbox expanded
    by one circumradius, so no containing cell is missed); each page batch
    first probes its ``cell`` against the sorted cover (vectorized
    searchsorted) and only the hits run the exact crossing test against
    their candidate polygons.  Same output contract as ``pip.pip_join`` —
    the DuckDB oracle is literally ``pip_join_sql``.  At 100 TB the exact
    ray-cast runs on the bbox-area fraction of pages instead of all of
    them, and nothing shuffles."""
    import ray

    polygons = polygons or POLYGONS
    rings = {pid: ring for pid, ring in polygons}
    cover = _cover_cells(res, polygons)
    cover_cells = np.array(sorted(cover), dtype=np.int64)
    # per-poly sorted candidate cell arrays for vectorized membership
    per_poly = {
        pid: np.array(sorted(c for c, ps in cover.items() if pid in ps), dtype=np.int64)
        for pid in rings
    }
    idx_ref = ray.put((cover_cells, per_poly, rings))

    def probe(batch: pa.Table) -> pa.Table:
        cells_sorted, by_poly, local_rings = ray.get(idx_ref)
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cells_sorted) == 0:  # no polygon covers any cell
            return pa.table(
                {
                    id_col: pa.array(np.array([], dtype=np.int64)),
                    "poly_id": pa.array(np.array([], dtype=np.int64)),
                }
            )
        pos = np.searchsorted(cells_sorted, cell)
        pos_c = np.minimum(pos, len(cells_sorted) - 1)
        any_hit = cells_sorted[pos_c] == cell
        out_id, out_pid = [], []
        for pid, cand in by_poly.items():
            if len(cand) == 0:
                continue  # custom polygon whose bbox covers no cell
            m = any_hit.copy()
            if not m.any():
                continue
            p2 = np.minimum(np.searchsorted(cand, cell), len(cand) - 1)
            m &= cand[p2] == cell
            if not m.any():
                continue
            inside = points_in_polygon(lat[m], lon[m], local_rings[pid])
            hit_ids = ids[m][inside]
            out_id.append(hit_ids)
            out_pid.append(np.full(len(hit_ids), pid, dtype=np.int64))
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array(np.array([], dtype=np.int64)),
                    "poly_id": pa.array(np.array([], dtype=np.int64)),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "poly_id": pa.array(np.concatenate(out_pid)),
            }
        )

    return points_ds.map_batches(probe, batch_format="pyarrow")


RIPLEY_RADII = (0.25, 0.5, 1.0)


def ripley_k(points_ds, radii: tuple[float, ...] = RIPLEY_RADII,
             bucket_res: int = 6, id_col: str = "page_id"):
    """points -> (radius, n_pairs, k_hat): Ripley's K point-pattern
    statistic — for each radius r, the count of unordered point pairs
    within r (equirectangular degrees) and the K estimate
    ``K(r) = A * 2 * n_pairs / (n * (n - 1))`` with A the observed
    bounding-box area.  K(r) >> pi*r^2 reads as clustering at scale r,
    << as dispersion — the spatial-statistics companion of Moran's I /
    Gi* already in the engine.

    Scale shape: ONE bucket+halo pair sweep at max(radii) (the
    :func:`distance_join` plan — never an all-pairs join), then a per-batch
    fixed-arity count partial (one column per radius) that reduces to a
    single row; the bbox/count moments are one aggregate over the points.
    Per-radius membership tests the ROUNDED pair distance (the join's
    emitted round6(dist2)) so the oracle can replay the identical
    predicate.  Pairs are exact, not border-corrected (K-hat naive form).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    radii = tuple(sorted(radii))
    st = points_ds.aggregate(Min("lat", alias_name="la0"),
                             Max("lat", alias_name="la1"),
                             Min("lon", alias_name="lo0"),
                             Max("lon", alias_name="lo1"),
                             Count(alias_name="n"))
    n = int(st["n"])
    if n < 2:
        raise ValueError("ripley_k: need at least 2 points")
    area = (st["la1"] - st["la0"]) * (st["lo1"] - st["lo0"])

    pairs = distance_join(points_ds, radius=max(radii),
                          bucket_res=bucket_res, id_col=id_col)
    cols = [f"c{i}" for i in range(len(radii))]

    def partial(batch: pa.Table) -> pa.Table:
        d2 = batch.column("dist2").to_numpy(zero_copy_only=False)
        return pa.table({c: pa.array([int((d2 <= r * r).sum())], pa.int64())
                         for c, r in zip(cols, radii)})

    agg = pairs.map_batches(partial, batch_format="pyarrow").sum(cols)
    n_pairs = [int(agg[f"sum({c})"]) if agg else 0 for c in cols]
    denom = n * (n - 1)
    k_hat = [np.floor(area * 2.0 * p / denom * 1e6 + 0.5) / 1e6
             for p in n_pairs]
    return rd.from_arrow(pa.table({
        "radius": pa.array(list(radii), pa.float64()),
        "n_pairs": pa.array(n_pairs, pa.int64()),
        "k_hat": pa.array(k_hat, pa.float64()),
    }))


def zonal_majority(points_ds):
    """Per-polygon MAJORITY class: the most frequent ``lang`` among the
    pages inside each polygon (ties: lexicographically smallest lang) ->
    (poly_id, major_lang, n) — the categorical counterpart of
    :func:`zonal_stats` (raster-zone mode, e.g. dominant land-cover class
    per district).

    Scale shape: identical to zonal_stats — each batch ray-casts against
    the broadcast polygon set and reduces to |polys| x |langs| partial
    rows (both bounded); one tiny keyed reduce and a per-polygon argmax
    on the reduced table finish it.  Pages never shuffle."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.reduce import hash_groupby

    polys = POLYGONS

    def partials(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        pid_o, lang_o, n_o = [], [], []
        for pid, ring in polys:
            inside = points_in_polygon(lat, lon, ring)
            if not inside.any():
                continue
            uniq, cnt = np.unique(lang[inside].astype(str),
                                  return_counts=True)
            pid_o.extend([pid] * len(uniq))
            lang_o.extend(uniq.tolist())
            n_o.extend(cnt.astype(np.int64).tolist())
        return pa.table({
            "poly_id": pa.array(pid_o, pa.int64()),
            "lang": pa.array(lang_o, pa.string()),
            "n": pa.array(n_o, pa.int64()),
        })

    from ray.data.aggregate import Sum

    counts = (
        points_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["poly_id", "lang"])
        .aggregate(Sum("n", alias_name="n"))  # |polys| x |langs| keys
        .to_pandas()
    )
    counts = counts.sort_values(["poly_id", "n", "lang"],
                                ascending=[True, False, True],
                                kind="mergesort")
    top = counts.groupby("poly_id", sort=True).head(1)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "poly_id": pa.array(top["poly_id"].to_numpy(np.int64)),
        "major_lang": pa.array(top["lang"].tolist(), pa.string()),
        "n": pa.array(top["n"].to_numpy(np.int64)),
    }))


ZONE_TERMS_K = 5


def zone_terms(points_ds, k: int = ZONE_TERMS_K, n_parts: int | None = None):
    """Top-``k`` tokens per polygon zone -> (poly_id, rank, token, n):
    the geographic term profile (what is the corpus inside each region
    talking about?) — the spatial twin of ``cluster_terms`` with PIP
    containment instead of k-means assignment.

    Scale shape: each batch ray-casts once per polygon (broadcast-small
    set), tokenizes with the shared Arrow kernels and emits batch-local
    (poly, token, n) partials; a (poly, token) pair-hash coarse-partition
    reduce completes the counts (the grouped_topk discipline — one
    vectorized groupby per PARTITION, never Ray's many-key aggregate);
    per-partition local top-k then a |polys| x n_parts x k driver merge.
    Ties: (n DESC, token ASC)."""
    n_parts = default_parts() if n_parts is None else n_parts
    import pandas as pd
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions import hashing

    polys = POLYGONS

    def partials(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = split.flatten()
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "")
        row_idx = row_idx[nonempty.to_numpy(zero_copy_only=False)]
        toks = flat.filter(nonempty)
        dic = toks.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncodes = len(dic.dictionary)
        out_p, out_tok, out_n = [], [], []
        for pid, ring in polys:
            inside = points_in_polygon(lat, lon, ring)
            sel = inside[row_idx]
            if not sel.any():
                continue
            cnt = np.bincount(codes[sel], minlength=ncodes)
            nz = np.flatnonzero(cnt)
            out_p.append(np.full(len(nz), pid, np.int64))
            out_tok.append(dic.dictionary.take(pa.array(nz)))
            out_n.append(cnt[nz].astype(np.int64))
        if not out_p:
            return pa.table({"poly_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        pid_a = np.concatenate(out_p)
        tok_a = pa.concat_arrays([t.cast(pa.string()) for t in out_tok])
        n_a = np.concatenate(out_n)
        pair = pa.array(np.char.add(np.char.add(
            pid_a.astype(str), "\x1f"),
            np.asarray(tok_a.to_pylist(), dtype=object).astype(str)))
        h = hashing.poly_hash64(pair).view(np.int64)
        return pa.table({"poly_id": pa.array(pid_a), "token": tok_a,
                         "n": pa.array(n_a),
                         "__part": pa.array(
                             hashing.coarse_partition(h, n_parts))})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["poly_id", "token"], sort=False)["n"].sum() \
            .reset_index()
        # local top-k per poly inside the partition
        g = g.sort_values(["poly_id", "n", "token"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby("poly_id", sort=False).head(k)

    local = (
        points_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()  # |polys| x n_parts x k rows
    )
    local = local.sort_values(["poly_id", "n", "token"],
                              ascending=[True, False, True], kind="mergesort")
    top = local.groupby("poly_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("poly_id").cumcount() + 1
    return rd.from_arrow(pa.table({
        "poly_id": pa.array(top["poly_id"].to_numpy(np.int64)),
        "rank": pa.array(top["rank"].to_numpy(np.int64)),
        "token": pa.array(top["token"].tolist(), pa.string()),
        "n": pa.array(top["n"].to_numpy(np.int64)),
    }))


def host_extent(points_ds, n_parts: int | None = None):
    """geocoded pages -> per-host geographic footprint: (host, n_pages,
    min_lat, max_lat, min_lon, max_lon, extent_deg2) — the bounding box of
    each host's page locations and its area in square degrees (a crawl-
    coverage / geo-spread diagnostic: is this host local or global?).

    Scale shape: batch-local per-host partial extremes (np.minimum/
    maximum.at), then ONE host-keyed mixed reduce (min/min/max/max/isum
    in a single shuffle).  Min/max of doubles is order-independent, so
    the float columns stay exactly comparable; the area is the one
    derived column, rounded canonically on both sides."""
    n_parts = default_parts() if n_parts is None else n_parts
    import ray.data as rd

    from ..functions import geocode
    from ..functions.reduce import hash_groupby
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("page_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        host = geocode.host_id(pid % REP_STRIDE).astype(np.int64)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(host, return_inverse=True)
        mn_lat = np.full(len(uniq), np.inf)
        mx_lat = np.full(len(uniq), -np.inf)
        mn_lon = np.full(len(uniq), np.inf)
        mx_lon = np.full(len(uniq), -np.inf)
        np.minimum.at(mn_lat, inv, lat)
        np.maximum.at(mx_lat, inv, lat)
        np.minimum.at(mn_lon, inv, lon)
        np.maximum.at(mx_lon, inv, lon)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "host": pa.array(uniq), "n_pages": pa.array(n),
            "min_lat": pa.array(mn_lat), "max_lat": pa.array(mx_lat),
            "min_lon": pa.array(mn_lon), "max_lon": pa.array(mx_lon),
        })

    agg = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "host",
        ["n_pages", "min_lat", "max_lat", "min_lon", "max_lon"],
        how={"n_pages": "isum", "min_lat": "min", "max_lat": "max",
             "min_lon": "min", "max_lon": "max"},
        n_parts=n_parts,
    )

    def finish(batch: pa.Table) -> pa.Table:
        mn_lat = batch.column("min_lat").to_numpy(zero_copy_only=False)
        mx_lat = batch.column("max_lat").to_numpy(zero_copy_only=False)
        mn_lon = batch.column("min_lon").to_numpy(zero_copy_only=False)
        mx_lon = batch.column("max_lon").to_numpy(zero_copy_only=False)
        area = np.floor((mx_lat - mn_lat) * (mx_lon - mn_lon) * 1e6 + 0.5) / 1e6
        return pa.table({
            "host": batch.column("host"), "n_pages": batch.column("n_pages"),
            "min_lat": pa.array(np.floor(mn_lat * 1e6 + 0.5) / 1e6),
            "max_lat": pa.array(np.floor(mx_lat * 1e6 + 0.5) / 1e6),
            "min_lon": pa.array(np.floor(mn_lon * 1e6 + 0.5) / 1e6),
            "max_lon": pa.array(np.floor(mx_lon * 1e6 + 0.5) / 1e6),
            "extent_deg2": pa.array(area),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None).sort("host")


HULL_DIRS = 16
#: unit directions of the K-gon support hull, quantized ONCE to
#: micro-units — shared verbatim with the SQL oracle's VALUES table.
HULL_DX = tuple(int(np.floor(np.cos(2 * np.pi * k / HULL_DIRS) * 1e6 + 0.5))
                for k in range(HULL_DIRS))
HULL_DY = tuple(int(np.floor(np.sin(2 * np.pi * k / HULL_DIRS) * 1e6 + 0.5))
                for k in range(HULL_DIRS))


def support_hull(points_ds):
    """geocoded pages -> per (tld, direction) row (tld, dir, x, y,
    area2): the DIRECTIONAL SUPPORT HULL of each TLD's page cloud — the
    convex K-gon whose vertex in direction k is the point maximizing
    ``dx_k * x + dy_k * y`` (micro-degree integer coordinates), plus the
    doubled shoelace area of that K-gon.  The classic distributed
    convex-hull shape: support maxima are MERGEABLE (max of maxima), so
    each partition ships K points per TLD and the hull-of-hulls is
    exact for the sampled directions — no pairwise geometry ever
    shuffles.

    EXACT: coordinates quantize once to micro-degrees, directions come
    from the shared micro-unit table, the dot products / tie-breaks
    (max dot, then min (x, y)) and the shoelace ``sum(x_k * y_{k+1} -
    x_{k+1} * y_k)`` are pure int64.  Scale shape: batch-local argmax
    partials -> driver merge over |tlds| x K x |batches| rows."""
    import pyarrow.compute as pc_
    import ray.data as rd

    dx = np.array(HULL_DX, dtype=np.int64)
    dy = np.array(HULL_DY, dtype=np.int64)
    K = HULL_DIRS

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"tld": pa.array([], pa.string()),
                             "dir": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        parts = pc_.split_pattern(batch.column("url"), pattern="/")
        host = pc_.list_element(parts, 2)
        tld_arr = pc_.list_element(
            pc_.split_pattern(host, pattern=".", max_splits=1, reverse=True),
            1)
        tlds = np.asarray(tld_arr.to_pylist(), dtype=object)
        x = np.floor(batch.column("lat").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        y = np.floor(batch.column("lon").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        uniq, inv = np.unique(tlds, return_inverse=True)
        out_t, out_k, out_d, out_x, out_y = [], [], [], [], []
        for k in range(K):
            dot = dx[k] * x + dy[k] * y
            order = np.lexsort((y, x, -dot, inv))
            _, first = np.unique(inv[order], return_index=True)
            sel = order[first]
            out_t += uniq.tolist()
            out_k += [k] * len(sel)
            out_d += dot[sel].tolist()
            out_x += x[sel].tolist()
            out_y += y[sel].tolist()
        return pa.table({"tld": pa.array(out_t, pa.string()),
                         "dir": pa.array(out_k, pa.int64()),
                         "dot": pa.array(out_d, pa.int64()),
                         "x": pa.array(out_x, pa.int64()),
                         "y": pa.array(out_y, pa.int64())})

    part = points_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        raise ValueError("support_hull: no pages")
    # merge: max dot then min (x, y) per (tld, dir)
    part = part.sort_values(["tld", "dir", "dot", "x", "y"],
                            ascending=[True, True, False, True, True],
                            kind="mergesort")
    pick = part.groupby(["tld", "dir"], sort=True).head(1) \
        .reset_index(drop=True)
    rows = {"tld": [], "dir": [], "x": [], "y": [], "area2": []}
    for tld, grp in pick.groupby("tld", sort=True):
        g = grp.sort_values("dir")
        xs = g["x"].to_numpy(np.int64)
        ys = g["y"].to_numpy(np.int64)
        a2 = int((xs * np.roll(ys, -1) - np.roll(xs, -1) * ys).sum())
        rows["tld"] += [tld] * len(g)
        rows["dir"] += g["dir"].tolist()
        rows["x"] += xs.tolist()
        rows["y"] += ys.tolist()
        rows["area2"] += [a2] * len(g)
    return rd.from_arrow(pa.table({
        "tld": pa.array(rows["tld"], pa.string()),
        "dir": pa.array(rows["dir"], pa.int64()),
        "x": pa.array(rows["x"], pa.int64()),
        "y": pa.array(rows["y"], pa.int64()),
        "area2": pa.array(rows["area2"], pa.int64()),
    }))


def jitter_rose(points_ds):
    """geocoded pages -> (tld, sector, n): the COMPASS ROSE of page
    displacements from their TLD's base centroid — counts per 8
    half-quadrant sectors (``sector = 2*quadrant + [|dlat| < |dlon|]``),
    the anisotropy readout of the geocoder: jitter-only TLDs are near-
    uniform across sectors, lat/lon-mention pages skew the rose toward
    where the mentions actually are.

    EXACT: displacements are micro-degree integer differences (both
    coordinates quantized with the shared floor(x*1e6+0.5) rule) and the
    sector is pure sign/|.| comparisons — no trigonometry, no float.
    The zero vector lands in sector 0 by the half-open rule (declared).
    Scale shape: batch-local (tld, sector) counts, one bounded two-key
    reduce."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions import geocode
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = pid % REP_STRIDE
        idx = geocode.tld_index(doc)
        names = np.array([t[0] for t in geocode.TLD_TABLE], dtype=object)
        base_lat = np.array([t[1] for t in geocode.TLD_TABLE])
        base_lon = np.array([t[2] for t in geocode.TLD_TABLE])
        x = np.floor(batch.column("lat").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        y = np.floor(batch.column("lon").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        dx = x - np.floor(base_lat[idx] * 1e6 + 0.5).astype(np.int64)
        dy = y - np.floor(base_lon[idx] * 1e6 + 0.5).astype(np.int64)
        quad = np.where(dx >= 0,
                        np.where(dy >= 0, 0, 3),
                        np.where(dy >= 0, 1, 2)).astype(np.int64)
        sector = 2 * quad + (np.abs(dy) > np.abs(dx)).astype(np.int64)
        df = pd_.DataFrame({"tld": names[idx], "sector": sector})
        g = df.groupby(["tld", "sector"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tld", "sector"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["tld", "sector"])
    )


def circular_stats(points_ds):
    """geocoded pages -> (tld, n, sum_cx, sum_cy, r_len): CIRCULAR
    STATISTICS of the displacement directions from the TLD base
    centroid — the mean resultant length ``R = |sum of unit vectors| /
    n`` in [0, 1], the standard directional-concentration measure
    (R ~ 0 = isotropic jitter, R -> 1 = all displacements point one
    way).  The continuous companion to :func:`jitter_rose`'s sector
    histogram (von Mises concentration estimates start from R).

    Float discipline: each displacement's unit vector is quantized ONCE
    to micro-units (``floor(d/hypot * 1e6 + 0.5)``, the
    :func:`~.triangles.adamic_adar` trick), so the per-TLD sums are
    order-free integers; sqrt IS correctly rounded under IEEE (unlike
    ln), so ``hypot = sqrt(dx^2 + dy^2)`` agrees bit-for-bit across
    engines.  Zero displacements are skipped (no direction — declared).
    Scale shape: batch-local integer partials, one bounded TLD
    reduce."""
    import math

    import ray.data as rd

    from ..functions import geocode
    from ..functions.reduce import hash_groupby
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = pid % REP_STRIDE
        idx = geocode.tld_index(doc)
        base_lat = np.array([t[1] for t in geocode.TLD_TABLE])
        base_lon = np.array([t[2] for t in geocode.TLD_TABLE])
        x = np.floor(batch.column("lat").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        y = np.floor(batch.column("lon").to_numpy(zero_copy_only=False)
                     * 1e6 + 0.5).astype(np.int64)
        dx = (x - np.floor(base_lat[idx] * 1e6 + 0.5).astype(np.int64)) \
            .astype(np.float64)
        dy = (y - np.floor(base_lon[idx] * 1e6 + 0.5).astype(np.int64)) \
            .astype(np.float64)
        hyp = np.sqrt(dx * dx + dy * dy)
        nz = hyp > 0.0
        cx = np.floor(dx[nz] / hyp[nz] * 1e6 + 0.5).astype(np.int64)
        cy = np.floor(dy[nz] / hyp[nz] * 1e6 + 0.5).astype(np.int64)
        tid = idx[nz].astype(np.int64)
        uniq, inv = np.unique(tid, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sx = np.zeros(len(uniq), np.int64)
        sy = np.zeros(len(uniq), np.int64)
        np.add.at(sx, inv, cx)
        np.add.at(sy, inv, cy)
        return pa.table({"tid": pa.array(uniq), "n": pa.array(n),
                         "sx": pa.array(sx), "sy": pa.array(sy)})

    agg = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "tid", ["n", "sx", "sy"], how="isum",
    ).to_pandas().sort_values("tid")
    if agg.empty:
        raise ValueError("circular_stats: no displaced pages")
    names = [geocode.TLD_TABLE[int(t)][0] for t in agg["tid"]]
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    rl = [r6(math.sqrt(float(int(a) * int(a) + int(b) * int(b)))
             / float(int(n) * 10**6))
          for a, b, n in zip(agg["sx"], agg["sy"], agg["n"])]
    return rd.from_arrow(pa.table({
        "tld": pa.array(names, pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "sum_cx": pa.array(agg["sx"].to_numpy(np.int64)),
        "sum_cy": pa.array(agg["sy"].to_numpy(np.int64)),
        "r_len": pa.array(rl, pa.float64()),
    })).sort("tld")


def geo_dispersion(points_ds):
    """geocoded pages -> (tld, n, msd): per-TLD GEOGRAPHIC DISPERSION —
    the mean pairwise squared distance between a TLD's pages in
    milli-degree^2, CLOSED FROM MOMENTS: ``sum_{i<j} |p_i - p_j|^2 =
    n * sum|p|^2 - |sum p|^2``, so no pair ever materializes (the
    identity behind :func:`~.stages.hotspot.geary_c`'s pair closure).
    The scalar spread measure next to :func:`host_extent`'s bbox —
    robust to a single outlier page in a way the bbox is not.

    EXACT: coordinates quantize once to milli-degrees (declared
    precision — squared micro-degrees would overflow int64 partials at
    volume), moments are integer sums, one round6 division.  Scale
    shape: batch-local (tld, 4-scalar) partials, one bounded reduce."""
    import ray.data as rd

    from ..functions import geocode
    from ..functions.reduce import hash_groupby
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = geocode.tld_index(pid % REP_STRIDE).astype(np.int64)
        x = np.floor(batch.column("lat").to_numpy(zero_copy_only=False)
                     * 1e3 + 0.5).astype(np.int64)
        y = np.floor(batch.column("lon").to_numpy(zero_copy_only=False)
                     * 1e3 + 0.5).astype(np.int64)
        uniq, inv = np.unique(idx, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sx = np.zeros(len(uniq), np.int64)
        sy = np.zeros(len(uniq), np.int64)
        sq = np.zeros(len(uniq), np.int64)
        np.add.at(sx, inv, x)
        np.add.at(sy, inv, y)
        np.add.at(sq, inv, x * x + y * y)
        return pa.table({"tid": pa.array(uniq), "n": pa.array(n),
                         "sx": pa.array(sx), "sy": pa.array(sy),
                         "sq": pa.array(sq)})

    agg = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "tid", ["n", "sx", "sy", "sq"], how="isum",
    ).to_pandas().sort_values("tid")
    if agg.empty:
        raise ValueError("geo_dispersion: no pages")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"tld": [], "n": [], "msd": []}
    for rec in agg.itertuples():
        n, sx, sy, sq = (int(rec.n), int(rec.sx), int(rec.sy), int(rec.sq))
        if n < 2:
            continue  # a single page has no pairs (declared)
        num = n * sq - sx * sx - sy * sy  # python ints, exact
        rows["tld"].append(geocode.TLD_TABLE[int(rec.tid)][0])
        rows["n"].append(n)
        rows["msd"].append(r6(float(2 * num) / float(n * (n - 1))))
    return rd.from_arrow(pa.table({
        "tld": pa.array(rows["tld"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "msd": pa.array(rows["msd"], pa.float64()),
    })).sort("tld")


def clark_evans(points_ds):
    """geocoded pages -> ONE row (n, sum_nn_micro, r_index): the
    CLARK-EVANS aggregation index — observed mean nearest-neighbor
    distance over the expected mean under complete spatial randomness
    in the bounding box, ``R = mean(d_NN) / (0.5 / sqrt(n / A))``
    (R < 1 clustered, ~1 random, > 2 dispersed).  THE classic
    point-pattern first test, next to :func:`~.stages.spatialjoin`'s
    Ripley K curve.

    EXACT aggregation: each page's NN distance (equirectangular degree
    metric, the :func:`distance_join` convention) is quantized ONCE to
    micro-degrees (IEEE sqrt — exact), so the sum is an order-free
    integer; bbox extremes are exact float min/max; R is one shared
    float tree.  Scale shape: the candidate set is broadcast once
    (bounded pages table — at open-web volume the ring-expanding
    bucket+halo NN join replaces it, same output); per batch ONE
    vectorized (batch x n) distance matrix with self-exclusion."""
    import math

    import ray
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    all_pts = points_ds.map_batches(
        lambda b: pa.table({"page_id": b.column("page_id"),
                            "lat": b.column("lat"),
                            "lon": b.column("lon")}),
        batch_format="pyarrow").to_pandas()
    n = len(all_pts)
    if n < 2:
        raise ValueError("clark_evans: need >= 2 pages")
    ref = ray.put((all_pts["page_id"].to_numpy(np.int64),
                   all_pts["lat"].to_numpy(np.float64),
                   all_pts["lon"].to_numpy(np.float64)))

    def partial(batch: pa.Table) -> pa.Table:
        ids_all, lat_all, lon_all = ray.get(ref)
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        d2 = ((lat[:, None] - lat_all[None, :]) ** 2
              + (lon[:, None] - lon_all[None, :]) ** 2)
        d2[pid[:, None] == ids_all[None, :]] = np.inf  # self-exclusion
        nn = np.sqrt(d2.min(axis=1))
        q = np.floor(nn * 1e6 + 0.5).astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([int(q.sum())], pa.int64()),
                         "c": pa.array([len(q)], pa.int64())})

    agg = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "k", ["s", "c"], how="isum",
    ).to_pandas()
    s = int(agg["s"].sum())
    cnt = int(agg["c"].sum())
    lat_lo, lat_hi = float(all_pts["lat"].min()), float(all_pts["lat"].max())
    lon_lo, lon_hi = float(all_pts["lon"].min()), float(all_pts["lon"].max())
    area = (lat_hi - lat_lo) * (lon_hi - lon_lo)
    if area <= 0.0:
        raise ValueError("clark_evans: degenerate bounding box")
    obs = float(s) / float(cnt) / 1e6
    exp = 0.5 / math.sqrt(float(cnt) / area)
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([cnt], pa.int64()),
        "sum_nn_micro": pa.array([s], pa.int64()),
        "r_index": pa.array([r6(obs / exp)], pa.float64()),
    }))


def median_center(points_ds):
    """geocoded pages -> (tld, n, med_lat_micro, med_lon_micro,
    iqr_lat_micro, iqr_lon_micro): robust SPATIAL CENTROGRAPHY — each
    TLD cloud's per-dimension median center and interquartile spread in
    micro-degrees (the robust siblings of the mean center /
    :func:`host_extent` bbox: one runaway lat/lon mention cannot move
    them).

    EXACT: coordinates quantize once to micro-degrees; medians and
    quartiles use the rank ``floor((n-1)*q)`` rule on the per-(tld,
    dim) value histograms (the :func:`~.sketch.grouped_quantiles`
    definition).  Scale shape: one bounded (tld, dim, value) histogram
    shuffle, driver rank walks."""
    import ray.data as rd

    from ..functions import geocode
    from ..functions.reduce import hash_groupby
    from ..sources.pages import REP_STRIDE

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = geocode.tld_index(pid % REP_STRIDE).astype(np.int64)
        lat = np.floor(batch.column("lat").to_numpy(zero_copy_only=False)
                       * 1e6 + 0.5).astype(np.int64)
        lon = np.floor(batch.column("lon").to_numpy(zero_copy_only=False)
                       * 1e6 + 0.5).astype(np.int64)
        # key = tld * 2 + dim; value column carries the coordinate
        import pandas as pd_

        df = pd_.DataFrame({
            "key": np.concatenate([idx * 2, idx * 2 + 1]),
            "v": np.concatenate([lat, lon]),
        })
        g = df.groupby(["key", "v"], sort=False).size().reset_index(name="c")
        return pa.table({"key": pa.array(g["key"].to_numpy(np.int64)),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    hist = (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "v"])
        .sum("c")
    ).to_pandas()
    col = "sum(c)"
    if hist.empty:
        raise ValueError("median_center: no pages")

    def rank_val(vs, cs, q_num, q_den, n):
        r = ((n - 1) * q_num) // q_den
        cum = np.cumsum(cs)
        return int(vs[np.searchsorted(cum, r + 1)])

    out = {"tld": [], "n": [], "med_lat_micro": [], "med_lon_micro": [],
           "iqr_lat_micro": [], "iqr_lon_micro": []}
    keys = hist["key"].to_numpy(np.int64)
    for t in np.unique(keys // 2):
        stats = {}
        for dim in (0, 1):
            g = hist[keys == t * 2 + dim].sort_values("v")
            vs = g["v"].to_numpy(np.int64)
            cs = g[col].to_numpy(np.int64)
            n = int(cs.sum())
            med = rank_val(vs, cs, 1, 2, n)
            q1 = rank_val(vs, cs, 1, 4, n)
            q3 = rank_val(vs, cs, 3, 4, n)
            stats[dim] = (n, med, q3 - q1)
        out["tld"].append(geocode.TLD_TABLE[int(t)][0])
        out["n"].append(stats[0][0])
        out["med_lat_micro"].append(stats[0][1])
        out["med_lon_micro"].append(stats[1][1])
        out["iqr_lat_micro"].append(stats[0][2])
        out["iqr_lon_micro"].append(stats[1][2])
    return rd.from_arrow(pa.table({
        "tld": pa.array(out["tld"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "med_lat_micro": pa.array(out["med_lat_micro"], pa.int64()),
        "med_lon_micro": pa.array(out["med_lon_micro"], pa.int64()),
        "iqr_lat_micro": pa.array(out["iqr_lat_micro"], pa.int64()),
        "iqr_lon_micro": pa.array(out["iqr_lon_micro"], pa.int64()),
    })).sort("tld")
