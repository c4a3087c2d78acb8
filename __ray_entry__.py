"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (pages -> geocode -> H3 encode ->
per-cell metrics -> fused k-ring Gaussian smoothing) on sf0.001.

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
callable over an ``sf_dir``; ``oracle_sql()`` returns the DuckDB-equivalent
SQL (generated from the same constants/formulas by
``cuda_gis_smoothing_ray.sql.oracles``) for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

RES = 7          # default hex resolution for the oracle-checked pipelines
TILE_ZOOM = 6


def _round6(x: np.ndarray) -> np.ndarray:
    """Canonical cross-engine rounding: floor(x*1e6+0.5)/1e6 (see oracles.D)."""
    return np.floor(x * 1000000.0 + 0.5) / 1000000.0


def _round6_cols(ds, cols: list[str]):
    def f(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.set_column(i, c, pa.array(_round6(v)))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _geocoded(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode

    return geo_encode(read_pages(sf_dir, include_html=False), res=RES)


def _cells(sf_dir: str):
    from cuda_gis_smoothing_ray.pipelines.flagship import cell_metrics

    return cell_metrics(_geocoded(sf_dir))


def _smooth(sf_dir: str, k: int, profile: str, cols: list[str],
            salted: bool = False):
    from cuda_gis_smoothing_ray.stages.smooth import smooth_cells

    sm = smooth_cells(_cells(sf_dir), cols, k=k, profile=profile, salted=salted)
    return _round6_cols(sm, [f"{c}_sm" for c in cols]).sort("cell")


def entry() -> Any:
    """Flagship pipeline on sf0.001 -> smoothed cell table Dataset."""
    from cuda_gis_smoothing_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001", res=RES, k=1, profile="gaussian", fused=True)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_extract_text(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.extract import extract_text

    # extraction MUST run on the real html bytes (include_html=True); the
    # oracle compares the result to documents.text per url byte-for-byte
    return extract_text(read_pages(sf_dir, include_html=True)).sort("page_id")


def _q_parse_urls(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.extract import parse_urls

    return parse_urls(read_pages(sf_dir, include_html=False)).sort("page_id")


def _q_recrawl_stats(sf_dir: str):
    """Per-host recapture-interval stats over 3 crawl snapshots
    (stages/extract.recrawl_stats; one host-keyed shuffle, segmented
    diffs, mixed isum/min/max reduce)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.extract import recrawl_stats

    return recrawl_stats(read_pages(sf_dir, replicate=3, include_html=False))


def _q_latest_capture(sf_dir: str):
    """Crawl-refresh dedup: 3 snapshots per url (read_pages replicate=3),
    keep the newest capture — vectorized two-phase argmax, Python per
    coarse hash partition, never per url; text carried byte-verbatim."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.extract import latest_capture

    return latest_capture(
        read_pages(sf_dir, replicate=3, include_html=False)
    ).sort("url")


def _q_geocode_cells(sf_dir: str):
    ds = _geocoded(sf_dir)
    ds = ds.select_columns(["page_id", "url", "lat", "lon", "has_mention", "cell"])
    return _round6_cols(ds, ["lat", "lon"]).sort("page_id")


def _q_cell_metrics(sf_dir: str):
    return _round6_cols(_cells(sf_dir), ["chars_mean", "en_share", "mention_rate"]).sort("cell")


def _q_incremental_metrics(sf_dir: str):
    """Delta-ingest maintenance (state/incr): persist per-cell partials of
    the BASE pages (page_id % 8 != 0), merge the DELTA (page_id % 8 == 0)
    as stored-partials UNION delta-partials + one cell re-reduce — the base
    pages are never rescanned.  Integer-exact partials make the result
    bit-identical to the full-rescan cell_metrics oracle, which is exactly
    the SQL this query is gated on."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_ray.state.incr import (incremental_metrics,
                                                   write_partials)

    import pyarrow.compute as pc

    def _split(batch, want_delta: bool):
        m = pc.equal(pc.bit_wise_and(batch.column("page_id"), 7), 0)
        return batch.filter(m if want_delta else pc.invert(m))

    g = _geocoded(sf_dir)
    out = tempfile.mkdtemp(prefix="graft_incr_")
    try:
        base = g.map_batches(lambda b: _split(b, False), batch_format="pyarrow")
        delta = g.map_batches(lambda b: _split(b, True), batch_format="pyarrow")
        write_partials(base, out)
        merged = incremental_metrics(out, delta)
        return _round6_cols(
            merged, ["chars_mean", "en_share", "mention_rate"]
        ).sort("cell").to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _q_unpivot_cells(sf_dir: str):
    """UNPIVOT/melt of the wide cell-metrics table: pure streaming map,
    no shuffle."""
    from cuda_gis_smoothing_ray.stages.relagg import unpivot

    long = unpivot(_cells(sf_dir), "cell",
                   ["page_count", "chars_mean", "en_share", "mention_rate"])
    return _round6_cols(long, ["value"]).sort(["cell", "metric"])


def _q_hosts_division(sf_dir: str):
    """Relational division: hosts whose EVERY doc is English — one
    host-keyed (total, matching) reduce, division closes as equality."""
    from cuda_gis_smoothing_ray.stages.textops import hosts_division

    return hosts_division(
        _docs(sf_dir, ("doc_id", "lang"))).sort("host")


def _q_ripley_k(sf_dir: str):
    """Ripley's K point-pattern statistic at three radii — one bucket+halo
    pair sweep, fixed-arity count partials (stages/spatialjoin.ripley_k)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import ripley_k

    return ripley_k(_geocoded(sf_dir))


def _q_kde_density(sf_dir: str):
    """Ring-2 kernel-density heat accumulation over page counts — the
    un-normalized choropleth heatmap (stages/smooth.kde_density)."""
    from cuda_gis_smoothing_ray.stages.smooth import kde_density

    return _round6_cols(kde_density(_cells(sf_dir)), ["density"]).sort("cell")


def _q_hex_gradient(sf_dir: str):
    """Per-cell max |neighbor - center| of chars_mean over present ring-1
    neighbors — the edge-detection high-pass complement of the K-family
    (stages/smooth.hex_gradient: scatter + ONE mixed max/min/sum reduce)."""
    from cuda_gis_smoothing_ray.stages.smooth import hex_gradient

    return _round6_cols(hex_gradient(_cells(sf_dir), "chars_mean"),
                        ["grad"]).sort("cell")


def _q_neighbor_stats(sf_dir: str):
    """Global min/max/avg/total of per-cell neighbor counts, computed with
    Dataset.aggregate — the driver receives ONE dict, never the cell table
    (engine analog of the reference's printStats, SURVEY §2.5 A1)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from cuda_gis_smoothing_ray.stages.smooth import neighbor_counts

    agg = neighbor_counts(_cells(sf_dir)).aggregate(
        Min("n_neighbors", alias_name="min_n"),
        Max("n_neighbors", alias_name="max_n"),
        Sum("n_neighbors", alias_name="sum_n"),
        Count(alias_name="n_cells"),
    )
    total = int(agg["sum_n"])
    n_cells = int(agg["n_cells"])
    return pa.table(
        {
            "min_neighbors": pa.array([int(agg["min_n"])], pa.int64()),
            "max_neighbors": pa.array([int(agg["max_n"])], pa.int64()),
            "avg_neighbors": pa.array([float(_round6(np.array([total / n_cells]))[0])]),
            "total_edges": pa.array([total], pa.int64()),
        }
    )


def _q_ring2_stats(sf_dir: str):
    """A4: standalone ring-2 neighborhood stats (the reference logs the
    ring-2 average as "ring2 size" in extended_neighborhoods_study:142)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from cuda_gis_smoothing_ray.stages.smooth import neighbor_counts

    agg = neighbor_counts(_cells(sf_dir), ring=2).aggregate(
        Min("n_neighbors", alias_name="min_n"),
        Max("n_neighbors", alias_name="max_n"),
        Sum("n_neighbors", alias_name="sum_n"),
        Count(alias_name="n_cells"),
    )
    total = int(agg["sum_n"])
    n_cells = int(agg["n_cells"])
    return pa.table(
        {
            "min_neighbors": pa.array([int(agg["min_n"])], pa.int64()),
            "max_neighbors": pa.array([int(agg["max_n"])], pa.int64()),
            "avg_neighbors": pa.array([float(_round6(np.array([total / n_cells]))[0])]),
            "total_edges": pa.array([total], pa.int64()),
        }
    )


def _q_hotspot_gi(sf_dir: str):
    """Getis-Ord Gi* hot-spot z-score per cell (binary closed-ring-1
    weights over present cells; x = page_count)."""
    from cuda_gis_smoothing_ray.stages.hotspot import hotspot_gi

    return _round6_cols(hotspot_gi(_cells(sf_dir), "page_count", k=1), ["gi_z"]).sort("cell")


def _q_moran_correlogram(sf_dir: str):
    """Spatial correlogram: Moran's I at exact hex lags 1..3
    (stages/hotspot.moran_correlogram)."""
    from cuda_gis_smoothing_ray.stages.hotspot import moran_correlogram

    return moran_correlogram(_cells(sf_dir), "page_count")


def _q_directional_variogram(sf_dir: str):
    """Directional lag-1 semivariogram (6 hex directions): anisotropy
    diagnostic (stages/hotspot.directional_variogram)."""
    from cuda_gis_smoothing_ray.stages.hotspot import directional_variogram

    return directional_variogram(_cells(sf_dir), "page_count")


def _q_emerging_hotspots(sf_dir: str):
    """Emerging-hot-spot analysis over the 3-snapshot spatiotemporal cube:
    per-day exact mean-cleared hot flags, persistent/emerging classes
    (stages/hotspot.emerging_hotspots)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.stages.gridops import spatiotemporal_counts
    from cuda_gis_smoothing_ray.stages.hotspot import emerging_hotspots

    geo = geo_encode(read_pages(sf_dir, replicate=3, include_html=False),
                     res=RES)
    return emerging_hotspots(spatiotemporal_counts(geo))


def _q_geary_c(sf_dir: str):
    """Geary's C spatial autocorrelation (ring-1 binary weights): exact
    integer num/den, one float division (stages/hotspot.geary_c)."""
    from cuda_gis_smoothing_ray.stages.hotspot import geary_c

    return geary_c(_cells(sf_dir), "page_count")


def _q_isoline_cells(sf_dir: str):
    """Contour/isoline cells at the exact corpus-mean level set: inner and
    outer boundary cells of the page_count field
    (stages/hotspot.isoline_cells)."""
    from cuda_gis_smoothing_ray.stages.hotspot import isoline_cells

    return isoline_cells(_cells(sf_dir), "page_count", k=1)


def _q_distance_transform(sf_dir: str):
    """Clipped distance transform: closed-form seed-disk scatter + ONE
    min-reduce (no BFS supersteps at small max_d)."""
    from cuda_gis_smoothing_ray.stages.hotspot import distance_transform

    return distance_transform(_cells(sf_dir), "page_count").sort("cell")


def _q_hex_voronoi(sf_dir: str):
    """Discrete Voronoi assignment to the nearest dense seed: (dist, seed)
    packed into one int64 min key — integer min IS the lexicographic
    argmin."""
    from cuda_gis_smoothing_ray.stages.hotspot import hex_voronoi

    return hex_voronoi(_cells(sf_dir), "page_count").sort("cell")


def _q_hist_equalize(sf_dir: str):
    """Histogram equalization of the page_count raster: bounded CDF
    codebook, streaming integer remap — bit-exact floor division."""
    from cuda_gis_smoothing_ray.stages.hotspot import hist_equalize

    return hist_equalize(_cells(sf_dir), "page_count").sort("cell")


def _q_otsu_threshold(sf_dir: str):
    """Otsu segmentation threshold on the page_count raster: one bounded
    value-histogram shuffle, exact big-int fraction argmax."""
    from cuda_gis_smoothing_ray.stages.hotspot import otsu_threshold

    return otsu_threshold(_cells(sf_dir), "page_count")


def _q_semivariogram(sf_dir: str):
    """Empirical semivariogram of page_count by exact hex lag d=1..3 —
    per-lag channels on the smoothing scatter-combine, no pair shuffle."""
    from cuda_gis_smoothing_ray.stages.hotspot import semivariogram

    return semivariogram(_cells(sf_dir), "page_count")


def _q_spatiotemporal_counts(sf_dir: str):
    """Space x crawl-time cube over 3 snapshots: (cell, day, page_count) —
    batch-local partials, bounded (cell x day) shuffle."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.stages.gridops import spatiotemporal_counts

    geo = geo_encode(read_pages(sf_dir, replicate=3, include_html=False),
                     res=RES)
    return spatiotemporal_counts(geo).sort(["cell", "day"])


def _q_raster_morphology(sf_dir: str):
    """Binary dilate/erode of the cell-occupancy raster in one
    scatter-combine pass (raster<->vector family): emitted rows = closed
    ring-1 dilation; eroded flag = interior cells with a full ring."""
    from cuda_gis_smoothing_ray.stages.hotspot import raster_morphology

    return raster_morphology(_cells(sf_dir), k=1).sort("cell")


def _q_morans_i(sf_dir: str):
    """Global Moran's I spatial autocorrelation of page_count (ring-1
    binary weights excluding self) — one scalar row."""
    from cuda_gis_smoothing_ray.stages.hotspot import morans_i

    t = morans_i(_cells(sf_dir), "page_count", k=1)
    i6 = _round6(t.column("morans_i").to_numpy(zero_copy_only=False))
    return t.set_column(0, "morans_i", pa.array(i6))


def _q_bivariate_morans(sf_dir: str):
    """Bivariate Moran's I: spatial cross-correlation of en_share vs the
    neighborhood's chars_mean — one scalar row (mention_rate is all-zero
    in the driver corpus, so chars_mean is the non-degenerate partner)."""
    from cuda_gis_smoothing_ray.stages.hotspot import bivariate_morans

    t = bivariate_morans(_cells(sf_dir), "en_share", "chars_mean", k=1)
    v6 = _round6(t.column("morans_ixy").to_numpy(zero_copy_only=False))
    return t.set_column(0, "morans_ixy", pa.array(v6))


def _q_grid_distance(sf_dir: str):
    """H3 grid_distance analog: hex distance of every cell to the densest
    cell (1-row top-k -> streaming map)."""
    from cuda_gis_smoothing_ray.stages.gridops import grid_distance_field

    return grid_distance_field(_cells(sf_dir)).sort("cell")


def _q_grid_path(sf_dir: str):
    """H3 grid_path_cells analog: cube-lerp hex line between the two
    densest cells (aggregate-sized output)."""
    from cuda_gis_smoothing_ray.stages.gridops import grid_path

    return grid_path(_cells(sf_dir))


def _q_route_corridor(sf_dir: str):
    """Cells (with page counts) within one ring of the densest-pair hex
    route: grid_path -> closed-ring dilation -> broadcast cell semi-join."""
    from cuda_gis_smoothing_ray.stages.gridops import route_corridor

    return route_corridor(_cells(sf_dir), k=1).sort("cell")


def _q_local_morans(sf_dir: str):
    """LISA cluster map: per-cell local Moran's I + HH/LL/HL/LH quadrant."""
    from cuda_gis_smoothing_ray.stages.hotspot import local_morans

    return _round6_cols(local_morans(_cells(sf_dir), "page_count", k=1), ["lisa"]).sort("cell")


def _q_spatial_cluster(sf_dir: str):
    """DBSCAN-style density clusters: connected components of ring-1
    adjacency over cells with page_count >= 2; cluster id = min cell id."""
    from cuda_gis_smoothing_ray.stages.hotspot import spatial_cluster

    return spatial_cluster(_cells(sf_dir), min_count=2, k=1).sort("cell")


def _q_morton_locality(sf_dir: str):
    """A5: avg |cell-rank difference| between Morton-consecutive cells."""
    from cuda_gis_smoothing_ray.stages.gridops import morton_locality

    return morton_locality(_cells(sf_dir))


def _q_morton(sf_dir: str):
    from cuda_gis_smoothing_ray.functions import hexgrid

    def add_morton(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        _, q, r = hexgrid.unpack(cell)
        return pa.table({"cell": batch.column("cell"), "morton": pa.array(hexgrid.morton_key(q, r))})

    return _cells(sf_dir).map_batches(add_morton, batch_format="pyarrow").sort(["morton", "cell"])


def _q_hilbert(sf_dir: str):
    """Hilbert-curve ordering of the cell table — the locality-preserving
    alternative to _q_morton (reference layout-experiment axis)."""
    from cuda_gis_smoothing_ray.functions import hexgrid

    def add_hilbert(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        _, q, r = hexgrid.unpack(cell)
        return pa.table({"cell": batch.column("cell"),
                         "hilbert": pa.array(hexgrid.hilbert_key(q, r))})

    return _cells(sf_dir).map_batches(add_hilbert, batch_format="pyarrow").sort(
        ["hilbert", "cell"]
    )


def _q_hilbert_locality(sf_dir: str):
    """A5 locality metric under Hilbert order (compare with
    morton_locality: lower avg_distance = better layout locality)."""
    from cuda_gis_smoothing_ray.stages.gridops import hilbert_locality

    return hilbert_locality(_cells(sf_dir))


def _q_tiles(sf_dir: str):
    n = 1 << TILE_ZOOM

    def assign(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        ty = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
        return pa.table(
            {
                "page_id": batch.column("page_id"),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "tile_id": pa.array(ty * n + tx),
            }
        )

    return _geocoded(sf_dir).map_batches(assign, batch_format="pyarrow").sort("page_id")


def _q_multires(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import multires_counts

    return multires_counts(_geocoded(sf_dir)).sort(["res", "cell"])


def _q_tile_vector(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import tile_vector

    ds = tile_vector(_geocoded(sf_dir), zoom=TILE_ZOOM)
    return _round6_cols(ds, ["west", "south", "east", "north"]).sort("tile_id")


TOPK_CELLS = 20
SAMPLE_KEEP_PPM = 150_000  # keep ~15% of pages


def _q_top_cells(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import topk

    cells = _cells(sf_dir).select_columns(["cell", "page_count"])
    return topk(cells, TOPK_CELLS, by="page_count", tie_cols=("cell",))


def _q_sample_pages(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.gridops import sample_hash

    pages = read_pages(sf_dir, include_html=False).select_columns(["page_id", "url", "lang"])
    return sample_hash(pages, "page_id", SAMPLE_KEEP_PPM).sort("page_id")


STRAT_RATES = {"en": 120_000, "de": 400_000, "sw": 1_000_000}
STRAT_DEFAULT_PPM = 250_000


def _q_stratified_sample(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.gridops import stratified_sample

    pages = read_pages(sf_dir, include_html=False).select_columns(["page_id", "url", "lang"])
    return stratified_sample(
        pages, "lang", "page_id", STRAT_RATES, default_ppm=STRAT_DEFAULT_PPM
    ).sort("page_id")


def _q_pip(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.pip import pip_join

    return pip_join(_geocoded(sf_dir)).sort(["page_id", "poly_id"])


def _q_polygon_density(sf_dir: str):
    """Per-polygon page DENSITY: containment counts (the PIP join's
    poly_id aggregate) normalized by exact shoelace area — the standard
    choropleth-normalization step.  Area is a constant fold over the
    polygon table, evaluated with the identical left-associative term
    order in both engines (the one float-sum-order trap in SQL)."""
    import math

    from ray.data.aggregate import Count

    from cuda_gis_smoothing_ray.stages.pip import POLYGONS, pip_join

    pairs = pip_join(_geocoded(sf_dir))
    counts = {
        int(r["poly_id"]): int(r["n_pages"])
        for r in pairs.groupby("poly_id")
        .aggregate(Count(alias_name="n_pages")).take_all()
    }

    def r6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    pids, areas, ns, dens = [], [], [], []
    for pid, ring in POLYGONS:
        s = 0.0
        for i in range(len(ring)):  # left-associative fold, ring order
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % len(ring)]
            s = s + (x1 * y2 - x2 * y1)
        area = abs(s) / 2.0
        n = counts.get(pid, 0)
        pids.append(pid)
        areas.append(r6(area))
        ns.append(n)
        dens.append(r6(n / area))
    return pa.table(
        {
            "poly_id": pa.array(pids, pa.int64()),
            "area_deg2": pa.array(areas, pa.float64()),
            "n_pages": pa.array(ns, pa.int64()),
            "density": pa.array(dens, pa.float64()),
        }
    )


def _q_pip_holes(sf_dir: str):
    """PIP against multiring polygons with interior HOLES: even-odd
    crossing parity over all rings — points in a hole are excluded."""
    from cuda_gis_smoothing_ray.stages.pip import pip_join_holes

    return pip_join_holes(_geocoded(sf_dir)).sort(["page_id", "poly_id"])


def _q_knn(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.knn import knn_broadcast

    ds = knn_broadcast(_geocoded(sf_dir), k=5)
    return _round6_cols(ds, ["dist2"]).sort(["query_id", "rank"])


def _q_polyfill(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import polyfill

    # polygon -> covering cells: input is the polygon set, not the page table
    return polyfill(res=RES).sort(["poly_id", "cell"])


def _q_distance_join(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import distance_join

    return distance_join(_geocoded(sf_dir), radius=1.0, bucket_res=6).sort(["a", "b"])


def _q_zonal_stats(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import zonal_stats

    return zonal_stats(_geocoded(sf_dir)).sort("poly_id")


def _q_zonal_majority(sf_dir: str):
    """Per-polygon majority lang (raster-zone mode; |polys| x |langs|
    bounded reduce, pages never shuffle)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import zonal_majority

    return zonal_majority(_geocoded(sf_dir))


def _q_host_extent(sf_dir: str):
    """Per-host geographic bounding box + area (ONE mixed min/max/isum
    host reduce; stages/spatialjoin.host_extent)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import host_extent

    return host_extent(_geocoded(sf_dir))


def _q_zone_terms(sf_dir: str):
    """Top tokens per polygon zone (stages/spatialjoin.zone_terms; PIP tag
    + pair-hash partitioned counts + local top-k prune)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import zone_terms

    return zone_terms(_geocoded(sf_dir))


def _q_idw(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import idw_interpolate

    return idw_interpolate(_geocoded(sf_dir), radius=25.0).sort("query_id")


def _q_geohash(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import geohash_encode

    return geohash_encode(_geocoded(sf_dir)).sort("page_id")


def _q_knn_haversine(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.knn import knn_haversine

    return knn_haversine(_geocoded(sf_dir), k=5).sort(["query_id", "rank"])


def _q_enrich_pages(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.smooth import enrich_pages

    return enrich_pages(
        _geocoded(sf_dir), _cells(sf_dir), ["chars_mean"], k=1, profile="gaussian"
    ).sort("page_id")


def _q_pip_indexed(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import pip_join_indexed

    return pip_join_indexed(_geocoded(sf_dir), res=RES).sort(["page_id", "poly_id"])


def _q_pip_anti(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import pip_anti

    return pip_anti(_geocoded(sf_dir)).sort("page_id")


def _q_bbox_query(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import bbox_query

    return bbox_query(_geocoded(sf_dir)).sort("page_id")


def _q_zonemap_token_search(sf_dir: str):
    """Token-predicate read THROUGH the per-file Bloom layer
    (state/zonemap.attach_token_blooms -> read_token_pruned): bloom
    definite-no skips files, the exact whitespace-token filter removes
    false positives — the oracle checks the final row set."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.state.zonemap import clustered_token_search

    df, _n_read, _n_total = clustered_token_search(
        read_pages(sf_dir, include_html=False, columns=["page_id", "text"]))
    return df


def _q_zonemap_range(sf_dir: str):
    """Key-range aggregate served THROUGH the zone-mapped clustered layout
    (state/zonemap.write_clustered -> read_pruned -> per-cell counts): the
    oracle checks the answer; file-level pruning is asserted in
    tests/test_zonemap.py."""
    from cuda_gis_smoothing_ray.state.zonemap import clustered_range_counts

    df, _n_read, _n_total = clustered_range_counts(_geocoded(sf_dir))
    return df


def _q_cell_boundary(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import cell_boundary

    return cell_boundary(_geocoded(sf_dir)).sort(["cell", "vertex"])


def _q_cell_parent(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import cell_parent_rollup

    return cell_parent_rollup(_geocoded(sf_dir), parent_res=RES - 1).sort("parent_cell")


def _q_compact_cells(sf_dir: str):
    """H3 compact analog: complete sibling groups roll up to the parent
    (stages/gridops.compact_cells; arithmetic child-set enumeration, no
    stored hierarchy)."""
    from cuda_gis_smoothing_ray.stages.gridops import compact_cells

    return compact_cells(_geocoded(sf_dir), res=RES)


def _q_flow_accumulation(sf_dir: str):
    """Steepest-descent drainage + K-superstep upstream counts over the
    cell surface (stages/gridops.flow_accumulation; directed stencil,
    integer BSP, cells-bounded shuffles)."""
    from cuda_gis_smoothing_ray.stages.gridops import flow_accumulation

    return flow_accumulation(_geocoded(sf_dir))


def _q_cheapest_path(sf_dir: str):
    """Least-cost routing field from the densest cell: K Bellman-Ford
    relaxation supersteps over the arithmetic ring-1 adjacency
    (stages/gridops.cheapest_path_cost)."""
    from cuda_gis_smoothing_ray.stages.gridops import cheapest_path_cost

    return cheapest_path_cost(_geocoded(sf_dir))


def _q_watershed(sf_dir: str):
    """Watershed basins: terminal sink per cell via pointer-doubling BSP
    over the steepest-descent drain forest (stages/gridops.watershed)."""
    from cuda_gis_smoothing_ray.stages.gridops import watershed

    return watershed(_geocoded(sf_dir))


def _q_uncompact_cells(sf_dir: str):
    """Inverse of compact: expand complete parents back to full child
    sets; oracle is the round-trip law (== original populated cells)."""
    from cuda_gis_smoothing_ray.stages.gridops import uncompact_cells

    return uncompact_cells(_geocoded(sf_dir), res=RES)


def _q_grid_disk(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.gridops import grid_disk

    return grid_disk(_geocoded(sf_dir), k=1).sort(["cell", "ring", "neighbor"])


def _q_nearest_polygon(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.spatialjoin import nearest_polygon

    return nearest_polygon(_geocoded(sf_dir)).sort("page_id")


def _q_dedup_canonical(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops
    from cuda_gis_smoothing_ray.stages.cc import dedup_canonical

    edges = textops.jaccard_pairs(_docs(sf_dir), threshold=JACCARD_T, max_df=None)
    return dedup_canonical(edges, _docs(sf_dir)).sort("component")


def _q_len_histogram(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.textops import len_histogram

    return len_histogram(_docs(sf_dir), width=50).sort("bucket")


# ---------------------------------------------------------------------------
# training-data-pipeline ops (documents / embeddings / events tables)
# ---------------------------------------------------------------------------

JACCARD_T = 0.8
NEARDUP_T = 0.4
ANN_K = 10
KNN_GRAPH_K = 5


def _docs(sf_dir: str, cols=("doc_id", "text")):
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    return read_documents(sf_dir, cols)


def _q_text_stats(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    ds = textops.text_stats(_docs(sf_dir))
    return _round6_cols(
        ds, ["punct_ratio", "stopword_ratio", "mean_token_chars", "quality_score"]
    ).sort("doc_id")


def _q_length_psi_by_source(sf_dir: str):
    """Population Stability Index of each source's doc-length distribution
    vs the global one, over exact global decile bins
    (stages/textops.length_psi_by_source)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.length_psi_by_source(
        _docs(sf_dir, ("n_chars", "source")))


def _q_lang_source_chi2(sf_dir: str):
    """Chi-squared independence of language x source (integer nano-units)
    — the stratification check before pooling feeds
    (stages/textops.lang_source_chi2)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.lang_source_chi2(_docs(sf_dir, ("lang", "source")))


def _q_lang_id_eval(sf_dir: str):
    """Confusion-matrix eval of the language-ID heuristic vs gold labels:
    per-class counts + precision/recall/F1 (stages/textops.lang_id_eval)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.lang_id_eval(_docs(sf_dir, ("doc_id", "text", "lang")))


def _q_gopher_repetition(sf_dir: str):
    """The repetition side of the Gopher rule family: top-2/3-gram
    character coverage + duplicate 5-gram fraction per doc
    (stages/textops.gopher_repetition)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.gopher_repetition(_docs(sf_dir)).sort("doc_id")


def _q_readability(sf_dir: str):
    """Per-doc Flesch reading-ease proxy (RE2 vowel-run syllable counting)
    — the classic readability quality-filter signal
    (stages/textops.readability)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.readability(_docs(sf_dir)).sort("doc_id")


def _q_lang_id(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.lang_id(_docs(sf_dir, ("doc_id", "text", "lang"))).sort("doc_id")


def _q_bucketed_join(sf_dir: str):
    """Hash-bucketed storage layout + shuffle-free co-located equi-join
    (state/zonemap.write_bucketed / bucketed_join): pay the bucketing
    shuffle once at write time, every later join is per-bucket local."""
    import shutil
    import tempfile

    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import (bucketed_join,
                                                      write_bucketed)

    tmp = tempfile.mkdtemp(prefix="hexray_buckets_")
    try:
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label"])
        write_bucketed(docs, f"{tmp}/docs", key="doc_id", n_buckets=8)
        write_bucketed(embs, f"{tmp}/embs", key="vec_id", n_buckets=8)
        out = bucketed_join(f"{tmp}/docs", f"{tmp}/embs",
                            key_a="doc_id", key_b="vec_id",
                            cols_a=["doc_id", "n_chars"],
                            cols_b=["vec_id", "label"]).to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import numpy as np
    import pyarrow as pa
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
        "n_chars": pa.array(out["n_chars"].to_numpy(np.int64)),
        "vec_id": pa.array(out["vec_id"].to_numpy(np.int64)),
        "label": pa.array(out["label"].to_numpy(np.int64)),
    })


def _q_bm25_scores(sf_dir: str):
    """Okapi BM25 relevance against a fixed query set: two streaming
    scans, bounded stat partials, fixed-order float fold
    (stages/textops.bm25_scores)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.bm25_scores(_docs(sf_dir))


def _q_normalized_dedup(sf_dir: str):
    """Casefold/whitespace-normalized exact dedup
    (stages/textops.normalized_dedup)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.normalized_dedup(_docs(sf_dir)).sort("doc_id")


def _q_exact_dedup(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.exact_dedup(_docs(sf_dir)).sort("doc_id")


def _q_jaccard(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    # max_df=None: the SQL oracle computes exact all-pairs Jaccard; the
    # engine default (bounded max_df) is the production path at scale.
    return textops.jaccard_pairs(
        _docs(sf_dir), threshold=JACCARD_T, max_df=None
    ).sort(["a", "b"])


def _q_minhash(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.minhash_pairs(_docs(sf_dir)).sort(["a", "b"])


def _q_minhash_wide(sf_dir: str):
    """MinHash with WIDE bands (8 bands x 8 rows over the same 64 perms):
    the 10^9-doc parameterization — candidate probability per band is J^8
    instead of J^4, which the 100 M-page memstress showed is the knob that
    keeps accidental candidate mass linear on shared-vocabulary corpora
    (BASELINE.md round-5 notes).  Same engine path, same exact verify."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.minhash_pairs(_docs(sf_dir), bands=8).sort(["a", "b"])


def _q_simhash(sf_dir: str):
    """Production SimHash on the vectorized fnv token-hash path (the scale
    path: one Arrow split + byte-position hash passes, zero Python per
    token) — SQL-oracle-checked bit-for-bit via the same HUGEINT fold as
    hll_registers (sql/oracles_corpus.simhash_pairs_fnv_sql)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.simhash_pairs(_docs(sf_dir), token_hash="fnv").sort(["a", "b"])


def _q_zscore(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.zscore_text_len(_docs(sf_dir, ("doc_id", "text", "lang"))).sort("doc_id")


def _q_top_bigrams(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.top_bigrams(_docs(sf_dir), k=20)


def _q_mutual_information(sf_dir: str):
    """Mutual information between TLD and language (plus marginal
    entropies), ordered folds (stages/textops.mutual_information)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import mutual_information

    return mutual_information(
        read_pages(sf_dir, include_html=False).select_columns(
            ["url", "lang"]))


def _q_coverage_curve(sf_dir: str):
    """Top-20-host corpus concentration curve with exact cumulative counts
    (stages/textops.coverage_curve)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.coverage_curve(_pages_urls(sf_dir))


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of the BM25 and exact-integer TF-IDF top-50
    lists, integer 1e6//(60+rank) sums (stages/textops.rrf_fusion)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.rrf_fusion(_docs(sf_dir))


def _q_unigram_drift(sf_dir: str):
    """Unigram KL drift between even/odd snapshot halves, add-1 smoothing
    over the union vocab, ordered folds (stages/textops.unigram_drift)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.unigram_drift(_docs(sf_dir))


def _q_phrase_search(sf_dir: str):
    """Exact positional phrase query as a streaming scan: shifted
    vectorized equality masks, no shuffle (stages/textops.phrase_search)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.phrase_search(_docs(sf_dir))


def _q_hapax_rate(sf_dir: str):
    """Hapax legomena statistics: once-occurring vocabulary share, exact
    counts (stages/textops.hapax_rate)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.hapax_rate(_docs(sf_dir))


def _q_zipf_slope(sf_dir: str):
    """Zipf-law fit of the corpus: OLS of ln(count) on ln(rank) over the
    top-64 tokens, left-assoc folds (stages/textops.zipf_slope)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.zipf_slope(_docs(sf_dir))


def _q_contamination(sf_dir: str):
    """Benchmark decontamination scan (stages/textops.contamination)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.contamination(_docs(sf_dir)).sort("doc_id")


def _q_passage_dedup(sf_dir: str):
    """Cross-doc duplicated-passage counts over non-overlapping token
    windows (stages/textops.passage_dedup)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.passage_dedup(_docs(sf_dir)).sort("doc_id")


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing via distributed prefix sum
    (stages/textops.pack_sequences)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.pack_sequences(_docs(sf_dir)).sort("doc_id")


def _q_pagerank(sf_dir: str):
    """Exact fixed-point PageRank over the deterministic host graph
    (stages/pagerank.pagerank, 8 BSP supersteps)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return pr.pagerank(docs, n_docs=n_docs).sort("host")


def _q_hits(sf_dir: str):
    """HITS hubs/authorities over the deterministic host graph
    (stages/pagerank.hits, exact-integer supersteps with ceil-shift
    renormalization)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return pr.hits(docs, n_docs=n_docs)


def _q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank — teleport restricted to the seed set
    (stages/pagerank.personalized_pagerank, shared superstep loop)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return pr.personalized_pagerank(docs, n_docs=n_docs).sort("host")


def _q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance over the host graph
    (stages/pagerank.bfs_hops, fixed relaxation rounds)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return pr.bfs_hops(docs, n_docs=n_docs).sort("host")


def _q_collapse_repeats(sf_dir: str):
    """Consecutive-duplicate-token cleaner (stages/textops.collapse_repeats):
    shuffle-free vectorized transform over every document."""
    from cuda_gis_smoothing_ray.stages.textops import collapse_repeats, read_documents

    return collapse_repeats(read_documents(sf_dir)).sort("doc_id")


def _q_lm_score(sf_dir: str):
    """CCNet-style bigram-LM quality scoring in exact fixed point
    (stages/lm.lm_score: train on the doc_id%2 subset, broadcast the
    bounded model once, score every document)."""
    from cuda_gis_smoothing_ray.stages.lm import lm_score
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    return lm_score(read_documents(sf_dir, columns=("doc_id", "text"))).sort("doc_id")


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training: first 6 merges learned over the
    word-type table — bounded pair-count shuffles per round, top pair via
    local-head top-k, vectorized merge application, re-materialized
    between rounds."""
    from cuda_gis_smoothing_ray.stages.lm import bpe_merges
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    return bpe_merges(read_documents(sf_dir, columns=("doc_id", "text")))


def _q_bpe_tokenize(sf_dir: str):
    """Tokenize the corpus with the merges learned by bpe_merges (train +
    apply in one pipeline): per-doc token counts under the learned
    tokenizer — the corpus-sizing pass of a training run."""
    from cuda_gis_smoothing_ray.stages.lm import bpe_merges, bpe_tokenize
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    docs = read_documents(sf_dir, columns=("doc_id", "text"))
    merges = bpe_merges(docs)
    return bpe_tokenize(docs, merges).sort("doc_id")


def _q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity bucketing: bigram-LM scores,
    exact tercile thresholds via the value-histogram quantile plan, one
    labeling pass."""
    from cuda_gis_smoothing_ray.stages.lm import ccnet_buckets
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    return ccnet_buckets(
        read_documents(sf_dir, columns=("doc_id", "text"))
    ).sort("doc_id")


def _q_window_distinct_users(sf_dir: str):
    """DISTINCT users per tumbling hour (stages/sketch.window_distinct_users)."""
    from cuda_gis_smoothing_ray.stages import events, sketch

    return sketch.window_distinct_users(
        events.read_events(sf_dir, columns=("ts", "user_id"))
    ).sort("window_start")


def _q_cms_user_counts(sf_dir: str):
    """Count-min-sketch frequency estimates next to exact per-user counts
    (stages/sketch.cms_user_counts); oracle-MATCHED sketch."""
    from cuda_gis_smoothing_ray.stages import events, sketch

    return sketch.cms_user_counts(
        events.read_events(sf_dir, columns=("user_id",))
    ).sort("user_id")


def _q_json_props(sf_dir: str):
    """JSON field extraction from events.props (stages/extract.json_props)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.extract import json_props

    return json_props(events.read_events(
        sf_dir, columns=("event_id", "event_type", "props"))).sort("event_id")


def _q_redact_pii(sf_dir: str):
    """Regex PII/entity redaction over documents (stages/extract.redact_terms)."""
    from cuda_gis_smoothing_ray.stages import extract, textops

    return extract.redact_terms(
        textops.read_documents(sf_dir),
        pattern=extract.REDACT_QUERY_PATTERN,
        replacement=extract.REDACT_QUERY_REPLACEMENT,
    ).sort("doc_id")


def _q_chunk_documents(sf_dir: str):
    """Overlapping RAG chunking of documents (stages/textops.chunk_documents)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.chunk_documents(
        textops.read_documents(sf_dir)).sort(["doc_id", "chunk_idx"])


def _q_heavy_hitters(sf_dir: str):
    """Exact two-pass heavy hitters over the corpus token stream
    (stages/sketch.heavy_hitters)."""
    from cuda_gis_smoothing_ray.stages import sketch

    return sketch.heavy_hitters(_docs(sf_dir)).sort("token")


def _q_grouped_corr(sf_dir: str):
    """Per-language covariance/correlation of (chars, tokens) from exact
    integer moments (stages/sketch.grouped_corr)."""
    from cuda_gis_smoothing_ray.stages import sketch
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    docs = read_documents(sf_dir, columns=("text", "lang"))
    return sketch.grouped_corr(docs).sort("lang")


def _q_inverted_index(sf_dir: str):
    """Retrieval index build: token -> (df, ordered posting list)
    (stages/textops.inverted_index)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.inverted_index(_docs(sf_dir)).sort("token")


def _q_oov_rate(sf_dir: str):
    """Per-doc out-of-vocabulary rate vs the corpus-learned top-k df
    vocabulary (stages/textops.oov_rate; exact string membership)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.oov_rate(_docs(sf_dir))


def _q_token_budget_select(sf_dir: str):
    """Greedy token-budget curation: longest docs first until 1/4 of the
    corpus token total (stages/textops.token_budget_select; bounded
    value-histogram CDF + one-bin boundary resolve)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.token_budget_select(
        _docs(sf_dir, cols=("doc_id", "text", "n_chars")))


def _q_decision_stump(sf_dir: str):
    """Optimal 1-D decision stump predicting lang=='en' from n_chars
    (stages/sketch.decision_stump; exact misclassification argmin over
    the bounded value histogram)."""
    from cuda_gis_smoothing_ray.stages.sketch import decision_stump
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    return decision_stump(read_documents(sf_dir,
                                         columns=("doc_id", "n_chars", "lang")))


def _q_bigram_pmi(sf_dir: str):
    """PMI collocation extraction over consecutive token pairs (two keyed
    shuffle joins onto the unigram table — vocabulary never broadcast)."""
    from cuda_gis_smoothing_ray.stages import textops

    return _round6_cols(
        textops.bigram_pmi(_docs(sf_dir)).select_columns(
            ["w1", "w2", "pair_count", "pmi"]
        ),
        ["pmi"],
    ).sort(["w1", "w2"])


def _q_host_quality(sf_dir: str):
    """Per-domain quality gating (data-derived UT1-style blocklist):
    Gopher pass-rate per host, blocked below threshold."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages import textops

    ds = textops.host_quality(read_pages(sf_dir, include_html=False), level="tld")
    return _round6_cols(ds, ["pass_rate"]).sort("host")


def _q_curate_corpus(sf_dir: str):
    """The composed end-to-end curation pipeline: exact dedup ->
    boilerplate scrub -> Gopher filter on cleaned text -> deterministic
    length-proportional resample (one streaming pipeline, 3 shuffles)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.curate_corpus(_docs(sf_dir)).sort("doc_id")


def _q_quality_resample(sf_dir: str):
    """Importance resample by per-doc word count (DoReMi/DSIR-lite):
    keep probability proportional to length, deterministic integer hash."""
    from cuda_gis_smoothing_ray.stages.gridops import quality_resample

    return quality_resample(
        _docs(sf_dir, ("doc_id", "text", "lang"))
    ).sort("doc_id")


def _q_incremental_dedup(sf_dir: str):
    """Delta-processing dedup: the odd-doc_id 'new crawl increment'
    anti-joins the even-doc_id 'prior snapshot' on text md5 — distinct
    fingerprints shuffle, no broadcast of the (big) prior side."""
    from cuda_gis_smoothing_ray.stages.textops import (
        incremental_dedup, read_documents,
    )

    docs = read_documents(sf_dir, columns=("doc_id", "text"))

    def odd(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(d % 2 == 1))

    def even(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(d % 2 == 0))

    new_ds = docs.map_batches(odd, batch_format="pyarrow")
    prior_ds = read_documents(sf_dir, columns=("doc_id", "text")).map_batches(
        even, batch_format="pyarrow")
    out = incremental_dedup(new_ds, prior_ds)
    return out.select_columns(["doc_id", "text_md5"]).sort("doc_id")


def _q_len_percentile(sf_dir: str):
    """Exact percent_rank by document length — one bounded value-histogram
    shuffle + broadcast CDF (stages/textops.len_percentile)."""
    from cuda_gis_smoothing_ray.stages.textops import (
        len_percentile, read_documents,
    )

    return len_percentile(
        read_documents(sf_dir, columns=("doc_id", "n_chars"))).sort("doc_id")


def _q_snapshot_merge(sf_dir: str):
    """CDC MERGE INTO: even-doc_id base snapshot + odd-doc_id changeset
    (upserts and deletes keyed at doc_id - 1) resolved in one key shuffle
    (stages/textops.snapshot_merge)."""
    from cuda_gis_smoothing_ray.stages.textops import (
        read_documents, snapshot_merge,
    )

    docs = read_documents(sf_dir, columns=("doc_id", "text", "lang"))

    def base(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(d % 2 == 0))
        return t.rename_columns(
            ["key" if c == "doc_id" else c for c in t.column_names])

    def changes(batch: pa.Table) -> pa.Table:
        import numpy as np

        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(d % 2 == 1))
        dd = t.column("doc_id").to_numpy(zero_copy_only=False)
        op = np.where(dd % 10 == 9, "delete", "upsert")
        t = t.append_column("op", pa.array(op.astype(object), pa.string()))
        t = t.set_column(t.column_names.index("doc_id"), "key",
                         pa.array(dd - 1, pa.int64()))
        return t

    base_ds = docs.map_batches(base, batch_format="pyarrow")
    ch_ds = read_documents(sf_dir, columns=("doc_id", "text", "lang")) \
        .map_batches(changes, batch_format="pyarrow")
    return snapshot_merge(base_ds, ch_ds).select_columns(
        ["key", "text", "lang"]).sort("key")


def _q_mixture_sample(sf_dir: str):
    """Training-data mixing: resample toward per-source target weights —
    bounded per-source count shuffle, data-derived integer acceptance
    rates, one streaming hash filter."""
    from cuda_gis_smoothing_ray.stages.gridops import mixture_sample

    return mixture_sample(_docs(sf_dir, ("doc_id", "source"))).sort("doc_id")


def _q_gopher_quality(sf_dir: str):
    """Gopher rule-based quality filter (word count, mean word length,
    distinct-stopword floor) — pure streaming map, no shuffle."""
    from cuda_gis_smoothing_ray.stages import textops

    return _round6_cols(
        textops.gopher_quality(_docs(sf_dir)), ["mean_word_len"]
    ).sort("doc_id")


def _q_remove_boilerplate(sf_dir: str):
    """CCNet/RefinedWeb-style boilerplate scrub: strip tokens covered by
    any 5-gram appearing in >= 2 documents (df-count shuffle + broadcast
    frequent set + vectorized rebuild)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.remove_boilerplate(_docs(sf_dir), n=5, min_df=2).sort("doc_id")


def _q_dup_ngrams(sf_dir: str):
    """Gopher-style duplicated-3-gram repetition metric
    (stages/textops.dup_ngram_stats)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.dup_ngram_stats(_docs(sf_dir)).sort("doc_id")


def _q_common_neighbors(sf_dir: str):
    """Link prediction by common-neighbor counting: non-adjacent community
    pairs sharing >= CN_MIN neighbors (stages/triangles.common_neighbors)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.common_neighbors(docs, n_docs)


def _q_graph_reciprocity(sf_dir: str):
    """Reciprocity of the directed host graph: mutual-edge fraction in
    exact integers (stages/pagerank.graph_reciprocity)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return pr.graph_reciprocity(docs, n_docs)


def _q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the community graph: stub-degree Pearson r
    in exact integers (stages/triangles.degree_assortativity)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.degree_assortativity(docs, n_docs)


def _q_graph_modularity(sf_dir: str):
    """Newman modularity of the linear-rule components under the full
    community graph (stages/triangles.graph_modularity)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.graph_modularity(docs, n_docs)


def _q_adamic_adar(sf_dir: str):
    """Adamic-Adar weighted link prediction: inverse-log-degree weights
    quantized once per center to micro-units, pure-integer pair sums
    (stages/triangles.adamic_adar)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.adamic_adar(docs, n_docs)


def _q_triangles(sf_dir: str):
    """Per-community triangle counts via the degree-ordered node-iterator
    (stages/triangles.triangle_counts)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.triangle_counts(docs, n_docs=n_docs).sort("comm")


def _q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient per community-graph node: bounded
    degree + per-node triangle aggregates, tagged coarse-partition join."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.clustering_coeff(docs, n_docs=n_docs)


def _q_kcore(sf_dir: str):
    """k-core of the community graph via fixed-round synchronous peeling
    (stages/triangles.kcore)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.kcore(docs, n_docs=n_docs).sort("comm")


def _q_split_assign(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return (
        textops.split_assign(_docs(sf_dir, ("doc_id",)))
        .select_columns(["doc_id", "split"])
        .sort("doc_id")
    )


def _q_profile(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.profile_documents(_docs(sf_dir, ("doc_id", "text", "lang")))


def _q_tfidf(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.tfidf(_docs(sf_dir)).sort(["doc_id", "token"])


def _q_dup_span_coverage(sf_dir: str):
    """Exact-substring span coverage: overlapping 8-gram cross-doc marks,
    one gram-hash shuffle + one doc-keyed interval-union pass."""
    from cuda_gis_smoothing_ray.stages.textops import dup_span_coverage

    return dup_span_coverage(_docs(sf_dir)).sort("doc_id")


def _q_quota_sample(sf_dir: str):
    """Deterministic k-per-lang quota sample by multiplicative hash:
    batch-local k-prune before the bounded per-group resolve."""
    from cuda_gis_smoothing_ray.stages.textops import quota_sample

    return quota_sample(_docs(sf_dir, ("doc_id", "lang"))).sort("doc_id")


def _q_pareto_docs(sf_dir: str):
    """Skyline (Pareto frontier) over (n_tokens, n_distinct): sound
    batch-local pruning, frontier-sized final resolve."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.pareto_docs(_docs(sf_dir)).sort("doc_id")


def _q_nb_lang_classify(sf_dir: str):
    """Naive-Bayes-style lang classifier with exact integer scoring:
    token-hash-partitioned model join, packed (doc, lang) reduce, coarse
    doc-keyed argmax."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.nb_lang_classify(
        _docs(sf_dir, ("doc_id", "text", "lang"))).sort("doc_id")


def _q_doc_fingerprints(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops

    return textops.doc_fingerprints(_docs(sf_dir)).sort(["doc_id", "fp"])


def _q_minhash_tiny(sf_dir: str):
    """SQL-checkable MinHash: 4 perms / 3-shingles / 2 bands — small enough
    for DuckDB to reproduce the uint64 arithmetic bit-for-bit (the 64-perm
    production variant above stays rows-only + pytest-gated)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.minhash_pairs(
        _docs(sf_dir), threshold=0.5, num_perms=4, shingle_k=3, bands=2
    ).sort(["a", "b"])


def _q_linear_probe(sf_dir: str):
    """Distributed OLS linear probe (n_chars ~ n_tokens): exact int64
    moment shuffle, closed-form normal-equations solve with the SQL twin's
    float expression tree."""
    from cuda_gis_smoothing_ray.stages.sketch import linear_probe

    return linear_probe(_docs(sf_dir))


def _q_grouped_linear_probe(sf_dir: str):
    """Per-language OLS probe: exact per-group int64 moments (np.add.at),
    bounded-key aggregate, shared-float-tree solve per group."""
    from cuda_gis_smoothing_ray.stages.sketch import grouped_linear_probe

    return grouped_linear_probe(_docs(sf_dir, ("doc_id", "text", "lang")))


def _q_dedup_recall(sf_dir: str):
    """Dedup-pipeline EVALUATION: recall/precision of the MinHash-LSH
    candidate set (tiny bit-exact params, shingle features) against exact
    word-set Jaccard >= 0.5 ground truth — the candidate-quality readout a
    production dedup run reports.  Feature spaces intentionally differ
    (estimator: 3-char shingles; truth: word sets) — this measures the
    deployed pipeline against the exact metric, not the estimator against
    itself.  Fully distributed: packed-pair semi-join + three counts."""
    import math

    from cuda_gis_smoothing_ray.stages import textops
    from cuda_gis_smoothing_ray.stages.join import hash_semi_join

    t = 0.5
    ex = textops.jaccard_pairs(_docs(sf_dir), threshold=t, max_df=None)
    mh = textops.minhash_pairs(_docs(sf_dir), threshold=t, num_perms=4,
                               shingle_k=3, bands=2)

    def pack(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        textops._check_pack_ids(a)
        textops._check_pack_ids(b)
        return pa.table({"k": pa.array(a * (np.int64(1) << np.int64(32)) + b)})

    exk = ex.map_batches(pack, batch_format="pyarrow")
    mhk = mh.map_batches(pack, batch_format="pyarrow")
    n_hit = hash_semi_join(mhk, exk, left_key="k").count()
    n_true = ex.count()
    n_cand = mh.count()
    recall = (math.floor(n_hit / n_true * 1e6 + 0.5) / 1e6) if n_true else 0.0
    prec = (math.floor(n_hit / n_cand * 1e6 + 0.5) / 1e6) if n_cand else 0.0
    return pa.table(
        {
            "n_true": pa.array([n_true], pa.int64()),
            "n_candidates": pa.array([n_cand], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "recall": pa.array([recall], pa.float64()),
            "precision": pa.array([prec], pa.float64()),
        }
    )


def _q_simhash_tiny(sf_dir: str):
    """SQL-checkable SimHash: md5 token hashes (identical in DuckDB)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.simhash_pairs(_docs(sf_dir), token_hash="md5").sort(["a", "b"])


def _q_cross_source_neardup(sf_dir: str):
    """Near-dup contamination matrix across sources: MinHash-LSH pairs at
    production parameters cross-tabulated by unordered source pair — which
    feeds duplicate each other (stages/textops.cross_source_neardup)."""
    from cuda_gis_smoothing_ray.stages.textops import cross_source_neardup

    return cross_source_neardup(
        _docs(sf_dir, ("doc_id", "text", "source"))
    ).sort(["source_a", "source_b"])


def _q_source_divergence_matrix(sf_dir: str):
    """Pairwise Jensen-Shannon divergence (integer nano-nats) between every
    two sources' unigram distributions — the mixture-design readout
    (stages/textops.source_divergence_matrix)."""
    from cuda_gis_smoothing_ray.stages.textops import source_divergence_matrix

    return source_divergence_matrix(
        _docs(sf_dir, ("text", "source"))
    ).sort(["source_a", "source_b"])


def _q_neardup_components(sf_dir: str):
    """MinHash-LSH near-dup CLUSTERS at production parameters: the
    minhash_pairs edge set -> connected components -> one survivor per
    cluster (the dedup decision a corpus pipeline acts on)."""
    from cuda_gis_smoothing_ray.stages import textops
    from cuda_gis_smoothing_ray.stages.cc import dedup_survivors

    edges = textops.minhash_pairs(_docs(sf_dir))
    return dedup_survivors(edges, _docs(sf_dir, ("doc_id",))).sort("doc_id")


def _q_dedup_components(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import textops
    from cuda_gis_smoothing_ray.stages.cc import dedup_survivors

    edges = textops.jaccard_pairs(_docs(sf_dir), threshold=JACCARD_T, max_df=None)
    return dedup_survivors(edges, _docs(sf_dir, ("doc_id",))).sort("doc_id")


def _q_ann_topk(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_bruteforce(ann.read_embeddings(sf_dir), sf_dir, k=ANN_K).sort(
        ["query_id", "rank"]
    )


def _q_jl_project(sf_dir: str):
    """Exact fixed-point Johnson-Lindenstrauss +-1 projection of the
    embedding table (stages/ann.jl_project; streaming, no shuffle)."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.jl_project(ann.read_embeddings(sf_dir))


def _q_embedding_gram(sf_dir: str):
    """Exact fixed-point Gram matrix of the embedding table: per-batch
    integer matmul partials, dim^2 shuffle independent of row count."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.embedding_gram(ann.read_embeddings(sf_dir))


def _q_kmeans_inertia(sf_dir: str):
    """Per-cluster k-means quality report: exact down-quantized within-
    cluster SSE against final-partition centroids
    (stages/ann.kmeans_inertia)."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.kmeans_inertia(ann.read_embeddings(sf_dir))


def _q_pca_power(sf_dir: str):
    """Top principal direction of the embedding table: exact-integer power
    iteration over the fixed-point Gram matrix (stages/ann.pca_power)."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.pca_power(ann.read_embeddings(sf_dir))


def _q_ann_range(sf_dir: str):
    """Cosine range search (all neighbors >= tau): broadcast query matrix,
    blocked column-sequential cosine, streaming filter — no merge stage."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_range_search(ann.read_embeddings(sf_dir), sf_dir).sort(
        ["query_id", "vec_id"]
    )


def _q_ann_lsh(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_lsh(ann.read_embeddings(sf_dir), sf_dir, k=ANN_K).sort(
        ["query_id", "rank"]
    )


def _q_ann_ivf(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_ivf(ann.read_embeddings(sf_dir), sf_dir, k=ANN_K).sort(
        ["query_id", "rank"]
    )


def _q_ann_pq(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_pq(ann.read_embeddings(sf_dir), sf_dir, k=ANN_K).sort(
        ["query_id", "rank"]
    )


def _q_ann_ivf_tiny(sf_dir: str):
    """Tiny-parameter EXACT-arithmetic IVF twin (n_list=2, n_probe=1):
    fixed-point Lloyd coarse lists + exact int64 re-rank, bit-identical to
    the unrolled-CTE oracle — the SQL gate for the ann_ivf_topk topology."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_ivf_int(ann.read_embeddings(sf_dir)).sort(
        ["query_id", "rank"]
    )


def _q_ann_lsh_tiny(sf_dir: str):
    """Tiny-parameter EXACT-arithmetic hyperplane-LSH twin (4 bits, 2
    bands): splitmix-derived integer planes, exact BIGINT sign-bit bands,
    int64 squared-L2 re-rank — the SQL gate for the ann_lsh_topk topology
    (every ANN variant now has a bit-exact twin)."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_lsh_int(ann.read_embeddings(sf_dir)).sort(
        ["query_id", "rank"]
    )


def _q_ann_pq_tiny(sf_dir: str):
    """Tiny-parameter EXACT-arithmetic PQ twin (m=2, 2 codes/subspace):
    per-subspace int64 codebooks, integer ADC lookup-sum ranking — the SQL
    gate for the ann_pq_topk topology."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_pq_int(ann.read_embeddings(sf_dir)).sort(
        ["query_id", "rank"]
    )


def _q_ann_recall(sf_dir: str):
    """Recall@k of every approximate ANN variant vs exact brute force —
    surfaces the pytest-gated recall numbers in the driver artifact
    (rows-only: the approximate methods are seed-deterministic but not
    SQL-expressible)."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_recall(sf_dir, k=ANN_K)


def _q_media_resize_real(sf_dir: str):
    """REAL nearest-neighbor resize over decoded BMP pixels (index-exact
    floor mapping, order-sensitive checksum of the resized stream)."""
    from cuda_gis_smoothing_ray.stages import media

    return media.media_resize_real(media.synth_media_table(sf_dir)).sort("media_id")


def _q_audio_resample_real(sf_dir: str):
    """REAL all-integer nearest-sample rate conversion over decoded WAV
    samples."""
    from cuda_gis_smoothing_ray.stages import media

    return media.audio_resample_real(media.synth_media_table(sf_dir)).sort("media_id")


def _q_neardup(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import ann

    return ann.embedding_neardup(
        ann.read_embeddings(sf_dir), sf_dir, threshold=NEARDUP_T
    ).sort(["a", "b"])


def _q_knn_graph(sf_dir: str):
    """Exact cosine kNN GRAPH over the embedding table (every vector is a
    query; k=5): the SemDeDup-style graph-construction step.  The test
    table fits one broadcast (500 vectors at every sf); at 10^9 vectors
    the IVF-pruned plan (ann.embedding_neardup's cluster + triangle-
    inequality bound) replaces the broadcast — same output contract."""
    from cuda_gis_smoothing_ray.stages import ann

    return ann.ann_bruteforce(
        ann.read_embeddings(sf_dir), sf_dir, k=KNN_GRAPH_K, n_queries=1 << 40
    ).sort(["query_id", "rank"])


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: connected components over the exact cosine>=T near-dup
    graph -> one survivor embedding per semantic cluster."""
    from cuda_gis_smoothing_ray.stages import ann
    from cuda_gis_smoothing_ray.stages.cc import dedup_survivors

    edges = ann.embedding_neardup(
        ann.read_embeddings(sf_dir), sf_dir, threshold=NEARDUP_T
    )
    nodes = ann.read_embeddings(sf_dir).select_columns(["vec_id"])
    return dedup_survivors(edges, nodes, node_col="vec_id").sort("vec_id")


def _q_kmeans(sf_dir: str):
    """Distributed fixed-point Lloyd k-means assignment
    (stages/ann.kmeans_assign); bit-exact vs the unrolled-CTE oracle."""
    from cuda_gis_smoothing_ray.stages.ann import kmeans_assign, read_embeddings

    return kmeans_assign(read_embeddings(sf_dir)).sort("vec_id")


def _q_cluster_terms(sf_dir: str):
    """Top tokens per k-means embedding cluster (BERTopic-style report):
    exact fixed-point assignment + doc-keyed tagged merge + grouped top-k."""
    from cuda_gis_smoothing_ray.stages.ann import kmeans_assign, read_embeddings
    from cuda_gis_smoothing_ray.stages.textops import cluster_terms

    return cluster_terms(_docs(sf_dir), kmeans_assign(read_embeddings(sf_dir))) \
        .sort(["cluster", "rank"])


def _q_label_centroids(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.ann import label_centroids

    return label_centroids(sf_dir)


def _q_media_decode(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import media

    ds = media.media_decode(media.media_table(sf_dir))
    return ds.drop_columns(["feature"]).sort("media_id")


def _q_audio_loudness(sf_dir: str):
    """Loudness QA over REAL WAV payloads: exact sum-of-squares / peak +
    one round6 dBFS float per clip (stages/media.audio_loudness)."""
    from cuda_gis_smoothing_ray.stages import media

    return media.audio_loudness(media.synth_media_table(sf_dir)) \
        .sort("media_id")


def _q_media_decode_real(sf_dir: str):
    """REAL codec path: synthesized uncompressed-BMP / PCM16-WAV payloads
    parsed by the dependency-free numpy decoders (stages/media.decode_bmp /
    decode_wav); the order-sensitive checksum makes the SQL oracle reject a
    parser that misreads padding, row order or channel order."""
    from cuda_gis_smoothing_ray.stages import media

    return media.media_decode_real(media.synth_media_table(sf_dir)).sort("media_id")


def _q_media_features(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import media

    ds = media.media_decode(media.media_table(sf_dir))

    def expand(batch: pa.Table) -> pa.Table:
        feat = batch.column("feature")
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        mat = feat.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), -1)
        batch = batch.drop_columns(["feature"])
        for d in range(mat.shape[1]):
            batch = batch.append_column(f"f{d}", pa.array(mat[:, d]))
        return batch

    return ds.map_batches(expand, batch_format="pyarrow").sort("media_id")


def _q_audio_resample(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import media

    return media.audio_resample(
        media.media_decode(media.media_table(sf_dir))
    ).sort("media_id")


def _q_media_resize(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import media

    ds = media.media_resize(media.media_decode(media.media_table(sf_dir)))
    return _round6_cols(ds, ["scale_x", "scale_y"]).sort("media_id")


def _q_frame_sample(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import media

    return media.frame_sample(media.media_decode(media.media_table(sf_dir))).sort(
        ["media_id", "frame_idx"]
    )


def _q_text_quality_by_lang(sf_dir: str):
    from cuda_gis_smoothing_ray.pipelines.corpus import text_quality_by_lang

    ds = text_quality_by_lang(sf_dir)
    return _round6_cols(
        ds, ["mean_quality", "mean_punct_ratio", "mean_stopword_ratio", "mean_tokens"]
    ).sort("lang")


def _q_events_window(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    ds = events.window_aggregate(events.read_events(sf_dir))
    return _round6_cols(ds, ["sum_value"]).sort(["window_start", "event_type"])


def _q_join_orders_by_nation(sf_dir: str):
    """Large-large shuffle join (orders x customer) -> broadcast nation
    lookup -> per-nation totals in exact integer cents."""
    from ray.data.aggregate import Sum

    from cuda_gis_smoothing_ray.stages.join import (
        broadcast_hash_join,
        read_table,
        shuffle_join,
    )

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(nk, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(uniq),
                "n_orders": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "total_cents": pa.array(np.bincount(inv, weights=cents, minlength=len(uniq)).astype(np.int64)),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
    )
    out = broadcast_hash_join(agg, sf_dir, "nation", "c_nationkey", "n_nationkey", ["n_name"])
    return out.select_columns(["n_name", "n_orders", "total_cents"]).sort("n_name")


def _q_join_revenue_by_priority(sf_dir: str):
    """Large-large shuffle join on the sf-scaled fact tables (lineitem x
    orders), filter pushed to the read, exact integer-cent revenue per
    order priority.  revenue = sum(floor(extendedprice*(1-discount)*100+.5))."""
    from ray.data.aggregate import Sum

    from cuda_gis_smoothing_ray.stages.join import read_table, shuffle_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderpriority": batch.column("o_orderpriority").to_numpy(zero_copy_only=False)}
        )
        df["revenue_cents"] = cents
        g = df.groupby("o_orderpriority", sort=True).agg(
            n_items=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .sort("o_orderpriority")
    )


def _q_customer_order_stats(sf_dir: str):
    """LEFT OUTER join coverage: every customer with zero-filled URGENT-order
    count/total (stages/join.shuffle_join join_type='left_outer' against a
    pre-aggregated fact side — the aggregate, not the fact table, shuffles).
    Restricted to URGENT orders so the null/zero-fill path is non-vacuous
    (203 of 1500 customers have none at sf0.01)."""
    import pyarrow.compute as pc

    from cuda_gis_smoothing_ray.functions.reduce import hash_groupby
    from cuda_gis_smoothing_ray.stages.join import read_table, shuffle_join

    orders = read_table(
        sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table({"o_custkey": pa.array(uniq), "n_orders": pa.array(n),
                         "total_cents": pa.array(tot)})

    agg = hash_groupby(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "o_custkey", ["n_orders", "total_cents"], how="isum",
    )
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = shuffle_join(cust, agg, on="c_custkey", right_on="o_custkey",
                          num_partitions=None, join_type="left_outer")

    def zero_fill(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "c_mktsegment": batch.column("c_mktsegment"),
            "n_orders": pc.fill_null(
                pc.cast(batch.column("n_orders"), pa.int64()), 0),
            "total_cents": pc.fill_null(
                pc.cast(batch.column("total_cents"), pa.int64()), 0),
        })

    return joined.map_batches(zero_fill, batch_format="pyarrow").sort("c_custkey")


def _q_cube_lineitem(sf_dir: str):
    """CUBE (l_returnflag, l_linestatus): all four grouping sets from one
    fact shuffle (stages/relagg.cube_sums); coarser sets derived from the
    fine aggregate."""
    from cuda_gis_smoothing_ray.stages.join import read_table
    from cuda_gis_smoothing_ray.stages.relagg import cube_sums

    li = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_numpy(zero_copy_only=False),
            "l_linestatus": batch.column("l_linestatus").to_numpy(zero_copy_only=False),
            "qty_cents": qty,
            "revenue_cents": rev,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=True).agg(
            n_items=("qty_cents", "size"),
            qty_cents=("qty_cents", "sum"),
            revenue_cents=("revenue_cents", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(
            g[["l_returnflag", "l_linestatus", "n_items", "qty_cents", "revenue_cents"]],
            preserve_index=False)

    partials = li.map_batches(partial, batch_format="pyarrow")
    cube = cube_sums(partials, ["l_returnflag", "l_linestatus"],
                     ["n_items", "qty_cents", "revenue_cents"])
    return cube.sort(["l_returnflag", "l_linestatus"])


def _q_revenue_by_month(sf_dir: str):
    """Calendar-bucketed revenue (EXTRACT year/month) — date-function
    coverage (stages/relagg.revenue_by_month)."""
    from cuda_gis_smoothing_ray.stages.join import read_table
    from cuda_gis_smoothing_ray.stages.relagg import revenue_by_month

    orders = read_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    return revenue_by_month(orders).sort(["yr", "mon"])


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary (stages/relagg.pricing_summary): scan-heavy
    grouped report, constant-size shuffle."""
    from cuda_gis_smoothing_ray.stages.join import read_table
    from cuda_gis_smoothing_ray.stages.relagg import pricing_summary

    li = read_table(sf_dir, "lineitem",
                    ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"])
    return pricing_summary(li).sort(["l_returnflag", "l_linestatus"])


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shipping priority (stages/relagg.tpch_q3): segment-filtered
    customer semi-join onto orders, one orderkey shuffle join with lineitem,
    grouped top-10 by exact-cent revenue."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q3

    return tpch_q3(sf_dir)


def _q_tpch_q6(sf_dir: str):
    """TPC-H Q6: one filtered aggregate with the predicates pushed into the
    parquet read (row-group pruning) — the prune-at-the-read showcase."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q6

    return tpch_q6(sf_dir)


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5 local-supplier volume: 6-table join, two fact shuffles,
    broadcast supplier dim, driver-collapsed region/nation."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q5

    return tpch_q5(sf_dir).sort("n_name")


def _q_tpch_q4(sf_dir: str):
    """TPC-H Q4 analog: correlated-EXISTS late-shipment semi-join, distinct
    orders per priority (join -> lateness filter -> pair-dedup count)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q4

    return tpch_q4(sf_dir).sort("o_orderpriority")


def _q_tpch_q12(sf_dir: str):
    """TPC-H Q12 analog: conditional high/low-priority line counts per
    returnflag, year predicate pushed into the parquet read."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q12

    return tpch_q12(sf_dir).sort("l_returnflag")


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14 analog: promo revenue share — broadcast part dim, exact-cent
    conditional sums, shared round-to-1e-6 for the one float."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q14

    return tpch_q14(sf_dir)


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10 analog: returned-item revenue top-20 customers — one fact
    shuffle, per-customer partials, customer join on the aggregate side,
    local-head top-k merge."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q10

    return tpch_q10(sf_dir)


def _q_tpch_q13(sf_dir: str):
    """TPC-H Q13 analog: customer order-count distribution — join-free
    double aggregation (orders-side counts + arithmetic zero bucket)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q13

    return tpch_q13(sf_dir)


def _q_tpch_q17(sf_dir: str):
    """TPC-H Q17 analog: small-quantity-order revenue — per-part
    correlated-average threshold as exact integer math, brand partkeys
    broadcast, two pruned scans."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q17

    return tpch_q17(sf_dir)


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18 analog: large-volume customers — HAVING survivors
    broadcast back into orders, top-k by (o_totalprice DESC, o_orderkey)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q18

    return tpch_q18(sf_dir)


def _q_tpch_q22(sf_dir: str):
    """TPC-H Q22 analog: dormant above-average-balance customers per
    nation — broadcast scalar average (exact ints) + windowed anti-join."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q22

    return tpch_q22(sf_dir).sort("c_nationkey")


def _q_tpch_q15(sf_dir: str):
    """TPC-H Q15 analog: top supplier(s) by quarterly revenue — revenue
    view, driver-scalar max, == tie filter, broadcast supplier dim."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q15

    return tpch_q15(sf_dir).sort("s_suppkey")


def _q_tpch_q19(sf_dir: str):
    """TPC-H Q19 analog: disjunctive brand/size/quantity revenue — one
    scan, broadcast part attrs, vectorized OR-of-ANDs mask."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q19

    return tpch_q19(sf_dir)


def _q_tpch_q7(sf_dir: str):
    """TPC-H Q7 analog: two-nation volume shipping by year — customer
    nation rides the orders side, one fact shuffle, broadcast supplier."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q7

    return tpch_q7(sf_dir)


def _q_tpch_q8(sf_dir: str):
    """TPC-H Q8 analog: national market share by order year — broadcast
    part/supplier dims, region-filtered customers ride the orders side,
    one fact shuffle, exact-cents numerator/denominator."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q8

    return tpch_q8(sf_dir)


def _q_tpch_q21(sf_dir: str):
    """TPC-H Q21 analog: sole-late-supplier waiting counts — per-order
    exists/anti-exists resolved on coarse orderkey hash partitions with
    one segmented numpy solve (never per distinct order)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q21

    return tpch_q21(sf_dir)


def _q_tpch_q2(sf_dir: str):
    """TPC-H Q2 analog: min-unit-price supplier per part (region-filtered,
    exact integer micro-unit-price, q17-style two bounded part-keyed
    reduces; partsupp-free adaptation declared in the stage docstring)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q2

    return tpch_q2(sf_dir)


def _q_tpch_q9(sf_dir: str):
    """TPC-H Q9 analog: product-type profit per (nation, year) — broadcast
    part-name filter + supplier dim, ONE orderkey fact shuffle, bounded
    (nation x year) partials."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q9

    return tpch_q9(sf_dir)


def _q_tpch_q11(sf_dir: str):
    """TPC-H Q11 analog: important-stock parts by traded-value share
    through one region's suppliers; exact integer cross-multiplied HAVING
    threshold over ONE part-keyed bounded reduce."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q11

    return tpch_q11(sf_dir)


def _q_tpch_q16(sf_dir: str):
    """TPC-H Q16 analog: distinct qualifying suppliers per (brand, type,
    size) — dense combo ids, batch-local pair dedup, two bounded
    reduces."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q16

    return tpch_q16(sf_dir)


def _q_tpch_q20(sf_dir: str):
    """TPC-H Q20 analog: suppliers carrying an outsized exact-integer
    share of one year's movement of prefix-named parts (generic pair-hash
    partitioned (part, supp) sums, per-part totals broadcast back)."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q20

    return tpch_q20(sf_dir)


def _q_rollup_revenue(sf_dir: str):
    """ROLLUP (o_orderpriority, l_returnflag): fine level + per-priority
    subtotals + grand total from ONE fact shuffle; coarser levels derived
    from the fine aggregate, never re-scanning lineitem."""
    from cuda_gis_smoothing_ray.stages.join import read_table, shuffle_join
    from cuda_gis_smoothing_ray.stages.relagg import rollup_sums

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=None)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_orderpriority": batch.column("o_orderpriority").to_numpy(zero_copy_only=False),
                "l_returnflag": batch.column("l_returnflag").to_numpy(zero_copy_only=False),
            }
        )
        df["revenue_cents"] = cents
        g = df.groupby(["o_orderpriority", "l_returnflag"], sort=True).agg(
            n_items=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = j.map_batches(partial, batch_format="pyarrow")
    return rollup_sums(
        partials, ["o_orderpriority", "l_returnflag"], ["n_items", "revenue_cents"]
    ).sort(["o_orderpriority", "l_returnflag"])


def _q_brand_supplier_volume(sf_dir: str):
    """lineitem enriched by TWO broadcast lookups (part -> brand, supplier ->
    nation), exact integer-cent quantity-weighted volume per (brand,
    s_nationkey) — touches every remaining TPC-H table and shows broadcast
    joins chaining on the streaming fact side."""
    from ray.data.aggregate import Sum

    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join, read_table

    li = read_table(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])
    e1 = broadcast_hash_join(li, sf_dir, "part", "l_partkey", "p_partkey", ["p_brand"])
    e2 = broadcast_hash_join(e1, sf_dir, "supplier", "l_suppkey", "s_suppkey", ["s_nationkey"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "p_brand": batch.column("p_brand").to_numpy(zero_copy_only=False),
                "s_nationkey": batch.column("s_nationkey").to_numpy(zero_copy_only=False),
            }
        )
        df["n_items"] = 1
        df["qty"] = qty
        df["price_cents"] = cents
        g = df.groupby(["p_brand", "s_nationkey"], sort=True).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        e2.map_batches(partial, batch_format="pyarrow")
        .groupby(["p_brand", "s_nationkey"])
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("qty", alias_name="qty"),
            Sum("price_cents", alias_name="price_cents"),
        )
        .sort(["p_brand", "s_nationkey"])
    )


def _q_join_region_customers(sf_dir: str):
    """Two chained broadcast joins (customer -> nation -> region), exact
    integer-cent aggregate per region."""
    from ray.data.aggregate import Sum

    from cuda_gis_smoothing_ray.stages.join import broadcast_hash_join, read_table

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    c1 = broadcast_hash_join(cust, sf_dir, "nation", "c_nationkey", "n_nationkey", ["n_regionkey"])
    c2 = broadcast_hash_join(c1, sf_dir, "region", "n_regionkey", "r_regionkey", ["r_name"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"r_name": batch.column("r_name").to_numpy(zero_copy_only=False)})
        df["acctbal_cents"] = cents
        g = df.groupby("r_name", sort=True)["acctbal_cents"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                "r_name": pa.array(g["r_name"], pa.string()),
                "n_customers": pa.array(g["count"].to_numpy().astype(np.int64)),
                "acctbal_cents": pa.array(g["sum"].to_numpy().astype(np.int64)),
            }
        )

    return (
        c2.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .sort("r_name")
    )


def _q_running_totals(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.running_totals(events.read_events(sf_dir)).sort("event_id")


def _q_user_event_paths(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.user_event_paths(
        events.read_events(sf_dir, columns=("event_id", "ts", "user_id", "event_type"))
    ).sort("user_id")


def _q_latest_event(sf_dir: str):
    """Deduplicate-to-latest: each user's most recent event (ties on ts
    resolve to the higher event_id)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.relagg import argmax_by

    ds = events.read_events(sf_dir, columns=("event_id", "ts", "user_id", "event_type"))
    out = argmax_by(ds, "user_id", ["ts", "event_id"], ["event_type"])
    return out.select_columns(["user_id", "event_id", "ts", "event_type"]).sort("user_id")


def _q_moving_sum(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.moving_sum(events.read_events(sf_dir)).sort("event_id")


def _q_trailing_window_sum(sf_dir: str):
    """Time-based RANGE window frame (trailing 1 hour, peers included):
    segment-offset searchsorted, exact cents
    (stages/events.trailing_window_sum)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.trailing_window_sum(
        events.read_events(sf_dir)).sort("event_id")


def _q_event_gaps(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.event_gaps(events.read_events(sf_dir)).sort("event_id")


def _q_host_rank(sf_dir: str):
    """Per-host length-rank window: one coarse host shuffle, segmented
    lexsort rank per partition."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.host_rank(_docs(sf_dir)).sort("doc_id")


def _q_events_by_segment(sf_dir: str):
    """Behavioral rollup by customer market segment: broadcast dim join,
    bounded (segment x type) partials (stages/events.events_by_segment)."""
    from cuda_gis_smoothing_ray.stages import events as ev

    return ev.events_by_segment(ev.read_events(sf_dir), sf_dir)


def _q_cusum_change(sf_dir: str):
    """CUSUM change-point of the dense hourly event series: argmax |S_t|
    of the exact mean-cleared cumulative sum, earliest-hour ties
    (stages/events.cusum_change)."""
    from cuda_gis_smoothing_ray.stages import events as ev

    return ev.cusum_change(ev.read_events(sf_dir))


def _q_ema_win(sf_dir: str):
    """Exact windowed EMA (alpha = 1/2, scaled integer) per user
    (stages/events.ema_win; segmented shifted-array adds)."""
    from cuda_gis_smoothing_ray.stages import events as ev

    return ev.ema_win(ev.read_events(sf_dir)).sort("event_id")


def _q_burst_hours(sf_dir: str):
    """Burst/anomaly hours of the dense hourly event series: count >
    mean + 2 sigma, exact big-int cleared threshold
    (stages/events.burst_hours)."""
    from cuda_gis_smoothing_ray.stages import events as ev

    return ev.burst_hours(ev.read_events(sf_dir))


def _q_event_autocorr(sf_dir: str):
    """ACF of the hourly event-count series (dense, zeros filled): one
    bounded hour reduce, exact big-int moments, one rounded division."""
    from cuda_gis_smoothing_ray.stages import events

    return events.event_autocorr(events.read_events(sf_dir))


def _q_attribution(sf_dir: str):
    """Last-touch attribution: running last-view index per user with a
    segment-floored maximum.accumulate — no self-join."""
    from cuda_gis_smoothing_ray.stages import events

    return events.attribution(events.read_events(sf_dir)).sort("event_id")


def _q_event_transitions(sf_dir: str):
    """Markov transition matrix of event types: LAG pairs pre-aggregated
    per user partition, bounded two-key reduce, single-pass normalize."""
    from cuda_gis_smoothing_ray.stages import events

    return events.event_transitions(events.read_events(sf_dir))


def _q_user_activity_full(sf_dir: str):
    """FULL OUTER join of HAVING-filtered per-user aggregates
    (stages/events.user_activity_full); all three outer regions non-empty."""
    from cuda_gis_smoothing_ray.stages import events

    return events.user_activity_full(
        events.read_events(sf_dir, columns=("user_id", "event_type", "value"))
    ).sort("user_id")


def _q_event_context(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.event_context(events.read_events(sf_dir)).sort("event_id")


def _q_event_ranks(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.event_ranks(events.read_events(sf_dir)).sort("event_id")


def _q_events_pivot(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.pivot_counts(events.read_events(sf_dir)).sort("user_id")


def _q_grouped_quantiles(sf_dir: str):
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.stages.sketch import grouped_quantiles

    def text_len(batch: pa.Table) -> np.ndarray:
        return pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    docs = _docs(sf_dir, ("doc_id", "text", "lang"))
    return grouped_quantiles(docs, "lang", text_len).sort(["lang", "q"])


def _q_quantile_normalize(sf_dir: str):
    """Quantile normalization of text length across langs: pooled order
    statistic at the proportional rank from a broadcast histogram."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.stages.sketch import quantile_normalize

    def text_len(batch: pa.Table) -> np.ndarray:
        return pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    return quantile_normalize(
        _docs(sf_dir, ("doc_id", "text", "lang")), "lang", text_len
    ).sort("doc_id")


def _q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov over en-vs-de text lengths: bounded
    histogram shuffle, exact big-int cross-multiplied ECDF argmax."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.stages.sketch import ks_test

    def text_len(batch: pa.Table) -> np.ndarray:
        return pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    return ks_test(_docs(sf_dir, ("doc_id", "text", "lang")), "lang", text_len)


def _q_robust_stats(sf_dir: str):
    """Per-lang robust stats (median / MAD / trimmed mean) from ONE
    (lang, len) histogram shuffle — all three from the same cumsum."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.stages.sketch import robust_stats

    def text_len(batch: pa.Table) -> np.ndarray:
        return pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    docs = _docs(sf_dir, ("doc_id", "text", "lang"))
    return robust_stats(docs, "lang", text_len).sort("lang")


def _q_quantile_filter(sf_dir: str):
    """Length-outlier scrub: keep documents whose text length sits inside
    their language's exact [p05, p95] band (two-stage: grouped quantiles ->
    broadcast thresholds -> streaming filter)."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.stages.sketch import quantile_filter

    def text_len(batch: pa.Table) -> np.ndarray:
        return pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    docs = _docs(sf_dir, ("doc_id", "text", "lang"))
    out = quantile_filter(docs, "lang", text_len, lo=0.05, hi=0.95)
    return out.select_columns(["doc_id", "lang", "value"]).sort("doc_id")


def _q_semi_join(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.join import hash_semi_join, read_table

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", ["o_custkey"])
    return hash_semi_join(cust, orders, "c_custkey", "o_custkey").sort("c_custkey")


def _q_anti_join(sf_dir: str):
    """Customers with no URGENT order (restricted so the result is
    non-empty at every driver sf — an empty Dataset loses its schema and
    can't be compared)."""
    from cuda_gis_smoothing_ray.stages.join import hash_semi_join, read_table

    import pyarrow.dataset as pads
    import ray.data as rd

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # priority filter pushed into the parquet scan (prune at the read)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )
    return hash_semi_join(cust, orders, "c_custkey", "o_custkey", anti=True).sort("c_custkey")


def _q_bloom_semi_join(sf_dir: str):
    """Revenue of lineitems belonging to URGENT orders, by return flag —
    the fact side is Bloom-pre-filtered before any shuffle (definite misses
    dropped batch-locally; exact resolve on the survivors)."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.join import bloom_semi_join, read_table

    li = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    )
    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )
    j = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {"l_returnflag": batch.column("l_returnflag").to_numpy(zero_copy_only=False)}
        )
        df["revenue_cents"] = cents
        g = df.groupby("l_returnflag", sort=True).agg(
            n_items=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
        .sort("l_returnflag")
    )


def _q_ab_lift(sf_dir: str):
    """A/B experiment readout: hash-armed users, purchase conversion,
    lift and pooled two-proportion z — rounds the 4 float columns."""
    from cuda_gis_smoothing_ray.stages import events

    t = events.ab_lift(events.read_events(sf_dir))
    for c in ("rate_a", "rate_b", "lift", "z_score"):
        i = t.column_names.index(c)
        t = t.set_column(i, c, pa.array(_round6(t.column(c).to_numpy(zero_copy_only=False))))
    return t


def _q_mann_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test over daily counts: exact integer
    S and tie-corrected variance (stages/events.mann_kendall)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.mann_kendall(events.read_events(sf_dir))


def _q_hot_runs(sf_dir: str):
    """Gaps-and-islands: maximal runs of above-mean hours in the dense
    series (stages/events.hot_runs)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.hot_runs(events.read_events(sf_dir))


def _q_theil_sen_trend(sf_dir: str):
    """Theil-Sen robust daily trend: exact integer median of lcm-scaled
    pairwise slopes (stages/events.theil_sen_trend)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.theil_sen_trend(events.read_events(sf_dir))


def _q_type_burstiness(sf_dir: str):
    """Per-type Fano factor of hourly counts over the global hour range
    (stages/events.type_burstiness)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.type_burstiness(events.read_events(sf_dir))


def _q_haar_energy(sf_dir: str):
    """Haar wavelet energy spectrum of the dense hourly series: exact
    integer cascade over 1024 zero-padded slots
    (stages/events.haar_energy)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.haar_energy(events.read_events(sf_dir))


def _q_markov_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain: K floored
    integer power steps over the transition counts
    (stages/events.markov_stationary)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.markov_stationary(events.read_events(sf_dir))


def _q_cross_correlation(sf_dir: str):
    """Cross-correlation of click vs purchase hourly series at lags -3..3
    (stages/events.cross_correlation)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.cross_correlation(events.read_events(sf_dir))


def _q_seasonality_profile(sf_dir: str):
    """Hour-of-day seasonal profile over the DENSE hourly series (missing
    hours are zeros), exact integer means
    (stages/events.seasonality_profile)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.seasonality_profile(events.read_events(sf_dir))


def _q_km_survival(sf_dir: str):
    """Kaplan-Meier survival of time-to-first-purchase per user;
    never-purchasers right-censored at their last event
    (stages/events.km_survival)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.km_survival(events.read_events(sf_dir))


def _q_als_rank1(sf_dir: str):
    """Rank-1 ALS over the user x event-type spend matrix: 2 exact-integer
    alternating sweeps, one co-partitioned pass each
    (stages/events.als_rank1)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.als_rank1(events.read_events(sf_dir))


def _q_benford_deviation(sf_dir: str):
    """Benford first-digit profile of event cents with exact expected
    micro-counts and chi2 contributions (stages/sketch.benford_deviation)."""
    from cuda_gis_smoothing_ray.stages import sketch

    from cuda_gis_smoothing_ray.stages.events import read_events

    return sketch.benford_deviation(read_events(sf_dir))


def _q_cuped_lift(sf_dir: str):
    """CUPED variance-reduced A/B readout: pre-period spend covariate,
    exact integer moments, shared float tree
    (stages/events.cuped_lift; outputs pre-rounded round6)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.cuped_lift(events.read_events(sf_dir))


def _q_range_join(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.range_join(events.read_events(sf_dir)).sort(
        ["event_id", "matched_event_id"]
    )


def _q_asof_join(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.asof_join(events.read_events(sf_dir)).sort("event_id")


def _q_sliding_window(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    ds = events.sliding_window_aggregate(events.read_events(sf_dir))
    return _round6_cols(ds, ["sum_value"]).sort(["window_start", "event_type"])


def _pages_urls(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages

    return read_pages(sf_dir, include_html=False).select_columns(["url"])


def _q_distinct_hosts(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.sketch import distinct_count

    return distinct_count(_pages_urls(sf_dir))


def _q_hll_hosts(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.sketch import hll_count

    return hll_count(_pages_urls(sf_dir))


def _q_hll_by_lang(sf_dir: str):
    """Grouped HLL: one mergeable register table per language
    (stages/sketch.hll_by_lang; |langs| x 2^p rows shuffle, bit-exact)."""
    from cuda_gis_smoothing_ray.stages import sketch

    from cuda_gis_smoothing_ray.sources.pages import read_pages

    return sketch.hll_by_lang(read_pages(sf_dir, include_html=False))


def _q_hll_registers(sf_dir: str):
    """Merged HLL register table over page hosts — the pure-integer witness
    of the sketch content (stages/sketch.hll_registers, poly_hash64)."""
    from cuda_gis_smoothing_ray.stages.sketch import hll_registers

    return hll_registers(_pages_urls(sf_dir))


def _q_lang_confusion(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.textops import lang_confusion

    return lang_confusion(_docs(sf_dir, ("doc_id", "text", "lang"))).sort(["lang", "pred_lang"])


def _q_host_split(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import host_split

    return host_split(read_pages(sf_dir, include_html=False)).sort("page_id")


def _q_hosts_union(sf_dir: str, col: str = "host"):
    """UNION set operation: distinct hosts in 'en' OR 'de' pages —
    completes the EXCEPT / INTERSECT family with the same batch-local-dedup
    + hash-partition-distinct plan (Python per partition, never per key)."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.join import distinct_values

    def values_of(lang: str):
        pages = read_pages(sf_dir, include_html=False).select_columns(["url", "lang"])

        def f(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc_.equal(batch.column("lang"), lang))
            host = pc_.list_element(pc_.split_pattern(batch.column("url"), pattern="/"), 2)
            return pa.table({col: host.unique()})

        return pages.map_batches(f, batch_format="pyarrow")

    return distinct_values(values_of("en").union(values_of("de")), col).sort(col)


def _q_lang_distinct_hosts(sf_dir: str):
    """Grouped exact COUNT(DISTINCT host) per language."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.join import grouped_distinct_count

    pages = read_pages(sf_dir, include_html=False).select_columns(["url", "lang"])

    def f(batch: pa.Table) -> pa.Table:
        host = pc_.list_element(pc_.split_pattern(batch.column("url"), pattern="/"), 2)
        return pa.table({"lang": batch.column("lang"), "host": host})

    return grouped_distinct_count(
        pages.map_batches(f, batch_format="pyarrow"), "lang", "host",
        out_col="n_hosts",
    ).sort("lang")


def _q_hosts_except(sf_dir: str, anti: bool = True, col: str = "host"):
    """Set operations EXCEPT (anti=True) / INTERSECT (anti=False) on
    distinct per-language value sets (host or tld): values in 'en' pages
    but not / also in 'de' pages.  The INTERSECT query uses tld, whose sets
    overlap at every sf — an empty Ray result loses its schema and cannot
    be oracle-compared (host intersections are empty in the synthetic
    corpus: hosts are near-unique per page).
    Plan: batch-local unique shrinks both sides before the one key shuffle
    (hash_semi_join), then a distinct groupby on the (small) survivor
    set — DISTINCT ... EXCEPT/INTERSECT ... without ever materializing
    either side."""
    import pyarrow.compute as pc_

    from ray.data.aggregate import Count

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.join import hash_semi_join

    def values_of(lang: str):
        pages = read_pages(sf_dir, include_html=False).select_columns(["url", "lang"])

        def f(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc_.equal(batch.column("lang"), lang))
            host = pc_.list_element(pc_.split_pattern(batch.column("url"), pattern="/"), 2)
            v = host if col == "host" else pc_.list_element(
                pc_.split_pattern(host, pattern=".", max_splits=1, reverse=True), 1
            )
            # cheap batch-local dedup before any shuffle
            return pa.table({col: v.unique()})

        return pages.map_batches(f, batch_format="pyarrow")

    # string keys: partition hash is md5 per DISTINCT value (both sides are
    # batch-locally deduped above); membership resolves on the exact strings
    out = hash_semi_join(values_of("en"), values_of("de"), col, anti=anti)
    return (
        out.groupby(col)
        .aggregate(Count(alias_name="__n"))
        .select_columns([col])
        .sort(col)
    )


def _q_host_gini(sf_dir: str):
    """Per-TLD Gini coefficient of host page counts — crawl-concentration
    inequality from the count HISTOGRAM, never a global rank
    (stages/textops.host_gini)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import host_gini

    return host_gini(
        read_pages(sf_dir, include_html=False).select_columns(["url"]))


def _q_top_hosts_by_lang(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.gridops import grouped_topk

    pages = read_pages(sf_dir, include_html=False).select_columns(["url", "lang"])

    def add_host(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        host = pc.list_element(pc.split_pattern(batch.column("url"), pattern="/"), 2)
        return pa.table({"lang": batch.column("lang"), "host": host})

    withhost = pages.map_batches(add_host, batch_format="pyarrow")
    return grouped_topk(withhost, "lang", "host", "n_pages", k=5).sort(["lang", "rank"])


def _q_text_len_quantiles(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.sketch import quantiles

    def text_len(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)

    return quantiles(_docs(sf_dir), text_len)


def _q_sampled_len_quantiles(sf_dir: str):
    """One-scan sampled quantiles (the scale path for near-unique value
    domains): deterministic hash-sample, exact quantile rule on the
    sample — bit-reproducible, so SQL-checkable unlike an RNG sample."""
    from cuda_gis_smoothing_ray.stages.sketch import sampled_quantiles

    def text_len(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)

    return sampled_quantiles(_docs(sf_dir), text_len)


def _q_text_len_quantiles_cont(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.sketch import quantiles_cont

    def text_len(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)

    return quantiles_cont(_docs(sf_dir), text_len)


def _q_lang_len_quantiles_cont(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.sketch import grouped_quantiles_cont

    def text_len(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)

    return grouped_quantiles_cont(
        _docs(sf_dir, ("doc_id", "text", "lang")), "lang", text_len
    ).sort(["lang", "q"])


def _q_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel per user (stages/events.funnel)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.funnel(events.read_events(sf_dir)).sort("user_id")


def _q_event_ntiles(sf_dir: str):
    """NTILE(4) + PERCENT_RANK per event type (stages/events.event_ntiles)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.event_ntiles(events.read_events(sf_dir)).sort("event_id")


def _q_gap_fill(sf_dir: str):
    """Per-user zero-filled hourly resample (stages/events.gap_fill)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.gap_fill(events.read_events(sf_dir)).sort(
        ["user_id", "bucket_start"])


def _q_quantize_int8(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.ann import quantize_int8, read_embeddings

    return quantize_int8(read_embeddings(sf_dir)).sort("vec_id")


def _q_first_events(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.relagg import group_head

    ds = events.read_events(sf_dir, columns=("event_id", "ts", "user_id", "event_type"))
    out = group_head(ds, "user_id", ["ts", "event_id"], 3,
                     ["event_id", "ts", "event_type"])
    return out.select_columns(["user_id", "rank", "event_id", "ts", "event_type"]).sort(
        ["user_id", "rank"]
    )


def _q_char_entropy(sf_dir: str):
    from cuda_gis_smoothing_ray.stages.textops import char_entropy

    return char_entropy(_docs(sf_dir)).sort("doc_id")


def _q_fuzzy_hosts(sf_dir: str):
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import fuzzy_value_join

    pages = read_pages(sf_dir, include_html=False).select_columns(["url"])

    def hosts(batch: pa.Table) -> pa.Table:
        h = pc_.list_element(pc_.split_pattern(batch.column("url"), pattern="/"), 2)
        return pa.table({"host": h})

    return fuzzy_value_join(
        pages.map_batches(hosts, batch_format="pyarrow"), "host"
    ).sort(["a", "b"])


def _q_weighted_median_len(sf_dir: str):
    """Token-mass-weighted median document length: exact histogram CDF,
    no division (stages/sketch.weighted_median_len)."""
    from cuda_gis_smoothing_ray.stages import sketch

    return sketch.weighted_median_len(
        _docs(sf_dir, ("doc_id", "text", "n_chars")))


def _q_mann_whitney(sf_dir: str):
    """Mann-Whitney U / ROC-AUC between en and de document lengths:
    bounded (group, value) histogram shuffle, exact doubled-U integers
    and tie-corrected variance (stages/sketch.mann_whitney)."""
    from cuda_gis_smoothing_ray.stages.sketch import mann_whitney

    return mann_whitney(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_kmv_distinct(sf_dir: str):
    """K-minimum-values distinct-user sketch per event type next to the
    exact count: splitmix64 order statistics, floor-division estimator
    (stages/sketch.kmv_distinct)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.sketch import kmv_distinct

    return kmv_distinct(events.read_events(sf_dir)).sort("event_type")


def _q_dft_power24(sf_dir: str):
    """Diurnal spectrum: DFT power at 1/2/3 cycles per day via shared
    micro-unit cos/sin tables, exact integer dot products
    (stages/events.dft_power24)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.dft_power24(events.read_events(sf_dir)).sort("harmonic")


def _q_proximity_search(sf_dir: str):
    """Proximity query: docs with 'table' and 'hash' within 3 tokens —
    zero-shuffle composite-key searchsorted scan
    (stages/textops.proximity_search)."""
    from cuda_gis_smoothing_ray.stages.textops import proximity_search

    return proximity_search(_docs(sf_dir))


def _q_chi2_independence(sf_dir: str):
    """Pearson chi-square independence test + Cramer's V between TLD and
    language over the same bounded contingency as mutual_information
    (stages/textops.chi2_independence)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import chi2_independence

    return chi2_independence(
        read_pages(sf_dir, include_html=False).select_columns(
            ["url", "lang"]))


def _q_perceptron_train(sf_dir: str):
    """Batch-perceptron supersteps over the fixed-point embedding table:
    integer margins and updates, dim-sized partials only
    (stages/ann.perceptron_train)."""
    from cuda_gis_smoothing_ray.stages.ann import perceptron_train

    return perceptron_train(sf_dir).sort("i")


def _q_holt_linear(sf_dir: str):
    """Holt's linear double exponential smoothing of the dense daily
    count series (alpha = beta = 1/2): exact 4^(t-1)-scaled integer
    recursion, one-step forecast (stages/events.holt_linear)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.holt_linear(events.read_events(sf_dir))


def _q_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis omnibus rank test of document length across all
    languages: one (group, value) histogram, doubled tie ranks, ordered
    folds (stages/sketch.kruskal_wallis)."""
    from cuda_gis_smoothing_ray.stages.sketch import kruskal_wallis

    return kruskal_wallis(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_lang_diversity(sf_dir: str):
    """Simpson language-diversity index per source: bounded two-key
    reduce, exact rational (stages/textops.lang_diversity)."""
    from cuda_gis_smoothing_ray.stages.textops import lang_diversity

    return lang_diversity(
        _docs(sf_dir, ("doc_id", "source", "lang"))).sort("source")


def _q_jaccard_neighborhood(sf_dir: str):
    """Neighborhood-Jaccard link prediction: common-neighbor counts
    normalized by the degree union, two co-partitioned degree joins
    (stages/triangles.jaccard_neighborhood)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_documents(sf_dir, columns=("doc_id",))
    return tri.jaccard_neighborhood(docs, n_docs)


def _q_support_hull(sf_dir: str):
    """Directional support hull (convex K-gon) of each TLD's page cloud:
    mergeable per-direction argmax partials, exact micro-degree integers
    and shoelace area (stages/spatialjoin.support_hull)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import support_hull

    return support_hull(_geocoded(sf_dir)).sort(["tld", "dir"])


def _q_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t test of en-vs-de mean doc length:
    exact integer moments, shared float trees
    (stages/sketch.welch_ttest)."""
    from cuda_gis_smoothing_ray.stages.sketch import welch_ttest

    return welch_ttest(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary-growth fit over doc_id-prefix quartiles:
    token-min-doc reduce (vocabulary never reaches the driver), ordered
    OLS folds (stages/textops.heaps_law)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.textops import heaps_law

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return heaps_law(_docs(sf_dir), n_docs).sort("q")


def _q_cume_dist_len(sf_dir: str):
    """Per-doc CUME_DIST of length within language: broadcast rank
    codebook, one searchsorted per row (stages/sketch.cume_dist_len)."""
    from cuda_gis_smoothing_ray.stages.sketch import cume_dist_len

    return cume_dist_len(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_jitter_rose(sf_dir: str):
    """Compass rose of page displacement from the TLD base centroid:
    integer micro-degree sectors, no trig
    (stages/spatialjoin.jitter_rose)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import jitter_rose

    return jitter_rose(_geocoded(sf_dir))


def _q_join_counts(sf_dir: str):
    """Join-count statistics (BB/BW/WW) of English-majority cells over
    ring-1 hex adjacency, with non-free-sampling expectations
    (stages/hotspot.join_counts)."""
    from cuda_gis_smoothing_ray.stages.hotspot import join_counts

    return join_counts(_geocoded(sf_dir))


def _q_top_docs_by_lang(sf_dir: str):
    """k longest docs per language WITH ties (dense_rank <= k): broadcast
    top-value codebook, rows never shuffle
    (stages/sketch.top_docs_by_lang)."""
    from cuda_gis_smoothing_ray.stages.sketch import top_docs_by_lang

    return top_docs_by_lang(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES keys
    from splitmix64 uniforms, weight = length); mergeable local top-k
    (stages/sketch.weighted_sample)."""
    from cuda_gis_smoothing_ray.stages.sketch import weighted_sample

    return weighted_sample(_docs(sf_dir, ("doc_id", "n_chars"))) \
        .sort("doc_id")


def _q_kwic_snippets(sf_dir: str):
    """Keyword-in-context extraction: first occurrence position + a
    clamped character window, zero shuffle
    (stages/textops.kwic_snippets)."""
    from cuda_gis_smoothing_ray.stages.textops import kwic_snippets

    return kwic_snippets(_docs(sf_dir))


def _q_mst_cells(sf_dir: str):
    """Boruvka minimum spanning forest of the ring-1 cell graph
    (weight = |delta page_count|): deterministic total-order edge
    selection + pointer-doubling merges (stages/hotspot.mst_cells)."""
    from cuda_gis_smoothing_ray.stages.hotspot import mst_cells

    return mst_cells(_geocoded(sf_dir))


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source round trip of the documents table — byte-
    verbatim text through JSON escaping
    (sources/pages.jsonl_roundtrip)."""
    from cuda_gis_smoothing_ray.sources.pages import jsonl_roundtrip

    return jsonl_roundtrip(sf_dir)


def _q_langs_concat(sf_dir: str):
    """Ordered string aggregation: sorted distinct language list per
    source (stages/textops.langs_concat)."""
    from cuda_gis_smoothing_ray.stages.textops import langs_concat

    return langs_concat(_docs(sf_dir, ("doc_id", "source", "lang")))


def _q_boolean_search(sf_dir: str):
    """Boolean CNF retrieval (must / should / must-not whole-token
    terms), zero shuffle (stages/textops.boolean_search)."""
    from cuda_gis_smoothing_ray.stages.textops import boolean_search

    return boolean_search(_docs(sf_dir))


def _q_k_truss(sf_dir: str):
    """k-truss of the community graph: fixed-round synchronous edge peel
    by triangle support (stages/triangles.k_truss)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return tri.k_truss(read_documents(sf_dir, columns=("doc_id",)), n_docs)


def _q_trigram_transitions(sf_dir: str):
    """Second-order Markov transition counts (three consecutive events
    per user), support-pruned (stages/events.trigram_transitions)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.trigram_transitions(events.read_events(sf_dir))


def _q_mad_outlier_days(sf_dir: str):
    """Robust daily anomaly days: |cnt - median| > k*MAD over the dense
    series, exact integer medians
    (stages/events.mad_outlier_days)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.mad_outlier_days(events.read_events(sf_dir))


def _q_path_entropy(sf_dir: str):
    """Per-user event-type Shannon entropy in micro-nats (order-free
    integer sums of once-quantized terms)
    (stages/events.path_entropy)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.path_entropy(events.read_events(sf_dir))


def _q_hill_tail_index(sf_dir: str):
    """Hill estimator of the document-length tail index over the top-k
    order statistics (stages/textops.hill_tail_index)."""
    from cuda_gis_smoothing_ray.stages.textops import hill_tail_index

    return hill_tail_index(_docs(sf_dir, ("doc_id", "n_chars")))


def _q_forecast_backtest(sf_dir: str):
    """One-step-ahead backtest of three naive forecasters over the dense
    hourly series — exact integer absolute errors, MASE
    (stages/events.forecast_backtest)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.forecast_backtest(events.read_events(sf_dir))


def _q_spatial_thin(sf_dir: str):
    """Spatial thinning: one deterministic representative page per hex
    cell (min page_id) with the cell count — mergeable payload argmin
    (stages/gridops.spatial_thin)."""
    from cuda_gis_smoothing_ray.stages.gridops import spatial_thin

    return spatial_thin(_geocoded(sf_dir))


def _q_event_doc_join(sf_dir: str):
    """Cross-table enrichment: events' JSON props doc reference joined
    to the documents dimension (broadcast once), per-lang rollup with
    exact cents (stages/events.event_doc_join)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.event_doc_join(
        events.read_events(sf_dir, columns=("event_id", "props", "value")),
        sf_dir)


def _q_transition_dwell(sf_dir: str):
    """Time-weighted Markov transitions: exact microsecond dwell totals
    per (from, to) pair (stages/events.transition_dwell)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.transition_dwell(events.read_events(sf_dir))


def _q_diameter_sweep(sf_dir: str):
    """Double-sweep diameter lower bound of the undirected host graph:
    two fixed-round BFS relaxation chains
    (stages/pagerank.diameter_sweep)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.pagerank import diameter_sweep
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return diameter_sweep(read_documents(sf_dir, columns=("doc_id",)),
                          n_docs)


def _q_circular_stats(sf_dir: str):
    """Circular statistics of jitter directions per TLD: once-quantized
    unit vectors -> order-free integer sums, mean resultant length
    (stages/spatialjoin.circular_stats)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import circular_stats

    return circular_stats(_geocoded(sf_dir))


def _q_active_time(sf_dir: str):
    """Per-user active time (union of 5-minute activity windows): exact
    integer interval union via one segmented sweep
    (stages/events.active_time)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.active_time(events.read_events(sf_dir))


def _q_fisher_ratio(sf_dir: str):
    """Fisher class-separability ratio of the labeled embedding table:
    exact fixed-point class moments, ordered float folds
    (stages/ann.fisher_ratio)."""
    from cuda_gis_smoothing_ray.stages.ann import fisher_ratio

    return fisher_ratio(sf_dir)


def _q_anova_eta(sf_dir: str):
    """One-way ANOVA (F + eta^2) of document length across languages:
    exact integer group moments, ordered folds
    (stages/sketch.anova_eta)."""
    from cuda_gis_smoothing_ray.stages.sketch import anova_eta

    return anova_eta(_docs(sf_dir, ("doc_id", "n_chars", "lang")))


def _q_bounce_rate(sf_dir: str):
    """Per-day bounce rate (share of single-event sessions under the
    30-min gap rule) (stages/events.bounce_rate)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.bounce_rate(events.read_events(sf_dir))


def _q_doc_keywords(sf_dir: str):
    """Per-document top-k TF-IDF keywords (rational scores — float
    ordering is safe because both engines evaluate the identical ratio)
    (stages/textops.doc_keywords)."""
    from cuda_gis_smoothing_ray.stages.textops import doc_keywords

    return doc_keywords(_docs(sf_dir))


def _q_wilson_ci(sf_dir: str):
    """Per-language corpus share with the 95% Wilson score interval
    (stages/textops.wilson_ci)."""
    from cuda_gis_smoothing_ray.stages.textops import wilson_ci

    return wilson_ci(_docs(sf_dir, ("doc_id", "lang")))


def _q_returning_users(sf_dir: str):
    """Day-over-day retention: DAU and the share active on the previous
    calendar day (stages/events.returning_users)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.returning_users(events.read_events(sf_dir))


def _q_cell_lang_shift(sf_dir: str):
    """Spatial drift: cells whose majority language flips between the
    even/odd snapshot halves (stages/hotspot.cell_lang_shift)."""
    from cuda_gis_smoothing_ray.stages.hotspot import cell_lang_shift

    return cell_lang_shift(_geocoded(sf_dir))


def _q_decayed_counts(sf_dir: str):
    """Time-decayed event counts (power-of-two integer half-life decay,
    no float pow) (stages/events.decayed_counts)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.decayed_counts(events.read_events(sf_dir))


def _q_dup_rate_by_source(sf_dir: str):
    """Per-source duplication health: share of docs sharing exact text
    with any document corpus-wide
    (stages/textops.dup_rate_by_source)."""
    from cuda_gis_smoothing_ray.stages.textops import dup_rate_by_source

    return dup_rate_by_source(_docs(sf_dir, ("doc_id", "text", "source")))


def _q_spend_gini(sf_dir: str):
    """Gini coefficient of per-user total spend: tie-invariant closed
    form off the totals histogram (stages/events.spend_gini)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.spend_gini(events.read_events(sf_dir))


def _q_geo_dispersion(sf_dir: str):
    """Per-TLD mean pairwise squared distance, closed from moments — no
    pair materializes (stages/spatialjoin.geo_dispersion)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import geo_dispersion

    return geo_dispersion(_geocoded(sf_dir))


def _q_value_robust_by_type(sf_dir: str):
    """Robust per-type value statistics (median / MAD / trimmed mean of
    exact cents) — the generic histogram-rank robust_stats pointed at
    the events stream (stages/sketch.robust_stats)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.sketch import robust_stats

    def cents(batch: pa.Table) -> np.ndarray:
        return np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)

    return robust_stats(events.read_events(sf_dir), "event_type",
                        cents).sort("event_type")


def _q_clark_evans(sf_dir: str):
    """Clark-Evans nearest-neighbor aggregation index: per-point NN
    distances quantized once, order-free integer sum
    (stages/spatialjoin.clark_evans)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import clark_evans

    return clark_evans(_geocoded(sf_dir))


def _q_containment_pairs(sf_dir: str):
    """Asymmetric near-dup pairs by set containment |A&B|/min (subset
    duplicates Jaccard misses); exact all-pairs semantics for the gate
    (stages/textops.containment_pairs)."""
    from cuda_gis_smoothing_ray.stages.textops import containment_pairs

    return containment_pairs(_docs(sf_dir), max_df=None).sort(["a", "b"])


def _q_cell_lang_entropy(sf_dir: str):
    """Per-cell language Shannon entropy map (micro-nat once-quantized
    terms -> order-free sums) (stages/hotspot.cell_lang_entropy)."""
    from cuda_gis_smoothing_ray.stages.hotspot import cell_lang_entropy

    return cell_lang_entropy(_geocoded(sf_dir))


def _q_type_drift_days(sf_dir: str):
    """Per-day chi-square drift of the event-type mix vs the global
    composition (stages/events.type_drift_days)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.type_drift_days(events.read_events(sf_dir))


def _q_spend_rate(sf_dir: str):
    """Per-user spend per active second: cents + interval-union active
    time fused in one segmented solve (stages/events.spend_rate)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.spend_rate(events.read_events(sf_dir))


def _q_shard_conductance(sf_dir: str):
    """Conductance of the contiguous range-sharding of the community
    graph — the graph-placement cut-quality readout
    (stages/triangles.shard_conductance)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return tri.shard_conductance(
        read_documents(sf_dir, columns=("doc_id",)), n_docs)


def _q_smooth_residuals(sf_dir: str):
    """Smoothing QA: cells whose |raw - k-ring-smoothed| residual sits
    in the top decile — micro-quantized exact selection
    (stages/smooth.smooth_residuals)."""
    from cuda_gis_smoothing_ray.stages.smooth import smooth_residuals

    return smooth_residuals(_cells(sf_dir))


def _q_embedding_stats(sf_dir: str):
    """Embedding-health diagnostics: mean norm + anisotropy |sum x| /
    sum |x| in exact fixed point (stages/ann.embedding_stats)."""
    from cuda_gis_smoothing_ray.stages.ann import embedding_stats

    return embedding_stats(sf_dir)


def _q_entry_paths(sf_dir: str):
    """Entry-path analysis: user groups sharing the same first-3-event
    sequence (stages/events.entry_paths)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.entry_paths(events.read_events(sf_dir))


def _q_quality_by_source(sf_dir: str):
    """Per-source Gopher pass-rate + lift vs the corpus rate
    (stages/textops.quality_by_source)."""
    from cuda_gis_smoothing_ray.stages.textops import quality_by_source

    return quality_by_source(_docs(sf_dir, ("doc_id", "text", "source")))


def _q_bh_fdr(sf_dir: str):
    """FDR-controlled metric scan: Welch weekend-vs-weekday t per event
    type, normal-approx p, Benjamini-Hochberg step-up adjustment across
    the whole scan (stages/sketch.bh_fdr)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.sketch import bh_fdr

    return bh_fdr(events.read_events(
        sf_dir, columns=("ts", "event_type", "value")))


def _q_weekend_lift(sf_dir: str):
    """Weekend-behavior lift per event type, day-count normalized over
    the dense range (stages/events.weekend_lift)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.weekend_lift(events.read_events(sf_dir))


def _q_spend_outliers(sf_dir: str):
    """Self-normalized spend anomalies: events > 3 sigma above the same
    user's history — pure-integer cross-multiplied test
    (stages/events.spend_outliers)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.spend_outliers(events.read_events(sf_dir))


def _q_silhouette_lite(sf_dir: str):
    """Centroid silhouette of the k-means partition (per-vector s
    quantized once, per-cluster integer sums)
    (stages/ann.silhouette_lite)."""
    from cuda_gis_smoothing_ray.stages.ann import silhouette_lite

    return silhouette_lite(sf_dir)


def _q_kendall_tau(sf_dir: str):
    """Kendall's tau-b between chars and tokens per doc: exact
    concordance counts off the joint value histogram
    (stages/sketch.kendall_tau)."""
    from cuda_gis_smoothing_ray.stages.sketch import kendall_tau

    return kendall_tau(_docs(sf_dir, ("doc_id", "text", "n_chars")))


def _q_choropleth_classes(sf_dir: str):
    """Quartile choropleth classing of the smoothed density surface —
    deterministic integer class rule over micro-quantized means
    (stages/smooth.choropleth_classes)."""
    from cuda_gis_smoothing_ray.stages.smooth import choropleth_classes

    return choropleth_classes(_cells(sf_dir))


def _q_tld_lang_divergence(sf_dir: str):
    """Per-TLD KL divergence of the language mix from the corpus mix
    (add-1, micro-quantized terms)
    (stages/textops.tld_lang_divergence)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import tld_lang_divergence

    return tld_lang_divergence(
        read_pages(sf_dir, include_html=False).select_columns(
            ["url", "lang"]))


def _q_top_type_share(sf_dir: str):
    """Per-user dominant event type and its activity share (segmented
    argmax, (cnt DESC, type) ties)
    (stages/events.top_type_share)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.top_type_share(events.read_events(sf_dir))


def _q_source_len_drift(sf_dir: str):
    """Per-source KS drift of the length distribution vs the rest of
    the corpus — one histogram pays for all sources
    (stages/sketch.source_len_drift)."""
    from cuda_gis_smoothing_ray.stages.sketch import source_len_drift

    return source_len_drift(_docs(sf_dir, ("doc_id", "n_chars", "source")))


def _q_wau_curve(sf_dir: str):
    """Rolling 7-day active users per day: two segmented dedups on the
    coarse user shuffle (stages/events.wau_curve)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.wau_curve(events.read_events(sf_dir))


def _q_gap_robust_by_type(sf_dir: str):
    """Robust inter-event-time stats per type (median/MAD/trimmed mean
    of microsecond gaps): the generic robust_stats over the segmented
    gap stream (stages/events.gaps_by_type + stages/sketch.robust_stats)."""
    from cuda_gis_smoothing_ray.stages import events
    from cuda_gis_smoothing_ray.stages.sketch import robust_stats

    gaps = events.gaps_by_type(events.read_events(sf_dir))

    def gap_col(batch: pa.Table) -> np.ndarray:
        return batch.column("gap_us").to_numpy(
            zero_copy_only=False).astype(np.int64)

    return robust_stats(gaps, "event_type", gap_col).sort("event_type")


def _q_lang_vocab_overlap(sf_dir: str):
    """Pairwise Jaccard of per-language top-k vocabularies (token-hash-
    partitioned counts, local top-k merge)
    (stages/textops.lang_vocab_overlap)."""
    from cuda_gis_smoothing_ray.stages.textops import lang_vocab_overlap

    return lang_vocab_overlap(_docs(sf_dir, ("doc_id", "text", "lang")))


def _q_spend_concentration(sf_dir: str):
    """Top-k spender concentration curve with exact cumulative shares
    (stages/events.spend_concentration)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.spend_concentration(events.read_events(sf_dir))


def _q_hub_robustness(sf_dir: str):
    """Graph robustness under targeted hub removal: largest component
    before/after dropping the top-degree nodes
    (stages/triangles.hub_robustness)."""
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages import triangles as tri
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return tri.hub_robustness(
        read_documents(sf_dir, columns=("doc_id",)), n_docs)


def _q_integrity_audit(sf_dir: str):
    """Data-contract audit of the event stream (dup keys, sub-cent
    precision, non-positive values, timestamp span)
    (stages/events.integrity_audit)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.integrity_audit(events.read_events(sf_dir))


def _q_median_center(sf_dir: str):
    """Robust spatial centrography per TLD: rank-rule median center +
    IQR spread in micro-degrees (stages/spatialjoin.median_center)."""
    from cuda_gis_smoothing_ray.stages.spatialjoin import median_center

    return median_center(_geocoded(sf_dir))


def _q_isolated_cells(sf_dir: str):
    """Spatial islands: present cells with no present ring-1 neighbor,
    at res 9 where the grid is sparse enough for genuine isolates at
    every sf (stages/hotspot.isolated_cells)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.stages.hotspot import isolated_cells

    return isolated_cells(
        geo_encode(read_pages(sf_dir, include_html=False), res=9))


def _q_top_cells_by_tld(sf_dir: str):
    """Each TLD's densest hex cells (grouped spatial top-k, (pages DESC,
    cell) ranks) (stages/gridops.top_cells_by_tld)."""
    from cuda_gis_smoothing_ray.stages.gridops import top_cells_by_tld

    return top_cells_by_tld(_geocoded(sf_dir))


def _q_spearman_corr(sf_dir: str):
    """Spearman rank correlation of chars vs tokens per doc: exact doubled
    tie ranks from value histograms (stages/sketch.spearman_corr)."""
    from cuda_gis_smoothing_ray.stages import sketch

    return sketch.spearman_corr(_docs(sf_dir, ("doc_id", "text", "n_chars")))


def _q_cohen_kappa(sf_dir: str):
    """Cohen's kappa between the stored lang label and the lang_id
    heuristic: exact chance-cleared integers
    (stages/textops.cohen_kappa)."""
    from cuda_gis_smoothing_ray.stages import textops

    return textops.cohen_kappa(_docs(sf_dir, ("doc_id", "text", "lang")))


def _q_typo_clusters(sf_dir: str):
    """Typo clusters: CC of the edit-distance-<=1 host graph, cluster id =
    smallest member (stages/textops.typo_clusters)."""
    import pyarrow.compute as pc_

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.textops import typo_clusters

    pages = read_pages(sf_dir, include_html=False).select_columns(["url"])

    def hosts(batch: pa.Table) -> pa.Table:
        h = pc_.list_element(pc_.split_pattern(batch.column("url"),
                                               pattern="/"), 2)
        return pa.table({"host": h})

    return typo_clusters(pages.map_batches(hosts, batch_format="pyarrow"),
                         "host")


def _q_lang_share(sf_dir: str):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.relagg import ratio_to_report

    pages = read_pages(sf_dir, include_html=False).select_columns(["lang"])
    return ratio_to_report(pages, "lang").sort("lang")


def _q_ohlc_bars(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.ohlc_bars(events.read_events(sf_dir)).sort(
        ["window_start", "event_type"]
    )


def _q_cooccurrence(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.cooccurrence(events.read_events(sf_dir)).sort(["a", "b"])


def _q_cohort_retention(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.cohort_retention(events.read_events(sf_dir)).sort(
        ["cohort_day", "day_offset"]
    )


def _q_sessionize(sf_dir: str):
    from cuda_gis_smoothing_ray.stages import events

    return events.sessionize(events.read_events(sf_dir)).sort("event_id")


def _q_session_overlap(sf_dir: str):
    """Cross-user concurrent-session interval overlap join — time-bucket
    scatter + owner-bucket exactly-once pair dedup
    (stages/events.session_overlap)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.session_overlap(events.read_events(sf_dir)) \
        .sort(["user_a", "sess_a", "user_b", "sess_b"])


def _q_rfm_segments(sf_dir: str):
    """RFM customer segmentation: one user shuffle, exact per-dimension
    terciles, value-comparison 1..3 labels (stages/events.rfm_segments)."""
    from cuda_gis_smoothing_ray.stages import events

    return events.rfm_segments(events.read_events(sf_dir)).sort("user_id")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        "pip_join": _q_pip,
        "pip_join_holes": _q_pip_holes,
        "polygon_density": _q_polygon_density,
        "knn_join": _q_knn,
        "polyfill": _q_polyfill,
        "distance_join": _q_distance_join,
        "zonal_stats": _q_zonal_stats,
        "zonal_majority": _q_zonal_majority,
        "zone_terms": _q_zone_terms,
        "host_extent": _q_host_extent,
        "idw_interpolate": _q_idw,
        "nearest_polygon": _q_nearest_polygon,
        "geohash": _q_geohash,
        "knn_haversine": _q_knn_haversine,
        "pip_join_indexed": _q_pip_indexed,
        "enrich_pages": _q_enrich_pages,
        "pip_anti": _q_pip_anti,
        "bbox_query": _q_bbox_query,
        "zonemap_range": _q_zonemap_range,
        "zonemap_token_search": _q_zonemap_token_search,
        "cell_boundary": _q_cell_boundary,
        "cell_parent": _q_cell_parent,
        "compact_cells": _q_compact_cells,
        "uncompact_cells": _q_uncompact_cells,
        "flow_accumulation": _q_flow_accumulation,
        "watershed": _q_watershed,
        "cheapest_path": _q_cheapest_path,
        "grid_disk": _q_grid_disk,
        "dedup_canonical": _q_dedup_canonical,
        "len_histogram": _q_len_histogram,
        "text_stats": _q_text_stats,
        "readability": _q_readability,
        "gopher_repetition": _q_gopher_repetition,
        "lang_id_eval": _q_lang_id_eval,
        "lang_source_chi2": _q_lang_source_chi2,
        "length_psi_by_source": _q_length_psi_by_source,
        "lang_id": _q_lang_id,
        "exact_dedup": _q_exact_dedup,
        "normalized_dedup": _q_normalized_dedup,
        "bm25_scores": _q_bm25_scores,
        "bucketed_join": _q_bucketed_join,
        "jaccard_pairs": _q_jaccard,
        "minhash_pairs": _q_minhash,
        "minhash_pairs_wide": _q_minhash_wide,
        "simhash_pairs": _q_simhash,
        "doc_fingerprints": _q_doc_fingerprints,
        "tfidf": _q_tfidf,
        "nb_lang_classify": _q_nb_lang_classify,
        "pareto_docs": _q_pareto_docs,
        "quota_sample": _q_quota_sample,
        "dup_span_coverage": _q_dup_span_coverage,
        "zscore_text_len": _q_zscore,
        "top_bigrams": _q_top_bigrams,
        "zipf_slope": _q_zipf_slope,
        "hapax_rate": _q_hapax_rate,
        "phrase_search": _q_phrase_search,
        "unigram_drift": _q_unigram_drift,
        "rrf_fusion": _q_rrf_fusion,
        "coverage_curve": _q_coverage_curve,
        "mutual_information": _q_mutual_information,
        "typo_clusters": _q_typo_clusters,
        "cohen_kappa": _q_cohen_kappa,
        "spearman_corr": _q_spearman_corr,
        "weighted_median_len": _q_weighted_median_len,
        "mann_whitney": _q_mann_whitney,
        "kmv_distinct": _q_kmv_distinct,
        "dft_power24": _q_dft_power24,
        "proximity_search": _q_proximity_search,
        "chi2_independence": _q_chi2_independence,
        "perceptron_train": _q_perceptron_train,
        "holt_linear": _q_holt_linear,
        "kruskal_wallis": _q_kruskal_wallis,
        "lang_diversity": _q_lang_diversity,
        "jaccard_neighborhood": _q_jaccard_neighborhood,
        "support_hull": _q_support_hull,
        "welch_ttest": _q_welch_ttest,
        "heaps_law": _q_heaps_law,
        "cume_dist_len": _q_cume_dist_len,
        "jitter_rose": _q_jitter_rose,
        "join_counts": _q_join_counts,
        "top_docs_by_lang": _q_top_docs_by_lang,
        "weighted_sample": _q_weighted_sample,
        "kwic_snippets": _q_kwic_snippets,
        "mst_cells": _q_mst_cells,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "langs_concat": _q_langs_concat,
        "boolean_search": _q_boolean_search,
        "k_truss": _q_k_truss,
        "trigram_transitions": _q_trigram_transitions,
        "mad_outlier_days": _q_mad_outlier_days,
        "path_entropy": _q_path_entropy,
        "hill_tail_index": _q_hill_tail_index,
        "forecast_backtest": _q_forecast_backtest,
        "spatial_thin": _q_spatial_thin,
        "event_doc_join": _q_event_doc_join,
        "transition_dwell": _q_transition_dwell,
        "diameter_sweep": _q_diameter_sweep,
        "circular_stats": _q_circular_stats,
        "active_time": _q_active_time,
        "fisher_ratio": _q_fisher_ratio,
        "anova_eta": _q_anova_eta,
        "bounce_rate": _q_bounce_rate,
        "doc_keywords": _q_doc_keywords,
        "wilson_ci": _q_wilson_ci,
        "returning_users": _q_returning_users,
        "cell_lang_shift": _q_cell_lang_shift,
        "decayed_counts": _q_decayed_counts,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "spend_gini": _q_spend_gini,
        "geo_dispersion": _q_geo_dispersion,
        "value_robust_by_type": _q_value_robust_by_type,
        "clark_evans": _q_clark_evans,
        "containment_pairs": _q_containment_pairs,
        "cell_lang_entropy": _q_cell_lang_entropy,
        "type_drift_days": _q_type_drift_days,
        "spend_rate": _q_spend_rate,
        "shard_conductance": _q_shard_conductance,
        "smooth_residuals": _q_smooth_residuals,
        "embedding_stats": _q_embedding_stats,
        "entry_paths": _q_entry_paths,
        "quality_by_source": _q_quality_by_source,
        "weekend_lift": _q_weekend_lift,
        "bh_fdr": _q_bh_fdr,
        "spend_outliers": _q_spend_outliers,
        "silhouette_lite": _q_silhouette_lite,
        "kendall_tau": _q_kendall_tau,
        "choropleth_classes": _q_choropleth_classes,
        "tld_lang_divergence": _q_tld_lang_divergence,
        "top_type_share": _q_top_type_share,
        "source_len_drift": _q_source_len_drift,
        "wau_curve": _q_wau_curve,
        "gap_robust_by_type": _q_gap_robust_by_type,
        "lang_vocab_overlap": _q_lang_vocab_overlap,
        "spend_concentration": _q_spend_concentration,
        "hub_robustness": _q_hub_robustness,
        "integrity_audit": _q_integrity_audit,
        "median_center": _q_median_center,
        "isolated_cells": _q_isolated_cells,
        "top_cells_by_tld": _q_top_cells_by_tld,
        "split_assign": _q_split_assign,
        "contamination": _q_contamination,
        "passage_dedup": _q_passage_dedup,
        "rfm_segments": _q_rfm_segments,
        "session_overlap": _q_session_overlap,
        "pagerank": _q_pagerank,
        "hits_scores": _q_hits,
        "personalized_pagerank": _q_personalized_pagerank,
        "bfs_hops": _q_bfs_hops,
        "lm_score": _q_lm_score,
        "ccnet_buckets": _q_ccnet_buckets,
        "bpe_merges": _q_bpe_merges,
        "bpe_tokenize": _q_bpe_tokenize,
        "collapse_repeats": _q_collapse_repeats,
        "triangle_counts": _q_triangles,
        "common_neighbors": _q_common_neighbors,
        "adamic_adar": _q_adamic_adar,
        "graph_modularity": _q_graph_modularity,
        "degree_assortativity": _q_degree_assortativity,
        "graph_reciprocity": _q_graph_reciprocity,
        "clustering_coeff": _q_clustering_coeff,
        "dup_ngram_stats": _q_dup_ngrams,
        "remove_boilerplate": _q_remove_boilerplate,
        "gopher_quality": _q_gopher_quality,
        "quality_resample": _q_quality_resample,
        "mixture_sample": _q_mixture_sample,
        "incremental_dedup": _q_incremental_dedup,
        "snapshot_merge": _q_snapshot_merge,
        "len_percentile": _q_len_percentile,
        "curate_corpus": _q_curate_corpus,
        "host_quality": _q_host_quality,
        "bigram_pmi": _q_bigram_pmi,
        "kcore": _q_kcore,
        "inverted_index": _q_inverted_index,
        "oov_rate": _q_oov_rate,
        "token_budget_select": _q_token_budget_select,
        "decision_stump": _q_decision_stump,
        "grouped_corr": _q_grouped_corr,
        "heavy_hitters": _q_heavy_hitters,
        "cms_user_counts": _q_cms_user_counts,
        "json_props": _q_json_props,
        "chunk_documents": _q_chunk_documents,
        "redact_pii": _q_redact_pii,
        "window_distinct_users": _q_window_distinct_users,
        "pack_sequences": _q_pack_sequences,
        "profile_documents": _q_profile,
        "minhash_pairs_tiny": _q_minhash_tiny,
        "dedup_recall": _q_dedup_recall,
        "linear_probe": _q_linear_probe,
        "grouped_linear_probe": _q_grouped_linear_probe,
        "simhash_pairs_tiny": _q_simhash_tiny,
        "dedup_components": _q_dedup_components,
        "neardup_components": _q_neardup_components,
        "cross_source_neardup": _q_cross_source_neardup,
        "source_divergence_matrix": _q_source_divergence_matrix,
        "ann_cosine_topk": _q_ann_topk,
        "knn_graph": _q_knn_graph,
        "semantic_dedup": _q_semantic_dedup,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_pq_topk": _q_ann_pq,
        "ann_ivf_tiny": _q_ann_ivf_tiny,
        "ann_lsh_tiny": _q_ann_lsh_tiny,
        "ann_pq_tiny": _q_ann_pq_tiny,
        "ann_recall": _q_ann_recall,
        "ann_range_search": _q_ann_range,
        "embedding_gram": _q_embedding_gram,
        "pca_power": _q_pca_power,
        "kmeans_inertia": _q_kmeans_inertia,
        "jl_project": _q_jl_project,
        "embedding_neardup": _q_neardup,
        "label_centroids": _q_label_centroids,
        "quantize_int8": _q_quantize_int8,
        "kmeans_clusters": _q_kmeans,
        "cluster_terms": _q_cluster_terms,
        "media_decode": _q_media_decode,
        "media_decode_real": _q_media_decode_real,
        "audio_loudness": _q_audio_loudness,
        "media_resize_real": _q_media_resize_real,
        "audio_resample_real": _q_audio_resample_real,
        "media_features": _q_media_features,
        "media_resize": _q_media_resize,
        "audio_resample": _q_audio_resample,
        "frame_sample": _q_frame_sample,
        "text_quality_by_lang": _q_text_quality_by_lang,
        "events_window": _q_events_window,
        "sessionize": _q_sessionize,
        "cohort_retention": _q_cohort_retention,
        "cooccurrence": _q_cooccurrence,
        "ohlc_bars": _q_ohlc_bars,
        "lang_share": _q_lang_share,
        "fuzzy_hosts": _q_fuzzy_hosts,
        "char_entropy": _q_char_entropy,
        "first_events": _q_first_events,
        "gap_fill": _q_gap_fill,
        "event_ntiles": _q_event_ntiles,
        "funnel": _q_funnel,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "ab_lift": _q_ab_lift,
        "cuped_lift": _q_cuped_lift,
        "benford_deviation": _q_benford_deviation,
        "als_rank1": _q_als_rank1,
        "km_survival": _q_km_survival,
        "seasonality_profile": _q_seasonality_profile,
        "cross_correlation": _q_cross_correlation,
        "markov_stationary": _q_markov_stationary,
        "haar_energy": _q_haar_energy,
        "type_burstiness": _q_type_burstiness,
        "theil_sen_trend": _q_theil_sen_trend,
        "hot_runs": _q_hot_runs,
        "mann_kendall": _q_mann_kendall,
        "running_totals": _q_running_totals,
        "event_gaps": _q_event_gaps,
        "event_transitions": _q_event_transitions,
        "attribution": _q_attribution,
        "event_autocorr": _q_event_autocorr,
        "burst_hours": _q_burst_hours,
        "cusum_change": _q_cusum_change,
        "ema_win": _q_ema_win,
        "events_by_segment": _q_events_by_segment,
        "host_rank": _q_host_rank,
        "event_context": _q_event_context,
        "user_activity_full": _q_user_activity_full,
        "moving_sum": _q_moving_sum,
        "trailing_window_sum": _q_trailing_window_sum,
        "latest_event_per_user": _q_latest_event,
        "user_event_paths": _q_user_event_paths,
        "event_ranks": _q_event_ranks,
        "events_pivot": _q_events_pivot,
        "grouped_quantiles": _q_grouped_quantiles,
        "robust_stats": _q_robust_stats,
        "ks_test": _q_ks_test,
        "quantile_normalize": _q_quantile_normalize,
        "quantile_filtered_docs": _q_quantile_filter,
        "customers_with_orders": _q_semi_join,
        "customers_without_orders": _q_anti_join,
        "bloom_urgent_revenue": _q_bloom_semi_join,
        "revenue_by_month": _q_revenue_by_month,
        "rollup_revenue": _q_rollup_revenue,
        "pricing_summary": _q_pricing_summary,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q6": _q_tpch_q6,
        "tpch_q4": _q_tpch_q4,
        "tpch_q12": _q_tpch_q12,
        "tpch_q14": _q_tpch_q14,
        "tpch_q10": _q_tpch_q10,
        "tpch_q13": _q_tpch_q13,
        "tpch_q17": _q_tpch_q17,
        "tpch_q18": _q_tpch_q18,
        "tpch_q22": _q_tpch_q22,
        "tpch_q15": _q_tpch_q15,
        "tpch_q19": _q_tpch_q19,
        "tpch_q7": _q_tpch_q7,
        "tpch_q8": _q_tpch_q8,
        "tpch_q21": _q_tpch_q21,
        "tpch_q2": _q_tpch_q2,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q20": _q_tpch_q20,
        "cube_lineitem": _q_cube_lineitem,
        "customer_order_stats": _q_customer_order_stats,
        "join_orders_by_nation": _q_join_orders_by_nation,
        "join_region_customers": _q_join_region_customers,
        "join_revenue_by_priority": _q_join_revenue_by_priority,
        "brand_supplier_volume": _q_brand_supplier_volume,
        "sliding_window": _q_sliding_window,
        "distinct_hosts": _q_distinct_hosts,
        "hll_hosts": _q_hll_hosts,
        "hll_registers": _q_hll_registers,
        "hll_by_lang": _q_hll_by_lang,
        "text_len_quantiles": _q_text_len_quantiles,
        "sampled_len_quantiles": _q_sampled_len_quantiles,
        "text_len_quantiles_cont": _q_text_len_quantiles_cont,
        "lang_len_quantiles_cont": _q_lang_len_quantiles_cont,
        "top_hosts_by_lang": _q_top_hosts_by_lang,
        "host_gini": _q_host_gini,
        "hosts_en_not_de": _q_hosts_except,
        "hosts_union": _q_hosts_union,
        "host_split": _q_host_split,
        "lang_confusion": _q_lang_confusion,
        "lang_distinct_hosts": _q_lang_distinct_hosts,
        "tlds_en_and_de": lambda d: _q_hosts_except(d, anti=False, col="tld"),
        "extract_text": _q_extract_text,
        "parse_urls": _q_parse_urls,
        "latest_capture": _q_latest_capture,
        "recrawl_stats": _q_recrawl_stats,
        "geocode_cells": _q_geocode_cells,
        "cell_metrics": _q_cell_metrics,
        "incremental_metrics": _q_incremental_metrics,
        "hex_gradient": _q_hex_gradient,
        "kde_density": _q_kde_density,
        "ripley_k": _q_ripley_k,
        "neighbor_stats": _q_neighbor_stats,
        "ring2_stats": _q_ring2_stats,
        "hotspot_gi": _q_hotspot_gi,
        "isoline_cells": _q_isoline_cells,
        "geary_c": _q_geary_c,
        "emerging_hotspots": _q_emerging_hotspots,
        "directional_variogram": _q_directional_variogram,
        "moran_correlogram": _q_moran_correlogram,
        "semivariogram": _q_semivariogram,
        "otsu_threshold": _q_otsu_threshold,
        "hist_equalize": _q_hist_equalize,
        "distance_transform": _q_distance_transform,
        "hex_voronoi": _q_hex_voronoi,
        "unpivot_cells": _q_unpivot_cells,
        "hosts_division": _q_hosts_division,
        "raster_morphology": _q_raster_morphology,
        "spatiotemporal_counts": _q_spatiotemporal_counts,
        "morans_i": _q_morans_i,
        "local_morans": _q_local_morans,
        "bivariate_morans": _q_bivariate_morans,
        "grid_distance": _q_grid_distance,
        "grid_path": _q_grid_path,
        "route_corridor": _q_route_corridor,
        "spatial_cluster": _q_spatial_cluster,
        "morton_locality": _q_morton_locality,
        "morton_order": _q_morton,
        "hilbert_order": _q_hilbert,
        "hilbert_locality": _q_hilbert_locality,
        "tile_assign": _q_tiles,
        "multires_cells": _q_multires,
        "tile_vector": _q_tile_vector,
        "top_cells": _q_top_cells,
        "sample_pages": _q_sample_pages,
        "stratified_sample": _q_stratified_sample,
        "smooth_uniform_k1": lambda d: _smooth(d, 1, "uniform", ["chars_mean"]),
        # the north_star's salted two-phase hot-key path, oracle-gated:
        # identical output contract to the unsalted plan
        "smooth_salted_k1": lambda d: _smooth(d, 1, "uniform", ["chars_mean"], salted=True),
        "smooth_gauss_k1": lambda d: _smooth(d, 1, "gaussian", ["chars_mean"]),
        "smooth_uniform_k2": lambda d: _smooth(d, 2, "uniform", ["chars_mean"]),
        "smooth_gauss_k2": lambda d: _smooth(d, 2, "gaussian", ["chars_mean"]),
        "smooth_fused4": lambda d: _smooth(
            d, 1, "gaussian", ["page_count", "chars_mean", "en_share", "mention_rate"]
        ),
    }
    return q


def oracle_sql() -> dict[str, str]:
    from cuda_gis_smoothing_ray.sql import oracles as o
    from cuda_gis_smoothing_ray.sql import oracles_corpus as oc
    from cuda_gis_smoothing_ray.stages import gridops
    from cuda_gis_smoothing_ray.stages.spatialjoin import BBOX
    from cuda_gis_smoothing_ray.state import zonemap as _zm

    return {
        "text_stats": oc.text_stats_sql(),
        "readability": oc.readability_sql(),
        "gopher_repetition": oc.gopher_repetition_sql(),
        "lang_id_eval": oc.lang_id_eval_sql(),
        "lang_source_chi2": oc.lang_source_chi2_sql(),
        "length_psi_by_source": oc.length_psi_by_source_sql(),
        "lang_id": oc.lang_id_sql(),
        "exact_dedup": oc.exact_dedup_sql(),
        "normalized_dedup": oc.normalized_dedup_sql(),
        "bm25_scores": oc.bm25_scores_sql(),
        "bucketed_join": oc.bucketed_join_sql(),
        "jaccard_pairs": oc.jaccard_pairs_sql(JACCARD_T),
        "doc_fingerprints": oc.doc_fingerprints_sql(),
        "tfidf": oc.tfidf_sql(),
        "nb_lang_classify": oc.nb_lang_classify_sql(),
        "pareto_docs": oc.pareto_docs_sql(),
        "quota_sample": oc.quota_sample_sql(),
        "dup_span_coverage": oc.dup_span_coverage_sql(),
        "zscore_text_len": oc.zscore_text_len_sql(),
        "top_bigrams": oc.top_bigrams_sql(20),
        "zipf_slope": oc.zipf_slope_sql(),
        "hapax_rate": oc.hapax_rate_sql(),
        "phrase_search": oc.phrase_search_sql(),
        "unigram_drift": oc.unigram_drift_sql(),
        "rrf_fusion": oc.rrf_fusion_sql(),
        "coverage_curve": oc.coverage_curve_sql(),
        "mutual_information": oc.mutual_information_sql(),
        "typo_clusters": oc.typo_clusters_sql(),
        "cohen_kappa": oc.cohen_kappa_sql(),
        "spearman_corr": oc.spearman_corr_sql(),
        "weighted_median_len": oc.weighted_median_len_sql(),
        "mann_whitney": oc.mann_whitney_sql(),
        "kmv_distinct": oc.kmv_distinct_sql(),
        "dft_power24": oc.dft_power24_sql(),
        "proximity_search": oc.proximity_search_sql(),
        "chi2_independence": oc.chi2_independence_sql(),
        "perceptron_train": oc.perceptron_train_sql(),
        "holt_linear": oc.holt_linear_sql(),
        "kruskal_wallis": oc.kruskal_wallis_sql(),
        "lang_diversity": oc.lang_diversity_sql(),
        "jaccard_neighborhood": oc.jaccard_neighborhood_sql(),
        "support_hull": oc.support_hull_sql(RES),
        "welch_ttest": oc.welch_ttest_sql(),
        "heaps_law": oc.heaps_law_sql(),
        "cume_dist_len": oc.cume_dist_len_sql(),
        "jitter_rose": oc.jitter_rose_sql(RES),
        "join_counts": oc.join_counts_sql(RES),
        "top_docs_by_lang": oc.top_docs_by_lang_sql(),
        "weighted_sample": oc.weighted_sample_sql(),
        "kwic_snippets": oc.kwic_snippets_sql(),
        "mst_cells": oc.mst_cells_sql(RES),
        "jsonl_roundtrip": oc.jsonl_roundtrip_sql(),
        "langs_concat": oc.langs_concat_sql(),
        "boolean_search": oc.boolean_search_sql(),
        "k_truss": oc.k_truss_sql(),
        "trigram_transitions": oc.trigram_transitions_sql(),
        "mad_outlier_days": oc.mad_outlier_days_sql(),
        "path_entropy": oc.path_entropy_sql(),
        "hill_tail_index": oc.hill_tail_index_sql(),
        "forecast_backtest": oc.forecast_backtest_sql(),
        "spatial_thin": oc.spatial_thin_sql(RES),
        "event_doc_join": oc.event_doc_join_sql(),
        "transition_dwell": oc.transition_dwell_sql(),
        "diameter_sweep": oc.diameter_sweep_sql(),
        "circular_stats": oc.circular_stats_sql(RES),
        "active_time": oc.active_time_sql(),
        "fisher_ratio": oc.fisher_ratio_sql(),
        "anova_eta": oc.anova_eta_sql(),
        "bounce_rate": oc.bounce_rate_sql(),
        "doc_keywords": oc.doc_keywords_sql(),
        "wilson_ci": oc.wilson_ci_sql(),
        "returning_users": oc.returning_users_sql(),
        "cell_lang_shift": oc.cell_lang_shift_sql(RES),
        "decayed_counts": oc.decayed_counts_sql(),
        "dup_rate_by_source": oc.dup_rate_by_source_sql(),
        "spend_gini": oc.spend_gini_sql(),
        "geo_dispersion": oc.geo_dispersion_sql(RES),
        "value_robust_by_type": oc.value_robust_by_type_sql(),
        "clark_evans": oc.clark_evans_sql(RES),
        "containment_pairs": oc.containment_pairs_sql(),
        "cell_lang_entropy": oc.cell_lang_entropy_sql(RES),
        "type_drift_days": oc.type_drift_days_sql(),
        "spend_rate": oc.spend_rate_sql(),
        "shard_conductance": oc.shard_conductance_sql(),
        "smooth_residuals": oc.smooth_residuals_sql(RES),
        "embedding_stats": oc.embedding_stats_sql(),
        "entry_paths": oc.entry_paths_sql(),
        "quality_by_source": oc.quality_by_source_sql(),
        "weekend_lift": oc.weekend_lift_sql(),
        "bh_fdr": oc.bh_fdr_sql(),
        "spend_outliers": oc.spend_outliers_sql(),
        "silhouette_lite": oc.silhouette_lite_sql(),
        "kendall_tau": oc.kendall_tau_sql(),
        "choropleth_classes": oc.choropleth_classes_sql(RES),
        "tld_lang_divergence": oc.tld_lang_divergence_sql(),
        "top_type_share": oc.top_type_share_sql(),
        "source_len_drift": oc.source_len_drift_sql(),
        "wau_curve": oc.wau_curve_sql(),
        "gap_robust_by_type": oc.gap_robust_by_type_sql(),
        "lang_vocab_overlap": oc.lang_vocab_overlap_sql(),
        "spend_concentration": oc.spend_concentration_sql(),
        "hub_robustness": oc.hub_robustness_sql(),
        "integrity_audit": oc.integrity_audit_sql(),
        "median_center": oc.median_center_sql(RES),
        "isolated_cells": oc.isolated_cells_sql(9),
        "top_cells_by_tld": oc.top_cells_by_tld_sql(RES),
        "split_assign": oc.split_assign_sql(),
        "contamination": oc.contamination_sql(),
        "passage_dedup": oc.passage_dedup_sql(),
        "rfm_segments": oc.rfm_segments_sql(),
        "session_overlap": oc.session_overlap_sql(),
        "pagerank": oc.pagerank_sql(),
        "hits_scores": oc.hits_sql(),
        "personalized_pagerank": oc.personalized_pagerank_sql(),
        "bfs_hops": oc.bfs_hops_sql(),
        "hll_registers": oc.hll_registers_sql(),
        "hll_by_lang": oc.hll_by_lang_sql(),
        "lm_score": oc.lm_score_sql(),
        "ccnet_buckets": oc.ccnet_buckets_sql(),
        "bpe_merges": oc.bpe_merges_sql(),
        "bpe_tokenize": oc.bpe_tokenize_sql(),
        "collapse_repeats": oc.collapse_repeats_sql(),
        "triangle_counts": oc.triangles_sql(),
        "common_neighbors": oc.common_neighbors_sql(),
        "adamic_adar": oc.adamic_adar_sql(),
        "graph_modularity": oc.graph_modularity_sql(),
        "degree_assortativity": oc.degree_assortativity_sql(),
        "graph_reciprocity": oc.graph_reciprocity_sql(),
        "clustering_coeff": oc.clustering_coeff_sql(),
        "dup_ngram_stats": oc.dup_ngram_stats_sql(),
        "remove_boilerplate": oc.remove_boilerplate_sql(n=5, min_df=2),
        "gopher_quality": oc.gopher_quality_sql(),
        "quality_resample": oc.quality_resample_sql(
            5000, gridops.SAMPLE_MULT, gridops.SAMPLE_MOD
        ),
        "mixture_sample": oc.mixture_sample_sql(
            gridops.SAMPLE_MULT, gridops.SAMPLE_MOD
        ),
        "incremental_dedup": oc.incremental_dedup_sql(),
        "snapshot_merge": oc.snapshot_merge_sql(),
        "len_percentile": oc.len_percentile_sql(),
        "curate_corpus": oc.curate_corpus_sql(),
        "host_quality": oc.host_quality_sql(level="tld"),
        "bigram_pmi": oc.bigram_pmi_sql(),
        "kcore": oc.kcore_sql(),
        "inverted_index": oc.inverted_index_sql(),
        "oov_rate": oc.oov_rate_sql(),
        "token_budget_select": oc.token_budget_select_sql(),
        "decision_stump": oc.decision_stump_sql(),
        "grouped_corr": oc.grouped_corr_sql(),
        "heavy_hitters": oc.heavy_hitters_sql(),
        "cms_user_counts": oc.cms_user_counts_sql(),
        "json_props": oc.json_props_sql(),
        "chunk_documents": oc.chunk_documents_sql(),
        "redact_pii": oc.redact_pii_sql(),
        "window_distinct_users": oc.window_distinct_users_sql(),
        "pack_sequences": oc.pack_sequences_sql(),
        "profile_documents": oc.profile_documents_sql(),
        "minhash_pairs_tiny": oc.minhash_pairs_tiny_sql(0.5, 4, 3, 2),
        "dedup_recall": oc.dedup_recall_sql(0.5),
        "linear_probe": oc.linear_probe_sql(),
        "grouped_linear_probe": oc.grouped_linear_probe_sql(),
        "simhash_pairs_tiny": oc.simhash_pairs_tiny_sql(),
        # production parameters: the same parametric HUGEINT CTEs, scaled
        # to 64 perms / 5-shingles / 16 bands (minhash) and the vectorized
        # fnv token-hash path (simhash) — bit-exact, no longer rows-only.
        "minhash_pairs": oc.minhash_pairs_tiny_sql(0.7, 64, 5, 16),
        "minhash_pairs_wide": oc.minhash_pairs_tiny_sql(0.7, 64, 5, 8),
        "cross_source_neardup": oc.cross_source_neardup_sql(0.7, 64, 5, 16),
        "source_divergence_matrix": oc.source_divergence_matrix_sql(),
        "simhash_pairs": oc.simhash_pairs_fnv_sql(),
        "dedup_components": oc.dedup_components_sql(JACCARD_T),
        "neardup_components": oc.neardup_components_sql(),
        "ann_cosine_topk": oc.ann_topk_sql(ANN_K),
        "ann_range_search": oc.ann_range_sql(),
        "embedding_gram": oc.embedding_gram_sql(),
        "pca_power": oc.pca_power_sql(),
        "kmeans_inertia": oc.kmeans_inertia_sql(),
        "jl_project": oc.jl_project_sql(),
        "knn_graph": oc.ann_topk_sql(KNN_GRAPH_K, n_queries=1 << 40),
        "semantic_dedup": oc.semantic_dedup_sql(NEARDUP_T),
        "embedding_neardup": oc.embedding_neardup_sql(NEARDUP_T),
        "label_centroids": oc.label_centroids_sql(),
        "quantize_int8": oc.quantize_int8_sql(),
        "kmeans_clusters": oc.kmeans_sql(),
        "cluster_terms": oc.cluster_terms_sql(),
        "media_decode": oc.media_decode_sql(),
        "media_decode_real": oc.media_decode_real_sql(),
        "audio_loudness": oc.audio_loudness_sql(),
        "media_resize_real": oc.media_resize_real_sql(),
        "audio_resample_real": oc.audio_resample_real_sql(),
        "media_features": oc.media_features_sql(),
        "media_resize": oc.media_resize_sql(),
        "audio_resample": oc.audio_resample_sql(),
        "frame_sample": oc.frame_sample_sql(),
        "text_quality_by_lang": oc.text_quality_by_lang_sql(),
        "events_window": oc.events_window_sql(),
        "sessionize": oc.sessionize_sql(),
        "cohort_retention": oc.cohort_retention_sql(),
        "cooccurrence": oc.cooccurrence_sql(),
        "ohlc_bars": oc.ohlc_bars_sql(),
        "lang_share": oc.lang_share_sql(),
        "fuzzy_hosts": oc.fuzzy_hosts_sql(),
        "char_entropy": oc.char_entropy_sql(),
        "first_events": oc.first_events_sql(3),
        "gap_fill": oc.gap_fill_sql(),
        "event_ntiles": oc.event_ntiles_sql(),
        "funnel": oc.funnel_sql(),
        "asof_join": oc.asof_join_sql(),
        "range_join": oc.range_join_sql(),
        "ab_lift": oc.ab_lift_sql(),
        "cuped_lift": oc.cuped_lift_sql(),
        "benford_deviation": oc.benford_deviation_sql(),
        "als_rank1": oc.als_rank1_sql(),
        "km_survival": oc.km_survival_sql(),
        "seasonality_profile": oc.seasonality_profile_sql(),
        "cross_correlation": oc.cross_correlation_sql(),
        "markov_stationary": oc.markov_stationary_sql(),
        "haar_energy": oc.haar_energy_sql(),
        "type_burstiness": oc.type_burstiness_sql(),
        "theil_sen_trend": oc.theil_sen_trend_sql(),
        "hot_runs": oc.hot_runs_sql(),
        "mann_kendall": oc.mann_kendall_sql(),
        "running_totals": oc.running_totals_sql(),
        "event_gaps": oc.event_gaps_sql(),
        "event_transitions": oc.event_transitions_sql(),
        "attribution": oc.attribution_sql(),
        "event_autocorr": oc.event_autocorr_sql(),
        "burst_hours": oc.burst_hours_sql(),
        "cusum_change": oc.cusum_change_sql(),
        "ema_win": oc.ema_win_sql(),
        "events_by_segment": oc.events_by_segment_sql(),
        "host_rank": oc.host_rank_sql(),
        "event_context": oc.event_context_sql(),
        "user_activity_full": oc.user_activity_full_sql(),
        "moving_sum": oc.moving_sum_sql(),
        "trailing_window_sum": oc.trailing_window_sum_sql(),
        "latest_event_per_user": oc.latest_event_sql(),
        "user_event_paths": oc.user_event_paths_sql(),
        "event_ranks": oc.event_ranks_sql(),
        "events_pivot": oc.events_pivot_sql(),
        "grouped_quantiles": oc.grouped_quantiles_sql(),
        "robust_stats": oc.robust_stats_sql(),
        "ks_test": oc.ks_test_sql(),
        "quantile_normalize": oc.quantile_normalize_sql(),
        "quantile_filtered_docs": oc.quantile_filter_sql(),
        "customers_with_orders": oc.customers_with_orders_sql(),
        "customers_without_orders": oc.customers_with_orders_sql(anti=True, priority="1-URGENT"),
        "bloom_urgent_revenue": oc.bloom_semi_join_sql(),
        "revenue_by_month": oc.revenue_by_month_sql(),
        "rollup_revenue": oc.rollup_revenue_sql(),
        "pricing_summary": oc.pricing_summary_sql(),
        "tpch_q3": oc.tpch_q3_sql(),
        "tpch_q5": oc.tpch_q5_sql(),
        "tpch_q6": oc.tpch_q6_sql(),
        "tpch_q4": oc.tpch_q4_sql(),
        "tpch_q12": oc.tpch_q12_sql(),
        "tpch_q14": oc.tpch_q14_sql(),
        "tpch_q10": oc.tpch_q10_sql(),
        "tpch_q13": oc.tpch_q13_sql(),
        "tpch_q17": oc.tpch_q17_sql(),
        "tpch_q18": oc.tpch_q18_sql(),
        "tpch_q22": oc.tpch_q22_sql(),
        "tpch_q15": oc.tpch_q15_sql(),
        "tpch_q19": oc.tpch_q19_sql(),
        "tpch_q7": oc.tpch_q7_sql(),
        "tpch_q8": o.tpch_q8_sql(),
        "tpch_q21": o.tpch_q21_sql(),
        "tpch_q2": o.tpch_q2_sql(),
        "tpch_q9": o.tpch_q9_sql(),
        "tpch_q11": o.tpch_q11_sql(),
        "tpch_q16": o.tpch_q16_sql(),
        "tpch_q20": o.tpch_q20_sql(),
        "cube_lineitem": oc.cube_lineitem_sql(),
        "customer_order_stats": oc.customer_order_stats_sql(),
        "join_orders_by_nation": oc.join_orders_by_nation_sql(),
        "join_region_customers": oc.join_region_customers_sql(),
        "join_revenue_by_priority": oc.join_revenue_by_priority_sql(),
        "brand_supplier_volume": oc.brand_supplier_volume_sql(),
        "sliding_window": oc.sliding_window_sql(),
        "distinct_hosts": oc.distinct_hosts_sql(),
        "text_len_quantiles": oc.text_len_quantiles_sql(),
        "sampled_len_quantiles": oc.sampled_len_quantiles_sql(
            200_000, gridops.SAMPLE_MULT, gridops.SAMPLE_MOD
        ),
        "text_len_quantiles_cont": oc.text_len_quantiles_cont_sql(),
        "lang_len_quantiles_cont": oc.lang_len_quantiles_cont_sql(),
        "top_hosts_by_lang": o.top_hosts_by_lang_sql(5),
        "host_gini": o.host_gini_sql(),
        "hosts_en_not_de": o.hosts_except_sql(),
        "hosts_union": o.hosts_except_sql("UNION"),
        "host_split": oc.host_split_sql(),
        "lang_confusion": oc.lang_confusion_sql(),
        "lang_distinct_hosts": o.lang_distinct_hosts_sql(),
        "tlds_en_and_de": o.hosts_except_sql("INTERSECT", col="tld"),
        # hll_hosts is a sketch (estimate): rows-only; error gated in
        # tests/test_sketch.py against the exact distinct count.
        # ann_lsh_topk / ann_ivf_topk are approximate by construction:
        # rows-only checks; recall is gated in tests/test_ann.py and
        # surfaced by the ann_recall query below.  minhash_pairs /
        # simhash_pairs are SQL-checked at production parameters (above);
        # the IVF / PQ topologies get bit-exact tiny-parameter twins:
        "ann_ivf_tiny": oc.ivf_tiny_sql(),
        "ann_lsh_tiny": oc.lsh_tiny_sql(),
        "ann_pq_tiny": oc.pq_tiny_sql(),
        "pip_join": o.pip_join_sql(RES),
        "pip_join_holes": o.pip_join_holes_sql(RES),
        "polygon_density": o.polygon_density_sql(RES),
        "polyfill": o.polyfill_sql(RES),
        "distance_join": o.distance_join_sql(RES, 1.0),
        "zonal_stats": o.zonal_stats_sql(RES),
        "zonal_majority": o.zonal_majority_sql(RES),
        "zone_terms": o.zone_terms_sql(RES),
        "host_extent": o.host_extent_sql(RES),
        "idw_interpolate": o.idw_interpolate_sql(RES, 25.0),
        "nearest_polygon": o.nearest_polygon_sql(RES),
        "geohash": o.geohash_sql(RES),
        "knn_haversine": o.knn_haversine_sql(RES, 5),
        "pip_join_indexed": o.pip_join_sql(RES),
        "enrich_pages": o.enrich_pages_sql(RES, 1, "gaussian", ["chars_mean"]),
        "pip_anti": o.pip_anti_sql(RES),
        "bbox_query": o.bbox_query_sql(RES, BBOX),
        "zonemap_range": o.zonemap_range_sql(
            RES, _zm.ZONE_RANGE_LO, _zm.ZONE_RANGE_HI),
        "zonemap_token_search": o.zonemap_token_search_sql(_zm.ZONE_TOKEN),
        "cell_boundary": o.cell_boundary_sql(RES),
        "cell_parent": o.cell_parent_sql(RES, RES - 1),
        "compact_cells": o.compact_cells_sql(RES),
        "uncompact_cells": o.uncompact_cells_sql(RES),
        "flow_accumulation": o.flow_accumulation_sql(RES),
        "watershed": o.watershed_sql(RES),
        "cheapest_path": o.cheapest_path_cost_sql(RES),
        "grid_disk": o.grid_disk_sql(RES, 1),
        "dedup_canonical": oc.dedup_canonical_sql(JACCARD_T),
        "len_histogram": oc.len_histogram_sql(50),
        "knn_join": o.knn_join_sql(RES, 5),
        "extract_text": o.extract_text_sql(),
        "parse_urls": o.parse_urls_sql(),
        "latest_capture": oc.latest_capture_sql(),
        "recrawl_stats": oc.recrawl_stats_sql(),
        "geocode_cells": o.geocode_cells_sql(RES),
        "cell_metrics": o.cell_metrics_sql(RES),
        # incremental_metrics must equal the full rescan — same oracle:
        "incremental_metrics": o.cell_metrics_sql(RES),
        "neighbor_stats": o.neighbor_stats_sql(RES),
        "ring2_stats": o.neighbor_stats_sql(RES, ring=2),
        "hotspot_gi": o.hotspot_gi_sql(RES, k=1),
        "isoline_cells": o.isoline_cells_sql(RES, k=1),
        "geary_c": o.geary_c_sql(RES),
        "emerging_hotspots": o.emerging_hotspots_sql(RES, 3),
        "directional_variogram": o.directional_variogram_sql(RES),
        "moran_correlogram": o.moran_correlogram_sql(RES),
        "semivariogram": o.semivariogram_sql(RES),
        "otsu_threshold": o.otsu_threshold_sql(RES),
        "hist_equalize": o.hist_equalize_sql(RES),
        "distance_transform": o.distance_transform_sql(RES),
        "hex_voronoi": o.hex_voronoi_sql(RES),
        "unpivot_cells": o.unpivot_cells_sql(RES),
        "hosts_division": oc.hosts_division_sql(),
        "raster_morphology": o.raster_morphology_sql(RES, k=1),
        "spatiotemporal_counts": o.spatiotemporal_counts_sql(RES, replicate=3),
        "morans_i": o.morans_i_sql(RES, k=1),
        "local_morans": o.local_morans_sql(RES, k=1),
        "bivariate_morans": o.bivariate_morans_sql(RES, "en_share", "chars_mean", k=1),
        "grid_distance": o.grid_distance_sql(RES),
        "grid_path": o.grid_path_sql(RES),
        "route_corridor": o.route_corridor_sql(RES, k=1),
        "spatial_cluster": o.spatial_cluster_sql(RES, min_count=2, k=1),
        "morton_locality": o.morton_locality_sql(RES),
        "morton_order": o.morton_sql(RES),
        "hilbert_order": o.hilbert_order_sql(RES),
        "hilbert_locality": o.hilbert_locality_sql(RES),
        "tile_assign": o.tile_assign_sql(RES, TILE_ZOOM),
        "multires_cells": o.multires_counts_sql(RES),
        "tile_vector": o.tile_vector_sql(RES, TILE_ZOOM),
        "top_cells": o.top_cells_sql(RES, TOPK_CELLS),
        "sample_pages": o.sample_pages_sql(
            SAMPLE_KEEP_PPM, gridops.SAMPLE_MULT, gridops.SAMPLE_MOD
        ),
        "stratified_sample": o.stratified_sample_sql(
            STRAT_RATES, STRAT_DEFAULT_PPM, gridops.SAMPLE_MULT, gridops.SAMPLE_MOD
        ),
        "hex_gradient": o.hex_gradient_sql(RES, "chars_mean"),
        "kde_density": o.kde_density_sql(RES),
        "ripley_k": o.ripley_k_sql(RES),
        "smooth_uniform_k1": o.smooth_sql(RES, 1, "uniform", ["chars_mean"]),
        "smooth_salted_k1": o.smooth_sql(RES, 1, "uniform", ["chars_mean"]),
        "smooth_gauss_k1": o.smooth_sql(RES, 1, "gaussian", ["chars_mean"]),
        "smooth_uniform_k2": o.smooth_sql(RES, 2, "uniform", ["chars_mean"]),
        "smooth_gauss_k2": o.smooth_sql(RES, 2, "gaussian", ["chars_mean"]),
        "smooth_fused4": o.smooth_sql(
            RES, 1, "gaussian", ["page_count", "chars_mean", "en_share", "mention_rate"]
        ),
    }
