"""PIP join + kNN operator tests against brute-force numpy oracles
(the cross-implementation-equivalence strategy of SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def points_ds():
    import ray.data as rd

    rng = np.random.default_rng(99)
    n = 2000
    return rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(np.arange(n, dtype=np.int64)),
                "lat": pa.array(rng.uniform(-60, 60, n)),
                "lon": pa.array(rng.uniform(-170, 170, n)),
            }
        )
    ), rng


def test_pip_join_matches_brute_raycast(points_ds):
    from cuda_gis_smoothing_ray.stages.pip import POLYGONS, pip_join, points_in_polygon

    ds, _ = points_ds
    out = pip_join(ds).to_pandas()
    got = set(zip(out["page_id"], out["poly_id"]))
    pts = ds.to_pandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    want = set()
    for pid, ring in POLYGONS:
        inside = points_in_polygon(lat, lon, ring)
        want |= {(int(i), pid) for i in pts["page_id"].to_numpy()[inside]}
    assert got == want and len(want) > 0


def test_pip_nonconvex_and_boundary_shapes():
    from cuda_gis_smoothing_ray.stages.pip import points_in_polygon

    # unit square
    square = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    lat = np.array([0.5, 1.5, -0.5, 0.999])
    lon = np.array([0.5, 0.5, 0.5, 0.001])
    assert points_in_polygon(lat, lon, square).tolist() == [True, False, False, True]
    # non-convex L: the notch must be outside
    L = [(0.0, 0.0), (0.0, 2.0), (1.0, 2.0), (1.0, 1.0), (2.0, 1.0), (2.0, 0.0)]
    lat = np.array([0.5, 1.5, 1.5])
    lon = np.array([0.5, 0.5, 1.5])
    assert points_in_polygon(lat, lon, L).tolist() == [True, True, False]


def test_knn_broadcast_matches_brute(points_ds):
    from cuda_gis_smoothing_ray.stages.knn import QUERY_POINTS, knn_broadcast

    ds, _ = points_ds
    out = knn_broadcast(ds, k=4).to_pandas()
    pts = ds.to_pandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    ids = pts["page_id"].to_numpy()
    for qid, qlat, qlon in QUERY_POINTS[:6]:
        d2 = (lat - qlat) ** 2 + (lon - qlon) ** 2
        want = ids[np.lexsort((ids, d2))[:4]]
        got = out[out["query_id"] == qid].sort_values("rank")["page_id"].to_numpy()
        assert (got == want).all(), (qid, got, want)


def test_knn_broadcast_tie_across_batch_boundary():
    """Adversarial case from the r3 verdict: duplicate-coordinate points with
    identical distance to the query, straddling a batch boundary.  The
    batch-local prune must keep ALL tied-at-kth candidates so the final
    (dist2, id) merge matches the oracle's ORDER BY dist2, page_id."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.knn import knn_broadcast

    # 6 points all at the SAME coordinates; high ids in the first block,
    # low ids in the second — a naive argpartition keeps block-1's high ids
    # and the merge then can't recover ids 0/1/2.
    lat = np.full(6, 12.0)
    lon = np.full(6, 34.0)
    ids = np.array([100, 101, 102, 0, 1, 2], dtype=np.int64)
    t = pa.table({"page_id": pa.array(ids), "lat": pa.array(lat), "lon": pa.array(lon)})
    ds = rd.from_arrow([t.slice(0, 3), t.slice(3, 3)])  # two blocks -> two batches
    out = (
        knn_broadcast(ds, k=3, queries=[(7, 12.0, 34.0)])
        .to_pandas()
        .sort_values("rank")
    )
    assert out["page_id"].tolist() == [0, 1, 2]
    assert (out["dist2"].to_numpy() == 0.0).all()


def test_knn_cell_bucketed_agrees_with_broadcast_selfknn():
    """Self-kNN: bucketed search equals brute force when the kth neighbor is
    within the parent-cell ring (dense enough fixture guarantees it)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.knn import knn_cell_bucketed

    rng = np.random.default_rng(5)
    n = 400
    # dense cluster so neighbors are *local* (assumption in the docstring)
    lat = 10.0 + rng.uniform(0, 4, n)
    lon = 20.0 + rng.uniform(0, 4, n)
    ds = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(np.arange(n, dtype=np.int64)),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
            }
        )
    )
    out = knn_cell_bucketed(ds, k=3, bucket_res=5).to_pandas()
    # brute oracle
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    ok = 0
    for i in range(n):
        want = set(np.lexsort((np.arange(n), d2[i]))[:3])
        got = set(out[out["page_id"] == i]["neighbor_id"].to_numpy())
        ok += got == want
    assert ok / n >= 0.97  # ring-assumption violations only at bucket fringes


def test_polyfill_matches_brute_centroid_pip():
    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.pip import POLYGONS, points_in_polygon
    from cuda_gis_smoothing_ray.stages.spatialjoin import polyfill

    res = 7
    out = polyfill(res=res).to_pandas()
    got = set(zip(out["poly_id"], out["cell"]))
    # brute force: exhaustive global-ish grid per polygon
    want = set()
    for pid, ring in POLYGONS:
        q, r = np.meshgrid(np.arange(-200, 200), np.arange(-80, 80))
        q, r = q.ravel().astype(np.int64), r.ravel().astype(np.int64)
        clat, clon = hexgrid.axial_to_latlon(q, r, res)
        inside = points_in_polygon(clat, clon, ring)
        cells = hexgrid.pack(res, q[inside], r[inside])
        want |= {(pid, int(c)) for c in cells}
    assert got == want and len(want) > 100
    # every emitted cell round-trips to a center inside its polygon's bbox
    assert ((out["cell"].to_numpy() >> 56) == res).all()


def test_distance_join_matches_brute_all_pairs(points_ds):
    from cuda_gis_smoothing_ray.stages.spatialjoin import distance_join

    ds, _ = points_ds
    radius = 1.8  # just under edge_size(6) = 2.0
    out = distance_join(ds, radius=radius, bucket_res=6).to_pandas()
    got = set(zip(out["a"], out["b"]))
    pts = ds.to_pandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    ids = pts["page_id"].to_numpy()
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    ai, bi = np.nonzero((d2 <= radius * radius) & (ids[None, :] > ids[:, None]))
    want = set(zip(ids[ai], ids[bi]))
    assert got == want and len(want) > 0
    # each pair exactly once (no halo double-count)
    assert len(out) == len(got)


def test_distance_join_radius_guard(points_ds):
    from cuda_gis_smoothing_ray.stages.spatialjoin import distance_join

    ds, _ = points_ds
    with pytest.raises(ValueError):
        distance_join(ds, radius=2.5, bucket_res=6)


def test_zonal_stats_matches_brute(points_ds):
    from cuda_gis_smoothing_ray.stages.pip import POLYGONS, points_in_polygon
    from cuda_gis_smoothing_ray.stages.spatialjoin import zonal_stats

    ds, rng = points_ds
    pts = ds.to_pandas()
    n = len(pts)
    texts = ["x" * int(l) for l in rng.integers(1, 50, n)]
    langs = [("en" if i % 3 == 0 else "de") for i in range(n)]
    ds2 = ds.map_batches(
        lambda b: b.append_column("text", pa.array(texts)[: len(b)])
        .append_column("lang", pa.array(langs)[: len(b)]),
        batch_format="pyarrow",
        batch_size=n,
    )
    out = zonal_stats(ds2).to_pandas().set_index("poly_id")
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    tlen = np.array([len(t) for t in texts])
    en = np.array([l == "en" for l in langs])
    for pid, ring in POLYGONS:
        inside = points_in_polygon(lat, lon, ring)
        if inside.sum() == 0:
            assert pid not in out.index
            continue
        assert out.loc[pid, "n_pages"] == inside.sum()
        want_mean = np.floor(tlen[inside].sum() / inside.sum() * 1e6 + 0.5) / 1e6
        assert out.loc[pid, "mean_len"] == want_mean
        want_en = np.floor(en[inside].sum() / inside.sum() * 1e6 + 0.5) / 1e6
        assert out.loc[pid, "en_share"] == want_en


def test_idw_matches_brute(points_ds):
    from cuda_gis_smoothing_ray.stages.knn import QUERY_POINTS
    from cuda_gis_smoothing_ray.stages.spatialjoin import IDW_SCALE, idw_interpolate

    ds, rng = points_ds
    pts = ds.to_pandas()
    n = len(pts)
    texts = ["y" * int(l) for l in rng.integers(1, 200, n)]
    ds2 = ds.map_batches(
        lambda b: b.append_column("text", pa.array(texts)[: len(b)]),
        batch_format="pyarrow",
        batch_size=n,
    )
    radius = 10.0
    out = idw_interpolate(ds2, radius=radius).to_pandas().set_index("query_id")
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    tlen = np.array([len(t) for t in texts], dtype=np.int64)
    for qid, qlat, qlon in QUERY_POINTS:
        d2 = (qlat - lat) ** 2 + (qlon - lon) ** 2
        w = np.floor(IDW_SCALE / (1.0 + d2) + 0.5).astype(np.int64)
        w[d2 > radius * radius] = 0
        if w.sum() == 0:
            assert qid not in out.index
            continue
        assert out.loc[qid, "n_weight"] == w.sum()
        want = np.floor((w * tlen).sum() / w.sum() * 1e6 + 0.5) / 1e6
        assert out.loc[qid, "idw_len"] == want


def test_nearest_polygon_matches_brute(points_ds):
    from cuda_gis_smoothing_ray.stages.pip import polygon_edges
    from cuda_gis_smoothing_ray.stages.spatialjoin import nearest_polygon

    ds, _ = points_ds
    out = nearest_polygon(ds).to_pandas().set_index("page_id")
    pts = ds.to_pandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    edges = polygon_edges()
    pids = sorted({e[0] for e in edges})
    best_d2 = np.full(len(lat), np.inf)
    best_pid = np.zeros(len(lat), dtype=np.int64)
    for pid in pids:
        d2p = np.full(len(lat), np.inf)
        for epid, y1, x1, y2, x2 in edges:
            if epid != pid:
                continue
            len2 = (y2 - y1) ** 2 + (x2 - x1) ** 2
            t = np.clip(((lat - y1) * (y2 - y1) + (lon - x1) * (x2 - x1)) / len2, 0.0, 1.0)
            d2p = np.minimum(d2p, (lat - (y1 + t * (y2 - y1))) ** 2 + (lon - (x1 + t * (x2 - x1))) ** 2)
        take = d2p < best_d2
        best_d2 = np.where(take, d2p, best_d2)
        best_pid = np.where(take, pid, best_pid)
    ids = pts["page_id"].to_numpy()
    assert (out.loc[ids, "poly_id"].to_numpy() == best_pid).all()
    np.testing.assert_allclose(out.loc[ids, "dist2"].to_numpy(),
                               np.floor(best_d2 * 1e6 + 0.5) / 1e6, rtol=0, atol=0)


def test_pip_anti_is_exact_complement(points_ds):
    from cuda_gis_smoothing_ray.stages.pip import pip_join
    from cuda_gis_smoothing_ray.stages.spatialjoin import pip_anti

    ds, _ = points_ds
    inside = set(pip_join(ds).to_pandas()["page_id"])
    outside = set(pip_anti(ds).to_pandas()["page_id"])
    allids = set(ds.to_pandas()["page_id"])
    assert inside | outside == allids and not (inside & outside)


def test_bbox_query_inclusive_bounds():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.spatialjoin import bbox_query

    ds = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "lat": pa.array([20.0, 50.0, 19.999, 35.0]),
                "lon": pa.array([-10.0, 30.0, 0.0, 31.0]),
                "lang": pa.array(["en", "de", "en", "fr"]),
            }
        )
    )
    out = bbox_query(ds).to_pandas()
    assert sorted(out["page_id"]) == [1, 2]  # corners in, outside out


def test_knn_haversine_matches_brute(points_ds):
    from cuda_gis_smoothing_ray.stages.knn import EARTH_R_KM, QUERY_POINTS, knn_haversine

    ds, _ = points_ds
    out = knn_haversine(ds, k=3).to_pandas()
    pts = ds.to_pandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    ids = pts["page_id"].to_numpy()
    for qid, qlat, qlon in QUERY_POINTS[:4]:
        sl = np.sin(np.radians(lat - qlat) / 2.0)
        so = np.sin(np.radians(lon - qlon) / 2.0)
        a = sl * sl + np.cos(np.radians(qlat)) * np.cos(np.radians(lat)) * (so * so)
        dkm = 2.0 * EARTH_R_KM * np.arcsin(np.sqrt(a))
        order = np.lexsort((ids, dkm))[:3]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert got["page_id"].tolist() == ids[order].tolist()
        np.testing.assert_allclose(got["dist_km"].to_numpy(),
                                   np.floor(dkm[order] * 1e6 + 0.5) / 1e6)


def test_pip_join_indexed_equals_broadcast_pip(points_ds):
    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.pip import pip_join
    from cuda_gis_smoothing_ray.stages.spatialjoin import pip_join_indexed

    ds, _ = points_ds

    def add_cell(batch):
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return batch.append_column("cell", pa.array(hexgrid.latlon_to_cell(lat, lon, 7)))

    geo = ds.map_batches(add_cell, batch_format="pyarrow")
    a = set(map(tuple, pip_join_indexed(geo, res=7).to_pandas().itertuples(index=False)))
    b = set(map(tuple, pip_join(geo).to_pandas().itertuples(index=False)))
    assert a == b and len(a) > 0


def test_pip_holes_excludes_hole_interior():
    """Planted points: outer-but-not-hole -> hit; inside the hole -> miss;
    outside -> miss.  Polygon 11 = NA box with hole (36..42, -102..-92)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.pip import pip_join_holes

    pts = pa.table({
        "page_id": pa.array([1, 2, 3], pa.int64()),
        "lat": pa.array([32.0, 38.0, 50.0], pa.float64()),
        "lon": pa.array([-100.0, -95.0, -100.0], pa.float64()),
    })
    out = pip_join_holes(rd.from_arrow(pts)).to_pandas()
    assert list(zip(out["page_id"], out["poly_id"])) == [(1, 11)]


def test_pip_holes_is_simple_pip_minus_hole(points_ds):
    """On random points: holed polygon 11 hits a subset of the same-outer
    simple polygon 1, and every excluded point lies in the hole."""
    from cuda_gis_smoothing_ray.stages.pip import pip_join, pip_join_holes

    ds, _ = points_ds
    simple = pip_join(ds).to_pandas()
    holed = pip_join_holes(ds).to_pandas()
    s1 = set(simple[simple["poly_id"] == 1]["page_id"])
    h11 = set(holed[holed["poly_id"] == 11]["page_id"])
    assert h11 <= s1 and len(h11) > 0
    excluded = s1 - h11
    assert len(excluded) > 0  # the hole is non-vacuous on 2000 points
    pts = ds.to_pandas().set_index("page_id")
    for pid in excluded:
        la, lo = pts.loc[pid, "lat"], pts.loc[pid, "lon"]
        assert 36.0 <= la <= 42.0 and -102.0 <= lo <= -92.0


def test_pip_holes_explicit_empty_polygon_set(points_ds):
    """polygons=[] means NO polygons (empty result), never the default set
    (the falsy-fallback regression)."""
    from cuda_gis_smoothing_ray.stages.pip import pip_join_holes

    ds, _ = points_ds
    out = pip_join_holes(ds, polygons=[]).to_pandas()
    assert len(out) == 0


def test_ripley_k_hand_math(ray_session):
    """3 points with pair distances 0.3 / 0.4 / 0.5; inclusive predicate
    keeps the 0.5 pair at r=0.5; K-hat = area * 2 * pairs / (n*(n-1))."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.spatialjoin import ripley_k

    ds = rd.from_arrow(pa.table({
        "page_id": pa.array([1, 2, 3], pa.int64()),
        "lat": pa.array([0.0, 0.3, 0.0]),
        "lon": pa.array([0.0, 0.0, 0.4]),
    }))
    out = ripley_k(ds).to_pandas()
    assert out["radius"].tolist() == [0.25, 0.5, 1.0]
    assert out["n_pairs"].tolist() == [0, 3, 3]
    # area = 0.3 * 0.4; k = area * 2 * 3 / (3*2) = 0.12
    assert out["k_hat"].tolist() == [0.0, 0.12, 0.12]


def test_kde_density_hand_math(ray_session):
    """Two adjacent cells, uniform k=1 weights: each cell's density is its
    own value plus the neighbor's (no normalization)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid as hg
    from cuda_gis_smoothing_ray.stages.smooth import kde_density

    cells = hg.pack(7, np.array([0, 1]), np.array([0, 0]))
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(cells),
        "page_count": pa.array([1.0, 2.0]),
    }))
    out = kde_density(ds, k=1, profile="uniform").to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    assert out["density"].tolist() == [3.0, 3.0]


def test_semivariogram_vs_brute_pairs(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid as hg
    from cuda_gis_smoothing_ray.stages.hotspot import semivariogram

    rng = np.random.default_rng(3)
    q = rng.integers(-4, 5, 40)
    r = rng.integers(-4, 5, 40)
    qr = np.unique(q * 100 + r)
    q, r = qr // 100, qr % 100
    z = rng.integers(0, 20, len(q)).astype(np.int64)
    cells = hg.pack(7, q, r)
    ds = rd.from_arrow(pa.table({"cell": pa.array(cells),
                                 "page_count": pa.array(z)})).repartition(4)
    out = semivariogram(ds, "page_count", max_d=3).to_pandas() \
        .sort_values("d").reset_index(drop=True)

    d_full = hg.hex_distance(q[:, None], r[:, None], q[None, :], r[None, :])
    for d in (1, 2, 3):
        i, j = np.nonzero(np.triu(d_full == d, 1))
        n_pairs = len(i)
        row = out[out["d"] == d].iloc[0]
        assert row["n_pairs"] == n_pairs
        if n_pairs:
            want = np.floor(((z[i] - z[j]).astype(np.float64) ** 2).sum()
                            / (2.0 * n_pairs) * 1e6 + 0.5) / 1e6
            # engine computes sum_ordered/(2*cnt_ordered) == same value
            assert abs(row["gamma"] - want) < 2e-6


def test_otsu_vs_brute(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid as hg
    from cuda_gis_smoothing_ray.stages.hotspot import otsu_threshold

    rng = np.random.default_rng(5)
    z = np.concatenate([rng.integers(0, 6, 60),
                        rng.integers(18, 25, 40)]).astype(np.int64)
    cells = hg.pack(7, np.arange(len(z)), np.zeros(len(z), np.int64))
    ds = rd.from_arrow(pa.table({"cell": pa.array(cells),
                                 "page_count": pa.array(z)})).repartition(4)
    got = otsu_threshold(ds, "page_count").to_pandas().iloc[0]

    vs = np.unique(z)
    best_t, best = None, (-1, 1)
    for t in vs[:-1]:
        a = int((z <= t).sum()); b = len(z) - a
        sa = int(z[z <= t].sum()); sb = int(z.sum()) - sa
        num, den = (sa * b - sb * a) ** 2, a * b
        if best_t is None or num * best[1] > best[0] * den:
            best_t, best = int(t), (num, den)
    assert got["threshold"] == best_t
    assert got["n_below"] == int((z <= best_t).sum())
    assert got["threshold"] < 18 and got["threshold"] >= 5  # the gap


def test_hist_equalize_hand_math(ray_session):
    import numpy as np
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid as hg
    from cuda_gis_smoothing_ray.stages.hotspot import hist_equalize

    # values 1,1,2,3: cdf 2,3,4; cmin=2, n=4 -> eq = (c-2)*255 // 2
    z = np.array([1, 1, 2, 3], np.int64)
    cells = hg.pack(7, np.arange(4), np.zeros(4, np.int64))
    ds = rd.from_arrow(pa.table({"cell": pa.array(cells),
                                 "page_count": pa.array(z)})).repartition(2)
    out = hist_equalize(ds, "page_count").to_pandas().sort_values("cell")
    assert out["eq"].tolist() == [0, 0, 127, 255]


def test_support_hull_square_cloud():
    """On an axis-aligned square of points the 16-gon support hull
    recovers the square's corners/edges and the doubled shoelace area
    equals 2 * side^2; hull area always >= bbox of any subset point."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.spatialjoin import support_hull

    # a 2x2-degree square grid of points for one tld, plus one inner point
    lats, lons, urls = [], [], []
    for la in (0.0, 2.0):
        for lo in (0.0, 2.0):
            lats.append(la); lons.append(lo)
            urls.append("https://x.com/p")
    lats.append(1.0); lons.append(1.0); urls.append("https://x.com/q")
    ds = rd.from_arrow(pa.table({
        "url": pa.array(urls), "lat": pa.array(lats, pa.float64()),
        "lon": pa.array(lons, pa.float64()),
    }))
    out = support_hull(ds).to_pandas()
    assert (out["tld"] == "com").all()
    assert len(out) == 16
    # doubled area of the square in micro-degrees^2: 2 * (2e6)^2
    assert int(out["area2"].iloc[0]) == 2 * (2 * 10**6) ** 2
    # every support vertex is one of the 4 corners (inner point never wins)
    corners = {(0, 0), (0, 2 * 10**6), (2 * 10**6, 0),
               (2 * 10**6, 2 * 10**6)}
    assert set(zip(out["x"].astype(int), out["y"].astype(int))) <= corners


def test_jitter_rose_sector_rule():
    """Known displacements land in the declared sectors: 2*quadrant +
    [|dlat| < |dlon|], zero vector in sector 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages.spatialjoin import jitter_rose

    # doc_id 0's TLD + base centroid
    idx = int(geocode.tld_index(np.array([0], np.int64))[0])
    name, blat, blon = geocode.TLD_TABLE[idx]
    # displacements: NE lat-dominant (s0), NE lon-dominant (s1), zero (s0)
    ds = rd.from_arrow(pa.table({
        "page_id": pa.array([0, 0, 0], pa.int64()),
        "lat": pa.array([blat + 2.0, blat + 1.0, blat], pa.float64()),
        "lon": pa.array([blon + 1.0, blon + 2.0, blon], pa.float64()),
    }))
    out = jitter_rose(ds).to_pandas()
    got = dict(zip(out["sector"].astype(int), out["n"].astype(int)))
    assert got == {0: 2, 1: 1}
    assert (out["tld"] == name).all()


def test_circular_stats_concentration():
    """All displacements one way -> R = 1; two opposite displacements
    cancel -> R = 0; zero displacement rows are skipped."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages.spatialjoin import circular_stats

    idx = int(geocode.tld_index(np.array([0], np.int64))[0])
    name, blat, blon = geocode.TLD_TABLE[idx]
    ds = rd.from_arrow(pa.table({
        "page_id": pa.array([0, 0, 0, 0, 0], pa.int64()),
        "lat": pa.array([blat + 1, blat + 2, blat - 1, blat + 1, blat],
                        pa.float64()),
        "lon": pa.array([blon, blon, blon, blon + 0.0, blon],
                        pa.float64()),
    }))
    out = circular_stats(ds).to_pandas()
    # vectors: +lat, +lat, -lat, +lat (unit) -> sum = 2 units of 1e6
    assert int(out["n"].iloc[0]) == 4      # the zero row dropped
    assert int(out["sum_cx"].iloc[0]) == 2 * 10**6
    assert int(out["sum_cy"].iloc[0]) == 0
    assert abs(float(out["r_len"].iloc[0]) - 0.5) < 1e-6


def test_geo_dispersion_matches_brute_pairs():
    """The moment closure equals the brute-force mean over all pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages.spatialjoin import geo_dispersion

    lats = [0.0, 1.0, 2.0, 5.0]
    lons = [0.0, 0.5, 1.0, 3.0]
    ds = rd.from_arrow(pa.table({
        "page_id": pa.array([0, 0, 0, 0], pa.int64()),
        "lat": pa.array(lats, pa.float64()),
        "lon": pa.array(lons, pa.float64()),
    }))
    out = geo_dispersion(ds).to_pandas()
    x = np.floor(np.array(lats) * 1e3 + 0.5)
    y = np.floor(np.array(lons) * 1e3 + 0.5)
    d2 = [(x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
          for i in range(4) for j in range(i + 1, 4)]
    assert abs(float(out["msd"].iloc[0]) - np.mean(d2)) < 1e-5
    assert int(out["n"].iloc[0]) == 4


def test_clark_evans_clustered_vs_grid():
    """Two tight clusters give R << 1; a regular grid gives R > 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.spatialjoin import clark_evans

    def mk(lats, lons):
        return rd.from_arrow(pa.table({
            "page_id": pa.array(np.arange(len(lats), dtype=np.int64)),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
        }))

    # clustered: 2 blobs of 8 points 0.01 deg apart, blobs 10 deg apart
    lats, lons = [], []
    for cx in (0.0, 10.0):
        for i in range(8):
            lats.append(cx + 0.01 * i)
            lons.append(cx)
    r_clu = float(clark_evans(mk(lats, lons)).to_pandas()
                  ["r_index"].iloc[0])
    # regular 4x4 grid over the same extent
    g = np.linspace(0, 10, 4)
    glats = [a for a in g for _ in g]
    glons = [b for _ in g for b in g]
    r_grid = float(clark_evans(mk(glats, glons)).to_pandas()
                   ["r_index"].iloc[0])
    assert r_clu < 0.5
    assert r_grid > 1.0


def test_median_center_outlier_immunity():
    """One far-away mention barely moves the median center while it
    would drag the mean; IQR matches the rank rule."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages.spatialjoin import median_center

    idx = int(geocode.tld_index(np.array([0], np.int64))[0])
    name, blat, blon = geocode.TLD_TABLE[idx]
    lats = [blat + 0.001 * i for i in range(9)] + [blat + 50.0]
    lons = [blon] * 10
    out = median_center(rd.from_arrow(pa.table({
        "page_id": pa.array([0] * 10, pa.int64()),
        "lat": pa.array(lats, pa.float64()),
        "lon": pa.array(lons, pa.float64()),
    }))).to_pandas()
    med = int(out["med_lat_micro"].iloc[0])
    # rank floor((10-1)/2) = 4 -> the 5th smallest = blat + 0.004
    want = int(np.floor((blat + 0.004) * 1e6 + 0.5))
    assert med == want
    assert int(out["iqr_lon_micro"].iloc[0]) == 0
