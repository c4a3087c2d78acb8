"""Grid-level operator tests: multi-resolution encode, raster->vector tiles,
scalable top-k, deterministic sampling (stages/gridops.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cuda_gis_smoothing_ray.functions import hexgrid as hg
from cuda_gis_smoothing_ray.stages import gridops


def _geocoded(sf_dir):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode

    return geo_encode(read_pages(sf_dir, include_html=False), res=7)


def test_multires_counts_consistency(sf_dir):
    df = gridops.multires_counts(_geocoded(sf_dir)).to_pandas()
    # every resolution present; ids carry their res in the top byte
    assert sorted(df["res"].unique()) == list(range(hg.RES_MIN, hg.RES_MAX + 1))
    assert ((df["cell"].to_numpy() >> 56) == df["res"].to_numpy()).all()
    # each res partitions the same page set: per-res totals all equal
    totals = df.groupby("res")["page_count"].sum()
    assert totals.nunique() == 1
    # coarser res -> no more cells than finer res
    n_cells = df.groupby("res")["cell"].count()
    assert (n_cells.diff().dropna() >= 0).all()


def test_multires_parent_rollup(sf_dir):
    """Resolution round-trip: re-encoding a fine cell's center at a coarser
    res lands in a cell that the coarse level actually produced."""
    df = gridops.multires_counts(_geocoded(sf_dir)).to_pandas()
    fine = df[df["res"] == 9]["cell"].to_numpy()
    for coarse_res in (5, 7, 8):
        coarse = set(df[df["res"] == coarse_res]["cell"].to_numpy())
        lat, lon = hg.cell_to_latlon(fine)
        parents = hg.latlon_to_cell(lat, lon, coarse_res)
        frac = np.mean([p in coarse for p in parents])
        # hex grids don't nest: a fine cell's CENTER can cross into a coarse
        # cell none of its pages occupy, so this is a statistical round-trip
        # (the exact per-page encode identity is the multires_cells oracle)
        assert frac > 0.85


def test_tile_vector_bounds(sf_dir):
    geo = _geocoded(sf_dir)
    tiles = gridops.tile_vector(geo, zoom=6).to_pandas()
    pts = geo.select_columns(["lat", "lon"]).to_pandas()
    assert tiles["page_count"].sum() == len(pts)
    assert (tiles["west"] < tiles["east"]).all()
    assert (tiles["south"] < tiles["north"]).all()
    n = 1 << 6
    assert (tiles["tile_id"] == tiles["tile_y"] * n + tiles["tile_x"]).all()
    # spot-check: every point lies inside its tile's polygon
    tx = np.floor((pts["lon"].to_numpy() + 180.0) / 360.0 * n).astype(np.int64)
    ty = np.floor((90.0 - pts["lat"].to_numpy()) / 180.0 * n).astype(np.int64)
    m = tiles.set_index("tile_id")
    tid = ty * n + tx
    assert (pts["lon"].to_numpy() >= m.loc[tid, "west"].to_numpy()).all()
    assert (pts["lon"].to_numpy() < m.loc[tid, "east"].to_numpy()).all()


def test_topk_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.integers(0, 1000, 5000), "v": rng.integers(0, 50, 5000)})
    ds = rd.from_pandas(df).repartition(8)
    got = gridops.topk(ds, 25, by="v", tie_cols=("k",)).to_pandas()
    want = df.sort_values(["v", "k"], ascending=[False, True], kind="mergesort").head(25)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    assert got["rank"].tolist() == list(range(1, 26))


def test_sample_hash_deterministic(sf_dir):
    from cuda_gis_smoothing_ray.sources.pages import read_pages

    pages = read_pages(sf_dir, include_html=False).select_columns(["page_id"])
    a = gridops.sample_hash(pages, "page_id", 150_000).to_pandas()
    b = gridops.sample_hash(pages, "page_id", 150_000).to_pandas()
    assert sorted(a["page_id"]) == sorted(b["page_id"])
    n_total = pages.count()
    # Bernoulli(0.15): loose 3-sigma-ish band
    assert 0.05 < len(a) / n_total < 0.30
    # nested samples: smaller keep rate is a subset of larger
    c = gridops.sample_hash(pages, "page_id", 50_000).to_pandas()
    assert set(c["page_id"]).issubset(set(a["page_id"]))


def test_grouped_topk_matches_pandas(ray_session):
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import grouped_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abcd"), 8000),
            "k": rng.integers(0, 40, 8000).astype(str),
        }
    )
    got = (
        grouped_topk(rd.from_pandas(df).repartition(6), "g", "k", "n", k=3)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want_rows = []
    for g, sub in df.groupby("g"):
        c = sub.groupby("k").size().reset_index(name="n")
        c = c.sort_values(["n", "k"], ascending=[False, True], kind="mergesort").head(3)
        for r, (_, row) in enumerate(c.iterrows(), 1):
            want_rows.append((g, r, row["k"], row["n"]))
    want = pd.DataFrame(want_rows, columns=["g", "rank", "k", "n"])
    pd.testing.assert_frame_equal(got[["g", "rank", "k", "n"]], want)


def test_stratified_sample_rates(sf_dir):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import stratified_sample

    n = 20000
    tbl = pa.table(
        {
            "page_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array((["en"] * 3 + ["sw"])[i % 4] for i in range(n)),
        }
    )
    out = stratified_sample(
        rd.from_arrow(tbl), "lang", "page_id",
        {"en": 100_000, "sw": 1_000_000}, default_ppm=0,
    ).to_pandas()
    by = out.groupby("lang").size()
    assert by["sw"] == n // 4  # ppm=1e6 keeps every row of the rare stratum
    assert 0.05 < by["en"] / (3 * n / 4) < 0.15  # ~10% of the dominant one
    # deterministic: same rows on a re-run
    out2 = stratified_sample(
        rd.from_arrow(tbl), "lang", "page_id",
        {"en": 100_000, "sw": 1_000_000}, default_ppm=0,
    ).to_pandas()
    assert sorted(out["page_id"]) == sorted(out2["page_id"])


def _tiny_geocoded():
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid

    rng = np.random.default_rng(7)
    lat = rng.uniform(-60, 60, 300)
    lon = rng.uniform(-170, 170, 300)
    return rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(np.arange(300, dtype=np.int64)),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
                "cell": pa.array(hexgrid.latlon_to_cell(lat, lon, 7)),
            }
        )
    ), lat, lon


def test_cell_boundary_vertices_ring_the_center():
    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.gridops import cell_boundary

    ds, lat, lon = _tiny_geocoded()
    out = cell_boundary(ds).to_pandas()
    assert set(out["vertex"]) == set(range(6))
    cells = np.unique(hexgrid.latlon_to_cell(lat, lon, 7))
    assert set(out["cell"]) == set(cells.tolist())
    assert len(out) == 6 * len(cells)
    # every vertex is exactly edge-length from its cell center (circumradius)
    res, q, r = hexgrid.unpack(out["cell"].to_numpy())
    clat, clon = hexgrid.axial_to_latlon(q, r, 7)
    d = np.sqrt((out["vlat"].to_numpy() - clat) ** 2 + (out["vlon"].to_numpy() - clon) ** 2)
    np.testing.assert_allclose(d, hexgrid.edge_size(7), rtol=1e-5)


def test_cell_parent_rollup_preserves_page_total():
    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.gridops import cell_parent_rollup

    ds, lat, lon = _tiny_geocoded()
    out = cell_parent_rollup(ds, parent_res=6).to_pandas()
    assert out["n_pages"].sum() == 300
    cells = np.unique(hexgrid.latlon_to_cell(lat, lon, 7))
    assert out["n_children"].sum() == len(cells)
    assert ((out["parent_cell"].to_numpy() >> 56) == 6).all()


def test_grid_disk_matches_kring():
    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.gridops import grid_disk

    ds, lat, lon = _tiny_geocoded()
    out = grid_disk(ds, k=2).to_pandas()
    cells = np.unique(hexgrid.latlon_to_cell(lat, lon, 7))
    assert len(out) == len(cells) * 19  # 1 + 6 + 12
    one = out[out["cell"] == cells[0]]
    want = set(hexgrid.kring_cells(cells[:1], 2)[0].tolist())
    assert set(one["neighbor"]) == want
    assert (one["ring"] <= 2).all() and (one["ring"].value_counts().sort_index() == [1, 6, 12]).all()


def test_geohash_matches_reference_algorithm():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import geohash_encode

    # reference bit-bisection geohash (classic algorithm, independent impl)
    def ref_geohash(lat, lon, precision=6):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even = 0, [], True
        ch = 0
        while len(out) < precision:
            rng, v = (lon_rng, lon) if even else (lat_rng, lat)
            mid = (rng[0] + rng[1]) / 2
            ch = (ch << 1) | (1 if v >= mid else 0)
            rng[0 if v >= mid else 1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(b32[ch])
                bits, ch = 0, 0
        return "".join(out)

    pts = [(48.8566, 2.3522), (40.7128, -74.0060), (-33.8688, 151.2093), (0.0, 0.0)]
    ds = rd.from_items(
        [{"page_id": i, "lat": la, "lon": lo} for i, (la, lo) in enumerate(pts)]
    )
    out = geohash_encode(ds).to_pandas().sort_values("page_id")
    for i, (la, lo) in enumerate(pts):
        assert out["geohash"].iloc[i] == ref_geohash(la, lo), (la, lo)


def test_spatial_thin_argmin_payload():
    """The representative is the min page_id per cell and its OWN
    coordinates ride along; counts are per-cell totals across batches."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.gridops import spatial_thin

    t = pa.table({
        "cell": pa.array([5, 5, 5, 9], pa.int64()),
        "page_id": pa.array([30, 10, 20, 7], pa.int64()),
        "lat": pa.array([3.0, 1.0, 2.0, 9.0], pa.float64()),
        "lon": pa.array([30.0, 10.0, 20.0, 90.0], pa.float64()),
    })
    out = spatial_thin(rd.from_arrow(t)).to_pandas().set_index("cell")
    assert int(out.loc[5, "page_id"]) == 10
    assert float(out.loc[5, "lat"]) == 1.0   # the winner's payload
    assert int(out.loc[5, "n_in_cell"]) == 3
    assert int(out.loc[9, "n_in_cell"]) == 1
