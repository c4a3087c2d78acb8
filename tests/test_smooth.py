"""Smoothing-kernel invariants vs a literal numpy gather oracle — the
reference's cross-implementation equivalence gate (SURVEY §5, tolerance model
<=1e-4, observed 1e-6; we assert far tighter)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cuda_gis_smoothing_ray.functions import hexgrid as hg
from cuda_gis_smoothing_ray.functions.weights import ring_weights
from cuda_gis_smoothing_ray.stages.smooth import neighbor_counts, smooth_cells


def make_cells(n=400, res=7, seed=5, with_isolates=True):
    """Random hex patch: a clustered blob (dense adjacency) + far-away
    isolated cells (0 present neighbors — the boundary case; reference
    dataset has min=0 neighbors)."""
    rng = np.random.default_rng(seed)
    q = rng.integers(-12, 12, n)
    r = rng.integers(-12, 12, n)
    if with_isolates:
        # isolated cells: far apart so no ring-2 overlap
        iso = np.arange(8) * 100 + 1000
        q = np.concatenate([q, iso])
        r = np.concatenate([r, iso])
    cell = hg.pack(res, q, r)
    cell, idx = np.unique(cell, return_index=True)
    vals = rng.uniform(0.0, 1.0, len(cell))
    return pa.table({"cell": pa.array(cell), "v": pa.array(vals)})


def numpy_gather_oracle(tbl: pa.Table, value_cols, k, profile):
    """Literal transcription of hex_smooth_naive.cpp:65-83: per-cell gather
    over present neighbors, weighted mean."""
    cell = tbl.column("cell").to_numpy()
    _, q, r = hg.unpack(cell)
    pos = {(int(qq), int(rr)): i for i, (qq, rr) in enumerate(zip(q, r))}
    w = ring_weights(profile, k)
    offs = [((0, 0), w[0])]
    for ring in range(1, k + 1):
        offs += [(o, w[ring]) for o in hg.ring_offsets(ring)]
    out = {c: np.zeros(len(cell)) for c in value_cols}
    vals = {c: tbl.column(c).to_numpy().astype(np.float64) for c in value_cols}
    for i in range(len(cell)):
        wsum = 0.0
        acc = {c: 0.0 for c in value_cols}
        for (dq, dr), wt in offs:
            j = pos.get((int(q[i]) + dq, int(r[i]) + dr))
            if j is not None:
                wsum += wt
                for c in value_cols:
                    acc[c] += wt * vals[c][j]
        for c in value_cols:
            out[c][i] = acc[c] / wsum
    return cell, out


@pytest.mark.parametrize("k,profile", [(1, "uniform"), (1, "gaussian"), (2, "uniform"), (2, "gaussian")])
def test_smooth_matches_numpy_oracle(k, profile):
    import ray.data as rd

    tbl = make_cells()
    got = smooth_cells(rd.from_arrow(tbl), ["v"], k=k, profile=profile).to_pandas()
    got = got.sort_values("cell").reset_index(drop=True)
    cells, oracle = numpy_gather_oracle(tbl, ["v"], k, profile)
    order = np.argsort(cells)
    assert (got["cell"].to_numpy() == cells[order]).all()
    np.testing.assert_allclose(got["v_sm"].to_numpy(), oracle["v"][order], rtol=0, atol=1e-9)


def test_isolated_cell_passes_through():
    """Invariant 5.2: a cell with zero present neighbors outputs its input."""
    import ray.data as rd

    tbl = make_cells(n=50, with_isolates=True)
    got = smooth_cells(rd.from_arrow(tbl), ["v"], k=2, profile="gaussian").to_pandas()
    src = tbl.to_pandas().set_index("cell")["v"]
    # the constructed isolates (far from the blob and from each other)
    iso = np.arange(8) * 100 + 1000
    isolated = hg.pack(7, iso, iso)
    assert set(isolated) <= set(src.index)
    for c in isolated:
        row = got[got.cell == c]
        assert abs(float(row["v_sm"].iloc[0]) - float(src[c])) < 1e-12


def test_fused_equals_per_variable():
    """Invariant 5.4 (v1-vs-v4 fusion equivalence): smoothing 4 columns in one
    shuffle equals four single-column runs; extra columns are the reference's
    affine synthesis (hex_smooth_cuda_v4.cu:359-363)."""
    import ray.data as rd

    tbl = make_cells(n=200)
    v = tbl.column("v").to_numpy().astype(np.float64)
    tbl = tbl.append_column("mndwi", pa.array(0.9 * v + 0.05))
    tbl = tbl.append_column("evi", pa.array(1.1 * v - 0.05))
    tbl = tbl.append_column("ndwi", pa.array(0.95 * v))
    cols = ["v", "mndwi", "evi", "ndwi"]
    fused = smooth_cells(rd.from_arrow(tbl), cols, k=1, profile="gaussian").to_pandas().sort_values("cell")
    for c in cols:
        single = smooth_cells(rd.from_arrow(tbl), [c], k=1, profile="gaussian").to_pandas().sort_values("cell")
        np.testing.assert_allclose(
            fused[f"{c}_sm"].to_numpy(), single[f"{c}_sm"].to_numpy(), rtol=0, atol=1e-12
        )


def test_salted_equals_unsalted():
    """Invariant 8: explicit two-phase salted aggregation == direct path."""
    import ray.data as rd

    tbl = make_cells(n=300, seed=11)
    a = smooth_cells(rd.from_arrow(tbl), ["v"], k=1, profile="gaussian", salted=False).to_pandas().sort_values("cell")
    b = smooth_cells(rd.from_arrow(tbl), ["v"], k=1, profile="gaussian", salted=True).to_pandas().sort_values("cell")
    assert (a.cell.to_numpy() == b.cell.to_numpy()).all()
    np.testing.assert_allclose(a.v_sm.to_numpy(), b.v_sm.to_numpy(), rtol=0, atol=1e-12)


def test_partitioning_invariance():
    """Invariant 6 analog: result independent of block structure (the
    reference's permutation round-trip, SURVEY §5 inv 3)."""
    import ray.data as rd

    tbl = make_cells(n=500, seed=13)
    base = smooth_cells(rd.from_arrow(tbl), ["v"], k=1, profile="gaussian").to_pandas().sort_values("cell")
    re = smooth_cells(rd.from_arrow(tbl).repartition(17), ["v"], k=1, profile="gaussian").to_pandas().sort_values("cell")
    np.testing.assert_allclose(base.v_sm.to_numpy(), re.v_sm.to_numpy(), rtol=0, atol=1e-9)


def test_neighbor_counts_match_oracle():
    import ray.data as rd

    tbl = make_cells(n=300, seed=17)
    got = neighbor_counts(rd.from_arrow(tbl)).to_pandas().set_index("cell")["n_neighbors"]
    cell = tbl.column("cell").to_numpy()
    _, q, r = hg.unpack(cell)
    present = set(zip(q.tolist(), r.tolist()))
    for i, c in enumerate(cell):
        expect = sum((q[i] + dq, r[i] + dr) in present for dq, dr in hg.RING1)
        assert got[c] == expect


def test_enrich_pages_stamps_cell_smoothed_value():
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.smooth import enrich_pages, smooth_cells

    rng = np.random.default_rng(5)
    lat = rng.uniform(-40, 40, 400)
    lon = rng.uniform(-100, 100, 400)
    cell = hexgrid.latlon_to_cell(lat, lon, 6)
    res, q, r = hexgrid.unpack(cell)
    geo = rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(400, dtype=np.int64)),
        "cell": pa.array(cell),
    }))
    import pandas as pd

    cells_pd = pd.DataFrame({"cell": cell, "q": q, "r": r, "v": rng.normal(size=400)})
    cells_pd = cells_pd.groupby(["cell", "q", "r"], as_index=False)["v"].mean()
    cells = rd.from_arrow(pa.Table.from_pandas(cells_pd, preserve_index=False))
    sm = smooth_cells(cells, ["v"], k=1, profile="uniform").to_pandas()
    sm["v_sm"] = np.floor(sm["v_sm"].to_numpy() * 1e6 + 0.5) / 1e6
    want = sm.set_index("cell")["v_sm"]
    out = enrich_pages(geo, cells, ["v"], k=1, profile="uniform").to_pandas()
    assert len(out) == 400
    # NB: iterrows would coerce the int64 cell id to float64 (> 2^53) and
    # corrupt the key — compare vectorized on the exact ints
    want_v = np.floor(want.loc[out["cell"].to_numpy()].to_numpy() * 1e6 + 0.5) / 1e6
    np.testing.assert_array_equal(out["v_sm"].to_numpy(), want_v)


def test_enrich_pages_shuffle_join_arm_matches_broadcast():
    """Size gate: with broadcast_max_cells=0 every cell table takes the
    cell-keyed shuffle-join path; output must be identical (values AND
    rounding) to the broadcast arm on the same input."""
    import pandas as pd
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.smooth import enrich_pages

    rng = np.random.default_rng(11)
    lat = rng.uniform(-40, 40, 600)
    lon = rng.uniform(-100, 100, 600)
    cell = hexgrid.latlon_to_cell(lat, lon, 8)  # high res: many distinct cells
    res, q, r = hexgrid.unpack(cell)
    geo = rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(600, dtype=np.int64)),
        "cell": pa.array(cell),
    }))
    cells_pd = pd.DataFrame({"cell": cell, "q": q, "r": r, "v": rng.normal(size=600)})
    cells_pd = cells_pd.groupby(["cell", "q", "r"], as_index=False)["v"].mean()
    cells = rd.from_arrow(pa.Table.from_pandas(cells_pd, preserve_index=False))

    bcast = (enrich_pages(geo, cells, ["v"], k=1, profile="gaussian")
             .to_pandas().sort_values("page_id").reset_index(drop=True))
    shuf = (enrich_pages(geo, cells, ["v"], k=1, profile="gaussian",
                         broadcast_max_cells=0)
            .to_pandas().sort_values("page_id").reset_index(drop=True))
    assert list(shuf.columns) == list(bcast.columns)
    np.testing.assert_array_equal(shuf["cell"].to_numpy(), bcast["cell"].to_numpy())
    np.testing.assert_array_equal(shuf["v_sm"].to_numpy(), bcast["v_sm"].to_numpy())


def test_hex_gradient_matches_numpy_oracle(ray_session):
    """hex_gradient == per-cell max |v_n - v_c| over present ring-1
    neighbors (brute-force gather oracle); neighborless cells emit no row."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.smooth import hex_gradient

    tbl = make_cells(n=300, seed=11)
    cell = tbl.column("cell").to_numpy()
    v = tbl.column("v").to_numpy()
    _, q, r = hg.unpack(cell)
    pos = {(int(qq), int(rr)): i for i, (qq, rr) in enumerate(zip(q, r))}
    want = {}
    for i in range(len(cell)):
        diffs = []
        for dq, dr in hg.ring_offsets(1):
            j = pos.get((int(q[i]) + dq, int(r[i]) + dr))
            if j is not None:
                diffs.append(abs(v[j] - v[i]))
        if diffs:
            want[int(cell[i])] = (len(diffs), max(diffs))

    out = hex_gradient(rd.from_arrow(tbl).repartition(5), "v").to_pandas()
    got = {int(c): (int(n), g) for c, n, g in
           zip(out["cell"], out["n_neighbors"], out["grad"])}
    assert set(got) == set(want)
    for c, (n, g) in want.items():
        assert got[c][0] == n
        assert got[c][1] == pytest.approx(g, abs=0, rel=0)  # bit-exact


def test_smooth_residuals_flags_spike():
    """A single spiked cell in a flat field carries the largest
    |raw - smoothed| residual and is always selected."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.smooth import smooth_residuals

    # 5x5 axial block, flat value 10 except a spike of 100 at (2, 2)
    qs, rs, vals = [], [], []
    for q in range(5):
        for r in range(5):
            qs.append(q)
            rs.append(r)
            vals.append(100 if (q, r) == (2, 2) else 10)
    res = 7
    cells = (np.int64(res) << np.int64(56)) \
        + (np.asarray(qs, np.int64) + hexgrid.OFF) * (1 << 28) \
        + (np.asarray(rs, np.int64) + hexgrid.OFF)
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(cells),
        "page_count": pa.array(vals, pa.int64()),
    }))
    out = smooth_residuals(ds).to_pandas()
    spike_cell = int(cells[2 * 5 + 2])
    assert spike_cell in set(out["cell"].astype(int))
    row = out[out["cell"] == spike_cell].iloc[0]
    assert int(row["resid_micro"]) == out["resid_micro"].abs().max()


def test_choropleth_classes_equal_counts():
    """Classes are equal-count quartiles; tie cells split by cell id
    deterministically."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.smooth import choropleth_classes

    # 8 isolated cells far apart: smoothing leaves values unchanged
    qs = [10 * i for i in range(8)]
    res = 7
    cells = (np.int64(res) << np.int64(56)) \
        + (np.asarray(qs, np.int64) + hexgrid.OFF) * (1 << 28) \
        + hexgrid.OFF
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(cells),
        "page_count": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
    }))
    out = choropleth_classes(ds).to_pandas().sort_values("sm_micro")
    assert out["cls"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4]
