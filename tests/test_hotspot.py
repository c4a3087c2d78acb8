"""Spatial-statistics operators (stages/hotspot): Gi* hot spots, Moran's I,
DBSCAN-style density clustering — numpy oracles on hand-built grids plus
guard behavior.  The SQL oracle gate covers the sf-dir path
(``hotspot_gi`` / ``morans_i`` / ``spatial_cluster`` in ``oracle_sql()``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cuda_gis_smoothing_ray.functions import hexgrid
from cuda_gis_smoothing_ray.stages.hotspot import hotspot_gi, morans_i, spatial_cluster

RES = 7


def _cells_ds(qr_counts: dict[tuple[int, int], int]):
    import ray.data as rd

    q = np.array([k[0] for k in qr_counts], dtype=np.int64)
    r = np.array([k[1] for k in qr_counts], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "cell": pa.array(hexgrid.pack(RES, q, r)),
                "page_count": pa.array(
                    np.array(list(qr_counts.values()), dtype=np.int64)
                ),
            }
        )
    )


def _numpy_gi(qr_counts: dict[tuple[int, int], int]) -> dict[tuple[int, int], float]:
    xs = np.array(list(qr_counts.values()), dtype=np.float64)
    n, xbar = len(xs), xs.mean()
    s = np.sqrt((xs * xs).mean() - xbar * xbar)
    offs = [(0, 0)] + hexgrid.ring_offsets(1)
    out = {}
    for (q, r) in qr_counts:
        nb = [(q + dq, r + dr) for dq, dr in offs if (q + dq, r + dr) in qr_counts]
        s1 = sum(qr_counts[p] for p in nb)
        w = len(nb)
        out[(q, r)] = (s1 - xbar * w) / (s * np.sqrt((n * w - w * w) / (n - 1.0)))
    return out


def test_gi_matches_numpy_oracle():
    counts = {(0, 0): 9, (1, 0): 7, (0, 1): 6, (-1, 1): 2, (5, 5): 1, (6, 5): 1, (9, -9): 3}
    got = hotspot_gi(_cells_ds(counts), "page_count", k=1).to_pandas()
    want = _numpy_gi(counts)
    assert len(got) == len(counts)
    # NB: iterrows() would upcast the int64 cell ids to float64 (5.4e17
    # doesn't survive) — read the columns as arrays instead
    cells = got["cell"].to_numpy(dtype=np.int64)
    _, qs, rs = hexgrid.unpack(cells)
    for q, r, z in zip(qs, rs, got["gi_z"].to_numpy()):
        np.testing.assert_allclose(z, want[(int(q), int(r))], rtol=0, atol=1e-12)
    # the dense blob must be the hottest spot
    hot = int(got["gi_z"].to_numpy().argmax())
    assert (int(qs[hot]), int(rs[hot])) in {(0, 0), (1, 0), (0, 1)}


def test_gi_zero_variance_raises():
    counts = {(0, 0): 3, (1, 0): 3, (5, 5): 3}
    with pytest.raises(ValueError, match="zero variance"):
        hotspot_gi(_cells_ds(counts), "page_count", k=1)


def test_morans_i_sign():
    # clustered layout (similar values adjacent) -> strongly positive I
    clustered = {(0, 0): 10, (1, 0): 9, (0, 1): 10, (1, -1): 9,
                 (8, 8): 1, (9, 8): 2, (8, 9): 1, (9, 7): 2}
    t = morans_i(_cells_ds(clustered), "page_count", k=1)
    assert t.column("morans_i")[0].as_py() > 0.5
    # alternating high/low neighbors -> negative I
    anti = {(0, 0): 10, (1, 0): 1, (2, 0): 10, (3, 0): 1, (4, 0): 10, (5, 0): 1}
    t2 = morans_i(_cells_ds(anti), "page_count", k=1)
    assert t2.column("morans_i")[0].as_py() < 0.0
    assert t2.column("s0")[0].as_py() == 10  # 5 adjacent pairs, both directions


def test_spatial_cluster_two_blobs_and_noise():
    counts = {
        # blob A: 3 mutually-connected core cells
        (0, 0): 5, (1, 0): 4, (0, 1): 3,
        # blob B: chain of 2 core cells, separated from A
        (10, 10): 2, (11, 10): 2,
        # noise: below min_count, adjacent to blob A but excluded
        (-1, 0): 1,
        # isolated core cell -> singleton cluster
        (20, -20): 7,
    }
    got = spatial_cluster(_cells_ds(counts), min_count=2, k=1).to_pandas()
    assert len(got) == 6  # noise cell dropped
    _, qs, rs = hexgrid.unpack(got["cell"].to_numpy(dtype=np.int64))
    lab = {
        (int(q), int(r)): int(c)
        for q, r, c in zip(qs, rs, got["cluster_id"].to_numpy(dtype=np.int64))
    }
    assert lab[(0, 0)] == lab[(1, 0)] == lab[(0, 1)]
    assert lab[(10, 10)] == lab[(11, 10)]
    assert len({lab[(0, 0)], lab[(10, 10)], lab[(20, -20)]}) == 3
    # cluster id is the component's min cell id
    a_cells = [hexgrid.pack(RES, np.array([q]), np.array([r]))[0]
               for (q, r) in [(0, 0), (1, 0), (0, 1)]]
    assert lab[(0, 0)] == min(a_cells)


def test_spatial_cluster_empty_core():
    counts = {(0, 0): 1, (1, 0): 1}
    got = spatial_cluster(_cells_ds(counts), min_count=5, k=1).to_pandas()
    assert len(got) == 0


def test_grid_distance_field():
    from cuda_gis_smoothing_ray.stages.gridops import grid_distance_field

    counts = {(0, 0): 9, (3, 0): 1, (0, 4): 2, (-2, -2): 1}
    got = grid_distance_field(_cells_ds(counts)).to_pandas()
    _, qs, rs = hexgrid.unpack(got["cell"].to_numpy(dtype=np.int64))
    d = dict(zip(zip(qs.tolist(), rs.tolist()),
                 got["dist_to_hotspot"].to_numpy(dtype=np.int64).tolist()))
    # hotspot = (0,0); axial distance (|dq|+|dr|+|dq+dr|)/2
    assert d == {(0, 0): 0, (3, 0): 3, (0, 4): 4, (-2, -2): 4}


def test_grid_path_straight_line():
    from cuda_gis_smoothing_ray.stages.gridops import grid_path

    counts = {(0, 0): 9, (6, 0): 8, (2, 2): 1}
    got = grid_path(_cells_ds(counts)).to_pandas()
    _, qs, rs = hexgrid.unpack(got["cell"].to_numpy(dtype=np.int64))
    assert list(got["step"]) == list(range(7))
    assert qs.tolist() == [0, 1, 2, 3, 4, 5, 6]
    assert rs.tolist() == [0] * 7


def test_grid_path_diagonal_is_connected():
    from cuda_gis_smoothing_ray.stages.gridops import grid_path

    counts = {(0, 0): 9, (4, -7): 8, (1, 1): 1}
    got = grid_path(_cells_ds(counts)).to_pandas()
    _, qs, rs = hexgrid.unpack(got["cell"].to_numpy(dtype=np.int64))
    # consecutive path cells are hex-adjacent, endpoints exact
    steps = hexgrid.hex_distance(qs[1:], rs[1:], qs[:-1], rs[:-1])
    assert (steps == 1).all()
    assert (qs[0], rs[0]) == (0, 0) and (qs[-1], rs[-1]) == (4, -7)
    assert len(got) == int(hexgrid.hex_distance(0, 0, 4, -7)) + 1


def test_raster_morphology_hexagon_blob():
    """A filled 7-cell hexagon (center + full ring-1): erosion keeps only
    the center; dilation emits the closed ring-2 cover; counts are the
    true present-neighbor counts."""
    from cuda_gis_smoothing_ray.stages.hotspot import raster_morphology

    occ = {(0, 0): 1}
    for dq, dr in hexgrid.ring_offsets(1):
        occ[(dq, dr)] = 1
    out = raster_morphology(_cells_ds(occ), k=1).to_pandas()
    cells = dict(zip(out["cell"], zip(out["present"], out["n_nbrs"],
                                      out["eroded"])))
    center = int(hexgrid.pack(RES, np.array([0]), np.array([0]))[0])
    # center: present, all 6 neighbors present, eroded
    assert cells[center] == (1, 6, 1)
    # ring-1 members: present, NOT eroded (their own rings are incomplete)
    for dq, dr in hexgrid.ring_offsets(1):
        c = int(hexgrid.pack(RES, np.array([dq]), np.array([dr]))[0])
        present, nbrs, eroded = cells[c]
        assert present == 1 and eroded == 0 and 1 <= nbrs < 6
    # dilation = closed ring-2 cover: 1 + 6 + 12 cells
    assert len(out) == 19
    halo = out[out["present"] == 0]
    assert len(halo) == 12 and (halo["eroded"] == 0).all()


def test_isoline_cells_plateau_edge():
    """Hand raster: a 3-cell high plateau inside a low field — the inner
    contour is exactly the plateau cells adjacent to a low cell, the
    outer contour exactly the low cells adjacent to a high cell; interior
    low cells far from the plateau are silent."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.hotspot import isoline_cells

    res = 7
    # a line of 7 cells; cells 2,3,4 get value 100, the rest value 1
    qs = np.arange(7, dtype=np.int64)
    rs = np.zeros(7, dtype=np.int64)
    cells = hexgrid.pack(res, qs, rs)
    vals = np.where((qs >= 2) & (qs <= 4), 100, 1).astype(np.int64)
    ds = rd.from_arrow(pa.table({"cell": pa.array(cells),
                                 "page_count": pa.array(vals)}))
    out = isoline_cells(ds, "page_count", k=1).to_pandas()
    got = {int(r.cell): (int(r.own_hi), int(r.side))
           for r in out.itertuples()}
    c = {int(q): int(hexgrid.pack(res, np.array([q]), np.array([0]))[0])
         for q in qs}
    # mean = (3*100 + 4*1)/7 -> hi iff v*7 >= 304 -> only the 100s are hi
    assert got[c[2]] == (1, 1) and got[c[4]] == (1, 1)   # plateau edges
    # the plateau interior has only PRESENT-hi neighbors (absent cells
    # contribute neither side), so it is NOT on the contour
    assert c[3] not in got
    assert got[c[1]] == (0, 0) and got[c[5]] == (0, 0)   # outer contour
    assert c[0] not in got and c[6] not in got           # far low cells


def test_geary_c_sign_cases():
    """A smooth gradient field gives C < 1 (positive autocorrelation); a
    checkerboard gives C > 1 (negative); values match a brute-force pair
    recomputation exactly."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.hotspot import geary_c

    res = 7

    def build(vals_fn, n=6):
        qs, rs = np.meshgrid(np.arange(n), np.arange(n))
        qs, rs = qs.ravel().astype(np.int64), rs.ravel().astype(np.int64)
        cells = hexgrid.pack(res, qs, rs)
        v = vals_fn(qs, rs).astype(np.int64)
        return cells, qs, rs, v

    def brute_c(qs, rs, v):
        pos = {(int(q), int(r)): int(x) for q, r, x in zip(qs, rs, v)}
        num = s0 = 0
        for (q, r), x in pos.items():
            for dq, dr in hexgrid.ring_offsets(1):
                nb = pos.get((q + dq, r + dr))
                if nb is not None:
                    num += (x - nb) ** 2
                    s0 += 1
        n = len(pos)
        sx = sum(pos.values())
        sxx = sum(x * x for x in pos.values())
        return ((n - 1) * num * n) / (2 * s0 * (n * sxx - sx * sx))

    for fn, expect_low in (
        (lambda q, r: 10 * q + 10 * r, True),              # smooth gradient
        (lambda q, r: ((q + r) % 2) * 100, False),          # checkerboard
    ):
        cells, qs, rs, v = build(fn)
        ds = rd.from_arrow(pa.table({"cell": pa.array(cells),
                                     "page_count": pa.array(v)}))
        out = geary_c(ds, "page_count").to_pandas()
        c = float(out["geary_c"].iloc[0])
        want = brute_c(qs, rs, v)
        assert abs(c - want) < 1e-6
        assert (c < 1.0) == expect_low


def test_emerging_hotspots_classes():
    """Hand cube over 3 days, 3 cells: one always-hot (persistent), one
    hot only on the last day (emerging), one never hot on the last day
    (none) — per-day thresholds are the exact day means."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.hotspot import emerging_hotspots

    days = [np.datetime64(f"2024-01-0{d}", "us") for d in (1, 2, 3)]
    rows = []
    # day means: counts (10, 1, 1) -> mean 4 -> only the 10 clears it
    for d in days[:2]:
        rows += [(100, d, 10), (200, d, 1), (300, d, 1)]
    # last day: (10, 9, 1) -> mean 20/3 -> 10 and 9 clear it
    rows += [(100, days[2], 10), (200, days[2], 9), (300, days[2], 1)]
    cube = rd.from_arrow(pa.table({
        "cell": pa.array([r[0] for r in rows], pa.int64()),
        "day": pa.array([r[1] for r in rows]),
        "page_count": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = emerging_hotspots(cube).to_pandas().set_index("cell")
    assert int(out.loc[100, "category"]) == 2   # persistent (hot 3/3)
    assert int(out.loc[200, "category"]) == 1   # emerging (last day only)
    assert int(out.loc[300, "category"]) == 0
    assert int(out.loc[200, "days_hot"]) == 1
    assert int(out.loc[100, "days_hot"]) == 3


def test_directional_variogram_anisotropy():
    """A pure q-gradient field: gamma is positive exactly along the two
    +-(1,0) directions, zero along (0,+-1) (constant in r... the axial
    (0,1) offset changes r only — value constant), and opposite
    directions are equal by construction; cross-checked brute force."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.hotspot import directional_variogram

    res = 7
    qs, rs = np.meshgrid(np.arange(5), np.arange(5))
    qs, rs = qs.ravel().astype(np.int64), rs.ravel().astype(np.int64)
    v = (10 * qs).astype(np.int64)  # varies with q only
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(hexgrid.pack(res, qs, rs)),
        "page_count": pa.array(v)}))
    out = directional_variogram(ds, "page_count").to_pandas()
    g = {(int(r.dq), int(r.dr)): (float(r.gamma), int(r.n_pairs))
         for r in out.itertuples()}
    # opposite directions identical
    for (dq, dr), (gam, n) in g.items():
        assert g[(-dq, -dr)] == (gam, n)
    assert g[(1, 0)][0] == 50.0     # (10)^2 / 2
    assert g[(0, 1)][0] == 0.0      # value constant along r
    # diagonal (1,-1): dq=1 -> value diff 10 -> gamma 50
    assert g[(1, -1)][0] == 50.0
    # brute pair count along (1,0): 4 pairs per row x 5 rows
    assert g[(1, 0)][1] == 20


def test_moran_correlogram_decay():
    """A clustered field decays: I at lag 1 exceeds I at lag 3; lag-1 I
    equals the standalone morans_i value on the same grid (same exact
    formula, k=1 binary ring weights)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.hotspot import (moran_correlogram,
                                                       morans_i)

    clustered = {(0, 0): 10, (1, 0): 9, (0, 1): 10, (1, -1): 9,
                 (8, 8): 1, (9, 8): 2, (8, 9): 1, (9, 7): 2}
    ds = _cells_ds(clustered)
    out = moran_correlogram(ds, "page_count").to_pandas().set_index("d")
    i1 = float(out.loc[1, "morans_i"])
    i3 = float(out.loc[3, "morans_i"])
    assert i1 > 0.5
    assert i1 > i3
    t = morans_i(_cells_ds(clustered), "page_count", k=1)
    assert abs(i1 - t.column("morans_i")[0].as_py()) < 1e-6


def test_join_counts_checkerboard_vs_stripe():
    """A checkerboard coloring is all-BW on the probed directions; a
    half/half stripe has exactly one BW edge per boundary row; edge
    enumeration counts each undirected edge once."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.hotspot import join_counts

    def mk(qs, rs, langs):
        res = 7
        cells = (np.int64(res) << np.int64(56)) \
            + (np.asarray(qs, np.int64) + hexgrid.OFF) * (1 << 28) \
            + (np.asarray(rs, np.int64) + hexgrid.OFF)
        return rd.from_arrow(pa.table({
            "cell": pa.array(cells), "lang": pa.array(langs)}))

    # 1-D strip of 4 cells along +q: colors B W B W (checkerboard)
    out = join_counts(mk([0, 1, 2, 3], [0, 0, 0, 0],
                         ["en", "de", "en", "de"])).to_pandas()
    assert int(out["edges"].iloc[0]) == 3
    assert int(out["bb"].iloc[0]) == 0
    assert int(out["ww"].iloc[0]) == 0
    assert int(out["bw"].iloc[0]) == 3

    # stripe: B B W W -> one BW boundary edge
    out2 = join_counts(mk([0, 1, 2, 3], [0, 0, 0, 0],
                          ["en", "en", "de", "de"])).to_pandas()
    assert int(out2["bw"].iloc[0]) == 1
    assert int(out2["bb"].iloc[0]) == 1
    assert int(out2["ww"].iloc[0]) == 1


def test_mst_cells_matches_kruskal():
    """The Boruvka forest equals a driver Kruskal with union-find under
    the same (wt, u, w) total order, on the real sf0.001 cell graph."""
    import numpy as np

    from cuda_gis_smoothing_ray.stages.hotspot import mst_cells
    import __ray_entry__ as entry

    out = mst_cells(entry._geocoded("/root/testdata/sf0.001")) \
        .to_pandas()
    # rebuild the same edge list from the engine output universe is not
    # enough (MST edges only) -> recompute nodes/edges directly
    from cuda_gis_smoothing_ray.functions.reduce import hash_groupby
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(uniq),
                         "pages": pa.array(cnt.astype(np.int64))})

    cells = hash_groupby(
        entry._geocoded("/root/testdata/sf0.001")
        .map_batches(partial, batch_format="pyarrow"),
        "cell", ["pages"], how="isum",
    ).to_pandas().sort_values("cell")
    nodes = cells["cell"].to_numpy(np.int64)
    pc = cells["pages"].to_numpy(np.int64)
    n = len(nodes)
    edges = []
    for dq, dr in ((1, 0), (0, 1), (1, -1)):
        nbr = nodes + dq * (np.int64(1) << np.int64(28)) + dr
        idx = np.searchsorted(nodes, nbr)
        ok = (idx < n) & (nodes[np.minimum(idx, n - 1)] == nbr)
        for i, j in zip(np.flatnonzero(ok), idx[ok]):
            edges.append((abs(int(pc[i]) - int(pc[j])),
                          int(nodes[i]), int(nodes[j])))
    edges.sort()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    pos = {int(c): i for i, c in enumerate(nodes)}
    for wt, u, w in edges:
        ru, rw = find(pos[u]), find(pos[w])
        if ru != rw:
            parent[ru] = rw
            want.add((u, w, wt))
    got = set(zip(out["u"].astype(int), out["w"].astype(int),
                  out["wt"].astype(int)))
    assert got == want
    assert len(got) > 50  # non-vacuous forest


def test_cell_lang_shift_flip_and_tie():
    """A flipped majority is reported; identical majorities are not;
    ties break to the lexically smallest language on both halves."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.hotspot import cell_lang_shift

    # cell 5: even half en-majority, odd half de-majority -> flip
    # cell 9: both halves en -> no row
    # cell 7: odd half ties en/de -> majority 'de' (lex) -> flip vs en
    rows = [
        (5, 0, "en"), (5, 2, "en"), (5, 4, "de"),
        (5, 1, "de"), (5, 3, "de"), (5, 5, "en"),
        (9, 0, "en"), (9, 1, "en"),
        (7, 0, "en"), (7, 1, "en"), (7, 3, "de"),
    ]
    t = pa.table({
        "cell": pa.array([r[0] for r in rows], pa.int64()),
        "page_id": pa.array([r[1] for r in rows], pa.int64()),
        "lang": pa.array([r[2] for r in rows]),
    })
    out = cell_lang_shift(rd.from_arrow(t)).to_pandas().set_index("cell")
    assert list(out.index) == [5, 7]
    assert out.loc[5, "lang_a"] == "en" and out.loc[5, "lang_b"] == "de"
    assert out.loc[7, "lang_a"] == "en" and out.loc[7, "lang_b"] == "de"


def test_cell_lang_entropy_bounds():
    """Monolingual cell -> 0; an even 2-lang cell -> ln(2) micro-nats."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.hotspot import cell_lang_entropy

    t = pa.table({
        "cell": pa.array([1, 1, 2, 2], pa.int64()),
        "lang": pa.array(["en", "en", "en", "de"]),
    })
    out = cell_lang_entropy(rd.from_arrow(t)).to_pandas().set_index("cell")
    assert int(out.loc[1, "h_micro"]) == 0
    assert abs(int(out.loc[2, "h_micro"]) - round(np.log(2) * 1e6)) <= 2


def test_isolated_cells_probe():
    """A lone far cell is isolated; adjacent cells are not; an empty
    isolate set keeps its schema (pandas return)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.stages.hotspot import isolated_cells

    res = 9

    def cellid(q, r):
        return int((np.int64(res) << np.int64(56))
                   + (q + hexgrid.OFF) * (1 << 28) + (r + hexgrid.OFF))

    ds = rd.from_arrow(pa.table({
        "cell": pa.array([cellid(0, 0), cellid(1, 0), cellid(50, 50)],
                         pa.int64()),
    }))
    out = isolated_cells(ds)
    assert out["cell"].tolist() == [cellid(50, 50)]

    pair = rd.from_arrow(pa.table({
        "cell": pa.array([cellid(0, 0), cellid(1, 0)], pa.int64())}))
    empty = isolated_cells(pair)
    assert list(empty.columns) == ["cell", "pages"]
    assert len(empty) == 0
