"""Reference .bin format round-trip + explicit-adjacency graph smoothing
vs the literal reference-loop oracle and vs the k-ring engine."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    from cuda_gis_smoothing_ray.sources.hexbin import make_demo_grid, write_hexbin

    t = make_demo_grid(n_side=20)
    p = str(tmp_path_factory.mktemp("bin") / "hex_data.bin")
    write_hexbin(t, p)
    return p, t


def test_hexbin_roundtrip(demo_bin):
    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin_table, write_hexbin

    path, t = demo_bin
    back = read_hexbin_table(path)
    assert back.num_rows == t.num_rows
    assert np.allclose(
        back.column("ndvi").to_numpy(zero_copy_only=False),
        t.column("ndvi").to_numpy(zero_copy_only=False),
        rtol=0, atol=1e-7,  # float32 storage, reference's own width
    )
    assert back.column("neighbors").to_pylist() == t.column("neighbors").to_pylist()
    # byte-exact re-write
    import os
    p2 = path + ".rt"
    write_hexbin(back, p2)
    assert open(path, "rb").read() == open(p2, "rb").read()
    os.remove(p2)


@pytest.mark.parametrize("profile", ["uniform", "gaussian"])
def test_graph_smooth_matches_reference_loop(demo_bin, profile):
    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin
    from cuda_gis_smoothing_ray.stages.graph_smooth import (
        graph_smooth,
        graph_smooth_numpy,
    )

    path, _ = demo_bin
    ds = read_hexbin(path)
    got = graph_smooth(ds, profile=profile).to_pandas().sort_values("cell_idx")
    # oracle over the PARSED values (the .bin stores float32, like the ref)
    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin_table

    t = read_hexbin_table(path)
    want = graph_smooth_numpy(
        np.asarray(t.column("ndvi").to_numpy(zero_copy_only=False), dtype=np.float64),
        t.column("neighbors").to_pylist(),
        profile=profile,
    )
    # reference gate: max abs diff <= 1e-4 (scripts/case-study.sh:130-134);
    # float64 end-to-end should be ~1e-12
    assert len(got) == len(want)
    diff = np.abs(got["smoothed"].to_numpy() - want[got["cell_idx"].to_numpy()])
    assert diff.max() <= 1e-4 and diff.max() <= 1e-9


def test_dangling_and_isolated_cells():
    """M1 bounds semantics: out-of-range ids contribute nothing; 0-neighbor
    cells pass through unchanged (reference invariant 5.2)."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.graph_smooth import graph_smooth

    t = pa.table(
        {
            "cell_idx": pa.array([0, 1, 2], pa.int64()),
            "ndvi": pa.array([1.0, 3.0, 5.0]),
            "neighbors": pa.array([[1, 99, -7], [0], []], pa.list_(pa.int32())),
        }
    )
    out = graph_smooth(rd.from_arrow(t), profile="uniform").to_pandas().sort_values("cell_idx")
    assert np.allclose(out["smoothed"].to_numpy(), [2.0, 2.0, 5.0])


def test_graph_smooth_equals_kring_engine_on_derived_adjacency(sf_dir):
    """Bridge: feeding the k-ring-derived adjacency of the real cell table
    through the explicit-graph path reproduces stages/smooth.py."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions import hexgrid
    from cuda_gis_smoothing_ray.pipelines.flagship import cell_metrics
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.stages.graph_smooth import graph_smooth
    from cuda_gis_smoothing_ray.stages.smooth import smooth_cells

    cells = cell_metrics(geo_encode(read_pages(sf_dir, include_html=False), res=6)).to_pandas()
    cell_ids = cells["cell"].to_numpy()
    id_to_idx = {int(c): i for i, c in enumerate(cell_ids)}
    ring = hexgrid.kring_cells(cell_ids.astype(np.uint64), 1, include_center=False)
    neighbors = [
        [id_to_idx[int(c)] for c in row if int(c) in id_to_idx] for row in ring
    ]
    t = pa.table(
        {
            "cell_idx": pa.array(np.arange(len(cells), dtype=np.int64)),
            "ndvi": pa.array(cells["chars_mean"].to_numpy()),
            "neighbors": pa.array(neighbors, pa.list_(pa.int32())),
        }
    )
    via_graph = graph_smooth(rd.from_arrow(t), profile="gaussian").to_pandas().sort_values("cell_idx")
    via_kring = (
        smooth_cells(
            rd.from_arrow(pa.Table.from_pandas(cells[["cell", "chars_mean"]], preserve_index=False)),
            ["chars_mean"], k=1, profile="gaussian",
        )
        .to_pandas()
        .sort_values("cell")
    )
    # align: via_graph row i corresponds to cells row i (cell_ids[i]);
    # via_kring is sorted by cell id
    order = np.argsort(cell_ids)
    got_sorted = via_graph["smoothed"].to_numpy()[order]
    assert np.allclose(got_sorted, via_kring["chars_mean_sm"].to_numpy(), rtol=0, atol=1e-9)


@pytest.mark.parametrize("profile", ["uniform", "gaussian"])
def test_graph_smooth_ring2_matches_reference_loop(demo_bin, profile):
    """Both-orders smoothing on an explicit graph: the distributed 2nd-order
    derivation + smoothing must match the literal v5 transcription
    (hex_smooth_cuda_v5.cu:146-170 + :423-463) to 1e-9 (gate 1e-4)."""
    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin, read_hexbin_table
    from cuda_gis_smoothing_ray.stages.graph_smooth import (
        graph_smooth,
        graph_smooth_numpy,
    )

    path, _ = demo_bin
    got = (
        graph_smooth(read_hexbin(path), profile=profile, k=2)
        .to_pandas()
        .sort_values("cell_idx")
    )
    t = read_hexbin_table(path)
    want = graph_smooth_numpy(
        np.asarray(t.column("ndvi").to_numpy(zero_copy_only=False), dtype=np.float64),
        t.column("neighbors").to_pylist(),
        profile=profile,
        k=2,
    )
    assert len(got) == len(want)
    diff = np.abs(got["smoothed"].to_numpy() - want[got["cell_idx"].to_numpy()])
    assert diff.max() <= 1e-9


def test_second_order_edges_match_reference_derivation(demo_bin):
    """Distributed ring-2 derivation == the v5 std::set transcription,
    including dedup / self-exclusion / ring-1-exclusion / 12-truncation."""
    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin, read_hexbin_table
    from cuda_gis_smoothing_ray.stages.graph_smooth import (
        second_order_edges,
        second_order_numpy,
    )

    path, _ = demo_bin
    got = second_order_edges(read_hexbin(path)).to_pandas()
    got_map = {
        int(i): sorted(g["dst"].tolist()) for i, g in got.groupby("src")
    }
    t = read_hexbin_table(path)
    want = second_order_numpy(t.column("neighbors").to_pylist())
    for i, lst in enumerate(want):
        assert got_map.get(i, []) == lst, i


def test_graph_smooth_fused_multivar(demo_bin):
    """Fused 4-variable smoothing (v4.cu:59-111 semantics): one shuffle,
    per-column results equal the single-variable runs."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin_table
    from cuda_gis_smoothing_ray.stages.graph_smooth import (
        graph_smooth,
        graph_smooth_numpy,
    )

    path, _ = demo_bin
    t = read_hexbin_table(path)
    n = t.num_rows
    rng = np.random.default_rng(5)
    cols = {"ndvi": t.column("ndvi").to_numpy(zero_copy_only=False)}
    for name in ("mndwi", "evi", "ndwi"):
        cols[name] = rng.random(n)
    tab = pa.table(
        {
            "cell_idx": t.column("cell_idx"),
            **{k: pa.array(v) for k, v in cols.items()},
            "neighbors": t.column("neighbors"),
        }
    )
    out = (
        graph_smooth(rd.from_arrow(tab), profile="gaussian",
                     value_cols=["ndvi", "mndwi", "evi", "ndwi"], k=2)
        .to_pandas()
        .sort_values("cell_idx")
    )
    neighbors = t.column("neighbors").to_pylist()
    order = out["cell_idx"].to_numpy()
    for name, v in cols.items():
        want = graph_smooth_numpy(v.astype(np.float64), neighbors,
                                  profile="gaussian", k=2)
        diff = np.abs(out[f"{name}_sm"].to_numpy() - want[order])
        assert diff.max() <= 1e-9, name


def test_reference_binary_golden_diff(demo_bin, tmp_path):
    """Run the SHIPPED reference binary on our exported .bin and diff its
    smoothed_naive.csv against graph_smooth — the reference's own gate
    (scripts/case-study.sh:130-134, tolerance 1e-4; binary is float32)."""
    import os
    import shutil
    import subprocess

    from cuda_gis_smoothing_ray.sources.hexbin import read_hexbin
    from cuda_gis_smoothing_ray.stages.graph_smooth import graph_smooth

    work = str(tmp_path)
    # the shipped binary is Mach-O arm64 (macOS build) — unrunnable on this
    # Linux box; compile the reference's OWN source instead (same oracle,
    # just built here), falling back to the binary where it does run
    binary = "/root/reference/bin/hex_smooth_naive"
    src = "/root/reference/src/cpu/hex_smooth_naive.cpp"
    candidates = [binary]
    if os.path.exists(src) and shutil.which("g++"):
        built = f"{work}/hex_smooth_naive"
        cc = subprocess.run(["g++", "-O2", "-o", built, src],
                            capture_output=True, text=True, timeout=300)
        if cc.returncode == 0:
            candidates.insert(0, built)
    path, _ = demo_bin
    shutil.copy(path, f"{work}/hex_data.bin")
    proc = None
    for exe in candidates:
        try:
            proc = subprocess.run(
                [exe, "hex_data.bin"], cwd=work, capture_output=True,
                text=True, timeout=120,
            )
            if proc.returncode == 0:
                break
        except OSError:
            proc = None
    if proc is None or proc.returncode != 0:
        pytest.skip("no runnable reference implementation on this platform")
    ref = np.loadtxt(f"{work}/smoothed_naive.csv")  # simple average, cell order
    got = (
        graph_smooth(read_hexbin(path), profile="uniform")
        .to_pandas()
        .sort_values("cell_idx")["smoothed"]
        .to_numpy()
    )
    assert len(ref) == len(got)
    assert np.abs(ref - got).max() <= 1e-4


def test_second_order_edges_adversarial_graph():
    """Dangling ids, duplicate list entries, asymmetric adjacency, empty
    lists: the distributed derivation must still equal the v5 transcription."""
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.graph_smooth import (
        second_order_edges,
        second_order_numpy,
    )

    neighbors = [
        [1, 1, 99, -7, 2],   # dupes + dangling
        [0, 3],
        [3],                 # asymmetric: 2->3 but 3 lists only 4
        [4, 4, 0],
        [],
        [0, 1, 2, 3, 4, 5],  # self-reference (5 lists itself)
    ]
    t = pa.table(
        {
            "cell_idx": pa.array(range(6), pa.int64()),
            "ndvi": pa.array([float(i) for i in range(6)]),
            "neighbors": pa.array(neighbors, pa.list_(pa.int32())),
        }
    )
    got = second_order_edges(rd.from_arrow(t)).to_pandas()
    got_map = {int(i): sorted(g["dst"].tolist()) for i, g in got.groupby("src")}
    want = second_order_numpy(neighbors)
    for i, lst in enumerate(want):
        assert got_map.get(i, []) == lst, (i, got_map.get(i, []), lst)
