"""Connected-components (min-label propagation) tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(table):
    import ray.data as rd

    return rd.from_arrow(table)


def test_cc_components_and_survivors():
    from cuda_gis_smoothing_ray.stages.cc import connected_components, dedup_survivors

    # components: {0,1,2,3} (chain), {5,6}, {9} isolated, {7,8} via two edges
    edges = pa.table(
        {
            "a": pa.array([0, 1, 2, 5, 7, 8], pa.int64()),
            "b": pa.array([1, 2, 3, 6, 8, 7], pa.int64()),
        }
    )
    nodes = pa.table({"doc_id": pa.array(list(range(10)), pa.int64())})
    want = [0, 0, 0, 0, 4, 5, 5, 7, 7, 9]
    # both plans must agree: bounded driver finish (default at this size)
    # and the distributed min-label BSP (forced with driver_max_edges=0)
    for cap in (None, 0):
        kw = {} if cap is None else {"driver_max_edges": cap}
        out = (
            connected_components(_ds(edges), _ds(nodes), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["component"].tolist() == want, f"cap={cap}"

    surv = dedup_survivors(_ds(edges), _ds(nodes)).to_pandas().sort_values("doc_id")
    assert surv["is_survivor"].tolist() == [
        True, False, False, False, True, True, False, True, False, True
    ]


def test_cc_long_chain_converges():
    from cuda_gis_smoothing_ray.stages.cc import connected_components

    n = 12  # diameter 11: exercises the round loop
    edges = pa.table(
        {
            "a": pa.array(np.arange(n - 1, dtype=np.int64)),
            "b": pa.array(np.arange(1, n, dtype=np.int64)),
        }
    )
    nodes = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    out = connected_components(
        _ds(edges), _ds(nodes), max_rounds=20, driver_max_edges=0
    ).to_pandas()
    assert (out["component"] == 0).all()


def test_numpy_cc_hook_jump_matches_brute_union_find():
    """Driver-finish kernel vs a brute-force union-find on a random-ish
    deterministic graph with chains, blobs and isolated endpoints."""
    from cuda_gis_smoothing_ray.stages.cc import _numpy_cc

    rng = np.random.default_rng(20240819)
    n = 500
    a = rng.integers(0, n, 800).astype(np.int64) * 7  # sparse non-contiguous ids
    b = rng.integers(0, n, 800).astype(np.int64) * 7
    ids, comp = _numpy_cc(a, b)

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {int(i): find(int(i)) for i in ids}
    got = dict(zip(ids.tolist(), comp.tolist()))
    assert got == want


def test_dedup_canonical_keeps_longest_then_lowest_id():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.cc import dedup_canonical

    # components: {1,2,3} (chain), {4,5}, {6} isolated
    edges = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 4, "b": 5}])
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "aaaa"},      # len 4
            {"doc_id": 2, "text": "bbbbbb"},    # len 6  <- longest in comp 1
            {"doc_id": 3, "text": "cc"},
            {"doc_id": 4, "text": "dddd"},      # len 4, ties with 5 -> keep 4
            {"doc_id": 5, "text": "eeee"},
            {"doc_id": 6, "text": "f"},
        ]
    )
    out = dedup_canonical(edges, docs).to_pandas().sort_values("component")
    got = list(zip(out["component"], out["canonical"], out["best_len"]))
    assert got == [(1, 2, 6), (4, 4, 4), (6, 6, 1)]
