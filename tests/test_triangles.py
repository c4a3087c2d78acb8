"""Triangle counting tests: engine (degree-ordered node-iterator) vs a
driver-side brute-force set intersection over the same community graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs_ds(n: int):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))}))


def _brute_counts(n_docs: int, comm_mod: int):
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr

    d = np.arange(n_docs, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % comm_mod
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n_docs),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n_docs),
    ]) % comm_mod
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = np.unique(a * comm_mod + b)
    a, b = pairs // comm_mod, pairs % comm_mod
    adj: dict[int, set[int]] = {}
    for x, y in zip(a, b):
        adj.setdefault(int(x), set()).add(int(y))
        adj.setdefault(int(y), set()).add(int(x))
    tris = set()
    for x, y in zip(a, b):
        for z in adj[int(x)] & adj[int(y)]:
            tris.add(tuple(sorted((int(x), int(y), int(z)))))
    counts: dict[int, int] = {}
    for t in tris:
        for h in t:
            counts[h] = counts.get(h, 0) + 1
    return counts


def test_pairs_within_groups_vectorized():
    from cuda_gis_smoothing_ray.stages.triangles import _pairs_within_groups

    grp = np.array([0, 0, 0, 2, 5, 5])
    first, second = _pairs_within_groups(grp)
    got = sorted(zip(first.tolist(), second.tolist()))
    assert got == [(0, 1), (0, 2), (1, 2), (4, 5)]
    # empty input
    f2, s2 = _pairs_within_groups(np.array([], dtype=np.int64))
    assert len(f2) == 0 and len(s2) == 0


def test_triangle_counts_match_brute_force():
    from cuda_gis_smoothing_ray.stages.triangles import triangle_counts

    n, cm = 300, 53  # deliberately different from the driver-query comm_mod
    out = (
        triangle_counts(_docs_ds(n), n_docs=n, comm_mod=cm)
        .to_pandas()
        .sort_values("comm")
        .reset_index(drop=True)
    )
    want = _brute_counts(n, cm)
    got = dict(zip(out["comm"].tolist(), out["n_triangles"].tolist()))
    assert got == want
    # the graph must actually contain triangles, or the test is vacuous
    assert sum(want.values()) > 30


def _brute_kcore(n_docs: int, comm_mod: int, k: int):
    """Driver-side peel-to-convergence k-core over the same community graph."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr

    d = np.arange(n_docs, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % comm_mod
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n_docs),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n_docs),
    ]) % comm_mod
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = np.unique(a * comm_mod + b)
    a, b = pairs // comm_mod, pairs % comm_mod
    while True:
        deg: dict[int, int] = {}
        for x, y in zip(a.tolist(), b.tolist()):
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        alive = {n for n, dg in deg.items() if dg >= k}
        m = np.array([x in alive and y in alive for x, y in zip(a, b)], bool)
        if m.all():
            return deg
        a, b = a[m], b[m]


def test_kcore_matches_peel_to_convergence():
    from cuda_gis_smoothing_ray.stages.triangles import kcore

    n, cm, k = 400, 61, 6
    out = kcore(_docs_ds(n), n_docs=n, comm_mod=cm, k=k, rounds=6).to_pandas()
    want = _brute_kcore(n, cm, k)
    got = dict(zip(out["comm"].tolist(), out["deg"].tolist()))
    assert got == want
    assert len(want) > 5  # non-vacuous: core survives on this graph


def test_common_neighbors_vs_brute():
    """Engine common-neighbor link prediction vs a brute-force set
    intersection over the same derived graph, plus: no reported pair is an
    existing edge, and the max_degree cap only ever shrinks counts."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import common_neighbors

    n, cm, mc = 300, 53, 2
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % cm
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ]) % cm
    keep = src != dst
    pairs = np.unique(np.minimum(src[keep], dst[keep]) * cm
                      + np.maximum(src[keep], dst[keep]))
    edge_set = set(pairs.tolist())
    adj: dict[int, set[int]] = {}
    for p in pairs:
        x, y = int(p) // cm, int(p) % cm
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if u * cm + w in edge_set:
                continue
            c = len(adj[u] & adj[w])
            if c >= mc:
                want[(u, w)] = c

    out = common_neighbors(_docs_ds(n), n_docs=n, comm_mod=cm,
                           min_cn=mc).to_pandas()
    got = {(int(r.u), int(r.w)): int(r.cn) for r in out.itertuples()}
    assert got == want
    assert all(u * cm + w not in edge_set for (u, w) in got)

    capped = common_neighbors(_docs_ds(n), n_docs=n, comm_mod=cm,
                              min_cn=1, max_degree=4).to_pandas()
    gc = {(int(r.u), int(r.w)): int(r.cn) for r in capped.itertuples()}
    full = common_neighbors(_docs_ds(n), n_docs=n, comm_mod=cm,
                            min_cn=1).to_pandas()
    gf = {(int(r.u), int(r.w)): int(r.cn) for r in full.itertuples()}
    assert set(gc) <= set(gf)
    assert all(gc[k] <= gf[k] for k in gc)


def test_adamic_adar_vs_brute():
    """AA micro-scores equal a brute-force recomputation: per-node weight
    floor(1e6/ln(deg)+0.5) summed over the shared neighbors of every
    non-adjacent pair; cn column matches common_neighbors exactly."""
    import math

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import (AA_WSCALE,
                                                         adamic_adar,
                                                         common_neighbors)

    n, cm, mc = 300, 53, 2
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % cm
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ]) % cm
    keep = src != dst
    pairs = np.unique(np.minimum(src[keep], dst[keep]) * cm
                      + np.maximum(src[keep], dst[keep]))
    edge_set = set(pairs.tolist())
    adj: dict[int, set[int]] = {}
    for p in pairs:
        x, y = int(p) // cm, int(p) % cm
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    wt = {z: int(math.floor(AA_WSCALE / math.log(len(nb)) + 0.5))
          for z, nb in adj.items() if len(nb) >= 2}
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if u * cm + w in edge_set:
                continue
            shared = adj[u] & adj[w]
            if len(shared) >= mc:
                want[(u, w)] = (len(shared), sum(wt[z] for z in shared))

    out = adamic_adar(_docs_ds(n), n_docs=n, comm_mod=cm, min_cn=mc).to_pandas()
    got = {(int(r.u), int(r.w)): (int(r.cn), int(r.aa_micro))
           for r in out.itertuples()}
    assert got == want

    cn_out = common_neighbors(_docs_ds(n), n_docs=n, comm_mod=cm,
                              min_cn=mc).to_pandas()
    cn_map = {(int(r.u), int(r.w)): int(r.cn) for r in cn_out.itertuples()}
    assert cn_map == {k: v[0] for k, v in got.items()}


def test_graph_modularity_brute():
    """Modularity equals a brute-force recomputation: CC of the linear
    subgraph via python union-find, then Q = intra/m - sum (d_c/2m)^2
    over the full graph (m/intra/Q all pinned)."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import graph_modularity

    n, cm = 300, 53
    d = np.arange(n, dtype=np.int64)

    def undirected(src, dst):
        keep = src != dst
        return set(zip(np.minimum(src[keep], dst[keep]).tolist(),
                       np.maximum(src[keep], dst[keep]).tolist()))

    h = geocode.host_id(d) % cm
    lin = undirected(h, geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n) % cm)
    quad = undirected(h, geocode.host_id(
        (d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n) % cm)
    full = lin | quad

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = {x for e in full for x in e}
    for x in nodes:
        parent.setdefault(x, x)
    for a, b in lin:
        parent[find(a)] = find(b)
    lab = {x: find(x) for x in nodes}
    m = len(full)
    intra = sum(1 for a, b in full if lab[a] == lab[b])
    dc: dict[int, int] = {}
    for a, b in full:
        dc[lab[a]] = dc.get(lab[a], 0) + 1
        dc[lab[b]] = dc.get(lab[b], 0) + 1
    q = (4 * m * intra - sum(v * v for v in dc.values())) / (4 * m * m)

    out = graph_modularity(_docs_ds(n), n_docs=n, comm_mod=cm).to_pandas()
    assert int(out["m"].iloc[0]) == m
    assert int(out["intra"].iloc[0]) == intra
    assert abs(float(out["modularity"].iloc[0]) - q) < 1e-6


def test_degree_assortativity_vs_networkx_formula():
    """r equals a brute-force recomputation with the stub-moment formula,
    and matches numpy's Pearson correlation over the directed stub list."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import degree_assortativity

    n, cm = 300, 53
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % cm
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ]) % cm
    keep = src != dst
    pairs = np.unique(np.minimum(src[keep], dst[keep]) * cm
                      + np.maximum(src[keep], dst[keep]))
    a, b = pairs // cm, pairs % cm
    deg: dict[int, int] = {}
    for x, y in zip(a.tolist(), b.tolist()):
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    x = np.array([deg[v] for v in np.concatenate([a, b])], np.float64)
    y = np.array([deg[v] for v in np.concatenate([b, a])], np.float64)
    want = np.corrcoef(x, y)[0, 1]

    out = degree_assortativity(_docs_ds(n), n_docs=n, comm_mod=cm).to_pandas()
    assert int(out["m"].iloc[0]) == len(pairs)
    assert abs(float(out["r"].iloc[0]) - want) < 1e-6


def test_jaccard_neighborhood_vs_brute():
    """jacc = |N(u) & N(w)| / |N(u) | N(w)| against a brute-force set
    computation over the same derived graph."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import jaccard_neighborhood

    n, cm, mc = 300, 53, 2
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % cm
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ]) % cm
    keep = src != dst
    pairs = np.unique(np.minimum(src[keep], dst[keep]) * cm
                      + np.maximum(src[keep], dst[keep]))
    edge_set = set(pairs.tolist())
    adj: dict[int, set[int]] = {}
    for p in pairs:
        x, y = int(p) // cm, int(p) % cm
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if u * cm + w in edge_set:
                continue
            c = len(adj[u] & adj[w])
            if c >= mc:
                want[(u, w)] = (c, len(adj[u] | adj[w]))

    out = jaccard_neighborhood(_docs_ds(n), n_docs=n, comm_mod=cm,
                               min_cn=mc).to_pandas()
    got = {(int(r.u), int(r.w)): (int(r.cn), int(r.un))
           for r in out.itertuples()}
    assert got == want
    for r in out.itertuples():
        assert abs(float(r.jacc) - r.cn / r.un) < 1e-6
        assert 0 < float(r.jacc) <= 1


def test_k_truss_vs_brute_peel():
    """The fixed-round engine truss equals a brute-force iterate-to-
    convergence edge peel on the same derived graph, and one extra
    round is a no-op (converged within the contract rounds)."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import k_truss

    n, cm, k = 300, 53, 4
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)]) % cm
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ]) % cm
    keep = src != dst
    pairs = set(map(tuple, np.stack(
        [np.minimum(src[keep], dst[keep]),
         np.maximum(src[keep], dst[keep])], axis=1).tolist()))

    def supports(es):
        adj = {}
        for u, w in es:
            adj.setdefault(u, set()).add(w)
            adj.setdefault(w, set()).add(u)
        return {(u, w): len(adj[u] & adj[w]) for u, w in es}

    es = set(pairs)
    while True:
        sup = supports(es)
        nxt = {e for e in es if sup[e] >= k - 2}
        if nxt == es:
            break
        es = nxt
    want = {(u, w): s for (u, w), s in supports(es).items()}

    out = k_truss(_docs_ds(n), n_docs=n, comm_mod=cm, k=k).to_pandas()
    got = {(int(r.u), int(r.w)): int(r.support) for r in out.itertuples()}
    assert got == want
    assert len(got) > 10  # non-vacuous truss survives


def test_shard_conductance_vs_brute():
    """Per-shard vol/cut/phi match a brute-force edge classification."""
    import numpy as np

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import (SHARD_K,
                                                         shard_conductance)
    from cuda_gis_smoothing_ray.stages.triangles import COMM_MOD

    n = 300
    d = np.arange(n, dtype=np.int64)
    cm = COMM_MOD
    a0 = geocode.host_id(d) % cm
    b1 = geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n) % cm
    b2 = geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n) % cm
    pairs = set()
    for s_, t_ in list(zip(a0, b1)) + list(zip(a0, b2)):
        if s_ != t_:
            pairs.add((min(int(s_), int(t_)), max(int(s_), int(t_))))
    w = (cm + SHARD_K - 1) // SHARD_K
    intra, cut = {}, {}
    for u, v in pairs:
        lu, lv = u // w, v // w
        if lu == lv:
            intra[lu] = intra.get(lu, 0) + 1
        else:
            cut[lu] = cut.get(lu, 0) + 1
            cut[lv] = cut.get(lv, 0) + 1
    m = len(pairs)
    out = shard_conductance(_docs_ds(n), n_docs=n).to_pandas() \
        .set_index("shard")
    for s_ in out.index:
        vol = 2 * intra.get(s_, 0) + cut.get(s_, 0)
        assert int(out.loc[s_, "vol"]) == vol
        assert int(out.loc[s_, "cut"]) == cut.get(s_, 0)
        den = min(vol, 2 * m - vol)
        assert abs(float(out.loc[s_, "phi"])
                   - cut.get(s_, 0) / den) < 1e-6


def test_hub_robustness_vs_brute():
    """lcc before/after hub removal matches a brute union-find, and
    removal never grows the largest component."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.triangles import (HUB_TOP,
                                                         hub_robustness)
    from cuda_gis_smoothing_ray.stages.triangles import COMM_MOD

    n, cm = 300, COMM_MOD
    d = np.arange(n, dtype=np.int64)
    a0 = geocode.host_id(d) % cm
    b1 = geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n) % cm
    b2 = geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n) % cm
    pairs = set()
    for s_, t_ in list(zip(a0, b1)) + list(zip(a0, b2)):
        if s_ != t_:
            pairs.add((min(int(s_), int(t_)), max(int(s_), int(t_))))
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    hubs = set(sorted(deg, key=lambda x: (-deg[x], x))[:HUB_TOP])

    def lcc(drop):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent.setdefault(parent[x], parent[x])
                x = parent[x]
            return x

        nodes = set(deg) - (hubs if drop else set())
        for x in nodes:
            find(x)
        for u, v in pairs:
            if drop and (u in hubs or v in hubs):
                continue
            parent[find(u)] = find(v)
        from collections import Counter

        return max(Counter(find(x) for x in nodes).values())

    out = hub_robustness(_docs_ds(n), n_docs=n).to_pandas()
    assert int(out["lcc_before"].iloc[0]) == lcc(False)
    assert int(out["lcc_after"].iloc[0]) == lcc(True)
    assert int(out["lcc_after"].iloc[0]) <= int(out["lcc_before"].iloc[0])


def test_ensure_cols_makes_one_sided_groups_total():
    """A coarse partition holding only degree rows arrives WITHOUT the
    pair-side carry columns (block-layout dependent — observed once in a
    16-CPU full sweep); ensure_cols must make the kind-filtered selections
    total so the tagged join returns empty instead of raising."""
    import pandas as pd

    from cuda_gis_smoothing_ray.functions.reduce import ensure_cols

    deg_only = pd.DataFrame({"key": [3, 9], "kind": [0, 0], "du": [2, 5]})
    df = ensure_cols(deg_only, ["key", "du", "w", "cn"])
    ed = df[df["kind"] == 1][["key", "w", "cn"]]   # would KeyError before
    dg = df[df["kind"] == 0][["key", "du"]]
    assert len(ed) == 0 and len(dg) == 2
    m = ed.merge(dg, on="key")
    assert len(m) == 0
    # no-op when every column is present (fast path, no copy churn)
    full = pd.DataFrame({"key": [1], "kind": [1], "du": [0], "w": [2], "cn": [1]})
    assert ensure_cols(full, ["key", "du", "w", "cn"]) is full
