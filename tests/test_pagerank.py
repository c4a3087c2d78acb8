"""PageRank (exact fixed-point BSP) tests against a driver-side numpy
transcription of the same integer recurrence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs_ds(n: int):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))}))


def _numpy_pagerank(n_docs: int, iterations: int):
    """Same graph + recurrence as stages/pagerank, dense numpy, no Ray."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr

    d = np.arange(n_docs, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)])
    dst = np.concatenate(
        [
            geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n_docs),
            geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n_docs),
        ]
    )
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    hosts = np.unique(geocode.host_id(d))
    idx = {h: i for i, h in enumerate(hosts)}
    si = np.array([idx[s] for s in src])
    di = np.array([idx[t] for t in dst])
    outdeg = np.bincount(si, minlength=len(hosts)).astype(np.int64)

    n_hosts = len(hosts)
    base = (pr.SCALE * (pr.DAMP_DEN - pr.DAMP_NUM)) // (pr.DAMP_DEN * n_hosts)
    rank = np.full(n_hosts, pr.SCALE // n_hosts, np.int64)
    for _ in range(iterations):
        contrib = np.zeros(n_hosts, np.int64)
        np.add.at(contrib, di, rank[si] // outdeg[si])
        rank = base + (pr.DAMP_NUM * contrib) // pr.DAMP_DEN
    return hosts, rank


def test_pagerank_matches_numpy_recurrence():
    from cuda_gis_smoothing_ray.stages.pagerank import pagerank

    n = 700
    hosts, rank = _numpy_pagerank(n, iterations=3)
    # both plans must agree: bounded driver finish (default at this size)
    # and the distributed BSP supersteps (forced with driver_max_edges=0)
    for cap in (None, 0):
        kw = {} if cap is None else {"driver_max_edges": cap}
        out = (
            pagerank(_docs_ds(n), n_docs=n, iterations=3, **kw)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert out["host"].to_numpy().tolist() == hosts.tolist(), f"cap={cap}"
        assert out["rank"].to_numpy().tolist() == rank.tolist(), f"cap={cap}"
    # the quadratic edge rule must create rank spread (hubs), or the test
    # would pass vacuously on a uniform vector
    assert len(np.unique(rank)) > 10


def test_pagerank_mass_conserved_approximately():
    """Total fixed-point mass stays within floor-loss of SCALE: every host
    emits base + damped share; floor division only ever loses mass."""
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.pagerank import pagerank

    n = 400
    out = pagerank(_docs_ds(n), n_docs=n, iterations=2).to_pandas()
    total = int(out["rank"].sum())
    # dangling hosts (outdeg 0) leak their damped mass; bound loosely
    assert 0 < total <= pr.SCALE
    assert total > pr.SCALE // 2


def _numpy_bfs(n_docs: int, seed_mod: int, rounds: int):
    """Dense transcription of stages/pagerank.bfs_hops (relaxation form)."""
    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr

    d = np.arange(n_docs, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)])
    dst = np.concatenate(
        [
            geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n_docs),
            geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n_docs),
        ]
    )
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    dist = {int(h): 0 for h in np.unique(geocode.host_id(d)) if h % seed_mod == 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, t in zip(src, dst):
            if int(s) in dist:
                c = dist[int(s)] + 1
                if int(t) not in nxt or c < nxt[int(t)]:
                    nxt[int(t)] = c
        dist = nxt
    return dist


def test_bfs_hops_matches_numpy():
    from cuda_gis_smoothing_ray.stages.pagerank import bfs_hops

    n = 700
    want = _numpy_bfs(n, seed_mod=7, rounds=4)
    for cap in (None, 0):  # driver finish AND forced BSP
        kw = {} if cap is None else {"driver_max_edges": cap}
        out = (
            bfs_hops(_docs_ds(n), n_docs=n, seed_mod=7, rounds=4, **kw)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        got = dict(zip(out["host"].astype(int), out["dist"].astype(int)))
        assert got == want, f"cap={cap}"
    # non-vacuous: seeds at 0, and at least two other distance levels reached
    assert len(set(want.values())) >= 3


def test_hits_and_ppr_plans_agree():
    """The bounded driver finish and the BSP supersteps are the same
    exact-integer recurrence — results must be bit-identical."""
    from cuda_gis_smoothing_ray.stages.pagerank import (
        hits, personalized_pagerank)

    n = 300
    a = hits(_docs_ds(n), n_docs=n, iterations=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    b = hits(_docs_ds(n), n_docs=n, iterations=2, driver_max_edges=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    assert a["host"].tolist() == b["host"].tolist()
    assert a["hub"].tolist() == b["hub"].tolist()
    assert a["auth"].tolist() == b["auth"].tolist()
    assert int(a["hub"].max()) > 0 and int(a["auth"].max()) > 0

    p = personalized_pagerank(_docs_ds(n), n_docs=n, iterations=2) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    q = personalized_pagerank(_docs_ds(n), n_docs=n, iterations=2,
                              driver_max_edges=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    assert p["host"].tolist() == q["host"].tolist()
    assert p["rank"].tolist() == q["rank"].tolist()
    # seeds hold extra teleport mass — non-uniform by construction
    assert len(set(p["rank"].tolist())) > 3


def test_graph_reciprocity_brute():
    """Reciprocity equals the brute-force directed-edge check, with
    mutual always even and bounded by m."""
    import numpy as np

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr

    n = 300
    d = np.arange(n, dtype=np.int64)
    src = np.concatenate([geocode.host_id(d), geocode.host_id(d)])
    dst = np.concatenate([
        geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n),
        geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n),
    ])
    keep = src != dst
    edges = set(zip(src[keep].tolist(), dst[keep].tolist()))
    mutual = sum(1 for (u, v) in edges if (v, u) in edges)

    import pyarrow as pa
    import ray.data as rd

    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    out = pr.graph_reciprocity(docs, n).to_pandas()
    assert int(out["m"].iloc[0]) == len(edges)
    assert int(out["mutual"].iloc[0]) == mutual
    assert mutual % 2 == 0
    assert 0 <= mutual <= len(edges)


def test_diameter_sweep_vs_brute():
    """ecc2 equals the true eccentricity of the far node (brute BFS) on
    the derived host graph, and ecc2 >= ecc1 (sweep property)."""
    from collections import deque

    import numpy as np

    from cuda_gis_smoothing_ray.functions import geocode
    from cuda_gis_smoothing_ray.stages import pagerank as pr
    from cuda_gis_smoothing_ray.stages.pagerank import diameter_sweep
    from cuda_gis_smoothing_ray.stages.textops import read_documents

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    out = diameter_sweep(read_documents(sf, columns=("doc_id",)),
                         n_docs).to_pandas()
    # forced-BSP plan returns the identical row
    out_bsp = diameter_sweep(read_documents(sf, columns=("doc_id",)),
                             n_docs, driver_max_edges=0).to_pandas()
    assert out.to_dict("records") == out_bsp.to_dict("records")
    # brute undirected adjacency
    d = np.arange(n_docs, dtype=np.int64)
    h = geocode.host_id(d)
    d1 = geocode.host_id((d * pr.EDGE_MULT + pr.EDGE_ADD) % n_docs)
    d2 = geocode.host_id((d * d * pr.EDGE_MULT2 + pr.EDGE_ADD2) % n_docs)
    adj: dict[int, set[int]] = {}
    for s_, t_ in list(zip(h, d1)) + list(zip(h, d2)):
        if s_ == t_:
            continue
        adj.setdefault(int(s_), set()).add(int(t_))
        adj.setdefault(int(t_), set()).add(int(s_))

    def bfs(src):
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    far = int(out["far_node"].iloc[0])
    want_ecc2 = max(bfs(far).values())
    assert int(out["ecc2"].iloc[0]) == want_ecc2
    assert int(out["ecc2"].iloc[0]) >= int(out["ecc1"].iloc[0])
