"""Distributed PageRank over the deterministic host link graph — the
iterative-algorithm operator family, run as BSP supersteps with the same
co-partitioned join machinery as :mod:`.cc` (vectorized per partition, no
driver materialization of node or edge tables).

**Exact integer fixed-point arithmetic** (``SCALE = 10**12``, floor
division): every iteration is order-independent int64 math — per-edge
contribution ``rank // outdeg``, damped update ``BASE + (85 * sum) // 100``
— so the DuckDB oracle (the same K steps unrolled as chained CTEs,
``sql/oracles_corpus.pagerank_sql``) matches bit-for-bit with no float
rounding rules at all.  This is the fixed-point analog of the float
PageRank; the iteration structure (scatter rank/outdeg along edges, gather
by destination, damp) is the standard one.

Link model (derived from the driver ``documents`` table so the oracle can
reconstruct it): document ``d`` links ``host(d) -> host((131*d + 7) % N)``
(linear/bijective: baseline flow) and ``host(d) -> host((17*d*d + 3) % N)``
(quadratic: concentrates in-degree on hub hosts), self-loops dropped, edges
DISTINCT.  ``host()`` is the engine's URL host id
(:func:`..functions.geocode.host_id`).

Scale shape per superstep: ranks and edges are co-partitioned by source
host (one bounded hash shuffle of (host, int64) rows), contributions are
pre-summed per partition, and the gather is a second bounded shuffle keyed
by destination host — identical to a production Pregel round.  The rank
table never leaves the cluster; only the two scalar aggregates (host count,
convergence checksum) reach the driver.

**Two plans behind each contract** (the :mod:`.cc` bounded-finish
discipline): the DISTINCT host edge list is at most 2x the doc count, so
when one ``count()`` of the materialized edges fits
``DRIVER_GRAPH_MAX_EDGES`` the iteration runs as a vectorized numpy loop
on the driver (``np.add.at`` / ``np.minimum.at`` gathers — int64 sums and
mins are order-independent, so the result is bit-identical to the BSP and
to the unrolled-CTE oracles) and only the graph BUILD stays distributed.
Measured at sf0.1 (500 docs, ~1k edges): pagerank 25.9 s -> ~2 s,
diameter_sweep 43.0 s -> ~2 s — the supersteps were pure orchestration
(8-16 union+groupby+materialize rounds) on a graph that fits in one L1
cache.  Beyond the cap the BSP supersteps run unchanged (the 100 TB path);
``driver_max_edges=0`` forces them for tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import geocode
from .cc import DRIVER_CC_MAX_EDGES as DRIVER_GRAPH_MAX_EDGES

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100
#: two link rules per doc: a linear (bijective) one for baseline flow and a
#: quadratic one that concentrates in-degree on hub hosts (a bijection alone
#: yields uniform ranks — no discrimination)
EDGE_MULT, EDGE_ADD = 131, 7
EDGE_MULT2, EDGE_ADD2 = 17, 3

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _add_part(n_parts: int | None = None):
    """Coarse hash-partitioner factory, sized to the cluster at pipeline
    BUILD time (``default_parts()``: 64 on the 32-CPU sandbox, ~2/core on
    the multi-node target) so the BSP solve stage is never capped below
    the cluster's parallelism.  Partition count is a pure perf knob — every
    consumer reduces per key inside the partition."""
    from ..functions.scale import default_parts

    n_parts = default_parts() if n_parts is None else n_parts

    def add(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((k.view(np.uint64) * _GOLDEN) >> np.uint64(52)) \
            % np.uint64(n_parts)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    return add


def host_graph(docs_ds, n_docs: int):
    """documents -> (edges Dataset(src, dst, outdeg), hosts Dataset(host)).

    Edges are globally DISTINCT (hash-partitioned dedup on the packed pair
    key) with the source out-degree attached so supersteps need no extra
    join against a degree table.
    """
    from ..functions.reduce import hash_groupby

    mod = np.int64(geocode.HOST_MOD)

    def emit(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([geocode.host_id(d), geocode.host_id(d)])
        dst = np.concatenate([
            geocode.host_id((d * EDGE_MULT + EDGE_ADD) % n_docs),
            geocode.host_id((d * d * EDGE_MULT2 + EDGE_ADD2) % n_docs),
        ])
        keep = src != dst  # self-loops carry no rank
        pack = src[keep] * mod + dst[keep]
        return pa.table({"pack": pa.array(pack),
                         "one": pa.array(np.ones(len(pack), np.int64))})

    distinct = hash_groupby(
        docs_ds.map_batches(emit, batch_format="pyarrow", batch_size=None),
        "pack", ["one"], how="min",
    )

    def unpack(batch: pa.Table) -> pa.Table:
        p = batch.column("pack").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(p // mod), "dst": pa.array(p % mod)})

    edges = distinct.map_batches(unpack, batch_format="pyarrow", batch_size=None)

    # attach outdeg: co-partition edges by src with per-src degree sums
    deg = hash_groupby(
        edges.map_batches(
            lambda b: pa.table({"src": b.column("src"),
                                "one": pa.array(np.ones(len(b), np.int64))}),
            batch_format="pyarrow", batch_size=None),
        "src", ["one"], how="isum",
    )

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("src"), "a": batch.column("dst"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def tag_deg(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("src"), "a": batch.column("one"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def join_deg(df: pd.DataFrame) -> pd.DataFrame:
        dg = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "outdeg"})
        ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "dst"})
        m = ed.merge(dg, on="key")
        return pd.DataFrame({"src": m["key"].to_numpy(np.int64),
                             "dst": m["dst"].to_numpy(np.int64),
                             "outdeg": m["outdeg"].to_numpy(np.int64)})

    edges_deg = (
        edges.map_batches(tag_edge, batch_format="pyarrow", batch_size=None)
        .union(deg.map_batches(tag_deg, batch_format="pyarrow", batch_size=None))
        .map_batches(_add_part(), batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(join_deg)
    )

    def hosts_batch(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.unique(geocode.host_id(d))
        return pa.table({"host": pa.array(h), "one": pa.array(np.ones(len(h), np.int64))})

    hosts = hash_groupby(
        docs_ds.map_batches(hosts_batch, batch_format="pyarrow", batch_size=None),
        "host", ["one"], how="min",
    ).select_columns(["host"])

    return edges_deg, hosts


def _graph_arrays(edges, hosts):
    """Materialized edges + hosts -> (host ids sorted ASC, src index,
    dst index[, outdeg]) numpy arrays for the bounded driver finish.
    Host ids are remapped to dense positions in the sorted id array, so
    ``hosts_sorted[i]`` is the host at index ``i``."""
    e = edges.to_pandas()
    h = np.sort(hosts.to_pandas()["host"].to_numpy(np.int64))
    si = np.searchsorted(h, e["src"].to_numpy(np.int64))
    di = np.searchsorted(h, e["dst"].to_numpy(np.int64))
    if "outdeg" in e.columns:
        return h, si, di, e["outdeg"].to_numpy(np.int64)
    return h, si, di, None


def _driver_rank_loop(edges, hosts, iterations: int, init_fn, damp_fn):
    """Bounded finish for the rank family: same recurrence as
    :func:`_rank_loop`, vectorized on the driver.  ``np.add.at`` is an
    exact int64 scatter-sum (order-independent), so results are
    bit-identical to the distributed supersteps and the oracle."""
    import ray.data as rd

    h, si, di, outdeg = _graph_arrays(edges, hosts)
    rank = init_fn(h)
    for _ in range(iterations):
        s = np.zeros(len(h), np.int64)
        if len(si):
            np.add.at(s, di, rank[si] // outdeg)
        rank = damp_fn(h, s)
    return rd.from_arrow(pa.table({"host": pa.array(h),
                                   "rank": pa.array(rank)}))


#: unreached sentinel for the driver BFS (never emitted; filtered out)
_BFS_INF = np.int64(1) << np.int64(60)


def _driver_bfs(h: np.ndarray, si: np.ndarray, di: np.ndarray,
                dist0: np.ndarray, rounds: int) -> np.ndarray:
    """Bounded finish for the relaxation BFS: per round every node with a
    known distance pushes ``dist+1`` along its out-edges and every node
    min-combines — the identical recurrence to the distributed rounds
    (min is order-independent).  Returns the dense distance array with
    ``_BFS_INF`` marking unreached nodes."""
    dist = dist0
    for _ in range(rounds):
        nxt = dist.copy()
        if len(si):
            np.minimum.at(nxt, di, dist[si] + 1)
        dist = nxt
    return dist


def _tag_rank(batch: pa.Table) -> pa.Table:
    return pa.table({"key": batch.column("host"), "a": batch.column("rank"),
                     "b": pa.array(np.zeros(len(batch), np.int64)),
                     "kind": pa.array(np.zeros(len(batch), np.int8))})


def _tag_edge(batch: pa.Table) -> pa.Table:
    return pa.table({"key": batch.column("src"), "a": batch.column("dst"),
                     "b": batch.column("outdeg"),
                     "kind": pa.array(np.ones(len(batch), np.int8))})


def _scatter(df: pd.DataFrame) -> pd.DataFrame:
    # co-partitioned by source host: one merge pushes rank/outdeg along
    # every out-edge; zero rows keep in-degree-0 hosts alive downstream
    rk = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "rank"})
    ed = df[df["kind"] == 1][["key", "a", "b"]].rename(
        columns={"a": "dst", "b": "outdeg"})
    m = ed.merge(rk, on="key")
    contrib = m["rank"].to_numpy(np.int64) // m["outdeg"].to_numpy(np.int64)
    return pd.DataFrame({
        "host": np.concatenate([m["dst"].to_numpy(np.int64),
                                rk["key"].to_numpy(np.int64)]),
        "contrib": np.concatenate([contrib, np.zeros(len(rk), np.int64)]),
    })


def _rank_loop(edges, ranks, iterations: int, damp_fn):
    """Shared BSP superstep loop: scatter rank/outdeg along co-partitioned
    edges, exact-int gather by destination, ``damp_fn(hosts, contrib) ->
    rank`` finishes each round (the only piece pagerank and its
    personalized variant differ in)."""
    from ..functions.reduce import hash_groupby

    for _ in range(iterations):
        pushed = (
            ranks.map_batches(_tag_rank, batch_format="pyarrow", batch_size=None)
            .union(edges.map_batches(_tag_edge, batch_format="pyarrow", batch_size=None))
            .map_batches(_add_part(), batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(_scatter)
        )
        summed = hash_groupby(pushed, "host", ["contrib"], how="isum")

        def damp(batch: pa.Table) -> pa.Table:
            h = batch.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
            s = batch.column("contrib").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"host": batch.column("host"),
                             "rank": pa.array(damp_fn(h, s))})

        # repartition caps the block count: union + groupby multiply blocks
        # every superstep, and per-block overhead dominates at rank-table
        # sizes (same pathology measured at 3x/round in stages/triangles)
        ranks = summed.map_batches(damp, batch_format="pyarrow",
                                   batch_size=None).repartition(16).materialize()
    return ranks


def pagerank(docs_ds, n_docs: int, iterations: int = 8,
             driver_max_edges: int = DRIVER_GRAPH_MAX_EDGES):
    """documents -> (host, rank) after ``iterations`` exact fixed-point
    PageRank supersteps on the deterministic host graph; rank is the int64
    fixed-point value (SCALE = 10**12).  Plan selection (bounded driver
    finish vs BSP supersteps) is by measured edge count — module
    docstring; ``driver_max_edges=0`` forces the BSP path."""
    edges, hosts = host_graph(docs_ds, n_docs)
    edges = edges.materialize()
    hosts = hosts.materialize()
    n_hosts = hosts.count()
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_hosts)
    init = SCALE // n_hosts

    def damp_fn(host: np.ndarray, s: np.ndarray) -> np.ndarray:
        return base + (DAMP_NUM * s) // DAMP_DEN

    if edges.count() <= driver_max_edges:
        return _driver_rank_loop(
            edges, hosts, iterations,
            init_fn=lambda h: np.full(len(h), init, np.int64),
            damp_fn=damp_fn)

    ranks = hosts.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "rank": pa.array(np.full(len(b), init, np.int64))}),
        batch_format="pyarrow", batch_size=None,
    ).materialize()

    return _rank_loop(edges, ranks, iterations, damp_fn)


PPR_SEED_MOD = 10


def personalized_pagerank(docs_ds, n_docs: int, iterations: int = 8,
                          seed_mod: int = PPR_SEED_MOD,
                          driver_max_edges: int = DRIVER_GRAPH_MAX_EDGES):
    """documents -> (host, rank): PERSONALIZED PageRank — the teleport mass
    returns only to the seed set (hosts ``% seed_mod == 0``) instead of
    uniformly, so rank measures proximity to the seeds (the
    random-walk-with-restart relevance score behind related-domain
    discovery and seed-expanded crawl frontiers).

    Same exact int64 fixed-point supersteps as :func:`pagerank` (shared
    :func:`_rank_loop`); only the initialization (seed-uniform) and the
    damp base (teleport to seeds only: ``base`` on seeds, 0 elsewhere)
    differ — both the engine and the unrolled-CTE oracle branch on
    ``host % seed_mod`` by value, so the match stays bit-exact."""
    edges, hosts = host_graph(docs_ds, n_docs)
    edges = edges.materialize()
    hosts = hosts.materialize()

    def count_seeds(batch: pa.Table) -> pa.Table:
        h = batch.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([int((h % seed_mod == 0).sum())],
                                       pa.int64())})

    n_seeds = int(hosts.map_batches(count_seeds, batch_format="pyarrow",
                                    batch_size=None).sum("n"))
    if n_seeds == 0:
        raise ValueError(f"personalized_pagerank: no host % {seed_mod} == 0 "
                         "seeds — the teleport vector would be empty")
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_seeds)
    init = SCALE // n_seeds

    def damp_fn(host: np.ndarray, s: np.ndarray) -> np.ndarray:
        b = np.where(host % seed_mod == 0, base, 0).astype(np.int64)
        return b + (DAMP_NUM * s) // DAMP_DEN

    if edges.count() <= driver_max_edges:
        return _driver_rank_loop(
            edges, hosts, iterations,
            init_fn=lambda h: np.where(h % seed_mod == 0, init, 0)
            .astype(np.int64),
            damp_fn=damp_fn)

    def init_ranks(batch: pa.Table) -> pa.Table:
        h = batch.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "host": batch.column("host"),
            "rank": pa.array(np.where(h % seed_mod == 0, init, 0)
                             .astype(np.int64)),
        })

    ranks = hosts.map_batches(init_ranks, batch_format="pyarrow",
                              batch_size=None).materialize()

    return _rank_loop(edges, ranks, iterations, damp_fn)


#: BFS defaults — seeds are hosts divisible by SEED_MOD (~10% of hosts);
#: ROUNDS bounds the frontier expansion (the graph's diameter is smaller,
#: so the last rounds are no-ops and the result is the true hop distance)
BFS_SEED_MOD = 10
BFS_ROUNDS = 6


def bfs_hops(docs_ds, n_docs: int, seed_mod: int = BFS_SEED_MOD,
             rounds: int = BFS_ROUNDS,
             driver_max_edges: int = DRIVER_GRAPH_MAX_EDGES):
    """documents -> (host, dist): multi-source BFS over the directed host
    link graph — hop distance from the seed set (hosts ``% seed_mod == 0``)
    after ``rounds`` synchronous frontier expansions.  Unreached hosts are
    omitted (no sentinel dists to keep the schema non-nullable int64).

    Pure integer BSP like :func:`pagerank`: each round co-partitions the
    current distance table with the edge set by source host (one bounded
    shuffle of (host, int64) rows), emits ``dist+1`` along out-edges, and
    min-combines through the same vectorized hash-partition reduce.  The
    distance table never reaches the driver; rounds are fixed so the
    DuckDB oracle is the identical recurrence unrolled as chained CTEs
    (``sql/oracles_corpus.bfs_hops_sql``).  This is the relaxation form of
    BFS (dist rows re-push every round), which trades ~diameter× extra
    pushes for zero frontier bookkeeping; a production variant keeps a
    frontier filter (dist == round) — same shuffle shape."""
    from ..functions.reduce import hash_groupby

    edges, hosts = host_graph(docs_ds, n_docs)
    edges = edges.select_columns(["src", "dst"]).materialize()

    if edges.count() <= driver_max_edges:
        import ray.data as rd

        h, si, di, _ = _graph_arrays(edges, hosts.materialize())
        dist0 = np.where(h % seed_mod == 0, np.int64(0), _BFS_INF)
        dist = _driver_bfs(h, si, di, dist0, rounds)
        reach = dist < _BFS_INF
        return rd.from_arrow(pa.table({"host": pa.array(h[reach]),
                                       "dist": pa.array(dist[reach])}))

    def seed(batch: pa.Table) -> pa.Table:
        h = batch.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
        h = h[h % seed_mod == 0]
        return pa.table({"host": pa.array(h),
                         "dist": pa.array(np.zeros(len(h), np.int64))})

    dist = hosts.map_batches(seed, batch_format="pyarrow",
                             batch_size=None).materialize()

    def tag_dist(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("host"), "a": batch.column("dist"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("src"), "a": batch.column("dst"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        dt = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "dist"})
        ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "dst"})
        m = ed.merge(dt, on="key")
        return pd.DataFrame({
            "host": np.concatenate([dt["key"].to_numpy(np.int64),
                                    m["dst"].to_numpy(np.int64)]),
            "dist": np.concatenate([dt["dist"].to_numpy(np.int64),
                                    m["dist"].to_numpy(np.int64) + 1]),
        })

    for _ in range(rounds):
        pushed = (
            dist.map_batches(tag_dist, batch_format="pyarrow", batch_size=None)
            .union(edges.map_batches(tag_edge, batch_format="pyarrow",
                                     batch_size=None))
            .map_batches(_add_part(), batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(relax)
        )
        # min-combine caps every host at its best-known distance; the
        # repartition bounds block growth (see pagerank's note)
        dist = hash_groupby(pushed, "host", ["dist"], how="min"
                            ).repartition(16).materialize()

    return dist


HITS_ITERS = 4


def hits(docs_ds, n_docs: int, iterations: int = HITS_ITERS,
         driver_max_edges: int = DRIVER_GRAPH_MAX_EDGES):
    """documents -> (host, hub, auth): HITS hubs-and-authorities over the
    same deterministic host graph as :func:`pagerank`, as ``iterations``
    exact-integer BSP supersteps (the other classic link-analysis
    fixed-point iteration — hubs score by the authorities they point AT,
    authorities by the hubs pointing at THEM).

    **Exact normalization without overflow**: the textbook L2/L1 renorm is
    float; instead each half-step divides by the shift divisor
    ``d = max(1, (max_raw + SCALE - 1) // SCALE)`` (ceil), which keeps
    every value <= SCALE in pure int64 (raw <= max_degree * SCALE, safe
    while max_degree < 2^63 / SCALE ~ 9.2e6 — re-scale SCALE down for
    denser graphs) and is order-independent, so the unrolled-CTE DuckDB
    oracle (``sql/oracles_corpus.hits_sql``) matches bit-for-bit.

    Scale shape per half-step: one co-partitioned (host-keyed) scatter
    along edges, one bounded gather keyed by the opposite endpoint, and
    ONE scalar (the max) to the driver — the score tables never leave the
    cluster."""
    from ..functions.reduce import hash_groupby

    edges, hosts = host_graph(docs_ds, n_docs)
    edges = edges.materialize()
    hosts = hosts.materialize()

    if edges.count() <= driver_max_edges:
        import ray.data as rd

        h, si, di, _ = _graph_arrays(edges, hosts)

        def _norm(raw: np.ndarray) -> np.ndarray:
            mx = int(raw.max()) if len(raw) else 0
            d = max(1, (mx + SCALE - 1) // SCALE)
            return raw // d

        hub_v = np.full(len(h), SCALE, np.int64)
        auth_v = np.zeros(len(h), np.int64)
        for _ in range(iterations):
            raw = np.zeros(len(h), np.int64)
            if len(si):
                np.add.at(raw, di, hub_v[si])
            auth_v = _norm(raw)
            raw = np.zeros(len(h), np.int64)
            if len(si):
                np.add.at(raw, si, auth_v[di])
            hub_v = _norm(raw)
        return rd.from_arrow(pa.table({"host": pa.array(h),
                                       "hub": pa.array(hub_v),
                                       "auth": pa.array(auth_v)}))

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({"host": batch.column("host"),
                         "v": pa.array(np.full(len(batch), SCALE, np.int64))})

    def _push(vals, key_col: str, out_col: str):
        # scatter vals[v] along edges keyed by key_col, gather by the
        # opposite endpoint; zero rows keep degree-0 hosts alive
        def tag_vals(batch: pa.Table) -> pa.Table:
            return pa.table({"key": batch.column("host"),
                             "a": batch.column("v"),
                             "kind": pa.array(np.zeros(len(batch), np.int8))})

        def tag_edges(batch: pa.Table) -> pa.Table:
            return pa.table({"key": batch.column(key_col),
                             "a": batch.column(out_col),
                             "kind": pa.array(np.ones(len(batch), np.int8))})

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            vv = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "v"})
            ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "other"})
            m = ed.merge(vv, on="key")
            return pd.DataFrame({
                "host": np.concatenate([m["other"].to_numpy(np.int64),
                                        vv["key"].to_numpy(np.int64)]),
                "v": np.concatenate([m["v"].to_numpy(np.int64),
                                     np.zeros(len(vv), np.int64)]),
            })

        pushed = (
            vals.map_batches(tag_vals, batch_format="pyarrow", batch_size=None)
            .union(edges.map_batches(tag_edges, batch_format="pyarrow",
                                     batch_size=None))
            .map_batches(_add_part(), batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(scatter)
        )
        return hash_groupby(pushed, "host", ["v"], how="isum") \
            .repartition(16).materialize()

    def _normalize(raw):
        mx = raw.max("v")
        mx = int(mx) if mx is not None else 0
        d = max(1, (mx + SCALE - 1) // SCALE)

        def div(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"host": batch.column("host"),
                             "v": pa.array(v // d)})

        return raw.map_batches(div, batch_format="pyarrow",
                               batch_size=None).materialize()

    hub = hosts.map_batches(init, batch_format="pyarrow",
                            batch_size=None).materialize()
    auth = None
    for _ in range(iterations):
        # auth(j) = sum of hub(i) over edges i -> j
        auth = _normalize(_push(hub, "src", "dst"))
        # hub(i) = sum of auth(j) over edges i -> j
        hub = _normalize(_push(auth, "dst", "src"))

    def tag_hub(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("host"), "a": batch.column("v"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def tag_auth(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("host"), "a": batch.column("v"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def zip_scores(df: pd.DataFrame) -> pd.DataFrame:
        hb = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "hub"})
        au = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "auth"})
        m = hb.merge(au, on="key")
        return pd.DataFrame({"host": m["key"].to_numpy(np.int64),
                             "hub": m["hub"].to_numpy(np.int64),
                             "auth": m["auth"].to_numpy(np.int64)})

    return (
        hub.map_batches(tag_hub, batch_format="pyarrow", batch_size=None)
        .union(auth.map_batches(tag_auth, batch_format="pyarrow",
                                batch_size=None))
        .map_batches(_add_part(), batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(zip_scores)
        .sort("host")
    )


def graph_reciprocity(docs_ds, n_docs: int):
    """documents -> ONE row (m, mutual, reciprocity): RECIPROCITY of the
    directed host graph — the fraction of directed edges whose reverse
    edge also exists (mutual links; near 0 for a broadcast-shaped web,
    near 1 for a social graph).  Uses the same DISTINCT directed edge set
    as :func:`pagerank`.

    EXACT: m and the mutual count are integers (a directed edge (u,v) is
    mutual iff (v,u) exists — detected by one packed-key co-partition
    with both orientations tagged), one round6 division.  Scale shape:
    the host_graph dedup shuffle + ONE more packed-key partition pass."""
    from ..functions.reduce import hash_groupby

    mod = np.int64(geocode.HOST_MOD)

    def emit(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = np.concatenate([geocode.host_id(d), geocode.host_id(d)])
        dst = np.concatenate([
            geocode.host_id((d * EDGE_MULT + EDGE_ADD) % n_docs),
            geocode.host_id((d * d * EDGE_MULT2 + EDGE_ADD2) % n_docs),
        ])
        keep = src != dst
        pack = src[keep] * mod + dst[keep]
        u = np.unique(pack)
        return pa.table({"key": pa.array(u),
                         "one": pa.array(np.ones(len(u), np.int64))})

    edges = hash_groupby(
        docs_ds.map_batches(emit, batch_format="pyarrow", batch_size=None),
        "key", ["one"], how="min",
    ).materialize()

    # tag each edge under its UNORDERED pair key with a direction bit;
    # a pair seen in both directions contributes 2 mutual edges
    def unordered(batch: pa.Table) -> pa.Table:
        p = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        s, t = p // mod, p % mod
        a = np.minimum(s, t)
        b = np.maximum(s, t)
        fwd = (s < t).astype(np.int64)
        return pa.table({"key": pa.array(a * mod + b),
                         "fwd": pa.array(fwd),
                         "bwd": pa.array(1 - fwd)})

    pairs = hash_groupby(
        edges.map_batches(unordered, batch_format="pyarrow",
                          batch_size=None),
        "key", ["fwd", "bwd"], how="isum",
    )

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        b = batch.column("bwd").to_numpy(zero_copy_only=False)
        mutual = int((2 * ((f > 0) & (b > 0)).sum()))
        m = int(f.sum() + b.sum())
        return pa.table({"k": pa.array([0], pa.int64()),
                         "m": pa.array([m], pa.int64()),
                         "mutual": pa.array([mutual], pa.int64())})

    red = hash_groupby(
        pairs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "k", ["m", "mutual"], how="isum",
    ).to_pandas()
    m = int(red["m"].sum())
    mutual = int(red["mutual"].sum())
    if m == 0:
        raise ValueError("graph_reciprocity: empty graph")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "m": pa.array([m], pa.int64()),
        "mutual": pa.array([mutual], pa.int64()),
        "reciprocity": pa.array([r6(mutual / m)], pa.float64()),
    }))


SWEEP_ROUNDS = 8


def diameter_sweep(docs_ds, n_docs: int, rounds: int = SWEEP_ROUNDS,
                   driver_max_edges: int = DRIVER_GRAPH_MAX_EDGES):
    """documents -> ONE row (start, ecc1, far_node, ecc2): the DOUBLE-
    SWEEP diameter lower bound of the undirected host graph — BFS from
    the smallest host id, hop to the farthest reached node (ties ->
    smallest id), BFS again; the second eccentricity is the classic
    tight diameter estimate (exact on trees, near-exact on web graphs)
    at the cost of TWO BFS instead of all-pairs.

    Pure integer BSP: each sweep is ``rounds`` relaxation supersteps of
    :func:`bfs_hops` (undirected edge set — both orientations), the
    argmax hop is (dist DESC, host ASC) over the bounded reached table.
    Unreached nodes never appear, so eccentricities are over the seed's
    component (declared).  Scale shape: two fixed-round BFS chains, one
    bounded-table argmax between them."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    edges, hosts = host_graph(docs_ds, n_docs)

    def undirect(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    uedges = edges.select_columns(["src", "dst"]).map_batches(
        undirect, batch_format="pyarrow", batch_size=None).materialize()

    if uedges.count() <= driver_max_edges:
        h, si, di, _ = _graph_arrays(uedges, hosts.materialize())
        start = int(h.min())

        def sweep(seed_host: int):
            dist0 = np.where(h == seed_host, np.int64(0), _BFS_INF)
            dist = _driver_bfs(h, si, di, dist0, rounds)
            reach = dist < _BFS_INF
            hr, dr = h[reach], dist[reach]
            # (dist DESC, host ASC) argmax — hr is host-ASC already, so a
            # stable argmax of dr picks the smallest host among ties
            i = int(np.argmax(dr))
            return int(hr[i]), int(dr[i])

        far, ecc1 = sweep(start)
        _, ecc2 = sweep(far)
        return rd.from_arrow(pa.table({
            "start": pa.array([start], pa.int64()),
            "ecc1": pa.array([ecc1], pa.int64()),
            "far_node": pa.array([far], pa.int64()),
            "ecc2": pa.array([ecc2], pa.int64()),
        }))

    def tag_dist(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("host"),
                         "a": batch.column("dist"),
                         "kind": pa.array(np.zeros(len(batch), np.int8))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("src"),
                         "a": batch.column("dst"),
                         "kind": pa.array(np.ones(len(batch), np.int8))})

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        dt = df[df["kind"] == 0][["key", "a"]].rename(columns={"a": "dist"})
        ed = df[df["kind"] == 1][["key", "a"]].rename(columns={"a": "dst"})
        m = ed.merge(dt, on="key")
        return pd.DataFrame({
            "host": np.concatenate([dt["key"].to_numpy(np.int64),
                                    m["dst"].to_numpy(np.int64)]),
            "dist": np.concatenate([dt["dist"].to_numpy(np.int64),
                                    m["dist"].to_numpy(np.int64) + 1]),
        })

    def bfs_from(seed_host: int):
        dist = rd.from_arrow(pa.table({
            "host": pa.array([seed_host], pa.int64()),
            "dist": pa.array([0], pa.int64())})).materialize()
        for _ in range(rounds):
            pushed = (
                dist.map_batches(tag_dist, batch_format="pyarrow",
                                 batch_size=None)
                .union(uedges.map_batches(tag_edge, batch_format="pyarrow",
                                          batch_size=None))
                .map_batches(_add_part(), batch_format="pyarrow",
                             batch_size=None)
                .groupby("__part")
                .map_groups(relax)
            )
            dist = hash_groupby(pushed, "host", ["dist"], how="min"
                                ).repartition(16).materialize()
        return dist.to_pandas()

    start = int(hosts.to_pandas()["host"].min())
    d1 = bfs_from(start)
    d1 = d1.sort_values(["dist", "host"], ascending=[False, True])
    far = int(d1["host"].iloc[0])
    ecc1 = int(d1["dist"].iloc[0])
    d2 = bfs_from(far).sort_values(["dist", "host"],
                                   ascending=[False, True])
    ecc2 = int(d2["dist"].iloc[0])
    return rd.from_arrow(pa.table({
        "start": pa.array([start], pa.int64()),
        "ecc1": pa.array([ecc1], pa.int64()),
        "far_node": pa.array([far], pa.int64()),
        "ecc2": pa.array([ecc2], pa.int64()),
    }))
