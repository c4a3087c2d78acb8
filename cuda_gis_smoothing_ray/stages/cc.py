"""Connected components over duplicate-pair edges — the step that turns
near-dup PAIRS into dedup CLUSTERS ("keep one doc per component").

Two plans behind one contract (``(node_col, component)``, component = min
node id in the component, isolated nodes singleton):

* **Bounded driver finish** (edge count <= ``DRIVER_CC_MAX_EDGES``): the
  EDGE list of a dedup graph is a small fraction of the corpus (pairs that
  actually collide), so when one ``count()`` of the materialized pairs
  fits the documented bound, an exact numpy hook+jump union-find runs on
  the driver (O(E log V) vectorized passes, ~32 MB at the 2M-edge cap) and
  the (endpoint -> component) map broadcasts once (``ray.put``) for a
  single ``map_batches`` assignment pass over the node table — the same
  bounded-by-construction finish policy as k_truss / graph_modularity.
  Measured: semantic_dedup at sf0.1 (2k vectors, 920 edges) 230 s -> ~8 s;
  the BSP loop was paying 17 diameter rounds x 2 all-to-all shuffles of
  pure orchestration on a graph that fits in one L2 cache.

* **Min-label BSP** (beyond the cap — the 100 TB path, unchanged): every
  node pushes its label along its edges each round, takes the min of what
  it hears; converged when the global label sum stops falling.  Rounds =
  max component diameter; per round one union-groupby join (labels + edges
  keyed by source node) and one min-reduce keyed by node.  Labels never
  materialize on the driver.

Callers pass node tables that cover every edge endpoint (dedup: endpoints
are doc ids; hotspot/hub graphs filter both sides consistently), so both
plans agree on every caller's input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Driver-finish cap: 2M edges = 2 x 8B x 2M = 32 MB of int64 pairs on the
# driver and a <=32 MB broadcast lookup — far under the driver heap and
# object-store budgets; beyond it the distributed BSP runs unchanged.
DRIVER_CC_MAX_EDGES = 2_000_000


def _numpy_cc(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact min-label components of the edge list -> (sorted endpoint ids,
    component = min endpoint id in the component).  Vectorized hook (min
    over each edge, ``np.minimum.at``) + pointer jumping (``lab[lab]`` to
    fixpoint) — O(log V) outer rounds, deterministic."""
    ids = np.unique(np.concatenate([a, b]))
    src = np.searchsorted(ids, a)
    dst = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        before = lab.copy()
        m = np.minimum(lab[src], lab[dst])
        np.minimum.at(lab, src, m)
        np.minimum.at(lab, dst, m)
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, before):
            break
    # ids is sorted ascending, so the min remapped index IS the min id
    return ids, ids[lab]


def _cc_driver_finish(pairs, nodes_ds, node_col: str):
    """Bounded finish: exact union-find over the materialized pair list,
    broadcast (endpoint, component) lookup, one assignment pass over the
    (possibly huge) node table — nodes absent from the lookup are their
    own singleton component."""
    import ray

    pdf = pairs.to_pandas()
    if "a" not in pdf.columns:
        # Ray drops the schema of ANY empty Dataset on to_pandas (measured,
        # see spatial islands note): zero edges -> every node is a singleton
        a = np.empty(0, np.int64)
        b = np.empty(0, np.int64)
    else:
        a = pdf["a"].to_numpy(dtype=np.int64)
        b = pdf["b"].to_numpy(dtype=np.int64)
    if len(a):
        ids, comp = _numpy_cc(a, b)
    else:
        ids = np.empty(0, np.int64)
        comp = np.empty(0, np.int64)
    lut_ref = ray.put((ids, comp))

    def assign(batch: pa.Table) -> pa.Table:
        k, c = ray.get(lut_ref)
        n = batch.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k):
            idx = np.searchsorted(k, n)
            idx = np.minimum(idx, len(k) - 1)
            hit = k[idx] == n
            out = np.where(hit, c[idx], n)
        else:
            out = n
        return pa.table({node_col: pa.array(n), "component": pa.array(out)})

    return nodes_ds.map_batches(assign, batch_format="pyarrow")


def connected_components(edges_ds, nodes_ds, node_col: str = "doc_id",
                         max_rounds: int = 50,
                         driver_max_edges: int = DRIVER_CC_MAX_EDGES):
    """edges (a, b) + nodes (node_col) -> (node_col, component) where
    component = min node id in the node's connected component; isolated
    nodes form singleton components.  Plan selection (bounded driver
    finish vs distributed min-label BSP) is by measured edge count — see
    the module docstring; ``driver_max_edges=0`` forces the BSP path."""
    from ..functions.reduce import hash_groupby

    def as_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = edges_ds.map_batches(as_pairs, batch_format="pyarrow").materialize()
    if pairs.count() <= driver_max_edges:
        return _cc_driver_finish(pairs, nodes_ds, node_col)
    edges_ds = pairs

    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = edges_ds.map_batches(sym_edges, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    labels = nodes_ds.map_batches(init_labels, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    def tag_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("node"),
                "payload": batch.column("label"),
                "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("src"),
                "payload": batch.column("dst"),
                "kind": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    from ..functions.scale import default_parts

    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    # cluster-sized at build time: the BSP arm IS the beyond-cap scale path
    N_PARTS = default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((k.view(np.uint64) * _GOLDEN) >> np.uint64(52)) % np.uint64(N_PARTS)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    def propagate_part(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized repartition join within one hash partition: labels and
        # the edges reading them are co-partitioned by source node, so one
        # pandas merge pushes every label one hop (no per-node Python —
        # this loop body is the whole BSP superstep for the partition)
        lab = df[df["kind"] == 0][["key", "payload"]].rename(
            columns={"payload": "label"}
        )
        edg = df[df["kind"] == 1][["key", "payload"]].rename(
            columns={"payload": "dst"}
        )
        m = edg.merge(lab, on="key", how="inner")  # dangling endpoints drop
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [lab["key"].to_numpy(dtype=np.int64),
                     m["dst"].to_numpy(dtype=np.int64)]
                ),
                "label": np.concatenate(
                    [lab["label"].to_numpy(dtype=np.int64),
                     m["label"].to_numpy(dtype=np.int64)]
                ),
            }
        )

    for _ in range(max_rounds):
        tagged = labels.map_batches(tag_label, batch_format="pyarrow").union(
            edges.map_batches(tag_edge, batch_format="pyarrow")
        )
        pushed = (
            tagged.map_batches(add_part, batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(propagate_part)
        )
        labels = hash_groupby(pushed, "node", ["label"], how="min").materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {node_col: batch.column("node"), "component": batch.column("label")}
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_survivors(edges_ds, nodes_ds, node_col: str = "doc_id"):
    """-> (node_col, component, is_survivor): survivor = the min-id doc of
    each component (the standard "keep first" dedup policy)."""
    cc = connected_components(edges_ds, nodes_ds, node_col=node_col)

    def mark(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).to_numpy(zero_copy_only=False)
        c = batch.column("component").to_numpy(zero_copy_only=False)
        return batch.append_column("is_survivor", pa.array(n == c))

    return cc.map_batches(mark, batch_format="pyarrow")


def dedup_canonical(edges_ds, docs_ds, node_col: str = "doc_id",
                    text_col: str = "text"):
    """Per duplicate cluster, keep the BEST document (longest text, ties to
    the lowest id) — the keep-best policy real dedup pipelines apply after
    connected components, instead of keep-first.

    -> (component, canonical, best_len), one row per component.

    Scale shape: components (doc-level) meet the (doc_id, tlen) projection
    via union + one exact integer-sum merge keyed on doc_id (each side
    contributes exactly one row per doc, zero-padded on the other side's
    column — sum IS the join, with the vectorized per-partition reduce of
    ``functions.reduce.hash_groupby`` instead of a per-key join); then
    :func:`..relagg.argmax_by` reduces batch-locally so only one candidate
    row per component per batch shuffles.
    """
    import pyarrow.compute as pc

    from ..functions.reduce import hash_groupby
    from .relagg import argmax_by

    cc = connected_components(edges_ds, docs_ds.select_columns([node_col]),
                              node_col=node_col)

    def cc_tagged(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                node_col: batch.column(node_col),
                "component": batch.column("component"),
                "tlen": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def len_tagged(batch: pa.Table) -> pa.Table:
        tlen = pc.cast(pc.utf8_length(batch.column(text_col)), pa.int64())
        n = len(batch)
        return pa.table(
            {
                node_col: batch.column(node_col),
                "component": pa.array(np.zeros(n, dtype=np.int64)),
                "tlen": tlen,
            }
        )

    both = cc.map_batches(cc_tagged, batch_format="pyarrow").union(
        docs_ds.map_batches(len_tagged, batch_format="pyarrow")
    )
    joined = hash_groupby(both, node_col, ["component", "tlen"], how="isum")

    def with_negid(batch: pa.Table) -> pa.Table:
        ids = batch.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("neg_id", pa.array(-ids))

    best = argmax_by(
        joined.map_batches(with_negid, batch_format="pyarrow"),
        "component", ["tlen", "neg_id"], [node_col, "tlen"],
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component": batch.column("component"),
                "canonical": batch.column(node_col),
                "best_len": batch.column("tlen"),
            }
        )

    return best.map_batches(shape, batch_format="pyarrow")
