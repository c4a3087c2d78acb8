"""Connected components over duplicate-pair edges — min-label propagation
(BSP style), the step that turns near-dup PAIRS into dedup CLUSTERS
("keep one doc per component").

Each round: every node pushes its current label along its edges, every
node takes the min of what it hears and what it has; converged when no
label changes (labels are monotonically non-increasing ints, so the global
sum is a convergence witness).  Rounds needed = max component diameter —
small for duplicate clusters.

Scale shape: per round, one union-groupby join (labels + edges keyed by
source node) and one min-reduce keyed by node; the driver loop only reads
a scalar sum per round.  Labels never materialize on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(edges_ds, nodes_ds, node_col: str = "doc_id",
                         max_rounds: int = 50):
    """edges (a, b) + nodes (node_col) -> (node_col, component) where
    component = min node id in the node's connected component; isolated
    nodes form singleton components."""
    from ..functions.reduce import hash_groupby

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

    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    N_PARTS = 64

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
