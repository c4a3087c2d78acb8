"""Zone-mapped clustered parquet output: the "prune at the read" storage
layout for key-ranged re-reads.

``write_clustered`` sorts the dataset by an int64 key and writes one parquet
file per block, recording each file's (key_min, key_max, rows) in a
``zonemap.json`` manifest — file-level statistics a reader can consult
WITHOUT opening any parquet footer.  ``read_pruned`` then serves a key-range
query by reading only the files whose zone overlaps the range (plus one
exact row filter for straddling files).

At 100 TB this is the difference between a range query scanning the world
and scanning a handful of files: the sort clusters each key range into few
files, the manifest is O(files) and lives beside the data, and a resumable
consumer can fetch it in one read.  Parquet row-group min/max stats give the
same pruning WITHIN a file (and ``read_pruned`` still passes the row filter
down so row groups prune too); the zone map adds the cross-FILE level.

Reference analog: the S5/S6 ordered-save contract (results written in a
deterministic key order) — generalized to a partitioned, statistics-indexed
layout instead of one file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ZONEMAP_NAME = "zonemap.json"
_WRITE_SEQ = [0]  # per-worker-process block counter (filename uniquifier)


def write_clustered(ds, out_dir: str, key: str) -> dict:
    """Sort ``ds`` by int64 ``key`` and write one parquet file per block
    plus a ``zonemap.json`` manifest of per-file (min, max, rows).

    The per-file write runs INSIDE the map tasks (data never funnels
    through the driver); only the tiny per-file stats rows come back to
    assemble the manifest.  Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "key_min": pa.array([], pa.int64()),
                             "key_max": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = int(k.min()), int(k.max())
        # pid+counter uniquifier: two blocks full of the SAME duplicate key
        # would otherwise share (lo, hi, rows) and silently overwrite
        seq = _WRITE_SEQ[0] = _WRITE_SEQ[0] + 1
        name = f"part-{lo}-{hi}-{os.getpid()}-{seq}.parquet"
        pq.write_table(batch, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name], pa.string()),
                         "key_min": pa.array([lo], pa.int64()),
                         "key_max": pa.array([hi], pa.int64()),
                         "rows": pa.array([len(batch)], pa.int64())})

    stats = (
        ds.sort(key)
        .map_batches(write_block, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    zones = sorted(
        ({"file": r["file"], "key_min": int(r["key_min"]),
          "key_max": int(r["key_max"]), "rows": int(r["rows"])}
         for r in stats),
        key=lambda z: (z["key_min"], z["file"]),
    )
    manifest = {"key": key, "zones": zones}
    with open(os.path.join(out_dir, ZONEMAP_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def compact_clustered(out_dir: str, target_rows: int = 1_000_000) -> dict:
    """The small-file maintenance pass every clustered layout needs at
    10^12 rows: greedily merge ADJACENT zones (the sort made key ranges
    disjoint, so adjacency preserves clustering) until each output file
    holds ~``target_rows``, rewrite the merged files, refresh the zone map,
    and delete the absorbed inputs.

    Merges stream file-group by file-group (never the whole table in
    memory); zones already at target size are left untouched, so re-running
    compaction is idempotent."""
    with open(os.path.join(out_dir, ZONEMAP_NAME)) as f:
        manifest = json.load(f)
    key = manifest["key"]
    zones = manifest["zones"]
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_rows = 0
    for z in zones:
        cur.append(z)
        cur_rows += z["rows"]
        if cur_rows >= target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
    if cur:
        groups.append(cur)

    new_zones = []
    for g in groups:
        if len(g) == 1:  # already compact: keep as-is (idempotence)
            new_zones.append(g[0])
            continue
        t = pa.concat_tables(
            [pq.read_table(os.path.join(out_dir, z["file"])) for z in g]
        ).combine_chunks()
        lo = min(z["key_min"] for z in g)
        hi = max(z["key_max"] for z in g)
        name = f"part-{lo}-{hi}-{len(t)}.parquet"
        pq.write_table(t, os.path.join(out_dir, name))
        for z in g:
            if z["file"] != name:
                os.remove(os.path.join(out_dir, z["file"]))
        new_zones.append({"file": name, "key_min": lo, "key_max": hi,
                          "rows": len(t)})
    out = {"key": key, "zones": sorted(new_zones,
                                       key=lambda z: (z["key_min"], z["file"]))}
    with open(os.path.join(out_dir, ZONEMAP_NAME), "w") as f:
        json.dump(out, f, indent=1)
    return out


def attach_token_blooms(out_dir: str, text_col: str = "text",
                        m_bits: int = 1 << 17, k_hashes: int = 4) -> dict:
    """Second data-skipping layer: a per-file TOKEN Bloom filter over
    ``text_col`` (whitespace tokens hashed with the vectorized
    ``poly_hash64``), stored as ``<file>.bloom`` beside each zone file and
    flagged in the manifest.  A token-predicate reader can then skip files
    with a definite-no — the text analog of the key zone map.

    Files are independent, so each bloom builds in its own Ray task (the
    rare justified raw-task use: per-file units with no dataset semantics);
    only the 16 KB bitmaps return to the driver."""
    import ray

    from ..functions.hashing import poly_hash64
    from ..stages.join import _bloom_hashes

    with open(os.path.join(out_dir, ZONEMAP_NAME)) as f:
        manifest = json.load(f)

    @ray.remote
    def build(path: str) -> bytes:
        import pyarrow.compute as pc

        t = pq.read_table(path, columns=[text_col])
        split = pc.split_pattern_regex(
            pc.fill_null(t.column(text_col).combine_chunks(), ""), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        toks = np.unique(flat.to_numpy(zero_copy_only=False))
        h = poly_hash64(pa.array(toks, pa.string())).view(np.int64)
        h1, h2 = _bloom_hashes(h)
        bitmap = np.zeros(m_bits // 64, np.uint64)
        for i in range(k_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bitmap, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return bitmap.tobytes()

    refs = {z["file"]: build.remote(os.path.join(out_dir, z["file"]))
            for z in manifest["zones"]}
    for z in manifest["zones"]:
        with open(os.path.join(out_dir, z["file"] + ".bloom"), "wb") as f:
            f.write(ray.get(refs[z["file"]]))
        z["bloom"] = True
    manifest["bloom"] = {"col": text_col, "m_bits": m_bits,
                         "k_hashes": k_hashes}
    with open(os.path.join(out_dir, ZONEMAP_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_token_pruned(out_dir: str, token: str):
    """Token-predicate read: probe each file's token bloom (definite-no
    skips the file), read the probable files, and apply the EXACT row
    filter (a row survives iff one of its whitespace tokens equals
    ``token`` — bloom false positives never reach the result).  Returns
    (Dataset-or-None, n_files_read, n_files_total)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.hashing import poly_hash64
    from ..stages.join import bloom_contains

    with open(os.path.join(out_dir, ZONEMAP_NAME)) as f:
        manifest = json.load(f)
    cfg = manifest["bloom"]
    h = poly_hash64(pa.array([token], pa.string())).view(np.int64)
    hit_files = []
    for z in manifest["zones"]:
        bitmap = np.frombuffer(
            open(os.path.join(out_dir, z["file"] + ".bloom"), "rb").read(),
            np.uint64)
        if bloom_contains(bitmap, h, cfg["m_bits"], cfg["k_hashes"])[0]:
            hit_files.append(os.path.join(out_dir, z["file"]))
    if not hit_files:
        return None, 0, len(manifest["zones"])
    col = cfg["col"]

    def exact(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.fill_null(batch.column(col), ""), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        lens = split.value_lengths().to_numpy(zero_copy_only=False)
        eq = pc.equal(flat, token).to_numpy(zero_copy_only=False)
        owner = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        keep = np.zeros(len(batch), bool)
        keep[owner[eq]] = True
        return batch.filter(pa.array(keep))

    ds = rd.read_parquet(hit_files).map_batches(exact, batch_format="pyarrow")
    return ds, len(hit_files), len(manifest["zones"])


def read_pruned(out_dir: str, lo: int, hi: int):
    """Key-range read ``lo <= key <= hi`` against a clustered directory:
    consult the zone map, read ONLY overlapping files, and push the exact
    range predicate into the parquet read (row-group pruning inside the
    survivors).  Returns (Dataset, n_files_read, n_files_total)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    with open(os.path.join(out_dir, ZONEMAP_NAME)) as f:
        manifest = json.load(f)
    key = manifest["key"]
    zones = manifest["zones"]
    hit = [z for z in zones if z["key_min"] <= hi and z["key_max"] >= lo]
    if not hit:
        return None, 0, len(zones)
    paths = [os.path.join(out_dir, z["file"]) for z in hit]
    ds = rd.read_parquet(
        paths,
        filter=(pads.field(key) >= lo) & (pads.field(key) <= hi),
    )
    return ds, len(hit), len(zones)


BUCKET_MANIFEST = "buckets.json"


def write_bucketed(ds, out_dir: str, key: str, n_buckets: int = 16) -> dict:
    """Hash-bucketed parquet layout: route every row to
    ``coarse_partition(key) % n_buckets`` and write each bucket's rows to
    its own file set, recording a ``buckets.json`` manifest.  Two tables
    bucketed with the SAME key hash and bucket count are join-co-located:
    an equi-join needs NO shuffle at read time — bucket i of A only ever
    matches bucket i of B (:func:`bucketed_join`).  The storage half of
    the Hive/Spark bucketing contract, on the engine's own partitioner.

    Files are written INSIDE the group tasks (data never funnels through
    the driver); only the (bucket, rows, file) manifest rows come back.
    """
    import pandas as pd

    from ..functions.hashing import coarse_partition

    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(coarse_partition(k, n_buckets)))

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bucket": [], "rows": [], "file": []})
        b = int(df["__bucket"].iloc[0])
        _WRITE_SEQ[0] += 1
        name = f"bucket_{b:05d}_{os.getpid()}_{_WRITE_SEQ[0]}.parquet"
        body = df.drop(columns="__bucket")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False),
                       os.path.join(out_dir, name))
        return pd.DataFrame({"bucket": [b], "rows": [len(df)],
                             "file": [name]})

    manifest_df = (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()  # O(files), not data
    )
    buckets: dict[str, list] = {}
    for _, row in manifest_df.iterrows():
        buckets.setdefault(str(int(row["bucket"])), []).append(
            {"file": row["file"], "rows": int(row["rows"])})
    manifest = {"key": key, "n_buckets": n_buckets, "buckets": buckets}
    with open(os.path.join(out_dir, BUCKET_MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def bucketed_join(dir_a: str, dir_b: str, key_a: str, key_b: str,
                  cols_a: list[str], cols_b: list[str]):
    """Shuffle-free equi-join of two :func:`write_bucketed` layouts with
    the same bucket count: ONE task per bucket reads that bucket's files
    from both sides and joins locally (inner).  At 100 TB this is the
    payoff of paying the bucketing shuffle once at WRITE time — every
    subsequent join of the co-bucketed tables is embarrassingly parallel
    read + local hash join, no exchange.
    """
    import pandas as pd
    import ray.data as rd

    with open(os.path.join(dir_a, BUCKET_MANIFEST)) as f:
        ma = json.load(f)
    with open(os.path.join(dir_b, BUCKET_MANIFEST)) as f:
        mb = json.load(f)
    if ma["n_buckets"] != mb["n_buckets"]:
        raise ValueError(
            f"bucketed_join: bucket counts differ "
            f"({ma['n_buckets']} vs {mb['n_buckets']}) — re-bucket one side")
    n = ma["n_buckets"]

    # typed empty result (stable schema for empty buckets): join two
    # zero-row slices of real files once, driver-side
    def _any_file(d, m):
        for ents in m["buckets"].values():
            if ents:
                return os.path.join(d, ents[0]["file"])
        raise ValueError("bucketed_join: empty layout")

    ea = pq.read_table(_any_file(dir_a, ma), columns=cols_a) \
        .slice(0, 0).to_pandas()
    eb = pq.read_table(_any_file(dir_b, mb), columns=cols_b) \
        .slice(0, 0).to_pandas()
    EMPTY = pa.Table.from_pandas(
        ea.merge(eb, left_on=key_a, right_on=key_b), preserve_index=False)

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch.column("id").to_pylist():
            fa = [os.path.join(dir_a, e["file"])
                  for e in ma["buckets"].get(str(b), [])]
            fb = [os.path.join(dir_b, e["file"])
                  for e in mb["buckets"].get(str(b), [])]
            if not fa or not fb:
                continue
            ta = pa.concat_tables([pq.read_table(p, columns=cols_a)
                                   for p in fa]).to_pandas()
            tb = pa.concat_tables([pq.read_table(p, columns=cols_b)
                                   for p in fb]).to_pandas()
            m = ta.merge(tb, left_on=key_a, right_on=key_b)
            outs.append(pa.Table.from_pandas(m, preserve_index=False)
                        .cast(EMPTY.schema))
        if not outs:
            return EMPTY
        return pa.concat_tables(outs)

    return rd.range(n).map_batches(join_bucket, batch_format="pyarrow",
                                   batch_size=1)


# Driver-visible consumer of the clustered layout (VERDICT r3 item 8):
# constants shared by the engine query and the SQL oracle.
ZONE_RANGE_LO = 540431950000000000
ZONE_RANGE_HI = 540431966000000000


def clustered_range_counts(geocoded, lo: int = ZONE_RANGE_LO,
                           hi: int = ZONE_RANGE_HI,
                           out_dir: str | None = None):
    """End-to-end storage-layout pipeline: cluster the geocoded pages by
    ``cell`` into a zone-mapped parquet directory, answer the key-range
    query ``lo <= cell <= hi`` THROUGH :func:`read_pruned` (manifest-level
    file pruning + pushed-down row filter), and aggregate per-cell page
    counts.  Returns ``(pandas(cell, page_count), n_files_read,
    n_files_total)`` — pandas because the range may legitimately be empty
    (Ray's zero-row Datasets drop their schema on to_pandas).

    The write is the one-time clustering cost; every subsequent range query
    reads only overlapping files — the access pattern the ordered-save
    contract (reference S5/S6) exists to serve."""
    import shutil
    import tempfile

    import pandas as pd

    from ..stages.gridops import cell_counts

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="graft_zonemap_")
    try:
        write_clustered(geocoded.select_columns(["cell", "page_id"]),
                        out_dir, "cell")
        ds, n_read, n_total = read_pruned(out_dir, lo, hi)
        if ds is None:
            empty = pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                  "page_count": pd.Series([], dtype="int64")})
            return empty, 0, n_total
        df = (cell_counts(ds).to_pandas()
              .sort_values("cell").reset_index(drop=True))
        return df, n_read, n_total
    finally:
        if own:
            shutil.rmtree(out_dir, ignore_errors=True)


ZONE_TOKEN = "value"  # mid-frequency marker word in the synthetic corpus


def clustered_token_search(pages_ds, token: str = ZONE_TOKEN,
                           out_dir: str | None = None):
    """Second storage-index layer end to end: cluster pages by page_id,
    attach per-file TOKEN Bloom filters, answer a token-predicate query
    THROUGH :func:`read_token_pruned` (bloom definite-no skips files; the
    exact whitespace-token row filter removes false positives).  Returns
    ``(pandas(page_id), n_files_read, n_files_total)`` — the row set is
    exactly "pages whose whitespace tokenization contains ``token``", which
    is what the SQL oracle checks."""
    import shutil
    import tempfile

    import pandas as pd

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="graft_zonebloom_")
    try:
        write_clustered(pages_ds.select_columns(["page_id", "text"]),
                        out_dir, "page_id")
        attach_token_blooms(out_dir)
        ds, n_read, n_total = read_token_pruned(out_dir, token)
        if ds is None:
            empty = pd.DataFrame({"page_id": pd.Series([], dtype="int64")})
            return empty, 0, n_total
        df = (ds.select_columns(["page_id"]).to_pandas()
              .sort_values("page_id").reset_index(drop=True))
        return df, n_read, n_total
    finally:
        if own:
            shutil.rmtree(out_dir, ignore_errors=True)
