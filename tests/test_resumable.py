"""Checkpoint-manifest + resume-skip tests (north_rule: per-partition
lineage + metrics, resume after restart, skip finished partitions)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def test_manifest_skip_and_stale(tmp_path):
    from cuda_gis_smoothing_ray.state.manifest import run_partitioned

    calls: list[str] = []

    def fn(pid: str, pdir: str) -> int:
        calls.append(pid)
        open(os.path.join(pdir, "out.txt"), "w").write(pid)
        return 1

    parts = {"p0": "fpA", "p1": "fpB"}
    man = run_partitioned(parts, fn, str(tmp_path))
    assert calls == ["p0", "p1"]
    assert man.metrics()["partitions"] == 2

    # resume: nothing stale -> nothing re-runs
    calls.clear()
    run_partitioned(parts, fn, str(tmp_path))
    assert calls == []

    # one input changed -> only that partition re-runs
    calls.clear()
    run_partitioned({"p0": "fpA", "p1": "fpB-changed"}, fn, str(tmp_path))
    assert calls == ["p1"]

    # manifest lines are valid JSONL with lineage + metrics
    lines = [json.loads(l) for l in open(tmp_path / "manifest.jsonl")]
    assert all({"partition", "fingerprint", "rows", "path", "wall_s"} <= set(l) for l in lines)


def test_flagship_resumable_matches_direct(sf_dir, tmp_path):
    from cuda_gis_smoothing_ray.pipelines.flagship import flagship
    from cuda_gis_smoothing_ray.pipelines.resumable import flagship_resumable

    out = str(tmp_path / "ckpt")
    got = flagship_resumable(sf_dir, out, n_shards=4).to_pandas().sort_values("cell")
    want = flagship(sf_dir).to_pandas().sort_values("cell")
    got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
    for c in [c for c in want.columns if c != "cell"]:
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=1e-9), c

    # manifest: 4 shards + final, all with rows + wall
    lines = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert {l["partition"] for l in lines} == {"shard0000", "shard0001", "shard0002",
                                              "shard0003", "final"}

    # resume with unchanged input: shards skipped (manifest not re-appended)
    n_before = len(lines)
    flagship_resumable(sf_dir, out, n_shards=4)
    n_after = len(open(os.path.join(out, "manifest.jsonl")).readlines())
    assert n_after == n_before


def test_curation_resumable_parity_and_skip(tmp_path, sf_dir):
    import time

    from cuda_gis_smoothing_ray.pipelines.resumable import curation_resumable
    from cuda_gis_smoothing_ray.stages import textops

    out = str(tmp_path / "curation")
    df = (curation_resumable(sf_dir, out, n_shards=4).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    # resume: every phase checkpointed -> near-instant and identical
    t0 = time.perf_counter()
    df2 = (curation_resumable(sf_dir, out, n_shards=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    resume_s = time.perf_counter() - t0
    assert df.equals(df2)
    assert resume_s < 5.0
    # parity with the one-shot pipeline
    ref = (textops.curate_corpus(textops.read_documents(sf_dir)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    cols = ["doc_id", "clean_text", "word_count"]
    assert df[cols].equals(ref[cols])


def test_curation_resumable_param_change_no_stale_rows(tmp_path, sf_dir):
    from cuda_gis_smoothing_ray.pipelines.resumable import curation_resumable

    out = str(tmp_path / "cur2")
    df1 = curation_resumable(sf_dir, out, n_shards=2).to_pandas()
    # changed parameter -> stale fingerprints -> every shard re-runs; the
    # old part files must be wiped, not appended to
    df2 = curation_resumable(sf_dir, out, n_shards=2, ppm_per_word=10_000).to_pandas()
    assert df2["doc_id"].is_unique
    assert len(df2) >= len(df1)  # higher keep rate can only add docs


def test_zonemap_clustered_write_and_pruned_read(tmp_path):
    """write_clustered sorts + writes per-block files with a zone manifest;
    read_pruned serves a narrow key range from a strict subset of files and
    returns exactly the full-scan-filter row set."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import read_pruned, write_clustered

    n = 20_000
    rng = np.random.default_rng(3)
    keys = rng.permutation(n).astype(np.int64)
    vals = (keys * 7) % 1000
    ds = rd.from_arrow(pa.table({"cell": pa.array(keys),
                                 "v": pa.array(vals)})).repartition(8)
    out = str(tmp_path / "clustered")
    manifest = write_clustered(ds, out, key="cell")
    assert sum(z["rows"] for z in manifest["zones"]) == n
    assert len(manifest["zones"]) > 1
    # zones are disjoint after the sort (clustering property)
    zs = manifest["zones"]
    assert all(zs[i]["key_max"] < zs[i + 1]["key_min"] for i in range(len(zs) - 1))

    lo, hi = 5_000, 5_499
    pruned, n_read, n_total = read_pruned(out, lo, hi)
    assert n_read < n_total  # file-level pruning actually pruned
    got = pruned.to_pandas().sort_values("cell").reset_index(drop=True)
    want_keys = np.sort(keys[(keys >= lo) & (keys <= hi)])
    assert (got["cell"].to_numpy() == want_keys).all()
    assert (got["v"].to_numpy() == (want_keys * 7) % 1000).all()

    # empty range outside every zone: no files touched
    none, n0, _ = read_pruned(out, n + 10, n + 20)
    assert none is None and n0 == 0


def test_zonemap_compaction_preserves_rows_and_pruning(tmp_path):
    """Compaction merges adjacent zones to the target size, keeps ranges
    disjoint, deletes absorbed files, stays idempotent, and pruned reads
    return the identical row set afterwards."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import (
        compact_clustered, read_pruned, write_clustered,
    )

    n = 20_000
    keys = np.arange(n, dtype=np.int64)[::-1].copy()
    ds = rd.from_arrow(pa.table({"cell": pa.array(keys)})).repartition(10)
    out = str(tmp_path / "clustered")
    m0 = write_clustered(ds, out, key="cell")
    assert len(m0["zones"]) >= 4

    m1 = compact_clustered(out, target_rows=n // 2)
    assert len(m1["zones"]) < len(m0["zones"])
    assert sum(z["rows"] for z in m1["zones"]) == n
    zs = m1["zones"]
    assert all(zs[i]["key_max"] < zs[i + 1]["key_min"] for i in range(len(zs) - 1))
    # absorbed files are gone; manifest files all exist
    files = {f for f in os.listdir(out) if f.endswith(".parquet")}
    assert files == {z["file"] for z in zs}
    # idempotent: a second pass changes nothing
    m2 = compact_clustered(out, target_rows=n // 2)
    assert m2 == m1

    pruned, n_read, n_total = read_pruned(out, 100, 199)
    got = np.sort(pruned.to_pandas()["cell"].to_numpy())
    assert (got == np.arange(100, 200)).all()
    assert n_read <= n_total


def test_zonemap_token_bloom_skip_index(tmp_path):
    """Per-file token blooms: a marker token present in one key range reads
    few files and returns exactly its rows; an absent token returns zero
    rows (false positives never reach the result)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import (
        attach_token_blooms, read_token_pruned, write_clustered,
    )

    n = 8_000
    keys = np.arange(n, dtype=np.int64)
    texts = ["common words here"] * n
    for i in range(100, 120):
        texts[i] = "common MARKER words"
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(keys), "text": pa.array(texts),
    })).repartition(8)
    out = str(tmp_path / "clustered")
    write_clustered(ds, out, key="cell")
    m = attach_token_blooms(out)
    assert all(z.get("bloom") for z in m["zones"])

    got, n_read, n_total = read_token_pruned(out, "MARKER")
    rows = got.to_pandas().sort_values("cell")
    assert rows["cell"].tolist() == list(range(100, 120))
    assert n_read < n_total  # the skip index skipped files

    none, n0, _ = read_token_pruned(out, "ABSENT_TOKEN_xyz")
    assert n0 <= n_total
    if none is not None:  # bloom false positive: exact filter still wins
        assert len(none.to_pandas()) == 0


def test_zonemap_duplicate_key_blocks_do_not_collide(tmp_path):
    """A table dominated by ONE key value spans several sorted blocks with
    identical (min, max): every block must still land in its own file."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import read_pruned, write_clustered

    n = 9_000
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(np.full(n, 42, np.int64)),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    })).repartition(6)
    out = str(tmp_path / "dup")
    m = write_clustered(ds, out, key="cell")
    assert sum(z["rows"] for z in m["zones"]) == n
    got, _, _ = read_pruned(out, 42, 42)
    assert len(got.to_pandas()) == n


def test_incremental_metrics_exact_parity(sf_dir, tmp_path):
    """Incremental maintenance: partials written from the BASE half plus a
    merge of the DELTA half reproduce the full-rescan cell metric table
    EXACTLY (integer-valued sums are order-independent in float64), and
    the delta path never reads base pages (it reads the partial files)."""
    import numpy as np
    import pyarrow as pa

    from cuda_gis_smoothing_ray.pipelines.flagship import cell_metrics
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.state import incr

    def half(parity):
        def f(batch: pa.Table) -> pa.Table:
            pid = batch.column("page_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(pid % 2 == parity))
        return f

    def geocoded():
        return geo_encode(read_pages(sf_dir, include_html=False), res=7)

    base = geocoded().map_batches(half(0), batch_format="pyarrow")
    delta = geocoded().map_batches(half(1), batch_format="pyarrow")

    out = str(tmp_path / "partials")
    man = incr.write_partials(base, out)
    assert man["pages"] > 0 and man["rows_cells"] > 0

    inc = incr.incremental_metrics(out, delta).to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    full = cell_metrics(geocoded()).to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    assert len(inc) == len(full)
    assert (inc["cell"].to_numpy() == full["cell"].to_numpy()).all()
    assert (inc["page_count"].to_numpy() == full["page_count"].to_numpy()).all()
    for c in ("chars_mean", "en_share", "mention_rate"):
        assert np.array_equal(inc[c].to_numpy(), full[c].to_numpy())


def test_clustered_range_counts_prunes_and_counts(tmp_path):
    """The driver-visible zonemap_range pipeline: clustered write, pruned
    range read (files_read < files_total — the layout actually skipped
    data), per-cell counts equal to a full-scan recount."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import clustered_range_counts

    n = 30_000
    rng = np.random.default_rng(11)
    cells = rng.integers(0, 600, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "cell": pa.array(cells),
        "page_id": pa.array(np.arange(n, dtype=np.int64)),
    })).repartition(8)
    out = str(tmp_path / "zr")
    lo, hi = 100, 199
    df, n_read, n_total = clustered_range_counts(ds, lo, hi, out_dir=out)
    assert 0 < n_read < n_total
    sel = cells[(cells >= lo) & (cells <= hi)]
    want_cells, want_counts = np.unique(sel, return_counts=True)
    assert (df["cell"].to_numpy() == want_cells).all()
    assert (df["page_count"].to_numpy() == want_counts).all()

    # empty range -> typed empty pandas frame (schema survives zero rows)
    empty, r0, _ = clustered_range_counts(ds, 10_000, 10_001, out_dir=out)
    assert r0 == 0 and len(empty) == 0
    assert list(empty.columns) == ["cell", "page_count"]


def test_clustered_token_search_prunes_and_filters(tmp_path):
    """Bloom-layer pipeline: a rare token prunes most files at the bloom
    probe, and the exact filter returns precisely the owning rows."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.state.zonemap import clustered_token_search

    n = 4_000
    texts = [f"filler words row {i}" for i in range(n)]
    texts[1234] = "filler RAREMARK row"
    texts[3456] = "RAREMARK alone"
    ds = rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
    })).repartition(8)
    out = str(tmp_path / "zb")
    df, n_read, n_total = clustered_token_search(ds, "RAREMARK", out_dir=out)
    assert 0 < n_read < n_total
    assert df["page_id"].tolist() == [1234, 3456]
    # token absent everywhere: bloom answers definite-no for every file
    empty, r0, _ = clustered_token_search(ds, "NEVERSEEN", out_dir=out + "2")
    assert r0 == 0 and len(empty) == 0
    # substring of a longer token must NOT match (whitespace-token equality)
    none2, _, _ = clustered_token_search(ds, "RARE", out_dir=out + "3")
    assert len(none2) == 0
