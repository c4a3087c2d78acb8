"""Regression locks for the session-5 operator batch: compact/uncompact
round trip, flow-accumulation drainage laws, JL sign determinism, burst
threshold math, budget-selection boundary, stump optimality (brute force),
and the q16 pack-width guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cuda_gis_smoothing_ray.functions import hexgrid as hg


def _geocoded(sf_dir):
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode

    return geo_encode(read_pages(sf_dir, include_html=False), res=7)


def test_compact_uncompact_roundtrip(sf_dir):
    """uncompact(compact(cells)) == the original populated-cell set, and
    the compacted cover is never larger than the input."""
    from cuda_gis_smoothing_ray.stages import gridops

    geo = _geocoded(sf_dir)
    orig = set(gridops.cell_counts(geo).to_pandas()["cell"])
    cover = gridops.compact_cells(geo, res=7).to_pandas()
    assert len(cover) <= len(orig)
    # parents really are at res 6, children at res 7
    res_of = cover["cell"].to_numpy() >> 56
    assert (res_of[cover["is_parent"] == 1] == 6).all()
    assert (res_of[cover["is_parent"] == 0] == 7).all()
    back = set(gridops.uncompact_cells(geo, res=7).to_pandas()["cell"])
    assert back == orig


def test_compact_full_block_synthetic():
    """A parent's complete child set (derived arithmetically) compacts to
    exactly one parent row."""
    from cuda_gis_smoothing_ray.stages import gridops

    res, parent_res = 7, 6
    # children of one parent: probe the k-ring-2 disc of the anchor
    parent = hg.latlon_to_cell(np.array([10.0]), np.array([10.0]), parent_res)
    _, pq, pr = hg.unpack(parent)
    plat, plon = hg.axial_to_latlon(pq, pr, parent_res)
    aq, ar = hg.latlon_to_axial(plat, plon, res)
    offs = hg.ring_offsets(1) + hg.ring_offsets(2) + [(0, 0)]
    dq = np.array([o[0] for o in offs])
    dr = np.array([o[1] for o in offs])
    cq, cr = aq[:, None] + dq, ar[:, None] + dr
    clat, clon = hg.axial_to_latlon(cq, cr, res)
    pq2, pr2 = hg.latlon_to_axial(clat, clon, parent_res)
    ok = (pq2 == pq[:, None]) & (pr2 == pr[:, None])
    children = hg.pack(res, cq[ok], cr[ok])
    assert len(children) >= 3  # aperture-4-ish grid
    import ray.data as rd

    lat, lon = hg.cell_to_latlon(children)
    geo = rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(len(children), dtype=np.int64)),
        "lat": pa.array(lat), "lon": pa.array(lon),
        "cell": pa.array(children),
    }))
    cover = gridops.compact_cells(geo, res=res).to_pandas()
    assert len(cover) == 1
    assert int(cover["is_parent"].iloc[0]) == 1
    assert int(cover["cell"].iloc[0]) == int(parent[0])


def test_flow_accumulation_laws(sf_dir):
    """Drains point at strictly-lower-valued ring-1 neighbors; acc >= 1
    everywhere; the total inflow bound holds (sum(acc) <= n * (steps+1))."""
    from cuda_gis_smoothing_ray.stages import gridops

    geo = _geocoded(sf_dir)
    cells = gridops.cell_counts(geo).to_pandas()
    vals = dict(zip(cells["cell"], cells["page_count"]))
    out = gridops.flow_accumulation(geo).to_pandas()
    assert set(out["cell"]) == set(cells["cell"])
    assert (out["acc"] >= 1).all()
    assert out["acc"].sum() <= len(out) * (gridops.FLOW_STEPS + 1)
    for cell, dst in zip(out["cell"], out["drain_to"]):
        if dst == -1:
            continue
        assert vals[dst] < vals[cell]
        _, q1, r1 = hg.unpack(np.array([cell]))
        _, q2, r2 = hg.unpack(np.array([dst]))
        assert int(hg.hex_distance(q1, r1, q2, r2)[0]) == 1


def test_jl_signs_deterministic_and_balanced():
    from cuda_gis_smoothing_ray.stages.ann import jl_signs

    s1 = jl_signs(64, 16)
    s2 = jl_signs(64, 16)
    assert (s1 == s2).all()
    assert set(np.unique(s1)) == {-1, 1}
    # splitmix mixing: no column is constant and signs are roughly balanced
    assert (np.abs(s1.sum(axis=0)) < 64).all()
    assert abs(int(s1.sum())) < 64 * 16 // 4


def test_burst_hours_math():
    """Hand-built series: one spike over a flat background must be the
    only burst; a constant series has none."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import burst_hours

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hours = np.arange(50, dtype="timedelta64[h]").astype("timedelta64[us]")
    ts = [base + h for h in hours]  # one event per hour
    ts += [base + hours[7]] * 40    # spike at hour 7
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
    out = burst_hours(ds).to_pandas()
    assert len(out) == 1
    assert int(out["cnt"].iloc[0]) == 41
    flat = rd.from_arrow(pa.table({"ts": pa.array(ts[:50], pa.timestamp("us"))}))
    assert len(burst_hours(flat).to_pandas()) == 0


def test_cusum_change_level_shift():
    """Planted level shift: 20 hours at 1 event/h then 20 hours at 5/h.
    The CUSUM |S_t| over the mean-cleared series peaks exactly at the last
    pre-shift hour; a constant series yields S_t = 0 everywhere with the
    earliest-hour tie."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import cusum_change

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = []
    for h in range(20):
        ts += [base + np.timedelta64(h, "h")] * 1
    for h in range(20, 40):
        ts += [base + np.timedelta64(h, "h")] * 5
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
    out = cusum_change(ds).to_pandas()
    assert len(out) == 1
    assert int(out["n_hours"].iloc[0]) == 40
    base_hr = int(np.datetime64("2024-01-01T00", "h").astype(np.int64))
    assert int(out["chg_hr"].iloc[0]) == base_hr + 19  # last low hour
    # hand math: n=40, S1=120; at t=19 cum = 20*(40*1-120) = -1600
    assert int(out["cusum"].iloc[0]) == -1600
    flat = rd.from_arrow(pa.table(
        {"ts": pa.array(ts[:20], pa.timestamp("us"))}))
    f = cusum_change(flat).to_pandas()
    assert int(f["cusum"].iloc[0]) == 0
    assert int(f["chg_hr"].iloc[0]) == base_hr  # earliest tie


def test_token_budget_boundary():
    """The kept set is exactly the SQL window-prefix: docs in (n_chars
    DESC, doc_id) order while cumulative tokens <= total // 4."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.textops import token_budget_select

    rng = np.random.RandomState(7)
    n = 200
    toks = rng.randint(1, 30, n)
    texts = [" ".join(["w"] * int(t)) for t in toks]
    nch = rng.randint(10, 40, n).astype(np.int64)  # many value ties
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array(nch),
    }))
    got = set(token_budget_select(ds).to_pandas()["doc_id"])
    df = pd.DataFrame({"doc_id": np.arange(n), "n_chars": nch, "t": toks})
    df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    budget = int(toks.sum()) // 4
    want = set(df["doc_id"].to_numpy()[df["t"].cumsum().to_numpy() <= budget])
    assert got == want


def test_decision_stump_brute_force():
    """The distributed stump equals the O(n^2) brute-force optimum."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.sketch import decision_stump

    rng = np.random.RandomState(3)
    n = 300
    nch = rng.randint(0, 50, n).astype(np.int64)
    lang = np.where(nch + rng.randint(-10, 10, n) > 25, "en", "de")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_chars": pa.array(nch),
        "lang": pa.array(lang.tolist(), pa.string()),
    }))
    got = decision_stump(ds).to_pandas().iloc[0]
    best = None
    for t in np.unique(nch):
        left = nch <= t
        pos_l = int((lang[left] == "en").sum())
        pos_r = int((lang[~left] == "en").sum())
        err = min(pos_l, int(left.sum()) - pos_l) \
            + min(pos_r, int((~left).sum()) - pos_r)
        if best is None or err < best[0]:
            best = (err, int(t))
    assert int(got["err"]) == best[0]
    assert int(got["threshold"]) == best[1]


def test_q16_pack_width_guard(sf_dir):
    """Suppliers at >= 2^50 must raise the documented pack-width error,
    not silently corrupt the pair key."""
    from cuda_gis_smoothing_ray.stages.relagg import tpch_q16

    # monkeypatch-free check: the guard is in the batch fn; simulate by
    # calling the real query (ids are tiny -> no raise) and asserting the
    # guard constant is what the docstring promises
    import inspect

    src = inspect.getsource(tpch_q16)
    assert "1 << 50" in src and "re-shard" in src
    # and the real run still works
    out = tpch_q16(sf_dir).to_pandas()
    assert (out["supplier_cnt"] >= 1).all()


def test_watershed_basins(sf_dir):
    """Sinks are fixed points; every cell's sink is a true sink (drains to
    -1 in flow_accumulation's drain table); pointer doubling resolved all
    paths (no cell labeled with a non-sink)."""
    from cuda_gis_smoothing_ray.stages import gridops

    geo = _geocoded(sf_dir)
    ws = gridops.watershed(geo).to_pandas()
    fl = gridops.flow_accumulation(geo).to_pandas()
    drain = dict(zip(fl["cell"], fl["drain_to"]))
    sinks = {c for c, d in drain.items() if d == -1}
    assert set(ws["cell"]) == set(fl["cell"])
    assert set(ws["sink"]).issubset(sinks)
    # each sink labels itself
    for c, s in zip(ws["cell"], ws["sink"]):
        if c in sinks:
            assert s == c


def test_bucketed_layout_colocation(tmp_path):
    """Every file of bucket i holds only keys hashing to i, and the
    co-located join equals a plain merge."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from cuda_gis_smoothing_ray.functions.hashing import coarse_partition
    from cuda_gis_smoothing_ray.state.zonemap import (BUCKET_MANIFEST,
                                                      bucketed_join,
                                                      write_bucketed)

    rng = np.random.RandomState(5)
    n = 500
    a = pa.table({"k": pa.array(rng.permutation(n).astype(np.int64)),
                  "x": pa.array(np.arange(n, dtype=np.int64))})
    b = pa.table({"k2": pa.array(rng.permutation(n)[: n // 2].astype(np.int64)),
                  "y": pa.array(np.arange(n // 2, dtype=np.int64))})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(rd.from_arrow(a), da, key="k", n_buckets=8)
    write_bucketed(rd.from_arrow(b), db, key="k2", n_buckets=8)
    man = json.load(open(os.path.join(da, BUCKET_MANIFEST)))
    for bkt, ents in man["buckets"].items():
        for e in ents:
            keys = pq.read_table(os.path.join(da, e["file"]))["k"] \
                .to_numpy(zero_copy_only=False)
            assert (coarse_partition(keys.astype(np.int64), 8)
                    == int(bkt)).all()
    got = bucketed_join(da, db, "k", "k2", ["k", "x"], ["k2", "y"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = a.to_pandas().merge(b.to_pandas(), left_on="k", right_on="k2") \
        .sort_values("k").reset_index(drop=True)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["y"].to_numpy() == want["y"].to_numpy()).all()
