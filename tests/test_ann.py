"""Similarity-search tests: brute-force numpy oracle + LSH recall gate on a
planted-cluster fixture."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    """embeddings.parquet with 20 clusters x 25 near-identical members —
    ANN has unambiguous true neighbors here."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 64))
    vecs = np.repeat(centers, 25, axis=0) + 0.05 * rng.standard_normal((500, 64))
    d = tmp_path_factory.mktemp("emb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(500, dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array((np.arange(500) // 25).astype(np.int32)),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    return str(d)


def test_seq_dot_matches_np_dot():
    from cuda_gis_smoothing_ray.stages.ann import seq_dot, seq_sq_norm

    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, 64))
    q = rng.standard_normal(64)
    assert np.allclose(seq_dot(x, q), x @ q, rtol=1e-12)
    assert np.allclose(seq_sq_norm(x), (x * x).sum(axis=1), rtol=1e-12)


def test_bruteforce_topk_matches_numpy(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import ann_bruteforce, read_embeddings

    out = ann_bruteforce(read_embeddings(clustered_dir), clustered_dir, k=5).to_pandas()
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = n @ n.T
    for qid in range(8):
        s = sims[qid].copy()
        s[qid] = -np.inf
        want = np.lexsort((np.arange(500), -s))[:5]
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].to_numpy()
        assert (got == want).all(), (qid, got, want)


def test_lsh_recall_on_clusters(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import (
        ann_bruteforce,
        ann_lsh,
        read_embeddings,
    )

    k = 10
    brute = ann_bruteforce(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    approx = ann_lsh(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    recalls = []
    for qid in range(8):
        truth = set(brute[brute["query_id"] == qid]["vec_id"])
        got = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / k)
    assert np.mean(recalls) >= 0.8, recalls


def test_neardup_pairs_within_cluster(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import embedding_neardup, read_embeddings

    out = embedding_neardup(
        read_embeddings(clustered_dir), clustered_dir, threshold=0.95
    ).to_pandas()
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    lab = t.column("label").to_numpy(zero_copy_only=False)
    assert len(out) > 0
    # cosine >= 0.95 pairs must be same-cluster at this noise level
    assert (lab[out["a"].to_numpy()] == lab[out["b"].to_numpy()]).all()


def test_ivf_recall_on_clusters(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import ann_bruteforce, ann_ivf, read_embeddings

    k = 10
    brute = ann_bruteforce(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    ivf = ann_ivf(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    recalls = []
    for qid in brute["query_id"].unique():
        truth = set(brute[brute["query_id"] == qid]["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / k)
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_centroids_deterministic(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import train_ivf_centroids

    a = train_ivf_centroids(clustered_dir)
    b = train_ivf_centroids(clustered_dir)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_seq_dot_blocked_bit_identical():
    """The blocked verify matmul must be BIT-identical to the per-row
    seq_dot path it replaced (oracle parity depends on it)."""
    from cuda_gis_smoothing_ray.stages.ann import seq_dot, seq_dot_blocked

    rng = np.random.default_rng(3)
    x = rng.standard_normal((37, 64))
    y = rng.standard_normal((53, 64))
    blocked = seq_dot_blocked(x, y)
    for i in range(len(x)):
        assert np.array_equal(blocked[i], seq_dot(y, x[i]))


def test_neardup_matches_allpairs_numpy(clustered_dir):
    """embedding_neardup (cluster-pruned, blocked) == the O(N^2) numpy
    oracle — exactness of the triangle-inequality pruning."""
    from cuda_gis_smoothing_ray.stages.ann import embedding_neardup, read_embeddings

    t = 0.6
    out = (
        embedding_neardup(read_embeddings(clustered_dir), clustered_dir, threshold=t)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    tab = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    x = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    n = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = n @ n.T
    a, b = np.nonzero(np.triu(sims >= t, k=1))
    assert len(out) == len(a)
    assert np.array_equal(out["a"].to_numpy(), a)
    assert np.array_equal(out["b"].to_numpy(), b)
    assert np.allclose(out["cosine"].to_numpy(), sims[a, b], atol=2e-6)


def test_neardup_pruning_is_active(tmp_path):
    """With 16 tight, well-separated, INTERLEAVED clusters (so the IVF
    training sample covers all of them) and a 0.9 threshold, the angular
    bound must prune most of the n_list*(n_list+1)/2 cluster pairs — the
    property that makes the plan sub-quadratic on clusterable data (and
    proves the old whole-table broadcast is gone: work is per surviving
    cluster pair)."""
    from cuda_gis_smoothing_ray.stages.ann import (
        IVF_N_LIST,
        _emb_matrix,
        seq_sq_norm,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # round-robin cluster order: vec_id % 16 == cluster
    vecs = np.tile(centers, (30, 1)) + 0.02 * rng.standard_normal((480, 64))
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(480, dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        f"{d}/embeddings.parquet",
    )

    cent = train_ivf_centroids(d, IVF_N_LIST)
    tab = pq.read_table(f"{d}/embeddings.parquet")
    x = _emb_matrix(tab)
    xn = np.sqrt(seq_sq_norm(x))
    xnorm = x / np.maximum(xn, 1e-9)[:, None]
    sims = xnorm @ cent.T
    assign = np.argmax(sims, axis=1)
    ang = np.arccos(np.clip(sims[np.arange(len(x)), assign], -1.0, 1.0))
    radius = np.zeros(IVF_N_LIST)
    for c in range(IVF_N_LIST):
        m = assign == c
        if m.any():
            radius[c] = ang[m].max()
    ang_cc = np.arccos(np.clip(cent @ cent.T, -1.0, 1.0))
    ii, jj = np.triu_indices(IVF_N_LIST)
    limit = np.arccos(0.9)
    kept = (ang_cc[ii, jj] - radius[ii] - radius[jj] <= limit).sum()
    assert kept < len(ii) / 2, (kept, len(ii))

    # and the pruned plan still returns the exact all-pairs answer here
    import ray.data as rd
    from cuda_gis_smoothing_ray.stages.ann import embedding_neardup

    out = (
        embedding_neardup(rd.read_parquet(f"{d}/embeddings.parquet"), d, threshold=0.9)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    full = xnorm @ xnorm.T
    a, b = np.nonzero(np.triu(full >= 0.9, k=1))
    assert len(out) == len(a)
    assert np.array_equal(out["a"].to_numpy(), a)
    assert np.array_equal(out["b"].to_numpy(), b)


def test_neardup_broadcasts_only_small_objects(clustered_dir, monkeypatch):
    """The plan may ray.put only SMALL driver-side objects (codebook,
    pair-group map) — never the embedding table (the round-1 scale-killer)."""
    import ray

    from cuda_gis_smoothing_ray.stages import ann

    sizes = []
    real_put = ray.put

    def spy_put(obj, **kw):
        from ray import cloudpickle

        sizes.append(len(cloudpickle.dumps(obj)))
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    out = ann.embedding_neardup(
        ann.read_embeddings(clustered_dir), clustered_dir, threshold=0.9
    ).to_pandas()
    assert len(out) > 0
    table_bytes = 500 * 64 * 4  # the embedding payload itself
    assert sizes and max(sizes) < table_bytes / 4, sizes


def test_pq_recall_on_clusters(clustered_dir):
    """PQ asymmetric-distance top-k must recover most true neighbors on the
    planted clusters (codes are 8 bytes/vector vs 256 raw)."""
    from cuda_gis_smoothing_ray.stages.ann import ann_bruteforce, ann_pq, read_embeddings

    k = 10
    brute = ann_bruteforce(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    pq_res = ann_pq(read_embeddings(clustered_dir), clustered_dir, k=k).to_pandas()
    recalls = []
    for qid in brute["query_id"].unique():
        truth = set(brute[brute["query_id"] == qid]["vec_id"])
        got = set(pq_res[pq_res["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / k)
    assert np.mean(recalls) >= 0.7, recalls


def test_pq_codes_deterministic_and_compact(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import (
        PQ_K,
        PQ_M,
        _emb_matrix,
        pq_encode,
        train_pq_codebooks,
    )

    b1 = train_pq_codebooks(clustered_dir)
    b2 = train_pq_codebooks(clustered_dir)
    assert np.array_equal(b1, b2)
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    codes = pq_encode(_emb_matrix(t), b1)
    assert codes.dtype == np.uint8 and codes.shape == (500, PQ_M)
    assert codes.max() < PQ_K


def test_label_centroids_exact(sf_dir):
    """Fixed-point centroid sums equal a direct numpy computation, and the
    implied means are within fixed-point resolution of the float means."""
    import numpy as np
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.ann import CENTROID_SCALE, label_centroids

    got = label_centroids(sf_dir).to_pandas()
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    scaled = np.floor(x * CENTROID_SCALE + 0.5).astype(np.int64)
    for lab in np.unique(labels):
        m = labels == lab
        want = scaled[m].sum(axis=0)
        rows = got[got["label"] == lab].sort_values("dim")
        assert (rows["sum_scaled"].to_numpy() == want).all()
        assert (rows["n"] == m.sum()).all()
        mean_fixed = rows["sum_scaled"].to_numpy() / m.sum() / CENTROID_SCALE
        assert np.abs(mean_fixed - x[m].mean(axis=0)).max() < 1e-6


def test_kmeans_matches_brute_force_lloyd():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.ann import CENTROID_SCALE, kmeans_assign

    rng = np.random.default_rng(11)
    n, dim, k, iters = 120, 8, 3, 4
    x = (rng.normal(size=(n, dim)) * 0.3).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    })).repartition(5)

    got = kmeans_assign(ds, k=k, iters=iters).to_pandas().sort_values("vec_id")

    # driver-side Lloyd with the identical fixed-point rules
    q = np.floor(x.astype(np.float64) * CENTROID_SCALE + 0.5).astype(np.int64)
    cent = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = q[a == c].sum(axis=0) // (a == c).sum()
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)

    assert got["cluster"].to_numpy().tolist() == want.tolist()
    assert len(np.unique(want)) > 1  # non-vacuous: clusters actually split


def test_quantize_int8_reconstruction_error_bounded():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.ann import quantize_int8

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 64)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    )
    out = quantize_int8(ds).to_pandas().set_index("vec_id")
    for i in range(50):
        v = vecs[i].astype(np.float64)
        vmin, vmax = v.min(), v.max()
        scale = (vmax - vmin) / 255.0
        codes = np.floor((v - vmin) / scale + 0.5).astype(np.int64)
        assert out.loc[i, "code_sum"] == codes.sum()
        assert out.loc[i, "code_min"] == codes.min() >= 0
        assert out.loc[i, "code_max"] == codes.max() <= 255
        # dequantization error bounded by half a step
        err = np.abs((vmin + codes * scale) - v).max()
        assert err <= scale / 2 + 1e-12


def test_ann_recall_surfacing(sf_dir):
    from cuda_gis_smoothing_ray.stages.ann import ann_recall

    df = ann_recall(sf_dir, k=5).to_pandas()
    assert list(df["method"]) == ["lsh", "ivf", "pq"]
    assert ((df["recall_at_k"] >= 0.0) & (df["recall_at_k"] <= 1.0)).all()
    assert (df["min_query_recall"] <= df["recall_at_k"]).all()
    assert (df["n_queries"] > 0).all()


def test_pca_power_matches_float_power_iteration(sf_dir):
    """The exact-integer supersteps track the FLOAT power iteration run
    for the same K with the same start (|cos| > 0.999) — the operator's
    contract is "K power-iteration steps", not the eigenvector itself
    (this Gram's eigengap is tiny: lambda2/lambda1 ~ 0.98, so no power
    method isolates the eigenvector in few steps).  Also: the renorm keeps
    every component within vscale, and the Rayleigh quotient improves over
    the start vector."""
    import numpy as np

    from cuda_gis_smoothing_ray.stages import ann

    ds = ann.read_embeddings(sf_dir)
    out = ann.pca_power(ds).to_pandas().sort_values("i")
    v = out["v"].to_numpy(np.float64)
    assert np.abs(v).max() <= ann.PCA_VSCALE

    gram = ann.embedding_gram(ann.read_embeddings(sf_dir)).to_pandas()
    d = int(gram["j"].max())
    G = np.zeros((d, d))
    for i, j, g in zip(gram["i"], gram["j"], gram["gram"]):
        G[i - 1, j - 1] = g
        G[j - 1, i - 1] = g
    f = np.ones(d)
    for _ in range(ann.PCA_ITERS):
        f = G @ f
        f /= np.abs(f).max()
    cos = abs(f @ v) / (np.linalg.norm(f) * np.linalg.norm(v))
    assert cos > 0.999

    def rayleigh(x):
        return (x @ G @ x) / (x @ x)

    assert rayleigh(v) > rayleigh(np.ones(d))


def test_kmeans_inertia_consistency(sf_dir):
    """Cluster sizes sum to the table size and match kmeans_assign's
    partition; sse is a true within-cluster minimum: moving any cluster's
    centroid report to another cluster's centroid never lowers its sse
    (spot-checked on the two largest clusters)."""
    import numpy as np

    from cuda_gis_smoothing_ray.stages import ann

    inert = ann.kmeans_inertia(ann.read_embeddings(sf_dir)).to_pandas()
    lab = ann.kmeans_assign(ann.read_embeddings(sf_dir)).to_pandas()
    sizes = lab.groupby("cluster").size()
    assert int(inert["n"].sum()) == len(lab)
    for r in inert.itertuples():
        assert int(sizes.loc[int(r.cluster)]) == int(r.n)
    assert (inert["sse12"] >= 0).all()
    assert (inert["n"] > 0).all()


def test_perceptron_train_separable(tmp_path):
    """On a linearly separable fixture the K-step batch perceptron drives
    the misclassified count to zero, and step-1 weights equal sum(y*x)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.ann import perceptron_train

    rng = np.random.default_rng(7)
    pos = rng.normal(3.0, 0.2, (20, 4)).astype(np.float32)
    neg = rng.normal(-3.0, 0.2, (20, 4)).astype(np.float32)
    vecs = np.vstack([pos, neg])
    labels = np.array([0] * 20 + [9] * 20, dtype=np.int32)  # <5 -> +1
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = perceptron_train(str(tmp_path), iters=2).to_pandas()
    assert int(out["n_mis"].iloc[0]) == 0
    xq = np.floor(vecs.astype(np.float64) * 4096 + 0.5).astype(np.int64)
    y = np.where(labels < 5, 1, -1)
    w1 = (y[:, None] * xq).sum(axis=0)
    # step 2 finds no misclassified rows, so w stays at step-1's value
    assert (out["w"].to_numpy() == w1).all()


def test_fisher_ratio_separated_vs_mixed(tmp_path):
    """Well-separated classes give a much larger Fisher ratio than the
    same clouds with shuffled labels."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.ann import fisher_ratio

    rng = np.random.default_rng(3)
    a = rng.normal(2.0, 0.1, (30, 8)).astype(np.float32)
    b = rng.normal(-2.0, 0.1, (30, 8)).astype(np.float32)
    vecs = np.vstack([a, b])

    def write(labels, name):
        t = pa.table({
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        d = tmp_path / name
        d.mkdir()
        pq.write_table(t, d / "embeddings.parquet")
        return str(d)

    sep = fisher_ratio(write([0] * 30 + [1] * 30, "sep")).to_pandas()
    mixed_labels = ([0, 1] * 30)[:60]
    mix = fisher_ratio(write(mixed_labels, "mix")).to_pandas()
    assert float(sep["fisher"].iloc[0]) > 100 * float(mix["fisher"].iloc[0])
    assert int(sep["n"].iloc[0]) == 60


def test_embedding_stats_anisotropy_bounds(tmp_path):
    """Identical vectors give anisotropy 1; exact opposite pairs give
    ~0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.ann import embedding_stats

    def write(vecs, name):
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        d = tmp_path / name
        d.mkdir()
        pq.write_table(t, d / "embeddings.parquet")
        return str(d)

    same = [[1.0, 0.0, 0.0, 0.0]] * 8
    out1 = embedding_stats(write(same, "same")).to_pandas()
    assert abs(float(out1["anisotropy"].iloc[0]) - 1.0) < 1e-6
    opp = [[1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]] * 4
    out2 = embedding_stats(write(opp, "opp")).to_pandas()
    assert float(out2["anisotropy"].iloc[0]) < 1e-6


def test_silhouette_lite_separated_clusters(tmp_path):
    """Two well-separated blobs with seed vectors in each give mean_s
    near 1 for both clusters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuda_gis_smoothing_ray.stages.ann import silhouette_lite

    rng = np.random.default_rng(11)
    a = rng.normal(5.0, 0.05, (20, 4)).astype(np.float32)
    b = rng.normal(-5.0, 0.05, (20, 4)).astype(np.float32)
    # vec_ids 0 and 1 must live in DIFFERENT blobs (they seed k-means)
    vecs = np.empty((40, 4), np.float32)
    vecs[0], vecs[1] = a[0], b[0]
    vecs[2:21], vecs[21:] = a[1:], b[1:]
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = silhouette_lite(str(tmp_path), k=2, iters=3).to_pandas()
    assert len(out) == 2
    assert (out["mean_s"] > 0.9).all()


def _quant_all(clustered_dir):
    from cuda_gis_smoothing_ray.stages.ann import CENTROID_SCALE

    t = pq.read_table(f"{clustered_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    return np.floor(X * CENTROID_SCALE + 0.5).astype(np.int64)


def test_ann_ivf_int_matches_driver_reference(clustered_dir):
    """Independent driver-side re-derivation of the tiny IVF twin: exact
    int64 assignment via the engine's own Lloyd result, then brute-force
    (dist2, id)-ordered top-k inside probed lists."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages import ann

    ds = rd.read_parquet(f"{clustered_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = ann.ann_ivf_int(ds).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)

    X = _quant_all(clustered_dir)
    cent = ann._kmeans_centroids(ds, ann.IVF_TINY_NLIST, ann.IVF_TINY_ITERS)
    assign = ann._assign_int(X, cent)
    rows = []
    for q in range(ann.IVF_TINY_NQ):
        dqc = ((X[q][None, :] - cent) ** 2).sum(axis=1)
        probe = np.argsort(dqc, kind="stable")[: ann.IVF_TINY_NPROBE]
        cand = np.nonzero(np.isin(assign, probe) & (np.arange(len(X)) != q))[0]
        d2 = ((X[cand] - X[q][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((cand, d2))[: ann.IVF_TINY_K]
        for r, o in enumerate(order, 1):
            rows.append((q, r, int(cand[o]), int(d2[o])))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_ann_pq_int_matches_driver_reference(clustered_dir):
    """Same independent re-derivation for the tiny PQ twin: engine
    codebooks, driver-side exact encode + ADC + (adc, id) top-k."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages import ann

    ds = rd.read_parquet(f"{clustered_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = ann.ann_pq_int(ds).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)

    X = _quant_all(clustered_dir)
    books = ann._pq_books_int(ds, ann.PQ_TINY_M, ann.PQ_TINY_CODES,
                              ann.PQ_TINY_NTRAIN, ann.PQ_TINY_ITERS)
    codes = ann._pq_codes_int(X, books)
    d_sub = books.shape[2]
    rows = []
    for q in range(ann.PQ_TINY_NQ):
        adc = np.zeros(len(X), dtype=np.int64)
        for s in range(ann.PQ_TINY_M):
            qs = X[q, s * d_sub:(s + 1) * d_sub]
            lut = ((books[s] - qs[None, :]) ** 2).sum(axis=1)
            adc += lut[codes[:, s]]
        cand = np.nonzero(np.arange(len(X)) != q)[0]
        order = np.lexsort((cand, adc[cand]))[: ann.PQ_TINY_K]
        for r, o in enumerate(order, 1):
            rows.append((q, r, int(cand[o]), int(adc[cand[o]])))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_ann_lsh_int_matches_driver_reference(clustered_dir):
    """Independent driver-side re-derivation of the tiny LSH twin: integer
    planes from the splitmix chain, sign-bit bands, share->=1-band
    candidates, exact (dist2, id)-ordered top-k."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages import ann

    ds = rd.read_parquet(f"{clustered_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = ann.ann_lsh_int(ds).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)

    X = _quant_all(clustered_dir)
    planes = ann._lsh_planes_int(X.shape[1], ann.LSH_TINY_BITS)
    bands = ann._lsh_bands_int(X, planes, ann.LSH_TINY_BANDS)
    rows = []
    for q in range(ann.LSH_TINY_NQ):
        share = (bands == bands[q][None, :]).any(axis=1)
        cand = np.nonzero(share & (np.arange(len(X)) != q))[0]
        d2 = ((X[cand] - X[q][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((cand, d2))[: ann.LSH_TINY_K]
        for r, o in enumerate(order, 1):
            rows.append((q, r, int(cand[o]), int(d2[o])))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_lsh_int_planes_are_splitmix_chain():
    """The plane table is exactly splitmix64(b*dim+j) % 65536 - 32768 —
    the contract lsh_tiny_sql reproduces in HUGEINT."""
    from cuda_gis_smoothing_ray.functions.hashing import splitmix64
    from cuda_gis_smoothing_ray.stages import ann

    p = ann._lsh_planes_int(8, 4)
    for b in range(4):
        for j in range(8):
            h = int(splitmix64(np.array([b * 8 + j], dtype=np.uint64))[0])
            assert p[b, j] == h % 65536 - 32768
    assert p.min() >= -32768 and p.max() <= 32767
