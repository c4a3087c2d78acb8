"""Spatial-statistics operators over the cell table: Getis-Ord Gi* hot-spot
z-scores, global Moran's I autocorrelation, and DBSCAN-style density
clustering of dense cells.

These extend the reference's neighborhood machinery (the k-ring gather that
powers K1-K7, ``hex_smooth_cuda_v1.cu:22-58``) from *smoothing* to
*inference*: the same present-neighbor gather semantics (a neighbor
contributes iff its cell exists in the data, SURVEY §2.3), but the
neighborhood sums feed classical spatial statistics instead of a weighted
mean.  The reference itself stops at descriptive stats (``printStats``,
SURVEY §2.5); Gi*/Moran/DBSCAN are the analysis ops a GIS user of the
reference would run next, expressed Ray-Data-first.

Scale shape (all three):

* neighborhood sums ride the SAME scatter-combine used by the smoothing
  kernels (:func:`..stages.smooth.expand_contributions` semantics): each
  batch emits at most n-distinct-target partial rows, ONE cell-keyed
  vectorized hash reduce, never a page-level or cell-pair shuffle;
* global scalars (n, mean, variance) come from a Dataset.aggregate over the
  cell table — one tiny dict to the driver, reused as closure constants;
* the density clustering reuses :func:`..stages.cc.connected_components`
  (min-label BSP) over ring-adjacency edges built with one tagged-union
  presence join — bounded per-round shuffles, nothing driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import hexgrid


def _global_stats(cells_ds, value_col: str) -> tuple[int, float, float]:
    """(n, mean, sum-of-squares) of ``value_col`` over the cell table — a
    Dataset.aggregate (one scalar dict to the driver, the kmeans lineage
    pattern: the cell lineage re-executes rather than materializing)."""
    from ray.data.aggregate import Count, Sum

    def add_sq(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"x": pa.array(x), "x2": pa.array(x * x)})

    agg = cells_ds.map_batches(add_sq, batch_format="pyarrow").aggregate(
        Sum("x", alias_name="sx"), Sum("x2", alias_name="sxx"), Count(alias_name="n")
    )
    n = int(agg["n"])
    if n < 2:
        raise ValueError(f"hotspot stats need >= 2 cells, got {n}")
    return n, float(agg["sx"]) / n, float(agg["sxx"])


def _neighborhood_sums(cells_ds, value_col: str, k: int, include_center: bool):
    """Scatter-combine of ``value_col`` over the k-ring: per target cell,
    ``nx`` = sum of x over PRESENT neighborhood members, ``nc`` = their
    count, ``c_sum``/``ox`` = presence flag / own value (center channel,
    emitted separately so ring-only statistics can exclude self while the
    presence gate still works).  Mirrors smooth.expand_contributions'
    batch-local combine: at most n-distinct-target rows leave each batch."""
    from ..functions.reduce import hash_groupby_sum

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        t2 = hexgrid.kring_cells(cell, k, include_center=include_center)
        n, m = t2.shape
        targets = t2.ravel()
        xv = np.broadcast_to(x[:, None], (n, m)).ravel()
        # center channel: own value + presence, kept apart from the ring sums
        all_t = np.concatenate([targets, cell])
        all_nx = np.concatenate([xv, np.zeros(n)])
        all_nc = np.concatenate([np.ones(n * m), np.zeros(n)])
        all_ox = np.concatenate([np.zeros(n * m), x])
        all_c = np.concatenate([np.zeros(n * m), np.ones(n)])
        uniq, inv = np.unique(all_t, return_inverse=True)
        return pa.table(
            {
                "cell": pa.array(uniq),
                "nx": pa.array(np.bincount(inv, weights=all_nx, minlength=len(uniq))),
                "nc": pa.array(np.bincount(inv, weights=all_nc, minlength=len(uniq))),
                "ox": pa.array(np.bincount(inv, weights=all_ox, minlength=len(uniq))),
                "c_sum": pa.array(np.bincount(inv, weights=all_c, minlength=len(uniq))),
            }
        )

    return hash_groupby_sum(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell",
        ["nx", "nc", "ox", "c_sum"],
    )


def raster_morphology(cells_ds, k: int = 1):
    """Binary MORPHOLOGY on the cell-occupancy raster (raster<->vector
    family): one scatter-combine pass yields both

    - **dilation**: the closed k-ring union of the occupied set — every
      emitted row is a member (occupied cells + their ring targets), and
    - **erosion**: occupied cells whose ENTIRE k-ring is occupied
      (``n_nbrs == ring size``, 6k(k+1)/2... = sum of 6*ring), i.e.
      interior cells; boundary cells erode away.

    Same shuffle shape as :func:`hotspot_gi` (`_neighborhood_sums`): at
    most n-distinct-target rows leave each batch, one bounded cell-keyed
    groupby-sum, nothing per-cell on the driver.
    -> (cell, present, n_nbrs, eroded) over the DILATED set."""
    full = sum(6 * ring for ring in range(1, k + 1))
    sums = _neighborhood_sums(cells_ds, "page_count", k, include_center=False)

    def finalize(batch: pa.Table) -> pa.Table:
        nc = batch.column("nc").to_numpy(zero_copy_only=False)
        present = batch.column("c_sum").to_numpy(zero_copy_only=False) > 0.5
        eroded = present & (nc > full - 0.5)
        return pa.table(
            {
                "cell": batch.column("cell"),
                "present": pa.array(present.astype(np.int64)),
                "n_nbrs": pa.array(nc.astype(np.int64)),
                "eroded": pa.array(eroded.astype(np.int64)),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")


def hotspot_gi(cells_ds, value_col: str = "page_count", k: int = 1):
    """Getis-Ord Gi* hot-spot statistic per PRESENT cell (binary weights
    over the closed k-ring neighborhood restricted to present cells):

        Gi* = (S1 - x_bar*W) / (S * sqrt((n*W - W^2) / (n-1)))

    with S1 = sum of x over present neighbors incl. self, W = their count,
    x_bar/S the global mean/std over all n cells.  Positive z = hot spot
    (dense neighborhood), negative = cold spot — THE standard first
    analysis over a smoothed density surface (Getis & Ord 1992)."""
    n, xbar, sxx = _global_stats(cells_ds, value_col)
    s = float(np.sqrt(sxx / n - xbar * xbar))
    if s == 0.0:
        raise ValueError("hotspot_gi: zero variance — Gi* undefined")
    sums = _neighborhood_sums(cells_ds, value_col, k, include_center=True)

    def finalize(batch: pa.Table) -> pa.Table:
        c = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c > 0.5
        cell = batch.column("cell").to_numpy(zero_copy_only=False)[mask]
        s1 = batch.column("nx").to_numpy(zero_copy_only=False)[mask]
        w = batch.column("nc").to_numpy(zero_copy_only=False)[mask]
        den = s * np.sqrt((n * w - w * w) / (n - 1.0))
        z = (s1 - xbar * w) / den
        return pa.table(
            {
                "cell": pa.array(cell),
                "n_nbrs": pa.array(w.astype(np.int64)),
                "gi_z": pa.array(z),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")


def morans_i(cells_ds, value_col: str = "page_count", k: int = 1):
    """Global Moran's I spatial autocorrelation over the cell table
    (binary k-ring weights EXCLUDING self, present cells only):

        I = (n / S0) * sum_i z_i * (ring_x_sum_i - x_bar*ring_cnt_i)
                     / sum_i z_i^2

    where z_i = x_i - x_bar and S0 = total present-neighbor pairs.  One
    scatter-combine + one tiny aggregate: the quadratic double sum never
    materializes (the cross term per cell collapses to its ring sums)."""
    from ray.data.aggregate import Sum

    n, xbar, sxx = _global_stats(cells_ds, value_col)
    denom = sxx - n * xbar * xbar
    if denom == 0.0:
        raise ValueError("morans_i: zero variance — I undefined")
    sums = _neighborhood_sums(cells_ds, value_col, k, include_center=False)

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c > 0.5
        rx = batch.column("nx").to_numpy(zero_copy_only=False)[mask]
        rc = batch.column("nc").to_numpy(zero_copy_only=False)[mask]
        ox = batch.column("ox").to_numpy(zero_copy_only=False)[mask]
        # rx/rc already count only PRESENT ring members (only present cells
        # scatter); isolated cells contribute 0 to both sums
        num = (ox - xbar) * (rx - xbar * rc)
        return pa.table({"num": pa.array(num), "s0": pa.array(rc)})

    agg = sums.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("num", alias_name="num"), Sum("s0", alias_name="s0")
    )
    s0 = float(agg["s0"])
    if s0 == 0.0:
        raise ValueError("morans_i: no adjacent present cells — S0 = 0")
    i_val = (n / s0) * float(agg["num"]) / denom
    return pa.table(
        {
            "morans_i": pa.array([i_val], pa.float64()),
            "s0": pa.array([int(s0)], pa.int64()),
            "n_cells": pa.array([n], pa.int64()),
        }
    )


def spatial_cluster(cells_ds, min_count: int = 2, k: int = 1):
    """DBSCAN-style density clustering of the hex grid: core cells =
    ``page_count >= min_count``; two core cells belong to the same cluster
    iff connected through k-ring adjacency; cluster id = min cell id in the
    component (singleton core cells form their own cluster).  The hex-grid
    analog of DBSCAN with eps = one ring and minPts on the cell aggregate —
    turns the density surface into labeled contiguous regions.

    Edges are built with one tagged-union presence shuffle (candidate ring
    targets vs present core cells — no pair-wise join), then
    :func:`..stages.cc.connected_components` propagates min labels with
    bounded per-round shuffles.  Rounds = component diameter; at continental
    blob sizes switch the CC to its hook+jump doubling (the SQL oracle's
    recurrence) — documented partitioning assumption, same convergence
    witness."""
    import pandas as pd
    import pyarrow.compute as pc_

    from ..functions.hashing import coarse_partition
    from .cc import connected_components

    def core_filter(batch: pa.Table) -> pa.Table:
        keep = pc_.greater_equal(batch.column("page_count"), min_count)
        return batch.filter(keep).select(["cell"])

    core = cells_ds.map_batches(core_filter, batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = hexgrid.kring_cells(cell, k, include_center=False)
        n, m = t2.shape
        targets = t2.ravel()
        src = np.broadcast_to(cell[:, None], (n, m)).ravel()
        # kind 0 = presence marker (key = own cell), kind 1 = candidate edge
        return pa.table(
            {
                "key": pa.array(np.concatenate([cell, targets])),
                "src": pa.array(np.concatenate([np.full(n, -1, dtype=np.int64), src])),
                "kind": pa.array(
                    np.concatenate([np.zeros(n, dtype=np.int8), np.ones(n * m, dtype=np.int8)])
                ),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__part", pa.array(coarse_partition(k, 64)))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        """Within one hash partition of keys: keep candidate edges whose
        target key also has a presence marker; emit each adjacency once
        (src < dst; ring offsets are symmetric so both directions arrive)."""
        key = df["key"].to_numpy(dtype=np.int64)
        kind = df["kind"].to_numpy()
        src = df["src"].to_numpy(dtype=np.int64)
        present = np.unique(key[kind == 0])
        cand = kind == 1
        tgt = key[cand]
        s = src[cand]
        # np.isin is safe on an empty presence set (a partition can hold
        # only candidate rows) — the searchsorted-probe pattern is not
        ok = np.isin(tgt, present) & (s < tgt)
        return pd.DataFrame({"a": s[ok], "b": tgt[ok]})

    edges = (
        core.map_batches(tag, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(resolve)
    )
    return connected_components(edges, core, node_col="cell").map_batches(
        lambda b: pa.table({"cell": b.column("cell"), "cluster_id": b.column("component")}),
        batch_format="pyarrow",
    )


def local_morans(cells_ds, value_col: str = "page_count", k: int = 1):
    """Local Moran's I (LISA, Anselin 1995) per present cell with binary
    k-ring weights (excluding self) over present cells:

        I_i = z_i * sum_{j in ring} z_j / m2,   m2 = sum_k z_k^2 / n

    plus the cluster-map quadrant on (z_i, row-standardized lag):
    ``HH`` hot cluster, ``LL`` cold cluster, ``HL``/``LH`` spatial
    outliers (the classic LISA cluster map).  Same two-pass shape as
    :func:`hotspot_gi`: global scalars via one aggregate, neighborhood
    sums via the scatter-combine, everything else batch-local arithmetic."""
    n, xbar, sxx = _global_stats(cells_ds, value_col)
    m2 = sxx / n - xbar * xbar
    if m2 == 0.0:
        raise ValueError("local_morans: zero variance — I undefined")
    sums = _neighborhood_sums(cells_ds, value_col, k, include_center=False)

    def finalize(batch: pa.Table) -> pa.Table:
        c = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c > 0.5
        cell = batch.column("cell").to_numpy(zero_copy_only=False)[mask]
        rx = batch.column("nx").to_numpy(zero_copy_only=False)[mask]
        rc = batch.column("nc").to_numpy(zero_copy_only=False)[mask]
        ox = batch.column("ox").to_numpy(zero_copy_only=False)[mask]
        z = ox - xbar
        zlag_sum = rx - xbar * rc
        lisa = z * zlag_sum / m2
        # row-standardized lag for the quadrant label; isolated cells -> 0
        lag = np.where(rc > 0, zlag_sum / np.maximum(rc, 1.0), 0.0)
        # identical predicate order to the SQL CASE chain
        quad = np.where(
            (z > 0) & (lag > 0), "HH",
            np.where((z < 0) & (lag < 0), "LL",
                     np.where(z > 0, "HL", "LH")),
        )
        return pa.table(
            {
                "cell": pa.array(cell),
                "lisa": pa.array(lisa),
                "quadrant": pa.array(quad.astype(object), pa.string()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")


def bivariate_morans(cells_ds, col_x: str = "en_share", col_y: str = "mention_rate",
                     k: int = 1):
    """Bivariate Moran's I (Wartenberg 1985 form): spatial cross-
    correlation between ``col_x`` at each cell and ``col_y`` over its
    k-ring neighborhood (binary weights, present cells, excluding self):

        I_xy = (n / S0) * sum_i zx_i * (ring_y_sum_i - y_bar*ring_cnt_i)
                        / sqrt(sum zx^2 * sum zy^2)

    Answers "is metric X high where neighboring cells' metric Y is high"
    — e.g. do English-heavy cells sit next to mention-heavy ones.  Same
    one-scatter-combine shape as :func:`morans_i`; the x channel rides the
    center slot of the same shuffle."""
    from ray.data.aggregate import Count, Sum

    # ONE combined aggregate for both columns' moments (two _global_stats
    # calls would re-execute the cells lineage twice)
    def add_sq(batch: pa.Table) -> pa.Table:
        x = batch.column(col_x).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(col_y).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"x": pa.array(x), "x2": pa.array(x * x),
                         "y": pa.array(y), "y2": pa.array(y * y)})

    st = cells_ds.map_batches(add_sq, batch_format="pyarrow").aggregate(
        Sum("x", alias_name="sx"), Sum("x2", alias_name="sxx"),
        Sum("y", alias_name="sy"), Sum("y2", alias_name="syy"),
        Count(alias_name="n"),
    )
    n = int(st["n"])
    if n < 2:
        raise ValueError(f"bivariate_morans needs >= 2 cells, got {n}")
    xbar, sxx = float(st["sx"]) / n, float(st["sxx"])
    ybar, syy = float(st["sy"]) / n, float(st["syy"])
    var_x = sxx - n * xbar * xbar
    var_y = syy - n * ybar * ybar
    if var_x == 0.0 or var_y == 0.0:
        raise ValueError("bivariate_morans: zero variance — I undefined")

    from ..functions.reduce import hash_groupby_sum

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column(col_x).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(col_y).to_numpy(zero_copy_only=False).astype(np.float64)
        t2 = hexgrid.kring_cells(cell, k, include_center=False)
        nn, m = t2.shape
        targets = t2.ravel()
        yv = np.broadcast_to(y[:, None], (nn, m)).ravel()
        all_t = np.concatenate([targets, cell])
        all_ry = np.concatenate([yv, np.zeros(nn)])
        all_rc = np.concatenate([np.ones(nn * m), np.zeros(nn)])
        all_ox = np.concatenate([np.zeros(nn * m), x])
        all_c = np.concatenate([np.zeros(nn * m), np.ones(nn)])
        uniq, inv = np.unique(all_t, return_inverse=True)
        return pa.table(
            {
                "cell": pa.array(uniq),
                "ry": pa.array(np.bincount(inv, weights=all_ry, minlength=len(uniq))),
                "rc": pa.array(np.bincount(inv, weights=all_rc, minlength=len(uniq))),
                "ox": pa.array(np.bincount(inv, weights=all_ox, minlength=len(uniq))),
                "c_sum": pa.array(np.bincount(inv, weights=all_c, minlength=len(uniq))),
            }
        )

    sums = hash_groupby_sum(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", ["ry", "rc", "ox", "c_sum"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c_sum").to_numpy(zero_copy_only=False)
        mask = c > 0.5
        ry = batch.column("ry").to_numpy(zero_copy_only=False)[mask]
        rc = batch.column("rc").to_numpy(zero_copy_only=False)[mask]
        ox = batch.column("ox").to_numpy(zero_copy_only=False)[mask]
        num = (ox - xbar) * (ry - ybar * rc)
        return pa.table({"num": pa.array(num), "s0": pa.array(rc)})

    agg = sums.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("num", alias_name="num"), Sum("s0", alias_name="s0")
    )
    s0 = float(agg["s0"])
    if s0 == 0.0:
        raise ValueError("bivariate_morans: no adjacent present cells — S0 = 0")
    i_xy = (n / s0) * float(agg["num"]) / np.sqrt(var_x * var_y)
    return pa.table(
        {
            "morans_ixy": pa.array([float(i_xy)], pa.float64()),
            "s0": pa.array([int(s0)], pa.int64()),
            "n_cells": pa.array([n], pa.int64()),
        }
    )


SEMIVAR_MAX_D = 3


def semivariogram(cells_ds, value_col: str = "page_count",
                  max_d: int = SEMIVAR_MAX_D):
    """cells -> (d, n_pairs, gamma): the empirical SEMIVARIOGRAM of an
    integer cell metric by exact hex-grid distance — for each lag
    d = 1..max_d, ``gamma(d) = sum over pairs at distance d of
    (z_i - z_j)^2 / (2 * n_pairs)``, the geostatistics range/sill/nugget
    diagnostic that tells a GIS user how far spatial correlation reaches
    (the smoothing kernels' k should sit inside the range).

    Scale shape: the smoothing scatter-combine, with one channel PER LAG —
    each cell emits, per ring-d offset, its value and squared value to the
    target cell key; ONE cell-keyed exact-int ``hash_groupby`` later,
    every present cell holds (count, sum z, sum z^2) of its distance-d
    neighbors, and the pair identity ``sum (z_c - z_n)^2 = nc*z_c^2 -
    2*z_c*sx + sxx`` closes the lag sums batch-locally.  The final reduce
    is ``max_d`` keys.  No cell-pair ever shuffles.  Ordered pairs are
    accumulated (each unordered pair at both ends), so ``n_pairs =
    cnt_ordered / 2`` and ``gamma = sum_ordered / (2 * cnt_ordered)`` —
    the one derived double, floor(x*1e6+0.5)/1e6 with the oracle.  Sums
    are exact int64 (overflow bound: n_cells * z_max^2 * 6d must fit
    2^63 — at larger scale promote the tiny final reduce to Python ints,
    the host_gini discipline)."""
    import ray.data as rd
    from ..functions.reduce import hash_groupby

    if not 1 <= max_d <= 6:
        raise ValueError(f"semivariogram: max_d must be in [1, 6], got {max_d}")

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(cell)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(np.atleast_1d(res)[0]) if n else hexgrid.RES_MIN
        targets = [cell]
        chan = {f"nc_{d}": [np.zeros(n, np.int64)] for d in range(1, max_d + 1)}
        chan.update({f"sx_{d}": [np.zeros(n, np.int64)] for d in range(1, max_d + 1)})
        chan.update({f"sxx_{d}": [np.zeros(n, np.int64)] for d in range(1, max_d + 1)})
        chan["oz"] = [z]
        chan["c_sum"] = [np.ones(n, np.int64)]
        for d in range(1, max_d + 1):
            offs = hexgrid.ring_offsets(d)
            dq = np.array([o[0] for o in offs], np.int64)
            dr = np.array([o[1] for o in offs], np.int64)
            t = hexgrid.pack(res0, q[:, None] + dq[None, :],
                             r[:, None] + dr[None, :]).ravel()
            m = len(offs)
            targets.append(t)
            zz = np.broadcast_to(z[:, None], (n, m)).ravel()
            for dd in range(1, max_d + 1):
                same = dd == d
                chan[f"nc_{dd}"].append(
                    np.ones(n * m, np.int64) if same else np.zeros(n * m, np.int64))
                chan[f"sx_{dd}"].append(zz if same else np.zeros(n * m, np.int64))
                chan[f"sxx_{dd}"].append(zz * zz if same else np.zeros(n * m, np.int64))
            chan["oz"].append(np.zeros(n * m, np.int64))
            chan["c_sum"].append(np.zeros(n * m, np.int64))
        all_t = np.concatenate(targets)
        uniq, inv = np.unique(all_t, return_inverse=True)
        out = {"cell": pa.array(uniq)}
        for name, parts in chan.items():
            v = np.concatenate(parts)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, v)
            out[name] = pa.array(acc)
        return pa.table(out)

    sum_cols = [f"{p}_{d}" for d in range(1, max_d + 1)
                for p in ("nc", "sx", "sxx")] + ["oz", "c_sum"]
    sums = hash_groupby(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", sum_cols, how="isum",
    )

    def close_lags(batch: pa.Table) -> pa.Table:
        present = batch.column("c_sum").to_numpy(zero_copy_only=False) > 0
        z = batch.column("oz").to_numpy(zero_copy_only=False)[present]
        out_d, out_s, out_c = [], [], []
        for d in range(1, max_d + 1):
            nc = batch.column(f"nc_{d}").to_numpy(zero_copy_only=False)[present]
            sx = batch.column(f"sx_{d}").to_numpy(zero_copy_only=False)[present]
            sxx = batch.column(f"sxx_{d}").to_numpy(zero_copy_only=False)[present]
            s = int(np.sum(nc * z * z - 2 * z * sx + sxx))
            out_d.append(d)
            out_s.append(s)
            out_c.append(int(nc.sum()))
        return pa.table({"d": pa.array(out_d, pa.int64()),
                         "s": pa.array(out_s, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    red = hash_groupby(
        sums.map_batches(close_lags, batch_format="pyarrow"),
        "d", ["s", "c"], how="isum",
    ).to_pandas().sort_values("d")

    n_pairs = red["c"].to_numpy(np.int64) // 2
    gamma = np.where(
        red["c"].to_numpy(np.int64) > 0,
        np.floor(red["s"].to_numpy(np.float64)
                 / (2.0 * red["c"].to_numpy(np.float64)) * 1e6 + 0.5) / 1e6,
        0.0)
    return rd.from_arrow(pa.table({
        "d": pa.array(red["d"].to_numpy(np.int64)),
        "n_pairs": pa.array(n_pairs),
        "gamma": pa.array(gamma),
    }))


def otsu_threshold(cells_ds, value_col: str = "page_count"):
    """cells -> ONE row (threshold, n_below, n_above): Otsu's raster
    segmentation threshold over an integer cell metric — the t maximizing
    between-class variance ``w0*w1*(mu0-mu1)^2``, i.e. the data-driven
    dense/sparse cut the density-cluster stage would otherwise take as a
    magic constant.

    EXACT: the variance ratio is ``(s0*n1 - s1*n0)^2 / (n0*n1)`` in pure
    integers (s/n = class sum/count below vs above t); candidates are
    compared by CROSS-MULTIPLIED fractions in arbitrary-precision Python
    ints — no float enters the argmax, so the oracle (a NOT EXISTS
    anti-join on the same products) matches bit-for-bit, ties -> smallest
    t.  Scale shape: one bounded value-histogram shuffle (the
    :func:`..stages.sketch.quantiles` plan), then the argmax runs on the
    |distinct values|-sized histogram — an aggregate by the same
    assumption every quantile/histogram op makes."""
    import ray.data as rd
    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        cells_ds.map_batches(counts, batch_format="pyarrow"),
        "v", ["cnt"], how="isum",
    ).to_pandas().sort_values("v")

    v = hist["v"].to_numpy(np.int64)
    c = hist["cnt"].to_numpy(np.int64)
    if len(v) < 2:
        raise ValueError("otsu_threshold: need >= 2 distinct values")
    n0 = np.cumsum(c)
    s0 = np.cumsum(c * v)
    N, S = int(n0[-1]), int(s0[-1])
    best_t, best_num, best_den = None, -1, 1
    for i in range(len(v) - 1):  # threshold t = v[i]: below <= t < above
        a, b = int(n0[i]), N - int(n0[i])
        sa = int(s0[i])
        num = (sa * b - (S - sa) * a) ** 2
        den = a * b
        if best_t is None or num * best_den > best_num * den:
            best_t, best_num, best_den = int(v[i]), num, den
    i = int(np.searchsorted(v, best_t))
    return rd.from_arrow(pa.table({
        "threshold": pa.array([best_t], pa.int64()),
        "n_below": pa.array([int(n0[i])], pa.int64()),
        "n_above": pa.array([N - int(n0[i])], pa.int64()),
    }))


def hist_equalize(cells_ds, value_col: str = "page_count", levels: int = 256):
    """cells -> (cell, v, eq): HISTOGRAM EQUALIZATION of an integer cell
    raster — remap each value to ``(cdf(v) - cdf_min) * (levels-1) //
    (n - cdf_min)``, the classic contrast-stretch that makes a choropleth
    of a heavy-tailed count column readable.  Pure integer arithmetic
    end to end (floor division), so the oracle matches bit-for-bit.

    Scale shape: ONE bounded value-histogram shuffle builds the CDF
    codebook (|distinct values| rows — an aggregate, the
    :func:`..stages.sketch.quantile_filter` discipline), which is carried
    into a second streaming pass as a sorted-array closure; the cell
    stream itself never shuffles."""
    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        cells_ds.map_batches(counts, batch_format="pyarrow"),
        "v", ["cnt"], how="isum",
    ).to_pandas().sort_values("v")
    vs = hist["v"].to_numpy(np.int64)
    cdf = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n, cmin = int(cdf[-1]), int(cdf[0])
    if n == cmin:
        raise ValueError("hist_equalize: constant raster — nothing to stretch")
    eq_of = ((cdf - cmin) * (levels - 1)) // (n - cmin)

    def remap(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vs, v)  # every cell value is in the codebook
        return pa.table({"cell": batch.column("cell"), "v": pa.array(v),
                         "eq": pa.array(eq_of[pos])})

    return cells_ds.map_batches(remap, batch_format="pyarrow")


DT_MIN_COUNT = 3
DT_MAX_D = 4


def distance_transform(cells_ds, value_col: str = "page_count",
                       min_count: int = DT_MIN_COUNT, max_d: int = DT_MAX_D):
    """cells -> (cell, dist): the DISTANCE TRANSFORM of the cell raster —
    for every present cell, the exact hex-grid distance to the nearest
    SEED cell (``value_col >= min_count``), clipped at ``max_d`` (cells
    farther than max_d from every seed are absent; seeds themselves are
    dist 0).  The classic "distance to feature" GIS raster, here
    "how far is this page cluster from a dense crawl region".

    Scale shape: CLOSED-FORM, not iterative — each seed scatters (target,
    d) for its whole k-disk in one pass (bounded fan-out 1+3*max_d*(max_d
    +1)), with the batch-local min per target taken first; ONE min
    hash_groupby resolves the global nearest-seed distance; present cells
    gate the result through the same tagged channel (c_sum) as every
    neighborhood op.  One all-to-all total — cheaper than max_d BFS
    supersteps whenever max_d is small, which is the regime where a
    clipped distance transform makes sense."""
    from ..functions.reduce import hash_groupby

    def scatter(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(np.atleast_1d(res)[0]) if len(cell) else hexgrid.RES_MIN
        seeds = z >= min_count
        sq, sr = q[seeds], r[seeds]
        targets = [cell]
        dists = [np.where(seeds, 0, max_d + 1).astype(np.int64)]
        pres = [np.ones(len(cell), np.int64)]
        for d in range(1, max_d + 1):
            offs = hexgrid.ring_offsets(d)
            dq = np.array([o[0] for o in offs], np.int64)
            dr = np.array([o[1] for o in offs], np.int64)
            t = hexgrid.pack(res0, sq[:, None] + dq[None, :],
                             sr[:, None] + dr[None, :]).ravel()
            targets.append(t)
            dists.append(np.full(len(t), d, np.int64))
            pres.append(np.zeros(len(t), np.int64))
        all_t = np.concatenate(targets)
        all_d = np.concatenate(dists)
        all_p = np.concatenate(pres)
        # batch-local combine: min dist + presence-sum per target
        uniq, inv = np.unique(all_t, return_inverse=True)
        dmin = np.full(len(uniq), max_d + 1, np.int64)
        np.minimum.at(dmin, inv, all_d)
        psum = np.zeros(len(uniq), np.int64)
        np.add.at(psum, inv, all_p)
        return pa.table({"cell": pa.array(uniq), "dist": pa.array(dmin),
                         "c_sum": pa.array(psum)})

    red = hash_groupby(
        cells_ds.map_batches(scatter, batch_format="pyarrow"),
        "cell", ["dist", "c_sum"], how={"dist": "min", "c_sum": "isum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        present = batch.column("c_sum").to_numpy(zero_copy_only=False) > 0
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        keep = present & (d <= max_d)
        return pa.table({
            "cell": pa.array(batch.column("cell").to_numpy(
                zero_copy_only=False)[keep]),
            "dist": pa.array(d[keep]),
        })

    return red.map_batches(finalize, batch_format="pyarrow")


def hex_voronoi(cells_ds, value_col: str = "page_count",
                min_count: int = DT_MIN_COUNT, max_d: int = DT_MAX_D):
    """cells -> (cell, dist, seed): the discrete VORONOI assignment of the
    cell raster — every present cell within ``max_d`` of a seed
    (``value_col >= min_count``) gets its NEAREST seed's cell id (ties ->
    smallest seed), the "assign each page cluster to its serving dense
    region" op (nearest-facility / service-area analysis).

    Scale shape: :func:`distance_transform`'s closed-form seed-disk
    scatter, with (dist, seed) packed into ONE int64 key
    (``d << 60 | seed``; cells occupy < 2^60, so integer min IS the
    lexicographic (dist, seed) argmin) — one mixed min/presence-sum
    hash_groupby, no iteration, no per-cell Python."""
    from ..functions.reduce import hash_groupby

    if not 0 < max_d <= 6:
        raise ValueError(f"hex_voronoi: max_d must be in [1, 6], got {max_d}")
    sentinel = np.int64((max_d + 1)) << np.int64(60)

    def scatter(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(np.atleast_1d(res)[0]) if len(cell) else hexgrid.RES_MIN
        seeds = z >= min_count
        sq, sr, sc = q[seeds], r[seeds], cell[seeds]
        targets = [cell]
        keys = [np.where(seeds, cell, sentinel).astype(np.int64)]  # d=0: self
        pres = [np.ones(len(cell), np.int64)]
        for d in range(1, max_d + 1):
            offs = hexgrid.ring_offsets(d)
            dq = np.array([o[0] for o in offs], np.int64)
            dr = np.array([o[1] for o in offs], np.int64)
            m = len(offs)
            t = hexgrid.pack(res0, sq[:, None] + dq[None, :],
                             sr[:, None] + dr[None, :]).ravel()
            targets.append(t)
            keys.append((np.int64(d) << np.int64(60))
                        | np.repeat(sc, m))
            pres.append(np.zeros(len(t), np.int64))
        all_t = np.concatenate(targets)
        all_k = np.concatenate(keys)
        all_p = np.concatenate(pres)
        uniq, inv = np.unique(all_t, return_inverse=True)
        kmin = np.full(len(uniq), sentinel, np.int64)
        np.minimum.at(kmin, inv, all_k)
        psum = np.zeros(len(uniq), np.int64)
        np.add.at(psum, inv, all_p)
        return pa.table({"cell": pa.array(uniq), "k": pa.array(kmin),
                         "c_sum": pa.array(psum)})

    red = hash_groupby(
        cells_ds.map_batches(scatter, batch_format="pyarrow"),
        "cell", ["k", "c_sum"], how={"k": "min", "c_sum": "isum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        present = batch.column("c_sum").to_numpy(zero_copy_only=False) > 0
        k = batch.column("k").to_numpy(zero_copy_only=False)
        keep = present & (k < sentinel)
        k = k[keep]
        return pa.table({
            "cell": pa.array(batch.column("cell").to_numpy(
                zero_copy_only=False)[keep]),
            "dist": pa.array(k >> np.int64(60)),
            "seed": pa.array(k & ((np.int64(1) << np.int64(60)) - 1)),
        })

    return red.map_batches(finalize, batch_format="pyarrow")


def isoline_cells(cells_ds, value_col: str = "page_count", k: int = 1):
    """cell raster -> (cell, own_hi, n_hi, n_lo, side): CONTOUR / ISOLINE
    extraction at the exact corpus-mean threshold — the cells where the
    value field crosses the level set.  A PRESENT cell is on the contour
    iff it sits on the high side with >= 1 present low ring-k neighbor
    (``side = 1``, the inner contour) or on the low side with >= 1 high
    neighbor (``side = 0``, the outer contour).  The raster<->vector step
    between :func:`raster_morphology` (binary) and :func:`hist_equalize`
    (value remap).

    EXACT threshold: "value >= mean" is cleared of the rational mean —
    ``hi iff value * n_cells >= S1`` with integer page counts, so the
    oracle needs no float anywhere.  Scale shape: one tiny (n, S1)
    aggregate, then ONE scatter-combine over the k-ring (hi/lo indicator
    channels, batch-local combine) and a bounded cell-keyed sum — the
    :func:`hotspot_gi` shuffle with different channels."""
    from ray.data.aggregate import Count, Sum

    from ..functions.reduce import hash_groupby_sum

    agg = cells_ds.map_batches(
        lambda b: pa.table({"x": b.column(value_col)}),
        batch_format="pyarrow",
    ).aggregate(Sum("x", alias_name="s1"), Count(alias_name="n"))
    n, s1 = int(agg["n"]), int(agg["s1"])
    if n == 0:
        raise ValueError("isoline_cells: empty cell table")

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hi = (x * n >= s1).astype(np.float64)
        t2 = hexgrid.kring_cells(cell, k, include_center=False)
        nn, m = t2.shape
        targets = t2.ravel()
        hiv = np.broadcast_to(hi[:, None], (nn, m)).ravel()
        all_t = np.concatenate([targets, cell])
        all_hi = np.concatenate([hiv, np.zeros(nn)])
        all_lo = np.concatenate([1.0 - hiv, np.zeros(nn)])
        all_c = np.concatenate([np.zeros(nn * m), np.ones(nn)])
        all_oh = np.concatenate([np.zeros(nn * m), hi])
        uniq, inv = np.unique(all_t, return_inverse=True)
        mk = lambda w: pa.array(  # noqa: E731
            np.bincount(inv, weights=w, minlength=len(uniq)))
        return pa.table({"cell": pa.array(uniq), "nhi": mk(all_hi),
                         "nlo": mk(all_lo), "c_sum": mk(all_c),
                         "oh": mk(all_oh)})

    sums = hash_groupby_sum(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", ["nhi", "nlo", "c_sum", "oh"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        present = batch.column("c_sum").to_numpy(zero_copy_only=False) > 0.5
        cell = batch.column("cell").to_numpy(zero_copy_only=False)[present]
        nhi = batch.column("nhi").to_numpy(
            zero_copy_only=False)[present].astype(np.int64)
        nlo = batch.column("nlo").to_numpy(
            zero_copy_only=False)[present].astype(np.int64)
        hi = batch.column("oh").to_numpy(
            zero_copy_only=False)[present] > 0.5
        inner = hi & (nlo >= 1)
        outer = ~hi & (nhi >= 1)
        keep = inner | outer
        return pa.table({
            "cell": pa.array(cell[keep]),
            "own_hi": pa.array(hi[keep].astype(np.int64)),
            "n_hi": pa.array(nhi[keep]),
            "n_lo": pa.array(nlo[keep]),
            "side": pa.array(inner[keep].astype(np.int64)),
        })

    return sums.map_batches(finalize, batch_format="pyarrow").sort("cell")


def geary_c(cells_ds, value_col: str = "page_count"):
    """cells -> ONE row (n_cells, s0, num, geary_c): GEARY'S C spatial
    autocorrelation over the present-cell raster with binary ring-1
    weights — the local-difference complement of :func:`morans_i`
    (C < 1 = positive autocorrelation, C > 1 = negative):

        C = ((n-1) * sum_w (x_i - x_j)^2) / (2 * S0 * sum (x_i - xbar)^2)

    EXACT: the pair sum collapses per cell via the semivariogram identity
    ``nc*z^2 - 2*z*sx + sxx`` (ordered pairs; S0 = ordered edge count),
    the variance clears the rational mean (``n*sxx - sx^2``), and the
    whole statistic is ONE float division of two arbitrary-precision
    integers, round6.  Scale shape: one ring-1 scatter-combine + a tiny
    moment aggregate — no cell pair ever shuffles."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    mom = cells_ds.map_batches(
        lambda b: pa.table({
            "n": pa.array([len(b)], pa.int64()),
            "sx": pa.array([int(b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64).sum())], pa.int64()),
            "sxx": pa.array([int((b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64) ** 2).sum())],
                pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    n = int(mom["n"].sum())
    sx = int(mom["sx"].sum())
    sxx = int(mom["sxx"].sum())
    if n < 2:
        raise ValueError("geary_c: need >= 2 cells")

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nn = len(cell)
        t2 = hexgrid.kring_cells(cell, 1, include_center=False)
        m = t2.shape[1]
        targets = np.concatenate([t2.ravel(), cell])
        zz = np.broadcast_to(z[:, None], (nn, m)).ravel()
        nc = np.concatenate([np.ones(nn * m, np.int64),
                             np.zeros(nn, np.int64)])
        sn = np.concatenate([zz, np.zeros(nn, np.int64)])
        snn = np.concatenate([zz * zz, np.zeros(nn, np.int64)])
        oz = np.concatenate([np.zeros(nn * m, np.int64), z])
        cs = np.concatenate([np.zeros(nn * m, np.int64),
                             np.ones(nn, np.int64)])
        uniq, inv = np.unique(targets, return_inverse=True)
        out = {"cell": pa.array(uniq)}
        for name, w in (("nc", nc), ("sn", sn), ("snn", snn), ("oz", oz),
                        ("cs", cs)):
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, w)
            out[name] = pa.array(acc)
        return pa.table(out)

    sums = hash_groupby(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", ["nc", "sn", "snn", "oz", "cs"], how="isum",
    )

    def close(batch: pa.Table) -> pa.Table:
        present = batch.column("cs").to_numpy(zero_copy_only=False) > 0
        z = batch.column("oz").to_numpy(zero_copy_only=False)[present]
        nc = batch.column("nc").to_numpy(zero_copy_only=False)[present]
        sn = batch.column("sn").to_numpy(zero_copy_only=False)[present]
        snn = batch.column("snn").to_numpy(zero_copy_only=False)[present]
        s = int(np.sum(nc * z * z - 2 * z * sn + snn))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "num": pa.array([s], pa.int64()),
                         "s0": pa.array([int(nc.sum())], pa.int64())})

    red = hash_groupby(
        sums.map_batches(close, batch_format="pyarrow"),
        "k", ["num", "s0"], how="isum",
    ).to_pandas()
    num = int(red["num"].sum())
    s0 = int(red["s0"].sum())
    if s0 == 0:
        raise ValueError("geary_c: no adjacent present cells")
    den = 2 * s0 * (n * sxx - sx * sx)  # exact object ints
    c = float((n - 1) * num * n) / float(den)
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_cells": pa.array([n], pa.int64()),
        "s0": pa.array([s0], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "geary_c": pa.array([r6(c)], pa.float64()),
    }))


def emerging_hotspots(st_ds):
    """(cell, day, page_count) cube -> (cell, n_days, days_hot, last_hot,
    category): EMERGING-HOT-SPOT analysis over the spatiotemporal cube —
    per day, a cell is HOT iff its count clears that day's exact mean
    (``cnt * n_cells_day >= total_day``, the integer-cleared threshold);
    then each cell is classified over the day sequence:

    - ``persistent`` (2): hot on EVERY day it is observed and on >= 2 days
    - ``emerging`` (1): hot on the LAST observed day but not all days
    - ``none`` (0): not hot on the last day

    The space-TIME trend readout (ArcGIS "emerging hot spot" family) over
    the crawl snapshots.  Exact ints everywhere; scale shape: the cube is
    already bounded (cell x day); per-day thresholds are a |days|-row
    aggregate; the classification is one cell-keyed reduce."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    cube = st_ds.to_pandas()  # bounded: |cells| x |days|
    if len(cube) == 0:
        raise ValueError("emerging_hotspots: empty cube")
    day = cube["day"].to_numpy().astype("datetime64[us]").astype(np.int64)
    cnt = cube["page_count"].to_numpy(np.int64)
    cell = cube["cell"].to_numpy(np.int64)
    # per-day exact thresholds
    udays, dinv = np.unique(day, return_inverse=True)
    n_day = np.bincount(dinv).astype(np.int64)
    tot_day = np.zeros(len(udays), np.int64)
    np.add.at(tot_day, dinv, cnt)
    hot = cnt.astype(object) * n_day[dinv] >= tot_day[dinv]
    hot = np.asarray(hot, dtype=bool)
    last_day = int(udays[-1])
    # per-cell rollup
    ucell, cinv = np.unique(cell, return_inverse=True)
    n_days = np.bincount(cinv).astype(np.int64)
    days_hot = np.zeros(len(ucell), np.int64)
    np.add.at(days_hot, cinv, hot.astype(np.int64))
    last_hot = np.zeros(len(ucell), np.int64)
    on_last = day == last_day
    np.add.at(last_hot, cinv[on_last], hot[on_last].astype(np.int64))
    cat = np.zeros(len(ucell), np.int64)
    cat[(last_hot == 1)] = 1                                  # emerging
    cat[(last_hot == 1) & (days_hot == n_days) & (n_days >= 2)] = 2
    return rd.from_arrow(pa.table({
        "cell": pa.array(ucell),
        "n_days": pa.array(n_days),
        "days_hot": pa.array(days_hot),
        "last_hot": pa.array(last_hot),
        "category": pa.array(cat),
    })).sort("cell")


def directional_variogram(cells_ds, value_col: str = "page_count"):
    """cells -> 6 rows (dq, dr, n_pairs, gamma): the DIRECTIONAL
    semivariogram at lag 1 — ``gamma_o = sum over present pairs along
    offset o of (z_i - z_j)^2 / (2 * n_pairs_o)`` separately for each of
    the 6 hex directions, the ANISOTROPY diagnostic (a north-south
    gradient shows as unequal direction gammas; the omnidirectional
    :func:`semivariogram` averages it away).

    Same exactness/scale shape as the semivariogram: one scatter-combine
    with per-DIRECTION channels, the per-cell closed form ``nc*z^2 -
    2*z*sx + sxx`` (here nc is 0/1: one neighbor per direction), a
    6-key exact reduce, one round6 division per direction.  Ordered
    pairs: offset o and -o are distinct rows (each unordered pair appears
    once in each of the two opposite directions)."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    offs = hexgrid.ring_offsets(1)

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nn = len(cell)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(np.atleast_1d(res)[0]) if nn else 7
        targets = [cell]
        chan: dict[str, list] = {}
        for oi in range(len(offs)):
            chan[f"nc_{oi}"] = [np.zeros(nn, np.int64)]
            chan[f"sx_{oi}"] = [np.zeros(nn, np.int64)]
            chan[f"sxx_{oi}"] = [np.zeros(nn, np.int64)]
        chan["oz"] = [z]
        chan["cs"] = [np.ones(nn, np.int64)]
        for oi, (dq, dr) in enumerate(offs):
            # scatter MY value to the neighbor at offset o; at the reduce,
            # the TARGET cell sees its offset -o... to keep direction
            # attribution at the CENTER, scatter to cell + o and store in
            # channel oi: the receiving cell's channel oi then holds the
            # value of its neighbor at offset -o.  Pairing (cell, cell+o)
            # once per direction is exactly this.
            t = hexgrid.pack(res0, q + dq, r + dr)
            targets.append(t)
            for oj in range(len(offs)):
                same = oj == oi
                chan[f"nc_{oj}"].append(
                    np.ones(nn, np.int64) if same else np.zeros(nn, np.int64))
                chan[f"sx_{oj}"].append(z if same else np.zeros(nn, np.int64))
                chan[f"sxx_{oj}"].append(
                    z * z if same else np.zeros(nn, np.int64))
            chan["oz"].append(np.zeros(nn, np.int64))
            chan["cs"].append(np.zeros(nn, np.int64))
        all_t = np.concatenate(targets)
        uniq, inv = np.unique(all_t, return_inverse=True)
        out = {"cell": pa.array(uniq)}
        for name, parts in chan.items():
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, np.concatenate(parts))
            out[name] = pa.array(acc)
        return pa.table(out)

    cols = [f"{p}_{i}" for i in range(len(offs))
            for p in ("nc", "sx", "sxx")] + ["oz", "cs"]
    sums = hash_groupby(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", cols, how="isum",
    )

    def close(batch: pa.Table) -> pa.Table:
        present = batch.column("cs").to_numpy(zero_copy_only=False) > 0
        z = batch.column("oz").to_numpy(zero_copy_only=False)[present]
        out_i, out_s, out_c = [], [], []
        for oi in range(len(offs)):
            nc = batch.column(f"nc_{oi}").to_numpy(
                zero_copy_only=False)[present]
            sx = batch.column(f"sx_{oi}").to_numpy(
                zero_copy_only=False)[present]
            sxx = batch.column(f"sxx_{oi}").to_numpy(
                zero_copy_only=False)[present]
            out_i.append(oi)
            out_s.append(int(np.sum(nc * z * z - 2 * z * sx + sxx)))
            out_c.append(int(nc.sum()))
        return pa.table({"oi": pa.array(out_i, pa.int64()),
                         "s": pa.array(out_s, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    red = hash_groupby(
        sums.map_batches(close, batch_format="pyarrow"),
        "oi", ["s", "c"], how="isum",
    ).to_pandas().sort_values("oi")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"dq": [], "dr": [], "n_pairs": [], "gamma": []}
    sc = {int(i): (int(s), int(c))
          for i, s, c in zip(red["oi"], red["s"], red["c"])}
    for oi, (dq, dr) in enumerate(offs):
        s, c = sc.get(oi, (0, 0))
        rows["dq"].append(dq)
        rows["dr"].append(dr)
        rows["n_pairs"].append(c)
        rows["gamma"].append(r6(s / (2.0 * c)) if c > 0 else 0.0)
    return rd.from_arrow(pa.table({
        "dq": pa.array(rows["dq"], pa.int64()),
        "dr": pa.array(rows["dr"], pa.int64()),
        "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
        "gamma": pa.array(rows["gamma"], pa.float64()),
    }))


def moran_correlogram(cells_ds, value_col: str = "page_count",
                      max_d: int = 3):
    """cells -> (d, s0, morans_i) for exact hex lags d = 1..max_d: the
    SPATIAL CORRELOGRAM — Moran's I computed with exact-distance-d binary
    weights per lag (how autocorrelation decays with distance; the
    inferential twin of the :func:`semivariogram` and the lag profile
    :func:`morans_i`'s cumulative k-ring blurs).

        I_d = (n / S0_d) * sum_i (x_i - xbar)(rx_d_i - xbar * rc_d_i)
              / sum_i (x_i - xbar)^2

    Scale shape: ONE scatter-combine with per-lag (count, sum) channels
    (the semivariogram plan without the squares), a bounded cell reduce,
    exact integer moments; one float expression per lag, round6."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    if not 1 <= max_d <= 6:
        raise ValueError("moran_correlogram: max_d must be in [1, 6]")

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        z = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nn = len(cell)
        res, q, r = hexgrid.unpack(cell)
        res0 = int(np.atleast_1d(res)[0]) if nn else 7
        targets = [cell]
        chan: dict[str, list] = {}
        for d in range(1, max_d + 1):
            chan[f"rc_{d}"] = [np.zeros(nn, np.int64)]
            chan[f"rx_{d}"] = [np.zeros(nn, np.int64)]
        chan["oz"] = [z]
        chan["cs"] = [np.ones(nn, np.int64)]
        for d in range(1, max_d + 1):
            offs = hexgrid.ring_offsets(d)
            dq = np.array([o[0] for o in offs], np.int64)
            dr = np.array([o[1] for o in offs], np.int64)
            t = hexgrid.pack(res0, q[:, None] + dq[None, :],
                             r[:, None] + dr[None, :]).ravel()
            m = len(offs)
            targets.append(t)
            zz = np.broadcast_to(z[:, None], (nn, m)).ravel()
            for dd in range(1, max_d + 1):
                same = dd == d
                chan[f"rc_{dd}"].append(
                    np.ones(nn * m, np.int64) if same
                    else np.zeros(nn * m, np.int64))
                chan[f"rx_{dd}"].append(
                    zz if same else np.zeros(nn * m, np.int64))
            chan["oz"].append(np.zeros(nn * m, np.int64))
            chan["cs"].append(np.zeros(nn * m, np.int64))
        all_t = np.concatenate(targets)
        uniq, inv = np.unique(all_t, return_inverse=True)
        out = {"cell": pa.array(uniq)}
        for name, parts in chan.items():
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, np.concatenate(parts))
            out[name] = pa.array(acc)
        return pa.table(out)

    cols = [f"{p}_{d}" for d in range(1, max_d + 1)
            for p in ("rc", "rx")] + ["oz", "cs"]
    sums = hash_groupby(
        cells_ds.map_batches(expand, batch_format="pyarrow"),
        "cell", cols, how="isum",
    )

    # finalize on the driver over the bounded cell table (the same
    # aggregate-sized assumption as the raster codebook ops) so the
    # mean-cleared cross term is an EXACT arbitrary-precision integer —
    # a distributed float reduce would be partition-order dependent:
    #   I_d = numI_d / (S0_d * (n*Sxx - Sx^2)),
    #   numI_d = sum_i (n*x_i - Sx) * (n*rx_i - Sx*rc_i)
    tab = sums.to_pandas()
    present = tab["cs"].to_numpy(np.int64) > 0
    z = tab["oz"].to_numpy(np.int64)[present].astype(object)
    n = int(present.sum())
    if n < 2:
        raise ValueError("moran_correlogram: need >= 2 present cells")
    sx = int(z.sum())
    sxx = int((z * z).sum())
    den_base = n * sxx - sx * sx
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"d": [], "s0": [], "morans_i": []}
    for d in range(1, max_d + 1):
        rc = tab[f"rc_{d}"].to_numpy(np.int64)[present].astype(object)
        rx = tab[f"rx_{d}"].to_numpy(np.int64)[present].astype(object)
        num = int(((z * n - sx) * (rx * n - sx * rc)).sum())
        s0 = int(rc.sum())
        rows["d"].append(d)
        rows["s0"].append(s0)
        rows["morans_i"].append(
            r6(float(num) / float(s0 * den_base))
            if s0 > 0 and den_base != 0 else 0.0)
    return rd.from_arrow(pa.table({
        "d": pa.array(rows["d"], pa.int64()),
        "s0": pa.array(rows["s0"], pa.int64()),
        "morans_i": pa.array(rows["morans_i"], pa.float64()),
    }))


def join_counts(points_ds):
    """geocoded pages -> ONE row (n_cells, n_black, edges, bb, bw, ww,
    e_bb, e_bw): JOIN COUNT STATISTICS over the ring-1 hex lattice —
    the classic binary spatial-association test (Cliff & Ord): color a
    cell BLACK when English pages hold the majority (``2*en >=
    pages``, ties black — declared), count the adjacent same/different
    pairs, and compare with the non-free-sampling expectations
    ``E[BB] = E*m*(m-1)/(n*(n-1))`` / ``E[BW] = E*2*m*(n-m)/(n*(n-1))``.
    BW >> E[BW] means languages interleave; BB >> E[BB] means English
    clusters spatially.

    EXACT: cell colors, adjacency and pair counts are pure integers —
    each undirected edge is found ONCE by probing the 3 positive axial
    directions (+q, +r, +q-r) against the sorted present-cell array;
    the expectations divide once each, round6.  Scale shape: one
    cell-keyed (pages, en) reduce; the edge scan is driver arithmetic
    on the bounded cell table (the ``moran_correlogram`` discipline)."""
    import ray.data as rd

    from ..functions import hexgrid
    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        en = (batch.column("lang").to_numpy(zero_copy_only=False)
              == "en").astype(np.int64)
        uniq, inv = np.unique(cell, return_inverse=True)
        pages = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        ens = np.zeros(len(uniq), np.int64)
        np.add.at(ens, inv, en)
        return pa.table({"cell": pa.array(uniq), "pages": pa.array(pages),
                         "en": pa.array(ens)})

    cells = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "cell", ["pages", "en"], how="isum",
    ).to_pandas().sort_values("cell")
    if cells.empty:
        raise ValueError("join_counts: no cells")
    cell = cells["cell"].to_numpy(np.int64)
    black = (2 * cells["en"].to_numpy(np.int64)
             >= cells["pages"].to_numpy(np.int64))
    n = len(cell)
    m = int(black.sum())
    # each undirected ring-1 edge once: positive axial directions
    bb = bw = ww = edges = 0
    for dq, dr in ((1, 0), (0, 1), (1, -1)):
        nbr = cell + dq * (np.int64(1) << np.int64(28)) + dr
        idx = np.searchsorted(cell, nbr)
        ok = (idx < n) & (cell[np.minimum(idx, n - 1)] == nbr)
        a = black[ok]
        b = black[idx[ok]]
        edges += int(ok.sum())
        bb += int((a & b).sum())
        ww += int((~a & ~b).sum())
        bw += int((a ^ b).sum())
    if n < 2:
        raise ValueError("join_counts: need >= 2 cells")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    e_bb = r6(float(edges * m * (m - 1)) / float(n * (n - 1)))
    e_bw = r6(float(edges * 2 * m * (n - m)) / float(n * (n - 1)))
    return rd.from_arrow(pa.table({
        "n_cells": pa.array([n], pa.int64()),
        "n_black": pa.array([m], pa.int64()),
        "edges": pa.array([edges], pa.int64()),
        "bb": pa.array([bb], pa.int64()),
        "bw": pa.array([bw], pa.int64()),
        "ww": pa.array([ww], pa.int64()),
        "e_bb": pa.array([e_bb], pa.float64()),
        "e_bw": pa.array([e_bw], pa.float64()),
    }))


MST_ROUNDS = 8
MST_JUMPS = 8


def mst_cells(points_ds, rounds: int = MST_ROUNDS, jumps: int = MST_JUMPS):
    """geocoded pages -> (u, w, wt): the MINIMUM SPANNING FOREST of the
    ring-1 cell-adjacency graph, edge weight = |Δ page_count| — BORUVKA
    supersteps (each component hooks its minimum cross edge under the
    total order (wt, u, w); mutual pairs break to the smaller id;
    pointer DOUBLING resolves the merge forest), the classic
    distributed-MST algorithm.  The density-gradient skeleton of the
    crawl's spatial surface: MST edges connect cells through the
    SMOOTHEST density transitions (region-merging segmentation's first
    step).

    DETERMINISTIC + exact: the total edge order makes the forest
    unique; weights/ids are ints end to end.  The contract is
    ``rounds`` supersteps with ``jumps`` doubling steps each (the
    :func:`~.ann.pca_power` discipline) — components at least halve per
    round, so 2^rounds covers the bounded cell graph (asserted).  Scale
    shape: one cell-keyed count reduce; Boruvka itself runs on the
    bounded cell table (at an unbounded cell count each superstep is
    the same bounded-degree edge-local selection + label shuffle as
    :func:`~.pagerank.pagerank`)."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(uniq),
                         "pages": pa.array(cnt.astype(np.int64))})

    cells = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "cell", ["pages"], how="isum",
    ).to_pandas().sort_values("cell")
    nodes = cells["cell"].to_numpy(np.int64)
    pc = cells["pages"].to_numpy(np.int64)
    n = len(nodes)
    if n == 0:
        raise ValueError("mst_cells: no cells")
    assert (1 << rounds) >= n, "mst_cells: rounds too small for cell count"
    eu, ew, ewt = [], [], []
    for dq, dr in ((1, 0), (0, 1), (1, -1)):
        nbr = nodes + dq * (np.int64(1) << np.int64(28)) + dr
        idx = np.searchsorted(nodes, nbr)
        ok = (idx < n) & (nodes[np.minimum(idx, n - 1)] == nbr)
        eu.append(np.flatnonzero(ok))
        ew.append(idx[ok])
        ewt.append(np.abs(pc[ok] - pc[idx[ok]]))
    eu = np.concatenate(eu)   # positions; nodes[eu] < nodes[ew]
    ew = np.concatenate(ew)
    ewt = np.concatenate(ewt)
    comp = np.arange(n, dtype=np.int64)   # per-node comp position
    picked = []
    for _ in range(rounds):
        cu, cw = comp[eu], comp[ew]
        cross = cu != cw
        if not cross.any():
            break
        cs = np.concatenate([cu[cross], cw[cross]])
        other = np.concatenate([cw[cross], cu[cross]])
        su = np.concatenate([eu[cross], eu[cross]])
        sw = np.concatenate([ew[cross], ew[cross]])
        swt = np.concatenate([ewt[cross], ewt[cross]])
        order = np.lexsort((nodes[sw], nodes[su], swt, cs))
        _, first = np.unique(cs[order], return_index=True)
        sel = order[first]
        picked.append(np.stack([su[sel], sw[sel], swt[sel]], axis=1))
        raw = np.arange(n, dtype=np.int64)
        raw[cs[sel]] = other[sel]
        ptr = raw.copy()
        mutual = raw[raw] == np.arange(n)
        ptr[mutual] = np.minimum(np.arange(n)[mutual], raw[mutual])
        for _ in range(jumps):
            ptr = ptr[ptr]
        comp = ptr[comp]
    if not picked:
        raise ValueError("mst_cells: no adjacent cells")
    allp = np.concatenate(picked)
    key = allp[:, 0] * n + allp[:, 1]
    _, fi = np.unique(key, return_index=True)
    allp = allp[fi]
    order = np.lexsort((allp[:, 1], allp[:, 0]))
    allp = allp[order]
    return rd.from_arrow(pa.table({
        "u": pa.array(nodes[allp[:, 0]]),
        "w": pa.array(nodes[allp[:, 1]]),
        "wt": pa.array(allp[:, 2]),
    }))


def cell_lang_shift(points_ds):
    """geocoded pages -> (cell, lang_a, lang_b, n_a, n_b): SPATIAL
    DRIFT detection — hex cells whose MAJORITY language differs between
    the even-doc_id and odd-doc_id snapshot halves (the
    :func:`~.textops.unigram_drift` split applied to the map): where on
    the grid did the corpus change?  Only flipped cells with both
    halves non-empty are reported.

    EXACT: majority = (lang, count) argmax with ties to the LEXICALLY
    SMALLEST language (declared, mirrored by the oracle's ORDER BY cnt
    DESC, lang); counts are integers.  Scale shape: one bounded
    (cell, half, lang) reduce, vectorized argmax per (cell, half),
    driver compare on the bounded cell table."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pid = batch.column("page_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        half = (pid % 2).astype(np.int64)
        df = pd.DataFrame({"cell": cell, "half": half, "lang": lang})
        g = df.groupby(["cell", "half", "lang"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell", "half", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if agg.empty:
        raise ValueError("cell_lang_shift: no pages")
    agg = agg.sort_values(["cell", "half", "c", "lang"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
    top = agg.groupby(["cell", "half"], sort=True).head(1)
    a = top[top["half"] == 0].set_index("cell")
    b = top[top["half"] == 1].set_index("cell")
    common = a.index.intersection(b.index)
    la = a.loc[common, "lang"]
    lb = b.loc[common, "lang"]
    flip = la.to_numpy() != lb.to_numpy()
    cells = np.asarray(common, np.int64)[flip]
    # `common` is a sorted index, so rows are already cell-ordered; no
    # trailing .sort() (it drops the schema of an empty dataset)
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells),
        "lang_a": pa.array(la.to_numpy()[flip], pa.string()),
        "lang_b": pa.array(lb.to_numpy()[flip], pa.string()),
        "n_a": pa.array(a.loc[common, "c"].to_numpy(np.int64)[flip]),
        "n_b": pa.array(b.loc[common, "c"].to_numpy(np.int64)[flip]),
    }))


def cell_lang_entropy(points_ds):
    """geocoded pages -> (cell, n, n_langs, h_micro): the LANGUAGE
    ENTROPY MAP — per-cell Shannon entropy of language labels in
    micro-nats, the spatial "is this area monolingual" layer behind
    :func:`cell_lang_shift` (shift says where the majority flipped;
    this says where majorities are weak to begin with).

    Float discipline: per-(cell, lang) terms are quantized ONCE
    (``floor(-(c/n) * ln(c/n) * 1e6 + 0.5)``, the
    :func:`~.stages.events.path_entropy` trick) so per-cell sums are
    order-free integers.  Scale shape: one bounded (cell, lang)
    reduce, vectorized segmented finalize."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cell": batch.column("cell").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "lang": batch.column("lang").to_pylist(),
        })
        g = df.groupby(["cell", "lang"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    if agg.empty:
        raise ValueError("cell_lang_entropy: no pages")
    agg = agg.sort_values(["cell", "lang"], kind="mergesort")
    cell = agg["cell"].to_numpy(np.int64)
    c = agg["c"].to_numpy(np.int64)
    uniq, inv = np.unique(cell, return_inverse=True)
    n = np.zeros(len(uniq), np.int64)
    np.add.at(n, inv, c)
    p = c.astype(np.float64) / n[inv].astype(np.float64)
    terms = np.floor(-p * np.log(p) * 1e6 + 0.5).astype(np.int64)
    h = np.zeros(len(uniq), np.int64)
    np.add.at(h, inv, terms)
    nl = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    return rd.from_arrow(pa.table({
        "cell": pa.array(uniq),
        "n": pa.array(n),
        "n_langs": pa.array(nl),
        "h_micro": pa.array(h),
    })).sort("cell")


def isolated_cells(points_ds):
    """geocoded pages -> (cell, pages): ISOLATED cells — present cells
    with NO present ring-1 neighbor (spatial islands: geocoding
    glitches, genuinely remote pockets, or cells a smoothing kernel
    leaves untouched because it has nothing to borrow from).  The
    complement diagnostic of the smoothing family.

    EXACT: presence probes are the 6 arithmetic neighbor keys against
    the sorted present-cell array (the :func:`join_counts` probe,
    both directions this time).  Scale shape: one cell-keyed count
    reduce, driver probe on the bounded cell table."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(uniq),
                         "pages": pa.array(cnt.astype(np.int64))})

    cells = hash_groupby(
        points_ds.map_batches(partial, batch_format="pyarrow"),
        "cell", ["pages"], how="isum",
    ).to_pandas().sort_values("cell")
    if cells.empty:
        raise ValueError("isolated_cells: no cells")
    cell = cells["cell"].to_numpy(np.int64)
    n = len(cell)
    has_nbr = np.zeros(n, bool)
    for dq, dr in ((1, 0), (0, 1), (1, -1), (-1, 0), (0, -1), (-1, 1)):
        nbr = cell + dq * (np.int64(1) << np.int64(28)) + dr
        idx = np.searchsorted(cell, nbr)
        ok = (idx < n) & (cell[np.minimum(idx, n - 1)] == nbr)
        has_nbr |= ok
    iso = ~has_nbr
    # returned as pandas: Ray drops the SCHEMA of any empty Dataset on
    # to_pandas (measured — sort or not), and an all-connected grid
    # legitimately yields zero isolates; the driver contract accepts
    # DataFrames, which keep their columns when empty
    import pandas as pd

    return pd.DataFrame({
        "cell": cell[iso],
        "pages": cells["pages"].to_numpy(np.int64)[iso],
    })
