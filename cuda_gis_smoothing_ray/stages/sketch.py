"""Distinct counting and order statistics over the pages stream — exact
hash-partitioned forms (SQL-oracle-checked) plus a HyperLogLog sketch (the
"novel sketch" custom-operator slot from the task brief; error-gated by
pytest).

Scale shapes:

* :func:`distinct_count` — per-batch local ``np.unique``, shuffle only the
  deduplicated (hash-partition, value) pairs, per-partition unique again,
  sum of partition counts.  Shuffle volume is bounded by the number of
  DISTINCT values, not rows.
* :func:`hll_count` — per-batch 2^p-register HLL partial, register-wise max
  merged through one tiny groupby; constant shuffle volume (p=12 -> 4 KB per
  batch) regardless of cardinality.  The 100 TB path when distincts
  themselves are too many to shuffle.
* :func:`quantiles` — exact order statistics by value-histogram: per-batch
  value counts, one small shuffle keyed by value, driver-side cumsum over
  the (bounded-cardinality) histogram.  Exact at any row count as long as
  the value domain is bounded (ints like text length); the rank definition
  ``k = floor((n-1) * q)`` (0-indexed lower quantile) is mirrored in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64, text_hash64
from ..functions.scale import default_parts

HLL_P = 12  # 4096 registers


def _host_from_url(batch: pa.Table) -> np.ndarray:
    """url -> host (chars between the 2nd and 3rd '/'), vectorized Arrow
    split; mirrors SQL ``split_part(url, '/', 3)``."""
    import pyarrow.compute as pc

    parts = pc.split_pattern(batch.column("url"), pattern="/")
    return pc.list_element(parts, 2).to_numpy(zero_copy_only=False)


def distinct_count(ds, value_fn=_host_from_url, n_parts: int | None = None):
    """-> single-row table (n_distinct:int64): exact distributed distinct.

    Batch-local unique -> hash-partitioned shuffle of distinct values ->
    per-partition unique -> sum.
    """
    n_parts = default_parts() if n_parts is None else n_parts
    from ray.data.aggregate import Sum

    def local(batch: pa.Table) -> pa.Table:
        vals = np.unique(value_fn(batch))
        h = text_hash64(vals)
        part = (h % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"part": pa.array(part), "value": pa.array(vals)})

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [df["value"].nunique()]})

    counted = (
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part)
        .aggregate(Sum("n", alias_name="n_distinct"))
    )
    return pa.table({"n_distinct": pa.array([int(counted["n_distinct"])], pa.int64())})


def _register_partial(h: np.ndarray, p: int) -> pa.Table:
    """uint64 hashes -> sparse (register, rho) HLL partial: register = top
    ``p`` hash bits, rho = 1-based position of the first set bit in the
    remaining ``64-p`` bits (capped at ``64-p+1`` when they are all zero)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = position of first set bit in the remaining bits (1-based)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    r = rest[nz]
    # count leading zeros of a uint64 vector via float64 exponent trick
    # (exact for the top 52 bits; values below 2^12 handled by the
    # flush-to-max branch above since 64-p < 52 guards nothing -- use
    # the portable loop-free log2 on the high 32 bits twice instead)
    hi = (r >> np.uint64(32)).astype(np.uint32)
    lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lz_hi = 31 - np.floor(np.log2(np.maximum(hi.astype(np.float64), 1))).astype(np.int64)
    lz_lo = 63 - np.floor(np.log2(np.maximum(lo.astype(np.float64), 1))).astype(np.int64)
    lz[nz] = np.where(hi != 0, lz_hi, np.where(lo != 0, lz_lo, 64))
    rho = np.minimum(lz + 1, 64 - p + 1)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    used = np.flatnonzero(reg)
    return pa.table({"register": pa.array(used), "rho": pa.array(reg[used])})


def hll_registers(ds, value_fn=_host_from_url, p: int = HLL_P):
    """-> (register:int64, rho:int64): the merged HLL register table itself,
    bit-exact and SQL-oracle-checkable (``oracles_corpus.hll_registers_sql``).

    Same distributed plan as :func:`hll_count` but hashed with the
    SQL-expressible :func:`...functions.hashing.poly_hash64` (rolling FNV +
    splitmix64) instead of blake2b, and returning the registers instead of
    the float estimate — the pure-integer witness that certifies the sketch
    content without putting float reduction order in the comparison."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash64

        return _register_partial(poly_hash64(np.unique(value_fn(batch))), p)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .sort("register")
    )


def hll_count(ds, value_fn=_host_from_url, p: int = HLL_P):
    """-> single-row table (n_distinct_est:double): HyperLogLog estimate.

    Deterministic 64-bit value hash; per-batch register partials; one
    groupby-max over 2^p register rows per batch.  Standard bias-corrected
    estimator with small-range linear counting.
    """
    from ray.data.aggregate import Max

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        # registers depend only on the distinct values: unique first, hash
        # the (few) distincts, skip the per-row hash loop entirely
        return _register_partial(text_hash64(np.unique(value_fn(batch))), p)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    reg = np.zeros(m, dtype=np.float64)
    reg[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg))
    zeros = float(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting for small cardinalities
    return pa.table({"n_distinct_est": pa.array([float(est)], pa.float64())})


QUANTILES = (0.5, 0.9, 0.99)


def quantiles(ds, col_fn, qs: tuple[float, ...] = QUANTILES):
    """-> (q:double, value:int64) exact lower quantiles of an integer-valued
    column: ``value`` at 0-indexed rank ``floor((n-1) * q)`` in sorted order.

    ``col_fn(batch) -> int64 np.ndarray`` extracts the value (e.g. text
    length).  Histogram plan: per-batch value counts, one value-keyed
    groupby-sum (cardinality = |value domain|), cumsum on the driver.
    """
    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(uniq.astype(np.int64)), "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        hash_groupby(ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
                     "value", ["cnt"], how="sum")
        .to_pandas()
        .sort_values("value")
    )
    c = hist["cnt"].to_numpy().astype(np.int64)
    v = hist["value"].to_numpy().astype(np.int64)
    n = int(c.sum())
    if n == 0:
        raise ValueError(
            "quantiles: empty input (or empty hash-sample via "
            "sampled_quantiles) — no order statistics exist; widen the "
            "sample rate or check the input")
    cum = np.cumsum(c)
    out_q, out_v = [], []
    for q in qs:
        k = int(np.floor((n - 1) * q))
        out_q.append(float(q))
        out_v.append(int(v[int(np.searchsorted(cum, k + 1))]))
    return pa.table({"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())})


def sampled_quantiles(ds, col_fn, id_col: str = "doc_id",
                      keep_ppm: int = 200_000,
                      qs: tuple[float, ...] = QUANTILES):
    """One-scan APPROXIMATE quantiles: deterministic hash-sample (the
    shared ``(id*mult) % mod`` rule) then EXACT quantiles of the sample —
    the scale path beside :func:`quantiles`.

    The exact plan shuffles one (value, count) pair per DISTINCT value;
    for near-unique metrics (fixed-point LM scores, exact byte lengths at
    10^12 docs) that histogram approaches |dataset|.  Sampling first caps
    the histogram at ~keep_ppm x n / 1e6 pairs while the deterministic
    hash keeps the row set — and therefore the answer — bit-reproducible
    and SQL-checkable (unlike an RNG sample).  Sampling error is gated by
    ``tests/test_sketch.py``; the oracle proves exactness OF THE SAMPLED
    DEFINITION, the test proves closeness to the exact quantiles.
    -> (q:double, value:int64)."""
    from .gridops import sample_hash

    return quantiles(sample_hash(ds, id_col, keep_ppm), col_fn, qs)


def grouped_quantiles(ds, group_col: str, col_fn, qs: tuple[float, ...] = QUANTILES):
    """-> (<group_col>, q, value): exact lower quantiles per group (same
    rank-floor((n-1)*q) definition as :func:`quantiles`).  Histogram plan
    per group: batch-local (group, value) counts shuffle (cardinality =
    |groups| x |value domain|), one vectorized cumsum solve per group."""
    import pandas as pd

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table(
            {
                group_col: pa.array(agg["g"]),
                "value": pa.array(agg["v"].to_numpy().astype(np.int64)),
                "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
            }
        )

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("value")
        v = g["value"].to_numpy()
        # partials from different batches may repeat a value: re-aggregate
        uniq, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, weights=g["cnt"].to_numpy().astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        ks = np.floor((n - 1) * np.asarray(qs)).astype(np.int64)
        vals = uniq[np.searchsorted(cum, ks + 1)]
        return pd.DataFrame(
            {
                group_col: np.repeat(g[group_col].iloc[0], len(qs)),
                "q": np.asarray(qs, dtype=np.float64),
                "value": vals.astype(np.int64),
            }
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
        .groupby(group_col)
        .map_groups(solve)
    )


def quantile_filter(ds, group_col: str, col_fn, lo: float = 0.05, hi: float = 0.95):
    """Two-stage composition: per-group exact quantile thresholds (the
    [lo, hi] band) via :func:`grouped_quantiles`, then a streaming filter
    keeping rows inside their group's band — the standard length-outlier
    scrub of a corpus pipeline.

    The threshold table is |groups| x 2 rows — an aggregate, materialized
    driver-side like any codebook (IVF centroids, polygon index) and carried
    into the filter closure; the second pass over ``ds`` streams.  Two scans
    of the input is the honest cost of an exact two-sided trim at scale
    (sketched quantiles would make it one scan at the price of exactness).
    Appends ``value`` (the filtered metric) to the surviving rows.
    """
    th = grouped_quantiles(ds, group_col, col_fn, qs=(lo, hi)).to_pandas()
    lo_map = th[th["q"] == lo].set_index(group_col)["value"].to_dict()
    hi_map = th[th["q"] == hi].set_index(group_col)["value"].to_dict()
    keys = pa.array(list(lo_map.keys()))
    lo_vals = np.array([lo_map[k] for k in lo_map], np.int64)
    hi_vals = np.array([hi_map[k] for k in lo_map], np.int64)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = col_fn(batch)
        idx = pc.index_in(batch.column(group_col), value_set=keys)
        i = idx.to_numpy(zero_copy_only=False)
        known = ~pa.compute.is_null(idx).to_numpy(zero_copy_only=False)
        i = np.where(known, i, 0).astype(np.int64)
        keep = known & (v >= lo_vals[i]) & (v <= hi_vals[i])
        out = batch.append_column("value", pa.array(v.astype(np.int64)))
        return out.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def linear_probe(docs_ds):
    """Distributed supervised MODEL FIT: ordinary-least-squares linear
    probe ``n_chars ~ intercept + slope * n_tokens`` over the corpus — the
    closed-form normal-equations path (count, Σx, Σy, Σx², Σxy, Σy² — all
    EXACT int64 moments summed batch-locally, one bounded aggregate), then
    one driver-side solve whose float expression tree is shared verbatim
    with the SQL twin, so slope/intercept/R² reproduce bit-for-bit after
    the canonical 1e-6 rounding.

    This is the supervised sibling of :func:`grouped_corr` / the kmeans
    stage: the fit itself never shuffles rows, only 6 integers per batch.
    -> one row (n_docs, slope, intercept, r2)."""
    import math

    from ray.data.aggregate import Sum

    from ..functions import textstats

    def partial(batch: pa.Table) -> pa.Table:
        bc = textstats.byte_class_counts(batch.column("text"),
                                         need_bpe=False)
        x = bc["n_tokens"].astype(np.int64)
        y = bc["n_chars"].astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    agg = docs_ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxx", "sxy", "syy")]
    )
    n = float(int(agg["n"] or 0))
    sx, sy = float(int(agg["sx"] or 0)), float(int(agg["sy"] or 0))
    sxx, sxy = float(int(agg["sxx"] or 0)), float(int(agg["sxy"] or 0))
    syy = float(int(agg["syy"] or 0))
    if n == 0.0 or (n * sxx - sx * sx) == 0.0 or (syy - sy * sy / n) == 0.0:
        raise ValueError(
            "linear_probe: degenerate design (empty corpus, constant "
            "n_tokens, or constant n_chars) — the fit is singular")
    # the EXACT expression tree of the SQL twin (same associativity)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    r2 = 1.0 - (syy - a * sy - b * sxy) / (syy - sy * sy / n)

    def r6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    return pa.table(
        {
            "n_docs": pa.array([int(n)], pa.int64()),
            "slope": pa.array([r6(b)], pa.float64()),
            "intercept": pa.array([r6(a)], pa.float64()),
            "r2": pa.array([r6(r2)], pa.float64()),
        }
    )


def grouped_linear_probe(docs_ds, group_col: str = "lang"):
    """Per-GROUP OLS linear probe (n_chars ~ n_tokens within each language):
    batch-local per-group exact int64 moment partials (np.add.at — never
    float bincount, so sums stay exact), one bounded-key aggregate, then
    the same shared-float-tree Cramer solve as :func:`linear_probe` per
    group.  Groups are report-sized (languages), so the solve runs on a
    driver-side table like any GROUP BY result.
    -> (group, n_docs, slope, intercept, r2) per group."""
    import math

    from ray.data.aggregate import Sum

    from ..functions import textstats

    cols = ("n", "sx", "sy", "sxx", "sxy", "syy")

    def partial(batch: pa.Table) -> pa.Table:
        bc = textstats.byte_class_counts(batch.column("text"),
                                         need_bpe=False)
        x = bc["n_tokens"].astype(np.int64)
        y = bc["n_chars"].astype(np.int64)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        out = {group_col: pa.array([str(u) for u in uniq], pa.string())}
        vals = {
            "n": np.ones(len(x), np.int64), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y, "syy": y * y,
        }
        for c in cols:
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, vals[c])
            out[c] = pa.array(acc)
        return pa.table(out)

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .take_all()
    )

    def r6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    rows = []
    for rec in sorted(agg, key=lambda r: r[group_col]):
        n = float(int(rec["n"]))
        sx, sy = float(int(rec["sx"])), float(int(rec["sy"]))
        sxx, sxy = float(int(rec["sxx"])), float(int(rec["sxy"]))
        syy = float(int(rec["syy"]))
        if (n * sxx - sx * sx) == 0.0 or (syy - sy * sy / n) == 0.0:
            raise ValueError(
                f"grouped_linear_probe: singular fit for group "
                f"{rec[group_col]!r} (constant x or y)")
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        r2 = 1.0 - (syy - a * sy - b * sxy) / (syy - sy * sy / n)
        rows.append((rec[group_col], int(n), r6(b), r6(a), r6(r2)))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "slope": pa.array([r[2] for r in rows], pa.float64()),
            "intercept": pa.array([r[3] for r in rows], pa.float64()),
            "r2": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def grouped_corr(ds):
    """documents -> per-language covariance/correlation of
    (text length in chars, whitespace token count).

    All shuffled state is EXACT integer moments — (n, sum_x, sum_y,
    sum_xy, sum_x2, sum_y2) per language, summed batch-locally first —
    so the shuffle carries 6 int64s per (lang, batch) and the float
    covariance/correlation finalize happens once per group with the same
    expression tree as the SQL oracle: integer numerators first, ONE
    double division, sqrt (correctly rounded per IEEE 754, unlike ln/exp)
    only in the correlation denominator, round6 at the boundary.
    """
    import pyarrow.compute as pc_

    from ..functions.hashing import fnv_token_hash64

    def partial(batch: pa.Table) -> pa.Table:
        x = pc_.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        n_words = split.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        emptyc = pc_.equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(x), dtype=np.int64), n_words)
        y = n_words - np.bincount(row_idx[emptyc], minlength=len(x)).astype(np.int64)
        lang = batch.column("lang")
        ulang, linv = np.unique(
            lang.to_numpy(zero_copy_only=False).astype(str), return_inverse=True)
        nl = len(ulang)

        def isum(v):
            acc = np.zeros(nl, np.int64)
            np.add.at(acc, linv, v)
            return acc

        return pa.table({
            "lang": pa.array(ulang, pa.string()),
            "n": pa.array(np.bincount(linv, minlength=nl).astype(np.int64)),
            "sum_x": pa.array(isum(x)),
            "sum_y": pa.array(isum(y)),
            "sum_xy": pa.array(isum(x * y)),
            "sum_x2": pa.array(isum(x * x)),
            "sum_y2": pa.array(isum(y * y)),
        })

    def add_key(batch: pa.Table) -> pa.Table:
        h = fnv_token_hash64(batch.column("lang")).view(np.int64)
        return batch.append_column("__g", pa.array(h))

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        n = np.int64(group["n"].sum())
        sx = np.int64(group["sum_x"].sum())
        sy = np.int64(group["sum_y"].sum())
        sxy = np.int64(group["sum_xy"].sum())
        sx2 = np.int64(group["sum_x2"].sum())
        sy2 = np.int64(group["sum_y2"].sum())
        num = np.float64(n * sxy - sx * sy)
        cov = num / np.float64(n * n)
        den = np.sqrt(np.float64(n * sx2 - sx * sx)) * np.sqrt(
            np.float64(n * sy2 - sy * sy))
        corr = num / den if den > 0 else np.float64(0.0)
        r6 = lambda v: np.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        return pd.DataFrame({
            "lang": [group["lang"].iat[0]],
            "n_docs": [n],
            "cov_chars_tokens": [r6(cov)],
            "corr_chars_tokens": [r6(corr)],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(add_key, batch_format="pyarrow", batch_size=None)
        .groupby("__g")
        .map_groups(finalize)
    )


def heavy_hitters(ds, phi_den: int = 500, n_parts: int | None = None):
    """documents -> (token, cnt): every whitespace token whose total
    occurrence count is >= ceil(total_tokens / phi_den) — EXACT heavy
    hitters by the canonical two-pass pattern:

    1. *Candidate pass*: each batch emits only tokens that are locally
       heavy (local_cnt * phi_den >= local_total).  By the averaging
       argument, any globally heavy token is locally heavy in at least
       one batch, so the union is a guaranteed superset — and it is
       bounded by phi_den candidates per batch, regardless of vocabulary
       size.  Candidates dedup through a hash-partition shuffle (never
       the driver), then the small distinct set broadcasts via
       ``ray.put``.
    2. *Verify pass*: a second streaming scan counts ONLY candidate
       tokens exactly (Arrow ``is_in`` prefilter, so the count shuffle
       carries |candidates| rows per batch, not the vocabulary).

    The same shape runs at 100 TB: both passes stream, the only
    materialized state is the candidate set (<= phi_den per batch after
    dedup, in practice ~the true heavy-hitter count).
    """
    n_parts = default_parts() if n_parts is None else n_parts
    import pyarrow.compute as pc_

    import ray

    from ..functions.hashing import fnv_token_hash64

    def tokens_of(batch: pa.Table):
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        return flat.filter(pc_.not_equal(flat, ""))

    def local_candidates(batch: pa.Table) -> pa.Table:
        toks = tokens_of(batch)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_batch": pa.array([], pa.int64())})
        enc = toks.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary)).astype(np.int64)
        heavy = cnt * phi_den >= len(toks)
        cand = enc.dictionary.filter(pa.array(heavy))
        # the batch total rides along under the reserved empty-token row
        # (real tokens are never empty), so one pass yields both streams
        out_tok = pa.concat_arrays([cand, pa.array([""], pa.string())])
        out_n = np.concatenate([np.zeros(len(cand), np.int64),
                                np.array([len(toks)], np.int64)])
        return pa.table({"token": out_tok, "n_batch": pa.array(out_n)})

    cand_stream = ds.map_batches(local_candidates, batch_format="pyarrow",
                                 batch_size=None).materialize()

    total = int(cand_stream.sum("n_batch"))
    threshold = -(-total // phi_den)  # ceil(total / phi_den)

    def key_rows(batch: pa.Table) -> pa.Table:
        mask = pc_.not_equal(batch.column("token"), "")
        tok = batch.column("token").filter(mask)
        h = fnv_token_hash64(tok).view(np.int64)
        return pa.table({"key": pa.array(h), "token": tok})

    def dedup_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": df["token"].unique()})

    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        part = ((k.view(np.uint64) * _GOLDEN) >> np.uint64(52)) % np.uint64(n_parts)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    cand_distinct = (
        cand_stream.map_batches(key_rows, batch_format="pyarrow", batch_size=None)
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(dedup_part)
    )
    cand_set = pa.array(
        [r["token"] for r in cand_distinct.take_all()], pa.string())
    ref = ray.put(cand_set)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cs = ray.get(ref)
        toks = tokens_of(batch)
        if len(toks) == 0 or len(cs) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        hit = toks.filter(pc_.is_in(toks, value_set=cs))
        enc = hit.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary)).astype(np.int64)
        h = fnv_token_hash64(enc.dictionary).view(np.int64)
        return pa.table({"key": pa.array(h), "token": enc.dictionary,
                         "cnt": pa.array(cnt)})

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        g = g[g["cnt"] >= threshold]
        return pd.DataFrame({"token": g["token"].to_numpy(),
                             "cnt": g["cnt"].to_numpy(np.int64)})

    return (
        ds.map_batches(exact_counts, batch_format="pyarrow", batch_size=None)
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(sum_part)
    )


def window_distinct_users(ds, window_us: int = 3_600_000_000):
    """events -> (window_start, n_users): DISTINCT user count per tumbling
    window — the distinct-aggregate-per-window shape (a plain window sum
    pre-aggregates; a distinct count cannot, so the shuffle carries the
    batch-locally DEDUPED (window, user) pairs instead of raw events,
    then dedupes exactly once more per hash partition).
    """
    from ..functions.reduce import hash_groupby

    SPAN = np.int64(1) << np.int64(20)  # user_id < 2^20 in the driver tables

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if (uid >= SPAN).any():
            raise ValueError("user_id exceeds pack span; raise SPAN")
        wi = ts // window_us  # window INDEX (epoch micros * SPAN overflows)
        pack = np.unique(wi * SPAN + uid)  # batch-local dedup
        return pa.table({"pack": pa.array(pack),
                         "one": pa.array(np.ones(len(pack), np.int64))})

    deduped = hash_groupby(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        "pack", ["one"], how="min",
    )

    def count_rows(batch: pa.Table) -> pa.Table:
        p = batch.column("pack").to_numpy(zero_copy_only=False)
        win, cnt = np.unique(p // SPAN, return_counts=True)
        return pa.table({"win": pa.array(win),
                         "n_users": pa.array(cnt.astype(np.int64))})

    counts = hash_groupby(
        deduped.map_batches(count_rows, batch_format="pyarrow", batch_size=None),
        "win", ["n_users"], how="isum",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        w = batch.column("win").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "window_start": pa.array((w * window_us).astype("datetime64[us]")),
            "n_users": batch.column("n_users"),
        })

    return counts.map_batches(finalize, batch_format="pyarrow", batch_size=None)


# count-min sketch: depth x width matrix of bucket sums under pairwise-
# independent integer hashes h_j(u) = ((u*A_j + B_j) % P) % W.  P = 2^31-1
# keeps every intermediate product < 2^62 so int64 (numpy) and BIGINT
# (DuckDB) agree exactly with no wraparound emulation needed.
CMS_P = 2_147_483_647
CMS_W = 64
CMS_A = (1_000_003, 2_000_029, 3_000_073, 4_000_037)
CMS_B = (12_345, 67_890, 13_579, 24_680)


def cms_user_counts(ds, width: int = CMS_W, a=CMS_A, b=CMS_B):
    """events -> (user_id, n_true, n_est): exact per-user event counts next
    to their count-min-sketch estimates (n_est >= n_true always; equality
    unless the user's row collides in every depth).

    The sketch is the 100 TB path for frequency estimation over unbounded
    key domains: each batch folds to a depth x width partial matrix
    (d*W <= 256 rows shuffle per batch, independent of batch size or key
    cardinality), matrices merge by cell-wise sum through one tiny
    groupby, and the merged sketch (2 KB) broadcasts via ``ray.put`` for
    the estimate pass.  The exact side (for the n_est >= n_true gate and
    the oracle) is a standard bounded-key groupby.

    Deterministic integer hashes make the whole sketch SQL-expressible, so
    unlike HLL this sketch is oracle-MATCHED, not just error-gated."""
    import ray

    from ..functions.reduce import hash_groupby

    depth = len(a)

    def partial_sketch(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cells = []
        cnts = []
        for j in range(depth):
            bkt = ((u * np.int64(a[j]) + np.int64(b[j])) % np.int64(CMS_P)) % np.int64(width)
            c = np.bincount(bkt, minlength=width).astype(np.int64)
            nz = np.flatnonzero(c)
            cells.append(nz + j * width)
            cnts.append(c[nz])
        return pa.table({"cell": pa.array(np.concatenate(cells)),
                         "cnt": pa.array(np.concatenate(cnts))})

    sketch_tbl = hash_groupby(
        ds.map_batches(partial_sketch, batch_format="pyarrow", batch_size=None),
        "cell", ["cnt"], how="isum", n_parts=4,
    ).to_pandas()
    flat = np.zeros(depth * width, dtype=np.int64)
    flat[sketch_tbl["cell"].to_numpy(np.int64)] = sketch_tbl["cnt"].to_numpy(np.int64)
    sk_ref = ray.put(flat.reshape(depth, width))

    def partial_counts(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            batch.column("user_id").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"user_id": pa.array(uniq.astype(np.int64)),
                         "n_true": pa.array(cnt.astype(np.int64))})

    exact = hash_groupby(
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=None),
        "user_id", ["n_true"], how="isum", n_parts=8,
    )

    def estimate(batch: pa.Table) -> pa.Table:
        sk = ray.get(sk_ref)
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        est = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(depth):
            bkt = ((u * np.int64(a[j]) + np.int64(b[j])) % np.int64(CMS_P)) % np.int64(width)
            est = np.minimum(est, sk[j][bkt])
        return pa.table({"user_id": batch.column("user_id"),
                         "n_true": batch.column("n_true"),
                         "n_est": pa.array(est)})

    return exact.map_batches(estimate, batch_format="pyarrow", batch_size=None)


def quantiles_cont(ds, col_fn, qs: tuple[float, ...] = QUANTILES):
    """PERCENTILE_CONT semantics: linear interpolation at rank
    ``h = (n-1) * q`` -> (q, value:double).  Same histogram plan as
    :func:`quantiles` (per-batch value counts, one bounded value-keyed
    shuffle); only the driver-side finalize differs — and the interpolation
    expression ``v_lo + frac * (v_hi - v_lo)`` is mirrored verbatim in the
    SQL oracle (no reliance on DuckDB's internal quantile_cont)."""
    from ..functions.reduce import hash_groupby

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(uniq.astype(np.int64)), "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        hash_groupby(ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
                     "value", ["cnt"], how="sum")
        .to_pandas()
        .sort_values("value")
    )
    c = hist["cnt"].to_numpy().astype(np.int64)
    v = hist["value"].to_numpy().astype(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)

    def value_at(rank: int) -> float:
        return float(v[int(np.searchsorted(cum, rank + 1))])

    out_q, out_v = [], []
    for q in qs:
        h = (n - 1) * q
        lo = int(np.floor(h))
        hi = min(lo + 1, n - 1)
        frac = h - np.floor(h)
        val = value_at(lo) + frac * (value_at(hi) - value_at(lo))
        out_q.append(float(q))
        out_v.append(np.floor(val * 1e6 + 0.5) / 1e6)
    return pa.table({"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())})


def grouped_quantiles_cont(ds, group_col: str, col_fn,
                           qs: tuple[float, ...] = QUANTILES):
    """Per-group PERCENTILE_CONT: linear interpolation at rank
    ``h = (n-1) * q`` within each group -> (<group_col>, q, value:double).
    Same (group, value)-keyed histogram shuffle as :func:`grouped_quantiles`;
    the interpolation ``v_lo + frac * (v_hi - v_lo)`` is mirrored verbatim
    in the SQL oracle."""
    import pandas as pd

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table(
            {
                group_col: pa.array(agg["g"]),
                "value": pa.array(agg["v"].to_numpy().astype(np.int64)),
                "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
            }
        )

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("value")
        v = g["value"].to_numpy()
        uniq, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, weights=g["cnt"].to_numpy().astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)

        def value_at(rank: int) -> float:
            return float(uniq[int(np.searchsorted(cum, rank + 1))])

        out_v = []
        for q in qs:
            h = (n - 1) * q
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            frac = h - np.floor(h)
            val = value_at(lo) + frac * (value_at(hi) - value_at(lo))
            out_v.append(np.floor(val * 1e6 + 0.5) / 1e6)
        return pd.DataFrame(
            {
                group_col: np.repeat(g[group_col].iloc[0], len(qs)),
                "q": np.asarray(qs, dtype=np.float64),
                "value": np.asarray(out_v, dtype=np.float64),
            }
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
        .groupby(group_col)
        .map_groups(solve)
    )


TRIM_FRAC = 0.1


def robust_stats(ds, group_col: str, col_fn, trim: float = TRIM_FRAC):
    """-> (<group_col>, n, median, mad, trimmed_mean): robust per-group
    location/scale statistics over a bounded-domain integer metric —
    median (rank floor((n-1)*0.5), the :func:`grouped_quantiles`
    definition), MAD (median of |v - median|, same rank rule), and the
    two-sided ``trim``-fraction trimmed mean (drop floor(n*trim) lowest
    and highest ranks; exact int64 sum over the survivors, the mean being
    the one derived double, floor(x*1e6+0.5)/1e6).

    Scale shape: the :func:`grouped_quantiles` histogram plan — batch-local
    (group, value) counts are the only shuffle (|groups| x |domain| rows),
    then ONE vectorized cumsum solve per group computes all three
    statistics from the same histogram; MAD needs no second data pass
    because folding the histogram around the median preserves counts."""
    import pandas as pd

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table({
            group_col: pa.array(agg["g"]),
            "value": pa.array(agg["v"].to_numpy().astype(np.int64)),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
        })

    def solve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("value")
        v = g["value"].to_numpy()
        uniq, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, weights=g["cnt"].to_numpy().astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        med = int(uniq[np.searchsorted(cum, (n - 1) // 2 + 1)])
        # MAD: fold the histogram around the median, re-aggregate, re-rank
        d = np.abs(uniq - med)
        du = np.unique(d)
        dc = np.zeros(len(du), np.int64)
        np.add.at(dc, np.searchsorted(du, d), c)
        mad = int(du[np.searchsorted(np.cumsum(dc), (n - 1) // 2 + 1)])
        # trimmed mean: per-value overlap of [cum_prev, cum) with the kept
        # rank window [t, n - 1 - t]
        t = int(np.floor(n * trim))
        lo, hi = t, n - t  # kept ranks are [lo, hi) half-open
        prev = np.concatenate(([0], cum[:-1]))
        kept = np.clip(np.minimum(cum, hi) - np.maximum(prev, lo), 0, None)
        ksum = int(np.sum(uniq * kept))
        kn = int(np.sum(kept))
        tmean = np.floor(ksum / kn * 1e6 + 0.5) / 1e6 if kn else 0.0
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "n": np.array([n], np.int64),
            "median": np.array([med], np.int64),
            "mad": np.array([mad], np.int64),
            "trimmed_mean": np.array([tmean], np.float64),
        })

    return (
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
        .groupby(group_col)
        .map_groups(solve)
    )


KS_LANGS = ("en", "de")


def ks_test(ds, group_col: str, col_fn, groups: tuple[str, str] = KS_LANGS):
    """-> ONE row (at_value, n_a, n_b, ks_d): the two-sample
    KOLMOGOROV-SMIRNOV statistic between two groups' integer-metric
    distributions — ``D = max over v of |ECDF_a(v) - ECDF_b(v)|`` and the
    value attaining it (ties -> smallest v), the standard distribution-
    drift test a corpus pipeline runs between two sources/snapshots.

    EXACT: the argmax compares |c_a * n_b - c_b * n_a| in integers
    (cross-multiplied ECDFs — no float enters the scan); only the final
    reported ``ks_d`` divides once, with the shared rounding.  Scale
    shape: one bounded (group, value) histogram shuffle (the
    :func:`grouped_quantiles` plan), then the scan runs on the merged
    |value domain|-sized histogram."""
    import pandas as pd
    import ray.data as rd

    ga, gb = groups

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        keep = (g == ga) | (g == gb)
        df = pd.DataFrame({"g": g[keep], "v": v[keep]})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table({
            "g": pa.array(agg["g"]),
            "v": pa.array(agg["v"].to_numpy().astype(np.int64)),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
        })

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "v"])
        .sum("cnt")
        .to_pandas()
    )
    col = "sum(cnt)"
    a = hist[hist["g"] == ga].sort_values("v")
    b = hist[hist["g"] == gb].sort_values("v")
    if a.empty or b.empty:
        raise ValueError(f"ks_test: empty group among {groups}")
    va, ca = a["v"].to_numpy(np.int64), np.cumsum(a[col].to_numpy(np.int64))
    vb, cb = b["v"].to_numpy(np.int64), np.cumsum(b[col].to_numpy(np.int64))
    na, nb = int(ca[-1]), int(cb[-1])
    vs = np.union1d(va, vb)
    cdf_a = np.concatenate(([0], ca))[np.searchsorted(va, vs, side="right")]
    cdf_b = np.concatenate(([0], cb))[np.searchsorted(vb, vs, side="right")]
    diff = np.abs(cdf_a.astype(object) * nb - cdf_b.astype(object) * na)
    best = int(np.argmax(diff))  # first occurrence = smallest v on ties
    ks_d = np.floor(float(diff[best]) / float(na * nb) * 1e6 + 0.5) / 1e6
    return rd.from_arrow(pa.table({
        "at_value": pa.array([int(vs[best])], pa.int64()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_d": pa.array([ks_d], pa.float64()),
    }))


def quantile_normalize(ds, group_col: str, col_fn):
    """-> (doc_id, len, qnorm): QUANTILE NORMALIZATION of an integer
    metric across groups — each group's r-th smallest value maps to the
    POOLED distribution's value at the proportional rank
    (``pooled_sorted[(r-1) * N // n_group]``), the standard batch-effect
    removal that forces every group onto one reference distribution
    (exact-integer variant: pooled order statistic, not an interpolated
    mean).

    Scale shape: ONE coarse group-keyed shuffle ranks each group
    (segmented lexsort, the :func:`..stages.textops.host_rank`
    discipline); the pooled reference is the bounded VALUE HISTOGRAM
    (cumsum codebook, broadcast as a closure) — order statistics at any
    index come from one searchsorted, so the pooled data itself never
    re-sorts or re-shuffles."""
    import pandas as pd

    from ..functions import hashing

    def counts(batch: pa.Table) -> pa.Table:
        v = col_fn(batch)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ..functions.reduce import hash_groupby

    hist = hash_groupby(
        ds.map_batches(counts, batch_format="pyarrow"),
        "v", ["cnt"], how="isum",
    ).to_pandas().sort_values("v")
    vs = hist["v"].to_numpy(np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n_total = int(cum[-1])

    def add_part(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = col_fn(batch)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        gid = hashing.poly_hash64(g.combine_chunks() if isinstance(
            g, pa.ChunkedArray) else g).view(np.int64)
        return pa.table({
            "doc_id": pa.array(d), "gid": pa.array(gid),
            "len": pa.array(v.astype(np.int64)),
            "__part": pa.array(hashing.coarse_partition(gid, 64)),
        })

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        gid = df["gid"].to_numpy(np.int64)
        ln = df["len"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        order = np.lexsort((d, ln, gid))
        gid, ln, d = gid[order], ln[order], d[order]
        new = np.ones(len(gid), dtype=bool)
        new[1:] = gid[1:] != gid[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rk = np.arange(len(gid), dtype=np.int64) - starts[seg]  # 0-based
        ng = np.diff(np.concatenate((starts, [len(gid)])))[seg]
        idx = rk * n_total // ng  # 0-based pooled index
        qnorm = vs[np.searchsorted(cum, idx + 1)]
        return pd.DataFrame({"doc_id": d, "len": ln, "qnorm": qnorm})

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(solve, batch_format="pandas")
    )


def decision_stump(docs_ds):
    """documents -> one-row (threshold, n_left, n_right, err, acc): the
    optimal 1-D decision stump predicting ``lang == 'en'`` from
    ``n_chars`` — the split value minimizing total misclassifications
    when each side votes its majority class (ties: smaller threshold).
    The supervised-split primitive under every tree learner, exact.

    Scale shape: ONE bounded value-histogram shuffle — batch-local
    (n_chars, n, n_pos) partials, distinct-value keyed reduce — then the
    driver walks the CDF once (histogram-sized, never doc rows).  All
    integer math; ``acc`` is the engine's canonical
    ``floor(x * 1e6 + 0.5) / 1e6`` of the exact fraction."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        en = (np.asarray(batch.column("lang").to_pylist(), dtype=object)
              == "en").astype(np.int64)
        uniq, inv = np.unique(v, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        p = np.zeros(len(uniq), np.int64)
        np.add.at(p, inv, en)
        return pa.table({"v": pa.array(uniq), "n": pa.array(n),
                         "pos": pa.array(p)})

    hist = hash_groupby(
        docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "v", ["n", "pos"], how="isum",
    ).to_pandas()  # bounded by distinct n_chars values
    hist = hist.sort_values("v").reset_index(drop=True)
    v = hist["v"].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    pos = hist["pos"].to_numpy(np.int64)
    n_tot, pos_tot = int(n.sum()), int(pos.sum())
    nL = np.cumsum(n)
    posL = np.cumsum(pos)
    negL = nL - posL
    nR = n_tot - nL
    posR = pos_tot - posL
    negR = nR - posR
    err = np.minimum(posL, negL) + np.minimum(posR, negR)
    best = int(np.argmin(err))  # np.argmin takes the FIRST min — smallest v
    acc = float(np.floor((1.0 - err[best] / n_tot) * 1e6 + 0.5) / 1e6)
    return rd.from_arrow(pa.table({
        "threshold": pa.array([int(v[best])], pa.int64()),
        "n_left": pa.array([int(nL[best])], pa.int64()),
        "n_right": pa.array([int(nR[best])], pa.int64()),
        "err": pa.array([int(err[best])], pa.int64()),
        "acc": pa.array([acc], pa.float64()),
    }))


HLL_GROUP_P = 8  # 256 registers per group — the grouped-sketch default


def hll_by_lang(ds, p: int = HLL_GROUP_P):
    """pages -> (lang, register, rho): a MERGED HLL register table PER
    LANGUAGE — the grouped-sketch shape (one mergeable distinct-count
    sketch per group, union-able across shards by register max), bit-exact
    and SQL-oracled like the global :func:`hll_registers`.  Distinct hosts
    per language without a distinct-keys shuffle: only |langs| x 2^p
    register rows ever move.
    """
    import pandas as pd

    from ray.data.aggregate import Max

    from ..functions.hashing import poly_hash64

    def partial(batch: pa.Table) -> pa.Table:
        host = _host_from_url(batch)
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        pair = np.char.add(np.char.add(lang.astype(str), "\x1f"),
                           host.astype(str))
        uniq = np.unique(pair)
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "register": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64())})
        if len(uniq) == 0:
            return empty
        split = np.char.partition(uniq.astype(str), "\x1f")
        langs = split[:, 0]
        hosts = split[:, 2]
        outs = []
        # _register_partial REDUCES to the per-register max — run it per
        # language (bounded set) so the lang column stays aligned
        for lg in np.unique(langs):
            sel = langs == lg
            t = _register_partial(
                poly_hash64(pa.array(hosts[sel].astype(object))), p)
            outs.append(pa.table({
                "lang": pa.array([str(lg)] * len(t), pa.string()),
                "register": t.column("register"),
                "rho": t.column("rho"),
            }))
        return pa.concat_tables(outs) if outs else empty

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .sort(["lang", "register"])
    )


def benford_deviation(ds):
    """events -> 9 rows (digit, obs, exp_micro, chi2_contrib): the
    FIRST-DIGIT (Benford) profile of the event cents — the classic
    fabricated-data / instrumentation-bug screen for a value column.
    ``exp_micro = floor(n * log10(1 + 1/d) * 1e6 + 0.5)`` (the expected
    count in exact micro-units) and ``chi2_contrib = (obs - n*p_d)^2 /
    (n*p_d)`` with the shared float tree, round6.

    EXACT digit extraction: integer repeated-division (ten vectorized
    halving passes, never float log10, whose boundary rounding at powers
    of ten differs between libms).  Scale shape: per-batch 9-bin digit
    histograms, one bounded 9-key reduce; the expectation math is driver
    arithmetic on ten scalars.  Zero-cent rows are excluded (no leading
    digit), mirrored by the oracle."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def digits(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        c = cents[cents > 0]
        while True:
            big = c >= 10
            if not big.any():
                break
            c = np.where(big, c // 10, c)
        obs = np.bincount(c, minlength=10)[1:10].astype(np.int64)
        return pa.table({"digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                         "obs": pa.array(obs)})

    hist = hash_groupby(
        ds.map_batches(digits, batch_format="pyarrow"),
        "digit", ["obs"], how="isum",
    ).to_pandas().sort_values("digit")
    obs = np.zeros(9, np.int64)
    obs[hist["digit"].to_numpy(np.int64) - 1] = hist["obs"].to_numpy(np.int64)
    n = int(obs.sum())
    if n == 0:
        raise ValueError("benford_deviation: no positive values")
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    exp_micro = np.empty(9, np.int64)
    chi2 = np.empty(9, np.float64)
    for d in range(1, 10):
        p = np.log10(1.0 + 1.0 / d)
        e = n * p
        exp_micro[d - 1] = int(np.floor(e * 1e6 + 0.5))
        chi2[d - 1] = r6((obs[d - 1] - e) * (obs[d - 1] - e) / e)
    return rd.from_arrow(pa.table({
        "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
        "obs": pa.array(obs),
        "exp_micro": pa.array(exp_micro),
        "chi2_contrib": pa.array(chi2, pa.float64()),
    }))


def spearman_corr(docs_ds):
    """documents -> ONE row (n, rho): SPEARMAN rank correlation between
    per-doc characters (``n_chars``) and whitespace token counts — the
    robust monotone-association companion to :func:`linear_probe`'s OLS
    (outliers bend Pearson, not ranks).

    EXACT ranks from the two VALUE HISTOGRAMS: the average tie rank
    doubled is the integer ``2r(v) = 2*cnt_less(v) + cnt_eq(v) + 1``, so
    every doc's rank pair is integer and the five Pearson moments over
    (2ra, 2rb) are exact int sums; rho is one float expression over them
    (the doubling cancels), round6.  Scale shape: two bounded value
    histograms -> broadcast rank codebooks -> ONE streaming moment pass;
    nothing per-doc on the driver."""
    import pyarrow.compute as pc_
    import ray
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def vals(batch: pa.Table):
        chars = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = np.bincount(row[nonempty], minlength=len(batch)).astype(np.int64)
        return chars, toks

    def hist_partial(batch: pa.Table) -> pa.Table:
        chars, toks = vals(batch)
        out_k, out_v, out_c = [], [], []
        for which, arr in ((0, chars), (1, toks)):
            u, c = np.unique(arr, return_counts=True)
            out_k += [which] * len(u)
            out_v += u.tolist()
            out_c += c.tolist()
        return pa.table({"key": pa.array(
            [k * (1 << 40) + v for k, v in zip(out_k, out_v)], pa.int64()),
            "c": pa.array(out_c, pa.int64())})

    hist = hash_groupby(
        docs_ds.map_batches(hist_partial, batch_format="pyarrow"),
        "key", ["c"], how="isum",
    ).to_pandas()
    key = hist["key"].to_numpy(np.int64)
    cnt = hist["c"].to_numpy(np.int64)
    books = []
    for which in (0, 1):
        m = (key >> 40) == which
        v = key[m] & ((1 << 40) - 1)
        order = np.argsort(v)
        v, c = v[order], cnt[m][order]
        less = np.concatenate([[0], np.cumsum(c)[:-1]])
        r2 = 2 * less + c + 1  # doubled average tie rank, exact int
        books.append((v, r2.astype(np.int64)))
    ref = ray.put(books)

    def moments(batch: pa.Table) -> pa.Table:
        (va, ra), (vb, rb) = ray.get(ref)
        chars, toks = vals(batch)
        x = ra[np.searchsorted(va, chars)]
        y = rb[np.searchsorted(vb, toks)]
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n": pa.array([len(chars)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x.astype(object) * y).sum())], pa.int64()),
            "sxx": pa.array([int((x.astype(object) * x).sum())], pa.int64()),
            "syy": pa.array([int((y.astype(object) * y).sum())], pa.int64()),
        })

    mom = hash_groupby(
        docs_ds.map_batches(moments, batch_format="pyarrow"),
        "k", ["n", "sx", "sy", "sxy", "sxx", "syy"], how="isum",
    ).to_pandas()
    n = int(mom["n"].sum())
    sx, sy = int(mom["sx"].sum()), int(mom["sy"].sum())
    sxy = int(mom["sxy"].sum())
    sxx, syy = int(mom["sxx"].sum()), int(mom["syy"].sum())
    import math
    da = n * sxx - sx * sx
    db = n * syy - sy * sy
    if da == 0 or db == 0:
        raise ValueError("spearman_corr: a rank vector is constant")
    rho = float(n * sxy - sx * sy) / (
        math.sqrt(float(da)) * math.sqrt(float(db)))
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "rho": pa.array([r6(rho)], pa.float64()),
    }))


def weighted_median_len(docs_ds):
    """documents -> ONE row (total_tokens, median_len, mass_below): the
    TOKEN-MASS-weighted median document length — the smallest ``n_chars``
    L such that documents with length <= L hold at least HALF the corpus
    token mass.  "Half the tokens live in docs shorter than X" is the
    curation statistic behind length-proportional sampling and packing
    decisions (the unweighted median treats a 10-token and a 10k-token
    doc alike).

    EXACT: the (length -> token mass) histogram is integer; the boundary
    test is ``2 * cumsum >= total`` with no division.  Scale shape: one
    bounded value-histogram shuffle (the quantiles plan with a weight
    channel), driver CDF walk."""
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def partial(batch: pa.Table) -> pa.Table:
        chars = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = np.bincount(row[nonempty],
                           minlength=len(batch)).astype(np.int64)
        uniq, inv = np.unique(chars, return_inverse=True)
        w = np.zeros(len(uniq), np.int64)
        np.add.at(w, inv, toks)
        return pa.table({"len": pa.array(uniq), "w": pa.array(w)})

    hist = hash_groupby(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "len", ["w"], how="isum",
    ).to_pandas().sort_values("len")
    total = int(hist["w"].sum())
    if total == 0:
        raise ValueError("weighted_median_len: no tokens")
    cum = 0
    for rec in hist.itertuples():
        cum += int(rec.w)
        if 2 * cum >= total:
            return rd.from_arrow(pa.table({
                "total_tokens": pa.array([total], pa.int64()),
                "median_len": pa.array([int(rec.len)], pa.int64()),
                "mass_below": pa.array([cum], pa.int64()),
            }))
    raise AssertionError("unreachable")


def mann_whitney(ds, group_col: str = "lang", value_col: str = "n_chars",
                 groups: tuple[str, str] = KS_LANGS):
    """-> ONE row (n_a, n_b, u2, auc, z): the two-sample MANN-WHITNEY U
    rank-sum test between two groups' integer metric, plus the
    equivalent ROC-AUC ``P(a > b) + P(a = b)/2`` — the rank companion
    to :func:`ks_test` (KS locates WHERE two distributions differ; U/z
    says whether one stochastically dominates, and AUC is the effect
    size a quality classifier scoring group membership would achieve).

    EXACT: from the per-(group, value) histograms, doubled U is the
    integer ``2U = sum_v cA(v) * (2 * cumB_less(v) + cB(v))``; the
    tie-corrected variance numerator stays the integer ``varnum =
    nA*nB*((n+1)*n*(n-1) - sum_t(t^3 - t))`` in Python bigints (it
    exceeds int64), and auc / z each divide once in a float tree shared
    verbatim with the SQL oracle.  No continuity correction (declared —
    the oracle applies none either).  Scale shape: one bounded
    (group, value) histogram shuffle, driver finalize on the merged
    value domain — pages never leave their partitions."""
    import math

    import pandas as pd
    import ray.data as rd

    ga, gb = groups

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (g == ga) | (g == gb)
        df = pd.DataFrame({"g": g[keep], "v": v[keep]})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table({
            "g": pa.array(agg["g"]),
            "v": pa.array(agg["v"].to_numpy().astype(np.int64)),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
        })

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "v"])
        .sum("cnt")
        .to_pandas()
    )
    col = "sum(cnt)"
    a = hist[hist["g"] == ga].sort_values("v")
    b = hist[hist["g"] == gb].sort_values("v")
    if a.empty or b.empty:
        raise ValueError(f"mann_whitney: empty group among {groups}")
    va, cA = a["v"].to_numpy(np.int64), a[col].to_numpy(np.int64)
    vb, cB = b["v"].to_numpy(np.int64), b[col].to_numpy(np.int64)
    na, nb = int(cA.sum()), int(cB.sum())
    cumb = np.concatenate(([0], np.cumsum(cB)))
    idx = np.searchsorted(vb, va, side="left")
    less = cumb[idx]
    tie_b = np.where((idx < len(vb)) & (vb[np.minimum(idx, len(vb) - 1)] == va),
                     cB[np.minimum(idx, len(vb) - 1)], 0)
    u2 = int((cA.astype(object) * (2 * less.astype(object)
                                   + tie_b.astype(object))).sum())
    # tie correction over the COMBINED sample: sum(t^3 - t) per value
    t_counts = hist.groupby("v")[col].sum().to_numpy(np.int64)
    sum_t = sum(int(t) ** 3 - int(t) for t in t_counts)
    n = na + nb
    varnum = na * nb * ((n + 1) * n * (n - 1) - sum_t)
    if varnum == 0:
        raise ValueError("mann_whitney: zero variance (all values tied)")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    auc = r6(float(u2) / float(2 * na * nb))
    z = r6(float(u2 - na * nb)
           / (2.0 * math.sqrt(float(varnum) / float(12 * n * (n - 1)))))
    return rd.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc": pa.array([auc], pa.float64()),
        "z": pa.array([z], pa.float64()),
    }))


KMV_K = 64


def kmv_distinct(events_ds, k: int = KMV_K):
    """events -> one row per event_type (event_type, n_distinct, kmv_k,
    kmv_est, rel_err): the K-MINIMUM-VALUES distinct-count sketch next
    to the exact answer — the order-statistics alternative to
    :func:`hll_registers` (KMV keeps the k smallest hash values instead
    of register maxima; its state merges by multiset-min and its error
    is ~1/sqrt(k-2)).

    DETERMINISTIC + exact integers: the estimator is the classic
    ``(k-1) * 2^64 // h_(k)`` over splitmix64(user_id) hashes, floor
    division on both engines; a type with <= k distinct users reports
    the EXACT count (the sketch degenerates to the full multiset).
    ``rel_err`` = (est - n)/n, one round6 division.  Scale shape: one
    (type, user) dedup shuffle, then <= k hashes + one count per type
    per partition stream to the driver (a |types| x k merge) — the same
    mergeable shape as HLL, never the raw events."""
    import ray.data as rd

    from ..functions.hashing import splitmix64

    pairs = events_ds.map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "user_id": b.column("user_id")}),
        batch_format="pyarrow",
    ).groupby(["event_type", "user_id"]).count()

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        u = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = splitmix64(u.astype(np.uint64))
        types, cnts, hs = [], [], []
        for t in np.unique(et):
            m = et == t
            hh = np.sort(h[m])
            types.append(str(t))
            cnts.append(int(m.sum()))
            hs.append(hh[: min(k, len(hh))].tolist())
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
            "hs": pa.array(hs, pa.list_(pa.uint64())),
        })

    part = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        raise ValueError("kmv_distinct: no events")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"event_type": [], "n_distinct": [], "kmv_k": [],
            "kmv_est": [], "rel_err": []}
    for t, grp in part.groupby("event_type", sort=True):
        n = int(grp["cnt"].sum())
        allh = np.sort(np.concatenate(
            [np.asarray(x, dtype=np.uint64) for x in grp["hs"]]))
        if n <= k:
            est = n
        else:
            hk = int(allh[k - 1])
            est = (k - 1) * (1 << 64) // max(hk, 1)
        rows["event_type"].append(t)
        rows["n_distinct"].append(n)
        rows["kmv_k"].append(min(k, n))
        rows["kmv_est"].append(est)
        rows["rel_err"].append(r6(float(est - n) / float(n)))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
        "kmv_k": pa.array(rows["kmv_k"], pa.int64()),
        "kmv_est": pa.array(rows["kmv_est"], pa.int64()),
        "rel_err": pa.array(rows["rel_err"], pa.float64()),
    }))


def kruskal_wallis(ds, group_col: str = "lang", value_col: str = "n_chars"):
    """-> ONE row (n, n_groups, h, h_tie): the KRUSKAL-WALLIS H test —
    "do ANY of the language groups differ in document length?" — the
    k-group extension of :func:`mann_whitney` (one omnibus rank test
    instead of k^2 pairwise ones).

    EXACT rank sums from ONE (group, value) histogram: with doubled
    average tie ranks ``2r(v) = 2*cnt_less(v) + cnt(v) + 1`` (integers),
    each group's doubled rank sum ``R'_g = sum_v cnt_g(v) * 2r(v)`` is
    an exact bigint; the per-group float terms ``R'_g^2 / (4 * n_g)``
    fold LEFT-ASSOCIATIVELY in group order (mirrored by the oracle's
    ``list_reduce(list(t ORDER BY g))``), then
    ``H = 12*S/(n*(n+1)) - 3*(n+1)`` and the tie-corrected
    ``H / (1 - sum_t(t^3 - t)/(n^3 - n))`` — two shared float trees,
    round6.  Scale shape: one bounded (group, value) histogram shuffle;
    everything after runs on the histogram."""
    import pandas as pd
    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table({
            "g": pa.array(agg["g"]),
            "v": pa.array(agg["v"].to_numpy().astype(np.int64)),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
        })

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "v"])
        .sum("cnt")
        .to_pandas()
    )
    col = "sum(cnt)"
    if hist.empty:
        raise ValueError("kruskal_wallis: no rows")
    # global doubled tie ranks from the merged value histogram
    glob = hist.groupby("v")[col].sum().sort_index()
    vals = glob.index.to_numpy(np.int64)
    t_counts = glob.to_numpy(np.int64)
    less = np.concatenate([[0], np.cumsum(t_counts)[:-1]])
    r2 = 2 * less + t_counts + 1  # doubled average rank, exact int
    n = int(t_counts.sum())
    sum_t = sum(int(t) ** 3 - int(t) for t in t_counts)
    if sum_t == n ** 3 - n:
        raise ValueError("kruskal_wallis: all values tied")
    s = 0.0
    first = True
    n_groups = 0
    for g, grp in hist.groupby("g", sort=True):
        n_groups += 1
        gv = grp["v"].to_numpy(np.int64)
        gc = grp[col].to_numpy(np.int64)
        rp = int((gc.astype(object)
                  * r2[np.searchsorted(vals, gv)].astype(object)).sum())
        ng = int(gc.sum())
        term = float(rp * rp) / float(4 * ng)
        if first:
            s, first = term, False
        else:
            s += term
    h = 12.0 * s / float(n * (n + 1)) - float(3 * (n + 1))
    h_tie = h / (1.0 - float(sum_t) / float(n ** 3 - n))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_groups": pa.array([n_groups], pa.int64()),
        "h": pa.array([r6(h)], pa.float64()),
        "h_tie": pa.array([r6(h_tie)], pa.float64()),
    }))


def welch_ttest(ds, group_col: str = "lang", value_col: str = "n_chars",
                groups: tuple[str, str] = KS_LANGS):
    """-> ONE row (n_a, n_b, mean_a, mean_b, t, dof): WELCH'S unequal-
    variance t test between two groups' integer metric — the parametric
    member of the two-sample family (:func:`ks_test` for shape,
    :func:`mann_whitney` for rank dominance, this for means when the
    CLT is trusted).

    EXACT integer moments (n, S1, S2) per group in ONE mixed reduce;
    every float after that is a single shared expression tree —
    ``a = (n*S2 - S1^2)/(n*(n-1))/n`` per group (the sample variance
    over n), ``t = (m_a - m_b)/sqrt(a + b)``, Welch-Satterthwaite
    ``dof = (a+b)^2 / (a^2/(n_a-1) + b^2/(n_b-1))``, round6.  Scale
    shape: 2x3 scalars leave the partitions; nothing else moves."""
    import math

    import ray.data as rd

    from ..functions.reduce import hash_groupby

    ga, gb = groups

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows_k, rows_n, rows_s1, rows_s2 = [], [], [], []
        for k, name in ((0, ga), (1, gb)):
            m = g == name
            vv = v[m]
            rows_k.append(k)
            rows_n.append(int(m.sum()))
            rows_s1.append(int(vv.sum()))
            rows_s2.append(int((vv.astype(object) * vv).sum()))
        return pa.table({"k": pa.array(rows_k, pa.int64()),
                         "n": pa.array(rows_n, pa.int64()),
                         "s1": pa.array(rows_s1, pa.int64()),
                         "s2": pa.array(rows_s2, pa.int64())})

    mom = hash_groupby(
        ds.map_batches(moments, batch_format="pyarrow"),
        "k", ["n", "s1", "s2"], how="isum",
    ).to_pandas().sort_values("k")
    if len(mom) != 2 or (mom["n"] < 2).any():
        raise ValueError(f"welch_ttest: a group among {groups} has < 2 rows")
    (na, s1a, s2a), (nb, s1b, s2b) = (
        (int(r.n), int(r.s1), int(r.s2)) for r in mom.itertuples())
    ma = float(s1a) / float(na)
    mb = float(s1b) / float(nb)
    a = float(na * s2a - s1a * s1a) / float(na * (na - 1)) / float(na)
    b = float(nb * s2b - s1b * s1b) / float(nb * (nb - 1)) / float(nb)
    if a + b == 0.0:
        raise ValueError("welch_ttest: zero variance in both groups")
    t = (ma - mb) / math.sqrt(a + b)
    dof = (a + b) * (a + b) / (a * a / float(na - 1) + b * b / float(nb - 1))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "mean_a": pa.array([r6(ma)], pa.float64()),
        "mean_b": pa.array([r6(mb)], pa.float64()),
        "t": pa.array([r6(t)], pa.float64()),
        "dof": pa.array([r6(dof)], pa.float64()),
    }))


BH_ALPHA = 0.05
_ERFC_P = 0.3275911
_ERFC_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erfc_as(x: float) -> float:
    """Abramowitz-Stegun 7.1.26 erfc(x) for x >= 0 — the SHARED float tree
    the SQL oracle mirrors term for term (poly nested left-to-right, one
    exp).  Max abs error 1.5e-7, inside the round6 contract."""
    import math

    a1, a2, a3, a4, a5 = _ERFC_A
    u = 1.0 / (1.0 + _ERFC_P * x)
    poly = ((((a5 * u + a4) * u + a3) * u + a2) * u + a1) * u
    return poly * math.exp(-x * x)


def bh_fdr(ds, alpha: float = BH_ALPHA):
    """events -> (event_type, n_weekday, n_weekend, t, p_value, p_adj,
    reject): the MULTIPLE-TESTING-CONTROLLED metric scan — Welch's t of
    weekend-vs-weekday mean value per event type, two-sided normal-
    approximation p (A&S 7.1.26 erfc of ``|t|/sqrt(2)``), then
    Benjamini-Hochberg step-up FDR across ALL event types:
    ``p_adj_(i) = min(1, min_{j>=i} p_(j) * m / j)`` over p ascending
    (event_type tie-break), reject at ``p_adj <= alpha``.  The correction
    a dashboard needs when it scans one hypothesis per segment — without
    it, 20 segments at alpha=.05 produce a false "significant" weekly.

    EXACT integer cents moments (n, S1, S2) per (type, is_weekend) in one
    bounded reduce (Python-int finish, so ``n*S2`` can't overflow); the BH
    ladder runs on the round6-QUANTIZED p values so cross-engine ordering
    is deterministic.  Scale shape: 6 scalars per (type, weekend-ness)
    leave the partitions; the ladder is |event_types|-sized by
    construction."""
    import math

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        we = ((d + 3) % 7 >= 5).astype(np.int64)
        df = pd.DataFrame({"et": et, "we": we, "s1": cents,
                           "s2": cents * cents})
        g = df.groupby(["et", "we"], sort=False).agg(
            n=("we", "size"), s1=("s1", "sum"), s2=("s2", "sum")).reset_index()
        return pa.table({
            "et": pa.array(g["et"], pa.string()),
            "we": pa.array(g["we"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s1": pa.array(g["s1"].to_numpy(np.int64)),
            "s2": pa.array(g["s2"].to_numpy(np.int64)),
        })

    mom = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(["et", "we"])
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                   Sum("s2", alias_name="s2"))
    ).to_pandas()
    if mom.empty:
        raise ValueError("bh_fdr: no events")

    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = []
    for et, grp in mom.groupby("et", sort=True):
        wd = grp[grp["we"] == 0]
        we = grp[grp["we"] == 1]
        if (len(wd) != 1 or len(we) != 1
                or int(wd["n"].iloc[0]) < 2 or int(we["n"].iloc[0]) < 2):
            raise ValueError(f"bh_fdr: event_type {et!r} lacks >= 2 events"
                             " on both weekday and weekend")
        nwd, s1wd, s2wd = (int(wd[c].iloc[0]) for c in ("n", "s1", "s2"))
        nwe, s1we, s2we = (int(we[c].iloc[0]) for c in ("n", "s1", "s2"))
        mwd = float(s1wd) / float(nwd)
        mwe = float(s1we) / float(nwe)
        a = float(nwd * s2wd - s1wd * s1wd) / float(nwd * (nwd - 1)) / float(nwd)
        b = float(nwe * s2we - s1we * s1we) / float(nwe * (nwe - 1)) / float(nwe)
        if a + b == 0.0:
            raise ValueError(f"bh_fdr: zero variance for {et!r}")
        t = (mwe - mwd) / math.sqrt(a + b)
        p6 = r6(_erfc_as(abs(t) / math.sqrt(2.0)))
        rows.append({"event_type": et, "n_weekday": nwd, "n_weekend": nwe,
                     "t": t, "p6": p6})

    m = len(rows)
    order = sorted(range(m), key=lambda i: (rows[i]["p6"],
                                            rows[i]["event_type"]))
    adj = [0.0] * m
    best = math.inf
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        best = min(best, rows[i]["p6"] * float(m) / float(rank))
        adj[i] = min(1.0, best)
    return rd.from_arrow(pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n_weekday": pa.array([r["n_weekday"] for r in rows], pa.int64()),
        "n_weekend": pa.array([r["n_weekend"] for r in rows], pa.int64()),
        "t": pa.array([r6(r["t"]) for r in rows], pa.float64()),
        "p_value": pa.array([r["p6"] for r in rows], pa.float64()),
        "p_adj": pa.array([r6(a) for a in adj], pa.float64()),
        "reject": pa.array([r6(a) <= alpha for a in adj], pa.bool_()),
    }))


def cume_dist_len(ds, group_col: str = "lang", value_col: str = "n_chars"):
    """documents -> per-doc (doc_id, lang, n_chars, cume): the CUME_DIST
    window function over document length within each language —
    ``count(v' <= v) / n_group``, every document's ECDF position, the
    per-row form of :func:`grouped_quantiles` (useful as a
    length-percentile feature column for curation filters).

    Scale shape: the broadcast-codebook plan — one bounded
    (group, value) histogram shuffle, cumulative counts become a
    per-group rank codebook in the object store (``ray.put`` once), and
    a second streaming pass maps every row through ONE searchsorted;
    rows never shuffle.  The single float division per row is shared
    with SQL's ``cume_dist()`` definition, round6."""
    import ray
    import ray.data as rd
    import pandas as pd

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="cnt")
        return pa.table({
            "g": pa.array(agg["g"]),
            "v": pa.array(agg["v"].to_numpy().astype(np.int64)),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64)),
        })

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "v"])
        .sum("cnt")
        .to_pandas()
    )
    col = "sum(cnt)"
    books = {}
    for g, grp in hist.groupby("g", sort=True):
        s = grp.sort_values("v")
        vs = s["v"].to_numpy(np.int64)
        le = np.cumsum(s[col].to_numpy(np.int64))
        books[g] = (vs, le, int(le[-1]))
    ref = ray.put(books)

    def assign(batch: pa.Table) -> pa.Table:
        bks = ray.get(ref)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        out = np.empty(len(v), np.float64)
        for name in np.unique(g):
            vs, le, n = bks[name]
            m = g == name
            c = le[np.searchsorted(vs, v[m])]
            out[m] = np.floor(c.astype(np.float64) / float(n) * 1e6
                              + 0.5) / 1e6
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column(group_col),
            "n_chars": batch.column(value_col),
            "cume": pa.array(out),
        })

    return ds.map_batches(assign, batch_format="pyarrow").sort("doc_id")


TOPDOC_K = 3


def top_docs_by_lang(ds, k: int = TOPDOC_K):
    """documents -> (doc_id, lang, n_chars, rnk): the k longest documents
    per language WITH TIES — ``dense_rank() <= k`` semantics, the
    window-function form of grouped top-k (every doc sharing a top-k
    length survives, unlike the row-limited :func:`~.gridops.topk`).

    Scale shape: the broadcast-threshold plan — one bounded
    (group, value) histogram shuffle finds each group's k-th distinct
    value; a second streaming pass filters ``v >= thr`` and assigns the
    dense rank from the same broadcast codebook (rank = position among
    the distinct top values).  Rows never shuffle; ties cost nothing.
    Exact integers throughout."""
    import pandas as pd
    import ray
    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column("lang").to_numpy(zero_copy_only=False)
        v = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "v": v})
        agg = df.groupby(["g", "v"], sort=True).size().reset_index(name="c")
        return pa.table({"g": pa.array(agg["g"]),
                         "v": pa.array(agg["v"].to_numpy(np.int64)),
                         "c": pa.array(agg["c"].to_numpy(np.int64))})

    hist = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "v"])
        .sum("c")
        .to_pandas()
    )
    if hist.empty:
        raise ValueError("top_docs_by_lang: no documents")
    books = {}
    for g, grp in hist.groupby("g", sort=True):
        top_vals = np.sort(grp["v"].to_numpy(np.int64))[::-1][:k]
        books[g] = top_vals  # descending; rank = index + 1
    ref = ray.put(books)

    def pick(batch: pa.Table) -> pa.Table:
        bks = ray.get(ref)
        g = batch.column("lang").to_numpy(zero_copy_only=False)
        v = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(v), bool)
        rnk = np.zeros(len(v), np.int64)
        for name in np.unique(g):
            tv = bks[name]
            m = g == name
            pos = np.searchsorted(-tv, -v[m])  # tv descending
            hit = (pos < len(tv)) & (tv[np.minimum(pos, len(tv) - 1)] == v[m])
            idx = np.flatnonzero(m)[hit]
            keep[idx] = True
            rnk[idx] = pos[hit] + 1
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "lang": pa.array(g[keep]),
                         "n_chars": pa.array(v[keep]),
                         "rnk": pa.array(rnk[keep])})

    return ds.map_batches(pick, batch_format="pyarrow").sort("doc_id")


WSAMPLE_K = 50


def weighted_sample(ds, k: int = WSAMPLE_K):
    """documents -> k rows (doc_id, n_chars, priority): DETERMINISTIC
    weighted sampling without replacement, weight = document length —
    Duffield-Lund-Thorup PRIORITY SAMPLING with hash-derived uniforms:
    ``priority = floor(w * 2^64 / (splitmix64(doc_id) + 1))`` (i.e.
    w/u as an exact 128-bit integer), take the k largest, ties on
    doc_id.  Inclusion is weight-proportional, yet the draw is a pure
    function of doc_id — reproducible across engines, retries and
    partition layouts.

    WHY not the A-ES ``ln(u)/w`` key: numpy's and DuckDB's ``ln``
    differ in the LAST ULP on some inputs (measured: 906/5000 keys at
    sf0.1), and a selection boundary ordered by those floats diverges
    even though every rounded key matches — the priority key keeps the
    whole pipeline in exact integer arithmetic instead.  Scale shape:
    per-batch local top-k (the only non-vectorized step is bigint
    division on batch rows; a float presort + exact re-check of the
    top candidates is the volume path), one tiny merge."""
    import ray.data as rd

    from ..functions.hashing import splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if (w <= 0).any():
            raise ValueError("weighted_sample: non-positive weight")
        h = splitmix64(ids.astype(np.uint64))
        pri = np.array([(int(wv) << 64) // (int(hv) + 1)
                        for wv, hv in zip(w, h)], dtype=object)
        kk = min(k, len(ids))
        order = sorted(range(len(ids)), key=lambda i: (-pri[i], ids[i]))[:kk]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "n_chars": pa.array(w[order]),
                         "pri": pa.array([float(pri[i]) for i in order],
                                         pa.float64())})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        raise ValueError("weighted_sample: no documents")
    part = part.sort_values(["pri", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(part["doc_id"].to_numpy(np.int64)),
        "n_chars": pa.array(part["n_chars"].to_numpy(np.int64)),
        "priority": pa.array(part["pri"].to_numpy(np.float64)),
    }))


def anova_eta(ds, group_col: str = "lang", value_col: str = "n_chars"):
    """-> ONE row (n, k, f_stat, eta2): ONE-WAY ANOVA of document
    length across all languages — the F statistic and the eta-squared
    effect size (share of variance explained by the grouping), the
    parametric omnibus companion to :func:`kruskal_wallis` and the
    k-group extension of :func:`welch_ttest` (pooled-variance form).

    EXACT integer moments per group (n_g, S_g, and one global sum of
    squares); the only floats are the per-group ``S_g^2 / n_g`` terms
    folded LEFT-ASSOCIATIVELY in group order (list_reduce oracle) and
    the two final ratios, round6.  Scale shape: a |groups| x 2 moment
    reduce plus one scalar — nothing else moves."""
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def moments(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "v": v, "vv": v.astype(object) * v})
        agg = df.groupby("g", sort=True).agg(
            n=("v", "size"), s=("v", "sum"), ss=("vv", "sum")).reset_index()
        return pa.table({
            "g": pa.array(agg["g"]),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "s": pa.array(agg["s"].to_numpy(np.int64)),
            "ss": pa.array([int(x) for x in agg["ss"]], pa.int64()),
        })

    mom = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("g")
        .sum(["n", "s", "ss"])
    ).to_pandas().sort_values("g")
    ncol, scol, sscol = "sum(n)", "sum(s)", "sum(ss)"
    if len(mom) < 2:
        raise ValueError("anova_eta: need >= 2 groups")
    N = int(mom[ncol].sum())
    S = int(mom[scol].sum())
    SSq = int(mom[sscol].sum())
    k = len(mom)
    bsum = 0.0
    first = True
    for ng, sg in zip(mom[ncol].tolist(), mom[scol].tolist()):
        t = float(int(sg) * int(sg)) / float(int(ng))
        if first:
            bsum, first = t, False
        else:
            bsum += t
    ssb = bsum - float(S * S) / float(N)
    ssw = float(SSq) - bsum
    sst = float(SSq) - float(S * S) / float(N)
    if ssw == 0.0 or sst == 0.0:
        raise ValueError("anova_eta: degenerate variance")
    f = (ssb / float(k - 1)) / (ssw / float(N - k))
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([N], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "f_stat": pa.array([r6(f)], pa.float64()),
        "eta2": pa.array([r6(ssb / sst)], pa.float64()),
    }))


def kendall_tau(docs_ds):
    """documents -> ONE row (n, nc, nd, tau_b): KENDALL'S TAU-B between
    per-doc characters and whitespace tokens — the third member of the
    correlation family (:func:`~.sketch.grouped_corr` Pearson,
    :func:`spearman_corr` ranks, this one concordance), preferred when
    ties are heavy because tau-b corrects both margins.

    EXACT: concordant/discordant pair counts come from the JOINT value
    histogram — for cell pairs, C += m1*m2 when both coordinates agree
    in direction, D += m1*m2 when they oppose (an O(cells^2) driver scan
    over the bounded histogram; at open-web volume the values quantize
    into bounded bins first).  Tie corrections n1 = sum t_x(t_x-1)/2,
    n2 likewise are integers; ``tau_b = (C - D) / (sqrt(n0 - n1) *
    sqrt(n0 - n2))`` is one shared float tree.  Scale shape: one
    bounded joint-histogram shuffle."""
    import math

    import pandas as pd
    import pyarrow.compute as pc_
    import ray.data as rd

    from ..functions.reduce import hash_groupby

    def joint(batch: pa.Table) -> pa.Table:
        chars = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = pc_.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        n_words = split.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
        nonempty = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = np.bincount(row[nonempty],
                           minlength=len(batch)).astype(np.int64)
        key = chars * np.int64(1 << 20) + toks
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq),
                         "m": pa.array(cnt.astype(np.int64))})

    hist = hash_groupby(
        docs_ds.map_batches(joint, batch_format="pyarrow"),
        "key", ["m"], how="isum",
    ).to_pandas()
    key = hist["key"].to_numpy(np.int64)
    m = hist["m"].to_numpy(np.int64)
    x = key >> np.int64(20)
    y = key & np.int64((1 << 20) - 1)
    n = int(m.sum())
    C = D = 0
    for i in range(len(key)):
        gx = x > x[i]
        c = int((m[i] * m[(gx) & (y > y[i])]).sum())
        d = int((m[i] * m[(gx) & (y < y[i])]).sum())
        C += c
        D += d
    n0 = n * (n - 1) // 2
    tx = pd.Series(m).groupby(pd.Series(x)).sum().to_numpy()
    ty = pd.Series(m).groupby(pd.Series(y)).sum().to_numpy()
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in tx)
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in ty)
    if n0 == n1 or n0 == n2:
        raise ValueError("kendall_tau: a margin is constant")
    tau = float(C - D) / (math.sqrt(float(n0 - n1))
                          * math.sqrt(float(n0 - n2)))
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "nc": pa.array([C], pa.int64()),
        "nd": pa.array([D], pa.int64()),
        "tau_b": pa.array([r6(tau)], pa.float64()),
    }))


def source_len_drift(docs_ds):
    """documents -> (source, n, at_value, ks_d): per-source KOLMOGOROV-
    SMIRNOV drift of the length distribution against the REST of the
    corpus — the per-feed version of :func:`ks_test` (one histogram
    pays for all sources; each source's complement ECDF is the global
    histogram minus its own).  The data-quality monitor that catches a
    feed whose extraction silently changed.

    EXACT: the argmax compares cross-multiplied ECDFs in big
    integers (the :func:`ks_test` discipline), ties -> smallest value;
    one round6 division per source.  Scale shape: ONE bounded
    (source, value) histogram shuffle; the per-source scans run on the
    bounded histogram."""
    import pandas as pd
    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "v": batch.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64),
        })
        agg = df.groupby(["source", "v"], sort=True).size() \
            .reset_index(name="c")
        return pa.table({
            "source": pa.array(agg["source"]),
            "v": pa.array(agg["v"].to_numpy(np.int64)),
            "c": pa.array(agg["c"].to_numpy(np.int64)),
        })

    hist = (
        docs_ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["source", "v"])
        .sum("c")
    ).to_pandas()
    col = "sum(c)"
    if hist.empty:
        raise ValueError("source_len_drift: no documents")
    gl = hist.groupby("v")[col].sum().sort_index()
    vs = gl.index.to_numpy(np.int64)
    gcum = np.cumsum(gl.to_numpy(np.int64))
    N = int(gcum[-1])
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = {"source": [], "n": [], "at_value": [], "ks_d": []}
    for src, grp in hist.groupby("source", sort=True):
        g = grp.sort_values("v")
        sv = g["v"].to_numpy(np.int64)
        scnt = g[col].to_numpy(np.int64)
        scum_local = np.cumsum(scnt)
        # source ECDF counts at every GLOBAL value (step function)
        idx = np.searchsorted(sv, vs, side="right")
        sa = np.concatenate(([0], scum_local))[idx]
        na = int(scum_local[-1])
        nb = N - na
        if nb == 0:
            raise ValueError(f"source_len_drift: {src} is the whole corpus")
        cb = gcum - sa  # complement cumulative
        diff = np.abs(sa.astype(object) * nb - cb.astype(object) * na)
        best = int(np.argmax(diff))
        rows["source"].append(src)
        rows["n"].append(na)
        rows["at_value"].append(int(vs[best]))
        rows["ks_d"].append(r6(float(diff[best]) / float(na * nb)))
    return rd.from_arrow(pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "at_value": pa.array(rows["at_value"], pa.int64()),
        "ks_d": pa.array(rows["ks_d"], pa.float64()),
    }))
