"""DuckDB oracle SQL for the training-data-pipeline operators (text
analysis, dedup, similarity search, media plumbing, event windows).

Same cross-engine rules as :mod:`.oracles`: float literals via ``D()``,
``floor(x*1e6+0.5)/1e6`` rounding, and — for the regex-based counts — RE2
on BOTH sides (pyarrow ``count_substring_regex`` / DuckDB
``regexp_extract_all``), so counts agree by construction.  Cosine sums are
emitted as explicit left-associative 64-term expressions, matching the
engine's column-sequential float64 accumulation bit-for-bit.
"""

from __future__ import annotations

import re

from ..functions import textstats
from ..stages import ann, events, media
from .oracles import D, hook_jump_chain, round6


def _re_count(col: str, pattern: str) -> str:
    # RE2 pattern inside a single-quoted SQL literal: escape quotes only
    # (backslashes are literal in standard SQL strings)
    p = pattern.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{p}'))"


def _stats_ctes() -> str:
    """The shared raw/r CTE pair computing per-doc metric expressions."""
    t = textstats
    n_tokens = _re_count("text", t.TOKEN_RE)
    n_bpe = _re_count("text", t.BPE_RE)
    n_punct = _re_count("text", t.PUNCT_RE)
    n_nonspace = _re_count("text", t.NONSPACE_RE)
    n_stop = _re_count("text", t.marker_pattern(t.STOPWORDS))
    return f"""WITH raw AS (
  SELECT doc_id, lang, length(text) AS n_chars,
    {n_tokens} AS n_tokens, {n_bpe} AS n_bpe_tokens,
    {n_punct} AS n_punct, {n_nonspace} AS n_nonspace, {n_stop} AS n_stop,
    md5(text) AS fingerprint
  FROM documents
), r AS (
  SELECT *,
    CAST(greatest(n_tokens, 1) AS DOUBLE) AS tok,
    CAST(greatest(n_chars, 1) AS DOUBLE) AS chars,
    CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
    CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio,
    CAST(n_nonspace AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS mean_tok
  FROM raw
)"""


def _quality_expr() -> str:
    t = textstats
    return (
        f"{D(0.25)} * least({D(1.0)}, CAST(n_tokens AS DOUBLE) / {D(t.QS_TOKEN_NORM)})"
        f" + {D(0.25)} * ({D(1.0)} - punct_ratio)"
        f" + {D(0.25)} * (CASE WHEN stop_ratio >= {D(t.QS_STOP_LO)}"
        f" AND stop_ratio <= {D(t.QS_STOP_HI)} THEN {D(1.0)} ELSE {D(0.0)} END)"
        f" + {D(0.25)} * least({D(1.0)}, mean_tok / {D(t.QS_MEANLEN_NORM)})"
    )


def text_stats_sql() -> str:
    return f"""{_stats_ctes()}
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
  {round6('punct_ratio')} AS punct_ratio,
  {round6('stop_ratio')} AS stopword_ratio,
  {round6('mean_tok')} AS mean_token_chars,
  {round6(_quality_expr())} AS quality_score,
  fingerprint
FROM r
ORDER BY doc_id"""


def gopher_repetition_sql() -> str:
    """Oracle of stages/textops.gopher_repetition: within-doc consecutive
    whitespace-token n-grams via the positional self-join chain, top gram
    by (count desc, gram asc), exact integer ratios, round6, missing-gram
    docs coalesced to 0."""

    def gram_cte(n: int, tag: str) -> str:
        joins = "\n  ".join(
            f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id"
            f" AND t{j}.pos = t0.pos + {j}" for j in range(1, n))
        gram = " || ' ' || ".join(f"t{j}.tok" for j in range(n))
        return f"""g{tag} AS (
  SELECT t0.doc_id, {gram} AS gram FROM toks t0
  {joins}
), g{tag}c AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
  FROM g{tag} GROUP BY 1, 2
)"""

    def top_cte(tag: str) -> str:
        return f"""t{tag} AS (
  SELECT doc_id, c * length(gram) AS cover FROM (
    SELECT doc_id, gram, c,
      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rk
    FROM g{tag}c
  ) WHERE rk = 1
)"""

    frac2 = ("COALESCE(CAST(t2.cover AS DOUBLE), CAST(0 AS DOUBLE))"
             " / CAST(greatest(lt.n_chars, 1) AS DOUBLE)")
    frac3 = ("COALESCE(CAST(t3.cover AS DOUBLE), CAST(0 AS DOUBLE))"
             " / CAST(greatest(lt.n_chars, 1) AS DOUBLE)")
    dup5 = ("COALESCE(CAST(d5.tot - d5.dis AS DOUBLE)"
            " / CAST(d5.tot AS DOUBLE), CAST(0 AS DOUBLE))")
    return f"""WITH lt AS (
  SELECT doc_id, length(text) AS n_chars,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), {gram_cte(2, '2')}, {top_cte('2')}, {gram_cte(3, '3')}, {top_cte('3')},
{gram_cte(5, '5')}, d5 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot,
    CAST(count(*) AS BIGINT) AS dis
  FROM g5c GROUP BY 1
)
SELECT lt.doc_id, CAST(lt.n_chars AS BIGINT) AS n_chars,
  {round6(frac2)} AS top2_char_frac,
  {round6(frac3)} AS top3_char_frac,
  {round6(dup5)} AS dup5_frac
FROM lt
LEFT JOIN t2 ON t2.doc_id = lt.doc_id
LEFT JOIN t3 ON t3.doc_id = lt.doc_id
LEFT JOIN d5 ON d5.doc_id = lt.doc_id
ORDER BY lt.doc_id"""


def readability_sql() -> str:
    """Oracle of stages/textops.readability: the same three RE2 counts,
    the same left-associative Flesch expression with greatest(x,1) clamps,
    round6."""
    t = textstats
    w = "CAST(greatest(n_tokens, 1) AS DOUBLE)"
    s = "CAST(greatest(n_sentences, 1) AS DOUBLE)"
    v = "CAST(n_vowel_runs AS DOUBLE)"
    expr = (f"{D(t.FLESCH_BASE)} - {D(t.FLESCH_WPS)} * ({w} / {s})"
            f" - {D(t.FLESCH_SPW)} * ({v} / {w})")
    return f"""WITH raw AS (
  SELECT doc_id,
    {_re_count('text', t.TOKEN_RE)} AS n_tokens,
    {_re_count('text', t.SENTENCE_RE)} AS n_sentences,
    {_re_count('text', t.VOWEL_RUN_RE)} AS n_vowel_runs
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_sentences AS BIGINT) AS n_sentences,
  CAST(n_vowel_runs AS BIGINT) AS n_vowel_runs,
  {round6(expr)} AS flesch
FROM raw ORDER BY doc_id"""


def text_quality_by_lang_sql() -> str:
    """Aggregate twin of pipelines/corpus.text_quality_by_lang (replicate=1:
    pages' text/lang == documents')."""
    return f"""{_stats_ctes()}, q AS (
  SELECT lang, punct_ratio, stop_ratio,
    CAST(n_tokens AS DOUBLE) AS ntok, {_quality_expr()} AS quality
  FROM r
)
SELECT lang, count(*) AS n_pages,
  {round6('sum(quality) / count(*)')} AS mean_quality,
  {round6('sum(punct_ratio) / count(*)')} AS mean_punct_ratio,
  {round6('sum(stop_ratio) / count(*)')} AS mean_stopword_ratio,
  {round6('sum(ntok) / count(*)')} AS mean_tokens
FROM q
GROUP BY lang
ORDER BY lang"""


def lang_id_sql() -> str:
    t = textstats
    counts = ",\n    ".join(
        f"{_re_count('text', t.marker_pattern(words))} AS c_{lang}"
        for lang, words in t.LANG_MARKERS
    )
    langs = [lang for lang, _ in t.LANG_MARKERS]
    # first-max-wins in LANG_MARKERS order == numpy argmax
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{lang} >= c_{o}" for o in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""WITH c AS (
  SELECT doc_id, lang,
    {counts}
  FROM documents
)
SELECT doc_id, lang, {case} AS pred_lang
FROM c
ORDER BY doc_id"""


def length_psi_by_source_sql() -> str:
    """Oracle of stages/textops.length_psi_by_source: exact decile
    thresholds from the cumulative (value, count) histogram, bin =
    #(thresholds < value), add-1 smoothed per-bin terms quantized to
    nano-nats, exact BIGINT fold per source."""
    return """WITH h AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM h),
thr AS (
  SELECT r.k,
    (SELECT min(v) FROM cum WHERE cc >= ((r.k * nn.n + 9) // 10)) AS t
  FROM range(1, 10) r(k), nn
), b AS (
  SELECT source, (SELECT count(*) FROM thr WHERE t < d.n_chars) AS bin
  FROM documents d
), sb AS (
  SELECT source, bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
), src AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sb GROUP BY 1),
gb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS g FROM sb GROUP BY 1),
bins AS (SELECT r.k AS bin FROM range(0, 10) r(k)),
grid AS (
  SELECT src.source, src.ns, bins.bin,
    COALESCE(sb2.c, 0) AS c, COALESCE(gb.g, 0) AS g, nn.n
  FROM src CROSS JOIN bins
  LEFT JOIN sb sb2 ON sb2.source = src.source AND sb2.bin = bins.bin
  LEFT JOIN gb ON gb.bin = bins.bin
  CROSS JOIN nn
), terms AS (
  SELECT source, ns,
    CAST(floor(((ps - pg) * ln(ps / pg)) * 1e9 + 0.5) AS BIGINT) AS q
  FROM (
    SELECT source, ns,
      CAST(c + 1 AS DOUBLE) / CAST(ns + 10 AS DOUBLE) AS ps,
      CAST(g + 1 AS DOUBLE) / CAST(n + 10 AS DOUBLE) AS pg
    FROM grid
  )
)
SELECT source, CAST(ns AS BIGINT) AS n_docs,
  CAST(sum(q) AS BIGINT) AS psi_nano
FROM terms GROUP BY 1, 2 ORDER BY 1"""


def lang_source_chi2_sql() -> str:
    """Oracle of stages/textops.lang_source_chi2: full L x S grid (zero
    cells included), e from DOUBLE marginal products, per-cell nano
    quantization, exact BIGINT fold."""
    return """WITH conf AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), l AS (SELECT DISTINCT lang FROM conf),
s AS (SELECT DISTINCT source FROM conf),
rtt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rt FROM conf GROUP BY 1),
ctt AS (SELECT source, CAST(sum(c) AS BIGINT) AS ct FROM conf GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM conf),
grid AS (
  SELECT COALESCE(conf.c, 0) AS o,
    (CAST(rtt.rt AS DOUBLE) * CAST(ctt.ct AS DOUBLE))
      / CAST(nn.n AS DOUBLE) AS e
  FROM l CROSS JOIN s
  LEFT JOIN conf ON conf.lang = l.lang AND conf.source = s.source
  JOIN rtt ON rtt.lang = l.lang
  JOIN ctt ON ctt.source = s.source
  CROSS JOIN nn
), terms AS (
  SELECT CAST(floor(
    ((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e) * 1e9 + 0.5
  ) AS BIGINT) AS q
  FROM grid
)
SELECT (SELECT n FROM nn) AS n_docs,
  (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_langs,
  (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_sources,
  CAST(((SELECT count(*) FROM l) - 1)
       * ((SELECT count(*) FROM s) - 1) AS BIGINT) AS dof,
  CAST(sum(q) AS BIGINT) AS chi2_nano
FROM terms"""


def lang_id_eval_sql() -> str:
    """Oracle of stages/textops.lang_id_eval: the lang_id CASE chain ->
    confusion counts -> per-class single-division metrics, classes = the
    union of gold and predicted labels."""

    def frac(num: str, den: str) -> str:
        return round6(f"CAST({num} AS DOUBLE)"
                      f" / CAST(greatest({den}, 1) AS DOUBLE)")

    return f"""WITH p AS ({lang_id_sql()}
), conf AS (
  SELECT lang, pred_lang AS pred, CAST(count(*) AS BIGINT) AS c
  FROM p GROUP BY 1, 2
), cls AS (
  SELECT lang AS k FROM conf UNION SELECT pred FROM conf
), m AS (
  SELECT cls.k AS lang,
    COALESCE((SELECT sum(c) FROM conf WHERE conf.lang = cls.k), 0) AS n_true,
    COALESCE((SELECT sum(c) FROM conf WHERE conf.pred = cls.k), 0) AS n_pred,
    COALESCE((SELECT sum(c) FROM conf
              WHERE conf.lang = cls.k AND conf.pred = cls.k), 0) AS tp
  FROM cls
)
SELECT lang, CAST(n_true AS BIGINT) AS n_true,
  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
  {frac('tp', 'n_pred')} AS prec,
  {frac('tp', 'n_true')} AS rec,
  {frac('2 * tp', 'n_pred + n_true')} AS f1
FROM m ORDER BY lang"""


def exact_dedup_sql() -> str:
    return """SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
FROM documents
GROUP BY md5(text)
ORDER BY doc_id"""


def _jaccard_ctes() -> str:
    tok_re = textstats.TOKEN_RE.replace("'", "''")
    return f"""tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '{tok_re}'))) AS token
  FROM documents
), sz AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), pairs AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*) AS shared
  FROM tok t1 JOIN tok t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
  GROUP BY 1, 2
), j AS (
  SELECT a, b,
    CAST(shared AS DOUBLE)
      / (CAST(sa.n AS DOUBLE) + CAST(sb.n AS DOUBLE) - CAST(shared AS DOUBLE)) AS jac
  FROM pairs
  JOIN sz sa ON sa.doc_id = a
  JOIN sz sb ON sb.doc_id = b
)"""


def jaccard_pairs_sql(threshold: float) -> str:
    return f"""WITH {_jaccard_ctes()}
SELECT a, b, {round6('jac')} AS jaccard
FROM j WHERE jac >= {D(threshold)}
ORDER BY a, b"""


def dedup_components_sql(threshold: float, rounds: int = 16) -> str:
    """Unrolled hook+jump min-label twin of stages/cc.connected_components
    over the Jaccard>=threshold duplicate graph (component = min reachable
    id).  The old recursive-CTE form materialized |component|^2 reach rows
    (>40 min at sf0.1's 2.97M-edge graph); this is ``rounds`` bounded
    supersteps of the engine's own BSP recurrence plus path compression:
    hook (min label over the closed neighborhood) then jump (l <- l(l)).
    The covered radius at least doubles per round on monotone chains and
    the near-dup graph's components are dense near-cliques (~3 rounds to
    converge); 16 rounds is a wide margin.  Non-convergence can only FAIL
    the comparison — the engine iterates to an exact fixed point — never
    silently pass."""
    chain, prev = hook_jump_chain(rounds)
    return f"""WITH {_jaccard_ctes()}, edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM j WHERE jac >= {D(threshold)}
  UNION ALL
  SELECT b AS src, a AS dst FROM j WHERE jac >= {D(threshold)}
), l0 AS MATERIALIZED (
  SELECT doc_id AS v, doc_id AS l FROM documents
),
{chain}
SELECT v AS doc_id, l AS component, (l = v) AS is_survivor
FROM {prev}
ORDER BY doc_id"""


def _dot_expr(x: str, y: str, dim: int) -> str:
    """Left-associative explicit sum — the SQL twin of ann.seq_dot."""
    return " + ".join(
        f"CAST({x}[{j + 1}] AS DOUBLE) * CAST({y}[{j + 1}] AS DOUBLE)"
        for j in range(dim)
    )


def ann_topk_sql(k: int, n_queries: int = ann.N_QUERIES, dim: int = ann.DIM) -> str:
    dot = _dot_expr("e.embedding", "q.embedding", dim)
    ne = _dot_expr("e.embedding", "e.embedding", dim)
    nq = _dot_expr("q.embedding", "q.embedding", dim)
    return f"""WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {n_queries}
), sims AS (
  SELECT q.query_id, e.vec_id,
    ({dot}) / (sqrt({ne}) * sqrt({nq})) AS cos_raw
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_raw,
    row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, {round6('cos_raw')} AS cosine
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""


def embedding_neardup_sql(threshold: float, dim: int = ann.DIM) -> str:
    dot = _dot_expr("x.embedding", "y.embedding", dim)
    nx = _dot_expr("x.embedding", "x.embedding", dim)
    ny = _dot_expr("y.embedding", "y.embedding", dim)
    return f"""WITH sims AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
    ({dot}) / (sqrt({nx}) * sqrt({ny})) AS cos_raw
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
)
SELECT a, b, {round6('cos_raw')} AS cosine
FROM sims WHERE cos_raw >= {D(threshold)}
ORDER BY a, b"""


def media_decode_sql() -> str:
    """Mirrors stages/media.py: payload = '<html><body>'||text||'</body></html>'
    (pages_cte html synthesis), metadata = arithmetic on byte length."""
    kinds = media.KINDS
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
    CASE doc_id % 3 WHEN 0 THEN '{kinds[0]}' WHEN 1 THEN '{kinds[1]}'
      ELSE '{kinds[2]}' END AS kind,
    octet_length(encode(text)) + 26 AS n_bytes
  FROM documents
)
SELECT media_id, kind, n_bytes,
  64 + (n_bytes * 7) % 1024 AS width,
  64 + (n_bytes * 13) % 768 AS height,
  CASE WHEN media_id % 3 = 0 THEN 0 ELSE 1000 + (n_bytes * 31) % 600000 END AS duration_ms
FROM m
ORDER BY media_id"""


def media_features_sql(feat_dim: int = media.FEAT_DIM) -> str:
    """Oracle of the deterministic fake feature extractor
    (stages/media.py MediaDecode.__call__): features are FEAT_DIM moments of
    the payload byte stream — seg = byte_sum / n_bytes (exact: integer sums
    stay exact in float64 far below 2^53), f_d = round6(fmod(seg*(d+1), 256)).
    The payload is '<html><body>'||text||'</body></html>'; text is ASCII in
    every driver table (asserted at generation), so per-char ascii() equals
    the byte value and the wrapper contributes a constant byte sum."""
    pre = sum(b"<html><body>") + sum(b"</body></html>")
    kinds = media.KINDS
    feats = ",\n  ".join(
        f"floor(fmod(seg * {d + 1}, CAST(256.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS f{d}"
        for d in range(feat_dim)
    )
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
    CASE doc_id % 3 WHEN 0 THEN '{kinds[0]}' WHEN 1 THEN '{kinds[1]}'
      ELSE '{kinds[2]}' END AS kind,
    octet_length(encode(text)) + 26 AS n_bytes,
    list_sum(list_transform(string_split(text, ''), c -> ascii(c))) + {pre} AS byte_sum
  FROM documents
), g AS (
  SELECT media_id, kind, n_bytes,
    64 + (n_bytes * 7) % 1024 AS width,
    64 + (n_bytes * 13) % 768 AS height,
    CASE WHEN media_id % 3 = 0 THEN 0 ELSE 1000 + (n_bytes * 31) % 600000 END AS duration_ms,
    CAST(byte_sum AS DOUBLE) / greatest(n_bytes, 1) AS seg
  FROM m
)
SELECT media_id, kind, n_bytes, width, height, duration_ms,
  {feats}
FROM g
ORDER BY media_id"""


def audio_resample_sql(target_rate: int = media.AUDIO_TARGET_RATE) -> str:
    """Oracle of stages/media.audio_resample (audio rows: media_id % 3 == 1)."""
    base = media_decode_sql()
    body = base[: base.rindex("ORDER BY")]
    return f"""WITH dec AS (
{body})
SELECT media_id,
  8000 + (n_bytes * 11) % 40000 AS src_rate,
  CAST({target_rate} AS BIGINT) AS target_rate,
  floor(CAST({target_rate} AS DOUBLE) / CAST(8000 + (n_bytes * 11) % 40000 AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 AS ratio,
  (8000 + (n_bytes * 11) % 40000) * duration_ms // 1000 AS n_in,
  {target_rate} * duration_ms // 1000 AS n_out
FROM dec
WHERE kind = 'audio'
ORDER BY media_id"""


def events_window_sql(window_us: int = events.WINDOW_US) -> str:
    return f"""SELECT
  make_timestamp((epoch_us(ts) // {window_us}) * {window_us}) AS window_start,
  event_type,
  count(*) AS n_events,
  {round6('sum(value)')} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2"""


def gap_fill_sql(bucket_us: int = events.WINDOW_US) -> str:
    """Oracle of stages/events.gap_fill: generate_series over each user's
    active bucket range LEFT JOINed against the per-bucket aggregate."""
    return f"""WITH b AS (
  SELECT user_id, epoch_us(ts) // {bucket_us} AS bkt,
    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM b GROUP BY user_id
), g AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS bkt FROM r
), a AS (
  SELECT user_id, bkt, CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM b GROUP BY user_id, bkt
)
SELECT g.user_id, make_timestamp(g.bkt * {bucket_us}) AS bucket_start,
  COALESCE(a.n_events, 0) AS n_events,
  COALESCE(a.sum_cents, 0) AS sum_cents
FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.bkt = a.bkt
ORDER BY g.user_id, g.bkt"""


def sessionize_sql(gap_us: int = events.SESSION_GAP_US) -> str:
    return f"""WITH flagged AS (
  SELECT event_id, user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
      THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT event_id, user_id, ts,
    SUM(new_sess) OVER w2 - 1 AS session_idx,
    MAX(CASE WHEN new_sess = 1 THEN ts END) OVER w2 AS session_start
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, CAST(session_idx AS BIGINT) AS session_idx, session_start
FROM numbered
ORDER BY event_id"""


def asof_join_sql(left_type: str = "purchase", right_type: str = "view") -> str:
    """Window-function as-of join (oracle of stages/events.asof_join):
    forward-fill the last right-side event per user over (ts, side,
    event_id) order; inner semantics."""
    return f"""WITH e AS (
  SELECT event_id, user_id, ts, event_type,
    CASE WHEN event_type = '{right_type}' THEN 0 ELSE 1 END AS side
  FROM events
), f AS (
  SELECT event_id, user_id, ts, event_type,
    last_value(CASE WHEN event_type = '{right_type}' THEN event_id END IGNORE NULLS)
      OVER w AS matched_event_id,
    last_value(CASE WHEN event_type = '{right_type}' THEN ts END IGNORE NULLS)
      OVER w AS matched_ts
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, matched_event_id,
  epoch_us(ts) - epoch_us(matched_ts) AS lag_us
FROM f
WHERE event_type = '{left_type}' AND matched_event_id IS NOT NULL
ORDER BY event_id"""


def zscore_text_len_sql() -> str:
    """Oracle of stages/textops.zscore_text_len — identical float op order:
    var from exact integer moments, IEEE sqrt, one division."""
    return """WITH v AS (
  SELECT doc_id, lang, octet_length(encode(text)) AS len FROM documents
), m AS (
  SELECT lang, count(*) AS n, sum(len) AS s, sum(len * len) AS ss
  FROM v GROUP BY lang
)
SELECT v.doc_id, v.lang, CAST(v.len AS BIGINT) AS len,
  CASE WHEN CAST(m.n * m.ss - m.s * m.s AS DOUBLE) / CAST(m.n * m.n AS DOUBLE) > 0.0
    THEN floor(
      ((CAST(v.len AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
       / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE) / CAST(m.n * m.n AS DOUBLE)))
      * 1000000.0 + 0.5) / 1000000.0
    ELSE 0.0 END AS z
FROM v JOIN m USING (lang)
ORDER BY doc_id"""


def top_bigrams_sql(k: int = 20) -> str:
    """Oracle of stages/textops.top_bigrams (consecutive within-doc token
    pairs, global count, deterministic top-k)."""
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), bg AS (
  SELECT t1.tok AS w1, t2.tok AS w2, CAST(count(*) AS BIGINT) AS cnt
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  GROUP BY 1, 2
)
SELECT w1, w2, cnt,
  CAST(row_number() OVER (ORDER BY cnt DESC, w1, w2) AS BIGINT) AS rank
FROM bg
ORDER BY cnt DESC, w1, w2
LIMIT {k}"""


def mutual_information_sql() -> str:
    """Oracle of stages/textops.mutual_information: bounded (tld, lang)
    contingency, identical float term trees, left-assoc ordered folds via
    list_reduce, round6."""
    from .oracles import pages_cte, round6

    term = ("(CAST(ct.c AS DOUBLE) / st.n)"
            " * ln((CAST(ct.c AS DOUBLE) / st.n) * st.n * st.n"
            " / (r.rc * cl.cc))")
    return f"""WITH {pages_cte()},
ct AS (
  SELECT tld, lang, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT string_split(split_part(url, '/', 3), '.')[-1] AS tld, lang
    FROM pages
  ) GROUP BY 1, 2
), st AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM ct
), r AS (
  SELECT tld, CAST(sum(c) AS BIGINT) AS rc FROM ct GROUP BY 1
), cl AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS cc FROM ct GROUP BY 1
), terms AS (
  SELECT ct.tld, ct.lang, {term} AS t
  FROM ct JOIN r ON r.tld = ct.tld JOIN cl ON cl.lang = ct.lang, st
), f AS (
  SELECT list_reduce(list(t ORDER BY tld, lang), (a, b) -> a + b) AS mi
  FROM terms
), hr AS (
  SELECT list_reduce(list(
    -(CAST(rc AS DOUBLE) / st.n) * ln(CAST(rc AS DOUBLE) / st.n)
    ORDER BY tld), (a, b) -> a + b) AS h
  FROM r, st
), hc AS (
  SELECT list_reduce(list(
    -(CAST(cc AS DOUBLE) / st.n) * ln(CAST(cc AS DOUBLE) / st.n)
    ORDER BY lang), (a, b) -> a + b) AS h
  FROM cl, st
)
SELECT st.n AS n, (SELECT CAST(count(*) AS BIGINT) FROM ct) AS n_cells,
  {round6('f.mi')} AS mi, {round6('hr.h')} AS h_tld,
  {round6('hc.h')} AS h_lang
FROM f, hr, hc, st"""


def coverage_curve_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.coverage_curve: host page counts, top-k by
    (pages DESC, host), cumulative window, one round6 share."""
    from ..stages import textops
    from .oracles import pages_cte, round6

    kk = textops.COVERAGE_K if k is None else k
    return f"""WITH {pages_cte()},
hc AS (
  SELECT split_part(url, '/', 3) AS host, CAST(count(*) AS BIGINT) AS pages
  FROM pages GROUP BY 1
), tot AS (
  SELECT CAST(sum(pages) AS BIGINT) AS t FROM hc
), top AS (
  SELECT host, pages,
    CAST(row_number() OVER (ORDER BY pages DESC, host) AS BIGINT) AS rank
  FROM hc ORDER BY pages DESC, host LIMIT {kk}
)
SELECT rank, host, pages,
  CAST(sum(pages) OVER (ORDER BY rank) AS BIGINT) AS cum_pages,
  {round6('CAST(sum(pages) OVER (ORDER BY rank) AS DOUBLE) / tot.t')}
    AS cum_share
FROM top, tot ORDER BY rank"""


def rrf_fusion_sql(query: tuple | None = None, list_k: int | None = None,
                   top: int | None = None, rrf_k: int | None = None) -> str:
    """Oracle of stages/textops.rrf_fusion: the bm25_sql chain rides as
    list 1; list 2 is the exact-integer common-denominator TF-IDF score;
    both ranked (score DESC, doc_id) LIMIT k, fused by integer
    floor(1e6/(rrf_k+rank)) sums."""
    from ..stages import textops

    q = list(textops.BM25_QUERY if query is None else query)
    lk = textops.RRF_LIST if list_k is None else list_k
    tp = textops.RRF_TOP if top is None else top
    rk = textops.RRF_K if rrf_k is None else rrf_k
    tf_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(q))
    df_cols = ",\n    ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(q)))
    terms = []
    for i in range(len(q)):
        prod = " * ".join(f"(g.df{j} + 1)" for j in range(len(q)) if j != i)
        terms.append(f"CAST(d.tf{i} AS HUGEINT) * (g.n + 1) * ({prod})")
    s2 = " + ".join(terms)
    return f"""WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), d AS (
  SELECT doc_id,
    {tf_cols}
  FROM t
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    {df_cols}
  FROM d
), s2tbl AS (
  SELECT d.doc_id, {s2} AS score2 FROM d, g
), rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
  FROM ({bm25_scores_sql()}) ORDER BY bm25 DESC, doc_id LIMIT {lk}
), rt AS (
  SELECT doc_id, row_number() OVER (ORDER BY score2 DESC, doc_id) AS rk
  FROM s2tbl ORDER BY score2 DESC, doc_id LIMIT {lk}
), f AS (
  SELECT doc_id, CAST(sum(1000000 // ({rk} + rk)) AS BIGINT) AS rrf_micro
  FROM (SELECT * FROM rb UNION ALL SELECT * FROM rt) GROUP BY 1
)
SELECT doc_id, rrf_micro FROM f
ORDER BY rrf_micro DESC, doc_id LIMIT {tp}"""


def unigram_drift_sql() -> str:
    """Oracle of stages/textops.unigram_drift: even/odd doc halves,
    union-vocab add-1 unigram KL both ways, terms folded left-assoc in
    token byte order via list_reduce, round6."""
    from .oracles import round6

    p = "(CAST(h.a + 1 AS DOUBLE) / (st.ta + st.nv))"
    q = "(CAST(h.b + 1 AS DOUBLE) / (st.tb + st.nv))"
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS token FROM lt
), h AS (
  SELECT token,
    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM toks GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS nv, CAST(sum(a) AS BIGINT) AS ta,
    CAST(sum(b) AS BIGINT) AS tb
  FROM h
), terms AS (
  SELECT h.token,
    {p} * ln({p} / {q}) AS t_ab,
    {q} * ln({q} / {p}) AS t_ba
  FROM h, st
), folds AS (
  SELECT
    list_reduce(list(t_ab ORDER BY token), (x, y) -> x + y) AS kl_ab,
    list_reduce(list(t_ba ORDER BY token), (x, y) -> x + y) AS kl_ba
  FROM terms
)
SELECT st.nv AS n_vocab, st.ta AS n_a, st.tb AS n_b,
  {round6('f.kl_ab')} AS kl_ab, {round6('f.kl_ba')} AS kl_ba
FROM folds f, st"""


def source_divergence_matrix_sql() -> str:
    """Oracle of stages/textops.source_divergence_matrix: per-source
    unigram counts + totals, all source pairs i<j over the pair's union
    vocabulary, each (token, pair) JSD term quantized to nano-nats exactly
    like the engine (floor((t1+t2)*1e9+0.5), terms 0.5*p*ln(p/m), a c=0
    side contributing 0), then exact BIGINT sums."""
    t1 = ("CASE WHEN c1 > 0 THEN (0.5 * p1) * ln(p1 / m) ELSE 0.0 END")
    t2 = ("CASE WHEN c2 > 0 THEN (0.5 * p2) * ln(p2 / m) ELSE 0.0 END")
    return f"""WITH lt AS (
  SELECT source,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), c AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(l) AS tok FROM lt) GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
), pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.source < b.source
), v AS (
  SELECT DISTINCT tok FROM c
), grid AS (
  SELECT p.sa, p.sb, p.na, p.nb,
    COALESCE(ca.c, 0) AS c1, COALESCE(cb.c, 0) AS c2
  FROM pairs p CROSS JOIN v
  LEFT JOIN c ca ON ca.source = p.sa AND ca.tok = v.tok
  LEFT JOIN c cb ON cb.source = p.sb AND cb.tok = v.tok
  WHERE COALESCE(ca.c, 0) > 0 OR COALESCE(cb.c, 0) > 0
), terms AS (
  SELECT sa, sb,
    CAST(floor(({t1} + {t2}) * 1e9 + 0.5) AS BIGINT) AS q
  FROM (
    SELECT sa, sb, c1, c2,
      CAST(c1 AS DOUBLE) / CAST(na AS DOUBLE) AS p1,
      CAST(c2 AS DOUBLE) / CAST(nb AS DOUBLE) AS p2,
      (CAST(c1 AS DOUBLE) / CAST(na AS DOUBLE)
       + CAST(c2 AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0 AS m
    FROM grid
  )
)
SELECT sa AS source_a, sb AS source_b,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(q) AS BIGINT) AS jsd_nano
FROM terms GROUP BY 1, 2 ORDER BY 1, 2"""


def phrase_search_sql(phrase: tuple[str, ...] | None = None) -> str:
    """Oracle of stages/textops.phrase_search: the classic positional
    pos-join chain t1.pos + j = t(j).pos within each document."""
    from ..stages import textops

    ph = textops.PHRASE if phrase is None else phrase
    joins = "\n  ".join(
        f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.pos = t0.pos + {j} AND t{j}.tok = '{w}'"
        for j, w in enumerate(ph) if j > 0)
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
)
SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM toks t0
  {joins}
WHERE t0.tok = '{ph[0]}'
GROUP BY 1 ORDER BY 1"""


def hapax_rate_sql() -> str:
    """Oracle of stages/textops.hapax_rate: token counts, hapax counts,
    two round6 shares."""
    from .oracles import round6

    return f"""WITH lt AS (
  SELECT list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(l) AS tok FROM lt) GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab,
    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
    CAST(sum(cnt) AS BIGINT) AS n_tokens
  FROM tc
)
SELECT vocab, n_hapax, n_tokens,
  {round6('CAST(n_hapax AS DOUBLE) / vocab')} AS hapax_share,
  {round6('CAST(n_hapax AS DOUBLE) / n_tokens')} AS token_share
FROM st"""


def zipf_slope_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.zipf_slope: top-k token counts (ties
    ascending on the token), OLS of ln(cnt) on ln(rank) with all four
    moment sums folded left-associatively in rank order via
    list_reduce(list(... ORDER BY r)), round6 outputs."""
    from ..stages import textops
    from .oracles import round6

    kk = textops.ZIPF_K if k is None else k
    slope = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
    intercept = f"((sy - {slope} * sx) / n)"
    return f"""WITH lt AS (
  SELECT list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(l) AS tok FROM lt) GROUP BY 1
), top AS (
  SELECT tok, cnt,
    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS r
  FROM tc ORDER BY cnt DESC, tok LIMIT {kk}
), xy AS (
  SELECT r, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
  FROM top
), folds AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    list_reduce(list(x ORDER BY r), (a, b) -> a + b) AS sx,
    list_reduce(list(y ORDER BY r), (a, b) -> a + b) AS sy,
    list_reduce(list(x * y ORDER BY r), (a, b) -> a + b) AS sxy,
    list_reduce(list(x * x ORDER BY r), (a, b) -> a + b) AS sxx
  FROM xy
)
SELECT CAST(n AS BIGINT) AS k_used,
  {round6(slope)} AS slope,
  {round6(intercept)} AS intercept
FROM folds"""


def split_assign_sql() -> str:
    """Oracle of stages/textops.split_assign (hash-bucket train/val/test)."""
    from ..stages import textops as t

    bounds = []
    acc = 0
    cases = []
    for name, w in t.SPLIT_WEIGHTS:
        acc += w
        bounds.append((name, acc))
    prev = 0
    for name, hi in bounds:
        cases.append(f"WHEN h < {hi} THEN '{name}'")
    case = " ".join(cases)
    return f"""WITH h AS (
  SELECT doc_id, ((doc_id % {t.SPLIT_MOD}) * {t.SPLIT_MULT % t.SPLIT_MOD}) % {t.SPLIT_MOD} AS h
  FROM documents
)
SELECT doc_id, CASE {case} END AS split
FROM h
ORDER BY doc_id"""


def profile_documents_sql() -> str:
    """Oracle of stages/textops.profile_documents."""
    return f"""SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
  CAST(min(octet_length(encode(text))) AS BIGINT) AS min_len,
  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_len,
  {round6('CAST(sum(octet_length(encode(text))) AS DOUBLE) / count(*)')} AS avg_len,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents"""


def tfidf_sql() -> str:
    """Oracle of stages/textops.tfidf (rational idf; see its docstring).
    Float order mirrors the engine exactly: tf * ((N+1) / (df+1))."""
    return """WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
  floor(CAST(tf.tf AS DOUBLE)
        * (CAST(n.n + 1 AS DOUBLE) / (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        * 1000000.0 + 0.5) / 1000000.0 AS score
FROM tf JOIN df USING (token) CROSS JOIN n
ORDER BY doc_id, token"""


def running_totals_sql() -> str:
    """Oracle of stages/events.running_totals (exact integer-cent running
    sum; see its docstring for why cents, not raw doubles)."""
    return """SELECT event_id, user_id,
  CAST(row_number() OVER w AS BIGINT) AS seq,
  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
ORDER BY event_id"""


def bloom_semi_join_sql() -> str:
    """Oracle of the Bloom-pre-filtered semi join (the bitmap is invisible
    to semantics — the result is an exact semi join)."""
    return """SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
ORDER BY l_returnflag"""


def label_centroids_sql(dim: int = 64, scale: float = 16777216.0) -> str:
    """Oracle of stages/ann.label_centroids (exact fixed-point per-dim sums;
    2^24 scaling of float32 inputs is exact in float64 on both engines)."""
    return f"""SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled,
  CAST(count(*) AS BIGINT) AS n
FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
GROUP BY label, dim
ORDER BY label, dim"""


def kmeans_sql(k: int | None = None, iters: int | None = None,
               dim: int = 64) -> str:
    """Oracle of stages/ann.kmeans_assign: the same fixed-point Lloyd
    sweeps unrolled as chained CTEs.  Distances/sums are exact integers;
    the centroid update uses an explicit floor-division expression because
    DuckDB's ``//`` truncates toward zero on negatives while the engine's
    numpy ``//`` floors (-7//2 = -4)."""
    from ..stages import ann

    k = k if k is not None else ann.KMEANS_K
    iters = iters if iters is not None else ann.KMEANS_ITERS
    scale = ann.CENTROID_SCALE
    # floor(sq/cnt) in pure integer arithmetic (cnt > 0)
    fdiv = ("CASE WHEN s.sq >= 0 THEN s.sq // s.cnt "
            "ELSE -((-s.sq + s.cnt - 1) // s.cnt) END")
    steps = []
    prev = "c0"
    for t in range(1, iters + 1):
        steps.append(f"""d{t} AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), a{t} AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM d{t}
  ) WHERE rn = 1
), s{t} AS MATERIALIZED (
  SELECT a.k, ev.j, sum(ev.q) AS sq, count(*) AS cnt
  FROM ev JOIN a{t} a ON ev.v = a.v GROUP BY a.k, ev.j
), c{t} AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN s{t} s ON c.k = s.k AND c.j = s.j
)""")
        prev = f"c{t}"
    chain = ",\n".join(steps)
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), c0 AS MATERIALIZED (
  SELECT v AS k, j, q AS val FROM ev WHERE v < {k}
),
{chain},
dF AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
)
SELECT v AS vec_id, CAST(k AS BIGINT) AS cluster FROM (
  SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
  FROM dF
) WHERE rn = 1
ORDER BY vec_id"""


def kmeans_inertia_sql(k: int | None = None, iters: int | None = None,
                       dim: int = 64) -> str:
    """Oracle of stages/ann.kmeans_inertia: the kmeans_sql Lloyd chain,
    final-partition centroid recompute (same explicit floor division),
    2^12 down-quantization of both sides, exact integer sse per cluster."""
    from ..stages import ann

    k = k if k is not None else ann.KMEANS_K
    iters = iters if iters is not None else ann.KMEANS_ITERS
    scale = ann.CENTROID_SCALE
    # CENTROID_SCALE is a float constant — the divisor MUST interpolate as
    # an int or DuckDB's ``// 4096.0`` is float division (no floor) and the
    # BIGINT cast rounds
    down = int(scale) // ann.INERTIA_SCALE
    fdiv = ("CASE WHEN s.sq >= 0 THEN s.sq // s.cnt "
            "ELSE -((-s.sq + s.cnt - 1) // s.cnt) END")

    def floordiv(expr: str, d: int) -> str:
        return (f"CASE WHEN {expr} >= 0 THEN ({expr}) // {d} "
                f"ELSE -((-({expr}) + {d} - 1) // {d}) END")

    steps = []
    prev = "c0"
    for t in range(1, iters + 1):
        steps.append(f"""d{t} AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), a{t} AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM d{t}
  ) WHERE rn = 1
), s{t} AS MATERIALIZED (
  SELECT a.k, ev.j, sum(ev.q) AS sq, count(*) AS cnt
  FROM ev JOIN a{t} a ON ev.v = a.v GROUP BY a.k, ev.j
), c{t} AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN s{t} s ON c.k = s.k AND c.j = s.j
)""")
        prev = f"c{t}"
    chain = ",\n".join(steps)
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), c0 AS MATERIALIZED (
  SELECT v AS k, j, q AS val FROM ev WHERE v < {k}
),
{chain},
dF AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), aF AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM dF
  ) WHERE rn = 1
), sF AS MATERIALIZED (
  SELECT a.k, ev.j, sum(ev.q) AS sq, count(*) AS cnt
  FROM ev JOIN aF a ON ev.v = a.v GROUP BY a.k, ev.j
), cP AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN sF s ON c.k = s.k AND c.j = s.j
), c12 AS MATERIALIZED (
  SELECT k, j, CAST({floordiv('val', down)} AS BIGINT) AS val FROM cP
), q12 AS MATERIALIZED (
  SELECT v, j, CAST({floordiv('q', down)} AS BIGINT) AS q FROM ev
), sse AS (
  SELECT a.k AS cluster,
    CAST(sum((q12.q - c12.val) * (q12.q - c12.val)) AS BIGINT) AS sse12
  FROM q12
  JOIN aF a ON a.v = q12.v
  JOIN c12 ON c12.k = a.k AND c12.j = q12.j
  GROUP BY 1
), nn AS (
  SELECT k AS cluster, CAST(count(*) AS BIGINT) AS n FROM aF GROUP BY 1
)
SELECT nn.cluster AS cluster, nn.n, coalesce(sse.sse12, 0) AS sse12
FROM nn LEFT JOIN sse ON sse.cluster = nn.cluster
ORDER BY nn.cluster"""


def rollup_revenue_sql() -> str:
    """Oracle of stages/relagg.rollup_sums over lineitem x orders (rolled-up
    keys coalesce to the 'ALL' sentinel on both sides)."""
    return """SELECT
  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
  coalesce(l_returnflag, 'ALL') AS l_returnflag,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ROLLUP (o_orderpriority, l_returnflag)
ORDER BY o_orderpriority, l_returnflag"""


def pricing_summary_sql(cutoff: str | None = None) -> str:
    """Oracle of stages/relagg.pricing_summary (TPC-H Q1 shape, per-row
    cents quantization before the sums so addition order is irrelevant)."""
    from ..stages import relagg
    cut = cutoff or relagg.PRICING_CUTOFF
    return f"""SELECT l_returnflag, l_linestatus,
  count(*) AS n_rows,
  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
    AS qty_cents,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
    AS base_cents,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
    AS BIGINT)) AS BIGINT) AS disc_cents,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
    * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS charge_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cut}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def revenue_by_month_sql() -> str:
    """Oracle of stages/relagg.revenue_by_month: EXTRACT-bucketed calendar
    aggregate, exact integer cents."""
    return """SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY 1, 2
ORDER BY yr, mon"""


def customer_order_stats_sql() -> str:
    """Oracle of the left-outer join query: every customer, zero-filled
    order count and exact-cent total."""
    return """SELECT c_custkey, c_mktsegment,
  COALESCE(a.n_orders, 0) AS n_orders,
  COALESCE(a.total_cents, 0) AS total_cents
FROM customer LEFT JOIN (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS total_cents
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
) a ON c_custkey = a.o_custkey
ORDER BY c_custkey"""


def cube_lineitem_sql() -> str:
    """Oracle of stages/relagg.cube_sums: all four grouping sets of
    CUBE (l_returnflag, l_linestatus) over lineitem, exact cents."""
    return """SELECT
  coalesce(l_returnflag, 'ALL') AS l_returnflag,
  coalesce(l_linestatus, 'ALL') AS l_linestatus,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus"""


def user_event_paths_sql(max_len: int = 50) -> str:
    """Oracle of stages/events.user_event_paths (ordered string_agg with a
    length cap)."""
    return f"""WITH o AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  string_agg(event_type, ',' ORDER BY rn) FILTER (WHERE rn <= {max_len}) AS path
FROM o
GROUP BY user_id
ORDER BY user_id"""


def latest_event_sql() -> str:
    """Oracle of stages/relagg.argmax_by over events (latest per user)."""
    return """SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id"""


def moving_sum_sql(preceding: int = 3) -> str:
    """Oracle of stages/events.moving_sum (bounded ROWS frame, exact cents)."""
    return f"""SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS win_n,
  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS win_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {preceding} PRECEDING AND CURRENT ROW)
ORDER BY event_id"""


def trailing_window_sum_sql(window_us: int | None = None) -> str:
    """Oracle of stages/events.trailing_window_sum (time-based RANGE
    frame, peers included, exact cents)."""
    from ..stages import events

    w = events.TRAIL_WINDOW_US if window_us is None else window_us
    return f"""SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS win_n,
  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS win_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '{w} microseconds' PRECEDING
                       AND CURRENT ROW)
ORDER BY event_id"""


def event_gaps_sql() -> str:
    """Oracle of stages/events.event_gaps (LAG; first-per-user rows dropped
    so every column stays non-nullable int64)."""
    return """SELECT event_id, user_id, prev_event_id,
  epoch_us(ts) - prev_ts_us AS gap_us
FROM (
  SELECT event_id, user_id, ts,
    lag(event_id) OVER w AS prev_event_id,
    lag(epoch_us(ts)) OVER w AS prev_ts_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE prev_event_id IS NOT NULL
ORDER BY event_id"""


def user_activity_full_sql(cents_min: int | None = None,
                           views_min: int | None = None) -> str:
    """Oracle of stages/events.user_activity_full (FULL OUTER join of two
    HAVING-filtered per-user aggregates, zero-filled)."""
    cm = events.PURCHASE_CENTS_MIN if cents_min is None else cents_min
    vm = events.VIEWS_MIN if views_min is None else views_min
    return f"""WITH p AS (
  SELECT user_id,
    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS purchase_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING purchase_cents >= {cm}
), v AS (
  SELECT user_id, count(*) AS n_views
  FROM events WHERE event_type = 'view'
  GROUP BY user_id HAVING n_views >= {vm}
)
SELECT COALESCE(p.user_id, v.user_id) AS user_id,
  COALESCE(p.purchase_cents, 0) AS purchase_cents,
  COALESCE(v.n_views, 0) AS n_views
FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
ORDER BY user_id"""


def event_context_sql() -> str:
    """Oracle of stages/events.event_context (LEAD / FIRST_VALUE /
    LAST_VALUE; last-per-user rows dropped so columns stay int64)."""
    return """SELECT event_id, user_id, next_event_id, first_event_id,
  last_event_id
FROM (
  SELECT event_id, user_id,
    lead(event_id) OVER w AS next_event_id,
    first_value(event_id) OVER w AS first_event_id,
    last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      AS last_event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE next_event_id IS NOT NULL
ORDER BY event_id"""


def event_ranks_sql() -> str:
    """Oracle of stages/events.event_ranks (RANK / DENSE_RANK on exact
    integer cents, highest first)."""
    return """SELECT event_id, user_id,
  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
  CAST(rank() OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY floor(value * 100.0 + 0.5) DESC)
ORDER BY event_id"""


def funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase"),
               window_us: int | None = None) -> str:
    """Oracle of stages/events.funnel: chained earliest-within-window mins,
    one CTE per step, -1 sentinels via COALESCE."""
    w = window_us if window_us is not None else events.FUNNEL_WINDOW_US
    ctes = []
    for i, s in enumerate(steps, start=1):
        if i == 1:
            ctes.append(
                f"""s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = '{s}' GROUP BY user_id
)""")
        else:
            ctes.append(
                f"""s{i} AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t{i}
  FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{s}' AND epoch_us(e.ts) >= p.t{i - 1}
    AND epoch_us(e.ts) <= p.t{i - 1} + {w}
  GROUP BY e.user_id
)""")
    k = len(steps)
    stage = "CASE " + " ".join(
        f"WHEN t{i} IS NOT NULL THEN {i}" for i in range(k, 0, -1)
    ) + " ELSE 0 END"
    sel = ",\n  ".join(f"COALESCE(t{i}, -1) AS ts_{i}" for i in range(1, k + 1))
    joins = "\n".join(f"LEFT JOIN s{i} USING (user_id)" for i in range(1, k + 1))
    return f"""WITH u AS (
  SELECT DISTINCT user_id FROM events
),
{",".join(ctes)}
SELECT u.user_id, CAST({stage} AS BIGINT) AS stage,
  {sel}
FROM u
{joins}
ORDER BY u.user_id"""


def event_ntiles_sql(k: int = 4) -> str:
    """Oracle of stages/events.event_ntiles: NTILE + PERCENT_RANK with the
    deterministic (cents, event_id) tiebreak shared by both engines."""
    return f"""SELECT event_id, event_type,
  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
  CAST(ntile({k}) OVER w AS BIGINT) AS ntile,
  {round6('percent_rank() OVER w')} AS pct_rank
FROM events
WINDOW w AS (PARTITION BY event_type
             ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT), event_id)
ORDER BY event_id"""


def events_pivot_sql(types: tuple[str, ...] = events.EVENT_TYPES) -> str:
    """Oracle of stages/events.pivot_counts (conditional-aggregation pivot)."""
    cols = ",\n  ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""SELECT user_id,
  {cols},
  {round6('sum(value)')} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id"""


def grouped_quantiles_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Oracle of sketch.grouped_quantiles over per-language text lengths."""
    vals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in qs)
    return f"""WITH v AS (SELECT lang, length(text) AS v FROM documents),
r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS rn FROM v),
n AS (SELECT lang, count(*) AS n FROM v GROUP BY lang)
SELECT n.lang AS lang, qv.q, r.v AS value
FROM n
CROSS JOIN (VALUES {vals}) qv(q)
JOIN r ON r.lang = n.lang AND r.rn = CAST(floor((n.n - 1) * qv.q) AS BIGINT) + 1
ORDER BY n.lang, qv.q"""


def quantile_filter_sql(lo: float = 0.05, hi: float = 0.95) -> str:
    """Oracle of sketch.quantile_filter over per-language text lengths
    (same rank-floor((n-1)*q) lower-quantile definition as the quantile
    oracles)."""
    return f"""WITH v AS (SELECT doc_id, lang, length(text) AS v FROM documents),
r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS rn FROM v),
n AS (SELECT lang, count(*) AS n FROM v GROUP BY lang),
th AS (
  SELECT n.lang,
    max(CASE WHEN qv.q = {lo} THEN r.v END) AS lo_v,
    max(CASE WHEN qv.q = {hi} THEN r.v END) AS hi_v
  FROM n
  CROSS JOIN (VALUES (CAST({lo} AS DOUBLE)), (CAST({hi} AS DOUBLE))) qv(q)
  JOIN r ON r.lang = n.lang AND r.rn = CAST(floor((n.n - 1) * qv.q) AS BIGINT) + 1
  GROUP BY n.lang)
SELECT v.doc_id, v.lang, CAST(v.v AS BIGINT) AS value
FROM v JOIN th ON v.lang = th.lang
WHERE v.v >= th.lo_v AND v.v <= th.hi_v
ORDER BY doc_id"""


def customers_with_orders_sql(anti: bool = False,
                              priority: str | None = None) -> str:
    """Oracle of the hash semi/anti join: customers that do (semi) or do
    not (anti) appear in orders (optionally restricted to one priority —
    the anti query uses '1-URGENT' so its result is non-empty at every
    driver sf; the unrestricted anti set is empty in the driver data)."""
    op = "NOT EXISTS" if anti else "EXISTS"
    extra = f" AND o.o_orderpriority = '{priority}'" if priority else ""
    return f"""SELECT c_custkey, c_nationkey
FROM customer c
WHERE {op} (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey{extra})
ORDER BY c_custkey"""


def range_join_sql(left_type: str = "purchase", right_type: str = "view",
                   window_us: int = events.RANGE_WINDOW_US) -> str:
    """Oracle of stages/events.range_join: every same-user right event in
    [left.ts - window, left.ts] — plain interval self-join."""
    return f"""SELECT l.event_id, l.user_id, r.event_id AS matched_event_id,
  epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND r.event_type = '{right_type}'
 AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - {window_us} AND epoch_us(l.ts)
WHERE l.event_type = '{left_type}'
ORDER BY l.event_id, matched_event_id"""


def join_orders_by_nation_sql() -> str:
    """Oracle of the shuffle-join + broadcast-lookup pipeline; totals in
    exact integer cents (floor(x*100+0.5) per row, summed as BIGINT — the
    only cross-engine-deterministic way to sum thousands of doubles)."""
    return """SELECT n_name,
  count(*) AS n_orders,
  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name"""


def join_region_customers_sql() -> str:
    return """SELECT r_name,
  count(*) AS n_customers,
  CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name"""


def sliding_window_sql(width_us: int = events.WINDOW_US,
                       hop_us: int = events.WINDOW_US // 2) -> str:
    """Hopping-window oracle: each event joins every hop-aligned window
    start in (ts - width, ts]."""
    fan = width_us // hop_us
    offs = ", ".join(f"({k})" for k in range(fan))
    return f"""WITH offs(k) AS (VALUES {offs})
SELECT
  make_timestamp(((epoch_us(ts) // {hop_us}) - k) * {hop_us}) AS window_start,
  event_type,
  count(*) AS n_events,
  {round6('sum(value)')} AS sum_value
FROM events CROSS JOIN offs
GROUP BY 1, 2
ORDER BY 1, 2"""


def distinct_hosts_sql() -> str:
    from .oracles import pages_cte

    return f"""WITH {pages_cte()}
SELECT count(DISTINCT split_part(url, '/', 3)) AS n_distinct
FROM pages"""


def text_len_quantiles_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Exact lower quantile: value at 0-indexed rank floor((n-1)*q)."""
    sel = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"(SELECT v FROM r WHERE rn = CAST(floor((n.n - 1) * {q}) AS BIGINT) + 1) AS value "
        f"FROM n"
        for q in qs
    )
    return f"""WITH v AS (SELECT length(text) AS v FROM documents),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
n AS (SELECT count(*) AS n FROM v)
{sel}
ORDER BY q"""


def sampled_len_quantiles_sql(keep_ppm: int, mult: int, mod: int,
                              qs=(0.5, 0.9, 0.99)) -> str:
    """Oracle of sketch.sampled_quantiles over text length: the shared
    modular-hash sample, then the exact rank-floor((n-1)*q) rule on the
    SAMPLE."""
    sel = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"(SELECT v FROM r WHERE rn = CAST(floor((n.n - 1) * {q}) AS BIGINT) + 1) AS value "
        f"FROM n"
        for q in qs
    )
    return f"""WITH v AS (
  SELECT length(text) AS v FROM documents
  WHERE ((doc_id % {mod}) * ({mult} % {mod})) % {mod} < {keep_ppm}
),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
n AS (SELECT count(*) AS n FROM v)
{sel}
ORDER BY q"""


def media_resize_sql(target_w: int = 256, target_h: int = 256) -> str:
    """Oracle of media_resize over the decoded metadata (reuses the decode
    CTE arithmetic from media_decode_sql)."""
    base = media_decode_sql()
    return f"""WITH decoded AS ({base})
SELECT media_id, kind,
  CAST({target_w} AS BIGINT) AS out_w, CAST({target_h} AS BIGINT) AS out_h,
  {round6(f'CAST({target_w} AS DOUBLE) / width')} AS scale_x,
  {round6(f'CAST({target_h} AS DOUBLE) / height')} AS scale_y
FROM decoded
ORDER BY media_id"""


def frame_sample_sql(interval_ms: int = media.FRAME_INTERVAL_MS,
                     max_frames: int = media.MAX_FRAMES) -> str:
    base = media_decode_sql()
    return f"""WITH decoded AS ({base}),
n AS (
  SELECT media_id,
    CASE WHEN duration_ms > 0
         THEN least(1 + duration_ms // {interval_ms}, {max_frames})
         ELSE 0 END AS n_frames
  FROM decoded
)
SELECT media_id, g.f AS frame_idx, g.f * {interval_ms} AS frame_ts_ms
FROM n, LATERAL (SELECT unnest(range(n.n_frames)) AS f) g
WHERE n.n_frames > 0
ORDER BY media_id, frame_idx"""


def join_revenue_by_priority_sql() -> str:
    """Oracle of the lineitem x orders shuffle join (exact integer cents:
    per-row floor(extendedprice*(1-discount)*100+0.5), summed as BIGINT)."""
    return """SELECT o_orderpriority,
  count(*) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def brand_supplier_volume_sql() -> str:
    return """SELECT p_brand, s_nationkey,
  count(*) AS n_items,
  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, s_nationkey
ORDER BY p_brand, s_nationkey"""


# ---------------------------------------------------------------------------
# tiny-parameter MinHash / SimHash oracles: the sketches are deterministic
# integer arithmetic, so at small fixed parameters DuckDB can reproduce them
# bit-for-bit — uint64 wraparound is emulated in HUGEINT (multiplies split
# into 32-bit halves so no intermediate exceeds 2^127)
# ---------------------------------------------------------------------------

_M64 = "18446744073709551616"  # 2^64
_FNV = "1099511628211"


def _mulmod64(a: str, b: str) -> str:
    """(a * b) mod 2^64 for HUGEINT a, b in [0, 2^64)."""
    return (
        f"((({a}) % 4294967296) * (({b}) % 4294967296)"
        f" + (((({a}) % 4294967296) * (({b}) // 4294967296)"
        f" + (({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296)"
        f" * 4294967296) % {_M64}"
    )


def _shingle_hash_ctes(k: int) -> str:
    """CTE chain d/sj/sh0..sh: per-(doc, shingle-start) splitmix64(rolling
    FNV polynomial) hashes — mirrors ``hashing.char_shingle_hashes`` exactly
    (uint64 wrap emulated per step in HUGEINT)."""
    poly = "ascii(substring(t, j, 1))::HUGEINT"
    for i in range(1, k):
        # mod after every multiply-add step = numpy's per-step uint64 wrap
        poly = f"((({poly}) * {_FNV} + ascii(substring(t, j + {i}, 1))) % {_M64})"
    return f"""d AS (
  SELECT doc_id,
    CASE WHEN length(text) < {k} THEN text || repeat(chr(0), {k} - length(text))
         ELSE text END AS t
  FROM documents
), sj AS (
  SELECT doc_id, t,
    unnest(range(1, greatest(length(t) - {k - 1}, 1) + 1)) AS j
  FROM d
), sh0 AS (
  SELECT doc_id, j, {poly} AS p FROM sj
), sh1 AS (
  SELECT doc_id, j, (p + 11400714819323198485) % {_M64} AS z1 FROM sh0
), sh2 AS (
  SELECT doc_id, j, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM sh1
), sh3 AS (
  SELECT doc_id, j, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM sh2
), sh AS (
  SELECT doc_id, j, xor(z3, z3 >> 31) AS h FROM sh3
)"""


def minhash_pairs_tiny_sql(threshold: float = 0.5, num_perms: int = 4,
                           shingle_k: int = 3, bands: int = 2) -> str:
    """Oracle of ``minhash_pairs(..., num_perms=4, shingle_k=3, bands=2)``:
    rolling FNV polynomial over the shingle bytes (text is ASCII in every
    driver table), splitmix64 finalizer, per-perm a*h+b min — all mod 2^64,
    constants identical to :class:`...functions.hashing.MinHasher` (same
    seed).  Banding = exact equality of a band's signature slice (the
    engine buckets on a mixed key whose collisions across different slices
    have probability ~2^-63)."""
    from ..functions import hashing

    mh = hashing.MinHasher(num_perms, shingle_k, bands)
    rows = num_perms // bands
    sig_cols = ",\n    ".join(
        f"min(({int(mh.a[p])}::HUGEINT * h + {int(mh.b[p])}) % {_M64}) AS s{p}"
        for p in range(num_perms)
    )
    est = " + ".join(f"CAST(x.s{p} = y.s{p} AS INT)" for p in range(num_perms))
    band_eq = " OR ".join(
        "(" + " AND ".join(
            f"x.s{b * rows + r} = y.s{b * rows + r}" for r in range(rows)
        ) + ")"
        for b in range(bands)
    )
    return f"""WITH {_shingle_hash_ctes(shingle_k)}, sig AS (
  SELECT doc_id,
    {sig_cols}
  FROM sh GROUP BY doc_id
), pe AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
    ({est}) / CAST({num_perms} AS DOUBLE) AS est,
    ({band_eq}) AS banded
  FROM sig x JOIN sig y ON x.doc_id < y.doc_id
)
SELECT a, b, floor(est * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard
FROM pe
WHERE banded AND est >= {D(threshold)}
ORDER BY a, b"""


def cross_source_neardup_sql(threshold: float = 0.7, num_perms: int = 64,
                             shingle_k: int = 5, bands: int = 16) -> str:
    """Oracle of ``textops.cross_source_neardup``: the bit-exact
    minhash-pair CTE cross-tabulated by unordered source pair (least /
    greatest mirror the engine's elementwise string min/max)."""
    pairs = minhash_pairs_tiny_sql(threshold, num_perms, shingle_k, bands)
    return f"""WITH pairs AS ({pairs})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN documents da ON p.a = da.doc_id
JOIN documents db ON p.b = db.doc_id
GROUP BY 1, 2
ORDER BY 1, 2"""


def doc_fingerprints_sql(k: int = 8, window: int = 6) -> str:
    """Oracle of ``textops.doc_fingerprints`` (winnowing, Schleimer et al.
    2003): distinct sliding-window minima of the k-char shingle hashes; docs
    with <= window shingles emit all their distinct hashes.  Fingerprints are
    reinterpreted as signed int64 on both sides (HUGEINT -> pandas would go
    through float64 and lose exactness above 2^53)."""
    signed = (
        f"CASE WHEN fp >= 9223372036854775808 THEN fp - {_M64} ELSE fp END"
    )
    return f"""WITH {_shingle_hash_ctes(k)}, cnts AS (
  SELECT doc_id, count(*) AS cnt FROM sh GROUP BY doc_id
), wm AS (
  SELECT sh.doc_id, sh.j, cnts.cnt,
    CASE WHEN cnts.cnt <= {window} THEN sh.h
         ELSE min(sh.h) OVER (PARTITION BY sh.doc_id ORDER BY sh.j
                              ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
    END AS fp
  FROM sh JOIN cnts USING (doc_id)
)
SELECT DISTINCT doc_id, CAST({signed} AS BIGINT) AS fp
FROM wm
WHERE cnt <= {window} OR j <= cnt - {window} + 1
ORDER BY doc_id, fp"""


def simhash_pairs_tiny_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Oracle of ``simhash_pairs(..., token_hash="md5")``: per-token 64-bit
    hash = first 16 hex chars of md5 (DuckDB computes the identical value),
    unweighted bit votes over whitespace tokens, pigeonhole banding on
    16-bit slices, hamming verify via bit_count(xor)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_eq = " OR ".join(
        f"((x.sim >> {b * width}) & {mask} = (y.sim >> {b * width}) & {mask})"
        for b in range(n_bands)
    )
    return f"""WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
), votes AS (
  SELECT doc_id, bit,
    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, (SELECT unnest(range(64)) AS bit) bits
  GROUP BY doc_id, bit
), simt AS (
  SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0 END) AS UBIGINT) AS sim
  FROM votes GROUP BY doc_id
), sims AS (
  SELECT d.doc_id, coalesce(s.sim, 0::UBIGINT) AS sim
  FROM documents d LEFT JOIN simt s USING (doc_id)
)
SELECT x.doc_id AS a, y.doc_id AS b,
  CAST(bit_count(xor(x.sim, y.sim)) AS BIGINT) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE ({band_eq}) AND bit_count(xor(x.sim, y.sim)) <= {max_hamming}
ORDER BY a, b"""


def simhash_pairs_fnv_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Oracle of ``simhash_pairs(..., token_hash="fnv")`` — the production
    vectorized path: per-token hash = splitmix64(rolling FNV polynomial over
    the utf-8 bytes, h0=0), identical per-step uint64 wrap emulated in
    HUGEINT (same fold as :func:`hll_registers_sql`, which mirrors
    ``functions.hashing.fnv_token_hash64`` / ``poly_hash64``); unweighted
    bit votes, pigeonhole banding, hamming verify via bit_count(xor).

    ASCII assumption (same as char_entropy_sql): the SQL folds ``ascii(c)``
    CODEPOINTS while the engine folds raw UTF-8 BYTES — identical only
    because every driver table's text is ASCII (asserted at generation).
    A non-ASCII corpus needs a byte-level SQL fold instead."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_eq = " OR ".join(
        f"((x.sim >> {b * width}) & {mask} = (y.sim >> {b * width}) & {mask})"
        for b in range(n_bands)
    )
    fold = (f"list_reduce(list_transform(string_split(tok, ''), "
            f"c -> ascii(c)::HUGEINT), (h, b) -> ((h * {_FNV}) % {_M64} + b) % {_M64})")
    return f"""WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '')) AS tok
  FROM documents
), p0 AS (
  SELECT doc_id, {fold} AS h0 FROM toks
), z1 AS (
  SELECT doc_id, (h0 + 11400714819323198485) % {_M64} AS z1 FROM p0
), z2 AS (
  SELECT doc_id, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT doc_id, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), th AS (
  SELECT doc_id, CAST(xor(z3, z3 >> 31) AS UBIGINT) AS h FROM z3
), votes AS (
  SELECT doc_id, bit,
    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, (SELECT unnest(range(64)) AS bit) bits
  GROUP BY doc_id, bit
), simt AS (
  SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0 END) AS UBIGINT) AS sim
  FROM votes GROUP BY doc_id
), sims AS (
  SELECT d.doc_id, coalesce(s.sim, 0::UBIGINT) AS sim
  FROM documents d LEFT JOIN simt s USING (doc_id)
)
SELECT x.doc_id AS a, y.doc_id AS b,
  CAST(bit_count(xor(x.sim, y.sim)) AS BIGINT) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE ({band_eq}) AND bit_count(xor(x.sim, y.sim)) <= {max_hamming}
ORDER BY a, b"""


def contamination_sql(bench_mod: int = 10, n: int = 3) -> str:
    """Oracle of stages/textops.contamination (distinct within-doc word
    n-grams shared with the doc_id % bench_mod == 0 benchmark partition)."""
    sel = " || ' ' || ".join(f"t{j}.tok" for j in range(1, n + 1))
    joins = "\n  ".join(
        f"JOIN toks t{j} ON t1.doc_id = t{j}.doc_id AND t{j}.pos = t1.pos + {j - 1}"
        for j in range(2, n + 1)
    )
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), tri AS (
  SELECT t1.doc_id, {sel} AS gram
  FROM toks t1
  {joins}
), bench AS (
  SELECT DISTINCT gram FROM tri WHERE doc_id % {bench_mod} = 0
)
SELECT t.doc_id, CAST(count(DISTINCT t.gram) AS BIGINT) AS n_overlap
FROM tri t JOIN bench USING (gram)
WHERE t.doc_id % {bench_mod} <> 0
GROUP BY 1
ORDER BY 1"""


def pack_sequences_sql(cap: int = 2048) -> str:
    """Oracle of stages/textops.pack_sequences (global exclusive prefix sum
    of whitespace-token counts, chunked into cap-token sequences)."""
    n_tokens = _re_count("text", textstats.TOKEN_RE)
    return f"""WITH nt AS (
  SELECT doc_id, CAST({n_tokens} AS BIGINT) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM nt
)
SELECT doc_id, n_tokens,
  CAST(cum_prev // {cap} AS BIGINT) AS seq_id,
  CAST(cum_prev % {cap} AS BIGINT) AS seq_offset
FROM c
ORDER BY doc_id"""


def window_distinct_users_sql(window_us: int = events.WINDOW_US) -> str:
    """Oracle of stages/sketch.window_distinct_users."""
    return f"""SELECT
  make_timestamp((epoch_us(ts) // {window_us}) * {window_us}) AS window_start,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
ORDER BY 1"""


def heavy_hitters_sql(phi_den: int = 500) -> str:
    """Oracle of stages/sketch.heavy_hitters: tokens with total count >=
    ceil(total_tokens / phi_den), integer threshold arithmetic."""
    return f"""WITH t AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS total FROM t
)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM t
GROUP BY token
HAVING count(*) >= ((SELECT total FROM n) + {phi_den - 1}) // {phi_den}
ORDER BY token"""


def redact_pii_sql(pattern: str | None = None,
                   replacement: str | None = None) -> str:
    """Oracle of stages/extract.redact_terms — DuckDB regexp_replace is the
    same RE2 engine as pyarrow's replace_substring_regex, so the redacted
    text and match counts agree by construction."""
    from ..stages import extract
    p = (pattern or extract.REDACT_QUERY_PATTERN).replace("'", "''")
    r = (replacement or extract.REDACT_QUERY_REPLACEMENT).replace("'", "''")
    return f"""SELECT doc_id,
  regexp_replace(text, '{p}', '{r}', 'g') AS text,
  {_re_count("text", pattern or extract.REDACT_QUERY_PATTERN)} AS n_redactions
FROM documents
ORDER BY doc_id"""


def json_props_sql() -> str:
    """Oracle of stages/extract.json_props — real JSON semantics via
    DuckDB's json_extract_string."""
    return """SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
ORDER BY event_id"""


def chunk_documents_sql(size: int | None = None,
                        stride: int | None = None) -> str:
    """Oracle of stages/textops.chunk_documents: chunk i =
    substring(i*stride, size), max(1, ceil(len/stride)) chunks per doc."""
    from ..stages import textops as t

    size = size if size is not None else t.CHUNK_SIZE
    stride = stride if stride is not None else t.CHUNK_STRIDE
    return f"""SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
  substring(text, i * {stride} + 1, {size}) AS chunk_text
FROM documents,
  unnest(generate_series(0,
    greatest((length(text) + {stride - 1}) // {stride}, 1) - 1)) AS s(i)
ORDER BY doc_id, chunk_idx"""


def cms_user_counts_sql() -> str:
    """Oracle of stages/sketch.cms_user_counts: the count-min sketch is
    deterministic integer arithmetic (bucket = ((u*A_j+B_j) % P) % W, every
    product < 2^62), so DuckDB reproduces the d x W bucket sums and the
    min-over-depths estimate bit-for-bit."""
    from ..stages import sketch as sk

    rows = ", ".join(f"({j}, {a}, {b})"
                     for j, (a, b) in enumerate(zip(sk.CMS_A, sk.CMS_B)))
    return f"""WITH c AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY u
), h AS (
  SELECT u, cnt, j, ((u * A + B) % {sk.CMS_P}) % {sk.CMS_W} AS bkt
  FROM c, (VALUES {rows}) AS p(j, A, B)
), s AS (
  SELECT j, bkt, sum(cnt) AS bsum FROM h GROUP BY j, bkt
)
SELECT h.u AS user_id,
  CAST(min(h.cnt) AS BIGINT) AS n_true,
  CAST(min(s.bsum) AS BIGINT) AS n_est
FROM h JOIN s ON h.j = s.j AND h.bkt = s.bkt
GROUP BY h.u
ORDER BY user_id"""


def grouped_corr_sql() -> str:
    """Oracle of stages/sketch.grouped_corr: exact integer moments, one
    double division, IEEE-correctly-rounded sqrt only in the corr
    denominator — the same expression tree as the engine finalize."""
    num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    den = ("sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))"
           " * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))")
    return f"""WITH d AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS x,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))
         AS BIGINT) AS y
  FROM documents
), m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
  FROM d GROUP BY lang
)
SELECT lang, n AS n_docs,
  {round6(f'{num} / CAST(n * n AS DOUBLE)')} AS cov_chars_tokens,
  {round6(f'CASE WHEN {den} > 0 THEN {num} / ({den}) ELSE 0.0 END')}
    AS corr_chars_tokens
FROM m
ORDER BY lang"""


def inverted_index_sql(min_df: int = 2) -> str:
    """Oracle of stages/textops.inverted_index: distinct (doc, token) via
    list_distinct, ordered string_agg posting lists."""
    return f"""WITH t AS (
  SELECT doc_id, unnest(list_distinct(
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS token
  FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_list
FROM t
GROUP BY token
HAVING count(*) >= {min_df}
ORDER BY token"""


def dup_ngram_stats_sql(n: int = 3) -> str:
    """Oracle of stages/textops.dup_ngram_stats: same \\s+ tokenization,
    n-grams via 1-based list slicing, per-(doc, gram) counts, integer sums."""
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - {n - 2}), i ->
      {joined})) AS gram
  FROM t WHERE len(toks) >= {n}
), c AS (
  SELECT doc_id, gram, count(*) AS cnt, length(gram) AS glen
  FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
  CAST(sum(cnt) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
  CAST(sum(cnt * glen) AS BIGINT) AS total_chars,
  CAST(sum(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END) AS BIGINT) AS dup_chars
FROM c
GROUP BY doc_id
ORDER BY doc_id"""


def triangles_sql(comm_mod: int | None = None) -> str:
    """Oracle of stages/triangles.triangle_counts: DISTINCT undirected
    community edges (same two link rules), then the canonical 3-way
    self-join a < b < c — orientation-independent, so it checks the
    engine's degree-ordered algorithm from a completely different plan."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT comm, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT x AS comm FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY comm
ORDER BY comm"""


def graph_reciprocity_sql() -> str:
    """Oracle of stages/pagerank.graph_reciprocity: DISTINCT directed
    host edges, mutual = edges whose reverse exists (self-join), one
    round6 division."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from .oracles import round6

    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"(doc_id * {mult}) % {mod}"
    dhost1 = f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd}) * {mult}) % {mod}"
    dhost2 = (f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}")
    return f"""WITH e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
  ) WHERE src <> dst
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    CAST(sum(CASE WHEN EXISTS (
      SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
      THEN 1 ELSE 0 END) AS BIGINT) AS mutual
  FROM e
)
SELECT m, mutual,
  {round6('CAST(mutual AS DOUBLE) / m')} AS reciprocity
FROM st"""


def degree_assortativity_sql(comm_mod: int | None = None) -> str:
    """Oracle of stages/triangles.degree_assortativity: stub-degree
    moments over both edge orientations, exact HUGEINT, one round6
    division (the symmetric Pearson form — no sqrt)."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri
    from .oracles import round6

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY 1
), ed AS (
  SELECT da.d AS x, db.d AS y
  FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b
), mom AS (
  SELECT CAST(2 * count(*) AS HUGEINT) AS m2,
    CAST(sum(x) + sum(y) AS HUGEINT) AS sx,
    CAST(2 * sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
    CAST(sum(CAST(x AS HUGEINT) * x) + sum(CAST(y AS HUGEINT) * y)
         AS HUGEINT) AS sxx
  FROM ed
)
SELECT CAST(m2 // 2 AS BIGINT) AS m,
  {round6('CAST(m2 * sxy - sx * sx AS DOUBLE)'
          ' / CAST(m2 * sxx - sx * sx AS DOUBLE)')} AS r
FROM mom"""


def graph_modularity_sql(comm_mod: int | None = None,
                         rounds: int = 12) -> str:
    """Oracle of stages/triangles.graph_modularity: hook+jump CC over the
    linear-rule subgraph, label joins on the full edge set, exact HUGEINT
    q_num = 4m*intra - sum d_c^2, one float division round6."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri
    from .oracles import hook_jump_chain, round6

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    chain, prev = hook_jump_chain(rounds)
    return f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), el AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
  ) WHERE s <> t
), edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM el
  UNION ALL
  SELECT b, a FROM el
), nodes AS (
  SELECT a AS v FROM e0 UNION SELECT b FROM e0
), l0 AS MATERIALIZED (
  SELECT v, v AS l FROM nodes
),
{chain},
lab AS MATERIALIZED (
  SELECT v, l FROM {prev}
), ej AS MATERIALIZED (
  SELECT la.l AS la, lb.l AS lb
  FROM e0 JOIN lab la ON la.v = e0.a JOIN lab lb ON lb.v = e0.b
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS m,
    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS HUGEINT) AS intra
  FROM ej
), dc AS (
  SELECT l, CAST(count(*) AS HUGEINT) AS d
  FROM (SELECT la AS l FROM ej UNION ALL SELECT lb FROM ej) GROUP BY l
), ag AS (
  SELECT CAST(count(*) AS BIGINT) AS n_comm,
    CAST(sum(d * d) AS HUGEINT) AS dc2
  FROM dc
)
SELECT ag.n_comm, CAST(st.m AS BIGINT) AS m, CAST(st.intra AS BIGINT)
    AS intra,
  CAST(4 * st.m * st.intra - ag.dc2 AS BIGINT) AS q_num,
  {round6('CAST(4 * st.m * st.intra - ag.dc2 AS DOUBLE)'
          ' / CAST(4 * st.m * st.m AS DOUBLE)')} AS modularity
FROM st, ag"""


def common_neighbors_sql(comm_mod: int | None = None,
                         min_cn: int | None = None) -> str:
    """Oracle of stages/triangles.common_neighbors: same DISTINCT edge
    CTE, wedge self-join counts |N(u) & N(w)| per candidate pair, NOT
    EXISTS anti-join drops pairs already connected."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mc = min_cn if min_cn is not None else tri.CN_MIN
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), adj AS (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL
  SELECT b, a FROM e0
), cand AS (
  SELECT n1.nbr AS u, n2.nbr AS w, CAST(count(*) AS BIGINT) AS cn
  FROM adj n1 JOIN adj n2 ON n1.node = n2.node AND n1.nbr < n2.nbr
  GROUP BY 1, 2
)
SELECT u, w, cn FROM cand c
WHERE cn >= {mc}
  AND NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = c.u AND e0.b = c.w)
ORDER BY cn DESC, u, w"""


def adamic_adar_sql(comm_mod: int | None = None,
                    min_cn: int | None = None) -> str:
    """Oracle of stages/triangles.adamic_adar: per-node weight quantized
    once to micro-units (floor(1e6/ln(deg)+0.5)), then pure-integer pair
    sums — order-free, so plain SQL sum() is safe."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mc = min_cn if min_cn is not None else tri.CN_MIN
    ws = tri.AA_WSCALE
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), adj AS (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL
  SELECT b, a FROM e0
), wt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg,
    CASE WHEN count(*) >= 2 THEN CAST(floor(
      {ws}.0 / ln(CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT)
    ELSE 0 END AS w_micro
  FROM adj GROUP BY 1
), cand AS (
  SELECT n1.nbr AS u, n2.nbr AS w, CAST(count(*) AS BIGINT) AS cn,
    CAST(sum(wt.w_micro) AS BIGINT) AS aa_micro
  FROM adj n1
  JOIN adj n2 ON n1.node = n2.node AND n1.nbr < n2.nbr
  JOIN wt ON wt.node = n1.node
  GROUP BY 1, 2
)
SELECT u, w, cn, aa_micro FROM cand c
WHERE cn >= {mc}
  AND NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = c.u AND e0.b = c.w)
ORDER BY aa_micro DESC, u, w"""


def kcore_sql(k: int | None = None, comm_mod: int | None = None,
              rounds: int | None = None) -> str:
    """Oracle of stages/triangles.kcore: the same fixed-round synchronous
    peel unrolled as chained CTEs."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    k = k if k is not None else tri.KCORE_K
    cm = comm_mod if comm_mod is not None else tri.KCORE_MOD
    rounds = rounds if rounds is not None else tri.KCORE_ROUNDS
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    # AS MATERIALIZED is load-bearing: each CTE is referenced several
    # times, and DuckDB's default inlining makes the unrolled peel
    # exponential (>280 s at rounds=4; instant materialized)
    steps = []
    prev = "e0"
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
  ) GROUP BY node
), a{i} AS MATERIALIZED (
  SELECT node FROM d{i} WHERE deg >= {k}
), e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN a{i} x ON e.a = x.node
  JOIN a{i} y ON e.b = y.node
)""")
        prev = f"e{i}"
    chain = ",\n".join(steps)
    return f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
),
{chain}
SELECT node AS comm, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
) GROUP BY node
ORDER BY comm"""


def pagerank_sql(iterations: int = 8) -> str:
    """Oracle of stages/pagerank.pagerank: the same K exact fixed-point
    supersteps unrolled as chained CTEs (integer floor division throughout,
    so every step is order-independent and matches the engine bit-for-bit)."""
    from ..functions import geocode
    from ..stages import pagerank as pr

    mult = geocode.TLD_MULT
    mod = geocode.HOST_MOD
    host = f"(doc_id * {mult}) % {mod}"
    nd = "(SELECT count(*) FROM documents)"
    dhost1 = f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd}) * {mult}) % {mod}"
    dhost2 = f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd}) * {mult}) % {mod}"
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""r{i} AS (
  SELECT h.host,
    CAST((SELECT base FROM consts)
      + ({pr.DAMP_NUM} * COALESCE(s.contrib, 0)) // {pr.DAMP_DEN} AS BIGINT) AS rank
  FROM hosts h LEFT JOIN (
    SELECT e.dst AS host, CAST(sum(r.rank // e.outdeg) AS BIGINT) AS contrib
    FROM edges e JOIN {prev} r ON e.src = r.host
    GROUP BY 1
  ) s ON h.host = s.host
)""")
        prev = f"r{i}"
    chain = ",\n".join(steps)
    return f"""WITH hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
), e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
  )
), edeg AS (
  SELECT src, dst, CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg
  FROM e0 WHERE src <> dst
), edges AS (
  SELECT * FROM edeg
), consts AS (
  SELECT CAST({pr.SCALE} * {pr.DAMP_DEN - pr.DAMP_NUM} AS BIGINT)
           // ({pr.DAMP_DEN} * (SELECT count(*) FROM hosts)) AS base,
         CAST({pr.SCALE} AS BIGINT) // (SELECT count(*) FROM hosts) AS init
), r0 AS (
  SELECT host, (SELECT init FROM consts) AS rank FROM hosts
),
{chain}
SELECT host, rank FROM {prev}
ORDER BY host"""


def bfs_hops_sql(seed_mod: int | None = None, rounds: int | None = None) -> str:
    """Oracle of stages/pagerank.bfs_hops: the same fixed number of
    relaxation rounds unrolled as chained CTEs — each round min-combines
    the previous distance table with dist+1 pushed along every out-edge,
    exactly the engine's BSP recurrence (all-int64, order-independent)."""
    from ..functions import geocode
    from ..stages import pagerank as pr

    seed_mod = pr.BFS_SEED_MOD if seed_mod is None else seed_mod
    rounds = pr.BFS_ROUNDS if rounds is None else rounds
    mult = geocode.TLD_MULT
    mod = geocode.HOST_MOD
    host = f"(doc_id * {mult}) % {mod}"
    nd = "(SELECT count(*) FROM documents)"
    dhost1 = f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd}) * {mult}) % {mod}"
    dhost2 = f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd}) * {mult}) % {mod}"
    steps = []
    prev = "d0"
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS (
  SELECT host, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT host, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS host, d.dist + 1 AS dist
    FROM edges e JOIN {prev} d ON e.src = d.host
  ) GROUP BY host
)""")
        prev = f"d{i}"
    chain = ",\n".join(steps)
    return f"""WITH hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
), edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
  ) WHERE src <> dst
), d0 AS (
  SELECT host, CAST(0 AS BIGINT) AS dist FROM hosts WHERE host % {seed_mod} = 0
),
{chain}
SELECT host, dist FROM {prev}
ORDER BY host"""


def hll_registers_sql(p: int = 12) -> str:
    """Oracle of stages/sketch.hll_registers: per-distinct-host
    splitmix64(rolling FNV over the utf-8 bytes) in HUGEINT mod 2^64
    (identical per-step wrap to ``functions.hashing.poly_hash64``),
    register = top ``p`` hash bits, rho = first-set-bit position of the
    remaining bits found by an exact 0..63-bit scan (no float log2 on the
    SQL side), max per register."""
    from .oracles import pages_cte

    fold = (f"list_reduce(list_transform(string_split(host, ''), "
            f"c -> ascii(c)::HUGEINT), (h, b) -> ((h * {_FNV}) % {_M64} + b) % {_M64})")
    return f"""WITH {pages_cte()}, hosts AS (
  SELECT DISTINCT split_part(url, '/', 3) AS host FROM pages
), p0 AS (
  SELECT host, CASE WHEN length(host) = 0 THEN 0::HUGEINT ELSE {fold} END AS h0
  FROM hosts
), z1 AS (
  SELECT host, (h0 + 11400714819323198485) % {_M64} AS z1 FROM p0
), z2 AS (
  SELECT host, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT host, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), hh AS (
  SELECT host, xor(z3, z3 >> 31) AS h FROM z3
), parts AS (
  SELECT CAST(h >> {64 - p} AS BIGINT) AS register,
         (h * {1 << p}) % {_M64} AS rest
  FROM hh
), rhos AS (
  SELECT register,
    COALESCE((SELECT min(i.i) + 1 FROM range(0, {64 - p}) i(i)
              WHERE ((parts.rest >> CAST(63 - i.i AS INT)) % 2) = 1),
             {64 - p + 1}) AS rho
  FROM parts
)
SELECT register, CAST(max(rho) AS BIGINT) AS rho
FROM rhos
GROUP BY register
ORDER BY register"""


def lm_score_sql(train_mod: int | None = None, min_count: int | None = None,
                 vocab_max: int | None = None) -> str:
    """Oracle of stages/lm.lm_score: bounded bigram LM trained on the
    ``doc_id % train_mod = 0`` subset (vocab = top ``vocab_max`` unigrams by
    (cnt DESC, tok ASC); bigrams within-vocab with cnt >= ``min_count``),
    then every document scored with the exact fixed-point add-one term
    ``((c12 + 1) * 10^9) // (c1 + V)`` summed per doc — integer division
    per term makes the sum order-independent on both engines."""
    from ..stages import lm

    train_mod = lm.TRAIN_MOD if train_mod is None else train_mod
    min_count = lm.MIN_COUNT if min_count is None else min_count
    vocab_max = lm.VOCAB_MAX if vocab_max is None else vocab_max
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), ttoks AS (
  SELECT * FROM toks WHERE doc_id % {train_mod} = 0
), uc0 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ttoks GROUP BY tok
), vocab AS (
  SELECT tok, cnt FROM (
    SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rn FROM uc0
  ) WHERE rn <= {vocab_max}
), vsize AS (
  SELECT CAST(count(*) AS BIGINT) AS V FROM vocab
), bcv AS (
  SELECT t1.tok AS w1, t2.tok AS w2, CAST(count(*) AS BIGINT) AS cnt
  FROM ttoks t1 JOIN ttoks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  JOIN vocab v1 ON t1.tok = v1.tok
  JOIN vocab v2 ON t2.tok = v2.tok
  GROUP BY 1, 2
  HAVING count(*) >= {min_count}
), bg AS (
  SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
), terms AS (
  SELECT bg.doc_id,
    ((COALESCE(bcv.cnt, 0) + 1) * {lm.SCALE})
      // (COALESCE(v.cnt, 0) + (SELECT V FROM vsize)) AS term
  FROM bg
  LEFT JOIN vocab v ON bg.w1 = v.tok
  LEFT JOIN bcv ON bg.w1 = bcv.w1 AND bg.w2 = bcv.w2
)
SELECT d.doc_id,
  CAST(COALESCE(t.n, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(t.s, 0) AS BIGINT) AS score_fp
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n, sum(term) AS s FROM terms GROUP BY doc_id
) t ON d.doc_id = t.doc_id
ORDER BY d.doc_id"""


def tpch_q3_sql(cutoff: str | None = None, segment: str | None = None,
                k: int | None = None) -> str:
    """Oracle of stages/relagg.tpch_q3 (3-table join + grouped top-k,
    exact integer cents, ties ascending on l_orderkey)."""
    from ..stages import relagg

    cutoff = relagg.Q3_CUTOFF if cutoff is None else cutoff
    segment = relagg.Q3_SEGMENT if segment is None else segment
    k = relagg.Q3_K if k is None else k
    return f"""WITH per_order AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = '{segment}'
    AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
    AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_cents,
  CAST(row_number() OVER (ORDER BY revenue_cents DESC, l_orderkey) AS BIGINT) AS rank
FROM per_order
ORDER BY revenue_cents DESC, l_orderkey
LIMIT {k}"""


def collapse_repeats_sql() -> str:
    """Oracle of stages/textops.collapse_repeats: drop tokens equal to the
    immediately preceding token within a document, rejoin with single
    spaces (same whitespace normalization as the engine's split/join)."""
    return """WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), tk AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), marked AS (
  SELECT doc_id, tok, pos,
    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tk
), kept AS (
  SELECT doc_id, tok, pos FROM marked WHERE prev IS NULL OR tok != prev
)
SELECT d.doc_id,
  COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
            FROM kept k WHERE k.doc_id = d.doc_id), '') AS text,
  CAST(COALESCE((SELECT count(*) FROM tk WHERE tk.doc_id = d.doc_id), 0)
       AS BIGINT) AS n_tokens_in,
  CAST(COALESCE((SELECT count(*) FROM kept k WHERE k.doc_id = d.doc_id), 0)
       AS BIGINT) AS n_tokens_out
FROM documents d
ORDER BY d.doc_id"""


def dedup_canonical_sql(threshold: float) -> str:
    """Oracle of stages/cc.dedup_canonical: connected components over the
    Jaccard>=threshold graph, then keep-best (longest text, ties -> lowest
    doc_id) per component."""
    return f"""WITH RECURSIVE {_jaccard_ctes()}, edges AS (
  SELECT a AS src, b AS dst FROM j WHERE jac >= {D(threshold)}
  UNION ALL
  SELECT b AS src, a AS dst FROM j WHERE jac >= {D(threshold)}
), reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, min(root) AS component FROM reach GROUP BY node
),
ranked AS (
  SELECT c.component, c.doc_id, CAST(length(d.text) AS BIGINT) AS tlen,
    row_number() OVER (PARTITION BY c.component
                       ORDER BY length(d.text) DESC, c.doc_id) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT component, doc_id AS canonical, tlen AS best_len
FROM ranked WHERE rn = 1
ORDER BY component"""


def len_histogram_sql(width: int) -> str:
    """Oracle of stages/textops.len_histogram."""
    return f"""SELECT length(text) // {width} AS bucket,
  CAST(length(text) // {width} * {width} AS BIGINT) AS lo,
  count(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY bucket"""


def host_split_sql() -> str:
    """Oracle of stages/textops.host_split: splitmix64(FNV fold over host
    bytes) in HUGEINT mod 2^64 (same chain as hll_registers_sql), bucketed
    by the split weights."""
    from ..stages import textops as t

    from .oracles import pages_cte

    fold = (f"list_reduce(list_transform(string_split(host, ''), "
            f"c -> ascii(c)::HUGEINT), (h, b) -> ((h * {_FNV}) % {_M64} + b) % {_M64})")
    acc = 0
    cases = []
    for name, w in t.SPLIT_WEIGHTS:
        acc += w
        cases.append(f"WHEN hb < {acc} THEN '{name}'")
    case = " ".join(cases)
    return f"""WITH {pages_cte()}, ph AS (
  SELECT page_id, split_part(url, '/', 3) AS host FROM pages
), p0 AS (
  SELECT page_id, host, CASE WHEN length(host) = 0 THEN 0::HUGEINT ELSE {fold} END AS h0
  FROM ph
), z1 AS (
  SELECT page_id, host, (h0 + 11400714819323198485) % {_M64} AS z1 FROM p0
), z2 AS (
  SELECT page_id, host, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT page_id, host, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), hh AS (
  SELECT page_id, host, CAST(xor(z3, z3 >> 31) % {t.SPLIT_MOD} AS BIGINT) AS hb FROM z3
)
SELECT page_id, host, CASE {case} END AS split
FROM hh
ORDER BY page_id"""


def lang_confusion_sql() -> str:
    """Oracle of stages/textops.lang_confusion: label x prediction counts
    over the lang_id CTE logic."""
    base = lang_id_sql()
    return f"""WITH pred AS ({base})
SELECT lang, pred_lang, count(*) AS n_docs
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang"""


def weighted_median_len_sql() -> str:
    """Oracle of stages/sketch.weighted_median_len: (length -> token
    mass) histogram, cumulative window, smallest length with
    2*cum >= total."""
    return """WITH t AS (
  SELECT CAST(n_chars AS BIGINT) AS len,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                         s -> s <> '')) AS BIGINT) AS w
  FROM documents
), h AS (
  SELECT len, CAST(sum(w) AS BIGINT) AS w FROM t GROUP BY 1
), st AS (
  SELECT CAST(sum(w) AS BIGINT) AS total FROM h
), c AS (
  SELECT len, CAST(sum(w) OVER (ORDER BY len) AS BIGINT) AS cum FROM h
)
SELECT st.total AS total_tokens,
  CAST(min(c.len) AS BIGINT) AS median_len,
  CAST(min(c.cum) AS BIGINT) AS mass_below
FROM c, st
WHERE 2 * c.cum >= st.total
GROUP BY st.total"""


def spearman_corr_sql() -> str:
    """Oracle of stages/sketch.spearman_corr: doubled average tie ranks
    from the two value histograms (2*cnt_less + cnt_eq + 1), exact
    HUGEINT Pearson moments over the rank pairs, one round6 division."""
    from .oracles import round6

    tree = ("CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")
    return f"""WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                         s -> s <> '')) AS BIGINT) AS b
  FROM documents
), ha AS (
  SELECT a AS v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1
), ra AS (
  SELECT v, 2 * CAST(coalesce(sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    + c + 1 AS r2
  FROM ha
), hb AS (
  SELECT b AS v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1
), rb AS (
  SELECT v, 2 * CAST(coalesce(sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    + c + 1 AS r2
  FROM hb
), j AS (
  SELECT CAST(ra.r2 AS HUGEINT) AS x, CAST(rb.r2 AS HUGEINT) AS y
  FROM t JOIN ra ON ra.v = t.a JOIN rb ON rb.v = t.b
), mom AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(x * y) AS HUGEINT) AS sxy,
    CAST(sum(x * x) AS HUGEINT) AS sxx,
    CAST(sum(y * y) AS HUGEINT) AS syy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n, {round6(tree)} AS rho FROM mom"""


def cohen_kappa_sql() -> str:
    """Oracle of stages/textops.cohen_kappa: the lang_id confusion chain,
    chance-cleared kappa = (N*agree - E)/(N^2 - E) in HUGEINT."""
    from .oracles import round6

    base = lang_id_sql()
    return f"""WITH pred AS ({base}),
conf AS (
  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), st AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn,
    CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END) AS HUGEINT)
      AS agree
  FROM conf
), mr AS (
  SELECT lang AS c, CAST(sum(n) AS HUGEINT) AS r FROM conf GROUP BY 1
), mc AS (
  SELECT pred_lang AS c, CAST(sum(n) AS HUGEINT) AS col
  FROM conf GROUP BY 1
), e AS (
  SELECT CAST(coalesce(sum(mr.r * mc.col), 0) AS HUGEINT) AS ev
  FROM mr JOIN mc ON mc.c = mr.c
)
SELECT CAST(st.nn AS BIGINT) AS n, CAST(st.agree AS BIGINT) AS agree,
  CAST(st.nn * st.agree - e.ev AS BIGINT) AS kappa_num,
  CAST(st.nn * st.nn - e.ev AS BIGINT) AS kappa_den,
  {round6('CAST(st.nn * st.agree - e.ev AS DOUBLE)'
          ' / CAST(st.nn * st.nn - e.ev AS DOUBLE)')} AS kappa
FROM st, e"""


def text_len_quantiles_cont_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Oracle of stages/sketch.quantiles_cont over text length: explicit
    rank + linear-interpolation expression (v_lo + frac * (v_hi - v_lo)),
    NOT DuckDB's internal quantile_cont — full control of the float ops."""
    from .oracles import D, round6

    sel = []
    for q in qs:
        h = f"(n.n - 1) * {D(q)}"
        lo = f"CAST(floor({h}) AS BIGINT)"
        hi = f"least({lo} + 1, n.n - 1)"
        vlo = f"(SELECT CAST(v AS DOUBLE) FROM r WHERE rn = {lo})"
        vhi = f"(SELECT CAST(v AS DOUBLE) FROM r WHERE rn = {hi})"
        expr = f"{vlo} + ({h} - floor({h})) * ({vhi} - {vlo})"
        sel.append(
            f"SELECT CAST({q} AS DOUBLE) AS q, {round6(expr)} AS value FROM n"
        )
    union = " UNION ALL ".join(sel)
    return f"""WITH v AS (SELECT length(text) AS v FROM documents),
r AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS rn FROM v),
n AS (SELECT count(*) AS n FROM v)
{union}
ORDER BY q"""


def cohort_retention_sql(bucket_us: int = 86_400_000_000) -> str:
    """Oracle of stages/events.cohort_retention (all-integer day buckets)."""
    return f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {bucket_us} AS day FROM events
),
c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, c.cohort, e.day - c.cohort AS day_offset
  FROM e JOIN c ON e.user_id = c.user_id
)
SELECT cohort AS cohort_day, day_offset, count(*) AS n_users
FROM a
GROUP BY 1, 2
ORDER BY 1, 2"""


def cooccurrence_sql(window_us: int = events.WINDOW_US) -> str:
    """Oracle of stages/events.cooccurrence (uncapped)."""
    return f"""WITH e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {window_us} AS w FROM events
),
p AS (
  SELECT a.user_id AS a, b.user_id AS b
  FROM e a JOIN e b ON a.w = b.w AND a.user_id < b.user_id
)
SELECT a, b, count(*) AS n_windows
FROM p
GROUP BY a, b
ORDER BY a, b"""


def lang_share_sql() -> str:
    """Oracle of stages/relagg.ratio_to_report over pages by lang."""
    from .oracles import pages_cte

    return f"""WITH {pages_cte()},
c AS (SELECT lang, count(*) AS n_rows FROM pages GROUP BY lang)
SELECT lang, n_rows,
  {round6('CAST(n_rows AS DOUBLE) / (SELECT CAST(sum(n_rows) AS DOUBLE) FROM c)')} AS share
FROM c
ORDER BY lang"""


def fuzzy_hosts_sql() -> str:
    """Oracle of stages/textops.fuzzy_value_join over distinct hosts
    (DuckDB's levenshtein as the independent distance implementation)."""
    from .oracles import pages_cte

    return f"""WITH {pages_cte()},
hosts AS (SELECT DISTINCT split_part(url, '/', 3) AS h FROM pages)
SELECT a.h AS a, b.h AS b
FROM hosts a JOIN hosts b
  ON a.h < b.h AND levenshtein(a.h, b.h) <= 1
ORDER BY a, b"""


def typo_clusters_sql(rounds: int = 8) -> str:
    """Oracle of stages/textops.typo_clusters: levenshtein<=1 pairs over
    distinct hosts, hook+jump min-label CC over VARCHAR labels (min() on
    strings is the same lexicographic min as the engine's union-by-min)."""
    from .oracles import hook_jump_chain, pages_cte

    chain, prev = hook_jump_chain(rounds)
    return f"""WITH {pages_cte()},
hosts AS (SELECT DISTINCT split_part(url, '/', 3) AS h FROM pages),
e AS MATERIALIZED (
  SELECT a.h AS a, b.h AS b
  FROM hosts a JOIN hosts b
    ON a.h < b.h AND levenshtein(a.h, b.h) <= 1
), edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e
  UNION ALL
  SELECT b, a FROM e
), nodes AS (
  SELECT a AS v FROM e UNION SELECT b FROM e
), l0 AS MATERIALIZED (
  SELECT v, v AS l FROM nodes
),
{chain}
SELECT v AS member, l AS cluster FROM {prev} ORDER BY member"""


def char_entropy_sql() -> str:
    """Oracle of stages/textops.char_entropy (per-codepoint counts; the
    synthetic corpus is ASCII so codepoint == byte)."""
    return """WITH c AS (
  SELECT doc_id, t.ch, count(*) AS c
  FROM documents, LATERAL (SELECT unnest(string_split(text, '')) AS ch) t
  WHERE length(text) > 0
  GROUP BY doc_id, t.ch
),
n AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n, CAST(sum(c) AS BIGINT) AS n_chars FROM c GROUP BY doc_id),
e AS (
  SELECT c.doc_id, n.n_chars,
    -sum((CAST(c.c AS DOUBLE) / n.n) * log2(CAST(c.c AS DOUBLE) / n.n)) AS ent
  FROM c JOIN n ON c.doc_id = n.doc_id
  GROUP BY c.doc_id, n.n_chars
)
SELECT d.doc_id,
  COALESCE(e.n_chars, 0) AS n_chars,
  floor(COALESCE(e.ent, 0.0) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
ORDER BY d.doc_id"""


def first_events_sql(n: int = 3) -> str:
    """Oracle of stages/relagg.group_head over events per user."""
    return f"""WITH r AS (
  SELECT user_id, event_id, ts, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rank
  FROM events
)
SELECT user_id, rank, event_id, ts, event_type
FROM r WHERE rank <= {n}
ORDER BY user_id, rank"""


def quantize_int8_sql() -> str:
    """Oracle of stages/ann.quantize_int8 (identical floor arithmetic over
    the unnested embedding elements)."""
    return """WITH el AS (
  SELECT vec_id, CAST(u.e AS DOUBLE) AS v
  FROM embeddings, LATERAL (SELECT unnest(embedding) AS e) u
),
mm AS (
  SELECT vec_id, min(v) AS vmin, max(v) AS vmax, (max(v) - min(v)) / 255.0 AS scale
  FROM el GROUP BY vec_id
),
codes AS (
  SELECT el.vec_id,
    CASE WHEN mm.scale > 0.0
         THEN CAST(floor((el.v - mm.vmin) / mm.scale + 0.5) AS BIGINT)
         ELSE 0 END AS code
  FROM el JOIN mm ON el.vec_id = mm.vec_id
)
SELECT c.vec_id,
  floor(mm.vmin * 1000000.0 + 0.5) / 1000000.0 AS qmin,
  floor(mm.scale * 1000000.0 + 0.5) / 1000000.0 AS qscale,
  CAST(sum(c.code) AS BIGINT) AS code_sum,
  CAST(min(c.code) AS BIGINT) AS code_min,
  CAST(max(c.code) AS BIGINT) AS code_max
FROM codes c JOIN mm ON c.vec_id = mm.vec_id
GROUP BY c.vec_id, mm.vmin, mm.scale
ORDER BY c.vec_id"""


def ohlc_bars_sql(window_us: int = events.WINDOW_US) -> str:
    """Oracle of stages/events.ohlc_bars ((ts, event_id) open/close ties)."""
    return f"""WITH e AS (
  SELECT (epoch_us(ts) // {window_us}) * {window_us} AS w, event_type, ts, event_id,
    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT w, event_type, cents,
    row_number() OVER (PARTITION BY w, event_type ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY w, event_type ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT make_timestamp(w) AS window_start, event_type,
  count(*) AS n_events,
  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
  CAST(max(cents) AS BIGINT) AS high_cents,
  CAST(min(cents) AS BIGINT) AS low_cents,
  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents
FROM r
GROUP BY w, event_type
ORDER BY 1, 2"""


def lang_len_quantiles_cont_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Oracle of stages/sketch.grouped_quantiles_cont over text length per
    lang (explicit per-group rank + interpolation expression)."""
    from .oracles import D, round6

    sel = []
    for q in qs:
        h = f"(n.n - 1) * {D(q)}"
        lo = f"CAST(floor({h}) AS BIGINT)"
        hi = f"least({lo} + 1, n.n - 1)"
        vlo = f"(SELECT CAST(v AS DOUBLE) FROM r WHERE r.lang = n.lang AND rn = {lo})"
        vhi = f"(SELECT CAST(v AS DOUBLE) FROM r WHERE r.lang = n.lang AND rn = {hi})"
        expr = f"{vlo} + ({h} - floor({h})) * ({vhi} - {vlo})"
        sel.append(
            f"SELECT n.lang, CAST({q} AS DOUBLE) AS q, {round6(expr)} AS value FROM n"
        )
    union = " UNION ALL ".join(sel)
    return f"""WITH v AS (SELECT lang, length(text) AS v FROM documents),
r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) - 1 AS rn FROM v),
n AS (SELECT lang, count(*) AS n FROM v GROUP BY lang)
{union}
ORDER BY lang, q"""


def media_decode_real_sql() -> str:
    """Oracle of stages/media.synth_media_table + media_decode_real: the
    payloads' VALUE STREAMS are pure arithmetic (bmp pixel i ->
    (id*31+i*7)%256 over h*w*3 top-down RGB values; wav sample i ->
    (id*17+i*13)%4096-2048), so DuckDB regenerates every decoded value with
    a correlated range unnest and reproduces the order-sensitive checksum
    sum(i*v).  The BMP file layout (bottom-up, BGR, padded rows) is the
    engine side's problem: a decoder that misorders values fails here."""
    return """WITH p AS (
  SELECT doc_id AS media_id,
    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
    CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id % 5) * 4 ELSE 0 END AS width,
    CASE WHEN doc_id % 2 = 0 THEN 6 + (doc_id % 7) * 2 ELSE 0 END AS height,
    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 + (doc_id % 3) * 4000 END AS sample_rate,
    CASE WHEN doc_id % 2 = 0
         THEN (8 + (doc_id % 5) * 4) * (6 + (doc_id % 7) * 2) * 3
         ELSE 400 + (doc_id % 7) * 100 END AS n_units
  FROM documents
), vals AS (
  SELECT p.media_id, p.fmt, p.width, p.height, p.sample_rate, p.n_units, g.i,
    CASE WHEN p.fmt = 'bmp' THEN (p.media_id * 31 + g.i * 7) % 256
         ELSE (p.media_id * 17 + g.i * 13) % 4096 - 2048 END AS v
  FROM p, LATERAL (SELECT unnest(range(0, p.n_units)) AS i) g
)
SELECT media_id, fmt, width, height, sample_rate, n_units,
  CAST(MIN(v) AS BIGINT) AS v_min, CAST(MAX(v) AS BIGINT) AS v_max,
  CAST(SUM(v) AS BIGINT) AS v_sum, CAST(SUM(i * v) AS BIGINT) AS checksum
FROM vals
GROUP BY media_id, fmt, width, height, sample_rate, n_units
ORDER BY media_id"""


def audio_loudness_sql() -> str:
    """Oracle of stages/media.audio_loudness: regenerate each WAV's sample
    stream arithmetically, exact BIGINT sum-of-squares + peak, one round6
    dB float (full scale 2048^2 = 4194304 per sample)."""
    db = (f"{D(10.0)} * log10(CAST(greatest(sum_sq, 1) AS DOUBLE)"
          " / CAST(n_samples * 4194304 AS DOUBLE))")
    return f"""WITH p AS (
  SELECT doc_id AS media_id,
    8000 + (doc_id % 3) * 4000 AS sample_rate,
    400 + (doc_id % 7) * 100 AS n_samples
  FROM documents WHERE doc_id % 2 = 1
), vals AS (
  SELECT p.media_id, p.sample_rate, p.n_samples,
    (p.media_id * 17 + g.i * 13) % 4096 - 2048 AS v
  FROM p, LATERAL (SELECT unnest(range(0, p.n_samples)) AS i) g
), agg AS (
  SELECT media_id, sample_rate, n_samples,
    CAST(MAX(abs(v)) AS BIGINT) AS peak,
    CAST(SUM(v * v) AS BIGINT) AS sum_sq
  FROM vals GROUP BY 1, 2, 3
)
SELECT media_id, CAST(sample_rate AS BIGINT) AS sample_rate,
  CAST(n_samples AS BIGINT) AS n_samples, peak, sum_sq,
  {round6(db)} AS rms_db
FROM agg ORDER BY media_id"""


def media_resize_real_sql(target_w: int = 16, target_h: int = 12) -> str:
    """Oracle of stages/media.media_resize_real: regenerate each BMP's
    source pixel stream by index arithmetic, apply the identical
    nearest-neighbor floor mapping (src_r = out_r * h // H), and aggregate
    the stats of the RESIZED stream — the checksum rejects a gather that
    mis-maps rows, columns or channels."""
    return f"""WITH p AS (
  SELECT doc_id AS media_id,
    8 + (doc_id % 5) * 4 AS w,
    6 + (doc_id % 7) * 2 AS h
  FROM documents WHERE doc_id % 2 = 0
), vals AS (
  SELECT p.media_id, p.w, p.h, g.i,
    ((g.i // {3 * target_w}) * p.h // {target_h} * p.w
      + (g.i // 3) % {target_w} * p.w // {target_w}) * 3 + g.i % 3 AS j
  FROM p, LATERAL (SELECT unnest(range(0, {target_h * target_w * 3})) AS i) g
)
SELECT media_id,
  CAST({target_w} AS BIGINT) AS out_w, CAST({target_h} AS BIGINT) AS out_h,
  CAST(MIN(w) AS BIGINT) AS src_w, CAST(MIN(h) AS BIGINT) AS src_h,
  CAST(count(*) AS BIGINT) AS n_units,
  CAST(SUM((media_id * 31 + j * 7) % 256) AS BIGINT) AS v_sum,
  CAST(SUM(i * ((media_id * 31 + j * 7) % 256)) AS BIGINT) AS checksum
FROM vals
GROUP BY media_id
ORDER BY media_id"""


def audio_resample_real_sql(target_rate: int = media.AUDIO_TARGET_RATE) -> str:
    """Oracle of stages/media.audio_resample_real: all-integer nearest-
    sample rate conversion (src_i = out_i * src_rate // target_rate) over
    the regenerated WAV sample stream."""
    return f"""WITH p AS (
  SELECT doc_id AS media_id,
    8000 + (doc_id % 3) * 4000 AS src_rate,
    400 + (doc_id % 7) * 100 AS n_in
  FROM documents WHERE doc_id % 2 = 1
), vals AS (
  SELECT p.media_id, p.src_rate, p.n_in, g.i,
    g.i * p.src_rate // {target_rate} AS j
  FROM p, LATERAL (
    SELECT unnest(range(0, p.n_in * {target_rate} // p.src_rate)) AS i) g
)
SELECT media_id,
  CAST({target_rate} AS BIGINT) AS target_rate,
  CAST(MIN(src_rate) AS BIGINT) AS src_rate,
  CAST(MIN(n_in) AS BIGINT) AS n_in,
  CAST(count(*) AS BIGINT) AS n_out,
  CAST(SUM((media_id * 17 + j * 13) % 4096 - 2048) AS BIGINT) AS v_sum,
  CAST(SUM(i * ((media_id * 17 + j * 13) % 4096 - 2048)) AS BIGINT) AS checksum
FROM vals
GROUP BY media_id
ORDER BY media_id"""


def neardup_components_sql(threshold: float = 0.7, num_perms: int = 64,
                           shingle_k: int = 5, bands: int = 16,
                           rounds: int = 16) -> str:
    """Oracle of MinHash-LSH near-dup CLUSTERS: the production-parameter
    minhash_pairs SQL (bit-exact HUGEINT twin) as the edge set, then the
    hook+jump min-label recurrence — component = min reachable doc id,
    survivor = the component's min-id doc.  This is the end-to-end dedup
    decision a corpus pipeline acts on (one kept doc per near-dup cluster),
    verified exactly, not just the candidate pairs."""
    pairs_sql = minhash_pairs_tiny_sql(threshold, num_perms, shingle_k, bands)
    chain, prev = hook_jump_chain(rounds)
    return f"""WITH pairs AS MATERIALIZED (
  SELECT a, b FROM ({pairs_sql})
), edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
), l0 AS MATERIALIZED (
  SELECT doc_id AS v, doc_id AS l FROM documents
),
{chain}
SELECT v AS doc_id, l AS component, (l = v) AS is_survivor
FROM {prev}
ORDER BY doc_id"""


def remove_boilerplate_sql(n: int = 5, min_df: int = 2) -> str:
    """Oracle of textops.remove_boilerplate: n-grams via a lead() chain
    (NULL-propagating concat drops incomplete windows), df >= min_df over
    DISTINCT docs, covered positions = frequent-gram starts expanded by
    range(n), anti-join out covered tokens, string_agg rebuild."""
    gram_expr = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER w" for j in range(1, n)]
    )
    return f"""WITH d AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS toks
  FROM documents
), t AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM d
), g AS (
  SELECT doc_id, pos, {gram_expr} AS gram
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), freq AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS c FROM g
    WHERE gram IS NOT NULL GROUP BY gram
  ) WHERE c >= {min_df}
), cov AS (
  SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
  FROM g JOIN freq USING (gram)
  CROSS JOIN (SELECT unnest(range({n})) AS o) o
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM t ANTI JOIN cov ON cov.doc_id = t.doc_id AND cov.pos = t.pos
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS kept FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
  CAST(len(d.toks) - coalesce(a.kept, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""


def gopher_quality_sql() -> str:
    """Oracle of textops.gopher_quality (thresholds from the shared
    constants; `passes` evaluated on the UNROUNDED mean word length in
    both engines)."""
    from ..stages.textops import (
        GOPHER_MAX_MWL, GOPHER_MAX_WORDS, GOPHER_MIN_MWL, GOPHER_MIN_STOPS,
        GOPHER_MIN_WORDS, GOPHER_STOPWORDS,
    )
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""WITH d AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS toks
  FROM documents
), t AS (
  SELECT doc_id, unnest(toks) AS tok FROM d
), sw AS (
  SELECT doc_id, count(DISTINCT tok) AS stop_hits
  FROM t WHERE tok IN ({stops}) GROUP BY doc_id
), m AS (
  SELECT doc_id, len(toks) AS word_count,
    CASE WHEN len(toks) = 0 THEN CAST(0 AS DOUBLE)
         ELSE CAST(list_sum(list_transform(toks, s -> length(s))) AS DOUBLE)
              / len(toks) END AS mwl
  FROM d
)
SELECT m.doc_id, CAST(m.word_count AS BIGINT) AS word_count,
  {round6('m.mwl')} AS mean_word_len,
  CAST(coalesce(sw.stop_hits, 0) AS BIGINT) AS stop_hits,
  (m.word_count >= {GOPHER_MIN_WORDS} AND m.word_count <= {GOPHER_MAX_WORDS}
   AND m.mwl >= CAST({GOPHER_MIN_MWL} AS DOUBLE)
   AND m.mwl <= CAST({GOPHER_MAX_MWL} AS DOUBLE)
   AND coalesce(sw.stop_hits, 0) >= {GOPHER_MIN_STOPS}) AS passes
FROM m LEFT JOIN sw USING (doc_id)
ORDER BY m.doc_id"""


def semantic_dedup_sql(threshold: float, rounds: int = 16) -> str:
    """Oracle of SemDeDup (semantic near-dup clusters): the exact
    embedding_neardup pair SQL as the edge set, hook+jump components,
    survivor = min vec_id per cluster."""
    pairs_sql = embedding_neardup_sql(threshold)
    chain, prev = hook_jump_chain(rounds)
    return f"""WITH pairs AS MATERIALIZED (
  SELECT a, b FROM ({pairs_sql})
), edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
), l0 AS MATERIALIZED (
  SELECT vec_id AS v, vec_id AS l FROM embeddings
),
{chain}
SELECT v AS vec_id, l AS component, (l = v) AS is_survivor
FROM {prev}
ORDER BY vec_id"""


def quality_resample_sql(ppm_per_word: int, mult: int, mod: int) -> str:
    """Oracle of gridops.quality_resample over documents (word count from
    the shared empty-filtered whitespace tokenization)."""
    return f"""WITH d AS (
  SELECT doc_id, text, lang,
    len(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '')) AS wc
  FROM documents
), p AS (
  SELECT *, least({mod}, wc * {ppm_per_word}) AS keep_ppm FROM d
)
SELECT doc_id, text, lang, CAST(keep_ppm AS BIGINT) AS keep_ppm
FROM p
WHERE ((doc_id % {mod}) * ({mult} % {mod})) % {mod} < keep_ppm
ORDER BY doc_id"""


def tpch_q5_sql() -> str:
    """Oracle of stages/relagg.tpch_q5 (6-table local-supplier volume,
    exact integer cents per row before summation)."""
    from ..stages import relagg

    return f"""SELECT n_name,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{relagg.Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{relagg.Q5_START} 00:00:00'
  AND o_orderdate < TIMESTAMP '{relagg.Q5_END} 00:00:00'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name"""


def tpch_q6_sql() -> str:
    """Oracle of stages/relagg.tpch_q6 (filtered aggregate, exact cents)."""
    from ..stages import relagg

    return f"""SELECT
  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT))
       AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{relagg.Q6_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{relagg.Q6_END} 00:00:00'
  AND l_discount >= {relagg.Q6_DISC_LO} AND l_discount <= {relagg.Q6_DISC_HI}
  AND l_quantity < {relagg.Q6_MAX_QTY}"""


def latest_capture_sql(replicate: int = 3) -> str:
    """Oracle of stages/extract.latest_capture over read_pages(replicate):
    DISTINCT ON (url) keeping the max-warc_ts row; text carried verbatim so
    the value-hash proves byte identity through the dedup."""
    from .oracles import pages_replicated_cte

    return f"""WITH {pages_replicated_cte(replicate)},
ranked AS (
  SELECT url, page_id, warc_ts, text,
    row_number() OVER (PARTITION BY url
                       ORDER BY warc_ts DESC, page_id DESC) AS rn
  FROM pages_rep
)
SELECT url, page_id, warc_ts, text
FROM ranked WHERE rn = 1
ORDER BY url"""


def linear_probe_sql() -> str:
    """Oracle of sketch.linear_probe: exact integer moments, then the
    IDENTICAL float expression tree (same associativity) for slope /
    intercept / R², rounded with the canonical floor(x*1e6+0.5)/1e6."""
    from .oracles import round6

    n_tokens = _re_count("text", textstats.TOKEN_RE)
    return f"""WITH raw AS (
  SELECT length(text) AS y, {n_tokens} AS x FROM documents
), f AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy,
    CAST(sum(y * y) AS DOUBLE) AS syy
  FROM raw
), g AS (
  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b FROM f
), h AS (
  SELECT *, (sy - b * sx) / n AS a FROM g
)
SELECT CAST(n AS BIGINT) AS n_docs,
  {round6('b')} AS slope,
  {round6('a')} AS intercept,
  {round6('1.0 - (syy - a * sy - b * sxy) / (syy - sy * sy / n)')} AS r2
FROM h"""


def grouped_linear_probe_sql() -> str:
    """Oracle of sketch.grouped_linear_probe: per-language exact moments,
    identical per-group float tree as linear_probe_sql."""
    from .oracles import round6

    n_tokens = _re_count("text", textstats.TOKEN_RE)
    return f"""WITH raw AS (
  SELECT lang, length(text) AS y, {n_tokens} AS x FROM documents
), f AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy,
    CAST(sum(y * y) AS DOUBLE) AS syy
  FROM raw GROUP BY lang
), g AS (
  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b FROM f
), h AS (
  SELECT *, (sy - b * sx) / n AS a FROM g
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
  {round6('b')} AS slope,
  {round6('a')} AS intercept,
  {round6('1.0 - (syy - a * sy - b * sxy) / (syy - sy * sy / n)')} AS r2
FROM h
ORDER BY lang"""


def dedup_recall_sql(threshold: float = 0.5) -> str:
    """Oracle of the dedup-evaluation query: MinHash-LSH candidates (tiny
    bit-exact params) scored against exact word-set Jaccard >= threshold
    ground truth — counts + floor-rounded recall/precision."""
    mh_sql = minhash_pairs_tiny_sql(threshold, 4, 3, 2)
    ex_sql = jaccard_pairs_sql(threshold)
    return f"""WITH mh AS MATERIALIZED (
  SELECT a, b FROM ({mh_sql})
), ex AS MATERIALIZED (
  SELECT a, b FROM ({ex_sql})
), c AS (
  SELECT
    CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_true,
    CAST((SELECT count(*) FROM mh) AS BIGINT) AS n_candidates,
    CAST((SELECT count(*) FROM mh JOIN ex USING (a, b)) AS BIGINT) AS n_hit
)
SELECT n_true, n_candidates, n_hit,
  CASE WHEN n_true = 0 THEN 0.0
       ELSE floor(CAST(n_hit AS DOUBLE) / n_true * 1000000 + 0.5) / 1000000
  END AS recall,
  CASE WHEN n_candidates = 0 THEN 0.0
       ELSE floor(CAST(n_hit AS DOUBLE) / n_candidates * 1000000 + 0.5)
            / 1000000 END AS precision
FROM c"""


def _bpe_chain(rounds: int) -> str:
    """The shared BPE-training CTE chain: word-type histogram ``w0`` plus
    ``rounds`` unrolled merge supersteps ending in ``b{r}`` (the round's
    winning pair) and ``w{r}`` (the merged type table)."""
    steps = []
    prev = "w0"
    for r in range(1, rounds + 1):
        steps.append(f"""t{r} AS (
  SELECT word, cnt,
    unnest(string_split(seq, ' ')) AS sym,
    unnest(range(len(string_split(seq, ' ')))) AS pos
  FROM {prev}
), q{r} AS (
  SELECT cnt, sym AS s1, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS s2
  FROM t{r}
), a{r} AS MATERIALIZED (
  SELECT s1, s2, CAST(sum(cnt) AS BIGINT) AS total
  FROM q{r} WHERE s2 IS NOT NULL GROUP BY s1, s2
), b{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS rank, s1, s2, s1 || s2 AS merged, total
  FROM a{r} ORDER BY total DESC, s1, s2 LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT word, cnt,
    trim(replace(' ' || seq || ' ',
                 coalesce((SELECT ' ' || s1 || ' ' || s2 || ' ' FROM b{r}),
                          '  '),
                 coalesce((SELECT ' ' || merged || ' ' FROM b{r}),
                          '  '))) AS seq
  FROM {prev}
)""")
        prev = f"w{r}"
    chain = ",\n".join(steps)
    return f"""toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            s -> s != '')) AS word
  FROM documents
), w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
    array_to_string(string_split(word, ''), ' ') AS seq
  FROM toks GROUP BY word
),
{chain}"""


def bpe_merges_sql(rounds: int | None = None) -> str:
    """Oracle of stages/lm.bpe_merges: the word-type histogram, then
    ``rounds`` unrolled merge supersteps — lead-chain adjacent-pair counts,
    (total DESC, s1, s2) argmax, sentinel-space ``replace`` application
    (DuckDB replace == Python str.replace, left-to-right non-overlapping,
    so the loop is bit-exact cross-engine)."""
    from ..stages import lm

    rounds = lm.BPE_ROUNDS if rounds is None else rounds
    union = "\nUNION ALL\n".join(
        f"SELECT rank, s1, s2, merged, total FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return f"""WITH {_bpe_chain(rounds)}
SELECT rank, s1 AS left_sym, s2 AS right_sym, merged,
  CAST(total AS BIGINT) AS pair_count
FROM ({union})
ORDER BY rank"""


def bpe_tokenize_sql(rounds: int | None = None) -> str:
    """Oracle of stages/lm.bpe_tokenize: the learned merges (the shared
    chain's b1..bN) applied in rank order to every document's words via
    the same sentinel-space nested replace; token count per word = spaces
    in the final sequence minus one; zero for empty documents."""
    from ..stages import lm

    rounds = lm.BPE_ROUNDS if rounds is None else rounds
    expr = "' ' || array_to_string(string_split(word, ''), ' ') || ' '"
    for r in range(1, rounds + 1):
        # empty b{r} (merges exhausted early): coalesce to the '  ' no-op
        # pattern — sequences are single-spaced, so nothing matches and
        # NULL never wipes the whole column
        expr = (f"replace({expr}, "
                f"coalesce((SELECT ' ' || s1 || ' ' || s2 || ' ' FROM b{r}),"
                f" '  '), "
                f"coalesce((SELECT ' ' || merged || ' ' FROM b{r}), '  '))")
    return f"""WITH {_bpe_chain(rounds)},
dtok AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                       s -> s != '')) AS word
  FROM documents
), applied AS (
  SELECT doc_id, {expr} AS s FROM dtok
), per_doc AS (
  SELECT doc_id,
    CAST(sum(length(s) - length(replace(s, ' ', '')) - 1) AS BIGINT) AS n
  FROM applied GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id"""


def ccnet_buckets_sql() -> str:
    """Oracle of stages/lm.ccnet_buckets: the lm_score oracle as a
    subquery, exact tercile thresholds at rank floor((n-1)*q) over the
    sorted score multiset, value-comparison bucket labels."""
    lm_sql = lm_score_sql()
    return f"""WITH s AS MATERIALIZED (
  SELECT doc_id, score_fp FROM ({lm_sql})
), ranked AS (
  SELECT score_fp,
    row_number() OVER (ORDER BY score_fp) - 1 AS rk,
    count(*) OVER () AS n
  FROM s
), th AS (
  SELECT
    (SELECT score_fp FROM ranked
     WHERE rk = CAST(floor((n - 1) * (1.0/3.0)) AS BIGINT) LIMIT 1) AS t1,
    (SELECT score_fp FROM ranked
     WHERE rk = CAST(floor((n - 1) * (2.0/3.0)) AS BIGINT) LIMIT 1) AS t2
)
SELECT s.doc_id, s.score_fp,
  CASE WHEN s.score_fp > th.t2 THEN 'head'
       WHEN s.score_fp > th.t1 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM s, th
ORDER BY s.doc_id"""


def incremental_dedup_sql() -> str:
    """Oracle of textops.incremental_dedup with the driver split: prior
    snapshot = even doc_ids, new increment = odd doc_ids; keep new rows
    whose md5(text) is absent from the prior corpus."""
    return """WITH newd AS (
  SELECT doc_id, md5(text) AS text_md5 FROM documents WHERE doc_id % 2 = 1
), prior AS (
  SELECT DISTINCT md5(text) AS m FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, text_md5
FROM newd
WHERE text_md5 NOT IN (SELECT m FROM prior)
ORDER BY doc_id"""


def mixture_sample_sql(mult: int, mod: int) -> str:
    """Oracle of gridops.mixture_sample: per-source counts -> integer
    acceptance ppm (rational once the float64-argmax reference group is
    fixed) -> the shared modular-hash filter."""
    return f"""WITH n AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
), w AS (
  SELECT source, n_s, CAST(substr(source, 4) AS BIGINT) + 1 AS w_s FROM n
), m AS (
  SELECT n_s AS n_m, w_s AS w_m FROM w
  ORDER BY (CAST(w_s AS DOUBLE) / n_s) DESC, source ASC LIMIT 1
), r AS (
  SELECT source,
    CAST((1000000 * w_s * (SELECT n_m FROM m))
         // (n_s * (SELECT w_m FROM m)) AS BIGINT) AS keep_ppm
  FROM w
)
SELECT d.doc_id, d.source, r.keep_ppm
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id % {mod}) * ({mult} % {mod})) % {mod} < r.keep_ppm
ORDER BY d.doc_id"""


def tpch_q4_sql() -> str:
    """Oracle of stages/relagg.tpch_q4 (late-shipment EXISTS semi-join,
    distinct-order count per priority)."""
    from ..stages import relagg

    return f"""SELECT o_orderpriority,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '{relagg.Q4_START} 00:00:00'
  AND o_orderdate < TIMESTAMP '{relagg.Q4_END} 00:00:00'
  AND l_shipdate >= o_orderdate + INTERVAL {relagg.Q4_LATE_DAYS} DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def tpch_q12_sql() -> str:
    """Oracle of stages/relagg.tpch_q12 (conditional high/low priority
    line counts per returnflag over one ship year)."""
    from ..stages import relagg

    hi = ", ".join(f"'{p}'" for p in relagg.Q12_HIGH)
    return f"""SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 0 ELSE 1 END) AS BIGINT)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{relagg.Q12_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{relagg.Q12_END} 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag"""


def tpch_q14_sql() -> str:
    """Oracle of stages/relagg.tpch_q14 (promo revenue share; the one float
    uses the shared floor(x*1e6+0.5)/1e6 rounding on the identical
    100.0 * promo / total expression tree)."""
    from ..stages import relagg

    return f"""WITH c AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS cents,
    (p_type = '{relagg.Q14_PROMO}') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{relagg.Q14_START} 00:00:00'
    AND l_shipdate < TIMESTAMP '{relagg.Q14_END} 00:00:00'
), s AS (
  SELECT CAST(coalesce(sum(CASE WHEN is_promo THEN cents ELSE 0 END), 0)
              AS BIGINT) AS promo_cents,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents
  FROM c
)
SELECT promo_cents, total_cents,
  CASE WHEN total_cents = 0 THEN 0.0
       ELSE floor(100.0 * promo_cents / total_cents * 1000000 + 0.5)
            / 1000000 END AS promo_pct
FROM s"""


def tpch_q10_sql() -> str:
    """Oracle of stages/relagg.tpch_q10 (returned-item revenue top-k
    customers, exact integer cents, (revenue DESC, custkey) tiebreak)."""
    from ..stages import relagg

    return f"""WITH rev AS (
  SELECT o_custkey,
    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{relagg.Q10_START} 00:00:00'
    AND o_orderdate < TIMESTAMP '{relagg.Q10_END} 00:00:00'
  GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, r.revenue_cents, c.c_acctbal, n.n_name,
  CAST(row_number() OVER (ORDER BY r.revenue_cents DESC, c.c_custkey)
       AS BIGINT) AS rank
FROM rev r
JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_cents DESC, c.c_custkey
LIMIT {relagg.Q10_K}"""


def curate_corpus_sql(n: int = 5, min_df: int = 2, ppm_per_word: int = 5000,
                      mult: int | None = None, mod: int | None = None) -> str:
    """Oracle of textops.curate_corpus: dedup -> scrub (df over survivors)
    -> Gopher rules on the CLEANED tokens -> deterministic length-
    proportional resample.  Kept tokens double as the clean token list, so
    the Gopher metrics come straight from the ``kept`` CTE."""
    from ..stages.gridops import SAMPLE_MOD, SAMPLE_MULT
    from ..stages.textops import (
        GOPHER_MAX_MWL, GOPHER_MAX_WORDS, GOPHER_MIN_MWL, GOPHER_MIN_STOPS,
        GOPHER_MIN_WORDS, GOPHER_STOPWORDS,
    )

    mult = SAMPLE_MULT if mult is None else mult
    mod = SAMPLE_MOD if mod is None else mod
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    gram_expr = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER w" for j in range(1, n)]
    )
    return f"""WITH surv AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), src AS (
  SELECT d.doc_id, d.text FROM documents d JOIN surv USING (doc_id)
), dt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS toks
  FROM src
), t AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM dt
), g AS (
  SELECT doc_id, pos, {gram_expr} AS gram
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), freq AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS c FROM g
    WHERE gram IS NOT NULL GROUP BY gram
  ) WHERE c >= {min_df}
), cov AS (
  SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
  FROM g JOIN freq USING (gram)
  CROSS JOIN (SELECT unnest(range({n})) AS o) o
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM t ANTI JOIN cov ON cov.doc_id = t.doc_id AND cov.pos = t.pos
), m AS (
  SELECT doc_id,
    string_agg(tok, ' ' ORDER BY pos) AS clean_text,
    count(*) AS wc,
    CAST(sum(length(tok)) AS DOUBLE) / count(*) AS mwl,
    count(DISTINCT CASE WHEN tok IN ({stops}) THEN tok END) AS stop_hits
  FROM kept GROUP BY doc_id
)
SELECT doc_id, clean_text, CAST(wc AS BIGINT) AS word_count
FROM m
WHERE wc >= {GOPHER_MIN_WORDS} AND wc <= {GOPHER_MAX_WORDS}
  AND mwl >= CAST({GOPHER_MIN_MWL} AS DOUBLE) AND mwl <= CAST({GOPHER_MAX_MWL} AS DOUBLE)
  AND stop_hits >= {GOPHER_MIN_STOPS}
  AND ((doc_id % {mod}) * ({mult} % {mod})) % {mod} < least({mod}, wc * {ppm_per_word})
ORDER BY doc_id"""


def host_quality_sql(level: str = "host") -> str:
    """Oracle of textops.host_quality: per-domain Gopher pass-rate gating
    (blocked computed on the UNROUNDED rate in both engines)."""
    from .oracles import pages_cte
    from ..stages.textops import (
        GOPHER_MAX_MWL, GOPHER_MAX_WORDS, GOPHER_MIN_MWL, GOPHER_MIN_STOPS,
        GOPHER_MIN_WORDS, GOPHER_STOPWORDS, HOST_MIN_PAGES, HOST_MIN_PASS_RATE,
    )
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    host_expr = "string_split(url, '/')[3]"
    if level == "tld":
        host_expr = "string_split(string_split(url, '/')[3], '.')[-1]"
    return f"""WITH {pages_cte()}, d AS (
  SELECT page_id, {host_expr} AS host,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS toks
  FROM pages
), t AS (
  SELECT page_id, unnest(toks) AS tok FROM d
), sw AS (
  SELECT page_id, count(DISTINCT tok) AS stop_hits
  FROM t WHERE tok IN ({stops}) GROUP BY page_id
), m AS (
  SELECT d.page_id, d.host, len(toks) AS wc,
    CASE WHEN len(toks) = 0 THEN CAST(0 AS DOUBLE)
         ELSE CAST(list_sum(list_transform(toks, s -> length(s))) AS DOUBLE)
              / len(toks) END AS mwl,
    coalesce(sw.stop_hits, 0) AS stop_hits
  FROM d LEFT JOIN sw USING (page_id)
), flags AS (
  SELECT host,
    CASE WHEN wc >= {GOPHER_MIN_WORDS} AND wc <= {GOPHER_MAX_WORDS}
          AND mwl >= CAST({GOPHER_MIN_MWL} AS DOUBLE)
          AND mwl <= CAST({GOPHER_MAX_MWL} AS DOUBLE)
          AND stop_hits >= {GOPHER_MIN_STOPS}
         THEN 1 ELSE 0 END AS pass
  FROM m
), h AS (
  SELECT host, count(*) AS n_pages, sum(pass) AS n_pass,
    CAST(sum(pass) AS DOUBLE) / count(*) AS rate
  FROM flags GROUP BY host
)
SELECT host, CAST(n_pages AS BIGINT) AS n_pages, CAST(n_pass AS BIGINT) AS n_pass,
  {round6('rate')} AS pass_rate,
  (n_pages >= {HOST_MIN_PAGES} AND rate < {D(HOST_MIN_PASS_RATE)}) AS blocked
FROM h
ORDER BY host"""


def cross_correlation_sql(types: tuple[str, str] | None = None,
                          max_lag: int | None = None) -> str:
    """Oracle of stages/events.cross_correlation: dense two-type hourly
    series over the types' own hour range, per-lag HUGEINT moments, the
    identical sqrt float tree, round6."""
    from ..stages import events
    from .oracles import round6

    ta, tb = events.XCORR_TYPES if types is None else types
    L = events.XCORR_MAX_LAG if max_lag is None else max_lag
    tree = ("CAST(m * sab - sa * sb AS DOUBLE)"
            " / (sqrt(CAST(m * saa - sa * sa AS DOUBLE))"
            " * sqrt(CAST(m * sbb - sb * sb AS DOUBLE)))")
    return f"""WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr
  FROM events WHERE event_type IN ('{ta}', '{tb}')
), h AS (
  SELECT hr,
    CAST(sum(CASE WHEN event_type = '{ta}' THEN 1 ELSE 0 END) AS BIGINT)
      AS a,
    CAST(sum(CASE WHEN event_type = '{tb}' THEN 1 ELSE 0 END) AS BIGINT)
      AS b
  FROM ev GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.a, 0) AS BIGINT) AS a,
    CAST(coalesce(h.b, 0) AS BIGINT) AS b
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), lags AS (
  SELECT unnest(range(-{L}, {L + 1})) AS lag
), pr AS (
  SELECT l.lag, x.a AS ax, y.b AS bx
  FROM lags l
  JOIN dense x ON true
  JOIN dense y ON y.hr = x.hr + l.lag
), mom AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS m,
    CAST(sum(ax) AS HUGEINT) AS sa, CAST(sum(bx) AS HUGEINT) AS sb,
    CAST(sum(CAST(ax AS HUGEINT) * bx) AS HUGEINT) AS sab,
    CAST(sum(CAST(ax AS HUGEINT) * ax) AS HUGEINT) AS saa,
    CAST(sum(CAST(bx AS HUGEINT) * bx) AS HUGEINT) AS sbb
  FROM pr GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(m AS BIGINT) AS m,
  CASE WHEN m = 0 OR m * saa - sa * sa = 0 OR m * sbb - sb * sb = 0
       THEN 0.0 ELSE {round6(tree)} END AS corr
FROM mom ORDER BY lag"""


def seasonality_profile_sql() -> str:
    """Oracle of stages/events.seasonality_profile: dense hourly series,
    hour-of-day rollup, exact integer floor-division means."""
    return """WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), p AS (
  SELECT hr % 24 AS how, CAST(count(*) AS BIGINT) AS n_hours,
    CAST(sum(x) AS BIGINT) AS cnt_sum
  FROM dense GROUP BY 1
)
SELECT CAST(d.how AS BIGINT) AS how,
  CAST(coalesce(p.n_hours, 0) AS BIGINT) AS n_hours,
  CAST(coalesce(p.cnt_sum, 0) AS BIGINT) AS cnt_sum,
  CAST(CASE WHEN coalesce(p.n_hours, 0) > 0
       THEN (p.cnt_sum * 1000000) // p.n_hours ELSE 0 END AS BIGINT)
    AS mean_micro
FROM (SELECT unnest(range(24)) AS how) d
LEFT JOIN p ON p.how = d.how
ORDER BY how"""


def km_survival_sql(conv_type: str | None = None) -> str:
    """Oracle of stages/events.km_survival: time to first conversion per
    user (never-converters censored at their last event),
    reverse-cumulative risk sets, correlated list_reduce prefix product
    (identical left-assoc fold), round6."""
    from ..stages import events
    from .oracles import round6

    ct = events.KM_CONV_TYPE if conv_type is None else conv_type
    return f"""WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
), u AS (
  SELECT user_id, min(t) AS f, max(t) AS l,
    min(CASE WHEN event_type = '{ct}' THEN t END) AS fc
  FROM ev GROUP BY 1
), d AS (
  SELECT (coalesce(u.fc, u.l) - u.f) // 3600000000 AS t,
    CASE WHEN u.fc IS NULL THEN 1 ELSE 0 END AS c
  FROM u
), km0 AS (
  SELECT t, CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS deaths,
    CAST(count(*) AS BIGINT) AS total
  FROM d GROUP BY t
), km1 AS (
  SELECT t, deaths,
    CAST(sum(total) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
  FROM km0
), km AS MATERIALIZED (
  SELECT t, n_risk, deaths AS n_events FROM km1 WHERE deaths > 0
)
SELECT km.t, km.n_risk, km.n_events,
  {round6('(SELECT list_reduce('
          'list(1.0 - CAST(k2.n_events AS DOUBLE) / k2.n_risk '
          'ORDER BY k2.t), (a, b) -> a * b) '
          'FROM km k2 WHERE k2.t <= km.t)')} AS surv
FROM km ORDER BY t"""


def als_rank1_sql(sweeps: int | None = None, uscale: int | None = None,
                  vscale: int | None = None) -> str:
    """Oracle of stages/events.als_rank1: the same K rank-1 ALS sweeps
    unrolled as CTEs in HUGEINT — user half-step, item half-step, ceil
    renorm — every division an exact nonneg floor (``//``)."""
    from ..stages import events

    k = events.ALS_SWEEPS if sweeps is None else sweeps
    us = events.ALS_USCALE if uscale is None else uscale
    vs = events.ALS_VSCALE if vscale is None else vscale
    steps = []
    prev = "v0"
    for i in range(1, k + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
  SELECT sum(v * v) AS den FROM {prev}
), u{i} AS MATERIALIZED (
  SELECT r.user_id,
    (sum(CAST(r.r AS HUGEINT) * p.v) * {us}) // max(d{i}.den) AS u
  FROM r JOIN {prev} p USING (event_type), d{i}
  GROUP BY r.user_id
), s{i} AS MATERIALIZED (
  SELECT sum(u * u) AS u2 FROM u{i}
), w{i} AS MATERIALIZED (
  SELECT r.event_type,
    (sum(CAST(r.r AS HUGEINT) * u{i}.u) * {vs}) // max(s{i}.u2) AS v
  FROM r JOIN u{i} USING (user_id), s{i}
  GROUP BY r.event_type
), m{i} AS MATERIALIZED (
  SELECT GREATEST(CAST(1 AS HUGEINT),
    ((SELECT max(v) FROM w{i}) + {vs} - 1) // {vs}) AS d
), v{i} AS MATERIALIZED (
  SELECT event_type, v // d AS v FROM w{i}, m{i}
)""")
        prev = f"v{i}"
    chain = ",\n".join(steps)
    return f"""WITH ev AS (
  SELECT user_id, event_type,
    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
), r AS MATERIALIZED (
  SELECT user_id, event_type, CAST(sum(cents) AS BIGINT) AS r
  FROM ev GROUP BY 1, 2
), v0 AS (
  SELECT DISTINCT event_type, CAST({vs} AS HUGEINT) AS v FROM r
),
{chain}
SELECT event_type, CAST(v AS BIGINT) AS v FROM {prev}
ORDER BY event_type"""


def benford_deviation_sql() -> str:
    """Oracle of stages/sketch.benford_deviation: first digit via the
    decimal string head (== the engine's repeated integer division),
    expectation/chi2 with the identical float tree, round6."""
    from .oracles import round6

    e = "(n.n * log10(1.0 + 1.0 / d.digit))"
    chi2 = (f"(CAST(coalesce(h.obs, 0) AS DOUBLE) - {e})"
            f" * (CAST(coalesce(h.obs, 0) AS DOUBLE) - {e}) / {e}")
    return f"""WITH ev AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events
), pos AS (
  SELECT cents FROM ev WHERE cents > 0
), h AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
    CAST(count(*) AS BIGINT) AS obs
  FROM pos GROUP BY 1
), d AS (
  SELECT unnest(range(1, 10)) AS digit
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM pos
)
SELECT CAST(d.digit AS BIGINT) AS digit,
  CAST(coalesce(h.obs, 0) AS BIGINT) AS obs,
  CAST(floor({e} * 1000000.0 + 0.5) AS BIGINT) AS exp_micro,
  {round6(chi2)} AS chi2_contrib
FROM d LEFT JOIN h ON h.digit = d.digit, n
ORDER BY digit"""


def cuped_lift_sql() -> str:
    """Oracle of stages/events.cuped_lift: same midpoint split, exact
    HUGEINT moments, and the IDENTICAL float expression tree for theta /
    xbar / adjusted means, round6 outputs."""
    from ..stages import events
    from .oracles import round6

    mult, mod = events.AB_MULT, events.AB_MOD
    theta = ("CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0 ELSE "
             "CAST(n * sxy - sx * sy AS DOUBLE)"
             " / CAST(n * sxx - sx * sx AS DOUBLE) END")
    return f"""WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t,
    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT (min(t) + max(t)) // 2 AS mid FROM ev
), pu AS (
  SELECT user_id,
    CAST(sum(CASE WHEN t < mid THEN cents ELSE 0 END) AS BIGINT) AS x,
    CAST(sum(CASE WHEN t >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
  FROM ev, m GROUP BY user_id
), a AS (
  SELECT (((user_id % {mod}) * ({mult % mod})) % {mod}) % 2 AS arm,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM pu GROUP BY 1
), s AS (
  SELECT
    (SELECT n FROM a WHERE arm = 0) AS n_a,
    (SELECT n FROM a WHERE arm = 1) AS n_b,
    (SELECT sx FROM a WHERE arm = 0) AS sx_a,
    (SELECT sx FROM a WHERE arm = 1) AS sx_b,
    (SELECT sy FROM a WHERE arm = 0) AS sy_a,
    (SELECT sy FROM a WHERE arm = 1) AS sy_b,
    sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
    sum(sxx) AS sxx, sum(sxy) AS sxy
  FROM a
), f AS (
  SELECT n_a, n_b, sx_a, sx_b, sy_a, sy_b,
    {theta} AS theta,
    CAST(sx AS DOUBLE) / n AS xbar
  FROM s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  {round6('theta')} AS theta,
  {round6('CAST(sy_a AS DOUBLE) / n_a')} AS mean_raw_a,
  {round6('CAST(sy_b AS DOUBLE) / n_b')} AS mean_raw_b,
  {round6('(CAST(sy_a AS DOUBLE) - theta * (CAST(sx_a AS DOUBLE) - n_a * xbar)) / n_a')} AS mean_adj_a,
  {round6('(CAST(sy_b AS DOUBLE) - theta * (CAST(sx_b AS DOUBLE) - n_b * xbar)) / n_b')} AS mean_adj_b,
  {round6('((CAST(sy_b AS DOUBLE) - theta * (CAST(sx_b AS DOUBLE) - n_b * xbar)) / n_b) - ((CAST(sy_a AS DOUBLE) - theta * (CAST(sx_a AS DOUBLE) - n_a * xbar)) / n_a)')} AS lift_adj
FROM f"""


def ab_lift_sql(conv_type: str = "purchase") -> str:
    """Oracle of events.ab_lift (pooled two-proportion z, arm = sample
    hash % 2; float expressions mirror the numpy order)."""
    from ..stages.events import AB_CONV_VALUE, AB_MOD, AB_MULT

    return f"""WITH u AS (
  SELECT user_id,
    max(CASE WHEN event_type = '{conv_type}'
              AND value > {D(AB_CONV_VALUE)} THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), armed AS (
  SELECT ((user_id % {AB_MOD}) * ({AB_MULT} % {AB_MOD})) % {AB_MOD} % 2 AS arm, conv
  FROM u
), s AS (
  SELECT
    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS ca,
    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS cb
  FROM armed
), p AS (
  SELECT na, nb, ca, cb,
    CAST(ca AS DOUBLE) / na AS pa, CAST(cb AS DOUBLE) / nb AS pb,
    CAST(ca + cb AS DOUBLE) / (na + nb) AS pool
  FROM s
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
  {round6('pa')} AS rate_a, {round6('pb')} AS rate_b,
  {round6('CASE WHEN pa > 0 THEN pb / pa - 1.0 ELSE CAST(0 AS DOUBLE) END')} AS lift,
  {round6("CASE WHEN pool > 0 AND pool < 1"
          " THEN (pb - pa) / sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))"
          " ELSE CAST(0 AS DOUBLE) END")} AS z_score
FROM p"""


def bigram_pmi_sql(min_pair: int | None = None) -> str:
    """Oracle of textops.bigram_pmi (PMI of consecutive token pairs)."""
    from ..stages.textops import PMI_MIN_PAIR

    min_pair = PMI_MIN_PAIR if min_pair is None else min_pair
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS total FROM toks
), bg AS (
  SELECT t1.tok AS w1, t2.tok AS w2, CAST(count(*) AS BIGINT) AS pair_count
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  GROUP BY 1, 2
  HAVING count(*) >= {min_pair}
)
SELECT bg.w1, bg.w2, bg.pair_count,
  {round6('ln((CAST(bg.pair_count AS DOUBLE) * n.total)'
          ' / (CAST(u1.cnt AS DOUBLE) * CAST(u2.cnt AS DOUBLE)))')} AS pmi
FROM bg
JOIN uni u1 ON u1.tok = bg.w1
JOIN uni u2 ON u2.tok = bg.w2
CROSS JOIN n
ORDER BY bg.w1, bg.w2"""


def tpch_q13_sql() -> str:
    """Oracle of stages/relagg.tpch_q13 (customer order-count distribution;
    the LEFT JOIN surfaces the zero bucket the engine derives
    arithmetically)."""
    return """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""


def tpch_q17_sql() -> str:
    """Oracle of stages/relagg.tpch_q17 (small-quantity-order revenue for
    one brand; the correlated-average threshold is the engine's exact
    integer rewrite qty_centi * cnt * 5 < sum_centi * 100, so summation
    order cannot matter)."""
    from ..stages import relagg

    return f"""WITH bl AS (
  SELECT l_partkey,
    CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{relagg.Q17_BRAND}'
), st AS (
  SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS sum_qc,
         CAST(count(*) AS BIGINT) AS cnt
  FROM bl GROUP BY l_partkey
), q AS (
  SELECT bl.cents FROM bl JOIN st USING (l_partkey)
  WHERE bl.qc * st.cnt * 5 < st.sum_qc * 100
)
SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
FROM q"""


def tpch_q18_sql() -> str:
    """Oracle of stages/relagg.tpch_q18 (large-volume customers: HAVING
    semi-join back into orders, top-k by (o_totalprice DESC, o_orderkey);
    sum_qty re-derived from the exact x100 integer sum)."""
    from ..stages import relagg

    return f"""WITH pq AS (
  SELECT l_orderkey, CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS sum_qc
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
         > {int(relagg.Q18_MIN_QTY) * 100}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       pq.sum_qc / 100.0 AS sum_qty,
       CAST(row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey)
            AS BIGINT) AS rank
FROM pq
JOIN orders o ON pq.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT {relagg.Q18_K}"""


def tpch_q22_sql() -> str:
    """Oracle of stages/relagg.tpch_q22 (dormant above-average-balance
    customers per nation; the above-average predicate is the engine's
    exact integer rewrite bal_centi * cnt > sum_centi)."""
    from ..stages import relagg

    return f"""WITH bc AS (
  SELECT c_custkey, c_nationkey,
    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
  FROM customer
), avgpos AS (
  SELECT CAST(sum(bal_cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM bc WHERE bal_cents > 0
), dormant AS (
  SELECT bc.c_nationkey, bc.bal_cents
  FROM bc, avgpos
  WHERE bc.bal_cents * avgpos.n > avgpos.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = bc.c_custkey
        AND o.o_orderdate >= TIMESTAMP '{relagg.Q22_CUTOFF} 00:00:00'
    )
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM dormant
GROUP BY c_nationkey
ORDER BY c_nationkey"""


def passage_dedup_sql(w: int | None = None) -> str:
    """Oracle of stages/textops.passage_dedup: non-overlapping ``w``-token
    windows per doc (tail dropped), passage identity = splitmix64(rolling
    FNV fold) of the space-joined window — the IDENTICAL uint64 hash the
    engine computes (``functions.hashing.poly_hash64``), wrapped per step in
    HUGEINT, so a hash collision cannot diverge the two sides.  Same ASCII
    codepoints-vs-bytes caveat as simhash_pairs_fnv_sql."""
    if w is None:
        from ..stages.textops import PASSAGE_W as w
    fold = (f"list_reduce(list_transform(string_split(win, ''), "
            f"c -> ascii(c)::HUGEINT), "
            f"(h, b) -> ((h * {_FNV}) % {_M64} + b) % {_M64})")
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), win AS (
  SELECT doc_id,
    array_to_string(l[(i * {w} + 1):((i + 1) * {w})], ' ') AS win
  FROM (SELECT doc_id, l, unnest(range(len(l) // {w})) AS i FROM lt)
), p0 AS (
  SELECT doc_id, {fold} AS h0 FROM win
), z1 AS (
  SELECT doc_id, (h0 + 11400714819323198485) % {_M64} AS z1 FROM p0
), z2 AS (
  SELECT doc_id, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT doc_id, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), th AS (
  SELECT doc_id, CAST(xor(z3, z3 >> 31) AS UBIGINT) AS h FROM z3
), c AS (
  SELECT doc_id, h, CAST(count(*) AS BIGINT) AS cnt FROM th GROUP BY doc_id, h
), dp AS (
  SELECT h, count(*) AS n_docs FROM c GROUP BY h
)
SELECT c.doc_id, CAST(sum(c.cnt) AS BIGINT) AS n_passages,
  CAST(sum(CASE WHEN dp.n_docs >= 2 THEN c.cnt ELSE 0 END) AS BIGINT)
    AS n_dup_passages
FROM c JOIN dp USING (h)
GROUP BY c.doc_id
ORDER BY c.doc_id"""


def rfm_segments_sql() -> str:
    """Oracle of stages/events.rfm_segments: per-user recency (whole days
    to the global max ts) / frequency / purchase-cents, exact tercile
    thresholds at rank floor((n-1)*q) per dimension (the ccnet_buckets
    pattern), value-comparison 1..3 labels (3 = best)."""

    def ranked(col: str, name: str) -> str:
        return (f"{name} AS (SELECT {col} AS v, "
                f"row_number() OVER (ORDER BY {col}) - 1 AS rk, "
                f"count(*) OVER () AS n FROM d)")

    def th(name: str, q: str) -> str:
        return (f"(SELECT v FROM {name} WHERE rk = "
                f"CAST(floor((n - 1) * ({q})) AS BIGINT) LIMIT 1)")

    return f"""WITH pu AS (
  SELECT user_id, max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS frequency,
    CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS monetary_cents
  FROM events GROUP BY user_id
), g AS (SELECT max(last_ts) AS gmax FROM pu),
d AS (
  SELECT pu.user_id, pu.frequency, pu.monetary_cents,
    date_diff('microsecond', pu.last_ts, g.gmax) // 86400000000
      AS recency_days
  FROM pu, g
),
{ranked('recency_days', 'rr')},
{ranked('frequency', 'rf')},
{ranked('monetary_cents', 'rm')},
th AS (
  SELECT {th('rr', '1.0/3.0')} AS tr1, {th('rr', '2.0/3.0')} AS tr2,
         {th('rf', '1.0/3.0')} AS tf1, {th('rf', '2.0/3.0')} AS tf2,
         {th('rm', '1.0/3.0')} AS tm1, {th('rm', '2.0/3.0')} AS tm2
)
SELECT d.user_id, CAST(d.recency_days AS BIGINT) AS recency_days,
  d.frequency, d.monetary_cents,
  CAST(3 - (CASE WHEN d.recency_days > th.tr1 THEN 1 ELSE 0 END)
         - (CASE WHEN d.recency_days > th.tr2 THEN 1 ELSE 0 END)
       AS BIGINT) AS r_seg,
  CAST(1 + (CASE WHEN d.frequency > th.tf1 THEN 1 ELSE 0 END)
         + (CASE WHEN d.frequency > th.tf2 THEN 1 ELSE 0 END)
       AS BIGINT) AS f_seg,
  CAST(1 + (CASE WHEN d.monetary_cents > th.tm1 THEN 1 ELSE 0 END)
         + (CASE WHEN d.monetary_cents > th.tm2 THEN 1 ELSE 0 END)
       AS BIGINT) AS m_seg
FROM d, th
ORDER BY d.user_id"""


def tpch_q15_sql() -> str:
    """Oracle of stages/relagg.tpch_q15 (top supplier(s) by quarterly
    revenue — the revenue view + max tie filter, exact integer cents)."""
    from ..stages import relagg

    return f"""WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{relagg.Q15_START} 00:00:00'
    AND l_shipdate < TIMESTAMP '{relagg.Q15_END} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal, r.total_revenue_cents
FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
ORDER BY s.s_suppkey"""


def tpch_q19_sql() -> str:
    """Oracle of stages/relagg.tpch_q19 (disjunctive brand/size/quantity
    arms over one scan, exact integer cents)."""
    from ..stages import relagg

    arm_sql = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity >= {qlo} AND l_quantity <= {qhi})"
        for b, slo, shi, qlo, qhi in relagg.Q19_ARMS
    )
    return f"""WITH q AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE {arm_sql}
)
SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM q"""


def tpch_q7_sql() -> str:
    """Oracle of stages/relagg.tpch_q7 (two-nation volume shipping matrix
    by ship year, exact integer cents)."""
    from ..stages import relagg

    n1, n2 = relagg.Q7_NATIONS
    return f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier s ON l_suppkey = s_suppkey
JOIN orders o ON l_orderkey = o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{relagg.Q7_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{relagg.Q7_END} 00:00:00'
  AND ((s.s_nationkey = {n1} AND c.c_nationkey = {n2})
    OR (s.s_nationkey = {n2} AND c.c_nationkey = {n1}))
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year"""


def personalized_pagerank_sql(iterations: int = 8,
                              seed_mod: int | None = None) -> str:
    """Oracle of stages/pagerank.personalized_pagerank: the pagerank_sql
    CTE chain with the teleport branched to the seed set — init mass and
    damp base are CASE host % seed_mod = 0, both in exact int64 fixed
    point."""
    from ..functions import geocode
    from ..stages import pagerank as pr

    if seed_mod is None:
        seed_mod = pr.PPR_SEED_MOD
    mult = geocode.TLD_MULT
    mod = geocode.HOST_MOD
    host = f"(doc_id * {mult}) % {mod}"
    nd = "(SELECT count(*) FROM documents)"
    dhost1 = f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd}) * {mult}) % {mod}"
    dhost2 = f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd}) * {mult}) % {mod}"
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""r{i} AS (
  SELECT h.host,
    CAST(CASE WHEN h.host % {seed_mod} = 0 THEN (SELECT base FROM consts)
              ELSE 0 END
      + ({pr.DAMP_NUM} * COALESCE(s.contrib, 0)) // {pr.DAMP_DEN} AS BIGINT) AS rank
  FROM hosts h LEFT JOIN (
    SELECT e.dst AS host, CAST(sum(r.rank // e.outdeg) AS BIGINT) AS contrib
    FROM edges e JOIN {prev} r ON e.src = r.host
    GROUP BY 1
  ) s ON h.host = s.host
)""")
        prev = f"r{i}"
    chain = ",\n".join(steps)
    return f"""WITH hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
), e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
  )
), edeg AS (
  SELECT src, dst, CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg
  FROM e0 WHERE src <> dst
), edges AS (
  SELECT * FROM edeg
), nseeds AS (
  SELECT count(*) AS ns FROM hosts WHERE host % {seed_mod} = 0
), consts AS (
  SELECT CAST({pr.SCALE} * {pr.DAMP_DEN - pr.DAMP_NUM} AS BIGINT)
           // ({pr.DAMP_DEN} * (SELECT ns FROM nseeds)) AS base,
         CAST({pr.SCALE} AS BIGINT) // (SELECT ns FROM nseeds) AS init
), r0 AS (
  SELECT host,
    CASE WHEN host % {seed_mod} = 0 THEN (SELECT init FROM consts)
         ELSE 0 END AS rank
  FROM hosts
),
{chain}
SELECT host, rank FROM {prev}
ORDER BY host"""


def session_overlap_sql(gap_us: int | None = None) -> str:
    """Oracle of stages/events.session_overlap: gap-based sessions (same
    recurrence as sessionize: ties in ts break by event_id, a strictly
    greater-than-gap delta opens a session), then the all-pairs inclusive
    interval overlap join across users."""
    from ..stages import events as ev

    if gap_us is None:
        gap_us = ev.SESSION_GAP_US
    return f"""WITH e AS (
  SELECT user_id, ts, event_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), s AS (
  SELECT user_id, ts,
    sum(CASE WHEN prev IS NULL
              OR date_diff('microsecond', prev, ts) > {gap_us}
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS sidx
  FROM e
), iv AS (
  SELECT user_id, CAST(sidx AS BIGINT) AS sidx,
         min(ts) AS sts, max(ts) AS ets
  FROM s GROUP BY user_id, sidx
)
SELECT a.user_id AS user_a, a.sidx AS sess_a,
       b.user_id AS user_b, b.sidx AS sess_b,
  CAST(date_diff('microsecond', greatest(a.sts, b.sts),
                 least(a.ets, b.ets)) AS BIGINT) AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id < b.user_id AND a.sts <= b.ets AND b.sts <= a.ets
ORDER BY user_a, sess_a, user_b, sess_b"""


def snapshot_merge_sql() -> str:
    """Oracle of textops.snapshot_merge with the driver split: base = even
    doc_ids keyed by doc_id; changeset = odd doc_ids targeting key
    doc_id - 1 (delete when doc_id % 10 = 9, else upsert with the odd
    doc's payload)."""
    return """WITH base AS (
  SELECT doc_id AS key, text, lang FROM documents WHERE doc_id % 2 = 0
), ch AS (
  SELECT doc_id - 1 AS key, text, lang,
    CASE WHEN doc_id % 10 = 9 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents WHERE doc_id % 2 = 1
)
SELECT key, text, lang FROM base WHERE key NOT IN (SELECT key FROM ch)
UNION ALL
SELECT key, text, lang FROM ch WHERE op = 'upsert'
ORDER BY key"""


def len_percentile_sql() -> str:
    """Oracle of textops.len_percentile: percent_rank by n_chars computed
    manually — (rank() - 1) / (n - 1) with ties at the minimum rank, the
    identical final division."""
    return """WITH d AS (
  SELECT doc_id, n_chars,
    rank() OVER (ORDER BY n_chars) - 1 AS r,
    count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, n_chars,
  floor(CAST(r AS DOUBLE) / (n - 1) * 1000000.0 + 0.5) / 1000000.0
    AS pct_rank
FROM d
ORDER BY doc_id"""


def event_transitions_sql() -> str:
    """Oracle of stages/events.event_transitions (first-order Markov
    transition matrix over per-user event sequences, row-normalized with
    the engine's floor(x*1e6+0.5)/1e6 rounding)."""
    return """WITH seq AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_type
  FROM events
), cnt AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
  floor(CAST(n AS DOUBLE)
        / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
        * 1e6 + 0.5) / 1e6 AS prob
FROM cnt ORDER BY from_type, to_type"""


def mann_kendall_sql() -> str:
    """Oracle of stages/events.mann_kendall: dense daily series, exact
    integer S and tie-corrected 18*Var, continuity-corrected z round6."""
    from .oracles import round6

    z = ("CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(v.var18 / 18.0) "
         "WHEN s.s < 0 THEN (s.s + 1) / sqrt(v.var18 / 18.0) "
         "ELSE 0.0 END")
    return f"""WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS d FROM events
), h AS (
  SELECT d, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1
), dense AS (
  SELECT g.d AS i, CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(generate_series((SELECT min(d) FROM h),
                                      (SELECT max(d) FROM h))) AS d) g
  LEFT JOIN h ON h.d = g.d
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM dense
), s AS (
  SELECT CAST(coalesce(sum(CASE WHEN b.c > a.c THEN 1
                    WHEN b.c < a.c THEN -1 ELSE 0 END), 0) AS BIGINT) AS s
  FROM dense a JOIN dense b ON b.i > a.i
), tg AS (
  SELECT CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
              AS BIGINT) AS tie
  FROM (SELECT count(*) AS t FROM dense GROUP BY c)
), v AS (
  SELECT CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - tg.tie AS BIGINT)
    AS var18
  FROM nn, tg
)
SELECT nn.n AS n_days, s.s, v.var18,
  CASE WHEN v.var18 <= 0 THEN 0.0 ELSE {round6(z)} END AS z
FROM nn, s, v"""


def hot_runs_sql() -> str:
    """Oracle of stages/events.hot_runs: the classic gaps-and-islands
    row_number-difference grouping over the dense hourly series, exact
    HUGEINT mean-cleared hot flag."""
    return """WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s1
  FROM dense
), isl AS (
  SELECT d.hr, d.hr - row_number() OVER (ORDER BY d.hr) AS grp
  FROM dense d, st
  WHERE CAST(d.x AS HUGEINT) * st.n >= st.s1
)
SELECT CAST(min(hr) AS BIGINT) AS run_start,
  CAST(count(*) AS BIGINT) AS run_len
FROM isl GROUP BY grp ORDER BY run_start"""


def theil_sen_trend_sql(max_days: int | None = None) -> str:
    """Oracle of stages/events.theil_sen_trend: dense daily series, all
    pairwise slopes scaled by the FIXED lcm(1..max_days) so the median
    selection is pure-integer, round6 of med2/(2L)."""
    from math import gcd

    from ..stages import events
    from .oracles import round6

    md = events.THEIL_MAX_DAYS if max_days is None else max_days
    L = 1
    for i in range(1, md + 1):
        L = L * i // gcd(L, i)
    return f"""WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS d FROM events
), h AS (
  SELECT d, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1
), dense AS (
  SELECT g.d - (SELECT min(d) FROM h) AS i,
    CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(generate_series((SELECT min(d) FROM h),
                                      (SELECT max(d) FROM h))) AS d) g
  LEFT JOIN h ON h.d = g.d
), pairs AS MATERIALIZED (
  SELECT CAST(b.c - a.c AS HUGEINT) * ({L} // (b.i - a.i)) AS s
  FROM dense a JOIN dense b ON b.i > a.i
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS np FROM pairs
), ranked AS MATERIALIZED (
  SELECT s, row_number() OVER (ORDER BY s) AS rn FROM pairs
), med AS (
  SELECT st.np,
    CASE WHEN st.np % 2 = 1
      THEN 2 * (SELECT s FROM ranked WHERE rn = (st.np + 1) // 2)
      ELSE (SELECT s FROM ranked WHERE rn = st.np // 2)
         + (SELECT s FROM ranked WHERE rn = st.np // 2 + 1) END AS med2
  FROM st
)
SELECT CAST((SELECT count(*) FROM dense) AS BIGINT) AS n_days,
  med.np AS n_pairs,
  {round6(f'CAST(med.med2 AS DOUBLE) / CAST(2 * {L} AS DOUBLE)')} AS slope
FROM med"""


def type_burstiness_sql() -> str:
    """Oracle of stages/events.type_burstiness: per-type hourly counts
    over the GLOBAL hour range, fano = (n*S2 - S1^2)/(n*S1) in HUGEINT,
    round6."""
    from .oracles import round6

    return f"""WITH ev AS (
  SELECT event_type AS t, epoch_us(ts) // 3600000000 AS hr FROM events
), rng AS (
  SELECT CAST(max(hr) - min(hr) + 1 AS HUGEINT) AS n FROM ev
), h AS (
  SELECT t, hr, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2
), mom AS (
  SELECT t, CAST(sum(c) AS HUGEINT) AS s1,
    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM h GROUP BY 1
)
SELECT t AS event_type, CAST(rng.n AS BIGINT) AS n_hours,
  CAST(s1 AS BIGINT) AS total,
  {round6('CAST(rng.n * s2 - s1 * s1 AS DOUBLE)'
          ' / CAST(rng.n * s1 AS DOUBLE)')} AS fano
FROM mom, rng ORDER BY event_type"""


def haar_energy_sql(levels: int | None = None) -> str:
    """Oracle of stages/events.haar_energy: the same unnormalized Haar
    cascade unrolled as pairwise GROUP BY CTEs in HUGEINT (smooth = a+b,
    detail = a-b via signed sums over i//2 pairs)."""
    from ..stages import events

    L = events.HAAR_LEVELS if levels is None else levels
    N = 1 << L
    chain, sel = [], []
    prev = "s0"
    for j in range(1, L + 1):
        chain.append(f"""t{j} AS MATERIALIZED (
  SELECT i // 2 AS i, CAST(sum(v) AS HUGEINT) AS v,
    CAST(sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS HUGEINT) AS d
  FROM {prev} GROUP BY 1
)""")
        sel.append(f"SELECT {j} AS level, CAST({N >> j} AS BIGINT)"
                   f" AS n_coeffs,\n"
                   f"  (SELECT CAST(sum(d * d) AS BIGINT) FROM t{j})"
                   f" AS energy")
        prev = f"t{j}"
    return f"""WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), s0 AS MATERIALIZED (
  SELECT g.i, CAST(coalesce(h.cnt, 0) AS HUGEINT) AS v
  FROM (SELECT unnest(range({N})) AS i) g
  LEFT JOIN h ON h.hr - (SELECT min(hr) FROM h) = g.i
),
{", ".join(chain)}
{" UNION ALL ".join(sel)}
ORDER BY level"""


def markov_stationary_sql(steps: int | None = None,
                          scale: int | None = None) -> str:
    """Oracle of stages/events.markov_stationary: the same K floored
    power-iteration steps pi'_j = sum_i (pi_i * n_ij) // r_i over the
    transition counts, ceil-shift renormalized, unrolled as MATERIALIZED
    CTEs in HUGEINT."""
    from ..stages import events

    k = events.MARKOV_STEPS if steps is None else steps
    S = events.MARKOV_SCALE if scale is None else scale
    chain = []
    prev = "p0"
    for t in range(1, k + 1):
        chain.append(f"""w{t} AS MATERIALIZED (
  SELECT ty.ty, coalesce(s.w, CAST(0 AS HUGEINT)) AS w FROM ty LEFT JOIN (
    SELECT c.to_type AS ty,
      CAST(sum((p.v * c.n) // r.r) AS HUGEINT) AS w
    FROM cnt c
    JOIN {prev} p ON p.ty = c.from_type
    JOIN rt r ON r.ty = c.from_type
    GROUP BY 1
  ) s ON s.ty = ty.ty
), m{t} AS MATERIALIZED (
  SELECT GREATEST(CAST(1 AS HUGEINT),
    ((SELECT max(w) FROM w{t}) + {S} - 1) // {S}) AS d
), p{t} AS MATERIALIZED (
  SELECT ty, w // d AS v FROM w{t}, m{t}
)""")
        prev = f"p{t}"
    steps_sql = ",\n".join(chain)
    return f"""WITH seq AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_type
  FROM events
), cnt AS MATERIALIZED (
  SELECT from_type, to_type, CAST(count(*) AS HUGEINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
), ty AS MATERIALIZED (
  SELECT from_type AS ty FROM cnt UNION SELECT to_type FROM cnt
), rt AS MATERIALIZED (
  SELECT from_type AS ty, CAST(sum(n) AS HUGEINT) AS r
  FROM cnt GROUP BY 1
), p0 AS MATERIALIZED (
  SELECT ty, CAST({S} AS HUGEINT) AS v FROM ty
),
{steps_sql}
SELECT ty AS event_type, CAST(v AS BIGINT) AS pi FROM {prev}
ORDER BY event_type"""


def clustering_coeff_sql(comm_mod: int | None = None) -> str:
    """Oracle of stages/triangles.clustering_coeff: the triangles_sql edge
    CTE + degree explode + per-node triangle counts, left-joined, with the
    engine's own 2T/(deg*(deg-1)) rounding."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY node
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
), tcnt AS (
  SELECT comm, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS comm FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY comm
)
SELECT node AS comm, deg,
  CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
  CASE WHEN deg >= 2 THEN
    floor(CAST(2 * coalesce(n_triangles, 0) AS DOUBLE)
          / CAST(deg * (deg - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6
  ELSE 0.0 END AS coeff
FROM deg LEFT JOIN tcnt ON node = comm
ORDER BY comm"""


def robust_stats_sql(trim: float | None = None) -> str:
    """Oracle of stages/sketch.robust_stats (per-lang median / MAD /
    trimmed mean, rank floor((n-1)*0.5) and trim window [floor(n*trim),
    n - floor(n*trim)), engine rounding on the one derived double)."""
    from ..stages import sketch

    t = sketch.TRIM_FRAC if trim is None else trim
    return f"""WITH lens AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS v FROM documents
), st AS (
  SELECT lang, v,
    row_number() OVER (PARTITION BY lang ORDER BY v) - 1 AS rk,
    count(*) OVER (PARTITION BY lang) AS n
  FROM lens
), med AS (
  SELECT lang, CAST(n AS BIGINT) AS n, min(v) AS median
  FROM st WHERE rk = (n - 1) // 2 GROUP BY lang, n
), dst AS (
  SELECT l.lang, abs(l.v - m.median) AS d,
    row_number() OVER (PARTITION BY l.lang ORDER BY abs(l.v - m.median)) - 1
      AS rk,
    count(*) OVER (PARTITION BY l.lang) AS n
  FROM lens l JOIN med m ON l.lang = m.lang
), mad AS (
  SELECT lang, min(d) AS mad FROM dst WHERE rk = (n - 1) // 2 GROUP BY lang
), tr AS (
  SELECT lang, CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM st
  WHERE rk >= CAST(floor(n * {t}) AS BIGINT)
    AND rk < n - CAST(floor(n * {t}) AS BIGINT)
  GROUP BY lang
)
SELECT m.lang, m.n, m.median, mad.mad,
  floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) * 1e6 + 0.5) / 1e6
    AS trimmed_mean
FROM med m JOIN mad ON m.lang = mad.lang JOIN tr ON m.lang = tr.lang
ORDER BY m.lang"""


def nb_lang_classify_sql(train_mod: int | None = None) -> str:
    """Oracle of stages/textops.nb_lang_classify (exact integer additive
    NB scoring; train half = doc_id % train_mod = 0; argmax with lang-asc
    tie-break; docs sharing no train token absent = inner join)."""
    from ..stages import textops

    tm = textops.NB_TRAIN_MOD if train_mod is None else train_mod
    return f"""WITH toks AS (
  SELECT doc_id, lang,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS token
  FROM documents
), model AS (
  SELECT token, lang, CAST(count(*) AS BIGINT) AS cnt
  FROM toks WHERE doc_id % {tm} = 0 GROUP BY token, lang
), scores AS (
  SELECT t.doc_id, m.lang AS cand, CAST(sum(m.cnt) AS BIGINT) AS score
  FROM toks t JOIN model m ON t.token = m.token
  GROUP BY t.doc_id, m.lang
), ranked AS (
  SELECT doc_id, cand, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
  FROM scores
)
SELECT doc_id, cand AS pred_lang, score
FROM ranked WHERE rn = 1 ORDER BY doc_id"""


def ann_range_sql(tau: float | None = None, n_queries: int | None = None,
                  dim: int | None = None) -> str:
    """Oracle of stages/ann.ann_range_search (cosine >= tau range search;
    raw-cosine predicate, round6 output, same left-assoc dot fold)."""
    from ..stages import ann

    t = ann.RANGE_TAU if tau is None else tau
    nq_ = ann.N_QUERIES if n_queries is None else n_queries
    d = ann.DIM if dim is None else dim
    dot = _dot_expr("e.embedding", "q.embedding", d)
    ne = _dot_expr("e.embedding", "e.embedding", d)
    nq = _dot_expr("q.embedding", "q.embedding", d)
    return f"""WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  WHERE vec_id < {nq_}
), sims AS (
  SELECT q.query_id, e.vec_id,
    ({dot}) / (sqrt({ne}) * sqrt({nq})) AS cos_raw
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, {round6('cos_raw')} AS cosine
FROM sims WHERE cos_raw >= {D(t)}
ORDER BY query_id, vec_id"""


def pareto_docs_sql() -> str:
    """Oracle of stages/textops.pareto_docs (skyline by NOT EXISTS
    domination — a completely different plan than the engine's sorted
    group-cummax, so it checks the algorithm, not the transcription)."""
    return """WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS token
  FROM documents
), m AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(count(DISTINCT token) AS BIGINT) AS n_distinct
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE (b.n_tokens > a.n_tokens AND b.n_distinct >= a.n_distinct)
     OR (b.n_tokens = a.n_tokens AND b.n_distinct > a.n_distinct)
)
ORDER BY doc_id"""


def host_rank_sql() -> str:
    """Oracle of stages/textops.host_rank (per-host length rank window)."""
    from ..functions import geocode

    host = f"(doc_id * {geocode.TLD_MULT}) % {geocode.HOST_MOD}"
    return f"""WITH d AS (
  SELECT doc_id, {host} AS host, CAST(length(text) AS BIGINT) AS len
  FROM documents
)
SELECT doc_id, host,
  CAST(row_number() OVER (PARTITION BY host ORDER BY len, doc_id)
       AS BIGINT) AS rk,
  CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n_host
FROM d ORDER BY doc_id"""


def attribution_sql(touch: str | None = None, conv: str | None = None) -> str:
    """Oracle of stages/events.attribution (last-touch before each
    conversion per user; IGNORE NULLS running last_value)."""
    from ..stages import events

    t = events.ATTR_TOUCH if touch is None else touch
    c = events.ATTR_CONV if conv is None else conv
    return f"""WITH seq AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type,
    last_value(CASE WHEN event_type = '{t}' THEN event_id END IGNORE NULLS)
      OVER w AS touch_event_id,
    last_value(CASE WHEN event_type = '{t}' THEN epoch_us(ts) END
               IGNORE NULLS) OVER w AS touch_tus
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, touch_event_id, tus - touch_tus AS lag_us
FROM seq WHERE event_type = '{c}' AND touch_event_id IS NOT NULL
ORDER BY event_id"""


def embedding_gram_sql(scale: int | None = None) -> str:
    """Oracle of stages/ann.embedding_gram (fixed-point integer Gram
    matrix, bit-exact — no float summation order anywhere)."""
    from ..stages import ann

    s = ann.GRAM_SCALE if scale is None else scale
    return f"""WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
    generate_subscripts(embedding, 1) AS i
  FROM embeddings
), f AS (
  SELECT vec_id, i,
    CAST(floor(CAST(x AS DOUBLE) * {s}.0 + 0.5) AS BIGINT) AS xf
  FROM e
)
SELECT a.i AS i, b.i AS j, CAST(sum(a.xf * b.xf) AS BIGINT) AS gram
FROM f a JOIN f b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i ORDER BY i, j"""


def pca_power_sql(scale: int | None = None, iters: int | None = None,
                  vscale: int | None = None) -> str:
    """Oracle of stages/ann.pca_power: the same K exact-integer power-
    iteration supersteps over the fixed-point Gram matrix, unrolled as
    MATERIALIZED CTEs in HUGEINT.  Signed floor division is spelled
    ``(w - ((w % d) + d) % d) // d`` (the numerator is exactly divisible,
    so // truncation vs floor cannot differ)."""
    from ..stages import ann

    s = ann.GRAM_SCALE if scale is None else scale
    k = ann.PCA_ITERS if iters is None else iters
    V = ann.PCA_VSCALE if vscale is None else vscale
    steps = []
    prev = "v0"
    for t in range(1, k + 1):
        steps.append(f"""w{t} AS MATERIALIZED (
  SELECT g.i, CAST(sum(CAST(g.gram AS HUGEINT) * p.v) AS HUGEINT) AS w
  FROM gram g JOIN {prev} p ON p.i = g.j GROUP BY 1
), m{t} AS MATERIALIZED (
  SELECT GREATEST(CAST(1 AS HUGEINT),
    ((SELECT max(abs(w)) FROM w{t}) + {V} - 1) // {V}) AS d
), v{t} AS MATERIALIZED (
  SELECT i, (w - (((w % d) + d) % d)) // d AS v FROM w{t}, m{t}
)""")
        prev = f"v{t}"
    chain = ",\n".join(steps)
    return f"""WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
    generate_subscripts(embedding, 1) AS i
  FROM embeddings
), f AS (
  SELECT vec_id, i,
    CAST(floor(CAST(x AS DOUBLE) * {s}.0 + 0.5) AS BIGINT) AS xf
  FROM e
), gu AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.xf * b.xf) AS BIGINT) AS gram
  FROM f a JOIN f b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
), gram AS MATERIALIZED (
  SELECT i, j, gram FROM gu
  UNION ALL
  SELECT j, i, gram FROM gu WHERE j > i
), v0 AS (
  SELECT DISTINCT i, CAST({V} AS HUGEINT) AS v FROM gram
),
{chain}
SELECT i, CAST(v AS BIGINT) AS v FROM {prev} ORDER BY i"""


def cluster_terms_sql(top_k: int = 5) -> str:
    """Oracle of stages/textops.cluster_terms (top tokens per k-means
    cluster; the whole bit-exact kmeans_sql chain rides as a subquery)."""
    return f"""WITH assign AS (
  SELECT vec_id, cluster FROM ({kmeans_sql()}) sub
), toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS token
  FROM documents
), ct AS (
  SELECT a.cluster, t.token, CAST(count(*) AS BIGINT) AS n
  FROM toks t JOIN assign a ON t.doc_id = a.vec_id
  GROUP BY a.cluster, t.token
), r AS (
  SELECT cluster, token, n,
    row_number() OVER (PARTITION BY cluster ORDER BY n DESC, token) AS rk
  FROM ct
)
SELECT cluster, CAST(rk AS BIGINT) AS rank, token, n
FROM r WHERE rk <= {top_k} ORDER BY cluster, rank"""


def ks_test_sql(groups: tuple[str, str] | None = None) -> str:
    """Oracle of stages/sketch.ks_test (two-sample KS over text length;
    exact HUGEINT cross-multiplied ECDF argmax, ties -> smallest v)."""
    from ..stages import sketch

    ga, gb = sketch.KS_LANGS if groups is None else groups
    return f"""WITH lens AS (
  SELECT lang AS g, CAST(length(text) AS BIGINT) AS v FROM documents
  WHERE lang IN ('{ga}', '{gb}')
), hist AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM lens GROUP BY g, v
), tot AS (
  SELECT CAST(sum(CASE WHEN g = '{ga}' THEN cnt ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN g = '{gb}' THEN cnt ELSE 0 END) AS BIGINT) AS nb
  FROM hist
), vals AS (
  SELECT DISTINCT v FROM hist
), cdf AS (
  SELECT vals.v,
    CAST(coalesce(sum(CASE WHEN h.g = '{ga}' THEN h.cnt END), 0)
         AS BIGINT) AS ca,
    CAST(coalesce(sum(CASE WHEN h.g = '{gb}' THEN h.cnt END), 0)
         AS BIGINT) AS cb
  FROM vals LEFT JOIN hist h ON h.v <= vals.v GROUP BY vals.v
), d AS (
  SELECT v, abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na) AS df,
    na, nb
  FROM cdf, tot
)
SELECT v AS at_value, na AS n_a, nb AS n_b,
  floor(CAST(df AS DOUBLE) / CAST(na * nb AS DOUBLE) * 1e6 + 0.5) / 1e6
    AS ks_d
FROM d ORDER BY df DESC, v LIMIT 1"""


def hosts_division_sql(lang: str = "en") -> str:
    """Oracle of stages/textops.hosts_division (relational division:
    hosts whose EVERY doc is in `lang`)."""
    from ..functions import geocode

    host = f"(doc_id * {geocode.TLD_MULT}) % {geocode.HOST_MOD}"
    return f"""WITH d AS (
  SELECT {host} AS host, lang FROM documents
)
SELECT host, CAST(count(*) AS BIGINT) AS n_docs
FROM d GROUP BY host
HAVING count(*) = sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END)
ORDER BY host"""


def quantile_normalize_sql() -> str:
    """Oracle of stages/sketch.quantile_normalize (pooled order statistic
    at the proportional rank, exact integers)."""
    return """WITH d AS (
  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len FROM documents
), r AS (
  SELECT doc_id, lang, len,
    row_number() OVER (PARTITION BY lang ORDER BY len, doc_id) AS rk,
    count(*) OVER (PARTITION BY lang) AS ng
  FROM d
), p AS (
  SELECT len AS v, row_number() OVER (ORDER BY len, doc_id) AS rn FROM d
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM d
)
SELECT r.doc_id, r.len, p.v AS qnorm
FROM r CROSS JOIN tot
JOIN p ON p.rn = ((r.rk - 1) * tot.n) // r.ng + 1
ORDER BY r.doc_id"""


def quota_sample_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.quota_sample (k smallest hash buckets per
    group, doc_id tie-break)."""
    from ..stages import textops

    kk = textops.QUOTA_K if k is None else k
    mult, mod = textops.SPLIT_MULT, textops.SPLIT_MOD
    return f"""WITH d AS (
  SELECT doc_id, lang,
    ((doc_id % {mod}) * ({mult} % {mod})) % {mod} AS bucket
  FROM documents
), r AS (
  SELECT doc_id, lang, bucket,
    row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rn
  FROM d
)
SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket
FROM r WHERE rn <= {kk} ORDER BY doc_id"""


def event_autocorr_sql(lags: int | None = None) -> str:
    """Oracle of stages/events.event_autocorr (dense hourly series, exact
    HUGEINT moments, the same mean-cleared closed form)."""
    from ..stages import events

    k = events.ACF_LAGS if lags is None else lags
    vals = ", ".join(f"({i})" for i in range(1, k + 1))
    return f"""WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
  FROM dense
), lags(k) AS (VALUES {vals}),
m AS (
  SELECT l.k,
    CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS p,
    CAST(sum(a.x) AS HUGEINT) AS sa,
    CAST(sum(b.x) AS HUGEINT) AS sb
  FROM lags l
  JOIN dense a ON TRUE
  JOIN dense b ON b.hr = a.hr + l.k
  GROUP BY l.k
)
SELECT m.k AS lag, CAST(st.n AS BIGINT) AS n_hours,
  floor(CAST(st.n * st.n * m.p - st.n * st.s * (m.sa + m.sb)
             + (st.n - m.k) * st.s * st.s AS DOUBLE)
        / CAST(st.n * st.n * st.q - st.n * st.s * st.s AS DOUBLE)
        * 1e6 + 0.5) / 1e6 AS r
FROM m, st ORDER BY lag"""


def dup_span_coverage_sql(w: int | None = None) -> str:
    """Oracle of stages/textops.dup_span_coverage (overlapping w-gram
    cross-doc duplication, per-doc covered-position count via DISTINCT
    unnested ranges — a completely different plan than the engine's
    interval union)."""
    from ..stages import textops

    ww = textops.SPAN_W if w is None else w
    joined = " || ' ' || ".join(f"toks[pos + {j}]" for j in range(ww))
    return f"""WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, pos, {joined} AS gram FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) - {ww - 2})) AS pos
    FROM t WHERE len(toks) >= {ww}
  )
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), p AS (
  SELECT DISTINCT doc_id, pos FROM g JOIN dup USING (gram)
), cov AS (
  SELECT doc_id, CAST(count(DISTINCT c) AS BIGINT) AS covered FROM (
    SELECT doc_id, unnest(generate_series(pos, pos + {ww - 1})) AS c FROM p
  ) GROUP BY doc_id
), meta AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM t WHERE len(toks) >= {ww}
)
SELECT m.doc_id, m.n_tokens, CAST(coalesce(cov.covered, 0) AS BIGINT)
  AS covered
FROM meta m LEFT JOIN cov ON m.doc_id = cov.doc_id
ORDER BY m.doc_id"""


def hits_sql(iterations: int | None = None) -> str:
    """Oracle of stages/pagerank.hits: the same K exact-integer HITS
    supersteps unrolled as chained CTEs over the deterministic host graph.
    Each half-step renormalizes by the ceil shift divisor
    ``GREATEST(1, (max_raw + SCALE - 1) // SCALE)`` — all int64 floor
    division, order-independent, bit-exact vs the engine."""
    from ..functions import geocode
    from ..stages import pagerank as pr

    iterations = pr.HITS_ITERS if iterations is None else iterations
    mult = geocode.TLD_MULT
    mod = geocode.HOST_MOD
    host = f"(doc_id * {mult}) % {mod}"
    nd = "(SELECT count(*) FROM documents)"
    dhost1 = f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd}) * {mult}) % {mod}"
    dhost2 = f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd}) * {mult}) % {mod}"
    S = pr.SCALE
    steps = []
    prev_h = "h0"
    for i in range(1, iterations + 1):
        steps.append(f"""ar{i} AS MATERIALIZED (
  SELECT h.host, COALESCE(s.v, 0) AS v FROM hosts h LEFT JOIN (
    SELECT e.dst AS host, CAST(sum(p.v) AS BIGINT) AS v
    FROM edges e JOIN {prev_h} p ON e.src = p.host GROUP BY 1
  ) s ON h.host = s.host
), a{i} AS MATERIALIZED (
  SELECT host, CAST(v // GREATEST(1,
    ((SELECT max(v) FROM ar{i}) + {S} - 1) // {S}) AS BIGINT) AS v
  FROM ar{i}
), hr{i} AS MATERIALIZED (
  SELECT h.host, COALESCE(s.v, 0) AS v FROM hosts h LEFT JOIN (
    SELECT e.src AS host, CAST(sum(p.v) AS BIGINT) AS v
    FROM edges e JOIN a{i} p ON e.dst = p.host GROUP BY 1
  ) s ON h.host = s.host
), h{i} AS MATERIALIZED (
  SELECT host, CAST(v // GREATEST(1,
    ((SELECT max(v) FROM hr{i}) + {S} - 1) // {S}) AS BIGINT) AS v
  FROM hr{i}
)""")
        prev_h = f"h{i}"
    chain = ",\n".join(steps)
    return f"""WITH hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
), edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
  ) WHERE src <> dst
), h0 AS MATERIALIZED (
  SELECT host, CAST({S} AS BIGINT) AS v FROM hosts
),
{chain}
SELECT h.host, h.v AS hub, a.v AS auth
FROM h{iterations} h JOIN a{iterations} a ON h.host = a.host
ORDER BY h.host"""


def oov_rate_sql(vocab_k: int | None = None) -> str:
    """Oracle of stages/textops.oov_rate: same \\s+ tokenization, top-k df
    vocabulary (df DESC, token ASC), per-doc OOV fraction in the engine's
    canonical rounding."""
    from ..stages import textops

    vocab_k = textops.OOV_VOCAB_K if vocab_k is None else vocab_k
    return f"""WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS token
  FROM documents
), df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY token
), vocab AS (
  SELECT token FROM df ORDER BY df DESC, token LIMIT {vocab_k}
), pd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN token IN (SELECT token FROM vocab)
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_oov,
  {round6('CAST(n_oov AS DOUBLE) / n_tokens')} AS oov_rate
FROM pd ORDER BY doc_id"""


def token_budget_select_sql(budget_den: int | None = None) -> str:
    """Oracle of stages/textops.token_budget_select: window running token
    sum in (n_chars DESC, doc_id) order, keep while cum <= total //
    budget_den."""
    from ..stages import textops

    budget_den = textops.TOKEN_BUDGET_DEN if budget_den is None else budget_den
    return f"""WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), b AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) // {budget_den} AS budget FROM t
), w AS (
  SELECT *, sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id) AS cum FROM t
)
SELECT doc_id, n_chars, n_tokens FROM w
WHERE cum <= (SELECT budget FROM b)
ORDER BY doc_id"""


def decision_stump_sql() -> str:
    """Oracle of stages/sketch.decision_stump: cumulative class counts
    over the n_chars value histogram, majority-vote misclassification
    argmin (ties: smallest threshold)."""
    return f"""WITH h AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM documents GROUP BY n_chars
), c AS (
  SELECT v, sum(n) OVER (ORDER BY v) AS nL,
         sum(pos) OVER (ORDER BY v) AS posL,
         (SELECT sum(n) FROM h) AS n_tot,
         (SELECT sum(pos) FROM h) AS pos_tot
  FROM h
), s AS (
  SELECT v, nL, n_tot - nL AS nR,
    least(posL, nL - posL)
      + least(pos_tot - posL, (n_tot - nL) - (pos_tot - posL)) AS err,
    n_tot
  FROM c
)
SELECT CAST(v AS BIGINT) AS threshold, CAST(nL AS BIGINT) AS n_left,
       CAST(nR AS BIGINT) AS n_right, CAST(err AS BIGINT) AS err,
       {round6('1.0 - CAST(err AS DOUBLE) / n_tot')} AS acc
FROM s ORDER BY err, v LIMIT 1"""


def burst_hours_sql(sigmas: int | None = None) -> str:
    """Oracle of stages/events.burst_hours: dense hourly series, exact
    HUGEINT mean/variance-cleared threshold (c*n - S1)^2 > k^2*(n*S2 -
    S1^2) with (c*n - S1) > 0."""
    from ..stages import events

    k = events.BURST_SIGMAS if sigmas is None else sigmas
    return f"""WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s1,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
  FROM dense
)
SELECT d.hr, d.x AS cnt
FROM dense d, st
WHERE CAST(d.x AS HUGEINT) * st.n - st.s1 > 0
  AND (CAST(d.x AS HUGEINT) * st.n - st.s1)
      * (CAST(d.x AS HUGEINT) * st.n - st.s1)
      > {k * k} * (st.n * st.s2 - st.s1 * st.s1)
ORDER BY d.hr"""


def cusum_change_sql() -> str:
    """Oracle of stages/events.cusum_change: dense hourly series, exact
    HUGEINT mean-cleared cumulative sum S_t = sum_{i<=t} (n*x_i - S1),
    argmax |S_t| with earliest-hour ties."""
    return """WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.cnt, 0) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s1
  FROM dense
), c AS (
  SELECT d.hr,
    sum(CAST(d.x AS HUGEINT) * st.n - st.s1)
      OVER (ORDER BY d.hr ROWS UNBOUNDED PRECEDING) AS cusum
  FROM dense d, st
)
SELECT c.hr AS chg_hr, CAST(c.cusum AS BIGINT) AS cusum,
  CAST(st.n AS BIGINT) AS n_hours
FROM c, st
ORDER BY abs(c.cusum) DESC, c.hr ASC LIMIT 1"""


def recrawl_stats_sql(replicate: int = 3) -> str:
    """Oracle of stages/extract.recrawl_stats over read_pages(replicate):
    LAG gaps per host over capture times, exact integer n/sum/min/max,
    canonical rounded mean."""
    from ..functions import geocode
    from .oracles import pages_replicated_cte, round6

    return f"""WITH {pages_replicated_cte(replicate)},
hp AS (
  SELECT (doc_id * {geocode.TLD_MULT}) % {geocode.HOST_MOD} AS host,
         epoch_us(warc_ts) // 1000000 AS t
  FROM pages_rep
), g AS (
  SELECT host, t - lag(t) OVER (PARTITION BY host ORDER BY t) AS gap
  FROM hp
), a AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS sum_gap,
         CAST(min(gap) AS BIGINT) AS min_gap_s,
         CAST(max(gap) AS BIGINT) AS max_gap_s
  FROM g WHERE gap IS NOT NULL GROUP BY host
)
SELECT host, n_gaps, min_gap_s, max_gap_s,
  {round6('CAST(sum_gap AS DOUBLE) / n_gaps')} AS mean_gap_s
FROM a ORDER BY host"""


def jl_project_sql(k: int | None = None, scale: int | None = None,
                   dim: int = 64) -> str:
    """Oracle of stages/ann.jl_project: the same fixed-point integer
    matmul against the +-1 sign matrix, inlined as a VALUES table from
    the SAME Python generator (``ann.jl_signs``)."""
    from ..stages import ann

    k = ann.JL_K if k is None else k
    s = ann.GRAM_SCALE if scale is None else scale
    signs = ann.jl_signs(dim, k)
    vals = ",\n    ".join(
        f"({i + 1}, {t + 1}, {int(signs[i, t])})"
        for i in range(dim) for t in range(k))
    return f"""WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
    generate_subscripts(embedding, 1) AS i
  FROM embeddings
), f AS (
  SELECT vec_id, i,
    CAST(floor(CAST(x AS DOUBLE) * {s}.0 + 0.5) AS BIGINT) AS xf
  FROM e
), signs(i, t, sgn) AS (VALUES
    {vals})
SELECT f.vec_id, CAST(s.t AS BIGINT) AS t,
       CAST(sum(f.xf * s.sgn) AS BIGINT) AS proj
FROM f JOIN signs s ON f.i = s.i
GROUP BY f.vec_id, s.t
ORDER BY f.vec_id, t"""


def normalized_dedup_sql() -> str:
    """Oracle of stages/textops.normalized_dedup (lower + RE2 \\s+
    collapse, md5 group, min-id survivor + group size)."""
    return """SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         AS norm_md5,
       min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
ORDER BY doc_id"""


def ema_win_sql(window: int | None = None) -> str:
    """Oracle of stages/events.ema_win: the same 2^(w-1-j)-weighted LAG
    chain per user in (ts, event_id) order, all BIGINT."""
    from ..stages import events

    w = events.EMA_WINDOW if window is None else window
    terms = []
    counts = []
    for j in range(w):
        weight = 1 << (w - 1 - j)
        if j == 0:
            terms.append(f"cents * {weight}")
            counts.append("1")
        else:
            lag = (f"lag(cents, {j}) OVER (PARTITION BY user_id "
                   f"ORDER BY ts, event_id)")
            terms.append(f"COALESCE({lag}, 0) * {weight}")
            counts.append(f"CASE WHEN {lag} IS NULL THEN 0 ELSE 1 END")
    ema = "\n      + ".join(terms)
    cnt = "\n      + ".join(counts)
    return f"""WITH e AS (
  SELECT event_id, user_id, ts,
    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
  CAST({cnt} AS BIGINT) AS n_terms,
  CAST({ema} AS BIGINT) AS ema_scaled
FROM e
ORDER BY event_id"""


def events_by_segment_sql() -> str:
    """Oracle of stages/events.events_by_segment (inner fact-to-dimension
    join, exact cents)."""
    return """SELECT c.c_mktsegment, e.event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
ORDER BY c.c_mktsegment, e.event_type"""


def bm25_scores_sql(query: tuple | None = None, k1: float | None = None,
                    b: float | None = None) -> str:
    """Oracle of stages/textops.bm25_scores: per-term tf/df columns
    pivoted wide, the score summed with EXPLICIT left-associative
    parentheses in term order (SQL SUM order is unspecified — the
    polygon_density float-fold discipline), ln + canonical rounding."""
    from ..stages import textops

    query = textops.BM25_QUERY if query is None else query
    k1 = textops.BM25_K1 if k1 is None else k1
    b = textops.BM25_B if b is None else b
    tf_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(query))
    df_cols = ",\n    ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(query)))
    terms = []
    for i in range(len(query)):
        terms.append(
            f"""CASE WHEN tf{i} = 0 THEN 0.0 ELSE
      ln((CAST(n - df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5)
          + 1.0)
      * (CAST(tf{i} AS DOUBLE) * ({k1!r} + 1.0))
      / (CAST(tf{i} AS DOUBLE)
         + {k1!r} * (1.0 - {b!r} + {b!r} * CAST(dl AS DOUBLE)
                     / (CAST(sdl AS DOUBLE) / n))) END""")
    folded = terms[0]
    for t in terms[1:]:
        folded = f"({folded} + {t})"
    return f"""WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
    {tf_cols}
  FROM t
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
    {df_cols}
  FROM d
)
SELECT d.doc_id, d.dl,
  {round6(folded)} AS bm25
FROM d, g
ORDER BY d.doc_id"""


def bucketed_join_sql() -> str:
    """Oracle of the bucketed_join driver query (documents x embeddings on
    doc_id = vec_id): bucketing is a storage layout, the join RESULT must
    equal the plain equi-join."""
    return """SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
       e.vec_id, CAST(e.label AS BIGINT) AS label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id"""


def hll_by_lang_sql(p: int | None = None) -> str:
    """Oracle of stages/sketch.hll_by_lang: the hll_registers_sql hash
    chain threaded with the language key — per-(lang, register) max rho,
    bit-exact."""
    from .oracles import pages_cte
    from ..stages import sketch

    p = sketch.HLL_GROUP_P if p is None else p
    fold = (f"list_reduce(list_transform(string_split(host, ''), "
            f"c -> ascii(c)::HUGEINT), (h, b) -> ((h * {_FNV}) % {_M64} + b) % {_M64})")
    return f"""WITH {pages_cte()}, hosts AS (
  SELECT DISTINCT lang, split_part(url, '/', 3) AS host FROM pages
), p0 AS (
  SELECT lang, host,
    CASE WHEN length(host) = 0 THEN 0::HUGEINT ELSE {fold} END AS h0
  FROM hosts
), z1 AS (
  SELECT lang, (h0 + 11400714819323198485) % {_M64} AS z1 FROM p0
), z2 AS (
  SELECT lang, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2
  FROM z1
), z3 AS (
  SELECT lang, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3
  FROM z2
), hh AS (
  SELECT lang, xor(z3, z3 >> 31) AS h FROM z3
), parts AS (
  SELECT lang, CAST(h >> {64 - p} AS BIGINT) AS register,
         (h * {1 << p}) % {_M64} AS rest
  FROM hh
), rhos AS (
  SELECT lang, register,
    COALESCE((SELECT min(i.i) + 1 FROM range(0, {64 - p}) i(i)
              WHERE ((parts.rest >> CAST(63 - i.i AS INT)) % 2) = 1),
             {64 - p + 1}) AS rho
  FROM parts
)
SELECT lang, register, CAST(max(rho) AS BIGINT) AS rho
FROM rhos GROUP BY lang, register
ORDER BY lang, register"""


def mann_whitney_sql(groups: tuple[str, str] | None = None) -> str:
    """Oracle of stages/sketch.mann_whitney: doubled U from the
    per-(group, value) histograms via one cumulative window, the
    tie-corrected variance numerator in HUGEINT, auc / z as the same
    single-division float trees (no continuity correction)."""
    from .oracles import round6

    from ..stages import sketch

    ga, gb = sketch.KS_LANGS if groups is None else groups
    return f"""WITH t AS (
  SELECT CASE WHEN lang = '{ga}' THEN 0 ELSE 1 END AS g,
         CAST(n_chars AS BIGINT) AS v
  FROM documents WHERE lang IN ('{ga}', '{gb}')
), hist AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN cnt ELSE 0 END) AS HUGEINT) AS na,
         CAST(sum(CASE WHEN g = 1 THEN cnt ELSE 0 END) AS HUGEINT) AS nb
  FROM hist
), vals AS (
  SELECT v,
    CAST(coalesce(sum(CASE WHEN g = 0 THEN cnt END), 0) AS HUGEINT) AS ca,
    CAST(coalesce(sum(CASE WHEN g = 1 THEN cnt END), 0) AS HUGEINT) AS cb
  FROM hist GROUP BY v
), w AS (
  SELECT v, ca, cb,
    CAST(coalesce(sum(cb) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT)
      AS bless
  FROM vals
), u AS (
  SELECT CAST(sum(ca * (2 * bless + cb)) AS HUGEINT) AS u2 FROM w
), ties AS (
  SELECT CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
              AS HUGEINT) AS sumt
  FROM vals
), fin AS (
  SELECT tot.na, tot.nb, tot.na + tot.nb AS n, u.u2,
    tot.na * tot.nb * ((tot.na + tot.nb + 1) * (tot.na + tot.nb)
      * (tot.na + tot.nb - 1) - ties.sumt) AS varnum
  FROM tot, u, ties
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  CAST(u2 AS BIGINT) AS u2,
  {round6("CAST(u2 AS DOUBLE) / CAST(2 * na * nb AS DOUBLE)")} AS auc,
  {round6("CAST(u2 - na * nb AS DOUBLE)"
          " / (2 * sqrt(CAST(varnum AS DOUBLE)"
          " / CAST(12 * n * (n - 1) AS DOUBLE)))")} AS z
FROM fin"""


def kmv_distinct_sql(k: int = 64) -> str:
    """Oracle of stages/sketch.kmv_distinct: per-type splitmix64(user_id)
    in HUGEINT mod 2^64 (identical mixing chain to hll_registers_sql),
    k-th order statistic via row_number, floor-division estimator."""
    from .oracles import round6

    g = "11400714819323198485"
    return f"""WITH tu AS (
  SELECT DISTINCT event_type, CAST(user_id AS HUGEINT) AS u FROM events
), z1 AS (
  SELECT event_type, (u + {g}) % {_M64} AS z1 FROM tu
), z2 AS (
  SELECT event_type,
    {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT event_type,
    {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), hh AS (
  SELECT event_type, xor(z3, z3 >> 31) AS h FROM z3
), rk AS (
  SELECT event_type, h,
    row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM hh
), n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct FROM hh GROUP BY 1
), kth AS (
  SELECT rk.event_type, rk.h AS hk
  FROM rk JOIN n ON n.event_type = rk.event_type
  WHERE rk.r = least({k}, n.n_distinct)
), est AS (
  SELECT n.event_type, n.n_distinct,
    CAST(least({k}, n.n_distinct) AS BIGINT) AS kmv_k,
    CAST(CASE WHEN n.n_distinct <= {k} THEN CAST(n.n_distinct AS HUGEINT)
         ELSE ({k - 1} * CAST('{_M64}' AS HUGEINT)) // greatest(kth.hk, 1)
         END AS BIGINT) AS kmv_est
  FROM n JOIN kth ON kth.event_type = n.event_type
)
SELECT event_type, n_distinct, kmv_k, kmv_est,
  {round6("CAST(kmv_est - n_distinct AS DOUBLE)"
          " / CAST(n_distinct AS DOUBLE)")} AS rel_err
FROM est ORDER BY event_type"""


def dft_power24_sql(harmonics: tuple[int, ...] | None = None) -> str:
    """Oracle of stages/events.dft_power24: the SAME micro-unit cos/sin
    tables (imported from the engine module) joined on (epoch_hour *
    m) % 24, HUGEINT dot products, one sqrt float tree."""
    from .oracles import round6

    from ..stages import events as ev

    hs = ev.DFT_HARMONICS if harmonics is None else harmonics
    trig = " UNION ALL ".join(
        f"SELECT {k} AS ph, CAST({ev.DFT_COS24[k]} AS HUGEINT) AS c,"
        f" CAST({ev.DFT_SIN24[k]} AS HUGEINT) AS s"
        for k in range(24))
    harm = " UNION ALL ".join(f"SELECT {m} AS m" for m in hs)
    return f"""WITH trig AS ({trig}), harm AS ({harm}), eh AS (
  SELECT epoch_us(ts) // 3600000000 AS h FROM events
), ph AS (
  SELECT harm.m, ((eh.h % 24) * harm.m) % 24 AS ph FROM eh, harm
), dot AS (
  SELECT ph.m, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(trig.c) AS HUGEINT) AS re,
    CAST(sum(trig.s) AS HUGEINT) AS im
  FROM ph JOIN trig ON trig.ph = ph.ph
  GROUP BY ph.m
)
SELECT m AS harmonic, n, CAST(re AS BIGINT) AS re, CAST(im AS BIGINT) AS im,
  {round6("sqrt(CAST(re * re + im * im AS DOUBLE))"
          " / CAST(n * 1000000 AS DOUBLE)")} AS amp_ratio
FROM dot ORDER BY m"""


def proximity_search_sql(terms: tuple[str, str] | None = None,
                         window: int | None = None) -> str:
    """Oracle of stages/textops.proximity_search: the classic
    |posA - posB| <= w positional self-join per document."""
    from ..stages import textops

    ta, tb = textops.PROX_TERMS if terms is None else terms
    w = textops.PROX_WINDOW if window is None else window
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), s -> s != '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lt
), a AS (
  SELECT doc_id, pos FROM toks WHERE tok = '{ta}'
), b AS (
  SELECT doc_id, pos FROM toks WHERE tok = '{tb}'
), p AS (
  SELECT a.doc_id, abs(a.pos - b.pos) AS gap
  FROM a JOIN b ON b.doc_id = a.doc_id AND abs(a.pos - b.pos) <= {w}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(min(gap) AS BIGINT) AS min_gap
FROM p GROUP BY 1 ORDER BY 1"""


def chi2_independence_sql() -> str:
    """Oracle of stages/textops.chi2_independence: same contingency CTEs
    as mutual_information_sql, O^2/(r*c) terms folded in (tld, lang)
    order, chi2 = N*S - N, Cramer's V over the same unrounded tree."""
    from .oracles import pages_cte, round6

    return f"""WITH {pages_cte()},
ct AS (
  SELECT tld, lang, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT string_split(split_part(url, '/', 3), '.')[-1] AS tld, lang
    FROM pages
  ) GROUP BY 1, 2
), st AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM ct
), r AS (
  SELECT tld, CAST(sum(c) AS BIGINT) AS rc FROM ct GROUP BY 1
), cl AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS cc FROM ct GROUP BY 1
), terms AS (
  SELECT ct.tld, ct.lang,
    CAST(ct.c * ct.c AS DOUBLE) / CAST(r.rc * cl.cc AS DOUBLE) AS t
  FROM ct JOIN r ON r.tld = ct.tld JOIN cl ON cl.lang = ct.lang
), f AS (
  SELECT list_reduce(list(t ORDER BY tld, lang), (a, b) -> a + b) AS s
  FROM terms
), dims AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_rows,
         (SELECT CAST(count(*) AS BIGINT) FROM cl) AS n_cols
), c2 AS (
  SELECT CAST(st.n AS DOUBLE) * f.s - CAST(st.n AS DOUBLE) AS v
  FROM st, f
)
SELECT st.n AS n, dims.n_rows, dims.n_cols,
  (dims.n_rows - 1) * (dims.n_cols - 1) AS dof,
  {round6('c2.v')} AS chi2,
  {round6('sqrt(c2.v / CAST(st.n * least(dims.n_rows - 1,'
          ' dims.n_cols - 1) AS DOUBLE))')} AS cramers_v
FROM st, f, dims, c2"""


def perceptron_train_sql(iters: int | None = None,
                         scale: int | None = None) -> str:
    """Oracle of stages/ann.perceptron_train: unrolled MATERIALIZED
    supersteps — per-step margins via a (vec, dim) join against the
    previous weight vector, misclassified update summed per dim, all in
    HUGEINT (identical integer math, order-free)."""
    from ..stages import ann

    k = ann.PERC_ITERS if iters is None else iters
    sc = ann.PERC_SCALE if scale is None else scale
    pos = ann.PERC_POS_BELOW
    ctes = [f"""x AS MATERIALIZED (
  SELECT vec_id,
    CASE WHEN label < {pos} THEN CAST(1 AS HUGEINT)
         ELSE CAST(-1 AS HUGEINT) END AS y,
    generate_subscripts(embedding, 1) AS i,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {sc} + 0.5)
         AS HUGEINT) AS v
  FROM embeddings
)""", """w1 AS MATERIALIZED (
  SELECT i, CAST(sum(y * v) AS HUGEINT) AS w FROM x GROUP BY i
)"""]
    for t in range(2, k + 1):
        ctes.append(f"""m{t - 1} AS MATERIALIZED (
  SELECT x.vec_id, x.y, CAST(sum(w{t - 1}.w * x.v) AS HUGEINT) AS dot
  FROM x JOIN w{t - 1} ON w{t - 1}.i = x.i GROUP BY x.vec_id, x.y
)""")
        ctes.append(f"""u{t - 1} AS (
  SELECT x.i, CAST(sum(x.y * x.v) AS HUGEINT) AS u
  FROM x JOIN m{t - 1} ON m{t - 1}.vec_id = x.vec_id
  WHERE m{t - 1}.y * m{t - 1}.dot <= 0 GROUP BY x.i
)""")
        ctes.append(f"""w{t} AS MATERIALIZED (
  SELECT w{t - 1}.i, w{t - 1}.w + coalesce(u{t - 1}.u, 0) AS w
  FROM w{t - 1} LEFT JOIN u{t - 1} ON u{t - 1}.i = w{t - 1}.i
)""")
    ctes.append(f"""mf AS (
  SELECT x.vec_id, x.y, CAST(sum(w{k}.w * x.v) AS HUGEINT) AS dot
  FROM x JOIN w{k} ON w{k}.i = x.i GROUP BY x.vec_id, x.y
)""")
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT i, CAST(w AS BIGINT) AS w,
  (SELECT CAST(count(*) AS BIGINT) FROM mf WHERE y * dot <= 0) AS n_mis
FROM w{k} ORDER BY i"""


def holt_linear_sql() -> str:
    """Oracle of stages/events.holt_linear: the identical 4^(t-1)-scaled
    integer recursion as a recursive CTE with HUGEINT shifts over the
    dense daily series (missing days are zeros)."""
    from .oracles import round6

    return f"""WITH RECURSIVE cnts AS (
  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), ext AS (
  SELECT min(d) AS lo, max(d) AS hi FROM cnts
), dense AS (
  SELECT row_number() OVER (ORDER BY g.d) AS t,
    CAST(coalesce(c.c, 0) AS HUGEINT) AS y
  FROM (SELECT unnest(generate_series((SELECT lo FROM ext),
                                      (SELECT hi FROM ext))) AS d) g
  LEFT JOIN cnts c ON c.d = g.d
), rec AS (
  SELECT CAST(1 AS BIGINT) AS t,
    (SELECT y FROM dense WHERE t = 1) AS l,
    (SELECT y FROM dense WHERE t = 2) - (SELECT y FROM dense WHERE t = 1)
      AS b
  UNION ALL
  SELECT rec.t + 1,
    (CAST(1 AS HUGEINT) << (2 * (rec.t + 1) - 3)) * d.y
      + 2 * (rec.l + rec.b),
    (CAST(1 AS HUGEINT) << (2 * (rec.t + 1) - 4)) * d.y
      - rec.l + 3 * rec.b
  FROM rec JOIN dense d ON d.t = rec.t + 1
), last AS (
  SELECT rec.t, rec.l, rec.b,
    (CAST(1 AS HUGEINT) << (2 * (rec.t - 1))) AS den
  FROM rec ORDER BY rec.t DESC LIMIT 1
)
SELECT CAST(t AS BIGINT) AS n_days,
  {round6("CAST(l AS DOUBLE) / CAST(den AS DOUBLE)")} AS level,
  {round6("CAST(b AS DOUBLE) / CAST(den AS DOUBLE)")} AS trend,
  {round6("CAST(l + b AS DOUBLE) / CAST(den AS DOUBLE)")} AS forecast
FROM last"""


def kruskal_wallis_sql() -> str:
    """Oracle of stages/sketch.kruskal_wallis: doubled tie ranks from
    the merged value histogram (one cumulative window), HUGEINT group
    rank sums, ordered list_reduce fold of R'^2/(4n_g), two shared
    float trees."""
    from .oracles import round6

    return f"""WITH t AS (
  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents
), hist AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2
), gvh AS (
  SELECT v, CAST(sum(cnt) AS BIGINT) AS c FROM hist GROUP BY v
), rk AS (
  SELECT v, 2 * CAST(coalesce(sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT)
    + c + 1 AS r2
  FROM gvh
), st AS (
  SELECT CAST(sum(c) AS HUGEINT) AS n,
    CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS sumt
  FROM gvh
), gr AS (
  SELECT hist.g, CAST(sum(CAST(hist.cnt AS HUGEINT) * rk.r2) AS HUGEINT)
      AS rp,
    CAST(sum(hist.cnt) AS HUGEINT) AS ng
  FROM hist JOIN rk ON rk.v = hist.v GROUP BY hist.g
), f AS (
  SELECT list_reduce(list(
    CAST(rp * rp AS DOUBLE) / CAST(4 * ng AS DOUBLE) ORDER BY g),
    (a, b) -> a + b) AS s,
    CAST(count(*) AS BIGINT) AS n_groups
  FROM gr
), hh AS (
  SELECT 12 * f.s / CAST(st.n * (st.n + 1) AS DOUBLE)
    - CAST(3 * (st.n + 1) AS DOUBLE) AS h
  FROM f, st
)
SELECT CAST(st.n AS BIGINT) AS n, f.n_groups,
  {round6('hh.h')} AS h,
  {round6('hh.h / (1 - CAST(st.sumt AS DOUBLE)'
          ' / CAST(st.n * st.n * st.n - st.n AS DOUBLE))')} AS h_tie
FROM st, f, hh"""


def lang_diversity_sql() -> str:
    """Oracle of stages/textops.lang_diversity: (source, lang) counts,
    unbiased Simpson 1 - sum n_i(n_i-1)/(N(N-1)), one round6 division."""
    from .oracles import round6

    return f"""WITH ct AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), agg AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_langs,
    CAST(sum(c * (c - 1)) AS BIGINT) AS num
  FROM ct GROUP BY source
)
SELECT source, n, n_langs,
  {round6('1 - CAST(num AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)')}
    AS simpson
FROM agg ORDER BY source"""


def jaccard_neighborhood_sql(comm_mod: int | None = None,
                             min_cn: int | None = None) -> str:
    """Oracle of stages/triangles.jaccard_neighborhood: the
    common_neighbors wedge chain plus a degree CTE (count per node over
    both stub directions), union by inclusion-exclusion, one round6
    division."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri
    from .oracles import round6

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    mc = min_cn if min_cn is not None else tri.CN_MIN
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), adj AS (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL
  SELECT b, a FROM e0
), dg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1
), cand AS (
  SELECT n1.nbr AS u, n2.nbr AS w, CAST(count(*) AS BIGINT) AS cn
  FROM adj n1 JOIN adj n2 ON n1.node = n2.node AND n1.nbr < n2.nbr
  GROUP BY 1, 2
), keep AS (
  SELECT u, w, cn FROM cand c
  WHERE cn >= {mc}
    AND NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = c.u AND e0.b = c.w)
)
SELECT k.u, k.w, k.cn, du.deg + dw.deg - k.cn AS un,
  {round6('CAST(k.cn AS DOUBLE) / CAST(du.deg + dw.deg - k.cn AS DOUBLE)')}
    AS jacc
FROM keep k JOIN dg du ON du.node = k.u JOIN dg dw ON dw.node = k.w
ORDER BY k.u, k.w"""


def support_hull_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.support_hull: the SAME micro-unit
    direction table as a VALUES CTE, per-(tld, dir) argmax via
    row_number (dot DESC, x, y), consecutive-direction shoelace."""
    from ..stages import spatialjoin as sj
    from .oracles import geocoded_cte, pages_cte

    K = sj.HULL_DIRS
    dirs = " UNION ALL ".join(
        f"SELECT {k} AS k, CAST({sj.HULL_DX[k]} AS BIGINT) AS dx,"
        f" CAST({sj.HULL_DY[k]} AS BIGINT) AS dy"
        for k in range(K))
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
dirs AS ({dirs}),
pts AS (
  SELECT string_split(split_part(url, '/', 3), '.')[-1] AS tld,
    CAST(floor(lat * 1e6 + 0.5) AS BIGINT) AS x,
    CAST(floor(lon * 1e6 + 0.5) AS BIGINT) AS y
  FROM geocoded
), sup AS (
  SELECT pts.tld, dirs.k, pts.x, pts.y,
    row_number() OVER (PARTITION BY pts.tld, dirs.k
      ORDER BY dirs.dx * pts.x + dirs.dy * pts.y DESC, pts.x, pts.y) AS rn
  FROM pts CROSS JOIN dirs
), pick AS (
  SELECT tld, k, x, y FROM sup WHERE rn = 1
), area AS (
  SELECT a.tld, CAST(sum(a.x * b.y - b.x * a.y) AS BIGINT) AS area2
  FROM pick a JOIN pick b ON b.tld = a.tld AND b.k = (a.k + 1) % {K}
  GROUP BY a.tld
)
SELECT pick.tld, pick.k AS dir, pick.x, pick.y, area.area2
FROM pick JOIN area ON area.tld = pick.tld
ORDER BY pick.tld, pick.k"""


def welch_ttest_sql(groups: tuple[str, str] | None = None) -> str:
    """Oracle of stages/sketch.welch_ttest: HUGEINT per-group moments,
    the identical a/b variance-over-n trees, t and Welch-Satterthwaite
    dof as shared float expressions."""
    from ..stages import sketch
    from .oracles import round6

    ga, gb = sketch.KS_LANGS if groups is None else groups
    mk = lambda s: (f"CAST({s}n * {s}s2 - {s}s1 * {s}s1 AS DOUBLE)"
                    f" / CAST({s}n * ({s}n - 1) AS DOUBLE)"
                    f" / CAST({s}n AS DOUBLE)")  # noqa: E731
    a, b = mk("a."), mk("b.")
    ma = "CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)"
    mb = "CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)"
    return f"""WITH t AS (
  SELECT lang AS g, CAST(n_chars AS HUGEINT) AS v FROM documents
  WHERE lang IN ('{ga}', '{gb}')
), m AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n, CAST(sum(v) AS HUGEINT) AS s1,
    CAST(sum(v * v) AS HUGEINT) AS s2
  FROM t GROUP BY g
), a AS (SELECT * FROM m WHERE g = '{ga}'),
b AS (SELECT * FROM m WHERE g = '{gb}')
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
  {round6(ma)} AS mean_a, {round6(mb)} AS mean_b,
  {round6(f"(({ma}) - ({mb})) / sqrt(({a}) + ({b}))")} AS t,
  {round6(f"(({a}) + ({b})) * (({a}) + ({b}))"
          f" / (({a}) * ({a}) / CAST(a.n - 1 AS DOUBLE)"
          f" + ({b}) * ({b}) / CAST(b.n - 1 AS DOUBLE))")} AS dof
FROM a, b"""


def heaps_law_sql(quarters: int | None = None) -> str:
    """Oracle of stages/textops.heaps_law: prefix quartiles by
    doc_id < (N*q)//Q, vocabulary via per-token min(doc_id), ordered
    list_reduce OLS folds of ln V on ln n."""
    from ..stages import textops
    from .oracles import round6

    Q = textops.HEAPS_Q if quarters is None else quarters
    return f"""WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS tok
  FROM documents
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), th AS (
  SELECT CAST(q.q AS BIGINT) AS q, (nd.n * q.q) // {Q} AS t
  FROM (SELECT unnest(range(1, {Q + 1})) AS q) q, nd
), ntok AS (
  SELECT th.q, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks JOIN th ON toks.doc_id < th.t GROUP BY th.q
), tmin AS (
  SELECT tok, min(doc_id) AS mind FROM toks GROUP BY tok
), voc AS (
  SELECT th.q, CAST(count(*) AS BIGINT) AS vocab
  FROM tmin JOIN th ON tmin.mind < th.t GROUP BY th.q
), pts AS (
  SELECT ntok.q, ntok.n_tokens, voc.vocab,
    ln(CAST(ntok.n_tokens AS DOUBLE)) AS x,
    ln(CAST(voc.vocab AS DOUBLE)) AS y
  FROM ntok JOIN voc ON voc.q = ntok.q
), mom AS (
  SELECT list_reduce(list(x ORDER BY q), (a, b) -> a + b) AS sx,
    list_reduce(list(y ORDER BY q), (a, b) -> a + b) AS sy,
    list_reduce(list(x * y ORDER BY q), (a, b) -> a + b) AS sxy,
    list_reduce(list(x * x ORDER BY q), (a, b) -> a + b) AS sxx
  FROM pts
), fit AS (
  SELECT ({Q} * sxy - sx * sy) / ({Q} * sxx - sx * sx) AS beta, sx, sy
  FROM mom
)
SELECT pts.q, pts.n_tokens, pts.vocab,
  {round6('fit.beta')} AS beta,
  {round6(f'(fit.sy - fit.beta * fit.sx) / {Q}')} AS lnk
FROM pts, fit ORDER BY pts.q"""


def cume_dist_len_sql() -> str:
    """Oracle of stages/sketch.cume_dist_len: the window function
    itself, rounded canonically."""
    from .oracles import round6

    return f"""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
  {round6('cume_dist() OVER (PARTITION BY lang ORDER BY n_chars)')} AS cume
FROM documents ORDER BY doc_id"""


def jitter_rose_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.jitter_rose: micro-degree integer
    displacements from the base TLD centroid (_tld_case without the
    jitter term), pure sign/abs sector CASE."""
    from ..functions import geocode
    from .oracles import _tld_case, geocoded_cte, pages_cte

    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
disp AS (
  SELECT {_tld_case(m, 0)} AS tld,
    CAST(floor(g.lat * 1e6 + 0.5) AS BIGINT)
      - CAST(floor(({_tld_case(m, 1)}) * 1e6 + 0.5) AS BIGINT) AS dx,
    CAST(floor(g.lon * 1e6 + 0.5) AS BIGINT)
      - CAST(floor(({_tld_case(m, 2)}) * 1e6 + 0.5) AS BIGINT) AS dy
  FROM geocoded g JOIN documents d ON d.doc_id = g.page_id
), sec AS (
  SELECT tld,
    2 * (CASE WHEN dx >= 0 AND dy >= 0 THEN 0
              WHEN dx < 0 AND dy >= 0 THEN 1
              WHEN dx < 0 THEN 2 ELSE 3 END)
    + (CASE WHEN abs(dy) > abs(dx) THEN 1 ELSE 0 END) AS sector
  FROM disp
)
SELECT tld, CAST(sector AS BIGINT) AS sector,
  CAST(count(*) AS BIGINT) AS n
FROM sec GROUP BY 1, 2 ORDER BY 1, 2"""


def join_counts_sql(res: int) -> str:
    """Oracle of stages/hotspot.join_counts: per-(q, r) cell colors,
    3-positive-direction adjacency join (each undirected edge once),
    non-free-sampling expectations with one division each."""
    from .oracles import geocoded_cte, pages_cte, round6

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
cells AS (
  SELECT q, r, CAST(count(*) AS BIGINT) AS pages,
    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en
  FROM geocoded GROUP BY q, r
), col AS (
  SELECT q, r, (2 * en >= pages) AS black FROM cells
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN black THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM col
), e AS (
  SELECT a.black AS ba, b.black AS bb
  FROM col a JOIN col b ON
    (b.q = a.q + 1 AND b.r = a.r) OR
    (b.q = a.q AND b.r = a.r + 1) OR
    (b.q = a.q + 1 AND b.r = a.r - 1)
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS edges,
    CAST(sum(CASE WHEN ba AND bb THEN 1 ELSE 0 END) AS BIGINT) AS bb,
    CAST(sum(CASE WHEN NOT ba AND NOT bb THEN 1 ELSE 0 END) AS BIGINT)
      AS ww,
    CAST(sum(CASE WHEN ba <> bb THEN 1 ELSE 0 END) AS BIGINT) AS bw
  FROM e
)
SELECT tot.n AS n_cells, tot.m AS n_black, agg.edges, agg.bb, agg.bw,
  agg.ww,
  {round6('CAST(agg.edges * tot.m * (tot.m - 1) AS DOUBLE)'
          ' / CAST(tot.n * (tot.n - 1) AS DOUBLE)')} AS e_bb,
  {round6('CAST(agg.edges * 2 * tot.m * (tot.n - tot.m) AS DOUBLE)'
          ' / CAST(tot.n * (tot.n - 1) AS DOUBLE)')} AS e_bw
FROM tot, agg"""


def top_docs_by_lang_sql(k: int | None = None) -> str:
    """Oracle of stages/sketch.top_docs_by_lang: dense_rank() <= k."""
    from ..stages import sketch

    kk = sketch.TOPDOC_K if k is None else k
    return f"""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
  CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT doc_id, lang, n_chars,
    dense_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rnk
  FROM documents
) WHERE rnk <= {kk} ORDER BY doc_id"""


def weighted_sample_sql(k: int | None = None) -> str:
    """Oracle of stages/sketch.weighted_sample: identical splitmix64
    chain, exact HUGEINT priority floor(w * 2^64 / (h + 1)), ORDER BY
    priority DESC, doc_id LIMIT k (float-free ordering — see the
    engine docstring for why ln keys are not usable)."""
    from ..stages import sketch

    kk = sketch.WSAMPLE_K if k is None else k
    g = "11400714819323198485"
    return f"""WITH z1 AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
    (CAST(doc_id AS HUGEINT) + {g}) % {_M64} AS z1
  FROM documents
), z2 AS (
  SELECT doc_id, w,
    {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2 FROM z1
), z3 AS (
  SELECT doc_id, w,
    {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3 FROM z2
), hh AS (
  SELECT doc_id, w, xor(z3, z3 >> 31) AS h FROM z3
), keyed AS (
  SELECT doc_id, w AS n_chars,
    (CAST(w AS HUGEINT) << 64) // (h + 1) AS pri
  FROM hh
)
SELECT doc_id, n_chars, CAST(pri AS DOUBLE) AS priority
FROM keyed ORDER BY pri DESC, doc_id LIMIT {kk}"""


def kwic_snippets_sql(term: str | None = None, ctx: int | None = None) -> str:
    """Oracle of stages/textops.kwic_snippets: strpos + substr with the
    same clamped window arithmetic."""
    from ..stages import textops

    t = textops.KWIC_TERM if term is None else term
    c = textops.KWIC_CTX if ctx is None else ctx
    return f"""WITH hits AS (
  SELECT doc_id, CAST(strpos(text, '{t}') AS BIGINT) AS pos, text
  FROM documents WHERE strpos(text, '{t}') > 0
)
SELECT doc_id, pos,
  substr(text, CAST(greatest(1, pos - {c}) AS BIGINT),
         CAST(pos + {len(t)} + {c} - greatest(1, pos - {c}) AS BIGINT))
    AS snippet
FROM hits ORDER BY doc_id"""


def mst_cells_sql(res: int, rounds: int | None = None,
                  jumps: int | None = None) -> str:
    """Oracle of stages/hotspot.mst_cells: unrolled Boruvka — per round a
    MATERIALIZED min-cross-edge selection under (wt, u, w), the same
    mutual-pair least() break, and ``jumps`` pointer-doubling CTEs."""
    from ..stages import hotspot as hs
    from .oracles import geocoded_cte, pages_cte

    R = hs.MST_ROUNDS if rounds is None else rounds
    J = hs.MST_JUMPS if jumps is None else jumps
    parts = [f"""cells AS (
  SELECT min(cell) AS cell, q, r, CAST(count(*) AS BIGINT) AS pages
  FROM geocoded GROUP BY q, r
), edges AS MATERIALIZED (
  SELECT a.cell AS u, b.cell AS w, abs(a.pages - b.pages) AS wt
  FROM cells a JOIN cells b ON
    (b.q = a.q + 1 AND b.r = a.r) OR
    (b.q = a.q AND b.r = a.r + 1) OR
    (b.q = a.q + 1 AND b.r = a.r - 1)
), lab0 AS (
  SELECT cell AS node, cell AS comp FROM cells
)"""]
    for t in range(R):
        parts.append(f"""ce{t} AS MATERIALIZED (
  SELECT e.u, e.w, e.wt, la.comp AS cu, lb.comp AS cw
  FROM edges e JOIN lab{t} la ON la.node = e.u
  JOIN lab{t} lb ON lb.node = e.w
  WHERE la.comp <> lb.comp
), st{t} AS (
  SELECT cu AS comp, cw AS other, u, w, wt FROM ce{t}
  UNION ALL
  SELECT cw AS comp, cu AS other, u, w, wt FROM ce{t}
), sel{t} AS MATERIALIZED (
  SELECT comp, other, u, w, wt FROM (
    SELECT *, row_number() OVER (PARTITION BY comp
      ORDER BY wt, u, w) AS rn
    FROM st{t}
  ) WHERE rn = 1
), un{t} AS (
  SELECT DISTINCT comp FROM lab{t}
), h0_{t} AS (
  SELECT un{t}.comp, coalesce(s.other, un{t}.comp) AS ptr
  FROM un{t} LEFT JOIN sel{t} s ON s.comp = un{t}.comp
), j0_{t} AS MATERIALIZED (
  SELECT a.comp,
    CASE WHEN b.ptr = a.comp THEN least(a.comp, a.ptr) ELSE a.ptr END AS ptr
  FROM h0_{t} a JOIN h0_{t} b ON b.comp = a.ptr
)""")
        for k in range(1, J + 1):
            parts.append(f"""j{k}_{t} AS MATERIALIZED (
  SELECT a.comp, b.ptr FROM j{k - 1}_{t} a JOIN j{k - 1}_{t} b
  ON b.comp = a.ptr
)""")
        parts.append(f"""lab{t + 1} AS MATERIALIZED (
  SELECT l.node, j.ptr AS comp
  FROM lab{t} l JOIN j{J}_{t} j ON j.comp = l.comp
)""")
    sel_union = " UNION ALL ".join(
        f"SELECT u, w, wt FROM sel{t}" for t in range(R))
    body = ",\n".join(parts)
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
{body}
SELECT DISTINCT u, w, CAST(wt AS BIGINT) AS wt
FROM ({sel_union}) ORDER BY u, w"""


def jsonl_roundtrip_sql() -> str:
    """Oracle of sources/pages.jsonl_roundtrip: the original table — a
    MATCH proves the JSONL sink+source preserve rows byte-verbatim."""
    return """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, text
FROM documents ORDER BY doc_id"""


def langs_concat_sql() -> str:
    """Oracle of stages/textops.langs_concat: string_agg(DISTINCT lang
    ORDER BY lang)."""
    return """SELECT source,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
FROM documents GROUP BY source ORDER BY source"""


def boolean_search_sql(must: tuple[str, ...] | None = None,
                       should: tuple[str, ...] | None = None,
                       must_not: tuple[str, ...] | None = None) -> str:
    """Oracle of stages/textops.boolean_search: list_contains over the
    filtered token array, CNF in SQL."""
    from ..stages import textops

    m = textops.BOOL_MUST if must is None else must
    s = textops.BOOL_SHOULD if should is None else should
    nn = textops.BOOL_NOT if must_not is None else must_not
    conds = [f"list_contains(l, '{t}')" for t in m]
    conds += [f"NOT list_contains(l, '{t}')" for t in nn]
    shd = " + ".join(
        f"CASE WHEN list_contains(l, '{t}') THEN 1 ELSE 0 END" for t in s)
    return f"""WITH lt AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS l
  FROM documents
)
SELECT doc_id, CAST({shd} AS BIGINT) AS n_should
FROM lt
WHERE {' AND '.join(conds)} AND ({shd}) > 0
ORDER BY doc_id"""


def k_truss_sql(k: int | None = None, comm_mod: int | None = None,
                rounds: int | None = None) -> str:
    """Oracle of stages/triangles.k_truss: the same fixed-round edge
    peel unrolled — per round a wedge-count support join (MATERIALIZED,
    the kcore discipline) and a support >= k-2 filter."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri

    kk = tri.TRUSS_K if k is None else k
    cm = tri.COMM_MOD if comm_mod is None else comm_mod
    R = tri.TRUSS_ROUNDS if rounds is None else rounds
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    steps = []
    prev = "e0"
    for t in range(1, R + 2):  # R peels + 1 final support readout
        steps.append(f"""adj{t} AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM {prev}
  UNION ALL
  SELECT b, a FROM {prev}
), s{t} AS MATERIALIZED (
  SELECT e.a, e.b, coalesce(w.cn, 0) AS support
  FROM {prev} e LEFT JOIN (
    SELECT n1.nbr AS u, n2.nbr AS w, CAST(count(*) AS BIGINT) AS cn
    FROM adj{t} n1 JOIN adj{t} n2
      ON n1.node = n2.node AND n1.nbr < n2.nbr
    GROUP BY 1, 2
  ) w ON w.u = e.a AND w.w = e.b
)""")
        if t <= R:
            steps.append(f"""e{t} AS MATERIALIZED (
  SELECT a, b FROM s{t} WHERE support >= {kk - 2}
)""")
            prev = f"e{t}"
    body = ",\n".join(steps)
    return f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
),
{body}
SELECT a AS u, b AS w, CAST(support AS BIGINT) AS support
FROM s{R + 1} ORDER BY u, w"""


def trigram_transitions_sql(min_n: int = 2) -> str:
    """Oracle of stages/events.trigram_transitions: two LAGs over the
    same (ts, event_id) order, support-pruned."""
    return f"""WITH seq AS (
  SELECT user_id, event_type AS t3,
    lag(event_type, 1) OVER w AS t2,
    lag(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t1 IS NOT NULL
GROUP BY 1, 2, 3 HAVING count(*) >= {min_n}
ORDER BY 1, 2, 3"""


def mad_outlier_days_sql(k: int | None = None) -> str:
    """Oracle of stages/events.mad_outlier_days: dense daily series,
    rank-rule medians (rn = (n-1)//2 + 1), integer k*MAD comparison."""
    from ..stages import events as ev

    kk = ev.MAD_K if k is None else k
    return f"""WITH cnts AS (
  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), dense AS (
  SELECT g.d, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
  FROM (SELECT unnest(generate_series((SELECT min(d) FROM cnts),
                                      (SELECT max(d) FROM cnts))) AS d) g
  LEFT JOIN cnts c ON c.d = g.d
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM dense
), med AS (
  SELECT cnt AS med FROM (
    SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn FROM dense
  ), n WHERE rn = (n.n - 1) // 2 + 1
), devs AS (
  SELECT dense.d, dense.cnt, abs(dense.cnt - med.med) AS dev
  FROM dense, med
), mad AS (
  SELECT dev AS mad FROM (
    SELECT dev, row_number() OVER (ORDER BY dev) AS rn FROM devs
  ), n WHERE rn = (n.n - 1) // 2 + 1
)
SELECT devs.d AS day, devs.cnt, devs.dev, med.med, mad.mad
FROM devs, med, mad
WHERE devs.dev > {kk} * mad.mad
ORDER BY day"""


def path_entropy_sql() -> str:
    """Oracle of stages/events.path_entropy: per-(user, type) counts,
    the identical micro-quantized term, integer sum per user."""
    return """WITH ct AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_types
  FROM ct GROUP BY user_id
), terms AS (
  SELECT ct.user_id,
    CAST(floor(-(CAST(ct.c AS DOUBLE) / tot.n)
               * ln(CAST(ct.c AS DOUBLE) / tot.n) * 1e6 + 0.5)
         AS BIGINT) AS t
  FROM ct JOIN tot ON tot.user_id = ct.user_id
)
SELECT tot.user_id, tot.n AS n_events, tot.n_types,
  (SELECT CAST(sum(t) AS BIGINT) FROM terms
   WHERE terms.user_id = tot.user_id) AS h_micro
FROM tot ORDER BY tot.user_id"""


def hill_tail_index_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.hill_tail_index: top-(k+1) lengths by
    row_number, ordered ln-difference fold, one division."""
    from ..stages import textops
    from .oracles import round6

    kk = textops.HILL_K if k is None else k
    return f"""WITH ranked AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
    row_number() OVER (ORDER BY n_chars DESC) AS rn
  FROM documents
), xk AS (
  SELECT v AS x_k FROM ranked WHERE rn = {kk + 1}
), f AS (
  SELECT list_reduce(list(
    ln(CAST(r.v AS DOUBLE)) - ln(CAST(xk.x_k AS DOUBLE))
    ORDER BY r.v DESC), (a, b) -> a + b) AS s
  FROM ranked r, xk WHERE r.rn <= {kk}
)
SELECT CAST({kk} AS BIGINT) AS k, xk.x_k,
  {round6(f'f.s / {kk}')} AS hill,
  {round6(f'1.0 / (f.s / {kk})')} AS alpha
FROM f, xk"""


def forecast_backtest_sql() -> str:
    """Oracle of stages/events.forecast_backtest: dense hourly series,
    LAG-based naive predictions, integer absolute-error sums."""
    from .oracles import round6

    return f"""WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), dense AS (
  SELECT g.hr, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM (SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                      (SELECT max(hr) FROM h))) AS hr) g
  LEFT JOIN h ON h.hr = g.hr
), lagged AS (
  SELECT hr, y,
    lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2,
    lag(y, 24) OVER w AS l24,
    row_number() OVER w AS rn
  FROM dense WINDOW w AS (ORDER BY hr)
), scored AS (
  SELECT * FROM lagged WHERE rn > 24
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(abs(y - (2 * l1 - l2))) AS BIGINT) AS e_drift,
    CAST(sum(abs(y - l1)) AS BIGINT) AS e_last,
    CAST(sum(abs(y - l24)) AS BIGINT) AS e_seas
  FROM scored
)
SELECT 'drift2' AS model, n AS n_preds, e_drift AS sum_abs_err,
  {round6('CAST(e_drift AS DOUBLE) / CAST(n AS DOUBLE)')} AS mae,
  {round6('CAST(e_drift AS DOUBLE) / CAST(e_last AS DOUBLE)')} AS mase
FROM agg
UNION ALL
SELECT 'last_value', n, e_last,
  {round6('CAST(e_last AS DOUBLE) / CAST(n AS DOUBLE)')},
  {round6('CAST(e_last AS DOUBLE) / CAST(e_last AS DOUBLE)')}
FROM agg
UNION ALL
SELECT 'seasonal_24', n, e_seas,
  {round6('CAST(e_seas AS DOUBLE) / CAST(n AS DOUBLE)')},
  {round6('CAST(e_seas AS DOUBLE) / CAST(e_last AS DOUBLE)')}
FROM agg
ORDER BY model"""


def spatial_thin_sql(res: int) -> str:
    """Oracle of stages/gridops.spatial_thin: min page_id per cell with
    its row payload via row_number, plus the per-cell count."""
    from .oracles import geocoded_cte, pages_cte

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
ranked AS (
  SELECT cell, page_id, lat, lon,
    row_number() OVER (PARTITION BY cell ORDER BY page_id) AS rn,
    CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_in_cell
  FROM geocoded
)
SELECT cell, page_id, lat, lon, n_in_cell
FROM ranked WHERE rn = 1 ORDER BY cell"""


def event_doc_join_sql() -> str:
    """Oracle of stages/events.event_doc_join: regexp k extraction,
    inner join to documents, per-lang rollup with exact cents."""
    return """WITH ev AS (
  SELECT TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), j AS (
  SELECT d.lang, ev.k, ev.cents
  FROM ev JOIN documents d ON d.doc_id = ev.k
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT k) AS BIGINT) AS n_docs,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM j GROUP BY lang ORDER BY lang"""


def transition_dwell_sql() -> str:
    """Oracle of stages/events.transition_dwell: LAG pairs with integer
    microsecond gaps, floor-division mean."""
    return """WITH seq AS (
  SELECT user_id, event_type AS to_type,
    lag(event_type) OVER w AS from_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(gap_us) AS BIGINT) AS total_gap_us,
  CAST(sum(gap_us) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_gap_us
FROM seq WHERE from_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2"""


def diameter_sweep_sql(rounds: int | None = None) -> str:
    """Oracle of stages/pagerank.diameter_sweep: two unrolled BFS
    relaxation chains over the undirected edge set, argmax hop by
    (dist DESC, host) between them."""
    from ..functions import geocode
    from ..stages import pagerank as pr

    R = pr.SWEEP_ROUNDS if rounds is None else rounds
    mult = geocode.TLD_MULT
    mod = geocode.HOST_MOD
    host = f"(doc_id * {mult}) % {mod}"
    nd = "(SELECT count(*) FROM documents)"
    dhost1 = (f"(((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}")
    dhost2 = (f"(((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2})"
              f" % {nd}) * {mult}) % {mod}")

    def chain(tag: str, seed_cte: str):
        steps = []
        prev = f"{tag}0"
        for i in range(1, R + 1):
            steps.append(f"""{tag}{i} AS MATERIALIZED (
  SELECT host, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT host, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS host, d.dist + 1 AS dist
    FROM uedges e JOIN {prev} d ON e.src = d.host
  ) GROUP BY host
)""")
            prev = f"{tag}{i}"
        return f"{seed_cte},\n" + ",\n".join(steps), prev

    c1, last1 = chain("a", """a0 AS (
  SELECT (SELECT min(host) FROM hosts) AS host, CAST(0 AS BIGINT) AS dist
)""")
    c2, last2 = chain("b", f"""far AS (
  SELECT host AS fh, dist AS ecc1 FROM {last1}
  ORDER BY dist DESC, host LIMIT 1
), b0 AS (
  SELECT fh AS host, CAST(0 AS BIGINT) AS dist FROM far
)""")
    return f"""WITH hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
), uedges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT {host} AS src, {dhost1} AS dst FROM documents
    UNION ALL
    SELECT {host} AS src, {dhost2} AS dst FROM documents
    UNION ALL
    SELECT {dhost1} AS src, {host} AS dst FROM documents
    UNION ALL
    SELECT {dhost2} AS src, {host} AS dst FROM documents
  ) WHERE src <> dst
),
{c1},
{c2}
SELECT (SELECT min(host) FROM hosts) AS start,
  far.ecc1, far.fh AS far_node,
  (SELECT CAST(max(dist) AS BIGINT) FROM {last2}) AS ecc2
FROM far"""


def circular_stats_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.circular_stats: the same
    once-quantized unit vectors (sqrt is IEEE-exact), integer sums,
    one sqrt tree per TLD."""
    from ..functions import geocode
    from .oracles import _tld_case, geocoded_cte, pages_cte, round6

    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
disp AS (
  SELECT {_tld_case(m, 0)} AS tld,
    CAST(CAST(floor(g.lat * 1e6 + 0.5) AS BIGINT)
      - CAST(floor(({_tld_case(m, 1)}) * 1e6 + 0.5) AS BIGINT)
      AS DOUBLE) AS dx,
    CAST(CAST(floor(g.lon * 1e6 + 0.5) AS BIGINT)
      - CAST(floor(({_tld_case(m, 2)}) * 1e6 + 0.5) AS BIGINT)
      AS DOUBLE) AS dy
  FROM geocoded g JOIN documents d ON d.doc_id = g.page_id
), unit AS (
  SELECT tld,
    CAST(floor(dx / sqrt(dx * dx + dy * dy) * 1e6 + 0.5) AS BIGINT) AS cx,
    CAST(floor(dy / sqrt(dx * dx + dy * dy) * 1e6 + 0.5) AS BIGINT) AS cy
  FROM disp WHERE sqrt(dx * dx + dy * dy) > 0
), agg AS (
  SELECT tld, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cx) AS BIGINT) AS sum_cx, CAST(sum(cy) AS BIGINT) AS sum_cy
  FROM unit GROUP BY tld
)
SELECT tld, n, sum_cx, sum_cy,
  {round6("sqrt(CAST(sum_cx * sum_cx + sum_cy * sum_cy AS DOUBLE))"
          " / CAST(n * 1000000 AS DOUBLE)")} AS r_len
FROM agg ORDER BY tld"""


def active_time_sql(window_us: int | None = None) -> str:
    """Oracle of stages/events.active_time: gaps-and-islands span ids
    via the LAG > window flag, span extents, exact integer union."""
    from ..stages import events as ev

    w = ev.ACTIVE_WINDOW_US if window_us is None else window_us
    return f"""WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) > {w}
         OR lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_span
  FROM events
), spans AS (
  SELECT user_id, t,
    sum(new_span) OVER (PARTITION BY user_id ORDER BY t
      ROWS UNBOUNDED PRECEDING) AS span_id
  FROM seq
), ext AS (
  SELECT user_id, span_id,
    max(t) - min(t) + {w} AS dur
  FROM spans GROUP BY user_id, span_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(dur) AS BIGINT) AS active_us
FROM ext GROUP BY user_id ORDER BY user_id"""


def fisher_ratio_sql(scale: int | None = None) -> str:
    """Oracle of stages/ann.fisher_ratio: per-(label, dim) HUGEINT sums,
    exact |s|^2 ints, per-class float terms with dim folds ORDER BY dim
    and label folds ORDER BY label (all left-associative)."""
    from ..stages import ann

    sc = ann.FISHER_SCALE if scale is None else scale
    return f"""WITH x AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS j,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {sc} + 0.5)
         AS HUGEINT) AS v
  FROM embeddings
), sums AS (
  SELECT label, j, CAST(sum(v) AS HUGEINT) AS s FROM x GROUP BY 1, 2
), cls AS (
  SELECT label, CAST(count(DISTINCT vec_id) AS HUGEINT) AS nc,
    CAST(sum(v * v) AS HUGEINT) AS ssq
  FROM x GROUP BY label
), gl AS (
  SELECT j, CAST(sum(s) AS HUGEINT) AS gs FROM sums GROUP BY j
), gn AS (
  SELECT CAST(sum(nc) AS HUGEINT) AS n FROM cls
), s2 AS (
  SELECT label, CAST(sum(s * s) AS HUGEINT) AS s2 FROM sums GROUP BY label
), bterm AS (
  SELECT sums.label,
    list_reduce(list(
      (CAST(sums.s AS DOUBLE) / CAST(cls.nc AS DOUBLE)
       - CAST(gl.gs AS DOUBLE) / CAST(gn.n AS DOUBLE))
      * (CAST(sums.s AS DOUBLE) / CAST(cls.nc AS DOUBLE)
         - CAST(gl.gs AS DOUBLE) / CAST(gn.n AS DOUBLE))
      ORDER BY sums.j), (a, b) -> a + b) AS bsum
  FROM sums JOIN cls ON cls.label = sums.label
  JOIN gl ON gl.j = sums.j, gn
  GROUP BY sums.label
), terms AS (
  SELECT cls.label,
    CAST(cls.ssq AS DOUBLE)
      - CAST(s2.s2 AS DOUBLE) / CAST(cls.nc AS DOUBLE) AS w,
    CAST(cls.nc AS DOUBLE) * bterm.bsum AS b
  FROM cls JOIN s2 ON s2.label = cls.label
  JOIN bterm ON bterm.label = cls.label
), f AS (
  SELECT list_reduce(list(w ORDER BY label), (a, b) -> a + b) AS within,
    list_reduce(list(b ORDER BY label), (a, b) -> a + b) AS between
  FROM terms
)
SELECT CAST(gn.n AS BIGINT) AS n,
  (SELECT CAST(count(*) AS BIGINT) FROM cls) AS n_classes,
  floor(f.between / f.within * 1000000.0 + 0.5) / 1000000.0 AS fisher
FROM f, gn"""


def anova_eta_sql() -> str:
    """Oracle of stages/sketch.anova_eta: HUGEINT group moments,
    S_g^2/n_g terms folded ORDER BY group, shared ratio trees."""
    from .oracles import round6

    return f"""WITH m AS (
  SELECT lang AS g, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS ss
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(s) AS HUGEINT) AS stot,
    CAST(sum(ss) AS HUGEINT) AS ssq,
    CAST(count(*) AS BIGINT) AS k
  FROM m
), f AS (
  SELECT list_reduce(list(
    CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY g),
    (a, b) -> a + b) AS bsum
  FROM m
), parts AS (
  SELECT tot.nn, tot.k,
    f.bsum - CAST(tot.stot * tot.stot AS DOUBLE)
      / CAST(tot.nn AS DOUBLE) AS ssb,
    CAST(tot.ssq AS DOUBLE) - f.bsum AS ssw,
    CAST(tot.ssq AS DOUBLE) - CAST(tot.stot * tot.stot AS DOUBLE)
      / CAST(tot.nn AS DOUBLE) AS sst
  FROM tot, f
)
SELECT CAST(nn AS BIGINT) AS n, k,
  {round6('(ssb / CAST(k - 1 AS DOUBLE))'
          ' / (ssw / CAST(nn - k AS DOUBLE))')} AS f_stat,
  {round6('ssb / sst')} AS eta2
FROM parts"""


def bounce_rate_sql(gap_us: int | None = None) -> str:
    """Oracle of stages/events.bounce_rate: sessionize islands, per-
    session size + start day, per-day rollup."""
    from ..stages import events as ev

    g = ev.SESSION_GAP_US if gap_us is None else gap_us
    return f"""WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) > {g}
         OR lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, t,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
), per AS (
  SELECT user_id, sid, min(t) // 86400000000 AS day,
    count(*) AS sz
  FROM sess GROUP BY user_id, sid
), agg AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
    CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
  FROM per GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day, n_sessions, n_bounce,
  floor(CAST(n_bounce AS DOUBLE) / CAST(n_sessions AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 AS rate
FROM agg ORDER BY day"""


def doc_keywords_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.doc_keywords: the tfidf chain wrapped
    with row_number() (score DESC, token)."""
    from ..stages import textops

    kk = textops.KEYWORDS_K if k is None else k
    base = tfidf_sql()
    return f"""WITH base AS ({base})
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, score FROM (
  SELECT doc_id, token, score,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY score DESC, token) AS rnk
  FROM base
) WHERE rnk <= {kk} ORDER BY doc_id, rnk"""


def wilson_ci_sql() -> str:
    """Oracle of stages/textops.wilson_ci: identical float trees with
    the shared micro-unit z constant."""
    from ..stages import textops
    from .oracles import round6

    z = f"(CAST({textops.WILSON_Z6} AS DOUBLE) / 1e6)"
    p = "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))"
    t = "CAST(total AS DOUBLE)"
    denom = f"(1 + {z} * {z} / {t})"
    center = f"({p} + {z} * {z} / (2 * {t}))"
    half = (f"({z} * sqrt({p} * (1 - {p}) / {t}"
            f" + {z} * {z} / (4 * {t} * {t})))")
    return f"""WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), t AS (
  SELECT lang, n, (SELECT CAST(sum(n) AS BIGINT) FROM c) AS total FROM c
)
SELECT lang, n, total,
  {round6(p)} AS share,
  {round6(f'({center} - {half}) / {denom}')} AS lo,
  {round6(f'({center} + {half}) / {denom}')} AS hi
FROM t ORDER BY lang"""


def returning_users_sql() -> str:
    """Oracle of stages/events.returning_users: (user, day) dedup, a
    LAG over each user's day list, day-difference test."""
    return """WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), flg AS (
  SELECT day,
    CASE WHEN day - lag(day) OVER (PARTITION BY user_id ORDER BY day) = 1
         THEN 1 ELSE 0 END AS ret
  FROM ud
), agg AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau,
    CAST(sum(ret) AS BIGINT) AS ret_users
  FROM flg GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day, dau, ret_users,
  floor(CAST(ret_users AS DOUBLE) / CAST(dau AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 AS rate
FROM agg ORDER BY day"""


def cell_lang_shift_sql(res: int) -> str:
    """Oracle of stages/hotspot.cell_lang_shift: per-(cell, half, lang)
    counts, row_number majority with (cnt DESC, lang) ties, flip join."""
    from .oracles import geocoded_cte, pages_cte

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
ct AS (
  SELECT cell, page_id % 2 AS half, lang, CAST(count(*) AS BIGINT) AS c
  FROM geocoded GROUP BY 1, 2, 3
), top AS (
  SELECT cell, half, lang, c FROM (
    SELECT *, row_number() OVER (PARTITION BY cell, half
      ORDER BY c DESC, lang) AS rn
    FROM ct
  ) WHERE rn = 1
)
SELECT a.cell, a.lang AS lang_a, b.lang AS lang_b,
  a.c AS n_a, b.c AS n_b
FROM top a JOIN top b ON b.cell = a.cell AND a.half = 0 AND b.half = 1
WHERE a.lang <> b.lang
ORDER BY a.cell"""


def decayed_counts_sql(half_life_h: int | None = None) -> str:
    """Oracle of stages/events.decayed_counts: identical integer
    right-shift decay against the max timestamp."""
    from ..stages import events as ev

    h = ev.DECAY_HALF_LIFE_H if half_life_h is None else half_life_h
    return f"""WITH mx AS (
  SELECT max(epoch_us(ts)) AS m FROM events
), w AS (
  SELECT event_type,
    CAST({ev.DECAY_UNIT} AS BIGINT)
      >> CAST(least((mx.m - epoch_us(ts)) // {h * 3_600_000_000}, 40)
              AS INT) AS wt
  FROM events, mx
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(wt) AS BIGINT) AS decayed_micro
FROM w GROUP BY event_type ORDER BY event_type"""


def dup_rate_by_source_sql() -> str:
    """Oracle of stages/textops.dup_rate_by_source: window count over
    the text itself, per-source rollup."""
    from .oracles import round6

    return f"""WITH flagged AS (
  SELECT source,
    CASE WHEN count(*) OVER (PARTITION BY text) > 1 THEN 1 ELSE 0 END
      AS is_dup
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(is_dup) AS BIGINT) AS n_dup
  FROM flagged GROUP BY source
)
SELECT source, n_docs, n_dup,
  {round6('CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE)')} AS dup_rate
FROM agg ORDER BY source"""


def spend_gini_sql() -> str:
    """Oracle of stages/events.spend_gini: per-user cent totals,
    row_number over (x, user_id) — tie order irrelevant (sum(i*x) is
    run-invariant), HUGEINT moments, one division."""
    from .oracles import round6

    return f"""WITH t AS (
  SELECT user_id,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
), r AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM t
), a AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s0,
    CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS s1
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_users, CAST(s0 AS BIGINT) AS total_cents,
  {round6('CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)'
          ' / CAST(n * s0 AS DOUBLE)')} AS gini
FROM a"""


def geo_dispersion_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.geo_dispersion: the same
    milli-degree quantization and moment closure in HUGEINT."""
    from ..functions import geocode
    from .oracles import _tld_case, geocoded_cte, pages_cte, round6

    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
pts AS (
  SELECT {_tld_case(m, 0)} AS tld,
    CAST(floor(g.lat * 1e3 + 0.5) AS HUGEINT) AS x,
    CAST(floor(g.lon * 1e3 + 0.5) AS HUGEINT) AS y
  FROM geocoded g JOIN documents d ON d.doc_id = g.page_id
), agg AS (
  SELECT tld, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(x * x + y * y) AS HUGEINT) AS sq
  FROM pts GROUP BY tld
)
SELECT tld, CAST(n AS BIGINT) AS n,
  {round6('CAST(2 * (n * sq - sx * sx - sy * sy) AS DOUBLE)'
          ' / CAST(n * (n - 1) AS DOUBLE)')} AS msd
FROM agg WHERE n >= 2 ORDER BY tld"""


def value_robust_by_type_sql(trim: float | None = None) -> str:
    """Oracle of robust_stats over event cents per type (the
    robust_stats_sql chain re-pointed at events)."""
    from ..stages import sketch

    t = sketch.TRIM_FRAC if trim is None else trim
    return f"""WITH lens AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), st AS (
  SELECT event_type, v,
    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rk,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM lens
), med AS (
  SELECT event_type, CAST(n AS BIGINT) AS n, min(v) AS median
  FROM st WHERE rk = (n - 1) // 2 GROUP BY event_type, n
), dst AS (
  SELECT l.event_type, abs(l.v - m.median) AS d,
    row_number() OVER (PARTITION BY l.event_type
      ORDER BY abs(l.v - m.median)) - 1 AS rk,
    count(*) OVER (PARTITION BY l.event_type) AS n
  FROM lens l JOIN med m ON l.event_type = m.event_type
), mad AS (
  SELECT event_type, min(d) AS mad FROM dst WHERE rk = (n - 1) // 2
  GROUP BY event_type
), tr AS (
  SELECT event_type, CAST(sum(v) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM st
  WHERE rk >= CAST(floor(n * {t}) AS BIGINT)
    AND rk < n - CAST(floor(n * {t}) AS BIGINT)
  GROUP BY event_type
)
SELECT m.event_type, m.n, m.median, mad.mad,
  floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) * 1e6 + 0.5) / 1e6
    AS trimmed_mean
FROM med m JOIN mad ON m.event_type = mad.event_type
JOIN tr ON m.event_type = tr.event_type
ORDER BY m.event_type"""


def clark_evans_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.clark_evans: brute cross-join NN
    (min d2 then one sqrt, micro-quantized per point), bbox expected
    mean, shared R tree."""
    from .oracles import geocoded_cte, pages_cte, round6

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
pts AS (
  SELECT page_id, lat, lon FROM geocoded
), nn AS (
  SELECT a.page_id,
    CAST(floor(sqrt(min((a.lat - b.lat) * (a.lat - b.lat)
                        + (a.lon - b.lon) * (a.lon - b.lon)))
               * 1e6 + 0.5) AS BIGINT) AS q
  FROM pts a JOIN pts b ON b.page_id <> a.page_id
  GROUP BY a.page_id
), agg AS (
  SELECT CAST(sum(q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM nn
), bbox AS (
  SELECT (max(lat) - min(lat)) * (max(lon) - min(lon)) AS area FROM pts
)
SELECT agg.c AS n, agg.s AS sum_nn_micro,
  {round6("(CAST(agg.s AS DOUBLE) / CAST(agg.c AS DOUBLE) / 1e6)"
          " / (0.5 / sqrt(CAST(agg.c AS DOUBLE) / bbox.area))")}
    AS r_index
FROM agg, bbox"""


def containment_pairs_sql(threshold: float = 0.9) -> str:
    """Oracle of stages/textops.containment_pairs (max_df=None exact
    semantics): distinct postings self-join, |A & B| / min(|A|, |B|)."""
    from .oracles import D, round6

    return f"""WITH toks AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS token
  FROM documents
), sz AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM toks GROUP BY doc_id
), inter AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, CAST(count(*) AS BIGINT) AS sh
  FROM toks t1 JOIN toks t2
    ON t2.token = t1.token AND t2.doc_id > t1.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
  {round6('CAST(i.sh AS DOUBLE) / CAST(least(sa.s, sb.s) AS DOUBLE)')}
    AS containment
FROM inter i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
WHERE CAST(i.sh AS DOUBLE) / CAST(least(sa.s, sb.s) AS DOUBLE)
      >= {D(threshold)}
ORDER BY i.a, i.b"""


def cell_lang_entropy_sql(res: int) -> str:
    """Oracle of stages/hotspot.cell_lang_entropy: the identical
    micro-quantized term, integer sum per cell."""
    from .oracles import geocoded_cte, pages_cte

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
ct AS (
  SELECT cell, lang, CAST(count(*) AS BIGINT) AS c
  FROM geocoded GROUP BY 1, 2
), tot AS (
  SELECT cell, CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_langs
  FROM ct GROUP BY cell
), terms AS (
  SELECT ct.cell,
    CAST(floor(-(CAST(ct.c AS DOUBLE) / tot.n)
               * ln(CAST(ct.c AS DOUBLE) / tot.n) * 1e6 + 0.5)
         AS BIGINT) AS t
  FROM ct JOIN tot ON tot.cell = ct.cell
)
SELECT tot.cell, tot.n, tot.n_langs,
  (SELECT CAST(sum(t) AS BIGINT) FROM terms
   WHERE terms.cell = tot.cell) AS h_micro
FROM tot ORDER BY tot.cell"""


def type_drift_days_sql() -> str:
    """Oracle of stages/events.type_drift_days: per-(day, type) counts,
    O^2/G terms folded ORDER BY type per day, (N/n)*S - n."""
    from .oracles import round6

    return f"""WITH ct AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS gc FROM ct GROUP BY 1
), nn AS (
  SELECT CAST(sum(gc) AS BIGINT) AS n FROM g
), per AS (
  SELECT ct.day, CAST(sum(ct.c) AS BIGINT) AS nd,
    list_reduce(list(
      CAST(ct.c * ct.c AS DOUBLE) / CAST(g.gc AS DOUBLE)
      ORDER BY ct.event_type), (a, b) -> a + b) AS s
  FROM ct JOIN g ON g.event_type = ct.event_type
  GROUP BY ct.day
)
SELECT CAST(per.day AS BIGINT) AS day, per.nd AS n,
  {round6('CAST(nn.n AS DOUBLE) / CAST(per.nd AS DOUBLE) * per.s'
          ' - CAST(per.nd AS DOUBLE)')} AS chi2
FROM per, nn ORDER BY day"""


def spend_rate_sql(window_us: int | None = None) -> str:
    """Oracle of stages/events.spend_rate: the active_time islands plus
    per-user cent totals, cents per active second."""
    from ..stages import events as ev

    w = ev.ACTIVE_WINDOW_US if window_us is None else window_us
    return f"""WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) > {w}
         OR lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_span
  FROM events
), spans AS (
  SELECT user_id, t,
    sum(new_span) OVER (PARTITION BY user_id ORDER BY t
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
), act AS (
  SELECT user_id, CAST(sum(dur) AS BIGINT) AS active_us FROM (
    SELECT user_id, max(t) - min(t) + {w} AS dur
    FROM spans GROUP BY user_id, sid
  ) GROUP BY user_id
), sp AS (
  SELECT user_id,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
)
SELECT sp.user_id, sp.cents, act.active_us,
  floor(CAST(sp.cents AS DOUBLE)
        / (CAST(act.active_us AS DOUBLE) / 1e6) * 1000000.0 + 0.5)
    / 1000000.0 AS rate
FROM sp JOIN act ON act.user_id = sp.user_id
ORDER BY sp.user_id"""


def shard_conductance_sql(comm_mod: int | None = None,
                          k: int | None = None) -> str:
    """Oracle of stages/triangles.shard_conductance: arithmetic shard
    labels (node // ceil(cm/k)), per-shard intra/cut rollups,
    phi = cut / least(vol, 2m - vol)."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri
    from .oracles import round6

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    kk = tri.SHARD_K if k is None else k
    w = (cm + kk - 1) // kk
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    return f"""WITH e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), ej AS (
  SELECT a // {w} AS la, b // {w} AS lb FROM e0
), per AS (
  SELECT l, CAST(sum(i) AS BIGINT) AS intra, CAST(sum(c) AS BIGINT) AS cut
  FROM (
    SELECT la AS l, 1 AS i, 0 AS c FROM ej WHERE la = lb
    UNION ALL
    SELECT la, 0, 1 FROM ej WHERE la <> lb
    UNION ALL
    SELECT lb, 0, 1 FROM ej WHERE la <> lb
  ) GROUP BY l
), mm AS (
  SELECT CAST(sum(intra) + sum(cut) // 2 AS BIGINT) AS m FROM per
)
SELECT per.l AS shard, 2 * per.intra + per.cut AS vol, per.cut,
  {round6('CAST(per.cut AS DOUBLE)'
          ' / CAST(least(2 * per.intra + per.cut,'
          ' 2 * mm.m - 2 * per.intra - per.cut) AS DOUBLE)')} AS phi
FROM per, mm
WHERE least(2 * per.intra + per.cut,
            2 * mm.m - 2 * per.intra - per.cut) > 0
ORDER BY shard"""


def smooth_residuals_sql(res: int, k: int = 1, profile: str = "uniform",
                         pct_num: int = 9, pct_den: int = 10) -> str:
    """Oracle of stages/smooth.smooth_residuals: the smooth_sql gather
    tree quantized to micro-units, integer residuals, rank threshold."""
    from .oracles import offsets_values, prelude

    return f"""{prelude(res)},
offsets(dq, dr, w) AS (VALUES
    {offsets_values(k, profile)}),
sm AS (
  SELECT c.cell, c.page_count,
    CAST(floor(sum(n.page_count * o.w) / sum(o.w) * 1e6 + 0.5) AS BIGINT)
      AS sm_micro
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell, c.page_count
), resid AS (
  SELECT cell, page_count,
    CAST(page_count AS BIGINT) * 1000000 - sm_micro AS rm
  FROM sm
), th AS (
  SELECT abs(rm) AS a, row_number() OVER (ORDER BY abs(rm)) AS rn,
    count(*) OVER () AS n
  FROM resid
), thr AS (
  SELECT a FROM th WHERE rn = ((n - 1) * {pct_num}) // {pct_den} + 1
)
SELECT resid.cell, CAST(resid.page_count AS BIGINT) AS page_count,
  resid.rm AS resid_micro, CAST(thr.a AS BIGINT) AS thr_micro
FROM resid, thr WHERE abs(resid.rm) >= thr.a
ORDER BY resid.cell"""


def embedding_stats_sql(scale: int | None = None) -> str:
    """Oracle of stages/ann.embedding_stats: per-vector integer squared
    norms (one IEEE sqrt each, micro-quantized), HUGEINT mean-vector
    sum of squares, shared anisotropy tree."""
    from ..stages import ann

    sc = ann.FISHER_SCALE if scale is None else scale
    return f"""WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS j,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {sc} + 0.5)
         AS HUGEINT) AS v
  FROM embeddings
), pern AS (
  SELECT vec_id,
    CAST(floor(sqrt(CAST(sum(v * v) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      AS nm
  FROM x GROUP BY vec_id
), dims AS (
  SELECT j, CAST(sum(v) AS HUGEINT) AS s FROM x GROUP BY j
), tot AS (
  SELECT CAST(sum(nm) AS BIGINT) AS snm,
    (SELECT CAST(count(*) AS BIGINT) FROM pern) AS n,
    (SELECT CAST(count(*) AS BIGINT) FROM dims) AS dim,
    (SELECT CAST(sum(s * s) AS HUGEINT) FROM dims) AS ss
  FROM pern
)
SELECT n, dim, snm AS sum_norm_micro,
  floor(sqrt(CAST(ss AS DOUBLE)) / (CAST(snm AS DOUBLE) / 1e6)
        * 1000000.0 + 0.5) / 1000000.0 AS anisotropy
FROM tot"""


def entry_paths_sql(max_len: int = 3, min_users: int = 2) -> str:
    """Oracle of stages/events.entry_paths: per-user ordered string_agg
    capped at max_len, path groups with HAVING."""
    return f"""WITH seq AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS path
  FROM seq WHERE rn <= {max_len} GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users,
  CAST(min(user_id) AS BIGINT) AS min_user
FROM paths GROUP BY path HAVING count(*) >= {min_users}
ORDER BY path"""


def quality_by_source_sql() -> str:
    """Oracle of stages/textops.quality_by_source: the gopher_quality
    chain joined back to the source column, per-source rollup with
    shared rate/lift trees."""
    from .oracles import round6

    base = gopher_quality_sql()
    return f"""WITH gq AS ({base}),
j AS (
  SELECT d.source, CASE WHEN gq.passes THEN 1 ELSE 0 END AS p
  FROM gq JOIN documents d ON d.doc_id = gq.doc_id
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(p) AS BIGINT) AS np FROM j GROUP BY source
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(np) AS BIGINT) AS pp
  FROM agg
)
SELECT agg.source, agg.n, agg.np AS n_pass,
  {round6('CAST(agg.np AS DOUBLE) / CAST(agg.n AS DOUBLE)')} AS rate,
  {round6('(CAST(agg.np AS DOUBLE) / CAST(agg.n AS DOUBLE))'
          ' / (CAST(tot.pp AS DOUBLE) / CAST(tot.nn AS DOUBLE))')} AS lift
FROM agg, tot ORDER BY agg.source"""


def weekend_lift_sql() -> str:
    """Oracle of stages/events.weekend_lift: (epoch_day + 3) % 7
    weekday convention, dense day-range denominators, shared lift
    tree."""
    from .oracles import round6

    return f"""WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d FROM events
), rng AS (
  SELECT min(d) AS lo, max(d) AS hi FROM ev
), days AS (
  SELECT unnest(generate_series((SELECT lo FROM rng),
                                (SELECT hi FROM rng))) AS d
), dk AS (
  SELECT CAST(sum(CASE WHEN (d + 3) % 7 >= 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS we_days,
    CAST(sum(CASE WHEN (d + 3) % 7 >= 5 THEN 0 ELSE 1 END) AS BIGINT)
      AS wd_days
  FROM days
), ct AS (
  SELECT event_type,
    CAST(sum(CASE WHEN (d + 3) % 7 >= 5 THEN 0 ELSE 1 END) AS BIGINT)
      AS n_weekday,
    CAST(sum(CASE WHEN (d + 3) % 7 >= 5 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_weekend
  FROM ev GROUP BY event_type
)
SELECT ct.event_type, ct.n_weekday, ct.n_weekend,
  {round6('(CAST(ct.n_weekend AS DOUBLE) / CAST(dk.we_days AS DOUBLE))'
          ' / (CAST(ct.n_weekday AS DOUBLE) / CAST(dk.wd_days AS DOUBLE))')}
    AS lift
FROM ct, dk ORDER BY ct.event_type"""


def bh_fdr_sql(alpha: float | None = None) -> str:
    """Oracle of stages/sketch.bh_fdr: HUGEINT cents moments per
    (event_type, is_weekend), the identical Welch variance-over-n trees,
    A&S 7.1.26 erfc with the engine's exact constants, BH step-up ladder
    over round6-quantized p (row_number / reverse-cummin windows)."""
    from ..stages import sketch
    from .oracles import D, round6

    a_ = sketch.BH_ALPHA if alpha is None else alpha
    a1, a2, a3, a4, a5 = sketch._ERFC_A
    mkA = (lambda p: f"CAST({p}n * {p}s2 - {p}s1 * {p}s1 AS DOUBLE)"
                     f" / CAST({p}n * ({p}n - 1) AS DOUBLE)"
                     f" / CAST({p}n AS DOUBLE)")
    A, B = mkA("wd"), mkA("we")
    mwd = "CAST(wds1 AS DOUBLE) / CAST(wdn AS DOUBLE)"
    mwe = "CAST(wes1 AS DOUBLE) / CAST(wen AS DOUBLE)"
    poly = (f"(((({D(a5)} * u + {D(a4)}) * u + {D(a3)}) * u + {D(a2)}) * u"
            f" + {D(a1)}) * u")
    return f"""WITH ev AS (
  SELECT event_type AS et,
    CAST((epoch_us(ts) // 86400000000 + 3) % 7 >= 5 AS INT) AS we,
    CAST(floor(value * 100.0 + 0.5) AS HUGEINT) AS c
  FROM events
), m0 AS (
  SELECT et, we, CAST(count(*) AS HUGEINT) AS n, sum(c) AS s1,
    sum(c * c) AS s2
  FROM ev GROUP BY et, we
), st AS (
  SELECT w.et, w.n AS wdn, w.s1 AS wds1, w.s2 AS wds2,
         e.n AS wen, e.s1 AS wes1, e.s2 AS wes2
  FROM (SELECT * FROM m0 WHERE we = 0) w
  JOIN (SELECT * FROM m0 WHERE we = 1) e USING (et)
), tt AS (
  SELECT et, CAST(wdn AS BIGINT) AS n_weekday, CAST(wen AS BIGINT) AS n_weekend,
    (({mwe}) - ({mwd})) / sqrt(({A}) + ({B})) AS t_raw
  FROM st
), xx AS (
  SELECT *, abs(t_raw) / sqrt(CAST(2.0 AS DOUBLE)) AS x FROM tt
), uu AS (
  SELECT *, CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + {D(sketch._ERFC_P)} * x) AS u
  FROM xx
), pp AS (
  SELECT et, n_weekday, n_weekend, t_raw,
    {round6(f"({poly}) * exp(-(x * x))")} AS p6
  FROM uu
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY p6, et) AS rn,
    count(*) OVER () AS m
  FROM pp
), ladder AS (
  SELECT *, least(CAST(1.0 AS DOUBLE),
    min(p6 * CAST(m AS DOUBLE) / CAST(rn AS DOUBLE))
      OVER (ORDER BY rn DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    AS padj_raw
  FROM ranked
)
SELECT et AS event_type, n_weekday, n_weekend,
  {round6("t_raw")} AS t, p6 AS p_value,
  {round6("padj_raw")} AS p_adj,
  {round6("padj_raw")} <= {D(a_)} AS reject
FROM ladder ORDER BY et"""


def spend_outliers_sql(k: int | None = None) -> str:
    """Oracle of stages/events.spend_outliers: per-user HUGEINT window
    moments, the identical cross-multiplied integer condition."""
    from ..stages import events as ev

    kk = ev.OUTLIER_SIGMAS if k is None else k
    return f"""WITH c AS (
  SELECT event_id, user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(cents) AS HUGEINT) AS s1,
    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
  FROM c GROUP BY user_id
)
SELECT c.event_id, c.user_id, c.cents
FROM c JOIN m ON m.user_id = c.user_id
WHERE m.n >= 2
  AND m.n * c.cents - m.s1 > 0
  AND (m.n * c.cents - m.s1) * (m.n * c.cents - m.s1)
      > {kk * kk} * (m.n * m.s2 - m.s1 * m.s1)
ORDER BY c.event_id"""


def silhouette_lite_sql(k: int | None = None, iters: int | None = None,
                        dim: int = 64) -> str:
    """Oracle of stages/ann.silhouette_lite: the kmeans Lloyd chain,
    rank-1/rank-2 centroid distances per vector ((d, k) ties), the
    identical per-vector quantized s, per-cluster integer sums."""
    from ..stages import ann

    k = k if k is not None else ann.KMEANS_K
    iters = iters if iters is not None else ann.KMEANS_ITERS
    scale = ann.CENTROID_SCALE
    fdiv = ("CASE WHEN s.sq >= 0 THEN s.sq // s.cnt "
            "ELSE -((-s.sq + s.cnt - 1) // s.cnt) END")
    steps = []
    prev = "c0"
    for t in range(1, iters + 1):
        steps.append(f"""d{t} AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), a{t} AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM d{t}
  ) WHERE rn = 1
), s{t} AS MATERIALIZED (
  SELECT a.k, ev.j, sum(ev.q) AS sq, count(*) AS cnt
  FROM ev JOIN a{t} a ON ev.v = a.v GROUP BY a.k, ev.j
), c{t} AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN s{t} s ON c.k = s.k AND c.j = s.j
)""")
        prev = f"c{t}"
    chain = ",\n".join(steps)
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), c0 AS MATERIALIZED (
  SELECT v AS k, j, q AS val FROM ev WHERE v < {k}
),
{chain},
dF AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), rk AS (
  SELECT v, k, d, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
  FROM dF
), pv AS (
  SELECT r1.v, r1.k AS cluster,
    CASE WHEN r2.d = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(floor((1 - sqrt(CAST(r1.d AS DOUBLE))
                          / sqrt(CAST(r2.d AS DOUBLE))) * 1e6 + 0.5)
              AS BIGINT) END AS sm
  FROM rk r1 JOIN rk r2 ON r2.v = r1.v AND r2.rn = 2
  WHERE r1.rn = 1
)
SELECT CAST(cluster AS BIGINT) AS cluster,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(sm) AS BIGINT) AS s_sum_micro,
  floor(CAST(sum(sm) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
        * 1000000.0 + 0.5) / 1000000.0 AS mean_s
FROM pv GROUP BY cluster ORDER BY cluster"""


def kendall_tau_sql() -> str:
    """Oracle of stages/sketch.kendall_tau: all-pairs concordance over
    the (chars, tokens) pairs, HUGEINT tie corrections, shared sqrt
    tree."""
    from .oracles import round6

    return f"""WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                         s -> s <> '')) AS BIGINT) AS y
  FROM documents
), pairs AS (
  SELECT CAST(sum(CASE WHEN (b.x > a.x AND b.y > a.y)
                         OR (b.x < a.x AND b.y < a.y)
                       THEN 1 ELSE 0 END) AS HUGEINT) AS c,
    CAST(sum(CASE WHEN (b.x > a.x AND b.y < a.y)
                    OR (b.x < a.x AND b.y > a.y)
                  THEN 1 ELSE 0 END) AS HUGEINT) AS d
  FROM t a JOIN t b ON b.doc_id > a.doc_id
), nn AS (
  SELECT CAST(count(*) AS HUGEINT) AS n FROM t
), n1 AS (
  SELECT CAST(sum(c * (c - 1) // 2) AS HUGEINT) AS v FROM (
    SELECT CAST(count(*) AS HUGEINT) AS c FROM t GROUP BY x)
), n2 AS (
  SELECT CAST(sum(c * (c - 1) // 2) AS HUGEINT) AS v FROM (
    SELECT CAST(count(*) AS HUGEINT) AS c FROM t GROUP BY y)
)
SELECT CAST(nn.n AS BIGINT) AS n, CAST(pairs.c AS BIGINT) AS nc,
  CAST(pairs.d AS BIGINT) AS nd,
  {round6("CAST(pairs.c - pairs.d AS DOUBLE)"
          " / (sqrt(CAST(nn.n * (nn.n - 1) // 2 - n1.v AS DOUBLE))"
          " * sqrt(CAST(nn.n * (nn.n - 1) // 2 - n2.v AS DOUBLE)))")}
    AS tau_b
FROM pairs, nn, n1, n2"""


def choropleth_classes_sql(res: int, k: int = 1, profile: str = "uniform",
                           n_classes: int = 4) -> str:
    """Oracle of stages/smooth.choropleth_classes: the smooth gather
    tree micro-quantized, row_number over (sm_micro, cell), the same
    integer class rule."""
    from .oracles import offsets_values, prelude

    return f"""{prelude(res)},
offsets(dq, dr, w) AS (VALUES
    {offsets_values(k, profile)}),
sm AS (
  SELECT c.cell,
    CAST(floor(sum(n.page_count * o.w) / sum(o.w) * 1e6 + 0.5) AS BIGINT)
      AS sm_micro
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell
), rk AS (
  SELECT cell, sm_micro,
    row_number() OVER (ORDER BY sm_micro, cell) AS rn,
    count(*) OVER () AS n
  FROM sm
)
SELECT cell, sm_micro,
  CAST((rn - 1) * {n_classes} // n + 1 AS BIGINT) AS cls
FROM rk ORDER BY cell"""


def tld_lang_divergence_sql() -> str:
    """Oracle of stages/textops.tld_lang_divergence: the full tld x
    lang grid (zero cells included via a cross join), the identical
    add-1 micro-quantized term, integer sums."""
    from .oracles import pages_cte

    return f"""WITH {pages_cte()},
ct AS (
  SELECT string_split(split_part(url, '/', 3), '.')[-1] AS tld, lang,
    CAST(count(*) AS BIGINT) AS c
  FROM pages GROUP BY 1, 2
), langs AS (
  SELECT DISTINCT lang FROM ct
), tlds AS (
  SELECT tld, CAST(sum(c) AS BIGINT) AS n FROM ct GROUP BY tld
), gl AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS g FROM ct GROUP BY lang
), nn AS (
  SELECT CAST(sum(g) AS BIGINT) AS total,
    (SELECT CAST(count(*) AS BIGINT) FROM langs) AS L
  FROM gl
), grid AS (
  SELECT tlds.tld, tlds.n, langs.lang, coalesce(ct.c, 0) AS c, gl.g
  FROM tlds CROSS JOIN langs
  LEFT JOIN ct ON ct.tld = tlds.tld AND ct.lang = langs.lang
  JOIN gl ON gl.lang = langs.lang
), terms AS (
  SELECT tld, n,
    CAST(floor(
      (CAST(c + 1 AS DOUBLE) / CAST(n + nn.L AS DOUBLE))
      * ln((CAST(c + 1 AS DOUBLE) / CAST(n + nn.L AS DOUBLE))
           / (CAST(g + 1 AS DOUBLE) / CAST(nn.total + nn.L AS DOUBLE)))
      * 1e6 + 0.5) AS BIGINT) AS t
  FROM grid, nn
)
SELECT tld, CAST(min(n) AS BIGINT) AS n,
  CAST(sum(t) AS BIGINT) AS kl_micro
FROM terms GROUP BY tld ORDER BY tld"""


def top_type_share_sql() -> str:
    """Oracle of stages/events.top_type_share: row_number over
    (cnt DESC, type), share of the user total."""
    return """WITH ct AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM ct GROUP BY user_id
), top AS (
  SELECT user_id, event_type, c FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
      ORDER BY c DESC, event_type) AS rn
    FROM ct
  ) WHERE rn = 1
)
SELECT top.user_id, top.event_type AS top_type, tot.n AS n_events,
  floor(CAST(top.c AS DOUBLE) / CAST(tot.n AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 AS share
FROM top JOIN tot ON tot.user_id = top.user_id
ORDER BY top.user_id"""


def source_len_drift_sql() -> str:
    """Oracle of stages/sketch.source_len_drift: per-source ECDF vs the
    complement over the global value set, HUGEINT cross-multiplied
    argmax (ties -> smallest value)."""
    from .oracles import round6

    return f"""WITH lens AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
), vals AS (
  SELECT DISTINCT v FROM lens
), srcs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS na FROM lens GROUP BY source
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM lens
), cdf AS (
  SELECT s.source, vals.v, s.na,
    CAST(coalesce((SELECT count(*) FROM lens l
                   WHERE l.source = s.source AND l.v <= vals.v), 0)
         AS HUGEINT) AS sa,
    CAST((SELECT count(*) FROM lens l WHERE l.v <= vals.v)
         AS HUGEINT) AS ga
  FROM srcs s CROSS JOIN vals
), d AS (
  SELECT source, v, na,
    abs(sa * (nn.n - na) - (ga - sa) * na) AS df
  FROM cdf, nn
), best AS (
  SELECT source, v AS at_value, na, df FROM (
    SELECT *, row_number() OVER (PARTITION BY source
      ORDER BY df DESC, v) AS rn
    FROM d
  ) WHERE rn = 1
)
SELECT best.source, best.na AS n, best.at_value,
  {round6('CAST(best.df AS DOUBLE)'
          ' / CAST(best.na * (nn.n - best.na) AS DOUBLE)')} AS ks_d
FROM best, nn ORDER BY best.source"""


def wau_curve_sql(window: int | None = None) -> str:
    """Oracle of stages/events.wau_curve: (user, day) dedup, window
    projection, per-(user, target) dedup, range trim."""
    from ..stages import events as ev

    w = ev.WAU_WINDOW if window is None else window
    return f"""WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
), rng AS (
  SELECT min(d) AS lo, max(d) AS hi FROM ud
), proj AS (
  SELECT DISTINCT user_id, d + o.o AS day
  FROM ud, (SELECT unnest(range({w})) AS o) o
)
SELECT CAST(day AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS wau
FROM proj, rng
WHERE day >= rng.lo AND day <= rng.hi
GROUP BY day ORDER BY day"""


def gap_robust_by_type_sql(trim: float | None = None) -> str:
    """Oracle of robust_stats over per-type inter-event gaps (the
    value_robust_by_type chain on the LAG-gap stream)."""
    from ..stages import sketch

    t = sketch.TRIM_FRAC if trim is None else trim
    return f"""WITH lens AS (
  SELECT lag(event_type) OVER w AS event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS v
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  QUALIFY lag(event_type) OVER w IS NOT NULL
), st AS (
  SELECT event_type, v,
    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rk,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM lens
), med AS (
  SELECT event_type, CAST(n AS BIGINT) AS n, min(v) AS median
  FROM st WHERE rk = (n - 1) // 2 GROUP BY event_type, n
), dst AS (
  SELECT l.event_type, abs(l.v - m.median) AS d,
    row_number() OVER (PARTITION BY l.event_type
      ORDER BY abs(l.v - m.median)) - 1 AS rk,
    count(*) OVER (PARTITION BY l.event_type) AS n
  FROM lens l JOIN med m ON l.event_type = m.event_type
), mad AS (
  SELECT event_type, min(d) AS mad FROM dst WHERE rk = (n - 1) // 2
  GROUP BY event_type
), tr AS (
  SELECT event_type, CAST(sum(v) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM st
  WHERE rk >= CAST(floor(n * {t}) AS BIGINT)
    AND rk < n - CAST(floor(n * {t}) AS BIGINT)
  GROUP BY event_type
)
SELECT m.event_type, m.n, m.median, mad.mad,
  floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) * 1e6 + 0.5) / 1e6
    AS trimmed_mean
FROM med m JOIN mad ON m.event_type = mad.event_type
JOIN tr ON m.event_type = tr.event_type
ORDER BY m.event_type"""


def lang_vocab_overlap_sql(k: int | None = None) -> str:
    """Oracle of stages/textops.lang_vocab_overlap: per-lang top-k by
    (cnt DESC, tok), pairwise intersect/union counts."""
    from ..stages import textops
    from .oracles import round6

    kk = textops.VOCAB_TOPK if k is None else k
    return f"""WITH toks AS (
  SELECT lang,
    unnest(list_filter(regexp_split_to_array(text, '\\s+'), s -> s != ''))
      AS tok
  FROM documents
), ct AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), top AS (
  SELECT lang, tok FROM (
    SELECT *, row_number() OVER (PARTITION BY lang
      ORDER BY cnt DESC, tok) AS rn
    FROM ct
  ) WHERE rn <= {kk}
), sz AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS s FROM top GROUP BY lang
), inter AS (
  SELECT a.lang AS la, b.lang AS lb, CAST(count(*) AS BIGINT) AS ov
  FROM top a JOIN top b ON b.tok = a.tok AND b.lang > a.lang
  GROUP BY 1, 2
), pairs AS (
  SELECT sa.lang AS lang_a, sb.lang AS lang_b,
    coalesce(i.ov, 0) AS overlap, sa.s + sb.s - coalesce(i.ov, 0) AS un
  FROM sz sa JOIN sz sb ON sb.lang > sa.lang
  LEFT JOIN inter i ON i.la = sa.lang AND i.lb = sb.lang
)
SELECT lang_a, lang_b, CAST(overlap AS BIGINT) AS overlap,
  {round6('CAST(overlap AS DOUBLE) / CAST(un AS DOUBLE)')} AS jaccard
FROM pairs ORDER BY lang_a, lang_b"""


def spend_concentration_sql(k: int | None = None) -> str:
    """Oracle of stages/events.spend_concentration: per-user cent
    totals, (cents DESC, user_id) ranks, cumulative window, one round6
    share."""
    from ..stages import events as ev

    kk = ev.SPEND_TOP_K if k is None else k
    return f"""WITH t AS (
  SELECT user_id,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(sum(cents) AS BIGINT) AS g FROM t
), rk AS (
  SELECT user_id, cents,
    row_number() OVER (ORDER BY cents DESC, user_id) AS rnk
  FROM t
), cum AS (
  SELECT rnk, user_id, cents,
    CAST(sum(cents) OVER (ORDER BY rnk
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM rk WHERE rnk <= {kk}
)
SELECT CAST(rnk AS BIGINT) AS rnk, user_id, cents, cum_cents,
  floor(CAST(cum_cents AS DOUBLE) / CAST(tot.g AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 AS cum_share
FROM cum, tot ORDER BY rnk"""


def hub_robustness_sql(comm_mod: int | None = None,
                       n_hubs: int | None = None,
                       rounds: int = 12) -> str:
    """Oracle of stages/triangles.hub_robustness: degree ranks pick the
    hubs ((deg DESC, id)), two hook+jump CC chains (full and
    hub-filtered), largest-label counts."""
    from ..functions import geocode
    from ..stages import pagerank as pr
    from ..stages import triangles as tri
    from .oracles import hook_jump_chain

    cm = comm_mod if comm_mod is not None else tri.COMM_MOD
    nh = tri.HUB_TOP if n_hubs is None else n_hubs
    mult, mod = geocode.TLD_MULT, geocode.HOST_MOD
    nd = "(SELECT count(*) FROM documents)"
    host = f"((doc_id * {mult}) % {mod}) % {cm}"
    dhost1 = (f"((((doc_id * {pr.EDGE_MULT} + {pr.EDGE_ADD}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    dhost2 = (f"((((doc_id * doc_id * {pr.EDGE_MULT2} + {pr.EDGE_ADD2}) % {nd})"
              f" * {mult}) % {mod}) % {cm}")
    chain1, last1 = hook_jump_chain(rounds, start="l0")
    chain2, last2 = hook_jump_chain(rounds, start="m0")
    # second chain needs its own edge alias: rewrite its 'edges' to
    # 'edges2' (hook_jump_chain reads a CTE literally named edges, so we
    # wrap the filtered set under that name inside a separate query via
    # naming: chain2 text references edges -> replace)
    # the shared chain generator names its steps h{i}/l{i} and reads a
    # CTE literally named `edges` — rename BOTH for the second chain
    chain2 = re.sub(r"\b(h|l)(\d+)\b", r"\g<1>\g<2>x", chain2)
    chain2 = chain2.replace("edges", "edges2").replace("m0x", "m0")
    last2 = re.sub(r"\b(l)(\d+)\b", r"\g<1>\g<2>x", last2)
    return f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM (
    SELECT {host} AS s, {dhost1} AS t FROM documents
    UNION ALL
    SELECT {host} AS s, {dhost2} AS t FROM documents
  ) WHERE s <> t
), nodes AS (
  SELECT a AS v FROM e0 UNION SELECT b FROM e0
), dg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY node
), hubs AS (
  SELECT node FROM (
    SELECT node, row_number() OVER (ORDER BY deg DESC, node) AS rn
    FROM dg
  ) WHERE rn <= {nh}
), edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0
  UNION ALL
  SELECT b, a FROM e0
), l0 AS MATERIALIZED (
  SELECT v, v AS l FROM nodes
),
{chain1},
e2 AS MATERIALIZED (
  SELECT a, b FROM e0
  WHERE a NOT IN (SELECT node FROM hubs)
    AND b NOT IN (SELECT node FROM hubs)
), edges2 AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e2
  UNION ALL
  SELECT b, a FROM e2
), m0 AS MATERIALIZED (
  SELECT v, v AS l FROM nodes WHERE v NOT IN (SELECT node FROM hubs)
),
{chain2},
szb AS (
  SELECT CAST(max(c) AS BIGINT) AS lcc FROM (
    SELECT count(*) AS c FROM {last1} GROUP BY l)
), sza AS (
  SELECT CAST(max(c) AS BIGINT) AS lcc FROM (
    SELECT count(*) AS c FROM {last2} GROUP BY l)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
  szb.lcc AS lcc_before, CAST({nh} AS BIGINT) AS n_hubs,
  sza.lcc AS lcc_after
FROM szb, sza"""


def integrity_audit_sql() -> str:
    """Oracle of stages/events.integrity_audit: identical audit
    predicates (sub-cent test on the same IEEE doubles)."""
    return """WITH dups AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS d FROM (
    SELECT count(*) AS c FROM events GROUP BY event_id HAVING count(*) > 1)
), sc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN floor(value * 100 + 0.5) / 100.0 <> value
             THEN 1 ELSE 0 END) AS BIGINT) AS subcent,
    CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos,
    CAST(max(epoch_us(ts) // 86400000000)
         - min(epoch_us(ts) // 86400000000) AS BIGINT) AS span
  FROM events
)
SELECT sc.n AS n_rows, dups.d AS n_dup_ids, sc.subcent AS n_subcent,
  sc.nonpos AS n_nonpos, sc.span AS ts_span_days
FROM sc, dups"""


def median_center_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.median_center: per-(tld, dim) rank
    rules rn = ((n-1)*q)//den + 1 over micro-quantized coordinates."""
    from ..functions import geocode
    from .oracles import _tld_case, geocoded_cte, pages_cte

    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"

    def pick(col, qn, qd):
        return f"""(SELECT v FROM (
    SELECT {col} AS v,
      row_number() OVER (ORDER BY {col}) AS rn,
      count(*) OVER () AS n
    FROM pts p2 WHERE p2.tld = t.tld
  ) WHERE rn = ((n - 1) * {qn}) // {qd} + 1)"""

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
pts AS (
  SELECT {_tld_case(m, 0)} AS tld,
    CAST(floor(g.lat * 1e6 + 0.5) AS BIGINT) AS x,
    CAST(floor(g.lon * 1e6 + 0.5) AS BIGINT) AS y
  FROM geocoded g JOIN documents d ON d.doc_id = g.page_id
), t AS (
  SELECT tld, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY tld
)
SELECT t.tld, t.n,
  {pick('x', 1, 2)} AS med_lat_micro,
  {pick('y', 1, 2)} AS med_lon_micro,
  {pick('x', 3, 4)} - {pick('x', 1, 4)} AS iqr_lat_micro,
  {pick('y', 3, 4)} - {pick('y', 1, 4)} AS iqr_lon_micro
FROM t ORDER BY t.tld"""


def isolated_cells_sql(res: int) -> str:
    """Oracle of stages/hotspot.isolated_cells: ring-1 NOT EXISTS over
    the (q, r) cell table."""
    from .oracles import geocoded_cte, pages_cte

    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
cells AS (
  SELECT min(cell) AS cell, q, r, CAST(count(*) AS BIGINT) AS pages
  FROM geocoded GROUP BY q, r
)
SELECT c.cell, c.pages
FROM cells c
WHERE NOT EXISTS (
  SELECT 1 FROM cells nb
  WHERE (nb.q, nb.r) IN (
    (c.q + 1, c.r), (c.q, c.r + 1), (c.q + 1, c.r - 1),
    (c.q - 1, c.r), (c.q, c.r - 1), (c.q - 1, c.r + 1))
)
ORDER BY c.cell"""


def top_cells_by_tld_sql(res: int, k: int | None = None) -> str:
    """Oracle of stages/gridops.top_cells_by_tld: (pages DESC, cell)
    row_number per TLD."""
    from ..functions import geocode
    from ..stages import gridops
    from .oracles import _tld_case, geocoded_cte, pages_cte

    kk = gridops.TLD_TOPK if k is None else k
    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    return f"""WITH {pages_cte()}, {geocoded_cte(res)},
ct AS (
  SELECT {_tld_case(m, 0)} AS tld, g.cell, CAST(count(*) AS BIGINT)
      AS pages
  FROM geocoded g JOIN documents d ON d.doc_id = g.page_id
  GROUP BY 1, 2
)
SELECT tld, CAST(rnk AS BIGINT) AS rnk, cell, pages FROM (
  SELECT *, row_number() OVER (PARTITION BY tld
    ORDER BY pages DESC, cell) AS rnk
  FROM ct
) WHERE rnk <= {kk} ORDER BY tld, rnk"""


def ivf_tiny_sql(k: int | None = None, n_queries: int | None = None,
                 n_list: int | None = None, n_probe: int | None = None,
                 iters: int | None = None, dim: int = 64) -> str:
    """Oracle of stages/ann.ann_ivf_int: the kmeans_sql Lloyd chain at
    k=n_list, final assignments as the inverted lists, per-query probe of
    the n_probe nearest centroids (ties -> lowest list id, same compound
    ORDER BY d, k), exact int64 re-rank within probed lists, row_number
    top-k by (dist2, vec_id) — every value integer end to end."""
    from ..stages import ann

    k = ann.IVF_TINY_K if k is None else k
    n_queries = ann.IVF_TINY_NQ if n_queries is None else n_queries
    n_list = ann.IVF_TINY_NLIST if n_list is None else n_list
    n_probe = ann.IVF_TINY_NPROBE if n_probe is None else n_probe
    iters = ann.IVF_TINY_ITERS if iters is None else iters
    scale = ann.CENTROID_SCALE
    fdiv = ("CASE WHEN u.sq >= 0 THEN u.sq // u.cnt "
            "ELSE -((-u.sq + u.cnt - 1) // u.cnt) END")
    steps = []
    prev = "c0"
    for t in range(1, iters + 1):
        steps.append(f"""d{t} AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), a{t} AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM d{t}
  ) WHERE rn = 1
), s{t} AS MATERIALIZED (
  SELECT a.k, ev.j, sum(ev.q) AS sq, count(*) AS cnt
  FROM ev JOIN a{t} a ON ev.v = a.v GROUP BY a.k, ev.j
), c{t} AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN s{t} u ON c.k = u.k AND c.j = u.j
)""")
        prev = f"c{t}"
    chain = ",\n".join(steps)
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), c0 AS MATERIALIZED (
  SELECT v AS k, j, q AS val FROM ev WHERE v < {n_list}
),
{chain},
dF AS MATERIALIZED (
  SELECT ev.v, c.k, sum((ev.q - c.val) * (ev.q - c.val)) AS d
  FROM ev JOIN {prev} c ON ev.j = c.j GROUP BY ev.v, c.k
), aF AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM dF
  ) WHERE rn = 1
), probe AS MATERIALIZED (
  SELECT v AS qv, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM dF WHERE v < {n_queries}
  ) WHERE rn <= {n_probe}
), cand AS MATERIALIZED (
  SELECT p.qv, a.v FROM probe p JOIN aF a ON a.k = p.k WHERE a.v <> p.qv
), dist AS MATERIALIZED (
  SELECT c.qv, c.v, sum((eq.q - ex.q) * (eq.q - ex.q)) AS d2
  FROM cand c
  JOIN ev eq ON eq.v = c.qv
  JOIN ev ex ON ex.v = c.v AND ex.j = eq.j
  GROUP BY c.qv, c.v
)
SELECT qv AS query_id, CAST(rn AS BIGINT) AS rank, v AS vec_id,
       CAST(d2 AS BIGINT) AS dist2
FROM (
  SELECT qv, v, d2, row_number() OVER (PARTITION BY qv ORDER BY d2, v) AS rn
  FROM dist
) WHERE rn <= {k}
ORDER BY query_id, rank"""


def lsh_tiny_sql(k: int | None = None, n_queries: int | None = None,
                 n_bits: int | None = None, n_bands: int | None = None,
                 dim: int = 64) -> str:
    """Oracle of stages/ann.ann_lsh_int: integer hyperplanes from the
    4-step splitmix64 chain over key = b*dim + j (coef = h % 65536 -
    32768), exact BIGINT projections -> sign bits -> band values (bit w of
    band t weighted 2^w), candidates = vectors sharing >= 1 band with the
    query (self excluded, DISTINCT pairs), exact int64 squared-L2 re-rank,
    row_number top-k by (dist2, vec_id)."""
    from ..stages import ann

    k = ann.LSH_TINY_K if k is None else k
    n_queries = ann.LSH_TINY_NQ if n_queries is None else n_queries
    n_bits = ann.LSH_TINY_BITS if n_bits is None else n_bits
    n_bands = ann.LSH_TINY_BANDS if n_bands is None else n_bands
    scale = ann.CENTROID_SCALE
    width = n_bits // n_bands
    g = "11400714819323198485"  # golden-ratio increment, mod 2^64
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), pk AS MATERIALIZED (
  SELECT b.b, j.j, CAST(b.b * {dim} + j.j AS HUGEINT) AS x
  FROM (SELECT unnest(generate_series(0, {n_bits - 1})) AS b) b,
       (SELECT unnest(generate_series(0, {dim - 1})) AS j) j
), z1 AS (
  SELECT b, j, (x + {g}) % {_M64} AS z1 FROM pk
), z2 AS (
  SELECT b, j, {_mulmod64("xor(z1, z1 >> 30)", "13787848793156543929")} AS z2
  FROM z1
), z3 AS (
  SELECT b, j, {_mulmod64("xor(z2, z2 >> 27)", "10723151780598845931")} AS z3
  FROM z2
), planes AS MATERIALIZED (
  SELECT b, j,
    CAST(xor(z3, z3 >> 31) % 65536 AS BIGINT) - 32768 AS coef
  FROM z3
), proj AS MATERIALIZED (
  SELECT ev.v, p.b, sum(p.coef * ev.q) AS pr
  FROM ev JOIN planes p ON p.j = ev.j GROUP BY ev.v, p.b
), bands AS MATERIALIZED (
  SELECT v, b // {width} AS band,
    sum(CASE WHEN pr >= 0 THEN 1 ELSE 0 END * (1 << (b % {width}))) AS bv
  FROM proj GROUP BY v, b // {width}
), cand AS MATERIALIZED (
  SELECT DISTINCT qb.v AS qv, xb.v
  FROM bands qb JOIN bands xb
    ON xb.band = qb.band AND xb.bv = qb.bv AND xb.v <> qb.v
  WHERE qb.v < {n_queries}
), dist AS MATERIALIZED (
  SELECT c.qv, c.v, sum((eq.q - ex.q) * (eq.q - ex.q)) AS d2
  FROM cand c
  JOIN ev eq ON eq.v = c.qv
  JOIN ev ex ON ex.v = c.v AND ex.j = eq.j
  GROUP BY c.qv, c.v
)
SELECT qv AS query_id, CAST(rn AS BIGINT) AS rank, v AS vec_id,
       CAST(d2 AS BIGINT) AS dist2
FROM (
  SELECT qv, v, d2, row_number() OVER (PARTITION BY qv ORDER BY d2, v) AS rn
  FROM dist
) WHERE rn <= {k}
ORDER BY query_id, rank"""


def pq_tiny_sql(k: int | None = None, n_queries: int | None = None,
                m: int | None = None, n_codes: int | None = None,
                n_train: int | None = None, iters: int | None = None,
                dim: int = 64) -> str:
    """Oracle of stages/ann.ann_pq_int: per-subspace Lloyd chains over the
    training slice (v < n_train, dims restricted to the subspace), codebook
    union, exact int64 encoding (ties -> lowest code), per-query subspace
    LUTs (= the encoding distances restricted to query rows), ADC as the
    integer LUT sum, row_number top-k by (adc, vec_id)."""
    from ..stages import ann

    k = ann.PQ_TINY_K if k is None else k
    n_queries = ann.PQ_TINY_NQ if n_queries is None else n_queries
    m = ann.PQ_TINY_M if m is None else m
    n_codes = ann.PQ_TINY_CODES if n_codes is None else n_codes
    n_train = ann.PQ_TINY_NTRAIN if n_train is None else n_train
    iters = ann.PQ_TINY_ITERS if iters is None else iters
    scale = ann.CENTROID_SCALE
    d_sub = dim // m
    fdiv = ("CASE WHEN u.sq >= 0 THEN u.sq // u.cnt "
            "ELSE -((-u.sq + u.cnt - 1) // u.cnt) END")
    steps, finals = [], []
    for s in range(m):
        lo, hi = s * d_sub, (s + 1) * d_sub
        steps.append(f"""p{s}c0 AS MATERIALIZED (
  SELECT v AS k, j, q AS val FROM tv WHERE v < {n_codes} AND j >= {lo} AND j < {hi}
)""")
        prev = f"p{s}c0"
        for t in range(1, iters + 1):
            steps.append(f"""p{s}d{t} AS MATERIALIZED (
  SELECT tv.v, c.k, sum((tv.q - c.val) * (tv.q - c.val)) AS d
  FROM tv JOIN {prev} c ON tv.j = c.j GROUP BY tv.v, c.k
), p{s}a{t} AS MATERIALIZED (
  SELECT v, k FROM (
    SELECT v, k, row_number() OVER (PARTITION BY v ORDER BY d, k) AS rn
    FROM p{s}d{t}
  ) WHERE rn = 1
), p{s}s{t} AS MATERIALIZED (
  SELECT a.k, tv.j, sum(tv.q) AS sq, count(*) AS cnt
  FROM tv JOIN p{s}a{t} a ON tv.v = a.v
  WHERE tv.j >= {lo} AND tv.j < {hi} GROUP BY a.k, tv.j
), p{s}c{t} AS MATERIALIZED (
  SELECT c.k, c.j, CAST(coalesce({fdiv}, c.val) AS BIGINT) AS val
  FROM {prev} c LEFT JOIN p{s}s{t} u ON c.k = u.k AND c.j = u.j
)""")
            prev = f"p{s}c{t}"
        finals.append(f"SELECT {s} AS s, k, j, val FROM {prev}")
    chain = ",\n".join(steps)
    books = "\nUNION ALL\n".join(finals)
    return f"""WITH ev AS MATERIALIZED (
  SELECT vec_id AS v, i - 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS s(i)
), tv AS MATERIALIZED (
  SELECT * FROM ev WHERE v < {n_train}
),
{chain},
books AS MATERIALIZED (
{books}
), encd AS MATERIALIZED (
  SELECT ev.v, b.s, b.k, sum((ev.q - b.val) * (ev.q - b.val)) AS d
  FROM ev JOIN books b ON ev.j = b.j GROUP BY ev.v, b.s, b.k
), codes AS MATERIALIZED (
  SELECT v, s, k FROM (
    SELECT v, s, k, row_number() OVER (PARTITION BY v, s ORDER BY d, k) AS rn
    FROM encd
  ) WHERE rn = 1
), lut AS MATERIALIZED (
  SELECT v AS qv, s, k, d FROM encd WHERE v < {n_queries}
), adc AS MATERIALIZED (
  SELECT l.qv, x.v, sum(l.d) AS adc
  FROM codes x JOIN lut l ON l.s = x.s AND l.k = x.k
  WHERE x.v <> l.qv GROUP BY l.qv, x.v
)
SELECT qv AS query_id, CAST(rn AS BIGINT) AS rank, v AS vec_id,
       CAST(adc AS BIGINT) AS adc
FROM (
  SELECT qv, v, adc, row_number() OVER (PARTITION BY qv ORDER BY adc, v) AS rn
  FROM adc
) WHERE rn <= {k}
ORDER BY query_id, rank"""
