"""DuckDB oracle-SQL generator.

Every query in ``__ray_entry__.queries()`` that is SQL-expressible has its
oracle generated HERE, from the *same* Python constants the Ray pipeline uses
(:mod:`..functions.geocode`, :mod:`..functions.hexgrid`,
:mod:`..functions.weights`).  The generator mirrors each numpy formula
operation-for-operation (same expression tree -> same IEEE-754 doubles), with
two cross-engine rules:

* every float literal is ``CAST('...' AS DOUBLE)`` (a bare decimal literal is
  DECIMAL in DuckDB, which does different arithmetic),
* rounding is ``floor(x*1e6 + 0.5)/1e6`` (numpy ``round`` is banker's,
  DuckDB ``round`` is half-away-from-zero; ``floor`` agrees everywhere).
"""

from __future__ import annotations

from ..functions import geocode, hexgrid
from ..functions.weights import ring_weights


def D(x: float) -> str:
    """Emit a float constant as an exact DOUBLE literal."""
    return f"CAST({x!r} AS DOUBLE)"


def round6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


# ---------------------------------------------------------------------------
# pages reconstruction (mirrors sources/pages.py + functions/geocode.py)
# ---------------------------------------------------------------------------

def _tld_case(m_expr: str, field: int) -> str:
    """CASE mapping the Zipf selector to TLD name (field=0), centroid lat (1)
    or lon (2)."""
    parts = ["CASE"]
    for i, thr in enumerate(geocode.TLD_CUM_THRESHOLDS):
        val = geocode.TLD_TABLE[i][field]
        lit = f"'{val}'" if field == 0 else D(val)
        parts.append(f"WHEN {m_expr} < {thr} THEN {lit}")
    parts.append("END")
    return " ".join(parts)


def _url_expr() -> str:
    """The pages url column as one shared SQL expression (mirrors
    ``sources/pages.pages_from_documents_batch``)."""
    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    h = f"(doc_id * {geocode.TLD_MULT}) % {geocode.HOST_MOD}"
    return (f"'https://h' || CAST({h} AS VARCHAR) || '.' || {_tld_case(m, 0)}"
            f" || '/p/' || CAST(doc_id AS VARCHAR)")


def _warc_expr(page_id_expr: str) -> str:
    """warc_ts = epoch + page_id seconds (shared by both pages CTEs)."""
    return (f"TIMESTAMP '2024-01-01 00:00:00' "
            f"+ INTERVAL 1 SECOND * ({page_id_expr})")


def pages_cte() -> str:
    return f"""
pages AS (
  SELECT
    doc_id AS page_id,
    doc_id,
    {_url_expr()} AS url,
    {_warc_expr("doc_id")} AS warc_ts,
    text,
    lang
  FROM documents
)"""


def pages_replicated_cte(replicate: int) -> str:
    """``pages_rep``: the pages table at ``read_pages(replicate=N)`` —
    page_id = rep * REP_STRIDE + doc_id, warc_ts = epoch + page_id seconds,
    url/text shared across replicas (mirrors
    ``sources/pages.pages_from_documents_batch``)."""
    from ..sources.pages import REP_STRIDE

    pid = f"rep * {REP_STRIDE} + doc_id"
    return f"""
reps AS (SELECT unnest(range({replicate})) AS rep),
pages_rep AS (
  SELECT
    {pid} AS page_id,
    doc_id,
    {_url_expr()} AS url,
    {_warc_expr(pid)} AS warc_ts,
    text,
    lang
  FROM documents CROSS JOIN reps
)"""


def geocoded_cte(res: int) -> str:
    """pages -> + (has_mention, lat, lon, q, r, cell). Mirrors GeoEncode."""
    m = f"(doc_id * {geocode.TLD_MULT}) % {geocode.ZIPF_MOD}"
    mlat = f"(doc_id * {geocode.JITTER_LAT_MULT}) % {geocode.JITTER_MOD}"
    mlon = f"(doc_id * {geocode.JITTER_LON_MULT}) % {geocode.JITTER_MOD}"
    size = hexgrid.edge_size(res)
    pat = geocode.LATLON_PATTERN  # single-quoted SQL string: backslashes are literal
    return f"""
geo0 AS (
  SELECT page_id, url, text, lang,
    TRY_CAST(NULLIF(regexp_extract(text, '{pat}', 1), '') AS DOUBLE) AS ex_lat,
    TRY_CAST(NULLIF(regexp_extract(text, '{pat}', 2), '') AS DOUBLE) AS ex_lon,
    {_tld_case(m, 1)} + ({mlat} - 1000) * {D(geocode.JITTER_SCALE)} AS c_lat,
    {_tld_case(m, 2)} + ({mlon} - 1000) * {D(geocode.JITTER_SCALE)} AS c_lon
  FROM pages
),
geo AS (
  SELECT page_id, url, text, lang,
    (ex_lat IS NOT NULL AND ex_lon IS NOT NULL) AS has_mention,
    CASE WHEN ex_lat IS NOT NULL AND ex_lon IS NOT NULL THEN ex_lat ELSE c_lat END AS lat,
    CASE WHEN ex_lat IS NOT NULL AND ex_lon IS NOT NULL THEN ex_lon ELSE c_lon END AS lon
  FROM geo0
),
enc0 AS (
  SELECT *, (sqrt(3)/3 * lon - lat/3) / {D(size)} AS qf, (2 * lat / 3) / {D(size)} AS rf
  FROM geo
),
enc1 AS (
  SELECT *, floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry, floor(rf + 0.5) AS rz
  FROM enc0
),
enc2 AS (
  SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
  FROM enc1
),
encoded AS (
  SELECT page_id, url, text, lang, has_mention, lat, lon,
    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q,
    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS BIGINT) AS r
  FROM enc2
),
geocoded AS (
  SELECT *,
    CAST({res} AS BIGINT) * {1 << 56} + (q + {hexgrid.OFF}) * {1 << 28} + (r + {hexgrid.OFF}) AS cell
  FROM encoded
)"""


def cells_cte() -> str:
    """geocoded -> per-cell metric table (page_count, chars_mean, en_share,
    mention_rate).  Mirrors pipelines/flagship.cell_metrics."""
    return """
cells AS (
  SELECT cell, q, r,
    count(*) AS page_count,
    sum(CAST(length(text) AS DOUBLE)) / count(*) AS chars_mean,
    sum(CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE)) / count(*) AS en_share,
    sum(CAST(CASE WHEN has_mention THEN 1 ELSE 0 END AS DOUBLE)) / count(*) AS mention_rate
  FROM geocoded
  GROUP BY cell, q, r
)"""


def offsets_values(k: int, profile: str) -> str:
    w = ring_weights(profile, k)
    rows = [f"(0, 0, {D(w[0])})"]
    for ring in range(1, k + 1):
        for dq, dr in hexgrid.ring_offsets(ring):
            rows.append(f"({dq}, {dr}, {D(w[ring])})")
    return ",\n    ".join(rows)


def prelude(res: int) -> str:
    return f"WITH {pages_cte()},\n{geocoded_cte(res)},\n{cells_cte()}"


def smooth_sql(res: int, k: int, profile: str, value_cols: list[str]) -> str:
    """Gather-formulation oracle of the K-family kernels."""
    sums = ",\n  ".join(
        f"{round6(f'sum(n.{c} * o.w) / sum(o.w)')} AS {c}_sm" for c in value_cols
    )
    return f"""{prelude(res)},
offsets(dq, dr, w) AS (VALUES
    {offsets_values(k, profile)})
SELECT c.cell AS cell,
  {sums}
FROM cells c
CROSS JOIN offsets o
JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
GROUP BY c.cell
ORDER BY c.cell"""


def extract_text_sql() -> str:
    """Oracle of stages/extract.extract_text: the EXPECTED extraction result
    is the source-of-truth documents.text per url — a hash match therefore
    proves the engine's html->text extraction is byte-identical per url
    (the BASELINE.json input_hint invariant)."""
    return f"""WITH {pages_cte()}
SELECT page_id, url, text
FROM pages
ORDER BY page_id"""


def parse_urls_sql() -> str:
    """Oracle of stages/extract.parse_urls (list-kernel URL decomposition)."""
    return f"""WITH {pages_cte()}
SELECT page_id,
  rtrim(string_split(url, '/')[1], ':') AS scheme,
  string_split(url, '/')[3] AS host,
  string_split(string_split(url, '/')[3], '.')[-1] AS tld,
  '/' || array_to_string(string_split(url, '/')[4:], '/') AS path
FROM pages
ORDER BY page_id"""


def geocode_cells_sql(res: int) -> str:
    return f"""{prelude(res)}
SELECT page_id, url, {round6('lat')} AS lat, {round6('lon')} AS lon,
       has_mention, cell
FROM geocoded
ORDER BY page_id"""


def cell_metrics_sql(res: int) -> str:
    return f"""{prelude(res)}
SELECT cell, page_count,
  {round6('chars_mean')} AS chars_mean,
  {round6('en_share')} AS en_share,
  {round6('mention_rate')} AS mention_rate
FROM cells
ORDER BY cell"""


def neighbor_stats_sql(res: int, ring: int = 1) -> str:
    """Global min/max/avg of per-cell present-ring-``ring``-neighbor counts
    (A1 for ring=1; the standalone ring-2 stat A4 for ring=2)."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES
    {", ".join(f"({dq}, {dr})" for dq, dr in hexgrid.ring_offsets(ring))}),
nbr AS (
  SELECT c.cell, count(n.cell) AS n_neighbors
  FROM cells c
  CROSS JOIN offsets o
  LEFT JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell
)
SELECT min(n_neighbors) AS min_neighbors, max(n_neighbors) AS max_neighbors,
  {round6('sum(CAST(n_neighbors AS DOUBLE)) / count(*)')} AS avg_neighbors,
  CAST(sum(n_neighbors) AS BIGINT) AS total_edges
FROM nbr"""


def morton_locality_sql(res: int) -> str:
    """A5 locality metric (``hex_smooth_cuda_v5.cu:551-559``): average
    |original index difference| between consecutive cells in Morton order,
    where original index = rank in cell-id order (the canonical layout)."""
    sx = _spread_bits_sql("q + 32768")
    sy = _spread_bits_sql("r + 32768")
    return f"""{prelude(res)},
pos AS (
  SELECT cell, {sx} | ({sy} << 1) AS morton,
    row_number() OVER (ORDER BY cell) - 1 AS orig
  FROM cells
), o AS (
  SELECT orig, lag(orig) OVER (ORDER BY morton, cell) AS prev FROM pos
)
SELECT {round6('CAST(sum(abs(orig - prev)) AS DOUBLE) / count(*)')} AS avg_distance,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM o WHERE prev IS NOT NULL"""


def _spread_bits_sql(v: str) -> str:
    """Inline the 16-bit Morton spread (mirrors hexgrid.morton_key.spread)."""
    e = f"(({v}) & 65535)"
    e = f"(({e} | ({e} << 8)) & 16711935)"
    e = f"(({e} | ({e} << 4)) & 252645135)"
    e = f"(({e} | ({e} << 2)) & 858993459)"
    e = f"(({e} | ({e} << 1)) & 1431655765)"
    return e


def morton_sql(res: int) -> str:
    sx = _spread_bits_sql("q + 32768")
    sy = _spread_bits_sql("r + 32768")
    return f"""{prelude(res)}
SELECT cell, {sx} | ({sy} << 1) AS morton
FROM cells
ORDER BY morton, cell"""


def pip_join_sql(res: int) -> str:
    """Ray-casting PIP as an edge-table crossing count (identical float
    expression to stages/pip.points_in_polygon)."""
    from ..stages.pip import polygon_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})" for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
)
SELECT page_id, poly_id
FROM crossings
WHERE n_cross % 2 = 1
ORDER BY page_id, poly_id"""


def polygon_density_sql(res: int) -> str:
    """Oracle of the per-polygon density query: PIP containment counts per
    polygon, divided by the shoelace area emitted as an explicit
    LEFT-ASSOCIATIVE constant expression per polygon (SQL SUM() order is
    unspecified for floats, so the fold is spelled out instead)."""
    from ..stages.pip import POLYGONS, polygon_edges

    rows = []
    for pid, ring in POLYGONS:
        terms = []
        for i in range(len(ring)):
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % len(ring)]
            terms.append(f"({D(x1)} * {D(y2)} - {D(x2)} * {D(y1)})")
        fold = terms[0]
        for t in terms[1:]:
            fold = f"({fold} + {t})"
        rows.append(f"({pid}, abs({fold}) / 2.0)")
    areas = ",\n    ".join(rows)
    return f"""{prelude(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {", ".join(f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})"
               for pid, y1, x1, y2, x2 in polygon_edges())}),
areas(poly_id, area) AS (VALUES
    {areas}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
), counts AS (
  SELECT poly_id, CAST(count(*) AS BIGINT) AS n_pages
  FROM crossings WHERE n_cross % 2 = 1 GROUP BY poly_id
)
SELECT a.poly_id, {round6('a.area')} AS area_deg2,
  CAST(coalesce(c.n_pages, 0) AS BIGINT) AS n_pages,
  {round6('coalesce(c.n_pages, 0) / a.area')} AS density
FROM areas a LEFT JOIN counts c USING (poly_id)
ORDER BY a.poly_id"""


def pip_join_holes_sql(res: int) -> str:
    """Oracle of stages/pip.pip_join_holes: the SAME crossing-parity query
    as pip_join_sql over the multiring edge table (outer + hole edges in
    one table — even-odd handles holes with no extra SQL)."""
    from ..stages.pip import multiring_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})"
        for pid, y1, x1, y2, x2 in multiring_edges()
    )
    return f"""{prelude(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
)
SELECT page_id, poly_id
FROM crossings
WHERE n_cross % 2 = 1
ORDER BY page_id, poly_id"""


def knn_join_sql(res: int, k: int) -> str:
    from ..stages.knn import QUERY_POINTS

    qvals = ",\n    ".join(f"({qid}, {D(qlat)}, {D(qlon)})" for qid, qlat, qlon in QUERY_POINTS)
    return f"""{prelude(res)},
queries(query_id, qlat, qlon) AS (VALUES
    {qvals}),
d AS (
  SELECT q.query_id, p.page_id,
    (p.lat - q.qlat) * (p.lat - q.qlat) + (p.lon - q.qlon) * (p.lon - q.qlon) AS dist2
  FROM geocoded p CROSS JOIN queries q
),
ranked AS (
  SELECT query_id, page_id, dist2,
    row_number() OVER (PARTITION BY query_id ORDER BY dist2, page_id) AS rank
  FROM d
)
SELECT query_id, rank, page_id, {round6('dist2')} AS dist2
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""


def tile_assign_sql(res: int, zoom: int) -> str:
    n = 1 << zoom
    return f"""{prelude(res)}
SELECT page_id,
  CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT) AS tile_x,
  CAST(floor((90.0 - lat) / 180.0 * {n}) AS BIGINT) AS tile_y,
  CAST(floor((90.0 - lat) / 180.0 * {n}) AS BIGINT) * {n}
    + CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT) AS tile_id
FROM geocoded
ORDER BY page_id"""


def prelude_geo(res: int) -> str:
    """pages + geocoded only (no cell-metrics table)."""
    return f"WITH {pages_cte()},\n{geocoded_cte(res)}"


def multires_counts_sql(res: int) -> str:
    """Per-resolution (res 5..9) cell page counts from one geocode pass —
    oracle of stages/gridops.multires_counts.  The encode formula is the same
    as geocoded_cte but with the edge size derived from the res column
    (4.0 / 2^(res-5): exact powers of two, identical doubles to
    hexgrid.edge_size)."""
    rs = ", ".join(f"({r})" for r in range(hexgrid.RES_MIN, hexgrid.RES_MAX + 1))
    return f"""{prelude_geo(res)},
rs(res2) AS (VALUES {rs}),
m0 AS (
  SELECT g.lat, g.lon, r.res2,
    CAST(4.0 AS DOUBLE) / power(CAST(2.0 AS DOUBLE), r.res2 - {hexgrid.RES_MIN}) AS size
  FROM geocoded g CROSS JOIN rs r
),
m1 AS (
  SELECT res2, (sqrt(3)/3 * lon - lat/3) / size AS qf, (2 * lat / 3) / size AS rf
  FROM m0
),
m2 AS (
  SELECT res2, qf, rf,
    floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry, floor(rf + 0.5) AS rz
  FROM m1
),
m3 AS (
  SELECT res2, qf, rf, rx, ry, rz,
    abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
  FROM m2
),
m4 AS (
  SELECT res2,
    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q,
    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS BIGINT) AS r
  FROM m3
)
SELECT res2 AS res,
  CAST(res2 AS BIGINT) * {1 << 56} + (q + {hexgrid.OFF}) * {1 << 28} + (r + {hexgrid.OFF}) AS cell,
  count(*) AS page_count
FROM m4
GROUP BY 1, 2
ORDER BY res, cell"""


def tile_vector_sql(res: int, zoom: int) -> str:
    """Raster->vector: per-tile aggregate + tile polygon bounds (oracle of
    stages/gridops.tile_vector)."""
    n = 1 << zoom
    return f"""{prelude_geo(res)},
t AS (
  SELECT
    CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT) AS tile_x,
    CAST(floor((90.0 - lat) / 180.0 * {n}) AS BIGINT) AS tile_y
  FROM geocoded
),
agg AS (
  SELECT tile_y * {n} + tile_x AS tile_id, tile_x, tile_y, count(*) AS page_count
  FROM t GROUP BY 1, 2, 3
)
SELECT tile_id, tile_x, tile_y, page_count,
  {round6(f'CAST(tile_x AS DOUBLE) / {n} * 360.0 - 180.0')} AS west,
  {round6(f'90.0 - CAST(tile_y + 1 AS DOUBLE) / {n} * 180.0')} AS south,
  {round6(f'CAST(tile_x + 1 AS DOUBLE) / {n} * 360.0 - 180.0')} AS east,
  {round6(f'90.0 - CAST(tile_y AS DOUBLE) / {n} * 180.0')} AS north
FROM agg
ORDER BY tile_id"""


def top_cells_sql(res: int, k: int) -> str:
    """Top-k cells by page count, deterministic tie-break on cell id."""
    return f"""{prelude(res)}
SELECT cell, page_count,
  row_number() OVER (ORDER BY page_count DESC, cell) AS rank
FROM cells
ORDER BY page_count DESC, cell
LIMIT {k}"""


def sample_pages_sql(keep_ppm: int, mult: int, mod: int) -> str:
    """Deterministic multiplicative-hash Bernoulli sample (oracle of
    stages/gridops.sample_hash; overflow-free form mirrored exactly)."""
    return f"""WITH {pages_cte()}
SELECT page_id, url, lang
FROM pages
WHERE ((page_id % {mod}) * {mult % mod}) % {mod} < {keep_ppm}
ORDER BY page_id"""


def stratified_sample_sql(rates_ppm: dict, default_ppm: int, mult: int, mod: int) -> str:
    """Oracle of stages/gridops.stratified_sample (per-lang keep rates over
    the same overflow-free multiplicative hash as sample_pages)."""
    case = " ".join(
        f"WHEN lang = '{g}' THEN {ppm}" for g, ppm in rates_ppm.items()
    )
    return f"""WITH {pages_cte()}
SELECT page_id, url, lang
FROM pages
WHERE ((page_id % {mod}) * {mult % mod}) % {mod}
      < (CASE {case} ELSE {default_ppm} END)
ORDER BY page_id"""


def hosts_except_sql(op: str = "EXCEPT", col: str = "host") -> str:
    """Oracle of the EXCEPT / INTERSECT set operations (host or tld values
    in 'en' pages but no / also 'de' pages); host = 3rd '/'-segment of the
    url, tld = its last dot-segment."""
    expr = (
        "string_split(url, '/')[3]"
        if col == "host"
        else "string_split(string_split(url, '/')[3], '.')[-1]"
    )
    return f"""WITH {pages_cte()}
SELECT {col} FROM (
  SELECT DISTINCT {expr} AS {col} FROM pages WHERE lang = 'en'
  {op}
  SELECT DISTINCT {expr} AS {col} FROM pages WHERE lang = 'de'
)
ORDER BY {col}"""


def top_hosts_by_lang_sql(k: int) -> str:
    """Per-language top-k hosts by page count (oracle of
    stages/gridops.grouped_topk over the pages table)."""
    return f"""WITH {pages_cte()},
c AS (
  SELECT lang, split_part(url, '/', 3) AS host, count(*) AS n_pages
  FROM pages GROUP BY 1, 2
),
r AS (
  SELECT lang, host, n_pages,
    row_number() OVER (PARTITION BY lang ORDER BY n_pages DESC, host) AS rank
  FROM c
)
SELECT lang, rank, host, n_pages
FROM r WHERE rank <= {k}
ORDER BY lang, rank"""


def polyfill_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.polyfill: bbox-stripe candidate grid +
    the identical even-odd crossing predicate on cell centers."""
    from ..stages.pip import polygon_edges

    size = hexgrid.edge_size(res)
    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})" for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""WITH edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
bbox AS (
  SELECT poly_id,
    least(min(y1), min(y2)) AS ymin, greatest(max(y1), max(y2)) AS ymax,
    least(min(x1), min(x2)) AS xmin, greatest(max(x1), max(x2)) AS xmax
  FROM edges GROUP BY poly_id
),
rs AS (
  SELECT poly_id, xmin, xmax,
    CAST(floor(ymin / {D(1.5 * size)}) AS BIGINT) + g.k AS r
  FROM bbox, LATERAL (
    SELECT unnest(range(CAST(floor(ymax / {D(1.5 * size)}) AS BIGINT)
                        - CAST(floor(ymin / {D(1.5 * size)}) AS BIGINT) + 2)) AS k
  ) g
),
qs AS (
  SELECT poly_id, r,
    CAST(floor(xmin / {D(size * hexgrid.SQRT3)} - r / 2.0) AS BIGINT) + g.k AS q
  FROM rs, LATERAL (
    SELECT unnest(range(CAST(floor(xmax / {D(size * hexgrid.SQRT3)} - r / 2.0) AS BIGINT)
                        - CAST(floor(xmin / {D(size * hexgrid.SQRT3)} - r / 2.0) AS BIGINT) + 2)) AS k
  ) g
),
cand AS (
  SELECT poly_id, q, r,
    {D(size)} * 1.5 * r AS clat,
    {D(size)} * sqrt(3) * (q + r / 2.0) AS clon
  FROM qs
),
crossings AS (
  SELECT c.poly_id, c.q, c.r, count(*) AS n_cross
  FROM cand c
  JOIN edges e
    ON e.poly_id = c.poly_id
   AND ((e.y1 > c.clat) <> (e.y2 > c.clat))
   AND c.clon < (e.x2 - e.x1) * (c.clat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY c.poly_id, c.q, c.r
)
SELECT poly_id,
  CAST({res} AS BIGINT) * {1 << 56} + (q + {hexgrid.OFF}) * {1 << 28} + (r + {hexgrid.OFF}) AS cell,
  q, r
FROM crossings
WHERE n_cross % 2 = 1
ORDER BY poly_id, cell"""


def distance_join_sql(res: int, radius: float) -> str:
    """Oracle of stages/spatialjoin.distance_join: all page pairs within
    ``radius`` degrees, a < b, dist2 = (alat-blat)^2 + (alon-blon)^2."""
    return f"""{prelude_geo(res)}
SELECT a.page_id AS a, b.page_id AS b,
  {round6('(a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)')} AS dist2
FROM geocoded a
JOIN geocoded b
  ON a.page_id < b.page_id
 AND (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) <= {D(radius * radius)}
ORDER BY a, b"""


def zonal_stats_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.zonal_stats: PIP containment (identical
    crossing rule) then exact-integer per-polygon sums."""
    from ..stages.pip import polygon_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})" for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude_geo(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
),
inside AS (SELECT page_id, poly_id FROM crossings WHERE n_cross % 2 = 1)
SELECT i.poly_id,
  count(*) AS n_pages,
  {round6('CAST(sum(length(p.text)) AS DOUBLE) / count(*)')} AS mean_len,
  {round6("CAST(sum(CASE WHEN p.lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS en_share
FROM inside i JOIN geocoded p ON i.page_id = p.page_id
GROUP BY i.poly_id
ORDER BY i.poly_id"""


def idw_interpolate_sql(res: int, radius: float) -> str:
    """Oracle of stages/spatialjoin.idw_interpolate: fixed-point IDW weights
    w = floor(1e9 / (1 + dist2) + 0.5), exact BIGINT weighted sums."""
    from ..stages.knn import QUERY_POINTS
    from ..stages.spatialjoin import IDW_SCALE

    qvals = ",\n    ".join(f"({qid}, {D(qlat)}, {D(qlon)})" for qid, qlat, qlon in QUERY_POINTS)
    return f"""{prelude_geo(res)},
queries(query_id, qlat, qlon) AS (VALUES
    {qvals}),
d AS (
  SELECT q.query_id,
    (q.qlat - p.lat) * (q.qlat - p.lat) + (q.qlon - p.lon) * (q.qlon - p.lon) AS dist2,
    length(p.text) AS tlen
  FROM geocoded p CROSS JOIN queries q
),
w AS (
  SELECT query_id,
    CAST(floor({D(float(IDW_SCALE))} / (1.0 + dist2) + 0.5) AS BIGINT) AS w, tlen
  FROM d WHERE dist2 <= {D(radius * radius)}
)
SELECT query_id,
  CAST(sum(w) AS BIGINT) AS n_weight,
  {round6('CAST(sum(w * tlen) AS DOUBLE) / CAST(sum(w) AS DOUBLE)')} AS idw_len
FROM w
GROUP BY query_id
HAVING sum(w) > 0
ORDER BY query_id"""


def nearest_polygon_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.nearest_polygon: exact point-to-segment
    distance, min per polygon, argmin across polygons (ties -> lower id)."""
    from ..stages.pip import polygon_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})" for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude_geo(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
seg AS (
  SELECT p.page_id, e.poly_id,
    least(greatest(((p.lat - e.y1) * (e.y2 - e.y1) + (p.lon - e.x1) * (e.x2 - e.x1))
          / ((e.y2 - e.y1) * (e.y2 - e.y1) + (e.x2 - e.x1) * (e.x2 - e.x1)), 0.0), 1.0) AS t,
    p.lat, p.lon, e.y1, e.x1, e.y2, e.x2
  FROM geocoded p CROSS JOIN edges e
),
d AS (
  SELECT page_id, poly_id,
    (lat - (y1 + t * (y2 - y1))) * (lat - (y1 + t * (y2 - y1)))
    + (lon - (x1 + t * (x2 - x1))) * (lon - (x1 + t * (x2 - x1))) AS d2
  FROM seg
),
per_poly AS (
  SELECT page_id, poly_id, min(d2) AS d2 FROM d GROUP BY page_id, poly_id
),
ranked AS (
  SELECT page_id, poly_id, d2,
    row_number() OVER (PARTITION BY page_id ORDER BY d2, poly_id) AS rn
  FROM per_poly
)
SELECT page_id, poly_id, {round6('d2')} AS dist2
FROM ranked WHERE rn = 1
ORDER BY page_id"""


def cell_boundary_sql(res: int) -> str:
    """Oracle of stages/gridops.cell_boundary (pointy-top corner arithmetic
    on the distinct populated cells)."""
    size = hexgrid.edge_size(res)
    return f"""{prelude(res)},
corners(vertex, fl, fw) AS (VALUES
    (0, 2, 0), (1, 1, 1), (2, -1, 1), (3, -2, 0), (4, -1, -1), (5, 1, -1)),
centers AS (
  SELECT cell, {D(size)} * 1.5 * r AS clat, {D(size)} * sqrt(3) * (q + r / 2.0) AS clon
  FROM cells
)
SELECT cell, CAST(vertex AS BIGINT) AS vertex,
  {round6(f'clat + fl * {D(size)} / 2.0')} AS vlat,
  {round6(f'clon + fw * ({D(size)} * sqrt(3) / 2.0)')} AS vlon
FROM centers CROSS JOIN corners
ORDER BY cell, vertex"""


def cell_parent_sql(res: int, parent_res: int) -> str:
    """Oracle of stages/gridops.cell_parent_rollup: center re-encode at
    ``parent_res`` via the shared cube-rounding block."""
    size = hexgrid.edge_size(res)
    psize = hexgrid.edge_size(parent_res)
    return f"""{prelude(res)},
pc0 AS (
  SELECT cell, page_count, {D(size)} * 1.5 * r AS clat, {D(size)} * sqrt(3) * (q + r / 2.0) AS clon
  FROM cells
),
pe0 AS (
  SELECT *, (sqrt(3)/3 * clon - clat/3) / {D(psize)} AS qf, (2 * clat / 3) / {D(psize)} AS rf
  FROM pc0
),
pe1 AS (
  SELECT *, floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry, floor(rf + 0.5) AS rz
  FROM pe0
),
pe2 AS (
  SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
  FROM pe1
),
penc AS (
  SELECT cell, page_count,
    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS pq,
    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS BIGINT) AS pr
  FROM pe2
)
SELECT
  CAST({parent_res} AS BIGINT) * {1 << 56} + (pq + {hexgrid.OFF}) * {1 << 28} + (pr + {hexgrid.OFF}) AS parent_cell,
  count(*) AS n_children,
  CAST(sum(page_count) AS BIGINT) AS n_pages
FROM penc
GROUP BY 1
ORDER BY parent_cell"""


def grid_disk_sql(res: int, k: int) -> str:
    """Oracle of stages/gridops.grid_disk (offset arithmetic on BIGINT)."""
    offs = [(0, 0, 0)]
    for ring in range(1, k + 1):
        offs += [(dq, dr, ring) for dq, dr in hexgrid.ring_offsets(ring)]
    vals = ",\n    ".join(f"({dq}, {dr}, {ring})" for dq, dr, ring in offs)
    return f"""{prelude(res)},
offs(dq, dr, ring) AS (VALUES
    {vals})
SELECT cell,
  CAST({res} AS BIGINT) * {1 << 56} + (q + dq + {hexgrid.OFF}) * {1 << 28} + (r + dr + {hexgrid.OFF}) AS neighbor,
  CAST(ring AS BIGINT) AS ring
FROM cells CROSS JOIN offs
ORDER BY cell, ring, neighbor"""


def pip_anti_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.pip_anti (complement of pip_join_sql)."""
    from ..stages.pip import polygon_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})" for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude_geo(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
),
inside AS (SELECT DISTINCT page_id FROM crossings WHERE n_cross % 2 = 1)
SELECT page_id FROM geocoded
WHERE page_id NOT IN (SELECT page_id FROM inside)
ORDER BY page_id"""


def bbox_query_sql(res: int, bbox) -> str:
    """Oracle of stages/spatialjoin.bbox_query (inclusive bounds)."""
    lat_min, lat_max, lon_min, lon_max = bbox
    return f"""{prelude_geo(res)}
SELECT page_id, {round6('lat')} AS lat, {round6('lon')} AS lon, lang
FROM geocoded
WHERE lat >= {D(lat_min)} AND lat <= {D(lat_max)}
  AND lon >= {D(lon_min)} AND lon <= {D(lon_max)}
ORDER BY page_id"""


def knn_haversine_sql(res: int, k: int) -> str:
    """Oracle of stages/knn.knn_haversine (term-for-term trig mirror)."""
    from ..stages.knn import EARTH_R_KM, QUERY_POINTS

    qvals = ",\n    ".join(f"({qid}, {D(qlat)}, {D(qlon)})" for qid, qlat, qlon in QUERY_POINTS)
    return f"""{prelude_geo(res)},
queries(query_id, qlat, qlon) AS (VALUES
    {qvals}),
d AS (
  SELECT q.query_id, p.page_id,
    2.0 * {D(EARTH_R_KM)} * asin(sqrt(
      sin(radians(p.lat - q.qlat) / 2.0) * sin(radians(p.lat - q.qlat) / 2.0)
      + cos(radians(q.qlat)) * cos(radians(p.lat))
        * (sin(radians(p.lon - q.qlon) / 2.0) * sin(radians(p.lon - q.qlon) / 2.0))
    )) AS dist_km
  FROM geocoded p CROSS JOIN queries q
),
ranked AS (
  SELECT query_id, page_id, dist_km,
    row_number() OVER (PARTITION BY query_id ORDER BY dist_km, page_id) AS rank
  FROM d
)
SELECT query_id, rank, page_id, {round6('dist_km')} AS dist_km
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""


def geohash_sql(res: int) -> str:
    """Oracle of stages/gridops.geohash_encode (precision 6): integer Morton
    spread + unrolled base-32 character slicing."""
    lon_q = "CAST(least(floor((lon + 180.0) / 360.0 * 32768.0), 32767.0) AS BIGINT)"
    lat_q = "CAST(least(floor((lat + 90.0) / 180.0 * 32768.0), 32767.0) AS BIGINT)"
    g = f"(({_spread_bits_sql(lon_q)} << 1) | {_spread_bits_sql(lat_q)})"
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = " || ".join(
        f"substring('{alphabet}', CAST((({g}) >> {25 - 5 * c}) & 31 AS INTEGER) + 1, 1)"
        for c in range(6)
    )
    return f"""{prelude_geo(res)}
SELECT page_id, {chars} AS geohash
FROM geocoded
ORDER BY page_id"""


def lang_distinct_hosts_sql() -> str:
    """Oracle of the grouped exact COUNT(DISTINCT host)."""
    return f"""WITH {pages_cte()}
SELECT lang, count(DISTINCT string_split(url, '/')[3]) AS n_hosts
FROM pages
GROUP BY lang
ORDER BY lang"""


def enrich_pages_sql(res: int, k: int, profile: str, value_cols: list[str]) -> str:
    """Oracle of stages/smooth.enrich_pages: the smooth query as a CTE,
    joined back onto every page by cell."""
    sums = ",\n  ".join(
        f"{round6(f'sum(n.{c} * o.w) / sum(o.w)')} AS {c}_sm" for c in value_cols
    )
    sm_cols = ", ".join(f"sm.{c}_sm" for c in value_cols)
    return f"""{prelude(res)},
offsets(dq, dr, w) AS (VALUES
    {offsets_values(k, profile)}),
sm AS (
  SELECT c.cell AS cell,
    {sums}
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell
)
SELECT g.page_id, g.cell, {sm_cols}
FROM geocoded g JOIN sm ON g.cell = sm.cell
ORDER BY g.page_id"""


def hook_jump_chain(rounds: int, start: str = "l0") -> tuple[str, str]:
    """The unrolled hook+jump min-label recurrence over CTEs ``edges``
    (src, dst, symmetric) and ``start`` (v, l): returns (chain_sql,
    final_cte_name).  Shared by every connected-components oracle
    (dedup_components, neardup_components, spatial_cluster)."""
    steps = []
    prev = start
    for i in range(1, rounds + 1):
        steps.append(f"""h{i} AS MATERIALIZED (
  SELECT v, min(l) AS l FROM (
    SELECT v, l FROM {prev}
    UNION ALL
    SELECT e.src AS v, n.l FROM edges e JOIN {prev} n ON n.v = e.dst
  ) u GROUP BY v
), l{i} AS MATERIALIZED (
  SELECT a.v AS v, b.l AS l FROM h{i} a JOIN h{i} b ON b.v = a.l
)""")
        prev = f"l{i}"
    return ",\n".join(steps), prev


def _ring_offsets_values(k: int, include_center: bool) -> str:
    rows = ["(0, 0)"] if include_center else []
    for ring in range(1, k + 1):
        rows += [f"({dq}, {dr})" for dq, dr in hexgrid.ring_offsets(ring)]
    return ", ".join(rows)


def hotspot_gi_sql(res: int, k: int = 1) -> str:
    """Oracle of stages/hotspot.hotspot_gi: Getis-Ord Gi* per present cell,
    binary closed-k-ring weights over present cells (x = page_count)."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, True)}),
st AS (
  SELECT count(*) AS n,
    sum(CAST(page_count AS DOUBLE)) / count(*) AS xbar,
    sum(CAST(page_count AS DOUBLE) * CAST(page_count AS DOUBLE)) AS sxx
  FROM cells),
nbr AS (
  SELECT c.cell, sum(CAST(n.page_count AS DOUBLE)) AS s1, count(n.cell) AS w
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell)
SELECT nbr.cell AS cell, CAST(nbr.w AS BIGINT) AS n_nbrs,
  {round6("(s1 - st.xbar * w) / (sqrt(st.sxx / st.n - st.xbar * st.xbar)"
          " * sqrt((st.n * w - w * w) / (st.n - 1.0)))")} AS gi_z
FROM nbr, st
ORDER BY cell"""


def spatiotemporal_counts_sql(res: int, replicate: int = 3) -> str:
    """Oracle of stages/gridops.spatiotemporal_counts over
    read_pages(replicate): the cell comes from the single-replica geocode
    (replicas share coordinates by construction), the day from each
    replica's warc_ts = epoch + (rep * stride + page_id) seconds."""
    from ..sources.pages import REP_STRIDE

    return f"""WITH {pages_cte()},
{geocoded_cte(res)},
reps AS (SELECT unnest(range({replicate})) AS rep),
st AS (
  SELECT g.cell AS cell,
    date_trunc('day', {_warc_expr(f"rep * {REP_STRIDE} + g.page_id")}) AS day
  FROM geocoded g CROSS JOIN reps
)
SELECT cell, day, CAST(count(*) AS BIGINT) AS page_count
FROM st
GROUP BY cell, day
ORDER BY cell, day"""


def raster_morphology_sql(res: int, k: int = 1) -> str:
    """Oracle of stages/hotspot.raster_morphology: closed k-ring dilation
    of the occupied cell set with per-target present-neighbor counts and
    the full-ring erosion flag."""
    full = sum(6 * ring for ring in range(1, k + 1))
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
tgt AS (
  SELECT c.q + o.dq AS q, c.r + o.dr AS r FROM cells c CROSS JOIN offsets o
  UNION
  SELECT q, r FROM cells
),
nbrcnt AS (
  SELECT t.q, t.r, count(c2.q) AS nc
  FROM tgt t
  CROSS JOIN offsets o
  LEFT JOIN cells c2 ON c2.q = t.q + o.dq AND c2.r = t.r + o.dr
  GROUP BY t.q, t.r
)
SELECT
  CAST({res} AS BIGINT) * {1 << 56} + (n.q + {hexgrid.OFF}) * {1 << 28}
    + (n.r + {hexgrid.OFF}) AS cell,
  CAST(CASE WHEN p.q IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS present,
  CAST(n.nc AS BIGINT) AS n_nbrs,
  CAST(CASE WHEN p.q IS NOT NULL AND n.nc = {full} THEN 1 ELSE 0 END
       AS BIGINT) AS eroded
FROM nbrcnt n LEFT JOIN cells p ON p.q = n.q AND p.r = n.r
ORDER BY cell"""


def moran_correlogram_sql(res: int, max_d: int = 3) -> str:
    """Oracle of stages/hotspot.moran_correlogram: exact-lag binary
    weights per d, HUGEINT mean-cleared cross term numI = sum (n*x - Sx)
    * (n*rx - Sx*rc) (cells with no lag-d neighbor contribute 0 — the
    inner join is exact), one round6 division per lag."""
    rows = []
    for d in range(1, max_d + 1):
        rows += [f"({d}, {dq}, {dr})" for dq, dr in hexgrid.ring_offsets(d)]
    lag_rows = ", ".join(f"({d})" for d in range(1, max_d + 1))
    return f"""{prelude(res)},
offsets(d, dq, dr) AS (VALUES {", ".join(rows)}),
st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(page_count) AS HUGEINT) AS sx,
    CAST(sum(CAST(page_count AS HUGEINT) * page_count) AS HUGEINT) AS sxx
  FROM cells),
nbr AS (
  SELECT o.d AS d, c.cell, CAST(c.page_count AS HUGEINT) AS x,
    CAST(sum(nb.page_count) AS HUGEINT) AS rx,
    CAST(count(*) AS HUGEINT) AS rc
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells nb ON nb.q = c.q + o.dq AND nb.r = c.r + o.dr
  GROUP BY 1, 2, c.page_count),
agg AS (
  SELECT d, CAST(sum(rc) AS HUGEINT) AS s0,
    CAST(sum((st.n * x - st.sx) * (st.n * rx - st.sx * rc)) AS HUGEINT)
      AS num
  FROM nbr, st GROUP BY d)
SELECT CAST(l.d AS BIGINT) AS d,
  CAST(coalesce(agg.s0, 0) AS BIGINT) AS s0,
  CASE WHEN coalesce(agg.s0, 0) > 0
    THEN {round6('CAST(agg.num AS DOUBLE) / CAST(agg.s0'
                 ' * (st.n * st.sxx - st.sx * st.sx) AS DOUBLE)')}
    ELSE 0.0 END AS morans_i
FROM (VALUES {lag_rows}) l(d)
LEFT JOIN agg ON agg.d = l.d, st
ORDER BY l.d"""


def directional_variogram_sql(res: int) -> str:
    """Oracle of stages/hotspot.directional_variogram: per ring-1 offset,
    exact HUGEINT pair sums of (z_i - z_j)^2 and counts, round6 gamma;
    directions with no present pair emit zeros."""
    rows = ", ".join(f"({i}, {dq}, {dr})"
                     for i, (dq, dr) in enumerate(hexgrid.ring_offsets(1)))
    return f"""{prelude(res)},
offsets(oi, dq, dr) AS (VALUES {rows}),
pr AS (
  SELECT o.oi,
    CAST(sum(CAST(c.page_count - n.page_count AS HUGEINT)
             * (c.page_count - n.page_count)) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM offsets o
  JOIN cells c ON true
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY 1
)
SELECT CAST(o.dq AS BIGINT) AS dq, CAST(o.dr AS BIGINT) AS dr,
  CAST(coalesce(pr.c, 0) AS BIGINT) AS n_pairs,
  CASE WHEN coalesce(pr.c, 0) > 0
    THEN {round6('CAST(pr.s AS DOUBLE) / (2.0 * pr.c)')}
    ELSE 0.0 END AS gamma
FROM offsets o LEFT JOIN pr ON pr.oi = o.oi
ORDER BY o.oi"""


def emerging_hotspots_sql(res: int, replicate: int = 3) -> str:
    """Oracle of stages/hotspot.emerging_hotspots over the spatiotemporal
    cube: per-day exact mean-cleared hot flags, per-cell day rollup,
    persistent/emerging/none classes."""
    return f"""WITH st AS (
  SELECT * FROM ({spatiotemporal_counts_sql(res, replicate)})
), dt AS (
  SELECT day, CAST(count(*) AS HUGEINT) AS n_day,
    CAST(sum(page_count) AS HUGEINT) AS tot
  FROM st GROUP BY 1
), flag AS (
  SELECT st.cell, st.day,
    CASE WHEN CAST(st.page_count AS HUGEINT) * dt.n_day >= dt.tot
         THEN 1 ELSE 0 END AS hot
  FROM st JOIN dt ON dt.day = st.day
), roll AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(hot) AS BIGINT) AS days_hot,
    CAST(sum(CASE WHEN day = (SELECT max(day) FROM st) THEN hot ELSE 0 END)
         AS BIGINT) AS last_hot
  FROM flag GROUP BY 1
)
SELECT cell, n_days, days_hot, last_hot,
  CAST(CASE WHEN last_hot = 1 AND days_hot = n_days AND n_days >= 2 THEN 2
            WHEN last_hot = 1 THEN 1 ELSE 0 END AS BIGINT) AS category
FROM roll ORDER BY cell"""


def geary_c_sql(res: int) -> str:
    """Oracle of stages/hotspot.geary_c: ordered ring-1 pair join, exact
    HUGEINT numerator/denominator, ONE float division round6."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(1, False)}),
st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(page_count) AS HUGEINT) AS sx,
    CAST(sum(CAST(page_count AS HUGEINT) * page_count) AS HUGEINT) AS sxx
  FROM cells),
pr AS (
  SELECT CAST(sum(CAST(c.page_count - n.page_count AS HUGEINT)
                  * (c.page_count - n.page_count)) AS HUGEINT) AS num,
    CAST(count(*) AS HUGEINT) AS s0
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr)
SELECT CAST(st.n AS BIGINT) AS n_cells, CAST(pr.s0 AS BIGINT) AS s0,
  CAST(pr.num AS BIGINT) AS num,
  {round6('CAST((st.n - 1) * pr.num * st.n AS DOUBLE)'
          ' / CAST(2 * pr.s0 * (st.n * st.sxx - st.sx * st.sx) AS DOUBLE)')}
    AS geary_c
FROM pr, st"""


def isoline_cells_sql(res: int, k: int = 1) -> str:
    """Oracle of stages/hotspot.isoline_cells: exact mean-cleared hi flag
    (page_count * n >= S1, all integers), present-neighbor hi/lo counts
    over the k-ring, contour filter."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(page_count) AS BIGINT) AS s1
  FROM cells),
flag AS (
  SELECT c.cell, c.q, c.r,
    CASE WHEN CAST(c.page_count AS BIGINT) * st.n >= st.s1
         THEN 1 ELSE 0 END AS hi
  FROM cells c, st),
nbr AS (
  SELECT c.cell, max(c.hi) AS own_hi,
    CAST(coalesce(sum(n.hi), 0) AS BIGINT) AS n_hi,
    CAST(coalesce(sum(1 - n.hi), 0) AS BIGINT) AS n_lo
  FROM flag c
  CROSS JOIN offsets o
  LEFT JOIN flag n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell)
SELECT cell, CAST(own_hi AS BIGINT) AS own_hi, n_hi, n_lo,
  CAST(own_hi AS BIGINT) AS side
FROM nbr
WHERE (own_hi = 1 AND n_lo >= 1) OR (own_hi = 0 AND n_hi >= 1)
ORDER BY cell"""


def morans_i_sql(res: int, k: int = 1) -> str:
    """Oracle of stages/hotspot.morans_i: global Moran's I over the cell
    table, binary k-ring weights excluding self (x = page_count)."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
st AS (
  SELECT count(*) AS n,
    sum(CAST(page_count AS DOUBLE)) / count(*) AS xbar,
    sum(CAST(page_count AS DOUBLE) * CAST(page_count AS DOUBLE)) AS sxx
  FROM cells),
nbr AS (
  SELECT c.cell, max(CAST(c.page_count AS DOUBLE)) AS x,
    sum(CAST(n.page_count AS DOUBLE)) AS rx, count(n.cell) AS rc
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell),
agg AS (
  SELECT sum((x - st.xbar) * (rx - st.xbar * rc)) AS num, sum(rc) AS s0
  FROM nbr, st)
SELECT
  {round6("(CAST(st.n AS DOUBLE) / agg.s0) * agg.num"
          " / (st.sxx - st.n * st.xbar * st.xbar)")} AS morans_i,
  CAST(agg.s0 AS BIGINT) AS s0, CAST(st.n AS BIGINT) AS n_cells
FROM agg, st"""


def spatial_cluster_sql(res: int, min_count: int = 2, k: int = 1,
                        rounds: int = 16) -> str:
    """Oracle of stages/hotspot.spatial_cluster: DBSCAN-style density
    clusters = connected components of ring-k adjacency over core cells
    (page_count >= min_count); cluster id = min cell id.  Unrolled
    hook+jump min-label supersteps (the dedup_components_sql recurrence:
    coverage at least doubles per round, 2^16 radius margin)."""
    chain, prev = hook_jump_chain(rounds)
    return f"""{prelude(res)},
core AS MATERIALIZED (
  SELECT cell, q, r FROM cells WHERE page_count >= {min_count}),
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
edges AS MATERIALIZED (
  SELECT c.cell AS src, n.cell AS dst
  FROM core c
  CROSS JOIN offsets o
  JOIN core n ON n.q = c.q + o.dq AND n.r = c.r + o.dr),
l0 AS MATERIALIZED (SELECT cell AS v, cell AS l FROM core),
{chain}
SELECT v AS cell, l AS cluster_id
FROM {prev}
ORDER BY cell"""


def local_morans_sql(res: int, k: int = 1) -> str:
    """Oracle of stages/hotspot.local_morans: per-cell LISA + cluster-map
    quadrant (CASE order mirrors the engine's np.where chain)."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
st AS (
  SELECT count(*) AS n,
    sum(CAST(page_count AS DOUBLE)) / count(*) AS xbar,
    sum(CAST(page_count AS DOUBLE) * CAST(page_count AS DOUBLE)) AS sxx
  FROM cells),
nbr AS (
  SELECT c.cell, max(CAST(c.page_count AS DOUBLE)) AS x,
    coalesce(sum(CAST(n.page_count AS DOUBLE)), 0) AS rx,
    count(n.cell) AS rc
  FROM cells c
  CROSS JOIN offsets o
  LEFT JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell),
v AS (
  SELECT cell, x - st.xbar AS z, rx - st.xbar * rc AS zlag_sum, rc,
    st.sxx / st.n - st.xbar * st.xbar AS m2
  FROM nbr, st)
SELECT cell,
  {round6('z * zlag_sum / m2')} AS lisa,
  CASE WHEN z > 0 AND (CASE WHEN rc > 0 THEN zlag_sum / rc ELSE 0 END) > 0 THEN 'HH'
       WHEN z < 0 AND (CASE WHEN rc > 0 THEN zlag_sum / rc ELSE 0 END) < 0 THEN 'LL'
       WHEN z > 0 THEN 'HL'
       ELSE 'LH' END AS quadrant
FROM v
ORDER BY cell"""


def grid_distance_sql(res: int) -> str:
    """Oracle of gridops.grid_distance_field: axial distance of every cell
    to the densest cell (ORDER BY page_count DESC, cell LIMIT 1)."""
    return f"""{prelude(res)},
hot AS (SELECT q AS hq, r AS hr FROM cells ORDER BY page_count DESC, cell LIMIT 1)
SELECT c.cell AS cell,
  CAST((abs(c.q - hq) + abs(c.r - hr) + abs(c.q - hq + c.r - hr)) // 2 AS BIGINT)
    AS dist_to_hotspot
FROM cells c, hot
ORDER BY cell"""


def _grid_path_chain(res: int) -> str:
    """The shared route CTE chain ending in ``pathq(i, pq, pr)`` — the hex
    line between the two densest cells (used by grid_path_sql and
    route_corridor_sql)."""
    return f"""{prelude(res)},
ranked AS (
  SELECT q, r, row_number() OVER (ORDER BY page_count DESC, cell) AS rk
  FROM cells),
e AS (
  SELECT max(CASE WHEN rk = 1 THEN q END) AS q1, max(CASE WHEN rk = 1 THEN r END) AS r1,
         max(CASE WHEN rk = 2 THEN q END) AS q2, max(CASE WHEN rk = 2 THEN r END) AS r2
  FROM ranked WHERE rk <= 2),
n AS (
  SELECT *, (abs(q1 - q2) + abs(r1 - r2) + abs(q1 - q2 + r1 - r2)) // 2 AS dist
  FROM e),
steps AS (
  SELECT n.*, unnest(range(CAST(dist AS BIGINT) + 1)) AS i FROM n),
lerp AS (
  SELECT i,
    CAST(q1 AS DOUBLE) + (q2 - q1) * (CASE WHEN dist = 0 THEN CAST(0 AS DOUBLE)
        ELSE CAST(i AS DOUBLE) / dist END) AS qf,
    CAST(r1 AS DOUBLE) + (r2 - r1) * (CASE WHEN dist = 0 THEN CAST(0 AS DOUBLE)
        ELSE CAST(i AS DOUBLE) / dist END) AS rf
  FROM steps),
cr1 AS (
  SELECT i, qf, rf,
    floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry, floor(rf + 0.5) AS rz
  FROM lerp),
cr2 AS (
  SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
  FROM cr1),
pathq AS (
  SELECT i,
    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS pq,
    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS BIGINT) AS pr
  FROM cr2)"""


def grid_path_sql(res: int) -> str:
    """Oracle of gridops.grid_path: cube lerp between the two densest
    cells with the shared floor(x+0.5) + tie-fix rounding chain (the
    geocoder's enc1/enc2 CASE logic over the interpolated coordinates)."""
    return f"""{_grid_path_chain(res)}
SELECT i AS step,
  CAST({res} AS BIGINT) * {1 << 56} + (pq + {hexgrid.OFF}) * {1 << 28} + (pr + {hexgrid.OFF}) AS cell
FROM pathq
ORDER BY step"""


def route_corridor_sql(res: int, k: int = 1) -> str:
    """Oracle of gridops.route_corridor: the shared route chain, dilated by
    the closed k-ring offsets, distinct corridor coordinates joined back to
    the cell table."""
    return f"""{_grid_path_chain(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, True)}),
corridor AS (
  SELECT DISTINCT p.pq + o.dq AS q, p.pr + o.dr AS r
  FROM pathq p CROSS JOIN offsets o
)
SELECT c.cell, c.page_count
FROM cells c JOIN corridor USING (q, r)
ORDER BY c.cell"""


def _hilbert_chain(bits: int = 16) -> tuple[str, str]:
    """Unrolled xy2d Hilbert recurrence over a CTE ``hseed(cell, x, y, d)``
    — all-integer, mirrors functions/hexgrid.hilbert_key step for step.
    Returns (chain_sql, final_cte_name)."""
    ctes = []
    prev = "hseed"
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        name = f"hb{s}"
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(f"""{name} AS (
  SELECT cell,
    CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s} - 1 - y ELSE y END)
         ELSE x END AS x,
    CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s} - 1 - x ELSE x END)
         ELSE y END AS y,
    d + CAST({s} AS BIGINT) * {s} * xor(3 * {rx}, {ry}) AS d
  FROM {prev}
)""")
        prev = name
    return ",\n".join(ctes), prev


def hilbert_order_sql(res: int) -> str:
    """Oracle of the hilbert_order query: 16-level Hilbert index per cell."""
    chain, last = _hilbert_chain()
    return f"""{prelude(res)},
hseed AS (
  SELECT cell, q + 32768 AS x, r + 32768 AS y, CAST(0 AS BIGINT) AS d
  FROM cells),
{chain}
SELECT cell, d AS hilbert
FROM {last}
ORDER BY hilbert, cell"""


def hilbert_locality_sql(res: int) -> str:
    """A5 locality metric under HILBERT order (the morton_locality_sql
    recurrence with the unrolled Hilbert key)."""
    chain, last = _hilbert_chain()
    return f"""{prelude(res)},
hseed AS (
  SELECT cell, q + 32768 AS x, r + 32768 AS y, CAST(0 AS BIGINT) AS d
  FROM cells),
{chain},
pos AS (
  SELECT cell, d AS hilbert,
    row_number() OVER (ORDER BY cell) - 1 AS orig
  FROM {last}
), o AS (
  SELECT orig, lag(orig) OVER (ORDER BY hilbert, cell) AS prev FROM pos
)
SELECT {round6('CAST(sum(abs(orig - prev)) AS DOUBLE) / count(*)')} AS avg_distance,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM o WHERE prev IS NOT NULL"""


def bivariate_morans_sql(res: int, col_x: str = "en_share",
                         col_y: str = "mention_rate", k: int = 1) -> str:
    """Oracle of stages/hotspot.bivariate_morans (Wartenberg form, binary
    k-ring weights excluding self over present cells)."""
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES {_ring_offsets_values(k, False)}),
st AS (
  SELECT count(*) AS n,
    sum(CAST({col_x} AS DOUBLE)) / count(*) AS xbar,
    sum(CAST({col_x} AS DOUBLE) * CAST({col_x} AS DOUBLE)) AS sxx,
    sum(CAST({col_y} AS DOUBLE)) / count(*) AS ybar,
    sum(CAST({col_y} AS DOUBLE) * CAST({col_y} AS DOUBLE)) AS syy
  FROM cells),
nbr AS (
  SELECT c.cell, max(CAST(c.{col_x} AS DOUBLE)) AS x,
    sum(CAST(n.{col_y} AS DOUBLE)) AS ry, count(n.cell) AS rc
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  GROUP BY c.cell),
agg AS (
  SELECT sum((x - st.xbar) * (ry - st.ybar * rc)) AS num, sum(rc) AS s0
  FROM nbr, st)
SELECT
  {round6("(CAST(st.n AS DOUBLE) / agg.s0) * agg.num"
          " / sqrt((st.sxx - st.n * st.xbar * st.xbar)"
          "        * (st.syy - st.n * st.ybar * st.ybar))")} AS morans_ixy,
  CAST(agg.s0 AS BIGINT) AS s0, CAST(st.n AS BIGINT) AS n_cells
FROM agg, st"""


def hex_gradient_sql(res: int, value_col: str = "chars_mean",
                     ring: int = 1) -> str:
    """Oracle of stages/smooth.hex_gradient: per-cell max |neighbor - center|
    of ``value_col`` over PRESENT ring-``ring`` neighbors (inner join drops
    neighborless cells, like the engine's n_nbr >= 1 filter).  The per-pair
    abs-difference max equals the engine's (max_n - v_c, v_c - min_n) form
    IEEE-exactly because subtraction by a constant is monotone and exactly
    rounded."""
    offs = []
    for rg in range(1, ring + 1):
        offs += hexgrid.ring_offsets(rg)
    return f"""{prelude(res)},
offsets(dq, dr) AS (VALUES
    {", ".join(f"({dq}, {dr})" for dq, dr in offs)})
SELECT c.cell AS cell, CAST(count(n.cell) AS BIGINT) AS n_neighbors,
  {round6(f'max(abs(n.{value_col} - c.{value_col}))')} AS grad
FROM cells c
CROSS JOIN offsets o
JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
GROUP BY c.cell
ORDER BY c.cell"""


def host_gini_sql() -> str:
    """Oracle of stages/textops.host_gini: per-TLD Gini of host page counts.
    row_number over (x, host) — the tie order is irrelevant because
    sum(i * x) is invariant within runs of equal x, which is exactly why
    the engine can close the formula from the count histogram.  Moments in
    HUGEINT (n * total overflows BIGINT at web scale); the one float is the
    identical final division."""
    return f"""WITH {pages_cte()},
h AS (
  SELECT string_split(split_part(url, '/', 3), '.')[-1] AS tld,
         split_part(url, '/', 3) AS host, count(*) AS x
  FROM pages GROUP BY 1, 2
),
r AS (
  SELECT tld, x,
    row_number() OVER (PARTITION BY tld ORDER BY x, host) AS i
  FROM h
),
a AS (
  SELECT tld, CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s0,
         CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS s1
  FROM r GROUP BY tld
)
SELECT tld, CAST(n AS BIGINT) AS n_hosts, CAST(s0 AS BIGINT) AS n_pages,
  {round6('CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / CAST(n * s0 AS DOUBLE)')} AS gini
FROM a
ORDER BY tld"""


def kde_density_sql(res: int, value_col: str = "page_count", k: int = 2,
                    profile: str = "gaussian") -> str:
    """Oracle of stages/smooth.kde_density: the gather form of the heat
    accumulation — sum(w * v) over present {center} + rings<=k, no
    normalization (the smooth_sql numerator)."""
    return f"""{prelude(res)},
offsets(dq, dr, w) AS (VALUES
    {offsets_values(k, profile)})
SELECT c.cell AS cell,
  {round6(f'sum(n.{value_col} * o.w)')} AS density
FROM cells c
CROSS JOIN offsets o
JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
GROUP BY c.cell
ORDER BY c.cell"""


def ripley_k_sql(res: int, radii: tuple[float, ...] | None = None) -> str:
    """Oracle of stages/spatialjoin.ripley_k: pair set = RAW equirectangular
    d2 <= max(radii)^2 (the distance_join predicate), per-radius membership
    on round6(d2) (the join's emitted value), K-hat = the identical
    area * 2.0 * n_pairs / (n * (n-1)) expression tree."""
    if radii is None:
        from ..stages.spatialjoin import RIPLEY_RADII as radii
    radii = tuple(sorted(radii))
    max_radius = max(radii)
    rows = ", ".join(f"({D(r)})" for r in radii)
    d2 = "(a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)"
    return f"""{prelude_geo(res)},
pr AS (
  SELECT {round6(d2)} AS d2r
  FROM geocoded a JOIN geocoded b
    ON a.page_id < b.page_id AND {d2} <= {D(max_radius * max_radius)}
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    min(lat) AS la0, max(lat) AS la1, min(lon) AS lo0, max(lon) AS lo1
  FROM geocoded
),
radii(r) AS (VALUES {rows}),
cnt AS (
  SELECT r, CAST(count(pr.d2r) AS BIGINT) AS n_pairs
  FROM radii LEFT JOIN pr ON pr.d2r <= r * r
  GROUP BY r
)
SELECT cnt.r AS radius, cnt.n_pairs,
  {round6('((st.la1 - st.la0) * (st.lo1 - st.lo0)) * 2.0 * cnt.n_pairs / (st.n * (st.n - 1))')} AS k_hat
FROM cnt, st
ORDER BY radius"""


def tpch_q8_sql() -> str:
    """Oracle of stages/relagg.tpch_q8 (national market share by order
    year: exact integer cents for numerator/denominator, share rounded
    with the engine's own floor(x*1e6+0.5)/1e6)."""
    from ..stages import relagg

    return f"""WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
         AS BIGINT) AS cents,
    s.s_nationkey AS sn
  FROM lineitem
  JOIN part p ON l_partkey = p.p_partkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN orders o ON l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  WHERE p.p_type = '{relagg.Q8_TYPE}'
    AND r.r_name = '{relagg.Q8_REGION}'
    AND o.o_orderdate >= TIMESTAMP '{relagg.Q8_START} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{relagg.Q8_END} 00:00:00'
)
SELECT o_year,
  CAST(sum(CASE WHEN sn = {relagg.Q8_NATION} THEN cents ELSE 0 END)
       AS BIGINT) AS nation_cents,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  floor(CAST(sum(CASE WHEN sn = {relagg.Q8_NATION} THEN cents ELSE 0 END)
             AS DOUBLE)
        / CAST(sum(cents) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year"""


def tpch_q21_sql() -> str:
    """Oracle of stages/relagg.tpch_q21 (sole-late-supplier waiting counts
    on finished multi-supplier orders; lateness adapted to
    l_shipdate > o_orderdate + late_days, declared in the stage)."""
    from ..stages import relagg

    return f"""WITH l AS (
  SELECT l_orderkey, l_suppkey,
    l_shipdate > o_orderdate + INTERVAL {relagg.Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS nsupp,
    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate,
    min(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM l GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE nsupp >= 2 AND nlate = 1 AND s_nationkey = {relagg.Q21_NATION}
GROUP BY s_name
ORDER BY numwait DESC, s_name"""


def semivariogram_sql(res: int, max_d: int | None = None) -> str:
    """Oracle of stages/hotspot.semivariogram (per-lag pair sums over the
    cell table; ordered pairs / 2, engine rounding on gamma)."""
    from ..functions import hexgrid
    from ..stages import hotspot

    k = hotspot.SEMIVAR_MAX_D if max_d is None else max_d
    rows = []
    for d in range(1, k + 1):
        rows += [f"({dq}, {dr}, {d})" for dq, dr in hexgrid.ring_offsets(d)]
    return f"""{prelude(res)},
offsets(dq, dr, d) AS (VALUES {", ".join(rows)}),
pairs AS (
  SELECT o.d, c.page_count AS zc, n.page_count AS zn
  FROM cells c
  CROSS JOIN offsets o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
)
SELECT d, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
  floor(CAST(sum((zc - zn) * (zc - zn)) AS DOUBLE)
        / (CAST(2.0 AS DOUBLE) * CAST(count(*) AS DOUBLE))
        * 1e6 + 0.5) / 1e6 AS gamma
FROM pairs GROUP BY d ORDER BY d"""


def otsu_threshold_sql(res: int) -> str:
    """Oracle of stages/hotspot.otsu_threshold (between-class-variance
    argmax by HUGEINT cross-multiplied fractions, ties -> smallest t —
    the anti-join plan vs the engine's sequential exact scan)."""
    return f"""{prelude(res)},
hist AS (
  SELECT page_count AS v, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY page_count
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS tn, CAST(sum(v * cnt) AS BIGINT) AS ts
  FROM hist
), cum AS (
  SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS n0,
    CAST(sum(v * cnt) OVER (ORDER BY v) AS BIGINT) AS s0
  FROM hist
), cand AS (
  SELECT v AS t, n0, tn,
    CAST(s0 * (tn - n0) - (ts - s0) * n0 AS HUGEINT) AS df,
    CAST(n0 * (tn - n0) AS HUGEINT) AS den
  FROM cum, tot WHERE n0 < tn
)
SELECT a.t AS threshold, a.n0 AS n_below,
  CAST(a.tn - a.n0 AS BIGINT) AS n_above
FROM cand a
WHERE NOT EXISTS (
  SELECT 1 FROM cand b
  WHERE b.df * b.df * a.den > a.df * a.df * b.den
     OR (b.df * b.df * a.den = a.df * a.df * b.den AND b.t < a.t)
)"""


def hist_equalize_sql(res: int, levels: int = 256) -> str:
    """Oracle of stages/hotspot.hist_equalize (integer CDF contrast
    stretch, floor division — bit-exact)."""
    return f"""{prelude(res)},
hist AS (
  SELECT page_count AS v, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY page_count
), cdf AS (
  SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS c FROM hist
), st AS (
  SELECT min(c) AS cmin, max(c) AS n FROM cdf
)
SELECT cell, page_count AS v,
  CAST(((c - cmin) * {levels - 1}) // (n - cmin) AS BIGINT) AS eq
FROM cells JOIN cdf ON page_count = cdf.v CROSS JOIN st
ORDER BY cell"""


def distance_transform_sql(res: int, min_count: int | None = None,
                           max_d: int | None = None) -> str:
    """Oracle of stages/hotspot.distance_transform (min hex distance to a
    seed cell over the 0..max_d offset disk)."""
    from ..functions import hexgrid
    from ..stages import hotspot

    mc = hotspot.DT_MIN_COUNT if min_count is None else min_count
    k = hotspot.DT_MAX_D if max_d is None else max_d
    rows = ["(0, 0, 0)"]
    for d in range(1, k + 1):
        rows += [f"({dq}, {dr}, {d})" for dq, dr in hexgrid.ring_offsets(d)]
    return f"""{prelude(res)},
offsets(dq, dr, d) AS (VALUES {", ".join(rows)})
SELECT c.cell AS cell, CAST(min(o.d) AS BIGINT) AS dist
FROM cells s
CROSS JOIN offsets o
JOIN cells c ON c.q = s.q + o.dq AND c.r = s.r + o.dr
WHERE s.page_count >= {mc}
GROUP BY c.cell
ORDER BY c.cell"""


def hex_voronoi_sql(res: int, min_count: int | None = None,
                    max_d: int | None = None) -> str:
    """Oracle of stages/hotspot.hex_voronoi (nearest-seed argmin with
    (dist, seed) tie order)."""
    from ..functions import hexgrid
    from ..stages import hotspot

    mc = hotspot.DT_MIN_COUNT if min_count is None else min_count
    k = hotspot.DT_MAX_D if max_d is None else max_d
    rows = ["(0, 0, 0)"]
    for d in range(1, k + 1):
        rows += [f"({dq}, {dr}, {d})" for dq, dr in hexgrid.ring_offsets(d)]
    return f"""{prelude(res)},
offsets(dq, dr, d) AS (VALUES {", ".join(rows)}),
cand AS (
  SELECT c.cell, o.d, s.cell AS seed
  FROM cells s
  CROSS JOIN offsets o
  JOIN cells c ON c.q = s.q + o.dq AND c.r = s.r + o.dr
  WHERE s.page_count >= {mc}
), r AS (
  SELECT cell, d, seed,
    row_number() OVER (PARTITION BY cell ORDER BY d, seed) AS rn
  FROM cand
)
SELECT cell, CAST(d AS BIGINT) AS dist, seed
FROM r WHERE rn = 1 ORDER BY cell"""


def unpivot_cells_sql(res: int) -> str:
    """Oracle of stages/relagg.unpivot over the cell-metrics table."""
    return f"""{prelude(res)},
m AS (
  SELECT cell, 'page_count' AS metric, CAST(page_count AS DOUBLE) AS v
  FROM cells
  UNION ALL SELECT cell, 'chars_mean', chars_mean FROM cells
  UNION ALL SELECT cell, 'en_share', en_share FROM cells
  UNION ALL SELECT cell, 'mention_rate', mention_rate FROM cells
)
SELECT cell, metric, {round6('v')} AS value
FROM m ORDER BY cell, metric"""


def tpch_q2_sql() -> str:
    """Oracle of stages/relagg.tpch_q2 (min-unit-price supplier per part;
    unit_micro = cents * 10^6 // qty_centi is exact integer on both
    sides, supplier tie-break by min suppkey)."""
    from ..stages import relagg

    return f"""WITH ql AS (
  SELECT l_partkey, l_suppkey,
    CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = '{relagg.Q2_TYPE}' AND r_name = '{relagg.Q2_REGION}'
    AND floor(l_quantity * 100.0 + 0.5) > 0
), um AS (
  SELECT l_partkey, l_suppkey, cents * 1000000 // qc AS unit_micro FROM ql
), mn AS (
  SELECT l_partkey, min(unit_micro) AS min_unit_micro
  FROM um GROUP BY l_partkey
), best AS (
  SELECT um.l_partkey, CAST(min(um.l_suppkey) AS BIGINT) AS s_suppkey,
         mn.min_unit_micro
  FROM um JOIN mn
    ON um.l_partkey = mn.l_partkey AND um.unit_micro = mn.min_unit_micro
  GROUP BY um.l_partkey, mn.min_unit_micro
)
SELECT b.l_partkey AS p_partkey, '{relagg.Q2_TYPE}' AS p_type,
       CAST(b.min_unit_micro AS BIGINT) AS min_unit_micro,
       b.s_suppkey, s.s_name, n.n_name, s.s_acctbal
FROM best b
JOIN supplier s ON b.s_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY p_partkey"""


def tpch_q9_sql() -> str:
    """Oracle of stages/relagg.tpch_q9 (product-type profit per nation and
    order year; revenue-only profit — partsupp absent, adaptation declared
    in the engine docstring)."""
    from ..stages import relagg

    return f"""WITH f AS (
  SELECT s.s_nationkey AS nk, CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
         AS BIGINT) AS cents
  FROM lineitem
  JOIN part p ON l_partkey = p.p_partkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN orders o ON l_orderkey = o.o_orderkey
  WHERE p.p_name LIKE '%{relagg.Q9_NAME_SUB}%'
)
SELECT n.n_name, f.o_year, CAST(sum(f.cents) AS BIGINT) AS profit_cents
FROM f JOIN nation n ON f.nk = n.n_nationkey
GROUP BY n.n_name, f.o_year
ORDER BY n.n_name, f.o_year DESC"""


def tpch_q11_sql() -> str:
    """Oracle of stages/relagg.tpch_q11 (important stock: per-part traded
    value through one region's suppliers, HAVING value above an exact
    integer cross-multiplied multiple of the mean per-part value)."""
    from ..stages import relagg

    return f"""WITH v AS (
  SELECT l_partkey,
    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{relagg.Q11_REGION}'
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents FROM v
WHERE CAST(value_cents AS HUGEINT) * (SELECT count(*) FROM v)
        * {relagg.Q11_MULT_DEN}
      > (SELECT CAST(sum(value_cents) AS HUGEINT) FROM v)
        * {relagg.Q11_MULT_NUM}
ORDER BY value_cents DESC, l_partkey"""


def tpch_q16_sql() -> str:
    """Oracle of stages/relagg.tpch_q16 (distinct qualifying suppliers per
    (brand, type, size) from lineitem evidence; complaints analog =
    account-balance floor, declared in the engine docstring)."""
    from ..stages import relagg

    sizes = ", ".join(str(int(s)) for s in relagg.Q16_SIZES)
    return f"""WITH pairs AS (
  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_brand <> '{relagg.Q16_EXCL_BRAND}'
    AND p.p_type <> '{relagg.Q16_EXCL_TYPE}'
    AND p.p_size IN ({sizes})
    AND s.s_acctbal >= {relagg.Q16_MIN_BAL}
)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS supplier_cnt
FROM pairs GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""


def tpch_q20_sql() -> str:
    """Oracle of stages/relagg.tpch_q20 (potential part promotion:
    suppliers carrying an outsized exact-integer share of one year's
    movement of prefix-named parts, reported for one nation)."""
    from ..stages import relagg

    return f"""WITH pq AS (
  SELECT l_partkey, l_suppkey,
    CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
         AS BIGINT) AS q
  FROM lineitem JOIN part p ON l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{relagg.Q20_NAME_PREFIX}%'
    AND l_shipdate >= TIMESTAMP '{relagg.Q20_YEAR}-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '{relagg.Q20_YEAR + 1}-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq FROM pq GROUP BY l_partkey
), w AS (
  SELECT DISTINCT pq.l_suppkey FROM pq JOIN tot USING (l_partkey)
  WHERE CAST(pq.q AS HUGEINT) * {relagg.Q20_SHARE_DEN}
        > CAST(tot.tq AS HUGEINT)
)
SELECT s.s_suppkey, s.s_name
FROM w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = '{relagg.Q20_NATION_NAME}'
ORDER BY s.s_suppkey"""


def compact_cells_sql(res: int) -> str:
    """Oracle of stages/gridops.compact_cells: the same three cube-round
    encodes (child->parent, parent-center->child-res anchor, 19 k-ring-2
    candidate probes->parent) in the shared SQL block, completeness by
    exact count compare."""
    size = hexgrid.edge_size(res)
    parent_res = res - 1
    psize = hexgrid.edge_size(parent_res)
    offs = hexgrid.ring_offsets(1) + hexgrid.ring_offsets(2) + [(0, 0)]
    vals = ",\n    ".join(f"({dq}, {dr})" for dq, dr in offs)
    return f"""{prelude(res)},
pc0 AS (
  SELECT cell, {D(size)} * 1.5 * r AS clat,
         {D(size)} * sqrt(3) * (q + r / 2.0) AS clon
  FROM cells
),
pe0 AS (
  SELECT *, (sqrt(3)/3 * clon - clat/3) / {D(psize)} AS qf,
            (2 * clat / 3) / {D(psize)} AS rf
  FROM pc0
),
pe1 AS (
  SELECT *, floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry,
            floor(rf + 0.5) AS rz
  FROM pe0
),
pe2 AS (
  SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy,
            abs(rz - rf) AS dz
  FROM pe1
),
penc AS (
  SELECT cell,
    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END
         AS BIGINT) AS pq,
    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS BIGINT) AS pr
  FROM pe2
),
par AS (
  SELECT pq, pr, CAST(count(*) AS BIGINT) AS n FROM penc GROUP BY pq, pr
),
an0 AS (
  SELECT pq, pr, n, {D(psize)} * 1.5 * pr AS plat,
         {D(psize)} * sqrt(3) * (pq + pr / 2.0) AS plon
  FROM par
),
ae0 AS (
  SELECT *, (sqrt(3)/3 * plon - plat/3) / {D(size)} AS aqf,
            (2 * plat / 3) / {D(size)} AS arf
  FROM an0
),
ae1 AS (
  SELECT *, floor(aqf + 0.5) AS arx, floor(-aqf - arf + 0.5) AS ary,
            floor(arf + 0.5) AS arz
  FROM ae0
),
ae2 AS (
  SELECT *, abs(arx - aqf) AS adx, abs(ary - (-aqf - arf)) AS ady,
            abs(arz - arf) AS adz
  FROM ae1
),
aenc AS (
  SELECT pq, pr, n,
    CAST(CASE WHEN adx > ady AND adx > adz THEN -ary - arz ELSE arx END
         AS BIGINT) AS aq,
    CAST(CASE WHEN adx > ady AND adx > adz THEN arz
              WHEN ady > adz THEN arz
              ELSE -arx - ary END AS BIGINT) AS ar
  FROM ae2
),
offs(dq, dr) AS (VALUES
    {vals}),
cand AS (
  SELECT a.pq, a.pr, a.n, a.aq + o.dq AS ccq, a.ar + o.dr AS ccr
  FROM aenc a CROSS JOIN offs o
),
cc0 AS (
  SELECT *, {D(size)} * 1.5 * ccr AS cclat,
         {D(size)} * sqrt(3) * (ccq + ccr / 2.0) AS cclon
  FROM cand
),
ce0 AS (
  SELECT *, (sqrt(3)/3 * cclon - cclat/3) / {D(psize)} AS cqf,
            (2 * cclat / 3) / {D(psize)} AS crf
  FROM cc0
),
ce1 AS (
  SELECT *, floor(cqf + 0.5) AS crx, floor(-cqf - crf + 0.5) AS cry,
            floor(crf + 0.5) AS crz
  FROM ce0
),
ce2 AS (
  SELECT *, abs(crx - cqf) AS cdx, abs(cry - (-cqf - crf)) AS cdy,
            abs(crz - crf) AS cdz
  FROM ce1
),
cenc AS (
  SELECT pq, pr, n,
    CAST(CASE WHEN cdx > cdy AND cdx > cdz THEN -cry - crz ELSE crx END
         AS BIGINT) AS epq,
    CAST(CASE WHEN cdx > cdy AND cdx > cdz THEN crz
              WHEN cdy > cdz THEN crz
              ELSE -crx - cry END AS BIGINT) AS epr
  FROM ce2
),
flags AS (
  SELECT pq, pr, any_value(n) = sum(CASE WHEN epq = pq AND epr = pr
                                         THEN 1 ELSE 0 END) AS compact
  FROM cenc GROUP BY pq, pr
),
cover AS (
  SELECT CAST({parent_res} AS BIGINT) * {1 << 56}
           + (pq + {hexgrid.OFF}) * {1 << 28} + (pr + {hexgrid.OFF}) AS cell,
         CAST(1 AS BIGINT) AS is_parent
  FROM flags WHERE compact
  UNION ALL
  SELECT p.cell, CAST(0 AS BIGINT) AS is_parent
  FROM penc p JOIN flags f ON p.pq = f.pq AND p.pr = f.pr
  WHERE NOT f.compact
)
SELECT cell, is_parent FROM cover ORDER BY cell"""


def uncompact_cells_sql(res: int) -> str:
    """Oracle of stages/gridops.uncompact_cells via the ROUND-TRIP LAW:
    uncompact(compact(populated cells)) must be exactly the original
    distinct populated-cell set — so the oracle is simply that set.  A
    match proves the whole compact -> expand chain (completeness flags,
    anchor re-encode, 19-probe child enumeration) end-to-end."""
    return f"""{prelude(res)}
SELECT cell FROM cells ORDER BY cell"""


def zonal_majority_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.zonal_majority: same crossing rule,
    per-(polygon, lang) counts, argmax by (n DESC, lang ASC)."""
    from ..stages.pip import polygon_edges

    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})"
        for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude_geo(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
),
inside AS (SELECT page_id, poly_id FROM crossings WHERE n_cross % 2 = 1),
cl AS (
  SELECT i.poly_id, p.lang, CAST(count(*) AS BIGINT) AS n
  FROM inside i JOIN geocoded p ON i.page_id = p.page_id
  GROUP BY i.poly_id, p.lang
),
rk AS (
  SELECT poly_id, lang, n,
    row_number() OVER (PARTITION BY poly_id ORDER BY n DESC, lang) AS r
  FROM cl
)
SELECT poly_id, lang AS major_lang, n FROM rk WHERE r = 1
ORDER BY poly_id"""


def flow_accumulation_sql(res: int, steps: int | None = None) -> str:
    """Oracle of stages/gridops.flow_accumulation: ring-1 argmin drains
    (strictly lower, ties by neighbor id), K unrolled MATERIALIZED
    accumulation supersteps — all integer, bit-exact."""
    from ..stages import gridops

    steps = gridops.FLOW_STEPS if steps is None else steps
    offs = ",\n    ".join(f"({dq}, {dr})"
                          for dq, dr in hexgrid.ring_offsets(1))
    chain = []
    prev = "a0"
    for i in range(1, steps + 1):
        chain.append(f"""a{i} AS MATERIALIZED (
  SELECT c.cell, 1 + COALESCE(s.x, 0) AS acc
  FROM cells c LEFT JOIN (
    SELECT d.drain_to AS cell, CAST(sum(a.acc) AS BIGINT) AS x
    FROM drains d JOIN {prev} a ON d.cell = a.cell
    WHERE d.drain_to >= 0
    GROUP BY 1
  ) s ON c.cell = s.cell
)""")
        prev = f"a{i}"
    steps_sql = ",\n".join(chain)
    return f"""{prelude(res)},
offs(dq, dr) AS (VALUES
    {offs}),
nb AS MATERIALIZED (
  SELECT c.cell AS src, n.cell AS dst, n.page_count AS dv
  FROM cells c CROSS JOIN offs o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  WHERE n.page_count < c.page_count
),
dr0 AS (
  SELECT src, dst,
    row_number() OVER (PARTITION BY src ORDER BY dv, dst) AS rk
  FROM nb
),
drains AS MATERIALIZED (
  SELECT c.cell, COALESCE(d.dst, -1) AS drain_to
  FROM cells c LEFT JOIN (SELECT src, dst FROM dr0 WHERE rk = 1) d
    ON c.cell = d.src
),
a0 AS MATERIALIZED (
  SELECT cell, CAST(1 AS BIGINT) AS acc FROM cells
),
{steps_sql}
SELECT d.cell, d.drain_to, a.acc
FROM drains d JOIN {prev} a ON d.cell = a.cell
ORDER BY d.cell"""


def watershed_sql(res: int, jumps: int | None = None) -> str:
    """Oracle of stages/gridops.watershed: the same drain derivation as
    flow_accumulation_sql, then K unrolled pointer-DOUBLING jumps
    (p := p(p)) as MATERIALIZED self-joins."""
    from ..stages import gridops

    jumps = gridops.WATERSHED_JUMPS if jumps is None else jumps
    offs = ",\n    ".join(f"({dq}, {dr})"
                          for dq, dr in hexgrid.ring_offsets(1))
    chain = []
    prev = "j0"
    for i in range(1, jumps + 1):
        chain.append(f"""j{i} AS MATERIALIZED (
  SELECT a.cell, b.p FROM {prev} a JOIN {prev} b ON a.p = b.cell
)""")
        prev = f"j{i}"
    steps_sql = ",\n".join(chain)
    return f"""{prelude(res)},
offs(dq, dr) AS (VALUES
    {offs}),
nb AS MATERIALIZED (
  SELECT c.cell AS src, n.cell AS dst, n.page_count AS dv
  FROM cells c CROSS JOIN offs o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
  WHERE n.page_count < c.page_count
),
dr0 AS (
  SELECT src, dst,
    row_number() OVER (PARTITION BY src ORDER BY dv, dst) AS rk
  FROM nb
),
j0 AS MATERIALIZED (
  SELECT c.cell, COALESCE(d.dst, c.cell) AS p
  FROM cells c LEFT JOIN (SELECT src, dst FROM dr0 WHERE rk = 1) d
    ON c.cell = d.src
),
{steps_sql}
SELECT cell, p AS sink FROM {prev} ORDER BY cell"""


def zone_terms_sql(res: int, k: int | None = None) -> str:
    """Oracle of stages/spatialjoin.zone_terms: same crossing rule, same
    \\s+ tokenization, per-(polygon, token) counts, top-k by (n DESC,
    token ASC)."""
    from ..stages.pip import polygon_edges
    from ..stages.spatialjoin import ZONE_TERMS_K

    k = ZONE_TERMS_K if k is None else k
    edges = ",\n    ".join(
        f"({pid}, {D(y1)}, {D(x1)}, {D(y2)}, {D(x2)})"
        for pid, y1, x1, y2, x2 in polygon_edges()
    )
    return f"""{prelude_geo(res)},
edges(poly_id, y1, x1, y2, x2) AS (VALUES
    {edges}),
crossings AS (
  SELECT p.page_id, e.poly_id, count(*) AS n_cross
  FROM geocoded p
  JOIN edges e
    ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY p.page_id, e.poly_id
),
inside AS (SELECT page_id, poly_id FROM crossings WHERE n_cross % 2 = 1),
toks AS (
  SELECT i.poly_id, unnest(list_filter(
      regexp_split_to_array(p.text, '\\s+'), x -> x <> '')) AS token
  FROM inside i JOIN geocoded p ON i.page_id = p.page_id
),
ct AS (
  SELECT poly_id, token, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY poly_id, token
),
rk AS (
  SELECT poly_id, token, n,
    row_number() OVER (PARTITION BY poly_id ORDER BY n DESC, token) AS r
  FROM ct
)
SELECT poly_id, CAST(r AS BIGINT) AS rank, token, n
FROM rk WHERE r <= {k} ORDER BY poly_id, rank"""


def host_extent_sql(res: int) -> str:
    """Oracle of stages/spatialjoin.host_extent (per-host bounding box of
    page locations, canonical rounding on output)."""
    from ..functions import geocode

    return f"""{prelude_geo(res)}
SELECT (page_id * {geocode.TLD_MULT}) % {geocode.HOST_MOD} AS host,
  CAST(count(*) AS BIGINT) AS n_pages,
  {round6('min(lat)')} AS min_lat, {round6('max(lat)')} AS max_lat,
  {round6('min(lon)')} AS min_lon, {round6('max(lon)')} AS max_lon,
  {round6('(max(lat) - min(lat)) * (max(lon) - min(lon))')} AS extent_deg2
FROM geocoded
GROUP BY 1 ORDER BY host"""


def cheapest_path_cost_sql(res: int, rounds: int | None = None) -> str:
    """Oracle of stages/gridops.cheapest_path_cost: the same K min-combine
    relaxation rounds unrolled as MATERIALIZED CTEs (bfs_hops pattern,
    with enter-cost weights)."""
    from ..stages import gridops

    rounds = gridops.COST_ROUNDS if rounds is None else rounds
    offs = ",\n    ".join(f"({dq}, {dr})"
                          for dq, dr in hexgrid.ring_offsets(1))
    chain = []
    prev = "d0"
    for i in range(1, rounds + 1):
        chain.append(f"""d{i} AS MATERIALIZED (
  SELECT cell, CAST(min(d) AS BIGINT) AS d FROM (
    SELECT cell, d FROM {prev}
    UNION ALL
    SELECT e.dst AS cell, p.d + e.dst_cost AS d
    FROM edges e JOIN {prev} p ON e.src = p.cell
  ) GROUP BY cell
)""")
        prev = f"d{i}"
    steps_sql = ",\n".join(chain)
    return f"""{prelude(res)},
offs(dq, dr) AS (VALUES
    {offs}),
edges AS MATERIALIZED (
  SELECT c.cell AS src, n.cell AS dst,
         CAST(n.page_count AS BIGINT) AS dst_cost
  FROM cells c CROSS JOIN offs o
  JOIN cells n ON n.q = c.q + o.dq AND n.r = c.r + o.dr
),
d0 AS MATERIALIZED (
  SELECT cell, CAST(0 AS BIGINT) AS d FROM (
    SELECT cell FROM cells ORDER BY page_count DESC, cell LIMIT 1
  )
),
{steps_sql}
SELECT cell, d AS cost_dist FROM {prev} ORDER BY cell"""


def zonemap_range_sql(res: int, lo: int, hi: int) -> str:
    """Oracle of state/zonemap.clustered_range_counts: the key-range
    aggregate the zone-mapped layout answers by file pruning — in SQL it is
    a plain WHERE over the full geocoded set (the oracle checks the ANSWER;
    the pruning itself is asserted in tests/test_zonemap.py)."""
    return f"""{prelude_geo(res)}
SELECT cell, count(*) AS page_count
FROM geocoded
WHERE cell >= {lo} AND cell <= {hi}
GROUP BY cell
ORDER BY cell"""


def zonemap_token_search_sql(token: str) -> str:
    """Oracle of state/zonemap.clustered_token_search: the token-predicate
    row set the bloom-pruned read must return exactly — a row matches iff
    its RE2 whitespace tokenization contains ``token`` (both engines split
    with RE2 ``\\s+``; bloom false positives are removed by the engine's
    exact filter, so the SQL needs no bloom model)."""
    return f"""WITH {pages_cte()}
SELECT page_id FROM pages
WHERE list_contains(regexp_split_to_array(text, '\\s+'), '{token}')
ORDER BY page_id"""
