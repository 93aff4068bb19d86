"""Dialect-neutral SQL snippets shared by the engine (Spark SQL) and the
DuckDB oracle — the SAME text parses and evaluates identically in both.

Why: the driver's correctness gate hashes values of the Spark result vs
a DuckDB oracle. Synthetic geocoding and tile math must therefore be
*bit-exact* across engines. We restrict these snippets to operations
with identical IEEE-754 behavior (integer %, *, +, -, /, CASE, LN, TAN,
PI(), CEIL, CAST) and keep operation ORDER identical — so both engines
execute the same float op sequence.

Page geocoding derivation (FIXTURES.md F1): each doc gets deterministic
integer hashes; ~60% carry an "embedded coordinate" (the html
<meta geo.position> analog), ~30% geocode via TLD centroid (the geocode
cache analog, ogr/ogr_geocoding.cpp:118), ~10% have no geo signal
(null geometry — excluded from spatial ops, preserved in passthrough).
70% of embedded coords cluster in 5 urban hotspot discs (skew is
intentional: hot-cell salting tests), 30% uniform.

Tile math: exact gdal2tiles.py GlobalMercator formulas (see
gdal_spark/geo/mercator.py for the full citation list).
"""

from __future__ import annotations

from gdal_spark.fixtures import HOTSPOTS, TLD_CENTROIDS, TLDS, dlit

# Multiplicative hash constants (Knuth / xxhash-prime flavored)
_H1 = "(({k}) * 2654435761) % 4294967296"
_H2 = "(({k}) * 2246822519 + 3266489917) % 4294967296"
_H3 = "(({k}) * 3266489917 + 668265263) % 4294967296"


def _lookup(expr: str, values, dialect: str, quote=False) -> str:
    """1-based indexed lookup into a literal array — the codegen-light
    replacement for an N-arm CASE chain (a 12-arm CASE × 6 columns blew
    Spark's whole-stage-codegen past janino's 64 KB method limit and
    forced interpreted execution of the geocode projection). Spark and
    DuckDB spell list indexing differently, so this is the one
    dialect-split snippet; the element VALUES are identical literals.
    """
    lits = ", ".join(
        f"'{v}'" if quote else f"CAST({float(v)!r} AS DOUBLE)" for v in values)
    idx = f"CAST({expr} AS INT) + 1"
    if dialect == "spark":
        return f"element_at(array({lits}), {idx})"
    return f"list_extract(list_value({lits}), {idx})"


def geo_exprs(key: str, dialect: str = "duck") -> dict[str, str]:
    """SQL expressions keyed off an integer column `key`:
    geo_src ('embed'|'tld'|NULL), lat, lon (NULL when no geo)."""
    h1, h2, h3 = _H1.format(k=key), _H2.format(k=key), _H3.format(k=key)
    hot_k = f"({h1}) % 5"
    hot_lat = _lookup(hot_k, [lat for lat, _ in HOTSPOTS], dialect)
    hot_lon = _lookup(hot_k, [lon for _, lon in HOTSPOTS], dialect)
    tld_idx = f"({h1}) % {len(TLDS)}"
    tld = _lookup(tld_idx, TLDS, dialect, quote=True)
    tld_lat = _lookup(tld_idx, [TLD_CENTROIDS[t][0] for t in TLDS], dialect)
    tld_lon = _lookup(tld_idx, [TLD_CENTROIDS[t][1] for t in TLDS], dialect)
    embed_lat = (f"CASE WHEN ({h1}) % 10 < 7 THEN {hot_lat} + ((({h2}) % 20001) - 10000) * 0.0001 "
                 f"ELSE ((({h2}) % 160001) * 0.001) - 80.0 END")
    embed_lon = (f"CASE WHEN ({h1}) % 10 < 7 THEN {hot_lon} + ((({h3}) % 20001) - 10000) * 0.0001 "
                 f"ELSE ((({h3}) % 360001) * 0.001) - 180.0 END")
    src = f"CASE WHEN ({h1}) % 100 < 60 THEN 'embed' WHEN ({h1}) % 100 < 90 THEN 'tld' ELSE NULL END"
    return {
        "tld": tld, "geo_src": src,
        "embed_lat": embed_lat, "embed_lon": embed_lon,
        "tld_lat": tld_lat, "tld_lon": tld_lon,
    }


def _latlon_select(cols: str, lat_expr: str, lon_expr: str, src: str,
                   dialect: str) -> str:
    """Final geocode SELECT with the lat/lon CASE trees evaluated ONCE.

    Spark's CollapseProject inlines CTE projections into every
    consumer, so a downstream plan that references lat/lon several
    times (tile x AND y, a null filter, the output row) re-evaluates
    the whole hash+CASE+lookup tree per reference — and the inlined
    expression blob blows the joined stage past JIT method limits
    (measured 17x: a 19M-row cover join went 33 s -> 1.9 s). A
    one-element ``inline(array(struct(...)))`` generator is a
    collapse barrier Catalyst respects WITHOUT an exchange or a cache:
    same rows, same values, geocode evaluated exactly once per row.
    DuckDB (the oracle) keeps the plain projection — semantics are
    identical; only Spark needs the barrier."""
    if dialect == "spark":
        return (f"SELECT {cols}, g.lat, g.lon FROM {src}\n"
                f"  LATERAL VIEW inline(array(struct({lat_expr}, {lon_expr})))"
                f" g AS lat, lon")
    return (f"SELECT {cols}, {lat_expr} AS lat, {lon_expr} AS lon "
            f"FROM {src}")


def pages_cte(src_table: str = "documents", dialect: str = "duck") -> str:
    """CTE body: documents → pages(doc_id, url, tld, lang, text, n_chars,
    geo_src, lat, lon). Geocode rule: embedded coordinate wins, else TLD
    centroid, else null geometry (FIXTURES.md F1)."""
    e = geo_exprs("doc_id", dialect)
    lat = (f"CAST(CASE WHEN geo_src = 'embed' THEN embed_lat "
           f"WHEN geo_src = 'tld' THEN {e['tld_lat']} END AS DOUBLE)")
    lon = (f"CAST(CASE WHEN geo_src = 'embed' THEN embed_lon "
           f"WHEN geo_src = 'tld' THEN {e['tld_lon']} END AS DOUBLE)")
    cols = ("doc_id, 'https://doc-' || CAST(doc_id AS STRING) || '.' || tld"
            " AS url, tld, lang, text, n_chars, geo_src")
    return f"""
pages0 AS (
  SELECT doc_id, text, lang, n_chars, {e['tld']} AS tld, {e['geo_src']} AS geo_src,
         {e['embed_lat']} AS embed_lat, {e['embed_lon']} AS embed_lon
  FROM {src_table}
),
pages AS (
  {_latlon_select(cols, lat, lon, "pages0", dialect)}
)"""


def html_cte(dialect: str = "duck") -> str:
    """pages → htmlpages(doc_id, tld, text, html): deterministic
    Common-Crawl-style page markup for the extraction / link-graph ops
    (the html:binary column of the input_hint, synthesised in-engine —
    FIXTURES.md discipline: same arithmetic, both dialects).

    Markup shape: head boilerplate (title + tracking script), a <nav>
    with 0-3 outbound anchors, the document text entity-escaped inside
    <div id="main"><p>…</p></div>, and a <footer>. Anchor i of doc d
    (emitted when d % 4 > i) targets doc (d*7919 + i*104729) % 100000,
    whose host tld follows the same hash-lookup rule as the geocoder —
    so a parser must recover both the id and the tld byte-exactly."""
    esc = ("replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), "
           "'>', '&gt;')")
    anchors = []
    for i in range(3):
        dst = f"(doc_id * 7919 + {i * 104729}) % 100000"
        tld_i = geo_exprs(dst, dialect)["tld"]
        anchors.append(
            f"CASE WHEN doc_id % 4 > {i} THEN "
            f"'<a href=\"https://doc-' || CAST({dst} AS STRING) || '.' || "
            f"{tld_i} || '/p\">r{i}</a>' ELSE '' END")
    a0, a1, a2 = anchors
    return f"""
htmlpages AS (
  SELECT doc_id, tld, text,
         '<html><head><title>doc-' || CAST(doc_id AS STRING) || '</title>'
         || '<script>var t="' || tld || '";track()</script></head><body><nav>'
         || {a0} || {a1} || {a2}
         || '</nav><div id="main"><p>' || {esc}
         || '</p></div><footer>&copy; ' || tld || '</footer></body></html>'
           AS html
  FROM pages
)"""


def points_cte(src_table: str = "lineitem", dialect: str = "duck") -> str:
    """High-volume points table derived from lineitem (600k rows at
    sf0.1) for throughput benchmarks: key = l_orderkey*8+l_linenumber."""
    key = "(l_orderkey * 8 + l_linenumber)"
    e = geo_exprs(key, dialect)
    # level-2 expressions re-key off pt_id (same value as `key`)
    e2 = geo_exprs("pt_id", dialect)
    lat = (f"CAST(CASE WHEN geo_src = 'embed' THEN embed_lat "
           f"WHEN geo_src = 'tld' THEN {e2['tld_lat']} END AS DOUBLE)")
    lon = (f"CAST(CASE WHEN geo_src = 'embed' THEN embed_lon "
           f"WHEN geo_src = 'tld' THEN {e2['tld_lon']} END AS DOUBLE)")
    return f"""
pts0 AS (
  SELECT {key} AS pt_id, l_quantity AS value, {e['geo_src']} AS geo_src,
         {e['embed_lat']} AS embed_lat, {e['embed_lon']} AS embed_lon, {e['tld']} AS tld
  FROM {src_table}
),
points AS (
  {_latlon_select("pt_id, value, geo_src", lat, lon, "pts0", dialect)}
)"""


# -------------------------------------------------------- hilbert code ---

def hilbert_ctes(src_rel: str, carry_cols: list[str],
                 order: int = 8) -> tuple[str, str]:
    """Chained-CTE Hilbert xy→d encoding (the spatial sort key of
    ``gdal vector sort`` — apps/gdalalg_vector_sort.cpp:40,302-375 uses
    GDALHilbertCode over the layer extent; alg/hilbert.cpp math).

    Input relation ``src_rel`` must expose integer columns ``hx, hy`` in
    [0, 2^order). Returns (cte_sql, final_rel): final relation carries
    ``carry_cols`` plus ``hd`` (the Hilbert index) and the rotated
    hx/hy scratch columns.

    Dialect-portable: only &, *, +, -, CASE (DuckDB's ^ is POW and
    Spark lacks EXCLUDE, so columns are explicit and the quadrant
    Gray-code XOR is spelled as a CASE table). One CTE per bit level
    keeps the expression tree linear (inlining would grow 3^order).
    """
    n = 1 << order
    ctes = []
    prev = src_rel
    for lvl in range(order):
        s = 1 << (order - 1 - lvl)
        rel = f"_hl{lvl}"
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
                f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
                f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)")
        d0 = "0" if lvl == 0 else "hd"
        new_x = (f"(CASE WHEN {ry} = 1 THEN hx "
                 f"WHEN {rx} = 0 THEN hy ELSE {s} - 1 - hy END)")
        new_y = (f"(CASE WHEN {ry} = 1 THEN hy "
                 f"WHEN {rx} = 0 THEN hx ELSE {s} - 1 - hx END)")
        carry = ", ".join(carry_cols)
        ctes.append(
            f"{rel} AS (SELECT {carry}, "
            f"{new_x} AS hx, {new_y} AS hy, "
            f"{d0} + {s * s} * {quad} AS hd FROM {prev})")
        prev = rel
    return ",\n".join(ctes), prev


def hilbert_d_py(x: int, y: int, order: int = 8) -> int:
    """Reference Python twin of hilbert_ctes (test oracle)."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


# ----------------------------------------------------------- tile math ---

def tile_sql(lat: str, lon: str, z: int, xyz: bool = True) -> tuple[str, str]:
    """(tx, ty) SQL expressions — op-ordered identically to
    mercator.tile_cols / latlon_to_tile_np (gdal2tiles.py:423-465,512-516).
    """
    mx = f"(({lon}) * (PI() * 6378137)) / 180.0"
    my = (f"(LN(TAN((90.0 + ({lat})) * PI() / 360.0)) / (PI() / 180.0))"
          f" * (PI() * 6378137) / 180.0")
    res = f"(2.0 * PI() * 6378137 / 256.0 / POWER(2.0, {z}))"
    px = f"(({mx}) + PI() * 6378137) / {res}"
    py = f"(({my}) + PI() * 6378137) / {res}"
    tx = f"CAST(CEIL(({px}) / 256.0) AS BIGINT) - 1"
    ty = f"CAST(CEIL(({py}) / 256.0) AS BIGINT) - 1"
    if xyz:
        ty = f"{2 ** z - 1} - ({ty})"
    return tx, ty
