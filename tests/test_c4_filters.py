"""Non-vacuity proof for the C4 filter set: every rule must actually
fire on the seeded fixture (a filter that never drops anything would
still hash-match a broken twin)."""

import duckdb

from conftest import SF_SMOKE


def _con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'")
    return con


def test_every_c4_rule_fires():
    from gdal_spark.queries import _C4_LINES
    con = _con()
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]

    stats = con.execute("WITH " + _C4_LINES + """
SELECT
  (SELECT COUNT(*) FROM lines
   WHERE substr(line, length(line), 1) NOT IN ('.', '!', '?', '"')),
  (SELECT COUNT(*) FROM lines
   WHERE (length(trim(line)) - length(replace(trim(line), ' ', '')) + 1) < 5),
  (SELECT COUNT(*) FROM lines WHERE lower(line) LIKE '%javascript%'),
  (SELECT COUNT(DISTINCT doc_id) FROM lines
   WHERE lower(line) LIKE '%lorem ipsum%'),
  (SELECT COUNT(DISTINCT doc_id) FROM lines WHERE line LIKE '%{%')
""").fetchone()
    unpunct, short, js, lorem, brace = stats
    assert unpunct > 0 and short > 0 and js > 0
    assert lorem > 0 and brace > 0

    # the 3-sentence page rule fires on %35 pages (js + unpunct overlap)
    few = con.execute("WITH " + _C4_LINES + """
SELECT COUNT(*) FROM (
  SELECT doc_id FROM kept GROUP BY doc_id HAVING COUNT(*) < 3)
""").fetchone()[0]
    if n_docs > 35:
        assert few > 0

    # survivors exist and each keeps >= 3 lines
    kept = con.execute("WITH " + _C4_LINES + """
SELECT MIN(n), COUNT(*) FROM (
  SELECT COUNT(*) AS n FROM kept
  WHERE doc_id NOT IN (SELECT doc_id FROM bad_docs)
  GROUP BY doc_id HAVING COUNT(*) >= 3)
""").fetchone()
    assert kept[0] >= 3 and kept[1] > 0
