"""html synthesis → extraction round-trip and link-graph parity.

The gated queries prove byte-identity against the sf fixtures; these
tests drive the same kernels over ADVERSARIAL text the fixture can't
contain — pre-escaped entities, markup look-alikes, empty bodies —
where a wrong escape/unescape order or a lazy regex would break."""

import pyspark.sql.functions as F

from gdal_spark import sqlexpr

TRICKY = [
    (0, "plain body text"),
    (4, "ampersand & lt &lt; gt &gt; amp &amp; mixed &amp;lt;"),
    (8, "<div id=\"main\"><p>fake markup inside text</p></div>"),
    (12, "</p></div> early terminator then more text"),
    (16, ""),
    (20, "unicode: café 日本 ☃ & <tags> &amp;"),
]


def _html_df(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.selectExpr("doc_id", "text", "5 AS n_chars", "'en' AS lang")
    df.createOrReplaceTempView("documents")
    return spark.sql(
        f"WITH {sqlexpr.pages_cte(dialect='spark')},"
        f"{sqlexpr.html_cte('spark')} SELECT * FROM htmlpages")


def _extract(html_col):
    body = F.regexp_extract(
        html_col, '(?s)<div id="main"><p>(.*)</p></div>', 1)
    return F.replace(
        F.replace(F.replace(body, F.lit("&lt;"), F.lit("<")),
                  F.lit("&gt;"), F.lit(">")),
        F.lit("&amp;"), F.lit("&"))


def test_roundtrip_tricky_bodies(spark):
    got = (_html_df(spark, TRICKY)
           .select("doc_id", "text", _extract(F.col("html")).alias("out"))
           .collect())
    assert len(got) == len(TRICKY)
    for r in got:
        assert r["out"] == r["text"], f"doc {r['doc_id']} mutated"


def test_anchor_count_follows_emission_rule(spark):
    rows = [(i, f"body {i}") for i in range(16)]
    got = (_html_df(spark, rows)
           .select("doc_id",
                   F.size(F.regexp_extract_all(
                       "html",
                       F.lit('href="https://doc-([0-9]+[.][a-z]+)/p"'),
                       1)).alias("n"))
           .collect())
    for r in got:
        assert r["n"] == r["doc_id"] % 4


def test_parsed_edges_match_arithmetic_rule(spark):
    rows = [(i, "x") for i in range(40)]
    hosts = F.regexp_extract_all(
        "html", F.lit('href="https://doc-([0-9]+[.][a-z]+)/p"'), 1)
    parsed = {(r["doc_id"], r["host"]) for r in
              _html_df(spark, rows)
              .select("doc_id", F.explode(hosts).alias("host")).collect()}
    e = sqlexpr.geo_exprs("dst_id", "spark")
    want = set()
    expect = spark.sql(
        "SELECT doc_id, i, (doc_id * 7919 + i * 104729) % 100000 AS dst_id"
        " FROM (SELECT explode(sequence(0, 39)) AS doc_id)"
        " LATERAL VIEW explode(sequence(0, 2)) t AS i"
        " WHERE doc_id % 4 > i")
    expect = expect.selectExpr("doc_id", "dst_id", f"{e['tld']} AS tld")
    for r in expect.collect():
        want.add((r["doc_id"], f"{r['dst_id']}.{r['tld']}"))
    assert parsed == want
