"""Source-format round trips (SURVEY §2.1 — the reference's ~220
format drivers are out of scope, but the Spark source surface for the
interchange formats a pipeline actually meets is exercised here):
CSV and JSON-lines with explicit schemas (no inference pass — the
10^12-row rule: schema inference is a full extra scan), plus
compression passthrough."""

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _docs(spark):
    return (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "lang", "n_chars"))


def test_csv_round_trip_explicit_schema(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_csv")
    docs.write.option("header", True).mode("overwrite").csv(path)
    back = (spark.read
            .schema("doc_id bigint, lang string, n_chars bigint")
            .option("header", True).csv(path))
    assert back.schema == docs.schema
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))


def test_jsonl_round_trip_gzip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_jsonl")
    (docs.write.option("compression", "gzip")
     .mode("overwrite").json(path))
    back = (spark.read
            .schema("doc_id bigint, lang string, n_chars bigint")
            .json(path))
    assert back.count() == docs.count()
    got = back.agg(F.sum("n_chars"), F.count_distinct("lang")).first()
    want = docs.agg(F.sum("n_chars"), F.count_distinct("lang")).first()
    assert tuple(got) == tuple(want)


def test_csv_malformed_rows_are_permissive_null(spark, tmp_path):
    """DROPMALFORMED/PERMISSIVE is the crawl-ingest contract: one bad
    row must not kill a 10^12-row job."""
    p = tmp_path / "bad.csv"
    p.write_text("doc_id,lang,n_chars\n1,en,10\nnot_a_number,fr,2\n3,de,7\n")
    df = (spark.read
          .schema("doc_id bigint, lang string, n_chars bigint")
          .option("header", True).option("mode", "PERMISSIVE")
          .csv(str(p)))
    rows = sorted(df.collect(), key=lambda r: (r.doc_id is None, r.doc_id or 0))
    assert len(rows) == 3
    assert rows[0].doc_id == 1 and rows[1].doc_id == 3
    assert rows[2].doc_id is None
