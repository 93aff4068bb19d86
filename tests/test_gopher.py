"""Gopher quality rules: direct per-doc recomputation and rule
non-vacuity."""

from gdal_spark.queries import (GOPHER_MIN_STOPWORDS, GOPHER_MIN_WORDS,
                                GOPHER_STOPWORDS)

SF = "/root/testdata/sf0.001"


def test_rules_match_direct(spark):
    import pytest as pt

    from gdal_spark.queries import docs_df, q_gopher_quality
    texts = {r.doc_id: r.text
             for r in docs_df(spark, SF).select("doc_id", "text").collect()}
    got = {r.doc_id: r for r in q_gopher_quality(spark, SF).collect()}
    assert set(got) == set(texts)
    for d, t in texts.items():
        ws = t.strip().lower().split()
        r = got[d]
        assert r.n_words == len(ws)
        assert r.mean_wl == pt.approx(sum(map(len, ws)) / len(ws), abs=1e-6)
        assert r.n_stop == len(set(ws) & set(GOPHER_STOPWORDS))
        keep = (GOPHER_MIN_WORDS <= len(ws) <= 100_000
                and 3.0 <= sum(map(len, ws)) / len(ws) <= 10.0
                and len(set(ws) & set(GOPHER_STOPWORDS))
                >= GOPHER_MIN_STOPWORDS
                and r.alpha_ratio >= 0.8)
        assert bool(r.keep) == keep, d


def test_rules_split_corpus(spark):
    from gdal_spark.queries import q_gopher_quality
    import pandas as pd
    df = q_gopher_quality(spark, SF).toPandas()
    assert 0.05 < df["keep"].mean() < 0.95
    assert df["ok_words"].mean() < 1.0   # word-count rule fires
    assert df["ok_stop"].mean() < 1.0    # stopword rule fires
