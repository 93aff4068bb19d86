"""Corpus-level span dedup (C4-style) vs a complete Python brute-force
twin over sf0.001 (500 docs + 40 exact-copy twins)."""

import hashlib

from gdal_spark.queries import SPAN_DUP_OFFSET, SPAN_SEEDS, SPAN_WORDS

SF = "/root/testdata/sf0.001"


def _brute(texts: dict):
    corpus = dict(texts)
    for d in sorted(texts):
        if d < SPAN_SEEDS:
            corpus[d + SPAN_DUP_OFFSET] = texts[d]
    seen = set()
    out = {}
    for d in sorted(corpus):
        words = corpus[d].split(" ")
        spans = [" ".join(words[i * SPAN_WORDS:(i + 1) * SPAN_WORDS])
                 for i in range(-(-len(words) // SPAN_WORDS))]
        kept = [s for s in spans if s not in seen]
        seen.update(spans)
        out[d] = (len(spans), len(kept),
                  hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


def test_matches_python_brute_force(spark):
    from gdal_spark.queries import docs_df, q_line_dedup
    texts = {r.doc_id: r.text
             for r in docs_df(spark, SF).select("doc_id", "text").collect()}
    want = _brute(texts)
    got = {r.doc_id: (r.n_spans, r.n_kept, r.sig)
           for r in q_line_dedup(spark, SF).collect()}
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == want[d], d
    # twins contribute nothing; the removal path is non-vacuous
    assert all(got[d][1] == 0 for d in got if d >= SPAN_DUP_OFFSET)
    removed = sum(n - k for n, k, _ in got.values())
    assert removed > SPAN_SEEDS  # twins + natural cross-doc dups
