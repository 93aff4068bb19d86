"""URL canonicalization: golden expectations per fixture family and
the canonical-dup grouping invariants."""

SF = "/root/testdata/sf0.001"


def test_golden_canonical_forms(spark):
    from gdal_spark.queries import q_url_canonical
    rows = {r.doc_id: r for r in q_url_canonical(spark, SF).collect()}
    # family 0: scheme+host lowercased, :80 dropped, fragment dropped
    assert rows[5].canon == "http://example.com/Docs/5"
    # family 1: :443 dropped, utm_source stripped, params sorted
    assert rows[6].canon == "https://www.site.org/a/b?a=1&id=6&z=9"
    # family 2: non-default port kept, utm_campaign stripped, sorted
    assert rows[7].canon == "http://host.net:8080/p?a=1&b=2"
    # family 3: already canonical — unchanged
    assert rows[8].canon == "https://cdn.example.com/x/y"
    # family 4: doc_id%7 collapse, empty query -> no '?'
    assert rows[9].canon == "https://example.com/Docs/2"


def test_dup_groups(spark):
    from gdal_spark.queries import q_url_canonical
    rows = q_url_canonical(spark, SF).collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canon, []).append(r)
    for canon, grp in by_canon.items():
        assert all(r.n_same == len(grp) for r in grp), canon
    # family 3 collapses to ONE canonical url shared by ~n/5 docs
    big = max(len(g) for g in by_canon.values())
    assert big >= len(rows) // 5 - 1
    # path case is preserved (only scheme/host lowercase)
    assert any("/Docs/" in c for c in by_canon)
