"""dedup_clusters: connected components over the verified LSH pairs vs
a Python union-find; representative = min id per component."""

SF = "/root/testdata/sf0.001"


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_clusters_match_union_find(spark):
    from gdal_spark.operators import dedup as dedup_op
    from gdal_spark.queries import docs_df, q_dedup_clusters
    pairs = [(r.id_a, r.id_b) for r in
             dedup_op.minhash_lsh_pairs(docs_df(spark, SF))
             .select("id_a", "id_b").collect()]
    assert pairs, "fixture must produce near-dup pairs"
    want = _union_find(pairs)
    got = {r.doc_id: (r.rep, r.cluster_size)
           for r in q_dedup_clusters(spark, SF).collect()}
    assert set(got) == set(want)
    sizes = {}
    for n, r in want.items():
        sizes[r] = sizes.get(r, 0) + 1
    for n, (rep, size) in got.items():
        assert rep == want[n], n
        assert size == sizes[want[n]], n
    # representative is a member of its own cluster with itself as rep
    for n, (rep, _) in got.items():
        assert got[rep][0] == rep
