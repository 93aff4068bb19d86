"""Invariant tests for the round-3 closing-batch operators — properties
the cross-engine gate can't see (it proves Spark == DuckDB; these prove
both match the published semantics)."""

import duckdb

from conftest import SF_SMOKE


def test_geohash_matches_canonical_example():
    """(57.64911, 10.40744) -> 'u4pruy' — the canonical geohash
    example; proves the shared bit-interleave IS Niemeyer's scheme,
    not merely self-consistent."""
    from gdal_spark.queries import _gh_expr
    xi, yi, g, chars = _gh_expr("lat", "lon")
    con = duckdb.connect()
    q = f"""WITH p AS (SELECT 57.64911::DOUBLE AS lat,
                              10.40744::DOUBLE AS lon),
    a AS (SELECT {xi} AS xi, {yi} AS yi FROM p),
    b AS (SELECT {g} AS g FROM a)
    SELECT {chars} FROM b"""
    assert con.execute(q).fetchone()[0] == "u4pruy"


def test_warp_approx_leaves_partition_every_column(spark):
    """The subdivision leaves must cover every output pixel exactly
    once (no pixel lost or double-resolved by the containment join)."""
    from gdal_spark.queries import WA_H, WA_W, q_warp_approx
    df = q_warp_approx(spark, SF_SMOKE).toPandas()
    assert len(df) == WA_W * WA_H
    assert not df.duplicated(subset=["px", "py"]).any()
    assert set(df.approx.unique()) <= {0, 1}


def test_redirect_pointer_doubling_equals_naive_walk(spark):
    """Pointer doubling must resolve exactly what the one-hop-at-a-time
    walk resolves (chain lengths 0..7 in the fixture)."""
    from gdal_spark.queries import q_redirect_resolve
    df = q_redirect_resolve(spark, SF_SMOKE).toPandas()
    for _, r in df.sample(n=min(60, len(df)), random_state=7).iterrows():
        node, hops = int(r.doc_id), 0
        while node % 8 != 0:
            node -= 1
            hops += 1
        assert node == int(r.final_id) and hops == int(r.hops), r.doc_id


def test_range_coalesce_islands_are_gap_separated(spark):
    """Adjacent islands in a file must be separated by more than the
    gap; ranges inside an island must lie within [start, end]."""
    from gdal_spark.queries import RC_GAP, q_range_coalesce
    df = (q_range_coalesce(spark, SF_SMOKE).toPandas()
          .sort_values(["f", "island"]))
    for f, grp in df.groupby("f"):
        prev_end = None
        for _, r in grp.iterrows():
            assert r.start < r.end
            if prev_end is not None:
                assert r.start > prev_end + RC_GAP
            prev_end = r.end


def test_dbscan_roles_consistent(spark):
    """Cluster labels: every core has a cluster; borders carry a core's
    cluster id; noise has -1; all three roles occur in the fixture."""
    from gdal_spark.queries import q_dbscan
    df = q_dbscan(spark, SF_SMOKE).toPandas()
    assert set(df.role.unique()) == {0, 1, 2}
    assert (df.loc[df.role == 0, "cluster"] == -1).all()
    core_clusters = set(df.loc[df.role == 2, "cluster"])
    assert (df.loc[df.role == 1, "cluster"].isin(core_clusters)).all()
    # min-label invariant: every cluster label IS a member core id
    for c in core_clusters:
        assert ((df.cluster == c) & (df.role == 2) & (df.doc_id == c)).any()
