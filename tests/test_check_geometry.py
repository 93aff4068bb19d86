"""check_geometry: zone rings validate; each crafted invalidity is
detected with the right reason and priority."""

SF = "/root/testdata/sf0.001"


def test_reasons(spark):
    from gdal_spark.queries import q_check_geometry
    rows = {r.gid: (r.valid, r.reason)
            for r in q_check_geometry(spark, SF).collect()}
    assert len(rows) == 16
    for gid in range(11):
        assert rows[gid] == (True, "valid"), gid
    assert rows[100] == (False, "self-intersection")   # bowtie crossing
    assert rows[101] == (False, "self-intersection")   # boundary touch
    assert rows[102] == (False, "repeated point")
    assert rows[103] == (False, "ring not closed")
    assert rows[104] == (False, "too few points")


def test_shared_text_spark_duck_agree(spark):
    import duckdb

    from gdal_spark.queries import o_check_geometry, q_check_geometry
    got = sorted((r.gid, r.reason, r.valid)
                 for r in q_check_geometry(spark, SF).collect())
    want = sorted(map(tuple, duckdb.sql(o_check_geometry()).fetchall()))
    assert got == want
