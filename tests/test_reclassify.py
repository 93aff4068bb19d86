"""Reclassify mapping parser vs vrtreclassifier.cpp semantics:
bracket parsing, nextafter open-endpoint nudging, inf bounds, overlap
rejection, NO_DATA / DEFAULT / PASS_THROUGH, and query parity."""

import math

import pytest

from gdal_spark.operators.reclassify import (MappingError, _parse_interval,
                                             parse_mapping,
                                             reclassify_case_sql)

SF = "/root/testdata/sf0.001"


def test_interval_parsing_nudges_open_endpoints():
    assert _parse_interval("5") == (5.0, 5.0)
    assert _parse_interval("[2,4]") == (2.0, 4.0)
    lo, hi = _parse_interval("(2, 4)")
    assert lo == math.nextafter(2.0, math.inf)
    assert hi == math.nextafter(4.0, -math.inf)
    lo, hi = _parse_interval("[-inf, 7)")
    assert lo == -math.inf and hi == math.nextafter(7.0, -math.inf)
    assert _parse_interval("(3, inf]")[1] == math.inf


def test_overlap_rejected():
    with pytest.raises(MappingError, match="overlaps"):
        parse_mapping("[0,10]=1; [5,20]=2")
    # adjacent open/closed boundaries do NOT overlap
    parse_mapping("[0,10]=1; (10,20]=2")


def test_nodata_requires_value():
    with pytest.raises(MappingError):
        parse_mapping("NO_DATA=5")
    m = parse_mapping("NO_DATA=5; DEFAULT=0", nodata=-9999.0)
    assert m["nodata_dest"] == 5.0
    assert m["default"] == ("value", 0.0)


def test_case_semantics_duckdb():
    import duckdb
    m = parse_mapping("[0,20)=10; 90=99; [20,45]=20; (45,80]=30; "
                      "DEFAULT=PASS_THROUGH")
    case = reclassify_case_sql(m, "v")
    rows = duckdb.sql(
        f"SELECT v, {case} AS c FROM (SELECT UNNEST(CAST(["
        "0.0, 19.999, 20.0, 45.0, 45.0000001, 80.0, 90.0, 81.5]"
        " AS DOUBLE[])) AS v)"
    ).fetchall()
    got = dict(rows)
    assert got[0.0] == 10 and got[19.999] == 10
    assert got[20.0] == 20 and got[45.0] == 20
    assert got[45.0000001] == 30 and got[80.0] == 30
    assert got[90.0] == 99
    assert got[81.5] == 81.5  # pass-through


def test_query_matches_oracle(spark):
    import duckdb

    from gdal_spark.queries import o_reclassify, q_reclassify
    got = sorted((r.py, r.px, r["class"])
                 for r in q_reclassify(spark, SF).collect())
    want = sorted(map(tuple, duckdb.sql(o_reclassify()).fetchall()))
    assert got == want
    classes = {c for _, _, c in got}
    assert {10.0, 20.0, 30.0, 99.0, 255.0}.issubset(classes)
