"""The correctness gate, locally: every registered query compared
against its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01).
"""

import pytest

from oracle_harness import compare_query

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(spark, SF, name)
    assert ok, msg


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"zone_fid", "eas_id", "n_pages"} <= cols


def test_every_query_has_oracle_or_reason(spark):
    qs, os = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(os)
    # non-SQL-expressible ops may be rows-only; keep the list explicit
    # (s2_cells / h3_cells: cell-curve math has no SQL oracle; covered
    # by tests/test_s2.py and tests/test_h3.py property tests instead;
    # concave_hull: data-dependent chi-shape erosion order — pinned
    # against the convex hull by tests/test_concave_hull.py)
    assert missing <= {"s2_cells", "h3_cells", "concave_hull", "dither"}, \
        f"queries without oracle: {missing}"
