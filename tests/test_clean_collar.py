"""clean-collar flood-fill semantics (nearblack_lib_floodfill.cpp):
border-connectivity is what distinguishes it from scanline nearblack."""

import duckdb

from gdal_spark.queries import CC_NEAR, CC_VAL_SQL, CC_W, o_clean_collar


def test_lake_kept_pocket_cleaned():
    con = duckdb.connect()
    rows = {r[0]: r for r in con.execute(o_clean_collar()).fetchall()}
    total_mask = con.execute(
        f"SELECT COUNT(*) FROM (SELECT {CC_VAL_SQL} AS val FROM "
        f"(SELECT UNNEST(RANGE(0, {CC_W})) AS px) xs CROSS JOIN "
        f"(SELECT UNNEST(RANGE(0, {CC_W})) AS py) ys) t "
        f"WHERE val <= {CC_NEAR}").fetchone()[0]
    cleaned = sum(r[1] for r in rows.values())
    # exactly the enclosed 5x7 lake survives
    assert total_mask - cleaned == 35
    # the channel row reaches the interior pocket (far beyond the
    # collar width, impossible for prefix-scan nearblack)
    assert rows[20][3] >= 42 and rows[20][1] > 40
