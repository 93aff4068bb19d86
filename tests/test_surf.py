"""SURF correlator invariants (alg/gdal_simplesurf.cpp + gdalmatching).

The gated query proves Spark/DuckDB parity; these tests prove the
documented deviation is harmless ON THE FIXTURE: a faithful Python
transliteration of the reference's sequential matching loop
(MatchFeaturePoints gdal_simplesurf.cpp:370-520 — alreadyMatched
greedy suppression, the scan-order second-distance fold, normalize +
threshold) produces the SAME matched pair set as the order-free
relational formulation, and the pairs recover the known translation.
"""

import math

import duckdb
import pytest

from gdal_spark.operators import surf as S


@pytest.fixture(scope="module")
def stages():
    con = duckdb.connect()
    sql = S.surf_match_sql("duck")
    head = sql.split("dist AS")[0].rstrip().rstrip(",")
    out = {}
    for t in ("a", "b"):
        kp = con.execute(
            head + f"\nSELECT y, x, m, sgn FROM kp_{t} ORDER BY m, y, x"
        ).fetchall()
        desc = {}
        for y, x, m, sgn, qr, qc, dx, dy, adx, ady in con.execute(
                head + f"\nSELECT y, x, m, sgn, qr, qc, dx, dy, adx, ady "
                       f"FROM desc_{t}").fetchall():
            desc.setdefault((y, x, m), {})[(qr, qc)] = (dx, dy, adx, ady)
        out[t] = (kp, desc)
    out["final"] = con.execute(sql).fetchall()
    return out


def _dist2(da, db):
    s = 0
    for q in da:
        for u, v in zip(da[q], db[q]):
            s += (u - v) * (u - v)
    return s


def _reference_loop(kp1, desc1, kp2, desc2, threshold=0.6):
    """Transliteration of MatchFeaturePoints (incl. its quirks):
    scan order = feature-point insertion order (interval, row, col);
    alreadyMatched suppression; bestDist_2 initialized to the FIRST
    scanned distance and only lowered by values strictly between the
    running best and itself; ratio < 0.8; normalize by max; <= th."""
    already = [False] * len(kp2)
    pairs = []
    for i, k1 in enumerate(kp1):
        best, best_idx, best2 = -1.0, -1, -1.0
        for j, k2 in enumerate(kp2):
            if already[j] or k1[3] != k2[3]:
                continue
            d = math.sqrt(_dist2(desc1[k1[:3]], desc2[k2[:3]]))
            if best == -1.0:
                best, best_idx = d, j
            elif d < best:
                best, best_idx = d, j
            if best2 < 0:
                best2 = d
            elif d > best and d < best2:
                best2 = d
        if best2 > 0 and best >= 0 and best / best2 < 0.8:
            pairs.append([i, best_idx, best])
            already[best_idx] = True
    mx = max((p[2] for p in pairs), default=0.0)
    if mx != 0.0:
        for p in pairs:
            p[2] /= mx
    return [(kp1[i][:3], kp2[j][:3]) for i, j, d in pairs
            if d <= threshold]


def test_reference_loop_matches_relational(stages):
    kpa, desca = stages["a"]
    kpb, descb = stages["b"]
    # reference picks p_1 = the smaller collection; on equal sizes the
    # swap branch runs (minLength == len_2), probing from B
    if len(kpb) <= len(kpa):
        ref = {(a, b) for b, a in _reference_loop(kpb, descb, kpa, desca)}
    else:
        ref = {(a, b) for a, b in _reference_loop(kpa, desca, kpb, descb)}
    got = {((ay, ax, am), (by, bx, bm))
           for ay, ax, am, sgn, by, bx, bm, d2 in stages["final"]}
    assert got == ref
    assert len(got) >= 3                        # non-vacuous


def test_matches_recover_translation(stages):
    for ay, ax, am, sgn, by, bx, bm, d2 in stages["final"]:
        assert (by - ay, bx - ax) == (S.SHIFT_Y, S.SHIFT_X)
        assert am == bm
    d2s = [r[7] for r in stages["final"]]
    assert d2s.count(0) == 2                    # exact-window twins
    assert any(d > 0 for d in d2s)              # the modified bump


def test_fixture_has_no_distance_ties(stages):
    kpa, desca = stages["a"]
    kpb, descb = stages["b"]
    for k1 in kpa:
        ds = [_dist2(desca[k1[:3]], descb[k2[:3]])
              for k2 in kpb if k2[3] == k1[3]]
        assert len(ds) == len(set(ds))


def test_unmatched_features_pruned(stages):
    kpa, _ = stages["a"]
    matched_a = {(r[0], r[1], r[2]) for r in stages["final"]}
    # the A-only bump's keypoint exists but never reaches the output
    a_only = [k[:3] for k in kpa if k[0] > 90]
    assert a_only and all(k not in matched_a for k in a_only)
