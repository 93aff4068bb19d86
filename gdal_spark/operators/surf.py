"""SURF-style feature detection + image matching (the GDAL
"correlator": alg/gdal_simplesurf.cpp GDALSimpleSURF +
alg/gdal_octave.cpp GDALIntegralImage/GDALOctaveLayer/GDALOctaveMap +
alg/gdalmatching.cpp GDALComputeMatchingPoints).

Reference semantics replicated exactly:
- integral image (gdal_octave.cpp:33-68) and GetRectangleSum with its
  border clamps and the max(sum, 0) floor (:82-119);
- Fast-Hessian octave layers (ComputeLayer :146-207): box-filter
  dxx/dyy/dxy over the integral image, det = dxx*dyy - 0.9^2*dxy^2
  after 1/filterSize^2 normalization, trace sign;
- 26-neighbor strict extremum with the top-layer border guard and
  threshold (PointIsExtremum :247-279; ExtractFeaturePoints
  gdal_simplesurf.cpp:237-274);
- 64-component descriptor: 4x4 quadrants x 5x5 sub-quadrants of Haar
  wavelets (HaarWavelet_X/Y :121-131; SetDescriptor
  gdal_simplesurf.cpp:304-361) -> per-quadrant (dx, dy, |dx|, |dy|);
- matching: same-sign nearest + second-nearest Euclidean ratio test
  (< 0.8), then normalize by the max distance and keep pairs <=
  MATCH_TH (MatchFeaturePoints gdal_simplesurf.cpp:370-520).

DOCUMENTED DEVIATIONS (sequential artifacts of the reference loop,
replaced by their order-free specification):
- the reference's `alreadyMatched` greedy suppression and its
  scan-order-dependent second-distance fold are replaced by the exact
  nearest / strict-second-nearest rule (Lowe's ratio test, which the
  loop approximates); tests/test_surf.py runs a faithful Python
  transliteration of the reference loop on the fixture and asserts
  the matched PAIR SET is identical there;
- ties for nearest are broken deterministically by (by, bx, interval)
  (the fixture has none — asserted in pytest).

Distributed shape (the 100-TB story): the integral image is two
cascaded window prefix sums (one shuffle each — at tile scale this is
the standard two-pass distributed prefix sum, cf. sequence_pack);
every box-filter/Haar evaluation is a corner-offset EXPLODE + ONE
equi-join against the integral table (the point_sample tap idiom —
never a per-pixel Python loop); extremum suppression is a 3x3x3
scatter-pivot groupBy; descriptors explode 3200 arithmetic corner
rows per keypoint (keypoints are sparse); matching joins the two
sparse descriptor tables. Every value is an exact integer except the
reference's normalized determinant (bit-identical double math both
engines), so the cross-engine hash gate is drift-free.
"""

from __future__ import annotations

W = 128                      # image side (fixture)
TH = 0.001                   # Hessian threshold (gdalmatching default range)
MATCH_NUM, MATCH_DEN = 6, 10  # normalized-distance threshold 0.6
SHIFT_Y, SHIFT_X = 5, 7      # common bumps in B = A's translated by this
# pyramid bumps (cy, cx, chebyshev size, amplitude) — laid out so the
# +-24 px descriptor windows of the COMMON bumps are pure translations
# (identical content in A and B => exact-zero match distances) and
# never overlap the single-image bumps.
# The third common bump's amplitude is 40 in A but 41 in B: its match
# survives the ratio test with a small nonzero distance, becomes the
# max distance, and is then dropped by the reference's
# normalize-to-max + threshold stage (the worst pair always prunes
# when max > 0) — exercising that stage non-vacuously.
BUMPS_COMMON = [(30, 30, 4, 30), (34, 64, 5, 50)]
BUMP_MOD_A = (64, 40, 6, 40)
BUMP_MOD_B = (64 + SHIFT_Y, 40 + SHIFT_X, 6, 41)
BUMP_A_ONLY = (96, 96, 4, 60)       # no counterpart in B: ratio-prune
# second A-only bump, FIRST in (interval, row, col) scan order: the
# reference loop initializes its second-distance to the FIRST scanned
# candidate, so a probe whose true twin scans first is spuriously
# rejected (ratio 0/0); this decoy guarantees every probe sees a junk
# candidate before its twin, making the sequential loop's output
# coincide with the order-free specification (tests/test_surf.py)
BUMP_A_ONLY2 = (20, 100, 5, 65)
BUMP_B_ONLY = (20, 108, 5, 35)       # distractor, second-nearest fodder
BUMPS_A = BUMPS_COMMON + [BUMP_MOD_A, BUMP_A_ONLY, BUMP_A_ONLY2]
BUMPS_B = ([(cy + SHIFT_Y, cx + SHIFT_X, s, amp)
            for cy, cx, s, amp in BUMPS_COMMON]
           + [BUMP_MOD_B, BUMP_B_ONLY])
INTERVALS = (1, 2, 3, 4)     # octave 1: filterSize 6i+1
MIDS = (2, 3)                # extremum mid layers (INTERVALS - 2 of them)


def _dlit(v: float) -> str:
    from gdal_spark.sqlexpr import dlit
    return dlit(v)


def _rng(n: int, alias: str, dialect: str) -> str:
    if dialect == "duck":
        return f"(SELECT UNNEST(RANGE(0, {n})) AS {alias})"
    return f"(SELECT explode(sequence(0, {n - 1})) AS {alias})"


def _values(rows, cols: list[str], alias: str, dialect: str) -> str:
    body = ", ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
    if dialect == "duck":
        return f"(VALUES {body}) AS {alias}({', '.join(cols)})"
    return f"(VALUES {body}) AS {alias}({', '.join(cols)})"


def _lparams(i: int) -> dict:
    fs = 6 * i + 1
    lobe = fs // 3
    return {"fs": fs, "rad": (fs - 1) // 2, "lobe": lobe,
            "long": 2 * lobe - 1, "norm": fs * fs}


def _hessian_rects() -> list[tuple]:
    """(l, tag, ridx, coef, dro, dco, w, h, rad) — tag 0=dxx 1=dyy
    2=dxy; offsets per gdal_octave.cpp:184-198 verbatim."""
    rows = []
    for i in INTERVALS:
        p = _lparams(i)
        lobe, rad, fs, lng = p["lobe"], p["rad"], p["fs"], p["long"]
        rows += [
            (i, 0, 0, 1, -lobe + 1, -rad, fs, lng, rad),
            (i, 0, 1, -3, -lobe + 1, -((lobe - 1) // 2), lobe, lng, rad),
            (i, 1, 0, 1, -rad, -lobe - 1, lng, fs, rad),
            (i, 1, 1, -3, -lobe + 1, -lobe + 1, lng, lobe, rad),
            (i, 2, 0, 1, -lobe, -lobe, lobe, lobe, rad),
            (i, 2, 1, 1, 1, 1, lobe, lobe, rad),
            (i, 2, 2, -1, -lobe, 1, lobe, lobe, rad),
            (i, 2, 3, -1, 1, -lobe, lobe, lobe, rad),
        ]
    return rows


# corner decomposition of GetRectangleSum(row, col, w, h):
# value = I(lt_r,lt_c) + I(rb_r,rb_c) - I(lt_r,rb_c) - I(rb_r,lt_c)
# with lt = row-1 (or -1 when row > W), rb = min(row+h-1, W-1)
CORNERS = [(0, 0, 1), (1, 1, 1), (0, 1, -1), (1, 0, -1)]  # (c0, c1, sgn)

# descriptor Haar rects for scale 2 (haarFilterSize 4):
# (dir, ridx, drr, dcc, w, h, rcoef); dir 0 = X, 1 = Y
DESC_RECTS = [(0, 0, 0, 2, 2, 4, 1), (0, 1, 0, 0, 2, 4, -1),
              (1, 0, 2, 0, 4, 2, 1), (1, 1, 0, 0, 4, 2, -1)]


def _img_cte(name: str, bumps: list[tuple]) -> str:
    terms = " + ".join(
        f"GREATEST({s} - GREATEST(ABS(px - {cx}), "
        f"ABS(py - {cy})), 0) * {amp}"
        for cy, cx, s, amp in bumps)
    return (f"{name} AS (SELECT py, px, {terms} AS val "
            f"FROM __XS__ xs CROSS JOIN __YS__ ys)")


def _corner_coord(base: str, off: str, ext: str, c_idx: str) -> str:
    """lt/rb coordinate per GetRectangleSum (gdal_octave.cpp:88-99),
    including the quirky `row <= W` guard, as shared SQL text."""
    row = f"(({base}) + ({off}))"
    lt = f"(CASE WHEN {row} <= {W} THEN {row} - 1 ELSE -1 END)"
    rb = (f"(CASE WHEN {row} + ({ext}) - 1 < {W} "
          f"THEN {row} + ({ext}) - 1 ELSE {W - 1} END)")
    return f"(CASE WHEN {c_idx} = 0 THEN {lt} ELSE {rb} END)"


def _per_image(tag: str, bumps: list[tuple], dialect: str) -> str:
    """CTE chain img/ii/hrect/hdet/kp/desc for one image."""
    mat = "MATERIALIZED " if dialect == "duck" else ""
    d09 = _dlit(0.9)
    xs = _rng(W, "px", dialect)
    ys = _rng(W, "py", dialect)
    img = _img_cte(f"img_{tag}", bumps).replace("__XS__", xs)\
                                        .replace("__YS__", ys)
    ii = (f"ii_{tag} AS {mat}(SELECT py, px, CAST(SUM(rv) OVER "
          f"(PARTITION BY px ORDER BY py) AS BIGINT) AS iv "
          f"FROM (SELECT py, px, CAST(SUM(val) OVER "
          f"(PARTITION BY py ORDER BY px) AS BIGINT) AS rv "
          f"FROM img_{tag}) t)")
    cr = _corner_coord("r.r", "hr.dro", "hr.h", "co.c0")
    cc = _corner_coord("c.c", "hr.dco", "hr.w", "co.c1")
    hrect = (
        f"hrect_{tag} AS {mat}(SELECT g.l, g.r, g.c, g.tag, g.ridx, g.coef, "
        f"GREATEST(CAST(SUM(g.sgn * COALESCE(ii.iv, 0)) AS BIGINT), 0) "
        f"AS rsum FROM (SELECT r.r, c.c, hr.l, hr.tag, hr.ridx, hr.coef, "
        f"co.sgn, {cr} AS cr, {cc} AS cc "
        f"FROM {_rng(W, 'r', dialect)} r CROSS JOIN {_rng(W, 'c', dialect)} c "
        f"CROSS JOIN {_values(_hessian_rects(), ['l', 'tag', 'ridx', 'coef', 'dro', 'dco', 'w', 'h', 'rad'], 'hr', dialect)} "
        f"CROSS JOIN {_values(CORNERS, ['c0', 'c1', 'sgn'], 'co', dialect)} "
        f"WHERE r.r >= hr.rad AND r.r <= {W} - hr.rad "
        f"AND c.c >= hr.rad AND c.c <= {W} - hr.rad) g "
        f"LEFT JOIN ii_{tag} ii ON ii.py = g.cr AND ii.px = g.cc "
        f"GROUP BY g.l, g.r, g.c, g.tag, g.ridx, g.coef)")
    norm_case = ("(CASE " + " ".join(
        f"WHEN l = {i} THEN {_dlit(float(_lparams(i)['norm']))}"
        for i in INTERVALS) + " END)")
    hdet = (
        f"hdet_{tag} AS {mat}(SELECT l, r, c, "
        f"((CAST(dxx AS DOUBLE) / nrm) * (CAST(dyy AS DOUBLE) / nrm)) - "
        f"((({d09} * {d09}) * (CAST(dxy AS DOUBLE) / nrm)) * "
        f"(CAST(dxy AS DOUBLE) / nrm)) AS det, "
        f"(CASE WHEN dxx + dyy >= 0 THEN 1 ELSE -1 END) AS sgn "
        f"FROM (SELECT l, r, c, {norm_case} AS nrm, "
        f"CAST(SUM(CASE WHEN tag = 0 THEN coef * rsum ELSE 0 END) AS BIGINT) AS dxx, "
        f"CAST(SUM(CASE WHEN tag = 1 THEN coef * rsum ELSE 0 END) AS BIGINT) AS dyy, "
        f"CAST(SUM(CASE WHEN tag = 2 THEN coef * rsum ELSE 0 END) AS BIGINT) AS dxy "
        f"FROM hrect_{tag} GROUP BY l, r, c) t)")
    mids = _values([(m, 3 * (m + 1)) for m in MIDS], ["m", "tr"], "md",
                   dialect)
    nbs = _values([(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)],
                  ["di", "dj"], "nb", dialect)
    kp = (
        f"kp_{tag} AS {mat}(SELECT cur.r AS y, cur.c AS x, md.m, cur.sgn "
        f"FROM hdet_{tag} cur JOIN {mids} ON cur.l = md.m "
        f"CROSS JOIN {nbs} "
        f"JOIN hdet_{tag} nbd ON nbd.l BETWEEN md.m - 1 AND md.m + 1 "
        f"AND nbd.r = cur.r + nb.di AND nbd.c = cur.c + nb.dj "
        f"WHERE cur.det >= {_dlit(TH)} "
        f"AND cur.r > md.tr AND cur.c > md.tr "
        f"AND cur.r + md.tr < {W} AND cur.c + md.tr < {W} "
        f"GROUP BY cur.r, cur.c, md.m, cur.sgn, cur.det "
        f"HAVING cur.det > MAX(CASE WHEN nbd.l = md.m + 1 THEN nbd.det END) "
        f"AND cur.det > MAX(CASE WHEN nbd.l = md.m - 1 THEN nbd.det END) "
        f"AND cur.det > MAX(CASE WHEN nbd.l = md.m AND NOT (nb.di = 0 "
        f"AND nb.dj = 0) THEN nbd.det END))")
    # descriptor: cur_r = y + 10*qr + 2*sr - 21 (+ rect offset)
    dcr = _corner_coord("k.y + 10 * q.qr + 2 * s.sr - 21", "dr.drr",
                        "dr.h", "co.c0")
    dcc = _corner_coord("k.x + 10 * q.qc + 2 * s.sc - 21", "dr.dcc",
                        "dr.w", "co.c1")
    desc = (
        f"desc_{tag} AS {mat}(SELECT y, x, m, sgn, qr, qc, "
        f"CAST(SUM(CASE WHEN dir = 0 THEN hval ELSE 0 END) AS BIGINT) AS dx, "
        f"CAST(SUM(CASE WHEN dir = 1 THEN hval ELSE 0 END) AS BIGINT) AS dy, "
        f"CAST(SUM(CASE WHEN dir = 0 THEN ABS(hval) ELSE 0 END) AS BIGINT) AS adx, "
        f"CAST(SUM(CASE WHEN dir = 1 THEN ABS(hval) ELSE 0 END) AS BIGINT) AS ady "
        f"FROM (SELECT y, x, m, sgn, qr, qc, sr, sc, dir, "
        f"CAST(SUM(rcoef * rsum) AS BIGINT) AS hval "
        f"FROM (SELECT g.y, g.x, g.m, g.sgn, g.qr, g.qc, g.sr, g.sc, "
        f"g.dir, g.ridx, g.rcoef, "
        f"GREATEST(CAST(SUM(g.sgn2 * COALESCE(ii.iv, 0)) AS BIGINT), 0) "
        f"AS rsum "
        f"FROM (SELECT k.y, k.x, k.m, k.sgn, q.qr, q.qc, s.sr, s.sc, "
        f"dr.dir, dr.ridx, dr.rcoef, co.sgn AS sgn2, "
        f"{dcr} AS cr, {dcc} AS cc "
        f"FROM kp_{tag} k "
        f"CROSS JOIN (SELECT a.qr, b.qc FROM {_rng(4, 'qr', dialect)} a "
        f"CROSS JOIN {_rng(4, 'qc', dialect)} b) q "
        f"CROSS JOIN (SELECT a.sr, b.sc FROM {_rng(5, 'sr', dialect)} a "
        f"CROSS JOIN {_rng(5, 'sc', dialect)} b) s "
        f"CROSS JOIN {_values(DESC_RECTS, ['dir', 'ridx', 'drr', 'dcc', 'w', 'h', 'rcoef'], 'dr', dialect)} "
        f"CROSS JOIN {_values(CORNERS, ['c0', 'c1', 'sgn'], 'co', dialect)}"
        f") g LEFT JOIN ii_{tag} ii ON ii.py = g.cr AND ii.px = g.cc "
        f"GROUP BY g.y, g.x, g.m, g.sgn, g.qr, g.qc, g.sr, g.sc, g.dir, "
        f"g.ridx, g.rcoef) rects "
        f"GROUP BY y, x, m, sgn, qr, qc, sr, sc, dir) haars "
        f"GROUP BY y, x, m, sgn, qr, qc)")
    return ",\n".join([img, ii, hrect, hdet, kp, desc])


def surf_match_sql(dialect: str) -> str:
    """Full two-image detect + match pipeline as one SQL text
    (dialect: 'duck' | 'spark'). Output: matched pairs
    (ay, ax, am, sgn, by, bx, bm, dist2)."""
    a = _per_image("a", BUMPS_A, dialect)
    b = _per_image("b", BUMPS_B, dialect)
    thr2 = MATCH_NUM * MATCH_NUM          # normalized-dist² threshold
    den2 = MATCH_DEN * MATCH_DEN
    return f"""WITH
{a},
{b},
dist AS (
  SELECT da.y AS ay, da.x AS ax, da.m AS am, da.sgn AS sgn,
         db.y AS by, db.x AS bx, db.m AS bm,
         CAST(SUM((da.dx - db.dx) * (da.dx - db.dx)
             + (da.dy - db.dy) * (da.dy - db.dy)
             + (da.adx - db.adx) * (da.adx - db.adx)
             + (da.ady - db.ady) * (da.ady - db.ady)) AS BIGINT) AS d2
  FROM desc_a da
  JOIN desc_b db ON da.qr = db.qr AND da.qc = db.qc AND da.sgn = db.sgn
  GROUP BY da.y, da.x, da.m, da.sgn, db.y, db.x, db.m),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY ay, ax, am
                            ORDER BY d2, by, bx, bm) AS rk,
         MIN(d2) OVER (PARTITION BY ay, ax, am) AS best
  FROM dist),
second AS (
  SELECT *, MIN(CASE WHEN d2 > best THEN d2 END)
              OVER (PARTITION BY ay, ax, am) AS d2_2
  FROM ranked),
pairs AS (
  SELECT ay, ax, am, sgn, by, bx, bm, d2
  FROM second
  WHERE rk = 1 AND d2_2 IS NOT NULL AND 100 * d2 < 64 * d2_2),
norm AS (SELECT *, MAX(d2) OVER () AS maxd2 FROM pairs)
SELECT ay, ax, am, sgn, by, bx, bm, d2
FROM norm
WHERE maxd2 = 0 OR {den2} * d2 <= {thr2} * maxd2
ORDER BY ay, ax, am"""
