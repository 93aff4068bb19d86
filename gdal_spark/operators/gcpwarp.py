"""GCP-based georeferencing transforms: polynomial and thin-plate
spline.

Reference: alg/gdal_crs.cpp (GDALCreateGCPTransformer — order 1/2/3
least-squares polynomial on control points; term order table
:885-922, normal equations calcls :832-870, coordinates centered at
the GCP means :687) and alg/thinplatespline.cpp (VizGeorefSpline2D —
basis U = d2 * log(d2) :175-182, (n+3)-equation system with affine
rows :551-583, evaluation coef[0] + coef[1]*dx + coef[2]*dy + sum
:get_point VIZ_GEOREF_SPLINE_FULL).

Distributed shape: the FIT is a tiny dense solve over the GCP list —
GCP counts are small by construction (the reference also holds them
all in memory), so the solve is driver-side pure Python with a FIXED
summation order (same trained-literal contract as the IVF codebook:
deterministic, bounded, reproducible in the oracle). The APPLY is the
100-TB side: coefficients become literals in a pure column expression
evaluated per input row — no shuffle, no Python, whole-stage codegen.
Were GCPs ever huge, the normal-equation entries are plain map-side
aggregates; only the k x k solve is inherently driver-sized."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

# gdal_crs.cpp term order: exponent pairs (i_e, j_n) for terms 1..10
POLY_TERMS = {
    1: [(0, 0), (1, 0), (0, 1)],
    2: [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)],
    3: [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2),
        (3, 0), (2, 1), (1, 2), (0, 3)],
}


def _gauss_solve(a: list[list[float]], bs: list[list[float]]):
    """Gaussian elimination with partial pivoting over copies; solves
    a x = b for each b in bs. Pure Python, deterministic."""
    n = len(a)
    m = [row[:] + [b[i] for b in bs] for i, row in enumerate(a)]
    w = n + len(bs)
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        if abs(m[piv][col]) == 0.0:
            raise ValueError("singular system")
        m[col], m[piv] = m[piv], m[col]
        for r in range(col + 1, n):
            f = m[r][col] / m[col][col]
            for c in range(col, w):
                m[r][c] -= f * m[col][c]
    outs = []
    for k in range(len(bs)):
        x = [0.0] * n
        for r in range(n - 1, -1, -1):
            s = m[r][n + k]
            for c in range(r + 1, n):
                s -= m[r][c] * x[c]
            x[r] = s / m[r][r]
        outs.append(x)
    return outs


def _terms(e: float, n: float, order: int) -> list[float]:
    return [e ** i * n ** j for i, j in POLY_TERMS[order]]


def fit_polynomial(gcps: list[tuple], order: int) -> dict:
    """gcps = [(px, py, E, N)] -> {'xm','ym','ce','cn'}: least-squares
    coefficients in gdal_crs term order, source coords centered at
    their means (calccoef gdal_crs.cpp:720-779)."""
    npts = len(gcps)
    xm = sum(g[0] for g in gcps) / npts
    ym = sum(g[1] for g in gcps) / npts
    nt = len(POLY_TERMS[order])
    mat = [[0.0] * nt for _ in range(nt)]
    be = [0.0] * nt
    bn = [0.0] * nt
    for px, py, ge, gn in gcps:
        t = _terms(px - xm, py - ym, order)
        for i in range(nt):
            for j in range(nt):
                mat[i][j] += t[i] * t[j]
            be[i] += ge * t[i]
            bn[i] += gn * t[i]
    ce, cn = _gauss_solve(mat, [be, bn])
    return {"xm": xm, "ym": ym, "ce": ce, "cn": cn}


def poly_apply_cols(fit: dict, order: int, xcol, ycol):
    """Fixed-order polynomial evaluation as Spark Columns (E, N)."""
    e = xcol - F.lit(fit["xm"])
    n = ycol - F.lit(fit["ym"])

    def tcol(i, j):
        c = F.lit(1.0)
        for _ in range(i):
            c = c * e
        for _ in range(j):
            c = c * n
        return c

    def total(coefs):
        terms = [F.lit(c) * tcol(i, j)
                 for c, (i, j) in zip(coefs, POLY_TERMS[order])]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    return total(fit["ce"]), total(fit["cn"])


def poly_apply_sql(fit: dict, order: int, xexpr: str, yexpr: str, dlit):
    """The identical evaluation as SQL text (DuckDB oracle twin)."""
    e = f"(({xexpr}) - {dlit(fit['xm'])})"
    n = f"(({yexpr}) - {dlit(fit['ym'])})"

    def tsql(i, j):
        s = "1.0"
        for _ in range(i):
            s = f"({s} * {e})"
        for _ in range(j):
            s = f"({s} * {n})"
        return s

    def total(coefs):
        parts = [f"({dlit(c)} * {tsql(i, j)})"
                 for c, (i, j) in zip(coefs, POLY_TERMS[order])]
        out = parts[0]
        for p in parts[1:]:
            out = f"({out} + {p})"
        return out

    return total(fit["ce"]), total(fit["cn"])


def fit_tps(gcps: list[tuple]) -> dict:
    """gcps = [(px, py, E, N)] -> thin-plate-spline coefficients
    (thinplatespline.cpp solve :540-612): unknowns [a0, ax, ay,
    c_0..c_{n-1}] for each target var, source coords centered."""
    npts = len(gcps)
    xm = sum(g[0] for g in gcps) / npts
    ym = sum(g[1] for g in gcps) / npts
    xs = [g[0] - xm for g in gcps]
    ys = [g[1] - ym for g in gcps]
    neq = npts + 3
    a = [[0.0] * neq for _ in range(neq)]
    for c in range(npts):
        a[0][c + 3] = 1.0
        a[1][c + 3] = xs[c]
        a[2][c + 3] = ys[c]
        a[c + 3][0] = 1.0
        a[c + 3][1] = xs[c]
        a[c + 3][2] = ys[c]
    for r in range(npts):
        for c in range(npts):
            d2 = (xs[r] - xs[c]) ** 2 + (ys[r] - ys[c]) ** 2
            a[r + 3][c + 3] = d2 * math.log(d2) if d2 != 0.0 else 0.0
    be = [0.0] * 3 + [g[2] for g in gcps]
    bn = [0.0] * 3 + [g[3] for g in gcps]
    ce, cn = _gauss_solve(a, [be, bn])
    return {"xm": xm, "ym": ym, "xs": xs, "ys": ys, "ce": ce, "cn": cn}


def tps_apply_cols(fit: dict, xcol, ycol):
    """TPS evaluation as Spark Columns (E, N), fixed GCP order."""
    dx = xcol - F.lit(fit["xm"])
    dy = ycol - F.lit(fit["ym"])

    def total(coefs):
        out = F.lit(coefs[0]) + F.lit(coefs[1]) * dx + F.lit(coefs[2]) * dy
        for r, (xr, yr) in enumerate(zip(fit["xs"], fit["ys"])):
            d2 = (dx - F.lit(xr)) * (dx - F.lit(xr)) \
                + (dy - F.lit(yr)) * (dy - F.lit(yr))
            u = F.when(d2 != 0.0, d2 * F.log(d2)).otherwise(F.lit(0.0))
            out = out + F.lit(coefs[r + 3]) * u
        return out

    return total(fit["ce"]), total(fit["cn"])


def tps_apply_sql(fit: dict, xexpr: str, yexpr: str, dlit):
    dx = f"(({xexpr}) - {dlit(fit['xm'])})"
    dy = f"(({yexpr}) - {dlit(fit['ym'])})"

    def total(coefs):
        out = (f"(({dlit(coefs[0])} + ({dlit(coefs[1])} * {dx})) "
               f"+ ({dlit(coefs[2])} * {dy}))")
        for r, (xr, yr) in enumerate(zip(fit["xs"], fit["ys"])):
            d2 = (f"((({dx} - {dlit(xr)}) * ({dx} - {dlit(xr)})) "
                  f"+ (({dy} - {dlit(yr)}) * ({dy} - {dlit(yr)})))")
            u = f"(CASE WHEN {d2} <> 0.0 THEN {d2} * LN({d2}) ELSE 0.0 END)"
            out = f"({out} + ({dlit(coefs[r + 3])} * {u}))"
        return out

    return total(fit["ce"]), total(fit["cn"])


# --- Homography transform (alg/gdal_homography.cpp) -------------------

def _h_apply(h: list[float], x: float, y: float) -> tuple[float, float]:
    """GDALApplyHomography (gdal_homography.cpp:408-424): rational
    form wx/w, wy/w with w = h6 + x*h7 + y*h8."""
    w = h[6] + x * h[7] + y * h[8]
    return ((h[0] + x * h[1] + y * h[2]) / w,
            (h[3] + x * h[4] + y * h[5]) / w)


def _h_matrix(h: list[float]) -> list[list[float]]:
    # 9-coeff layout -> 3x3 acting on (x, y, 1): rows (x', y', w)
    return [[h[1], h[2], h[0]], [h[4], h[5], h[3]], [h[7], h[8], h[6]]]


def _h_coeffs(m: list[list[float]]) -> list[float]:
    return [m[0][2], m[0][0], m[0][1],
            m[1][2], m[1][0], m[1][1],
            m[2][2], m[2][0], m[2][1]]


def _h_compose(h1: list[float], h2: list[float]) -> list[float]:
    """GDALComposeHomographies: apply h1 then h2 (matrix m2 @ m1)."""
    m1, m2 = _h_matrix(h1), _h_matrix(h2)
    out = [[sum(m2[i][k] * m1[k][j] for k in range(3)) for j in range(3)]
           for i in range(3)]
    return _h_coeffs(out)


def _h_invert(h: list[float]) -> list[float]:
    m = _h_matrix(h)
    cof = [[m[(i + 1) % 3][(j + 1) % 3] * m[(i + 2) % 3][(j + 2) % 3]
            - m[(i + 1) % 3][(j + 2) % 3] * m[(i + 2) % 3][(j + 1) % 3]
            for j in range(3)] for i in range(3)]
    det = sum(m[0][j] * cof[0][j] for j in range(3))
    if det == 0.0:
        raise ValueError("singular homography")
    inv = [[cof[j][i] / det for j in range(3)] for i in range(3)]
    return _h_coeffs(inv)


def gcps_to_geotransform(gcps: list[tuple], approx_ok: bool = False,
                         pixel_threshold: float = 0.25) -> list[float]:
    """GDALGCPsToGeoTransform (gcore/gdal_misc.cpp:3189-3474): GCPs
    (pixel, line, geox, geoy) -> 6-coeff affine geotransform, with the
    reference's exact branch structure:

    - 2 GCPs: axis-aligned offset+scale special case (:3213-3237;
      fails on equal pixel or line coords);
    - 4 GCPs in TL-TR-BR-BL corner order of a non-rotated image:
      closed-form corners case (:3244-3271);
    - otherwise the range-normalized closed-form least squares with
      the reference's exact cofactor expressions (:3275-3421),
      composed with the normalizers;
    - |gt[1]| or |gt[5]| <= 1e-15 -> hour-glass failure (:3424-3428);
    - unless approx_ok, every GCP must fit within pixel_threshold
      (default 0.25) of the mean pixel size (:3433-3470).

    Raises ValueError on every FALSE return of the reference."""
    n = len(gcps)
    if n < 2:
        raise ValueError("need at least 2 GCPs")
    if n == 2:
        (p0, l0, x0, y0), (p1, l1, x1, y1) = gcps[0], gcps[1]
        if p1 == p0 or l1 == l0:
            raise ValueError("2-GCP case needs distinct pixel and line")
        gt = [0.0, (x1 - x0) / (p1 - p0), 0.0,
              0.0, 0.0, (y1 - y0) / (l1 - l0)]
        gt[0] = x0 - p0 * gt[1] - l0 * gt[2]
        gt[3] = y0 - p0 * gt[4] - l0 * gt[5]
        return gt
    if (n == 4 and gcps[0][1] == gcps[1][1] and gcps[2][1] == gcps[3][1]
            and gcps[0][0] == gcps[3][0] and gcps[1][0] == gcps[2][0]
            and gcps[0][1] != gcps[2][1] and gcps[0][0] != gcps[1][0]
            and gcps[0][3] == gcps[1][3] and gcps[2][3] == gcps[3][3]
            and gcps[0][2] == gcps[3][2] and gcps[1][2] == gcps[2][2]
            and gcps[0][3] != gcps[2][3] and gcps[0][2] != gcps[1][2]):
        gt1 = (gcps[1][2] - gcps[0][2]) / (gcps[1][0] - gcps[0][0])
        gt5 = (gcps[2][3] - gcps[1][3]) / (gcps[2][1] - gcps[1][1])
        return [gcps[0][2] - gcps[0][0] * gt1, gt1, 0.0,
                gcps[0][3] - gcps[0][1] * gt5, 0.0, gt5]

    mins_maxs = [(min(g[i] for g in gcps), max(g[i] for g in gcps))
                 for i in range(4)]
    for lo, hi in mins_maxs:
        if abs(hi - lo) < 1e-12:
            raise ValueError("GCPs degenerate in one dimension")
    (pmin, pmax), (lmin, lmax), (xmin, xmax), (ymin, ymax) = mins_maxs
    pln = [-pmin / (pmax - pmin), 1.0 / (pmax - pmin), 0.0,
           -lmin / (lmax - lmin), 0.0, 1.0 / (lmax - lmin)]
    gn = [-xmin / (xmax - xmin), 1.0 / (xmax - xmin), 0.0,
          -ymin / (ymax - ymin), 0.0, 1.0 / (ymax - ymin)]

    def gt_apply(gt, p, l):
        return (gt[0] + p * gt[1] + l * gt[2],
                gt[3] + p * gt[4] + l * gt[5])

    sx = sy = sxy = sxx = syy = 0.0
    slon = slonx = slony = slat = slatx = slaty = 0.0
    for g in gcps:
        px_, py_ = gt_apply(pln, g[0], g[1])
        gx_, gy_ = gt_apply(gn, g[2], g[3])
        sx += px_
        sy += py_
        sxy += px_ * py_
        sxx += px_ * px_
        syy += py_ * py_
        slon += gx_
        slonx += gx_ * px_
        slony += gx_ * py_
        slat += gy_
        slatx += gy_ * px_
        slaty += gy_ * py_
    divisor = (n * (sxx * syy - sxy * sxy) + 2 * sx * sy * sxy
               - sy * sy * sxx - sx * sx * syy)
    if divisor == 0.0:
        raise ValueError("no valid solution (zero divisor)")
    gtn = [0.0] * 6
    gtn[0] = (slon * (sxx * syy - sxy * sxy) + slonx * (sy * sxy - sx * syy)
              + slony * (sx * sxy - sy * sxx)) / divisor
    gtn[3] = (slat * (sxx * syy - sxy * sxy) + slatx * (sy * sxy - sx * syy)
              + slaty * (sx * sxy - sy * sxx)) / divisor
    gtn[1] = (slon * (sy * sxy - sx * syy) + slonx * (n * syy - sy * sy)
              + slony * (sx * sy - sxy * n)) / divisor
    gtn[2] = (slon * (sx * sxy - sy * sxx) + slonx * (sx * sy - n * sxy)
              + slony * (n * sxx - sx * sx)) / divisor
    gtn[4] = (slat * (sy * sxy - sx * syy) + slatx * (n * syy - sy * sy)
              + slaty * (sx * sy - sxy * n)) / divisor
    gtn[5] = (slat * (sx * sxy - sy * sxx) + slatx * (sx * sy - n * sxy)
              + slaty * (n * sxx - sx * sx)) / divisor

    def to_h(gt):
        return [gt[0], gt[1], gt[2], gt[3], gt[4], gt[5], 1.0, 0.0, 0.0]

    h = _h_compose(_h_compose(to_h(pln), to_h(gtn)), _h_invert(to_h(gn)))
    gt = [h[0], h[1], h[2], h[3], h[4], h[5]]
    if abs(gt[1]) <= 1e-15 or abs(gt[5]) <= 1e-15:
        raise ValueError("hour-glass GCP shape (degenerate fit)")
    if not approx_ok:
        pix_size = 0.5 * (abs(gt[1]) + abs(gt[2]) + abs(gt[4]) + abs(gt[5]))
        if pix_size == 0.0:
            raise ValueError("zero pixel size")
        for g in gcps:
            ex_, ey_ = gt_apply(gt, g[0], g[1])
            if (abs(ex_ - g[2]) > pixel_threshold * pix_size
                    or abs(ey_ - g[3]) > pixel_threshold * pix_size):
                raise ValueError("GCPs do not fit an affine transform "
                                 "within the threshold")
    return gt


def fit_homography(gcps: list[tuple]) -> list[float]:
    """GDALGCPsToHomography (alg/gdal_homography.cpp:150-330): GCPs
    (pixel, line, geox, geoy) -> 9-coeff forward homography.

    Exact reference discipline: min/max range normalization of both
    planes (:192-212), DLT normal equations AtA h = rhs with the rank
    completion row h[6]=1 (:225-270), unit-square convexity check
    (:288-316), then composition pl_norm . h_norm . inv(geo_norm)
    (:322-327). Driver-side bounded solve (9x9), same trained-literal
    contract as fit_polynomial/fit_tps. Fewer than 4 GCPs fall back to
    GDALGCPsToGeoTransform packed as a homography (:144-151), exactly
    the reference — pinned by the gcps2homography autotest goldens in
    tests/test_autotest_parity.py."""
    if len(gcps) < 4:
        gt = gcps_to_geotransform(gcps)
        return [gt[0], gt[1], gt[2], gt[3], gt[4], gt[5], 1.0, 0.0, 0.0]
    px = [g[0] for g in gcps]
    py = [g[1] for g in gcps]
    ex = [g[2] for g in gcps]
    ny = [g[3] for g in gcps]
    rng = [(min(v), max(v)) for v in (px, py, ex, ny)]
    for lo, hi in rng:
        if abs(hi - lo) < 1e-12:
            raise ValueError("GCPs degenerate in one dimension")
    (p0, p1), (l0, l1), (x0, x1), (y0, y1) = rng
    pl_norm = [-p0 / (p1 - p0), 1.0 / (p1 - p0), 0.0,
               -l0 / (l1 - l0), 0.0, 1.0 / (l1 - l0),
               1.0, 0.0, 0.0]
    geo_norm = [-x0 / (x1 - x0), 1.0 / (x1 - x0), 0.0,
                -y0 / (y1 - y0), 0.0, 1.0 / (y1 - y0),
                1.0, 0.0, 0.0]
    ata = [[0.0] * 9 for _ in range(9)]
    rhs = [0.0] * 9
    rhs[6] = 1.0
    ata[6][6] = 1.0
    for g in gcps:
        p, l = _h_apply(pl_norm, g[0], g[1])
        gx, gy = _h_apply(geo_norm, g[2], g[3])
        ax = [1.0, p, l, 0.0, 0.0, 0.0, -gx, -gx * p, -gx * l]
        ay = [0.0, 0.0, 0.0, 1.0, p, l, -gy, -gy * p, -gy * l]
        for j in range(9):
            for k in range(9):
                ata[j][k] += ax[j] * ax[k] + ay[j] * ay[k]
    (hn,) = _gauss_solve(ata, [rhs])
    if abs(hn[6]) < 1e-15:
        raise ValueError("degenerate homography (h_norm[6] ~ 0)")
    # unit-square -> convex quadrilateral check (gdal_homography.cpp:288)
    cs = [_h_apply(hn, x, y) for x, y in ((0, 0), (1, 0), (1, 1), (0, 1))]
    vx = [c[0] - cs[0][0] for c in cs]
    vy = [c[1] - cs[0][1] for c in cs]
    cross12 = vx[1] * vy[2] - vx[2] * vy[1]
    cross23 = vx[2] * vy[3] - vx[3] * vy[2]
    if cross12 * cross23 <= 0.0:
        raise ValueError("homography does not map unit square convexly")
    return _h_compose(_h_compose(pl_norm, hn), _h_invert(geo_norm))


def homography_apply_cols(h: list[float], xcol, ycol):
    w = F.lit(h[6]) + xcol * F.lit(h[7]) + ycol * F.lit(h[8])
    return ((F.lit(h[0]) + xcol * F.lit(h[1]) + ycol * F.lit(h[2])) / w,
            (F.lit(h[3]) + xcol * F.lit(h[4]) + ycol * F.lit(h[5])) / w)


def homography_apply_sql(h: list[float], xexpr: str, yexpr: str, dlit):
    w = (f"(({dlit(h[6])} + (({xexpr}) * {dlit(h[7])})) "
         f"+ (({yexpr}) * {dlit(h[8])}))")
    gx = (f"((({dlit(h[0])} + (({xexpr}) * {dlit(h[1])})) "
          f"+ (({yexpr}) * {dlit(h[2])})) / {w})")
    gy = (f"((({dlit(h[3])} + (({xexpr}) * {dlit(h[4])})) "
          f"+ (({yexpr}) * {dlit(h[5])})) / {w})")
    return gx, gy
