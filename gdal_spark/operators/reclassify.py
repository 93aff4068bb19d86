"""Raster reclassify — GDAL mapping-text semantics.

Reference: gdal raster reclassify (apps/gdalalg_raster_reclassify.cpp)
backed by gdal::Reclassifier (frmts/vrt/vrtreclassifier.{h,cpp}):
mappings are ';'-separated SOURCE=DEST entries; SOURCE is a constant,
an interval like "[0,20)" / "(45, inf]" (open endpoints stored
nextafter-nudged to closed bounds, vrtreclassifier.cpp Parse), the
token NO_DATA, or DEFAULT; DEST is a constant, NO_DATA, or (for
DEFAULT) PASS_THROUGH. Lookup = the unique containing interval
(overlaps rejected at init, :Overlaps), then DEFAULT, else error
(Reclassify :398-434).

Distributed shape: the parsed mapping becomes ONE literal CASE chain
— pure whole-stage-codegen column math, the same expression text fed
to Spark and the DuckDB oracle. No join, no shuffle, no Python per
row; a 10^12-pixel reclassify is a map-only scan."""

from __future__ import annotations

import math


class MappingError(ValueError):
    pass


def _parse_interval(src: str):
    """Returns (lo, hi) closed bounds, open endpoints nudged with
    nextafter exactly as vrtreclassifier.cpp does."""
    s = src.strip()
    if s[0] not in "([":
        v = float(s)
        return v, v
    min_inc = s[0] == "["
    if s[-1] not in ")]":
        raise MappingError(f"interval must end with ')' or ']': {src}")
    max_inc = s[-1] == "]"
    lo_s, hi_s = s[1:-1].split(",")
    lo = float("-inf") if lo_s.strip().lower() in ("-inf", "-infinity") \
        else float(lo_s)
    hi = float("inf") if hi_s.strip().lower() in ("inf", "infinity") \
        else float(hi_s)
    if math.isnan(lo) or math.isnan(hi):
        raise MappingError("NaN bound")
    if lo > hi:
        raise MappingError("lower bound above upper")
    if not min_inc:
        lo = math.nextafter(lo, math.inf)
    if not max_inc:
        hi = math.nextafter(hi, -math.inf)
    return lo, hi


def parse_mapping(text: str, nodata: float | None = None) -> dict:
    """Parse the reclassify mapping text. Returns {'intervals':
    [(lo, hi, dest_or_None)], 'default': ('value', v) | 'passthrough'
    | None, 'nodata_dest': v or None}. dest None = PASS_THROUGH."""
    intervals: list[tuple] = []
    default = None
    nodata_dest = None
    for entry in text.split(";"):
        entry = entry.strip()
        if not entry:
            continue
        src, _, dst = entry.partition("=")
        src, dst = src.strip(), dst.strip()
        if not dst:
            raise MappingError(f"missing '=' in {entry!r}")
        up = dst.upper()
        if up == "NO_DATA":
            if nodata is None:
                raise MappingError("NO_DATA dest without a nodata value")
            dval: float | None = nodata
        elif up == "PASS_THROUGH":
            dval = None
        else:
            dval = float(dst)
        if src.upper() == "DEFAULT":
            default = "passthrough" if dval is None else ("value", dval)
            continue
        if dval is None:
            raise MappingError("PASS_THROUGH only valid for DEFAULT")
        if src.upper() == "NO_DATA":
            if nodata is None:
                raise MappingError("NO_DATA source without a nodata value")
            nodata_dest = dval
            continue
        lo, hi = _parse_interval(src)
        for plo, phi, _ in intervals:
            if lo <= phi and plo <= hi:
                raise MappingError(
                    f"interval [{lo}, {hi}] overlaps [{plo}, {phi}]")
        intervals.append((lo, hi, dval))
    intervals.sort(key=lambda t: t[0])
    return {"intervals": intervals, "default": default,
            "nodata_dest": nodata_dest}


def _num(v: float) -> str:
    if v == math.inf:
        return "CAST('inf' AS DOUBLE)"
    if v == -math.inf:
        return "CAST('-inf' AS DOUBLE)"
    return repr(float(v))


def reclassify_case_sql(mapping: dict, col: str,
                        nodata: float | None = None) -> str:
    """The mapping as one CASE expression (valid in both Spark SQL and
    DuckDB). Values matching no interval take DEFAULT; with no DEFAULT
    the reference errors at read time — here they become NULL, which
    the caller may assert empty."""
    parts = []
    if nodata is not None and mapping["nodata_dest"] is not None:
        parts.append(f"WHEN {col} = {_num(nodata)} "
                     f"THEN {_num(mapping['nodata_dest'])}")
    for lo, hi, dval in mapping["intervals"]:
        if lo == hi:
            cond = f"{col} = {_num(lo)}"
        else:
            cond = f"{col} >= {_num(lo)} AND {col} <= {_num(hi)}"
        parts.append(f"WHEN {cond} THEN {_num(dval)}")
    if mapping["default"] == "passthrough":
        parts.append(f"ELSE {col}")
    elif mapping["default"] is not None:
        parts.append(f"ELSE {_num(mapping['default'][1])}")
    return "CASE " + " ".join(parts) + " END"
