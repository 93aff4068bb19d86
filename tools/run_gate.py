"""Local replica of the driver's correctness gate.

Runs every REGISTRY query through Spark AND its DuckDB oracle at the
given sf dir (default sf0.01, the driver's gate scale), comparing row
count, column set, order-insensitive values AND pandas dtype kinds —
the last one mirrors the driver's dtype-sensitive value hash (a DuckDB
HUGEINT landing as float64 vs Spark int64 is a driver FAIL even when
the values are equal; see VERDICT r01 on zonal_stats).

Usage:  python tools/run_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import __spark_entry__ as entry
from gdal_spark import get_spark
from tests.oracle_harness import duck_con, normalize


def dtype_kinds(df: pd.DataFrame) -> dict[str, str]:
    return {c: df[c].dtype.kind for c in df.columns}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    qs, os_ = entry.queries(), entry.oracle_sql()
    fails = []
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = qfn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            fails.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}", flush=True)
            continue
        osql = os_.get(name)
        if osql is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, "
                  f"{time.monotonic()-t0:.1f}s)", flush=True)
            continue
        con = duck_con(sf_dir)
        try:
            odf = con.execute(osql).df()
        except Exception as ex:  # noqa: BLE001
            fails.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}", flush=True)
            continue
        finally:
            con.close()
        msgs = []
        if len(sdf) != len(odf):
            msgs.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            msgs.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
        for c in sorted(set(sk) & set(ok)):
            a, b = sk[c], ok[c]
            if a != b and {a, b} != {"M", "M"} and not (
                    a in "iu" and b in "iu"):
                msgs.append(f"dtype[{c}] {sdf[c].dtype} vs {odf[c].dtype}")
        if not msgs:
            a, b = normalize(sdf), normalize(odf)
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if av.dtype.kind == "f":
                    am = np.isnan(av.astype(float))
                    bm = np.isnan(bv.astype(float))
                    if not (am == bm).all() or not (av[~am] == bv[~bm]).all():
                        msgs.append(f"values[{c}]")
                elif not (pd.Series(av).fillna("@")
                          == pd.Series(bv).fillna("@")).all():
                    msgs.append(f"values[{c}]")
        if msgs:
            fails.append((name, "; ".join(msgs)))
            print(f"FAIL {name}: {'; '.join(msgs)}", flush=True)
        else:
            print(f"ok   {name}: {len(sdf)} rows, "
                  f"{time.monotonic()-t0:.1f}s", flush=True)
    print(f"\n{len(fails)} failures / {len(qs)} queries")
    for name, msg in fails:
        print(f"  {name}: {msg}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
