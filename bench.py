#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The primary metric is
pages/sec of the flagship spatial-join + tiling pipeline over the
high-volume points table (BASELINE.md protocol).

Usage:
  python bench.py                 # single run, one JSON line
  python bench.py --scaling       # run flagship at local[8] and
                                  # local[32], report efficiency
                                  # (BASELINE.json north rule: ≥0.8)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    """Execute the full plan; cheap count via noop-ish aggregation."""
    return df.count()


def flagship(spark, sf_dir: str):
    """Geocode → cell index → PIP join → per-zone counts AND z12 tile
    counts + pyramid to z6 — the north-star job shape."""
    from pyspark.sql import functions as F

    from gdal_spark.operators import spatial_join as sj
    from gdal_spark.operators import tiling
    from gdal_spark.queries import points_df

    pts = points_df(spark, sf_dir)
    hits = sj.pip_join(pts, spark, point_fid="pt_id")
    zone_counts = hits.groupBy("zone_fid").agg(F.count("*").alias("n"))
    tiles = tiling.pyramid(tiling.tile_counts(pts, 12), min_zoom=6)
    return zone_counts, tiles


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from gdal_spark.queries import REGISTRY, points_df

    out: dict[str, float] = {}

    t0 = time.monotonic()
    zc, tiles = flagship(spark, sf_dir)
    _force(zc)
    _force(tiles)
    out["flagship_join_tile"] = time.monotonic() - t0

    for name in ["pip_join", "knn", "rasterize_points", "tile_pyramid",
                 "zonal_stats", "dedup_exact", "token_count", "ann_cosine",
                 "simhash_lsh", "summary", "events_window"]:
        fn = REGISTRY[name][0]
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        out[name] = time.monotonic() - t0
    return out


def run_single() -> dict:
    from gdal_spark.queries import points_df
    from gdal_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    n_rows = points_df(spark, SF_DIR).count()
    queries = bench_queries(spark, SF_DIR)
    pages_per_sec = n_rows / queries["flagship_join_tile"]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "pages/sec flagship spatial-join + tiling",
        "value": round(pages_per_sec, 1),
        "unit": "pages/sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(sf),
        "rows": n_rows,
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """North-rule scaling evidence: same job at local[8] vs local[32]
    (N vs 4N cores stand-in), ≥3 runs each, median; efficiency =
    (thr_32 / thr_8) / 4."""
    import statistics
    import subprocess

    script = (
        "import time,json,sys;"
        "from gdal_spark.session import get_spark;"
        "from bench import flagship, _force;"
        f"spark = get_spark(app='scaling', master='local[%d]', shuffle_partitions=%d);"
        f"from gdal_spark.queries import points_df;"
        f"n = points_df(spark, '{SF_DIR}').count();"
        "t0 = time.monotonic();"
        f"zc, tiles = flagship(spark, '{SF_DIR}');"
        "_force(zc); _force(tiles);"
        "print(json.dumps({'t': time.monotonic() - t0, 'n': n}));"
        "spark.stop()"
    )
    res = {}
    for cores in (8, 32):
        times = []
        n = 0
        for _ in range(3):
            p = subprocess.run(
                [sys.executable, "-c", script % (cores, cores)],
                capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)))
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
            d = json.loads(line)
            times.append(d["t"])
            n = d["n"]
        res[cores] = {"median_sec": statistics.median(times), "runs": times,
                      "pages_per_sec": n / statistics.median(times), "rows": n}
    eff = (res[32]["pages_per_sec"] / res[8]["pages_per_sec"]) / 4.0
    return {"scaling": res, "efficiency_8_to_32": round(eff, 3),
            "target": 0.8, "sf_dir": SF_DIR}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_single()))
