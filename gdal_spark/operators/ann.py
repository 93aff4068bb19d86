"""Approximate nearest neighbour over the embeddings table.

Two strategies over `embedding: array<float>`:

- brute-force top-k (queries.q_ann_cosine) — the correctness baseline,
- IVF (inverted-file) here: a tiny centroid codebook partitions vectors
  into cells; queries probe only the `nprobe` nearest cells. This is
  the 100 TB path: cell assignment is one broadcast-codebook pass, the
  search scans ~nprobe/n_centroids of the data, and a real deployment
  would Iceberg-partition by `cell` so probes prune files.

Determinism (for the DuckDB oracle): the codebook IS trained — a
distributed Lloyd loop (``train_codebook``) whose every float is
cross-engine exact: centroid updates use EXACT INTEGER sums of
floor-scaled values (order-independent, so the distributed groupBy can
combine partials in any order), and distance folds are sequential
left-to-right over the dim axis in both engines. All other float
reductions are sequential left-to-right sums in double, identical in
Spark's F.aggregate, DuckDB list_transform/list_sum, and the numpy
oracle kernels.

GDAL analog: none (ANN is training-data surface); the cell-probe shape
mirrors our kNN ring search (alg/gdalgrid.cpp:905-976 twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(vec_col, centroid: list[float]):
    """Sequential-order squared L2 between an array<double> column and a
    literal centroid (fold left, like DuckDB list_sum over list_apply)."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _dot(vec_col, q: list[float]):
    qc = F.array(*[F.lit(float(v)) for v in q])
    return F.aggregate(
        F.zip_with(vec_col, qc, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


# centroid-update quantization: floor(val * 2^20) — power-of-two scale
# so the multiply is exact; integer sums are order-free; the final
# s / (SCALE * n) division is a single correctly-rounded IEEE op in
# Python, Spark, and DuckDB alike.
TRAIN_SCALE = 1 << 20


def train_codebook(df: DataFrame, k: int = 4, iters: int = 3,
                   train_n: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic distributed Lloyd: init = embeddings of the first
    ``k`` ids; each iteration assigns the training sample (ids <
    ``train_n`` — a deployment trains on a bounded sample, never the
    full table) via broadcast column math, then updates centroids with
    exact-integer sums (see TRAIN_SCALE). Per-iteration driver traffic
    is k × dims rows — bounded at any data scale. Empty cells keep
    their previous centroid. Returns [(cid, centroid)] sorted by cid."""
    v = F.col(vec_col).cast("array<double>")
    # repartition(1): the training sample is deliberately tiny; without
    # it every Lloyd iteration schedules shuffle-partition-count
    # near-empty tasks (the iterations are many small JOBS — task count
    # is the cost driver, not data)
    train = (df.filter(F.col(id_col) < train_n)
             .select(F.col(id_col).alias("_id"), v.alias("_v"))
             .repartition(1).persist())
    init = train.filter(F.col("_id") < k).orderBy("_id").collect()
    cents = [(int(r["_id"]), [float(x) for x in r["_v"]]) for r in init]
    dims = len(cents[0][1])
    for _ in range(iters):
        assigned = assign_cells(train, cents, vec_col="_v")
        el = assigned.select(
            "cell", F.posexplode(F.col("_v")).alias("dim", "val"))
        upd = el.groupBy("cell", "dim").agg(
            F.sum(F.floor(F.col("val") * TRAIN_SCALE).cast("long")).alias("s"),
            F.count("*").alias("n"))
        bycell: dict[int, dict[int, float]] = {}
        for r in upd.collect():
            bycell.setdefault(int(r["cell"]), {})[int(r["dim"])] = \
                int(r["s"]) / (TRAIN_SCALE * int(r["n"]))
        cents = [(cid, [bycell.get(cid, {}).get(d, old[d])
                        for d in range(dims)])
                 for cid, old in cents]
    train.unpersist()
    return cents


def assign_cells(df: DataFrame, centroids: list[tuple[int, list[float]]],
                 vec_col: str = "embedding") -> DataFrame:
    """Add `cell` = argmin centroid by squared L2 (tie → lowest cid).
    The codebook is literal column math — broadcast by construction."""
    v = F.col(vec_col).cast("array<double>")
    dists = [(cid, _sqdist(v, c)) for cid, c in centroids]
    best_d = F.least(*[d for _, d in dists])
    cell = F.lit(None).cast("int")
    # first (lowest cid) centroid achieving the min wins the tie
    for cid, d in reversed(dists):
        cell = F.when(d == best_d, F.lit(cid)).otherwise(cell)
    return df.withColumn("cell", cell)


def ivf_topk(df: DataFrame, query: list[float],
             centroids: list[tuple[int, list[float]]], k: int = 10,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Top-k by dot product among vectors in the nprobe cells nearest
    the query. Returns (id_col, rank, dot) — dot rounded to 6."""
    import numpy as np
    qa = np.asarray(query, dtype=np.float64)
    cd = []
    for cid, c in centroids:
        ca = np.asarray(c, dtype=np.float64)
        d = 0.0
        for x in (qa - ca) * (qa - ca):  # sequential sum, oracle-ordered
            d += x
        cd.append((d, cid))
    probe = [cid for _, cid in sorted(cd)[:nprobe]]

    v = F.col(vec_col).cast("array<double>")
    cells = assign_cells(df, centroids, vec_col)
    # TakeOrderedAndProject top-k (orderBy+limit): per-partition heaps
    # merged on the driver — no global-window shuffle-to-one-task. The
    # rank window then runs on k rows only.
    topk = (cells.filter(F.col("cell").isin(probe))
            .withColumn("dot", F.round(_dot(v, query), 6))
            .select(id_col, "dot")
            .orderBy(F.col("dot").desc(), F.col(id_col).asc())
            .limit(k))
    w = Window.orderBy(F.col("dot").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w)) \
               .select(id_col, "rank", "dot")
