"""Approximate nearest neighbour over the embeddings table.

Two strategies over `embedding: array<float>`:

- brute-force top-k (queries.q_ann_cosine) — the correctness baseline,
- IVF (inverted-file) here: a tiny centroid codebook partitions vectors
  into cells; queries probe only the `nprobe` nearest cells. This is
  the 100 TB path: cell assignment is one broadcast-codebook pass, the
  search scans ~nprobe/n_centroids of the data, and a real deployment
  would Iceberg-partition by `cell` so probes prune files.

Determinism (for the DuckDB oracle): the codebook is NOT trained —
centroids are the embeddings of the first `n_centroids` vec_ids (a
deterministic stand-in for k-means; the plumbing — assignment, probe,
refine — is the real IVF shape). All float reductions are sequential
left-to-right sums in double, identical in Spark's F.aggregate, DuckDB
list_transform/list_sum, and the numpy oracle kernels.

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
    w = Window.orderBy(F.col("dot").desc(), F.col(id_col).asc())
    return (cells.filter(F.col("cell").isin(probe))
            .withColumn("dot", F.round(_dot(v, query), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "dot"))
