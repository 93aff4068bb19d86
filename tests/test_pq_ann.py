"""PQ ANN: codes are valid, the ADC distance equals the direct
lookup-table recomputation, and PQ's top-10 meaningfully overlaps the
exact L2 top-10 (quantization recall sanity)."""

SF = "/root/testdata/sf0.001"


def test_pq_adc_matches_direct(spark):
    import pytest as pt
    from pyspark.sql import functions as F

    from gdal_spark.operators import ann as ann_op
    from gdal_spark.queries import (IVF_ITERS, IVF_TRAIN_N, PQ_K, PQ_M,
                                    PQ_SUB, q_pq_ann)
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = df.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    vecs = {r.vec_id: list(r.v) for r in base.collect()}
    query = vecs[0]

    cents, codes = [], {vid: [] for vid in vecs}
    for m in range(PQ_M):
        lo = m * PQ_SUB
        sub = base.select("vec_id",
                          F.slice("v", lo + 1, PQ_SUB).alias("embedding"))
        cm = ann_op.train_codebook(sub, k=PQ_K, iters=IVF_ITERS,
                                   train_n=IVF_TRAIN_N)
        cents.append(cm)
        for r in ann_op.assign_cells(sub, cm).select(
                "vec_id", "cell").collect():
            codes[r.vec_id].append(r.cell)

    def adc(vid):
        tot = 0.0
        for m in range(PQ_M):
            qs = query[m * PQ_SUB:(m + 1) * PQ_SUB]
            c = dict(cents[m])[codes[vid][m]]
            d = 0.0
            for a, b in zip(qs, c):
                d = d + (a - b) * (a - b)
            tot += d
        return tot

    got = {r.vec_id: (r.adist, r.rank)
           for r in q_pq_ann(spark, SF).collect()}
    assert len(got) == 10
    for vid, (ad, _) in got.items():
        assert ad == pt.approx(adc(vid), abs=1e-6), vid
    # query itself is its own nearest neighbor under ADC
    assert got[0][1] == 1

    # recall sanity vs exact L2 top-10
    def l2(vid):
        return sum((a - b) ** 2 for a, b in zip(query, vecs[vid]))
    exact = sorted(vecs, key=lambda v: (l2(v), v))[:10]
    overlap = len(set(got) & set(exact))
    assert overlap >= 3, (overlap, sorted(got), exact)
