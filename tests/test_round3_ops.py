"""Property tests for the round-3 closing operators (beyond the
cross-engine gate): PCA vs a dense eigensolver, recall monotonicity,
normalization idempotence, weighted-sample skew, within-doc dedup."""

import duckdb
import numpy as np
import pytest

from conftest import SF_SMOKE


def test_pca_power_matches_numpy_iterations(spark):
    """The operator computes EXACTLY PCA_ITERS power iterations (the
    fixture spectrum is near-isotropic, λ2/λ1≈0.93, so convergence to
    the eigenvector is a parameter choice, not a correctness claim):
    assert it tracks an unquantized numpy twin of the same iterations
    and that the Rayleigh estimate is sandwiched by the true
    spectrum."""
    from gdal_spark.queries import PCA_ITERS, q_pca_power
    out = q_pca_power(spark, SF_SMOKE).toPandas().sort_values("dim")
    v = out["loading"].to_numpy()
    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .toPandas()["embedding"])
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc / len(X)
    vn = np.zeros(C.shape[0])
    vn[0] = 1.0
    lam_n = 0.0
    for _ in range(PCA_ITERS):
        w = C @ vn
        lam_n = float(np.linalg.norm(w))
        vn = w / lam_n
    cos = abs(float(v @ vn))
    assert cos > 0.999, f"diverged from numpy twin: |cos|={cos:.5f}"
    evals = np.linalg.eigvalsh(C)
    lam = float(out["lam"].iloc[0])
    assert lam == pytest.approx(lam_n, rel=1e-3)
    assert lam <= float(evals[-1]) * 1.001, \
        "power-iteration Rayleigh estimate cannot exceed the top eigenvalue"


def test_ann_recall_monotone_and_exhaustive(spark):
    from gdal_spark.queries import IVF_K, q_ann_recall
    out = (q_ann_recall(spark, SF_SMOKE).toPandas()
           .sort_values("nprobe"))
    rec = out["recall"].tolist()
    assert rec == sorted(rec), "recall must not decrease with nprobe"
    assert out["nprobe"].iloc[-1] == IVF_K and rec[-1] == 1.0, \
        "probing every cell is exhaustive search"


def test_text_normalize_idempotent():
    from gdal_spark.queries import _TNORM, _TNORM_AUG
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_SMOKE}/documents.parquet'")
    n = con.execute(f"""
WITH d AS (SELECT doc_id, {_TNORM_AUG} AS t FROM documents),
one AS (SELECT doc_id, {_TNORM} AS t FROM d),
two AS (SELECT doc_id, {_TNORM} AS t2, t FROM one)
SELECT COUNT(*) FROM two WHERE t2 <> t""").fetchone()[0]
    assert n == 0, "normalize(normalize(x)) must equal normalize(x)"


def test_weighted_sample_matches_hashlib_twin():
    """The A-Res selection is fully deterministic: an independent
    hashlib/numpy twin of key = ln(u)/w must pick the same top-k in
    the same order. (A mean-skew assertion would be flaky at k=30 on
    the near-uniform fixture weights — determinism is the real
    property.)"""
    import hashlib
    import math

    from gdal_spark.queries import WS_K, o_weighted_sample
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_SMOKE}/documents.parquet'")
    s = con.execute(o_weighted_sample()).df()
    docs = con.execute(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0").df()
    keys = []
    for doc_id, w in zip(docs["doc_id"], docs["n_chars"]):
        h = hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()
        u = (int(h[:12], 16) + 0.5) / float(1 << 48)
        keys.append((-(math.log(u) / float(w)), int(doc_id)))
    want = [d for _, d in sorted(keys)[:WS_K]]
    assert s["doc_id"].tolist() == want


def test_paragraph_dedup_removes_only_seeded():
    from gdal_spark.queries import o_paragraph_dedup
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_SMOKE}/documents.parquet'")
    df = con.execute(o_paragraph_dedup()).df()
    assert (df["n_kept"] <= df["n_lines"]).all()
    removed = df[df["n_kept"] < df["n_lines"]]
    assert len(removed) > 0
    assert (removed["doc_id"] % 11 == 0).all(), \
        "only the seeded re-appended lines may be removed"
