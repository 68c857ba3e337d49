"""PCA over embeddings: the distributed exact-fixed-point covariance
matches a NumPy replay of the same quantized arithmetic, components are
sign-deterministic, projection matches NumPy, and projected variance is
eigenvalue-descending on the real testdata."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.operators.pca import (
    FP_SCALE,
    covariance_stats,
    pca_components,
    pca_project,
    project_embeddings,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb_matrix(spark, sf_dir=SF_DIR):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_covariance_matches_numpy_quantized_replay(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cov, mean, n = covariance_stats(emb)
    x = _emb_matrix(spark)
    q = np.floor(x * FP_SCALE)  # exact: every step mirrors the operator
    second = (q.T @ q) / float(FP_SCALE * FP_SCALE) / len(q)
    mu = q.sum(axis=0) / float(FP_SCALE) / len(q)
    ref = second - np.outer(mu, mu)
    assert n == len(q)
    assert np.allclose(mean, mu, atol=1e-12)
    assert np.allclose(cov, ref, atol=1e-9)


def test_components_sign_deterministic_on_separated_spectrum():
    """Hand-built covariance with well-separated eigenvalues: eigh may
    return either sign, the convention must always yield the same."""
    rng = np.random.RandomState(7)
    basis, _ = np.linalg.qr(rng.randn(6, 6))
    cov = basis @ np.diag([32.0, 16.0, 8.0, 4.0, 2.0, 1.0]) @ basis.T
    w = pca_components(cov, 3)
    for c in range(3):
        pivot = np.argmax(np.abs(w[:, c]))
        assert w[pivot, c] > 0
        expect = basis[:, c] * np.sign(basis[np.argmax(np.abs(basis[:, c])), c])
        assert np.allclose(np.abs(w[:, c] @ expect), 1.0, atol=1e-9), c


def test_projection_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cov, mean, _n = covariance_stats(emb)
    w = pca_components(cov, 4)
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in project_embeddings(emb, w, mean).select("vec_id", "pca").collect()
    }
    x = _emb_matrix(spark)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    ref = (x - mean) @ w
    for idx, vid in enumerate(ids):
        assert np.allclose(got[vid], ref[idx], atol=1e-9), vid


def test_projected_variance_descends(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    proj = np.array(
        [r["pca"] for r in pca_project(emb, 4).select("pca").collect()]
    )
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))
    assert var[0] > 0
