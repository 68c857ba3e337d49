"""Distributed PCA over an embedding corpus.

The north-star similarity stack (brute-force kNN -> LSH -> IVF -> PQ)
gets its standard preprocessing step: project embeddings onto the top-k
principal components (dimensionality reduction before indexing, the
usual recipe for making IVF/PQ codebooks cheaper and ANN distances
better conditioned).

Division of labor — the only scalable one for tall-skinny data:

* CLUSTER: the d x d covariance sufficient statistics (second-moment
  cells + mean vector) via exact fixed-point int64 aggregation — the
  same quantization discipline as the oracle-checked
  ``embedding_second_moment_matrix`` query. One corpus pass, one tiny
  shuffle of <= d(d+1)/2 + d cells; rows never leave executors.
* DRIVER: eigendecomposition of the d x d matrix (d = 64 -> a 64x64
  ``numpy.linalg.eigh``, microseconds) — this is O(d^3) with NO
  dependence on corpus size, the textbook driver-side step (Spark
  MLlib's own PCA does exactly this via its Gramian).
* CLUSTER: projection y = W^T (x - mu) as k zip_with dot products with
  the broadcast-literal component matrix — JVM-side, map-only, no
  shuffle, no Python in the row path.

Sign convention: eigh's eigenvector signs are arbitrary, so each
component is flipped to make its largest-|coefficient| entry positive —
deterministic output regardless of LAPACK build
(tests/test_pca_embed.py asserts exact agreement with a NumPy
reference under the same convention).

Like IVF/PQ's k-means, the eigendecomposition itself is not
SQL-replayable, so the registered query is rows-only with the exact
contract pinned in pytest instead.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FP_SCALE = 1 << 20  # power-of-two fixed point: exact in every engine


def covariance_cells(
    df: DataFrame, col: str = "embedding", d: int | None = None
) -> DataFrame:
    """(i, j, dot_q, sum_q, n) covariance sufficient-statistic cells of
    the embedding column: exact int64 sums over 2^20 fixed-point
    coordinates, upper triangle only, the diagonal's coordinate sum
    doubling as the mean accumulator (one aggregation, no second corpus
    branch). The d^2 explode collapses map-side, so the shuffle carries
    <= d(d+1)/2 cells, never rows. Cells are CELL-ADDABLE — the stats of
    a union are the sums of the stats — which is what the streaming
    twin (streaming/gram.py) accumulates per micro-batch.

    Pass ``d`` (embedding dimension) when known to skip the discovery
    job; when omitted it is probed with a safe ``first()`` — an EMPTY
    input then yields an empty cell relation (cell-addable zero) instead
    of crashing, so an empty micro-batch through gram_stage is a no-op
    rather than a dead streaming query."""
    q = F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(FP_SCALE))).cast("long")
    )
    qdf = df.select(q.alias("q"))
    if d is None:
        head = qdf.select(F.size("q").alias("d")).first()
        if head is None:
            return df.sparkSession.createDataFrame(
                [],
                "i int, j int, dot_q long, sum_q long, n long",
            )
        d = head["d"]
    upper = qdf.select(
        F.posexplode("q").alias("i", "qi"),
        F.slice(F.col("q"), F.col("i") + 1, F.lit(d)).alias("rest"),
    ).select("i", "qi", F.posexplode("rest").alias("p", "qj"))
    return (
        upper.select(
            "i",
            (F.col("i") + F.col("p")).alias("j"),
            (F.col("qi") * F.col("qj")).alias("prod"),
            "qi",
        )
        .groupBy("i", "j")
        .agg(
            F.sum("prod").alias("dot_q"),
            F.sum(F.when(F.col("i") == F.col("j"), F.col("qi"))).alias("sum_q"),
            F.count("*").alias("n"),
        )
    )


def finalize_covariance(cells: list) -> tuple[np.ndarray, np.ndarray, int]:
    """(cov, mean, n) from collected covariance cells — the single float
    finalization both the batch and streaming paths share, so their
    results are identical whenever their int64 cells are."""
    if not cells:
        raise ValueError(
            "no covariance cells — empty corpus (or an all-empty cell "
            "log); PCA over zero rows is undefined"
        )
    d = max(r["j"] for r in cells) + 1
    n = next(r["n"] for r in cells if r["i"] == r["j"])
    second = np.zeros((d, d))
    mean = np.zeros(d)
    for r in cells:
        v = r["dot_q"] / float(FP_SCALE * FP_SCALE)
        second[r["i"], r["j"]] = v
        second[r["j"], r["i"]] = v
        if r["i"] == r["j"]:
            mean[r["i"]] = r["sum_q"] / float(FP_SCALE)
    second /= n
    mean /= n
    return second - np.outer(mean, mean), mean, n


def covariance_stats(emb: DataFrame, col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(cov, mean, n) of the embedding column via exact int64 sums of
    2^20 fixed-point coordinates. One corpus pass; only cells reach the
    driver. int64 headroom mirrors the Gram query (~3e7 rows at
    |x| <= 1; widen the sums to DECIMAL(38,0) past that)."""
    return finalize_covariance(covariance_cells(emb, col).collect())


def pca_components(cov: np.ndarray, k: int) -> np.ndarray:
    """Top-k eigenvectors of ``cov`` as a (d, k) matrix, eigenvalue-
    descending, each column sign-fixed (largest-|entry| positive)."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order]
    for c in range(w.shape[1]):
        pivot = np.argmax(np.abs(w[:, c]))
        if w[pivot, c] < 0:
            w[:, c] = -w[:, c]
    return w


def project_embeddings(
    emb: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append y = W^T (x - mu) as an array<double> column: one zip_with
    dot product per component against broadcast-literal coefficient
    arrays — map-only, JVM-side, zero shuffles."""
    projs = []
    for c in range(components.shape[1]):
        w_arr = F.array(*[F.lit(float(v)) for v in components[:, c]])
        mu_dot = float(mean @ components[:, c])
        dot = F.aggregate(
            F.zip_with(col, w_arr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        projs.append(dot - F.lit(mu_dot))
    return emb.withColumn(out_col, F.array(*projs))


def pca_project(emb: DataFrame, k: int, col: str = "embedding") -> DataFrame:
    """End-to-end: exact covariance stats -> driver eigh -> projected
    corpus with a ``pca`` array<double> column of length ``k``."""
    cov, mean, _n = covariance_stats(emb, col)
    w = pca_components(cov, k)
    return project_embeddings(emb, w, mean, col)
