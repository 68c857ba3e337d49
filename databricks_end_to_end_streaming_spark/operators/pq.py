"""Product quantization: compressed-domain vector storage + ADC search.

PQ (Jegou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", PAMI 2011; public literature) splits each D-dim vector into M
subvectors and vector-quantizes each subspace against its own K-centroid
codebook: a 64-dim float vector (256 bytes) compresses to M=8 one-byte
codes. At 100 TB scale that is the difference between embeddings that
fit in executor memory and embeddings that don't.

Distributed shape, mirroring the IVF operator (similarity.py):

* codebooks train on a bounded, deterministic driver-side sample (the
  standard recipe — training data is a sample by design);
* encoding is a vectorized Arrow-batched matmul per subspace; codes ride
  in 8 int columns, so downstream shuffles move ~bytes per vector;
* ADC (asymmetric distance computation) search scores FULL-PRECISION
  queries against COMPRESSED corpus codes through a per-query lookup
  table of partial dot products: one (M x K) table per query, score =
  sum over subspaces of LUT[m, code_m] — no corpus vector is ever
  decompressed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf

M_SUBSPACES = 8
K_CENTROIDS = 16


def train_pq_codebooks(
    emb: DataFrame,
    m: int = M_SUBSPACES,
    k: int = K_CENTROIDS,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """(m, k, dim//m) float64 codebooks: independent Lloyd's k-means per
    subspace on a deterministic sample (ordered by id) collected to the
    driver — bounded, like the IVF coarse quantizer."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    if not rows:
        raise ValueError("no rows to train PQ codebooks on (empty input)")
    x = np.asarray([r[1] for r in rows], dtype=np.float64)  # (n, dim)
    rs = np.random.RandomState(seed)
    books = np.empty((m, k, sub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        cents = xs[rs.choice(len(xs), size=min(k, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s, : len(cents)] = cents
        if len(cents) < k:  # degenerate tiny sample: pad with copies
            books[s, len(cents) :] = cents[0]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    err_col: str = "recon_err",
) -> DataFrame:
    """Append `codes` (array<int>, one code per subspace) and the
    per-vector squared reconstruction error. Arrow-batched; codebooks
    ride in the closure (tiny: m*k*sub doubles)."""
    m, _k, sub = codebooks.shape

    @pandas_udf("struct<codes: array<int>, recon_err: double>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        err = np.zeros(n, dtype=np.float64)
        for s in range(m):
            xs = mat[:, s * sub : (s + 1) * sub]  # (n, sub)
            d2 = ((xs[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
            err += d2[np.arange(n), codes[:, s]]
        return pd.DataFrame({"codes": list(codes), "recon_err": err})

    out = df.withColumn("_pq", encode(F.col(vec_col)))
    return out.select(
        *[c for c in df.columns],
        F.col("_pq.codes").alias(codes_col),
        F.col("_pq.recon_err").alias(err_col),
    )


def _adc_score_udf(codebooks: np.ndarray):
    """Arrow-batched asymmetric-distance COSINE scorer over PQ codes —
    the one scoring code path every PQ search variant shares
    (``pq_adc_topk`` full scan, ``ivfpq_topk`` probed lists). The dot
    product is the per-subspace LUT gather-sum; |x_hat|^2 is itself a
    code-table lookup (disjoint coordinate blocks, so reconstruction
    norms add across subspaces); ranking by raw inner product instead
    would bias toward high-norm corpus vectors (MIPS, a different
    task)."""
    m, _kc, sub = codebooks.shape
    norm2_lut = (codebooks**2).sum(axis=2)

    @pandas_udf("double")
    def adc_score(qv: pd.Series, codes: pd.Series) -> pd.Series:
        qmat = np.asarray(qv.tolist(), dtype=np.float64)
        cmat = np.asarray(codes.tolist(), dtype=np.int64)
        n = len(qmat)
        dots = np.zeros(n, dtype=np.float64)
        xnorm2 = np.zeros(n, dtype=np.float64)
        for s in range(m):
            qs = qmat[:, s * sub : (s + 1) * sub]
            partial = np.einsum("nd,kd->nk", qs, codebooks[s])
            dots += partial[np.arange(n), cmat[:, s]]
            xnorm2 += norm2_lut[s][cmat[:, s]]
        qnorm = np.sqrt((qmat**2).sum(axis=1))
        return pd.Series(dots / np.maximum(qnorm * np.sqrt(xnorm2), 1e-12))

    return adc_score


def _topk_per_query(
    scored: DataFrame, k: int, query_id_col: str
) -> DataFrame:
    """Shared top-k tail: only TOP_K rows per query survive to the
    final (tiny) window exchange."""
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Approximate top-k COSINE by asymmetric distance: full-precision
    queries scored against each corpus vector's reconstruction x_hat.
    cosine(q, x_hat) = (q . x_hat) / (|q| |x_hat|); the dot product is
    the usual per-subspace LUT gather-sum, and |x_hat|^2 is itself a
    code-table lookup (subspaces are disjoint coordinate blocks, so
    reconstruction norms add across subspaces). Ranking by the raw
    inner product instead would bias toward high-norm corpus vectors —
    a different task (MIPS) than the cosine ANN the brute-force/LSH/IVF
    variants solve — see ``_adc_score_udf``. The broadcast join ships
    (query_id, qv) to every partition of the compressed corpus."""
    adc_score = _adc_score_udf(codebooks)
    cand = codes_df.join(
        F.broadcast(queries), F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        adc_score(F.col(query_vec_col), F.col(codes_col)).alias("score"),
    )
    return _topk_per_query(scored, k, query_id_col)


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """IVF-PQ: the production composition (FAISS's IVFPQ index shape) —
    the coarse quantizer bounds WHICH vectors each query scores
    (inverted lists, nprobe cells per query) and product quantization
    bounds HOW MUCH each scored vector costs (m one-byte codes + an LUT
    gather instead of a full-precision dot product). Against the pure
    paths: ``ivf_topk`` still stores/loads full vectors per candidate;
    ``pq_adc_topk`` still scans every corpus code per query. At 100 TB
    both dimensions must be bounded at once — candidates by
    nprobe/n_cells of the corpus, bytes by the 32x PQ compression — and
    that is exactly this plan: per-query work is
    O(corpus * nprobe / n_cells) LUT gathers, never a full scan, never
    full-precision corpus vectors.

    Plan shape: corpus side = ivf_assign (cell id) + pq_encode (codes),
    both Arrow-batched map-only passes whose output drops the raw
    vector before any shuffle; query side = nprobe cell ids exploded;
    candidates = a broadcast hash join on cell id; ADC scoring is the
    same code path ``pq_adc_topk`` uses; only TOP_K rows per query
    survive to the final window exchange."""
    from .similarity import ivf_assign

    adc_score = _adc_score_udf(codebooks)
    lists = ivf_assign(emb, centroids, vec_col, nprobe=1).select(
        id_col, vec_col, F.col("cluster_ids")[0].alias("cluster_id")
    )
    coded = pq_encode(lists, codebooks, vec_col=vec_col).select(
        id_col, "cluster_id", "codes"
    )
    probes = ivf_assign(
        queries, centroids, query_vec_col, nprobe=nprobe
    ).select(
        query_id_col,
        query_vec_col,
        F.explode("cluster_ids").alias("cluster_id"),
    )
    cand = F.broadcast(probes).join(coded, "cluster_id").where(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = cand.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        adc_score(F.col(query_vec_col), F.col("codes")).alias("score"),
    )
    return _topk_per_query(scored, k, query_id_col)
