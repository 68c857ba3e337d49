"""sq8_embedding_quantization: codes/dequant/error verified against a
NumPy reference on a planted corpus, and the quantize pass stays map-only
JVM-side (one tiny stats shuffle, broadcast min/max row, no Python)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.queries.similarity import (
    EMB_DIM,
    _FP_SCALE,
    sq8_embedding_quantization,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(len(vecs))],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )


def _reference(vecs):
    """Sequential fixed-point SQ8: the exact integer contract."""
    q = np.floor(vecs.astype(np.float64) * _FP_SCALE).astype(np.int64)
    mn, mx = q.min(axis=0), q.max(axis=0)
    rng = mx - mn
    safe = np.where(rng == 0, 1, rng)
    codes = np.where(rng == 0, 0, ((q - mn) * 255) // safe)
    deq = mn + (codes * rng) // 255
    err = ((q - deq) ** 2).sum(axis=1)
    return codes.astype(np.int32), err


def test_sq8_matches_numpy_reference(spark, workdir):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((120, EMB_DIM)).astype(np.float32)
    vecs[:, 5] = 0.25  # constant dimension -> code 0 everywhere
    _emb_df(spark, vecs).write.parquet(f"{workdir}/sq8/embeddings.parquet")
    got = {
        r.vec_id: r
        for r in sq8_embedding_quantization(spark, f"{workdir}/sq8").collect()
    }
    codes, err = _reference(vecs)
    assert len(got) == 120
    parsed = {i: [int(x) for x in got[i].codes_csv.split(",")] for i in got}
    for i in range(120):
        assert parsed[i] == list(codes[i]), f"vec {i}"
        assert got[i].err_q == int(err[i]), f"vec {i}"
    # codes fill the 0..255 range and the constant dim codes to 0
    assert all(c[5] == 0 for c in parsed.values())
    flat = np.array(list(parsed.values()))
    assert flat.min() == 0 and flat.max() == 255


def test_sq8_plan_broadcast_no_python(spark, workdir):
    rng = np.random.RandomState(8)
    vecs = rng.standard_normal((32, EMB_DIM)).astype(np.float32)
    _emb_df(spark, vecs).write.parquet(f"{workdir}/sq8p/embeddings.parquet")
    plan = (
        sq8_embedding_quantization(spark, f"{workdir}/sq8p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the d-row min/max stats reach the vectors as a broadcast, never a
    # corpus-side shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_sq8_recall_on_separated_corpus(spark, workdir):
    """Well-separated clusters survive 8-bit quantization: SQ8 search
    returns the exact float top-k, recall 1.0 for every query."""
    from databricks_end_to_end_streaming_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
        sq8_recall_eval,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((10, EMB_DIM)) * 10.0
    # exactly TOP_K + 1 points per cluster: each query's top-k is the SET
    # of its cluster-mates, so the assertion is order-free (rank order
    # WITHIN a tight cluster is sub-quantization noise by construction)
    vecs = np.vstack(
        [c + 0.05 * rng.standard_normal((TOP_K + 1, EMB_DIM)) for c in centers]
    ).astype(np.float32)
    _emb_df(spark, vecs).write.parquet(f"{workdir}/sq8r/embeddings.parquet")
    got = sq8_recall_eval(spark, f"{workdir}/sq8r").collect()
    assert len(got) == N_QUERIES
    assert all(r.n_hits == TOP_K and r.recall == 1.0 for r in got)
