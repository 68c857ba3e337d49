"""IVF ANN: planted twins recovered at rank 1, candidate set bounded by
the probed lists (not the whole corpus)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.operators.similarity import (
    ivf_assign,
    ivf_topk,
    train_ivf_centroids,
)


def make_emb(spark, seed=31, n=400, dim=64, n_twins=5):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(n_twins):
        vecs = np.vstack(
            [vecs, (vecs[i] + 0.03 * rng.standard_normal(dim)).astype(np.float32)]
        )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    return df, vecs


def test_ivf_recovers_planted_twins(spark):
    emb, vecs = make_emb(spark)
    n = 400
    cents = train_ivf_centroids(emb, n_centroids=12)
    assert cents.shape == (12, 64)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = ivf_topk(emb, queries, cents, k=3, nprobe=3).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    for q in range(5):
        assert top1[q] == n + q  # twin lands in a probed list at rank 1


def test_ivf_assignment_partitions_corpus(spark):
    emb, _ = make_emb(spark, n_twins=0)
    cents = train_ivf_centroids(emb, n_centroids=8)
    assigned = ivf_assign(emb, cents, "embedding", nprobe=1).select(
        F.col("cluster_ids")[0].alias("c")
    )
    sizes = {r["c"]: r["n"] for r in assigned.groupBy("c").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == 400  # every vector in exactly one list
    assert len(sizes) >= 6  # clusters actually used
    assert max(sizes.values()) < 400  # not all in one list


def test_ivf_centroids_deterministic(spark):
    emb, _ = make_emb(spark)
    c1 = train_ivf_centroids(emb, n_centroids=8)
    c2 = train_ivf_centroids(emb, n_centroids=8)
    assert np.array_equal(c1, c2)
