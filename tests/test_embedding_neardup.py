"""embedding_cosine_neardup: LSH-bucketed vector near-dup must recover
planted twins without materializing the O(n^2) pair space."""

from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.operators.similarity import (
    lsh_neardup_pairs,
)


def test_bucketed_neardup_recovers_planted_twins(spark):
    rng = np.random.RandomState(21)
    n, dim = 300, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    twins = []
    for i in range(6):  # twin of vector i at index n+i, tiny perturbation
        twins.append((i, n + i))
        vecs = np.vstack([vecs, (vecs[i] + 0.01 * rng.standard_normal(dim)).astype(np.float32)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    found = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, threshold=0.95, n_bits=10, n_tables=6).collect()
    }
    assert set(twins) <= found  # every planted twin pair recovered
    # and no false positives: verify against numpy ground truth
    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, 0)
    truth = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if sims[i, j] > 0.95
    }
    assert found <= truth
