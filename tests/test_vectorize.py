"""Feature-hashing vectorizer: dense packing agrees with the sparse
relation, identical texts give identical unit vectors, and the dense
output composes with the cosine/SemDeDup operators."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.vectorize import (
    hashed_tf_dense,
    hashed_tf_sparse,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dense_matches_sparse_and_normalizes(spark):
    d = _docs(spark, ["the cat sat on the mat", "a completely different text"])
    sparse = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_tf_sparse(d, dim=32).collect()
    }
    dense = {
        r["doc_id"]: r["vec"]
        for r in hashed_tf_dense(d, dim=32, normalize=False).collect()
    }
    for (doc, b), w in sparse.items():
        assert dense[doc][b] == float(w)
    for doc, vec in dense.items():
        nz = {b for b in range(32) if vec[b] != 0.0}
        assert nz == {b for (dd, b), w in sparse.items() if dd == doc and w != 0}
    unit = hashed_tf_dense(d, dim=32).collect()
    for r in unit:
        assert abs(np.linalg.norm(r["vec"]) - 1.0) < 1e-12


def test_identical_texts_cosine_one_distinct_texts_below(spark):
    from databricks_end_to_end_streaming_spark.queries.similarity import cosine

    d = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",
            "zeta eta theta iota kappa lambda",
        ],
    )
    vecs = hashed_tf_dense(d, dim=64)
    a = vecs.alias("a").where(F.col("doc_id") == 0).select(F.col("vec").alias("va"))
    pairs = (
        a.crossJoin(vecs.alias("b"))
        .select(F.col("b.doc_id").alias("doc_id"), cosine("va", "vec").alias("c"))
        .collect()
    )
    c = {r["doc_id"]: r["c"] for r in pairs}
    assert math.isclose(c[1], 1.0, abs_tol=1e-12)
    assert c[2] < 0.9


def test_dense_vectors_feed_semdedup(spark):
    from databricks_end_to_end_streaming_spark.operators.similarity import semdedup

    texts = ["doc one about sparks and rivers"] * 2 + [
        "an unrelated essay on topology",
        "yet another unrelated subject entirely",
    ]
    d = _docs(spark, texts)
    emb = hashed_tf_dense(d, dim=64).select(
        F.col("doc_id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    kept = {
        r["vec_id"]
        for r in semdedup(emb, threshold=0.999, n_centroids=2).collect()
    }
    assert 1 not in kept  # exact duplicate text dropped
    assert {0, 2, 3} <= kept
