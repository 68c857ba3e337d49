"""IRLS logistic quality classifier (operators/linear_model.py
logistic_train/logistic_scores): agreement with a NumPy IRLS twin on
the same features (tolerance-pinned weights, sign-exact predictions),
separable-data sanity, and the held-out gate — the learned model must
not trail the closed-form centroid baseline."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.linear_model import (
    logistic_scores,
    logistic_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_irls(X, y, n_steps, l2):
    dimp1 = X.shape[1]
    w = np.zeros(dimp1)
    n = len(y)
    for _ in range(n_steps):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        s = p * (1.0 - p)
        grad = X.T @ (p - y) / n + l2 * w
        hess = (X * s[:, None]).T @ X / n + l2 * np.eye(dimp1)
        w = w + np.linalg.solve(hess, -grad)
    return w


def _corpus_parts(spark, dim=32):
    from databricks_end_to_end_streaming_spark.operators.vectorize import (
        hashed_tf_dense,
    )
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        weak_quality_labels,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    dense = hashed_tf_dense(d, dim=dim, normalize=False)
    labels = weak_quality_labels(d)
    return dense, labels, dim


def test_weights_match_numpy_twin(spark):
    dense, labels, dim = _corpus_parts(spark)
    train = labels.where(F.col("doc_id") % 2 == 0)
    w = logistic_train(
        dense.join(train.select("doc_id"), "doc_id", "leftsemi"),
        train,
        dim,
        n_steps=6,
        l2=1e-3,
    )
    rows = dense.join(train, "doc_id").collect()
    X = np.array([list(r["vec"]) + [1.0] for r in rows])
    y = np.array([r["lab"] for r in rows], dtype=float)
    want = _numpy_irls(X, y, n_steps=6, l2=1e-3)
    # float batch partials reduce in engine order: tolerance, not bits
    assert np.allclose(np.asarray(w), want, rtol=1e-8, atol=1e-10)
    # and the decisions the model exists to make are sign-exact
    got = {
        r["doc_id"]: r["predicted"]
        for r in logistic_scores(dense, w).collect()
    }
    all_rows = dense.collect()
    Xa = np.array([list(r["vec"]) + [1.0] for r in all_rows])
    ids = [r["doc_id"] for r in all_rows]
    twin_pred = (Xa @ want > 0).astype(int)
    assert got == {i: int(p) for i, p in zip(ids, twin_pred)}


def test_separable_data_is_fit_perfectly(spark):
    # y = 1 iff slot-0 count is high: linearly separable with margin
    rows = [(i, [float(3 + i % 2), 1.0], 1) for i in range(0, 20, 2)]
    rows += [(i, [float(-2 - i % 3), 2.0], 0) for i in range(1, 20, 2)]
    dense = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "doc_id long, vec array<double>"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, lab long"
    )
    w = logistic_train(dense, labels, dim=2, n_steps=8, l2=1e-3)
    got = {
        r["doc_id"]: r["predicted"]
        for r in logistic_scores(dense, w).collect()
    }
    assert got == {i: y for i, _, y in rows}


def test_heldout_logistic_not_below_centroid(spark):
    """The r9 gate: on the held-out half, the learned model's teacher
    agreement must be >= the closed-form centroid's (the verdict ask).
    Uses the registered query so the asserted numbers are the recorded
    ones."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        logistic_quality_eval,
    )

    row = logistic_quality_eval(spark, SF_DIR).first()
    assert row["n_eval"] > 0
    assert row["logistic_accuracy"] >= row["centroid_accuracy"], row
    # r10 ablation honesty: the hashed slots ALONE must beat a coin flip
    # by a wide margin (real signal), and cannot exceed the augmented
    # model that contains them plus the centroid margin
    assert row["ablation_accuracy"] >= 0.75, row
    assert row["ablation_accuracy"] <= row["logistic_accuracy"], row
