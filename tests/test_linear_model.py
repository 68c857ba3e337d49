"""Closed-form nearest-centroid quality classifier
(operators/linear_model.py, queries/classifier.py): agreement with a
NumPy twin, generalization on planted classes, and the held-out
accuracy of the Gopher-rule distillation on the real corpus."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.linear_model import (
    centroid_bias,
    centroid_scores,
    centroid_stats,
    centroid_weights,
    class_counts,
)

DIM = 8


def _fit_numpy(X: np.ndarray, y: np.ndarray):
    c1 = X[y == 1].mean(axis=0)
    c0 = X[y == 0].mean(axis=0)
    w = c1 - c0
    bias = 0.5 * (c1 @ c1 - c0 @ c0)
    return w, bias


def _spark_parts(spark, X, y):
    feats = spark.createDataFrame(
        [
            (int(d), int(b), int(X[d, b]))
            for d in range(X.shape[0])
            for b in range(X.shape[1])
            if X[d, b] != 0
        ],
        "doc_id long, bucket long, weight long",
    )
    labels = spark.createDataFrame(
        [(int(d), int(v)) for d, v in enumerate(y)], "doc_id long, lab long"
    )
    stats = centroid_stats(feats, labels)
    counts = class_counts(labels)
    return feats, stats, counts


def test_matches_numpy_twin(spark):
    rng = np.random.default_rng(7)
    X = rng.integers(-5, 9, size=(40, DIM))
    y = (rng.random(40) < 0.4).astype(int)
    y[:2] = [0, 1]  # both classes guaranteed
    feats, stats, counts = _spark_parts(spark, X, y)
    weights = centroid_weights(stats, counts)
    bias = centroid_bias(stats, counts)
    got_w = {r["bucket"]: r["w"] for r in weights.collect()}
    got_bias = bias.collect()[0]["bias"]
    want_w, want_bias = _fit_numpy(X.astype(float), y)
    for b in range(DIM):
        assert math.isclose(got_w.get(b, 0.0), want_w[b], rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(got_bias, want_bias, rel_tol=1e-12, abs_tol=1e-12)
    got = {
        r["doc_id"]: (r["score"], r["predicted"])
        for r in centroid_scores(feats, weights, bias).collect()
    }
    want_scores = X.astype(float) @ want_w - want_bias
    assert set(got) == set(range(40))  # every doc has a nonzero bucket
    for d in range(40):
        s, p = got[d]
        assert math.isclose(s, want_scores[d], rel_tol=1e-9, abs_tol=1e-9)
        assert p == int(want_scores[d] > 0) or math.isclose(
            want_scores[d], 0.0, abs_tol=1e-9
        )


def test_separates_planted_classes_on_held_out_docs(spark):
    """Two planted distributions (disjoint dominant buckets); train on
    even ids only — odd ids must still classify to their planted
    class: the model generalizes, it does not memorize."""
    rng = np.random.default_rng(3)
    n = 60
    X = rng.integers(0, 3, size=(n, DIM))
    y = np.array([i % 3 == 0 for i in range(n)], dtype=int)
    X[y == 1, 0] += 20  # class-1 mass in bucket 0
    X[y == 0, 5] += 20  # class-0 mass in bucket 5
    feats, _, _ = _spark_parts(spark, X, y)
    even = F.col("doc_id") % 2 == 0
    labels = spark.createDataFrame(
        [(int(d), int(v)) for d, v in enumerate(y)], "doc_id long, lab long"
    )
    stats = centroid_stats(feats.where(even), labels.where(even))
    counts = class_counts(labels.where(even))
    weights = centroid_weights(stats, counts)
    bias = centroid_bias(stats, counts)
    pred = {
        r["doc_id"]: r["predicted"]
        for r in centroid_scores(feats, weights, bias).collect()
    }
    held_out = [d for d in range(n) if d % 2 == 1]
    assert all(pred[d] == y[d] for d in held_out)


def test_corpus_distillation_beats_chance(spark):
    """On the real documents table the classifier must reproduce its
    Gopher-rule teacher on the half it never saw — well above the
    majority-class rate (the corpus is ~55/45)."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        quality_classifier_eval,
    )

    row = quality_classifier_eval(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_eval"] > 0
    assert row["accuracy"] >= 0.8
    # both classes actually predicted (not a constant classifier)
    assert row["n_tp"] > 0 and row["n_tn"] > 0


def test_calibration_is_monotone_at_the_extremes(spark):
    """The top score-decile must be overwhelmingly teacher-pass and the
    bottom one overwhelmingly teacher-fail — the property that makes
    the score usable as a sampling weight, not just a sign."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        quality_classifier_calibration,
    )

    rows = {
        r["decile"]: r
        for r in quality_classifier_calibration(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == set(range(1, 11))
    assert rows[1]["teacher_pass_rate"] >= 0.9
    assert rows[10]["teacher_pass_rate"] <= 0.1
    assert rows[1]["min_score"] > rows[10]["max_score"]


def test_kappa_consistent_with_confusion_query(spark):
    """classifier_kappa_eval's kappa equals the fraction-cleared Cohen
    formula computed from quality_classifier_eval's confusion counts —
    EXACT float equality (both are one IEEE division of the same exact
    int64s), and the confusion counts themselves agree row-for-row."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        classifier_kappa_eval,
        quality_classifier_eval,
    )

    sf_dir = "/root/testdata/sf0.001"
    conf = quality_classifier_eval(spark, sf_dir).first()
    got = classifier_kappa_eval(spark, sf_dir).first()
    n, tp, fp, fn, tn = (
        conf["n_eval"],
        conf["n_tp"],
        conf["n_fp"],
        conf["n_fn"],
        conf["n_tn"],
    )
    assert (got["n_eval"], got["n_tp"], got["n_fp"], got["n_fn"],
            got["n_tn"]) == (n, tp, fp, fn, tn)
    pe_num = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    want = (n * (tp + tn) - pe_num) / (n * n - pe_num)
    assert got["kappa"] == want
    # chance-corrected: kappa must sit strictly below raw accuracy's
    # optimistic view whenever the label split is skewed and agreement
    # is imperfect
    assert -1.0 <= got["kappa"] <= 1.0


def test_kappa_planted_perfect_and_chance_agreement(spark):
    """Hand-computable confusion matrices through the same arithmetic:
    perfect agreement -> kappa 1; independence-shaped counts -> 0."""
    # perfect: tp=3, tn=2, fp=fn=0, n=5 -> po=1, kappa=1
    n, tp, fp, fn, tn = 5, 3, 0, 0, 2
    pe_num = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    assert (n * (tp + tn) - pe_num) / (n * n - pe_num) == 1.0
    # independent raters: counts = outer product (2x2 of 1,1,1,1)
    n, tp, fp, fn, tn = 4, 1, 1, 1, 1
    pe_num = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    assert (n * (tp + tn) - pe_num) / (n * n - pe_num) == 0.0
