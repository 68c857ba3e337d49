"""SemDeDup (operators/similarity.semdedup) vs a sequential NumPy twin
on planted-twin corpora: identical kept sets, full recall on planted
semantic duplicates."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.operators.similarity import (
    semdedup,
    train_ivf_centroids,
)


def _corpus(n_clusters=4, per=12, dim=16, twins=6, seed=7):
    """Well-separated gaussian clusters + planted near-identical twins
    of the first `twins` vectors (ids offset by 1000)."""
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_clusters, dim) * 2
    rows = []
    for c in range(n_clusters):
        for j in range(per):
            v = centers[c] + rs.randn(dim) * 0.8
            rows.append((c * per + j, v))
    for t in range(twins):
        base = dict(rows)[t]
        rows.append((1000 + t, base + rs.randn(dim) * 1e-3))
    return rows


def _py_semdedup(rows, centroids, threshold):
    """Sequential twin: same nprobe=1 assignment (normalized argmax),
    same min-id drop rule, cosine in float64."""
    ids = np.array([i for i, _ in rows])
    x = np.array([v for _, v in rows], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign = (xn @ centroids.T).argmax(axis=1)
    dropped = set()
    order = np.argsort(ids)
    for ai in range(len(order)):
        for bi in range(ai + 1, len(order)):
            a, b = order[ai], order[bi]
            if assign[a] != assign[b]:
                continue
            cos = float(xn[a] @ xn[b])
            if cos >= threshold:
                dropped.add(int(ids[b]))
    return {int(i) for i in ids} - dropped


def test_semdedup_matches_sequential_twin_and_recalls_twins(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = train_ivf_centroids(df, n_centroids=4)
    kept = {
        r["vec_id"]
        for r in semdedup(df, threshold=0.99, centroids=cents).collect()
    }
    want = _py_semdedup(
        [(i, np.asarray(v, dtype=np.float32)) for i, v in rows], cents, 0.99
    )
    assert kept == want
    # every planted twin (id >= 1000) must be dropped: it is nearly
    # identical to its base vector, so they share a cluster and exceed
    # the threshold.
    assert all(i < 1000 for i in kept)
    # and no base vector is lost to a spurious near-dup.
    assert len(kept) == 4 * 12


def test_semdedup_keeps_everything_when_nothing_is_close(spark):
    rs = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rs.randn(16)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = semdedup(df, threshold=0.999, n_centroids=4)
    assert out.count() == 40
