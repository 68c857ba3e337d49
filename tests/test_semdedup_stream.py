"""Incremental SemDeDup: drained verdicts match the batch operator
exactly when ids arrive in increasing order, cross-batch twins are
caught, and replays never change verdicts."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.similarity import (
    semdedup,
    train_ivf_centroids,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.semdedup_stage import (
    kept_vectors,
    semdedup_batch,
)

from test_semdedup import _corpus


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _tables(workdir):
    return ParquetTable(f"{workdir}/index"), ParquetTable(f"{workdir}/verdicts")


def test_drained_verdicts_match_batch_semdedup(spark, workdir):
    rows = sorted(_corpus(), key=lambda r: r[0])  # ids increase over batches
    df = _df(spark, rows)
    cents = train_ivf_centroids(df, n_centroids=4)
    idx_t, ver_t = _tables(workdir)
    thirds = [rows[i::3] for i in range(3)]
    # re-slice so batch b holds the b-th third BY ID ORDER
    n = len(rows)
    batches = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
    for b, chunk in enumerate(batches):
        semdedup_batch(_df(spark, chunk), idx_t, ver_t, cents, b, threshold=0.99)
    kept_stream = {r["vec_id"] for r in kept_vectors(spark, ver_t).collect()}
    kept_batch = {
        r["vec_id"]
        for r in semdedup(df, threshold=0.99, centroids=cents).collect()
    }
    assert kept_stream == kept_batch and len(kept_stream) > 0


def test_cross_batch_twin_is_dropped(spark, workdir):
    rs = np.random.RandomState(11)
    base = rs.randn(16) * 2
    rows0 = [(0, base), (1, rs.randn(16) * 2)]
    rows1 = [(100, base + rs.randn(16) * 1e-3)]  # twin of id 0, later batch
    df_all = _df(spark, rows0 + rows1)
    cents = train_ivf_centroids(df_all, n_centroids=2)
    idx_t, ver_t = _tables(workdir)
    semdedup_batch(_df(spark, rows0), idx_t, ver_t, cents, 0, threshold=0.99)
    semdedup_batch(_df(spark, rows1), idx_t, ver_t, cents, 1, threshold=0.99)
    v = {r["vec_id"]: r["dropped"] for r in ver_t.read(spark).collect()}
    assert v[0] is False and v[100] is True


def test_replay_is_idempotent(spark, workdir):
    rows = sorted(_corpus(twins=3), key=lambda r: r[0])
    df = _df(spark, rows)
    cents = train_ivf_centroids(df, n_centroids=4)
    idx_t, ver_t = _tables(workdir)
    half = len(rows) // 2
    semdedup_batch(_df(spark, rows[:half]), idx_t, ver_t, cents, 0, threshold=0.99)
    semdedup_batch(_df(spark, rows[half:]), idx_t, ver_t, cents, 1, threshold=0.99)
    before = sorted(
        map(tuple, ver_t.read(spark).select("vec_id", "dropped").collect())
    )
    # replay batch 1: the index join sees only strictly older rows, and
    # the idempotent append overwrites the same token — nothing changes.
    semdedup_batch(_df(spark, rows[half:]), idx_t, ver_t, cents, 1, threshold=0.99)
    after = sorted(
        map(tuple, ver_t.read(spark).select("vec_id", "dropped").collect())
    )
    assert after == before
