"""Incremental covariance/PCA: the accumulated cell log equals the
one-shot batch statistics bit-for-bit (cells are exact int64 sums and
the finalizer is shared), refreshed components match, and replays never
double-add."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.pca import (
    covariance_stats,
    pca_components,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.gram import (
    covariance_from_log,
    gram_stage,
    pca_from_log,
)

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_drained_log_equals_batch_covariance_bitwise(spark, workdir):
    emb = _load(spark)
    t = ParquetTable(f"{workdir}/gram")
    stage = gram_stage(t)
    stage(emb.where(F.col("vec_id") % 3 == 0), 0)
    stage(emb.where(F.col("vec_id") % 3 == 1), 1)
    stage(emb.where(F.col("vec_id") % 3 == 2), 2)
    cov_s, mean_s, n_s = covariance_from_log(spark, t)
    cov_b, mean_b, n_b = covariance_stats(emb)
    assert n_s == n_b
    # int64 cells merge exactly; the shared finalizer then computes the
    # SAME float ops on the SAME integers -> identical bits
    assert (cov_s == cov_b).all()
    assert (mean_s == mean_b).all()
    w_s, mu_s = pca_from_log(spark, t, k=3)
    assert (w_s == pca_components(cov_b, 3)).all()
    assert (mu_s == mean_b).all()


def test_replay_does_not_double_add(spark, workdir):
    emb = _load(spark)
    t = ParquetTable(f"{workdir}/gram")
    stage = gram_stage(t)
    stage(emb.where(F.col("vec_id") % 2 == 0), 0)
    stage(emb.where(F.col("vec_id") % 2 == 1), 1)
    cov_before, mean_before, n_before = covariance_from_log(spark, t)
    stage(emb.where(F.col("vec_id") % 2 == 0), 0)  # replay batch 0
    cov_after, mean_after, n_after = covariance_from_log(spark, t)
    assert n_after == n_before
    assert (cov_after == cov_before).all()
    assert (mean_after == mean_before).all()


def test_prequential_view_excludes_later_batches(spark, workdir):
    emb = _load(spark)
    t = ParquetTable(f"{workdir}/gram")
    stage = gram_stage(t)
    first = emb.where(F.col("vec_id") < 100)
    stage(first, 0)
    stage(emb.where(F.col("vec_id") >= 100), 1)
    cov0, mean0, n0 = covariance_from_log(spark, t, up_to_batch=0)
    cov_b, mean_b, n_b = covariance_stats(first)
    assert n0 == n_b and (cov0 == cov_b).all() and (mean0 == mean_b).all()


def test_drift_between_logs_matches_batch_monitor(spark, workdir):
    """Two gram_stage logs fed by the vec_id-parity halves reproduce the
    batch embedding_snapshot_drift ranking bit-for-bit — drift between
    corpus snapshots never touches raw embeddings again."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.similarity import (
        embedding_snapshot_drift,
    )
    from databricks_end_to_end_streaming_spark.streaming.gram import (
        drift_between_logs,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    ta = ParquetTable(f"{workdir}/gram_a")
    tb = ParquetTable(f"{workdir}/gram_b")
    sa, sb = gram_stage(ta), gram_stage(tb)
    # each snapshot arrives in two batches: the fold must merge
    for i in range(2):
        sa(emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") % 4 == 2 * i)), i)
        sb(emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 4 == 2 * i + 1)), i)
    got = sorted(tuple(r) for r in drift_between_logs(spark, ta, tb).collect())
    want = sorted(tuple(r) for r in embedding_snapshot_drift(spark, sf).collect())
    assert got == want and len(got) > 0
