"""Incremental classifier training (streaming/classifier_stage.py):
drained == batch-trained weights bit-for-bit, slicing insensitivity,
replay idempotence, and the prequential as-of view."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.classifier import (
    quality_classifier_weights,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.classifier_stage import (
    classifier_stage,
    classifier_weights_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_drained_stream_equals_batch_training(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/cls")
    stage = classifier_stage(t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    got = _rows(classifier_weights_from_log(spark, t))
    want = _rows(quality_classifier_weights(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_slicing_insensitive_and_replay_idempotent(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t1, t2 = ParquetTable(f"{workdir}/c1"), ParquetTable(f"{workdir}/c2")
    s1, s2 = classifier_stage(t1), classifier_stage(t2)
    for i in range(2):
        s1(docs.where(F.col("doc_id") % 2 == i), i)
    for i in range(5):
        s2(docs.where(F.col("doc_id") % 5 == i), i)
    s2(docs.where(F.col("doc_id") % 5 == 3), 3)  # replay
    assert _rows(classifier_weights_from_log(spark, t1)) == _rows(
        classifier_weights_from_log(spark, t2)
    )


def test_as_of_view_uses_only_early_batches(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/cls")
    stage = classifier_stage(t)
    stage(docs.where(F.col("doc_id") < 250), 0)
    stage(docs.where(F.col("doc_id") >= 250), 1)
    early = _rows(classifier_weights_from_log(spark, t, up_to_batch=0))
    t0 = ParquetTable(f"{workdir}/only0")
    classifier_stage(t0)(docs.where(F.col("doc_id") < 250), 0)
    assert early == _rows(classifier_weights_from_log(spark, t0))
    assert early != _rows(classifier_weights_from_log(spark, t))
