"""Streaming DSIR: drained partial logs score identically to the batch
dsir_scores, replays never double-add, and the prequential view scores
under the distribution as of each batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dq import dsir_scores
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.dsir import (
    dsir_scores_from_log,
    dsir_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tables(workdir):
    return ParquetTable(f"{workdir}/doctf"), ParquetTable(f"{workdir}/buckets")


def test_drained_stream_equals_batch_scores_bitwise(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    tf_t, b_t = _tables(workdir)
    stage = dsir_stage(tf_t, b_t, F.col("lang") == "en")
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores_from_log(spark, tf_t, b_t).collect()
    }
    want = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(docs, F.col("lang") == "en").collect()
    }
    assert got == want and len(got) > 0


def test_replay_does_not_double_add(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    tf_t, b_t = _tables(workdir)
    stage = dsir_stage(tf_t, b_t, F.col("lang") == "en")
    stage(docs.where(F.col("doc_id") % 2 == 0), 0)
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)
    before = sorted(
        map(tuple, dsir_scores_from_log(spark, tf_t, b_t).collect())
    )
    stage(docs.where(F.col("doc_id") % 2 == 0), 0)  # replay batch 0
    after = sorted(
        map(tuple, dsir_scores_from_log(spark, tf_t, b_t).collect())
    )
    assert after == before


def test_prequential_view_uses_distribution_as_of_batch(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    tf_t, b_t = _tables(workdir)
    stage = dsir_stage(tf_t, b_t, F.col("lang") == "en")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    stage(half_a, 0)
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)
    # scores as of batch 0 == one-shot batch scoring of just that half
    got0 = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores_from_log(spark, tf_t, b_t, up_to_batch=0).collect()
    }
    want0 = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(half_a, F.col("lang") == "en").collect()
    }
    assert got0 == want0
    # and the full view covers all docs with bigrams
    full = dsir_scores_from_log(spark, tf_t, b_t)
    assert full.count() > len(got0)
