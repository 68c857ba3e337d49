"""Incremental burstiness (streaming/burstiness_stage.py): drained ==
batch bit-for-bit for any slicing, replay-idempotent."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.burstiness_stage import (
    burstiness_from_log,
    burstiness_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return [(r.token, r.df, r.total, r.fano) for r in df.collect()]


def test_drained_equals_batch_and_replay_idempotent(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/moments")
    stage = burstiness_stage(t)
    for bid in range(3):  # arbitrary slicing
        stage(docs.where(F.col("doc_id") % 3 == bid), bid)
    want = _rows(all_queries()["token_burstiness_topk"](spark, SF_DIR))
    assert _rows(burstiness_from_log(spark, t)) == want
    stage(docs.where(F.col("doc_id") % 3 == 2), 2)  # replay
    assert _rows(burstiness_from_log(spark, t)) == want
