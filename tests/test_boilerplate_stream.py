"""Incremental boilerplate monitor (streaming/boilerplate.py): drained
prefix-count partials elect the same winners as the batch query, replays
never double-count, and the prequential view tracks share drift."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.text import (
    boilerplate_prefix_detection,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.boilerplate import (
    boilerplate_from_log,
    boilerplate_monitor_stage,
    boilerplate_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.source, r.top_prefix, r.n_docs_with_prefix, r.n_docs, r.prefix_share)
        for r in df.collect()
    )


def test_drained_stream_equals_batch_report(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/prefixes")
    stage = boilerplate_stage(t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    assert _rows(boilerplate_from_log(spark, t)) == _rows(
        boilerplate_prefix_detection(spark, SF_DIR)
    )


def test_replay_idempotent_and_drift_view(spark, workdir):
    t = ParquetTable(f"{workdir}/prefixes")
    stage = boilerplate_stage(t)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(i, f"organic words {i}", "en", "srcX", 10) for i in range(4)], schema
    )
    # the source starts injecting a banner in batch 1
    b1 = spark.createDataFrame(
        [(10 + i, "accept all cookies please", "en", "srcX", 10) for i in range(6)],
        schema,
    )
    stage(b0, 0)
    stage(b1, 1)
    before = _rows(boilerplate_from_log(spark, t))
    stage(b1, 1)  # replay
    assert _rows(boilerplate_from_log(spark, t)) == before
    # drift: as of batch 0 no banner; after batch 1 the banner wins
    asof0 = {r.source: r for r in boilerplate_from_log(spark, t, up_to_batch=0).collect()}
    assert asof0["srcX"].n_docs_with_prefix == 1  # no repeated prefix yet
    now = {r.source: r for r in boilerplate_from_log(spark, t).collect()}
    assert now["srcX"].top_prefix == "accept all cookies"
    assert now["srcX"].prefix_share == 0.6


def test_streaming_wrapper(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src"
    docs.write.parquet(src)
    t = ParquetTable(f"{workdir}/prefixes")
    source = spark.readStream.schema(docs.schema).parquet(src)
    boilerplate_monitor_stage(source, t, f"{workdir}/ckpt")
    assert _rows(boilerplate_from_log(spark, t)) == _rows(
        boilerplate_prefix_detection(spark, SF_DIR)
    )
