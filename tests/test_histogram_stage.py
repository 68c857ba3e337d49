"""Incremental histogram-quantile stage (streaming/histogram_stage.py):
drained == batch bit-for-bit, slicing insensitivity (sum monoid),
replay idempotence, prequential as-of view, streaming wrapper."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.analytics import (
    histogram_quantile_rollup,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.histogram_stage import (
    histogram_report_from_log,
    histogram_sketch_stage,
    histogram_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_drained_stream_equals_batch(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/hist")
    stage = histogram_stage(t)
    for i in range(3):
        stage(ev.where(F.col("event_id") % 3 == i), i)
    got = _rows(histogram_report_from_log(spark, t))
    want = _rows(histogram_quantile_rollup(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_slicing_insensitive(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t1, t2 = ParquetTable(f"{workdir}/h1"), ParquetTable(f"{workdir}/h2")
    s1, s2 = histogram_stage(t1), histogram_stage(t2)
    for i in range(2):
        s1(ev.where(F.col("event_id") % 2 == i), i)
    for i in range(5):
        s2(ev.where(F.col("user_id") % 5 == i), i)
    assert _rows(histogram_report_from_log(spark, t1)) == _rows(
        histogram_report_from_log(spark, t2)
    )


def test_replay_is_idempotent(spark, workdir):
    """The count-sum partial is NOT idempotent under double-append (a
    replayed batch would double its bins) — replay safety must come
    from the token'd idempotent_append protocol, which this pins."""
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/hist")
    stage = histogram_stage(t)
    stage(ev.where(F.col("event_id") % 2 == 0), 0)
    stage(ev.where(F.col("event_id") % 2 == 1), 1)
    before = _rows(histogram_report_from_log(spark, t))
    stage(ev.where(F.col("event_id") % 2 == 1), 1)  # replay batch 1
    assert _rows(histogram_report_from_log(spark, t)) == before


def test_prequential_view(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/hist")
    stage = histogram_stage(t)
    stage(ev.where(F.col("user_id") % 2 == 0), 0)
    stage(ev.where(F.col("user_id") % 2 == 1), 1)
    t0 = ParquetTable(f"{workdir}/only0")
    histogram_stage(t0)(ev.where(F.col("user_id") % 2 == 0), 0)
    asof0 = _rows(histogram_report_from_log(spark, t, up_to_batch=0))
    assert asof0 == _rows(histogram_report_from_log(spark, t0))
    assert asof0 != _rows(histogram_report_from_log(spark, t))


def test_streaming_wrapper(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    src = f"{workdir}/src"
    ev.write.parquet(src)
    source = spark.readStream.schema(ev.schema).parquet(src)
    t = ParquetTable(f"{workdir}/hist")
    histogram_sketch_stage(source, t, checkpoint=f"{workdir}/cp")
    got = _rows(histogram_report_from_log(spark, t))
    want = _rows(histogram_quantile_rollup(spark, SF_DIR))
    assert got == want and len(got) > 0
