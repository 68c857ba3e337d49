"""ProgressLogListener (streaming/listener.py): per-batch query-health
rows captured from the live listener bus, cross-checked against the
query's own recentProgress, and flushed to a metrics table."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.listener import (
    attach_progress_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_listener_records_batches_and_flushes(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    ev.write.parquet(f"{workdir}/src")
    source = spark.readStream.schema(ev.schema).parquet(f"{workdir}/src")

    listener = attach_progress_log(spark)
    try:
        q = (
            source.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", f"{workdir}/cp")
            .queryName("listener_probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        want = {
            (p["batchId"], p["numInputRows"])
            for p in q.recentProgress
        }
        # the listener bus is async: give it a beat to drain
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline:
            got = {
                (r[2], r[4])
                for r in listener.snapshot()
                if r[0] == "listener_probe"
            }
            if want <= got:
                break
            time.sleep(0.2)
        assert want <= got and len(want) >= 1
        # stateful agg: state rows surfaced
        rows = [r for r in listener.snapshot() if r[0] == "listener_probe"]
        assert any(r[8] > 0 for r in rows)  # state_rows_total
        assert all(r[7] >= 0 for r in rows)  # trigger_duration_ms

        # relation + flush
        df = listener.to_df(spark)
        assert df.where(F.col("query_name") == "listener_probe").count() >= 1
        metrics = ParquetTable(f"{workdir}/metrics")
        n = listener.flush(spark, metrics)
        assert n >= 1
        assert metrics.read(spark).count() == n
        assert listener.flush(spark, metrics) == 0  # buffer cleared
    finally:
        spark.streams.removeListener(listener)
