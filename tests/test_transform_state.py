"""transformWithStateInPandas: typed state accumulates across
availableNow drains (the Spark 4 successor to applyInPandasWithState)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyspark.sql.functions as F
import pytest

from databricks_end_to_end_streaming_spark.sources import generate_events
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.transform_state import (
    product_stats_tws,
    transform_with_state_available,
)

pytestmark = pytest.mark.skipif(
    not transform_with_state_available(),
    reason="transformWithState requires protobuf, absent in this container",
)


def write_events(spark, events, path):
    pdf = pd.DataFrame(
        [
            {"productId": e["productId"], "type": e["type"], "timestamp": e["timestamp"]}
            for e in events
        ]
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(path)


def test_tws_accumulates_across_drains(spark, workdir):
    schema = "productId string, type string, timestamp long"
    events_path = f"{workdir}/events"
    sink = ParquetTable(f"{workdir}/stats")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(events_path)
        (
            product_stats_tws(stream)
            .writeStream.foreachBatch(lambda b, _i: sink.append(b))
            .outputMode("update")
            .option("checkpointLocation", f"{workdir}/cp")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    first = generate_events(40, seed=61, v1_ratio=0.0)
    write_events(spark, first, events_path)
    run_once()

    second = generate_events(30, seed=62, v1_ratio=0.0, base_ts=1704067200 + 86400)
    write_events(spark, second, events_path)
    run_once()

    out = sink.read(spark)
    latest = {
        r["productId"]: r
        for r in out.groupBy("productId")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_epoch").alias("last_epoch"),
            F.max("n_types").alias("n_types"),
        )
        .collect()
    }
    both = first + second
    expected_counts = Counter(e["productId"] for e in both)
    for pid, n in expected_counts.items():
        assert latest[pid]["n_events"] == n
        assert latest[pid]["last_epoch"] == max(
            e["timestamp"] for e in both if e["productId"] == pid
        )
        assert latest[pid]["n_types"] == len(
            {e["type"] for e in both if e["productId"] == pid}
        )
