"""Failure-path behavior: unknown schema ids, bad modes, registry
lookups — errors must surface with actionable messages, not corrupt
output."""

from __future__ import annotations

import pytest

from databricks_end_to_end_streaming_spark.avro.functions import decode_avro
from databricks_end_to_end_streaming_spark.registry import (
    InMemorySchemaRegistry,
    LocalFileSchemaRegistry,
)
from databricks_end_to_end_streaming_spark.schemas import PRODUCT_V1_JSON
from databricks_end_to_end_streaming_spark.sources import (
    events_to_wire,
    file_stream,
    generate_events,
    write_topic_files,
)
from databricks_end_to_end_streaming_spark.streaming import (
    ParquetTable,
    ingest_avro_stream,
)


def test_unknown_schema_id_fails_ingest(spark, workdir):
    """v2 events against a registry that only knows v1: the demux's
    driver-side lookup raises KeyError naming the id (U2 failure path)."""
    events = generate_events(10, seed=51, v1_ratio=0.0)  # all v2
    write_topic_files(spark, events_to_wire(events), f"{workdir}/topic")
    v1_only = InMemorySchemaRegistry({1: PRODUCT_V1_JSON})
    raw = ParquetTable(f"{workdir}/raw")
    with pytest.raises(Exception, match="2"):
        ingest_avro_stream(
            file_stream(spark, f"{workdir}/topic"),
            v1_only,
            raw,
            checkpoint=f"{workdir}/cp",
        )


def test_decode_avro_rejects_bad_mode(spark):
    df = spark.createDataFrame([(b"\x00",)], "payload binary")
    with pytest.raises(ValueError, match="PERMISSIVE or FAILFAST"):
        decode_avro(df, "payload", PRODUCT_V1_JSON, mode="DROPMALFORMED")


def test_registry_missing_id_message():
    reg = InMemorySchemaRegistry({1: PRODUCT_V1_JSON})
    with pytest.raises(KeyError, match="not in registry"):
        reg.get_schema_json(99)


def test_local_file_registry_versioned_ids(tmp_path):
    (tmp_path / "product-v1.avsc").write_text(PRODUCT_V1_JSON)
    (tmp_path / "product-v2.avsc").write_text(PRODUCT_V1_JSON)
    (tmp_path / "other.avsc").write_text(PRODUCT_V1_JSON)
    reg = LocalFileSchemaRegistry(str(tmp_path))
    assert set(reg.ids()) == {1, 2, "other"}
    assert reg.get_schema(1).name == "productEvent"


def test_rate_source_streams_through_transform(spark, workdir):
    """The built-in rate source (no external jar) drives a live
    continuous stream through a projection into a sink — the smallest
    proof that transforms are source-agnostic."""
    import pyspark.sql.functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("value") % 3).cast("string").alias("type"),
            F.col("timestamp"),
        )
    )
    sink = ParquetTable(f"{workdir}/rate_out")
    q = (
        rate.writeStream.foreachBatch(lambda b, _i: sink.append(b))
        .option("checkpointLocation", f"{workdir}/cp")
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            q.processAllAvailable()
            if sink.exists() and sink.read(spark).count() > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    out = sink.read(spark)
    assert out.count() > 0
    assert set(out.columns) == {"event_id", "type", "timestamp"}
