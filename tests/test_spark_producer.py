"""Distributed producer round trip: Spark-side Avro encode + Confluent
framing -> the ingest demux decodes it back byte-identically."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.avro.codec import decode
from databricks_end_to_end_streaming_spark.avro.functions import encode_avro
from databricks_end_to_end_streaming_spark.functions.binary import (
    confluent_payload,
    confluent_schema_id,
)
from databricks_end_to_end_streaming_spark.schemas import PRODUCT_V2, PRODUCT_V2_JSON
from databricks_end_to_end_streaming_spark.sources.spark_producer import (
    to_confluent_wire,
)

ROWS = [
    ("prod-a1", "e-1", "shirt", 1704067200, "m", "red"),
    ("prod-b2", "e-2", "pants", 1704067260, "xl", "blue"),
    ("prod-c3", "e-3", "shoes", 1704067320, "s", "black"),
]
SCHEMA = "productId string, eventId string, type string, timestamp long, size string, color string"


def test_encode_avro_roundtrips_with_codec(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    enc = encode_avro(df, PRODUCT_V2_JSON).collect()
    for r in enc:
        rec = decode(bytes(r["payload"]), PRODUCT_V2)
        assert rec["eventId"] == r["eventId"]
        assert rec["size"] == r["size"] and rec["timestamp"] == r["timestamp"]


def test_spark_producer_wire_demuxes_back(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    wire = to_confluent_wire(df, schema_id=2, schema_json=PRODUCT_V2_JSON)
    got = wire.select(
        confluent_schema_id("value").alias("sid"),
        confluent_payload("value").alias("payload"),
        "key",
        "partition",
    ).collect()
    assert all(r["sid"] == 2 for r in got)
    decoded = {decode(bytes(r["payload"]), PRODUCT_V2)["eventId"] for r in got}
    assert decoded == {"e-1", "e-2", "e-3"}
    for r in got:  # key/partition agree (producer.py:175 semantics)
        assert int(bytes(r["key"]).decode()) == r["partition"]


def test_spark_producer_feeds_ingest_demux(spark, workdir):
    """Full loop: distributed producer -> topic files -> streaming demux
    -> raw table with intact values."""
    from databricks_end_to_end_streaming_spark.registry import InMemorySchemaRegistry
    from databricks_end_to_end_streaming_spark.sources import file_stream
    from databricks_end_to_end_streaming_spark.sources.files import WIRE_SCHEMA
    from databricks_end_to_end_streaming_spark.streaming import (
        ParquetTable,
        ingest_avro_stream,
    )

    df = spark.createDataFrame(ROWS, SCHEMA)
    wire = to_confluent_wire(df, schema_id=2, schema_json=PRODUCT_V2_JSON)
    full = (
        wire.withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0))
        .select(*[f.name for f in WIRE_SCHEMA.fields])
    )
    full.write.parquet(f"{workdir}/topic")

    raw = ParquetTable(f"{workdir}/raw")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        InMemorySchemaRegistry({2: PRODUCT_V2_JSON}),
        raw,
        checkpoint=f"{workdir}/cp",
    )
    flat = raw.read(spark).select("parsedValue.*").collect()
    assert {(r["eventId"], r["type"], r["color"]) for r in flat} == {
        (e[1], e[2], e[5]) for e in ROWS
    }


def test_register_and_wire_end_to_end(spark):
    """Producer handshake: register v1 then evolve to v2 under FULL; the
    assigned ids frame the wire bytes, and a consumer resolving THROUGH
    THE SAME REGISTRY decodes both generations (the auto-registration
    loop the reference's producers run, producer.scala:60-61)."""
    from databricks_end_to_end_streaming_spark.avro.compat import (
        IncompatibleSchemaError,
    )
    from databricks_end_to_end_streaming_spark.registry import (
        InMemorySchemaRegistry,
    )
    from databricks_end_to_end_streaming_spark.schemas import PRODUCT_V1_JSON
    from databricks_end_to_end_streaming_spark.sources.spark_producer import (
        register_and_wire,
    )

    reg = InMemorySchemaRegistry({})
    df = spark.createDataFrame(ROWS, SCHEMA)
    v1_events = df.select("productId", "eventId", "type", "timestamp")

    id1, wire1 = register_and_wire(v1_events, reg, "product-value", PRODUCT_V1_JSON)
    id2, wire2 = register_and_wire(df, reg, "product-value", PRODUCT_V2_JSON)
    assert id2 == id1 + 1
    # idempotent re-registration reuses the id
    id2b, _ = register_and_wire(df, reg, "product-value", PRODUCT_V2_JSON)
    assert id2b == id2

    for wire, want_id in ((wire1, id1), (wire2, id2)):
        got = wire.select(
            confluent_schema_id("value").alias("sid"),
            confluent_payload("value").alias("payload"),
        ).collect()
        assert all(r["sid"] == want_id for r in got)
        # consumer path: resolve the framed id via the registry
        schema_json = reg.get_schema_json(got[0]["sid"])
        decoded = {
            decode(bytes(r["payload"]), schema_json)["eventId"] for r in got
        }
        assert decoded == {"e-1", "e-2", "e-3"}

    # an incompatible evolution never frames a row
    import json as _json

    bad = _json.dumps(
        {
            "type": "record",
            "name": "product",
            "fields": [{"name": "productId", "type": "long"}],
        }
    )
    import pytest as _pytest

    with _pytest.raises(IncompatibleSchemaError):
        register_and_wire(df, reg, "product-value", bad)


def test_glue_wire_demuxes_back(spark):
    """Glue-framed producer output round-trips through the demux's own
    header slicers: version byte 3, compression byte, 16-byte UUID, and
    payload decode — both uncompressed and zlib (compression=5)."""
    import uuid as _uuid
    import zlib as _zlib

    from databricks_end_to_end_streaming_spark.functions.binary import (
        glue_compression,
        glue_payload,
        glue_schema_uuid,
    )
    from databricks_end_to_end_streaming_spark.sources.spark_producer import (
        to_glue_wire,
    )

    uid = _uuid.UUID(int=0x22222222222222222222222222222222)
    df = spark.createDataFrame(ROWS, SCHEMA)

    wire = to_glue_wire(df, uid.hex, PRODUCT_V2_JSON)
    got = wire.select(
        glue_schema_uuid("value").alias("uid"),
        glue_compression("value").alias("comp"),
        glue_payload("value").alias("payload"),
    ).collect()
    assert all(r["uid"] == uid.hex for r in got)
    assert all(r["comp"] == 0 for r in got)
    decoded = {
        decode(bytes(r["payload"]), PRODUCT_V2_JSON)["eventId"] for r in got
    }
    assert decoded == {"e-1", "e-2", "e-3"}

    # zlib path: compression byte 5, payload inflates back
    wz = to_glue_wire(df, str(uid), PRODUCT_V2_JSON, compression=5)
    gz = wz.select(
        glue_compression("value").alias("comp"),
        glue_payload("value").alias("payload"),
    ).collect()
    assert all(r["comp"] == 5 for r in gz)
    dz = {
        decode(_zlib.decompress(bytes(r["payload"])), PRODUCT_V2_JSON)["eventId"]
        for r in gz
    }
    assert dz == {"e-1", "e-2", "e-3"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="uuid"):
        to_glue_wire(df, "nope", PRODUCT_V2_JSON)
    with _pytest.raises(ValueError, match="compression"):
        to_glue_wire(df, uid.hex, PRODUCT_V2_JSON, compression=9)


def test_glue_wire_feeds_ingest_demux(spark, workdir):
    """Full Glue loop: distributed Glue-framed producer -> topic files ->
    streaming demux with glue framing -> raw table rows decode."""
    import uuid as _uuid

    from databricks_end_to_end_streaming_spark.registry import (
        InMemorySchemaRegistry,
    )
    from databricks_end_to_end_streaming_spark.sources import file_stream
    from databricks_end_to_end_streaming_spark.sources.spark_producer import (
        to_glue_wire,
    )
    from databricks_end_to_end_streaming_spark.streaming import (
        ParquetTable,
        ingest_avro_stream,
    )
    from databricks_end_to_end_streaming_spark.streaming.ingest import (
        glue_framing,
    )

    uid = _uuid.UUID(int=0x22222222222222222222222222222222)
    reg = InMemorySchemaRegistry({uid.hex: PRODUCT_V2_JSON})
    df = spark.createDataFrame(ROWS, SCHEMA)
    wire = to_glue_wire(df, uid.hex, PRODUCT_V2_JSON)
    (
        wire.withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0))
        .write.mode("append")
        .parquet(f"{workdir}/topic")
    )
    raw = ParquetTable(f"{workdir}/raw")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        reg,
        raw,
        checkpoint=f"{workdir}/cp",
        framing=glue_framing(),
    )
    out = raw.read(spark)
    assert out.count() == 3
