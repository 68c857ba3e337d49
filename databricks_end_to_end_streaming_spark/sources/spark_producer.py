"""Distributed wire-format producer: a Spark job that Avro-encodes event
rows and frames them for Kafka — the scale-out form of the reference's
driver-side producer loops (producer.scala:132-161, producer.py:113-149),
whose one-record-per-flush design caps at ~1 event/s (BASELINE.md).

On a Kafka-equipped cluster the output feeds `df.write.format("kafka")`
directly (key/value binary columns); in tests it feeds the same
file-topic the ingest demux reads, closing the loop producer -> wire ->
demux -> raw without leaving Spark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..avro.functions import encode_avro


def _be_int4(col: F.Column) -> F.Column:
    """int -> 4-byte big-endian binary (inverse of
    functions.binary.be_int_from_bytes), via hex/lpad/unhex built-ins."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


def to_confluent_wire(
    events: DataFrame,
    schema_id: int,
    schema_json: str | dict,
    topic: str = "product-events",
    n_partitions: int = 4,
) -> DataFrame:
    """Event rows -> Kafka-producer-shaped rows (key/value/topic/
    partition) with Confluent framing: [0x00][4-byte BE id][avro payload]
    (ingest_raw.scala:99-100). Keys spread 0..n-1 like producer.py:175,
    derived deterministically from eventId."""
    enc = encode_avro(events, schema_json, output_col="__payload")
    key_num = F.pmod(F.xxhash64("eventId"), F.lit(n_partitions))
    return enc.select(
        key_num.cast("string").cast("binary").alias("key"),
        F.concat(
            F.lit(bytes([0])), _be_int4(F.lit(schema_id)), F.col("__payload")
        ).alias("value"),
        F.lit(topic).alias("topic"),
        key_num.cast("int").alias("partition"),
    )


def to_glue_wire(
    events: DataFrame,
    schema_uuid: str,
    schema_json: str | dict,
    topic: str = "product-events",
    n_partitions: int = 4,
    compression: int = 0,
) -> DataFrame:
    """Event rows -> Kafka-producer-shaped rows with AWS Glue framing:
    [version 3][compression byte][16-byte schema-version UUID][avro
    payload] (ingest.scala:33-45) — the producer-side counterpart of the
    demux's Glue header slicing. ``schema_uuid`` is the 32-hex-char
    version id (dashes accepted). ``compression=5`` zlib-deflates each
    payload (Arrow-batched, mirroring the demux's ``_inflate_compressed``);
    0 stays entirely JVM-side."""
    uuid_hex = str(schema_uuid).replace("-", "").lower()
    if len(uuid_hex) != 32 or any(c not in "0123456789abcdef" for c in uuid_hex):
        raise ValueError(f"not a Glue schema-version uuid: {schema_uuid!r}")
    if compression not in (0, 5):
        raise ValueError(f"Glue compression byte must be 0 or 5, got {compression}")
    enc = encode_avro(events, schema_json, output_col="__payload")
    if compression == 5:
        import zlib
        from collections.abc import Iterator

        import pandas as pd

        schema = enc.schema

        def deflate(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for pdf in batches:
                pdf = pdf.copy()
                pdf["__payload"] = [
                    zlib.compress(bytes(p)) for p in pdf["__payload"]
                ]
                yield pdf

        enc = enc.mapInPandas(deflate, schema)
    key_num = F.pmod(F.xxhash64("eventId"), F.lit(n_partitions))
    header = F.concat(
        F.lit(bytes([3, compression])), F.unhex(F.lit(uuid_hex))
    )
    return enc.select(
        key_num.cast("string").cast("binary").alias("key"),
        F.concat(header, F.col("__payload")).alias("value"),
        F.lit(topic).alias("topic"),
        key_num.cast("int").alias("partition"),
    )


def register_and_wire(
    events: DataFrame,
    registry,
    subject: str,
    schema_json: str,
    topic: str = "product-events",
    n_partitions: int = 4,
) -> tuple[int, DataFrame]:
    """The reference producers' full handshake: REGISTER the schema
    (compatibility-gated — producer.scala:60-61 registers with FULL)
    and frame every event with the id the registry assigned, instead of
    trusting a caller-supplied id that may not match what consumers
    will resolve. One driver-side registration per job, amortized over
    every produced row. ``registry`` is anything with
    ``register_schema(subject, schema_json) -> id`` (InMemory,
    ConfluentRest); raises ``IncompatibleSchemaError`` before a single
    row is framed if the evolution violates the subject's level.
    Returns (assigned_id, wire_df)."""
    schema_id = registry.register_schema(subject, schema_json)
    return schema_id, to_confluent_wire(
        events, schema_id, schema_json, topic=topic, n_partitions=n_partitions
    )
