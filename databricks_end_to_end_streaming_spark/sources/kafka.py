"""Kafka streaming source builders with the reference's option surface.

S1 (Confluent, SASL_SSL + per-partition offsets — ingest_raw.scala:86-98)
and S2 (MSK plaintext, startingOffsets="latest" — ingest.scala:54-61).
This container has no Kafka connector jar or broker, so these builders
are exercised for option-construction in tests and executed only on a
real cluster; file_stream (files.py) is the drop-in test source with the
same output schema.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

# The Kafka source's fixed output schema (SURVEY §1.1) — file_stream
# produces the same columns so downstream code is source-agnostic.
KAFKA_SOURCE_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str | dict = "latest",
    sasl_jaas: str | None = None,
    extra_options: dict[str, str] | None = None,
) -> dict[str, str]:
    """The Kafka source option map (pure function, testable without the
    connector jar). ``starting_offsets`` accepts "latest"/"earliest" or a
    per-topic-per-partition dict like {"topic": {"0": 25}} (the reference
    passes the JSON form at ingest_raw.scala:92)."""
    if isinstance(starting_offsets, dict):
        starting_offsets = json.dumps(starting_offsets)
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if sasl_jaas:  # Confluent SASL_SSL surface (ingest_raw.scala:88-91)
        opts.update(
            {
                "kafka.security.protocol": "SASL_SSL",
                "kafka.sasl.mechanism": "PLAIN",
                "kafka.sasl.jaas.config": sasl_jaas,
            }
        )
    opts.update(extra_options or {})
    return opts


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str | dict = "latest",
    sasl_jaas: str | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """readStream from Kafka (requires the spark-sql-kafka package on the
    cluster; file_stream is the jar-free test stand-in)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(
        bootstrap_servers, topic, starting_offsets, sasl_jaas, extra_options
    ).items():
        reader = reader.option(k, v)
    return reader.load()
