"""Source builders: Kafka option-surface parity (S1/S2) and the wire
generator's reference semantics."""

from __future__ import annotations

import json
import struct
import uuid

from databricks_end_to_end_streaming_spark.sources.generator import (
    GLUE_UUIDS,
    events_to_wire,
    generate_events,
)
from databricks_end_to_end_streaming_spark.sources.kafka import kafka_options


def test_kafka_options_confluent_s1():
    """S1 (ingest_raw.scala:86-98): SASL_SSL + per-topic-per-partition
    startingOffsets JSON."""
    opts = kafka_options(
        "broker:9092",
        "product-events",
        starting_offsets={"product-events": {"0": 25}},
        sasl_jaas="org.apache.kafka.common.security.plain.PlainLoginModule required ...;",
    )
    assert opts["subscribe"] == "product-events"
    assert json.loads(opts["startingOffsets"]) == {"product-events": {"0": 25}}
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"


def test_kafka_options_msk_s2():
    """S2 (ingest.scala:54-61): plaintext, startingOffsets='latest'."""
    opts = kafka_options("msk:9092", "events")
    assert opts["startingOffsets"] == "latest"
    assert "kafka.security.protocol" not in opts


def test_generator_v1_ratio_and_duplicates():
    events = generate_events(400, seed=5, v1_ratio=0.3, duplicate_ratio=0.1)
    versions = [e["_version"] for e in events]
    frac_v1 = versions.count(1) / len(versions)
    assert 0.2 < frac_v1 < 0.4  # ~30% v1 (producer.scala:168-171)
    ids = [e["eventId"] for e in events]
    assert len(set(ids)) < len(ids)  # duplicates planted
    for e in events:
        if e["_version"] == 2:
            assert "size" in e and "color" in e
        else:
            assert "size" not in e


def test_confluent_wire_format_bytes():
    """[0x00][4-byte BE id][payload] (ingest_raw.scala:99-100)."""
    events = generate_events(5, seed=6, v1_ratio=0.0)
    recs = events_to_wire(events, framing="confluent")
    for r in recs:
        assert r.value[0] == 0
        assert struct.unpack(">I", r.value[1:5])[0] == 2  # schema id v2
        assert int(r.key.decode()) in range(4)  # producer.py:175 key spread
        assert r.partition == int(r.key.decode())


def test_glue_wire_format_bytes():
    """[3][compression][16-byte uuid][payload] (ingest.scala:33-45)."""
    events = generate_events(5, seed=7, v1_ratio=1.0)
    recs = events_to_wire(events, framing="glue")
    for r in recs:
        assert r.value[0] == 3 and r.value[1] == 0
        assert uuid.UUID(bytes=r.value[2:18]) == GLUE_UUIDS[1]
