"""Seeded product-event generator — the engine's test-harness equivalent
of the reference's simulation producers (producer.scala:132-178,
producer.py:151-186): random v1/v2 Avro events, Kafka wire framing,
random 0-3 partition keys.

Differences, on purpose: deterministic seed, no sleeping, and an option
to inject exact duplicate eventIds (the reference relies on at-least-once
Kafka delivery to produce the duplicates its silver dedup removes —
SURVEY T7; tests need them deterministically).
"""

from __future__ import annotations

import random
import struct
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from ..avro.codec import encode
from ..schemas import COLORS, PRODUCT_IDS, PRODUCT_V1, PRODUCT_V2, SIZES, TYPES


@dataclass
class WireRecord:
    key: bytes
    value: bytes
    topic: str
    partition: int
    offset: int
    timestamp: datetime
    timestampType: int


def generate_events(
    n: int,
    seed: int = 42,
    v1_ratio: float = 0.3,
    duplicate_ratio: float = 0.0,
    base_ts: int = 1704067200,  # 2024-01-01T00:00:00Z
) -> list[dict]:
    """Random product events. ~v1_ratio of events are schema v1 (the MSK
    producer uses a 1/3 v1 2/3 v2 split, producer.scala:168-171). Each
    event dict carries a `_version` key (1|2) for the encoder."""
    rng = random.Random(seed)
    events: list[dict] = []
    for i in range(n):
        version = 1 if rng.random() < v1_ratio else 2
        ev = {
            "productId": rng.choice(PRODUCT_IDS),
            "eventId": str(uuid.UUID(int=rng.getrandbits(128))),
            "type": rng.choice(TYPES),
            "timestamp": base_ts + i * 60 + rng.randint(0, 59),
            "_version": version,
        }
        if version == 2:
            ev["size"] = rng.choice(SIZES)
            ev["color"] = rng.choice(COLORS)
        events.append(ev)
        if duplicate_ratio and rng.random() < duplicate_ratio:
            events.append(dict(ev))  # exact duplicate (same eventId)
    return events


def _confluent_frame(payload: bytes, schema_id: int) -> bytes:
    """[0x00 magic][4-byte BE schema id][payload] (ingest_raw.scala:99-100)."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def _glue_frame(payload: bytes, schema_uuid: uuid.UUID, compression: int = 0) -> bytes:
    """[version 3][compression][16-byte UUID][payload] (ingest.scala:33-45)."""
    return bytes([3, compression]) + schema_uuid.bytes + payload


# Stable fake Glue schema-version UUIDs for v1/v2 (any 16 bytes work; the
# demux treats the whole 18-byte header as an opaque key).
GLUE_UUIDS = {
    1: uuid.UUID(int=0x11111111111111111111111111111111),
    2: uuid.UUID(int=0x22222222222222222222222222222222),
}


def events_to_wire(
    events: list[dict],
    framing: str = "confluent",
    topic: str = "product-events",
    seed: int = 7,
    corrupt_offsets: set[int] | None = None,
    glue_compression: int = 0,
) -> list[WireRecord]:
    """Avro-encode + frame events into Kafka-source-shaped records.

    ``corrupt_offsets``: offsets whose Avro payload is truncated to
    exercise PERMISSIVE/FAILFAST handling (FIXTURES.md §A3).
    ``glue_compression``: 5 zlib-compresses glue-framed payloads (the
    Glue SerDe's optional codec; the reference can't read these —
    ingest.scala:33-45 treats the byte as opaque).
    """
    rng = random.Random(seed)
    out: list[WireRecord] = []
    for offset, ev in enumerate(events):
        version = ev["_version"]
        schema = PRODUCT_V1 if version == 1 else PRODUCT_V2
        record = {k: v for k, v in ev.items() if k != "_version"}
        payload = encode(record, schema)
        if corrupt_offsets and offset in corrupt_offsets:
            payload = payload[: max(1, len(payload) // 3)]
        if framing == "confluent":
            value = _confluent_frame(payload, version)
        elif framing == "glue":
            if glue_compression == 5:
                import zlib

                payload = zlib.compress(payload)
            value = _glue_frame(
                payload, GLUE_UUIDS[version], compression=glue_compression
            )
        else:
            raise ValueError(f"unknown framing {framing!r}")
        key = str(rng.randint(0, 3)).encode()  # producer.py:175
        out.append(
            WireRecord(
                key=key,
                value=value,
                topic=topic,
                partition=int(key),
                offset=offset,
                timestamp=datetime.fromtimestamp(
                    record["timestamp"], tz=timezone.utc
                ),
                timestampType=0,
            )
        )
    return out
