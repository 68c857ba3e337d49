"""Schema registry abstraction.

The reference resolves schema ids against external registries — Confluent
Schema Registry over REST (ingest_raw.scala:40-51,128-131) and AWS Glue
Schema Registry (ingest.scala:91-100,133-136). The engine depends only on
this protocol; production would add an HTTP-backed implementation with
the same interface. Lookups happen on the DRIVER inside foreachBatch
(one per distinct schema id per micro-batch — SURVEY U2), never per-row,
so a REST round-trip there is amortized over the whole batch.
"""

from __future__ import annotations

import json
import os
from typing import Protocol

from .avro.schema import RecordSchema, parse_schema


class SchemaRegistry(Protocol):
    def get_schema(self, schema_id: int | str) -> RecordSchema:
        """Resolve a schema id (Confluent int / Glue UUID-hex) to a schema."""
        ...

    def get_schema_json(self, schema_id: int | str) -> str:
        """The raw .avsc JSON for a schema id."""
        ...


class InMemorySchemaRegistry:
    """Dict-backed registry: {schema_id: avsc-json-string}."""

    def __init__(self, schemas: dict[int | str, str]):
        self._schemas = dict(schemas)

    def register(self, schema_id: int | str, schema_json: str) -> None:
        self._schemas[schema_id] = schema_json

    def get_schema_json(self, schema_id: int | str) -> str:
        try:
            return self._schemas[schema_id]
        except KeyError:
            raise KeyError(f"schema id {schema_id!r} not in registry") from None

    def get_schema(self, schema_id: int | str) -> RecordSchema:
        return parse_schema(self.get_schema_json(schema_id))

    def ids(self) -> list[int | str]:
        return list(self._schemas)


class LocalFileSchemaRegistry(InMemorySchemaRegistry):
    """Registry seeded from a directory of versioned .avsc files
    (the repo's own schema/product-v1.avsc, product-v2.avsc pattern).

    File `<name>-v<K>.avsc` registers as id K — mirroring how the
    reference's producers register product v1/v2 and get sequential ids
    (producer.py:120-124).
    """

    def __init__(self, schema_dir: str):
        schemas: dict[int | str, str] = {}
        for fname in sorted(os.listdir(schema_dir)):
            if not fname.endswith(".avsc"):
                continue
            stem = fname[: -len(".avsc")]
            if "-v" in stem:
                schema_id: int | str = int(stem.rsplit("-v", 1)[1])
            else:
                schema_id = stem
            with open(os.path.join(schema_dir, fname)) as f:
                schemas[schema_id] = json.dumps(json.load(f))
        super().__init__(schemas)
