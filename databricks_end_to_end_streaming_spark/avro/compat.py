"""Avro schema-compatibility checking (the registry write-path gate).

The reference's producers register schemas with compatibility FULL —
the Glue CLI registration in /root/reference/notebooks/msk/
producer.scala:60-61 — so every schema evolution must stay both
backward- and forward-readable. This module implements the published
Avro schema-resolution rules (Avro spec, "Schema Resolution") for the
schema subset the engine's codec supports (records of primitives,
nullable unions, arrays, maps, enums, fixed), plus the Confluent-style
compatibility levels layered on top:

- BACKWARD: the NEW schema can read data written with the OLD one
  (consumers upgrade first).
- FORWARD: the OLD schema can read data written with the NEW one
  (producers upgrade first).
- FULL: both — the reference's registration mode.
- NONE: no constraint.

Pure-Python, schema-model level — used as the client-side pre-check by
``InMemorySchemaRegistry.register_schema`` and as the local mirror of
what Confluent's ``/compatibility`` endpoint and Glue's server-side
RegisterSchemaVersion status would decide, so tests can pin the gate
without a live registry.
"""

from __future__ import annotations

import json
from typing import Any

from .schema import RecordSchema

#: writer type -> reader types it may be promoted to (Avro spec:
#: "the writer's schema may be promoted to the reader's as follows").
_PROMOTIONS: dict[str, set[str]] = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}

LEVELS = ("BACKWARD", "FORWARD", "FULL", "NONE")


class IncompatibleSchemaError(ValueError):
    """A schema registration violates the configured compatibility
    level; ``.issues`` lists every resolution failure found."""

    def __init__(self, message: str, issues: list[str]):
        super().__init__(message)
        self.issues = issues


def _normalize(t: Any) -> Any:
    """Collapse ``{"type": "string"}`` wrappers to the bare primitive;
    leave records/enums/arrays/maps/fixed/unions as-is."""
    if isinstance(t, dict) and isinstance(t.get("type"), str):
        if t["type"] in ("record", "enum", "array", "map", "fixed"):
            return t
        if len(t) == 1 or set(t) <= {"type", "logicalType"}:
            return t["type"]
    return t


def _kind(t: Any) -> str:
    t = _normalize(t)
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        return t
    return t["type"]


def _resolve(writer: Any, reader: Any, path: str, issues: list[str]) -> None:
    """Append an issue for every way data written with ``writer`` could
    fail to deserialize under ``reader`` (Avro schema resolution)."""
    writer, reader = _normalize(writer), _normalize(reader)
    wk, rk = _kind(writer), _kind(reader)

    # union on the WRITER side: every branch the writer might emit must
    # be readable.
    if wk == "union":
        for branch in writer:
            _resolve(branch, reader, f"{path}<{_kind(branch)}>", issues)
        return
    # union on the READER side only: some branch must accept the writer.
    if rk == "union":
        for branch in reader:
            probe: list[str] = []
            _resolve(writer, branch, path, probe)
            if not probe:
                return
        issues.append(
            f"{path}: writer {wk} matches no branch of reader union "
            f"{[ _kind(b) for b in reader ]}"
        )
        return

    if wk != rk:
        if wk in _PROMOTIONS and rk in _PROMOTIONS[wk]:
            return
        issues.append(f"{path}: writer {wk} is not readable as {rk}")
        return

    if wk == "record":
        _resolve_record(writer, reader, path, issues)
    elif wk == "array":
        _resolve(writer["items"], reader["items"], f"{path}[]", issues)
    elif wk == "map":
        _resolve(writer["values"], reader["values"], f"{path}{{}}", issues)
    elif wk == "enum":
        if writer.get("name") != reader.get("name"):
            issues.append(
                f"{path}: enum name {writer.get('name')!r} != "
                f"{reader.get('name')!r}"
            )
        missing = set(writer.get("symbols", ())) - set(reader.get("symbols", ()))
        if missing and "default" not in reader:
            issues.append(
                f"{path}: writer enum symbols {sorted(missing)} absent "
                "from reader and reader has no enum default"
            )
    elif wk == "fixed":
        if writer.get("name") != reader.get("name") or writer.get(
            "size"
        ) != reader.get("size"):
            issues.append(
                f"{path}: fixed {writer.get('name')}({writer.get('size')}) "
                f"!= {reader.get('name')}({reader.get('size')})"
            )
    # same-kind primitives always resolve


def _as_record_dict(s: Any) -> dict:
    if isinstance(s, RecordSchema):
        return {
            "type": "record",
            "name": s.name,
            "fields": [
                (
                    {"name": f.name, "type": f.type, "default": f.default}
                    if f.has_default
                    else {"name": f.name, "type": f.type}
                )
                for f in s.fields
            ],
        }
    if isinstance(s, str):
        return json.loads(s)
    return s


def _resolve_record(
    writer: dict, reader: dict, path: str, issues: list[str]
) -> None:
    # Avro resolution requires matching record names (we model no
    # aliases); enums/fixed already enforce theirs, so records must too
    # — a silent rename would pass a gate the production registry
    # refuses.
    if writer.get("name") != reader.get("name"):
        issues.append(
            f"{path}: record name {writer.get('name')!r} != "
            f"{reader.get('name')!r}"
        )
    wfields = {f["name"]: f for f in writer.get("fields", ())}
    for rf in reader.get("fields", ()):
        fpath = f"{path}.{rf['name']}"
        wf = wfields.get(rf["name"])
        if wf is None:
            if "default" not in rf:
                issues.append(
                    f"{fpath}: absent from writer and reader declares "
                    "no default"
                )
            continue
        _resolve(wf["type"], rf["type"], fpath, issues)
    # writer-only fields are skipped by the reader: always fine


def can_read(writer: Any, reader: Any) -> list[str]:
    """Issues preventing data written with ``writer`` from being read
    with ``reader``; empty list = fully resolvable."""
    issues: list[str] = []
    w, r = _as_record_dict(writer), _as_record_dict(reader)
    _resolve(w, r, w.get("name", "record"), issues)
    return issues


def check_compatibility(
    new_schema: Any, old_schema: Any, level: str = "FULL"
) -> list[str]:
    """Issues the NEW schema has against the OLD one at ``level``
    (Confluent semantics; the reference registers with FULL)."""
    level = level.upper()
    if level not in LEVELS:
        raise ValueError(f"unknown compatibility level {level!r}; one of {LEVELS}")
    issues: list[str] = []
    if level in ("BACKWARD", "FULL"):
        issues += [
            f"BACKWARD: {i}" for i in can_read(old_schema, new_schema)
        ]
    if level in ("FORWARD", "FULL"):
        issues += [f"FORWARD: {i}" for i in can_read(new_schema, old_schema)]
    return issues


def assert_compatible(
    new_schema: Any, old_schema: Any, level: str = "FULL"
) -> None:
    issues = check_compatibility(new_schema, old_schema, level)
    if issues:
        raise IncompatibleSchemaError(
            f"schema fails {level} compatibility: {issues[0]}"
            + (f" (+{len(issues) - 1} more)" if len(issues) > 1 else ""),
            issues,
        )
