"""Registry WRITE paths against in-process HTTP stubs.

The reference's producers auto-register schemas — the Glue registration
with compatibility FULL in /root/reference/notebooks/msk/
producer.scala:60-61 — so the REST clients need a write path, not just
lookups. Covers the Confluent protocol (POST /subjects/{s}/versions,
POST /compatibility/.../latest pre-check, PUT /config/{s}) and the Glue
JSON protocol (RegisterSchemaVersion, CreateSchema bootstrap,
GetSchemaVersion PENDING-poll, FAILURE -> IncompatibleSchemaError).
No network access — stubs bind loopback ports.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from databricks_end_to_end_streaming_spark.avro.compat import (
    IncompatibleSchemaError,
)
from databricks_end_to_end_streaming_spark.registry import (
    ConfluentRestRegistry,
    GlueRestRegistry,
)

AVSC = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [{"name": "productId", "type": "string"}],
    }
)


# ---------------------------------------------------------------- Confluent
class _ConfluentStub(BaseHTTPRequestHandler):
    hits: list[tuple[str, str]] = []  # (method, path)
    bodies: list[dict] = []
    compat_response: bool | None = True  # None -> 404 (no versions yet)
    register_response: int | None = 7  # None -> 409 incompatible

    def _reply(self, code: int, payload: dict | None = None):
        self.send_response(code)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        if payload is not None:
            self.wfile.write(json.dumps(payload).encode())

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def do_POST(self):  # noqa: N802 (http.server API)
        _ConfluentStub.hits.append(("POST", self.path))
        _ConfluentStub.bodies.append(self._read_body())
        if self.path.startswith("/compatibility/subjects/"):
            if _ConfluentStub.compat_response is None:
                self._reply(
                    404, {"error_code": 40401, "message": "Subject not found"}
                )
            else:
                self._reply(
                    200, {"is_compatible": _ConfluentStub.compat_response}
                )
        elif self.path.endswith("/versions"):
            if _ConfluentStub.register_response is None:
                self._reply(
                    409,
                    {"error_code": 409, "message": "Incompatible schema"},
                )
            else:
                self._reply(200, {"id": _ConfluentStub.register_response})
        else:
            self._reply(404, {"error_code": 404, "message": "no route"})

    def do_PUT(self):  # noqa: N802
        _ConfluentStub.hits.append(("PUT", self.path))
        body = self._read_body()
        _ConfluentStub.bodies.append(body)
        if self.path.startswith("/config/"):
            self._reply(200, {"compatibility": body["compatibility"]})
        else:
            self._reply(404, {"error_code": 404, "message": "no route"})

    def log_message(self, *args):
        pass


@pytest.fixture()
def confluent_stub():
    _ConfluentStub.hits = []
    _ConfluentStub.bodies = []
    _ConfluentStub.compat_response = True
    _ConfluentStub.register_response = 7
    srv = HTTPServer(("127.0.0.1", 0), _ConfluentStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_confluent_register_runs_precheck_then_register(confluent_stub):
    reg = ConfluentRestRegistry(confluent_stub)
    assert reg.register_schema("product-value", AVSC) == 7
    paths = [p for _, p in _ConfluentStub.hits]
    assert paths == [
        "/compatibility/subjects/product-value/versions/latest",
        "/subjects/product-value/versions",
    ]
    assert _ConfluentStub.bodies[0] == {"schema": AVSC}
    # registered schema is cached for reads: no GET round-trip
    assert reg.get_schema_json(7) == AVSC
    assert len(_ConfluentStub.hits) == 2


def test_confluent_first_version_404_precheck_is_compatible(confluent_stub):
    _ConfluentStub.compat_response = None  # subject has no versions
    reg = ConfluentRestRegistry(confluent_stub)
    assert reg.register_schema("fresh-value", AVSC) == 7


def test_confluent_incompatible_precheck_blocks_before_mutation(confluent_stub):
    _ConfluentStub.compat_response = False
    reg = ConfluentRestRegistry(confluent_stub)
    with pytest.raises(IncompatibleSchemaError):
        reg.register_schema("product-value", AVSC)
    # the register endpoint was never reached
    assert all(not p.startswith("/subjects/") for _, p in _ConfluentStub.hits)


def test_confluent_server_409_maps_to_typed_error(confluent_stub):
    _ConfluentStub.register_response = None
    reg = ConfluentRestRegistry(confluent_stub)
    with pytest.raises(IncompatibleSchemaError):
        reg.register_schema("product-value", AVSC, check_compat=False)


def test_confluent_set_compatibility_puts_config(confluent_stub):
    reg = ConfluentRestRegistry(confluent_stub)
    assert reg.set_compatibility("product-value", "full") == "FULL"
    assert ("PUT", "/config/product-value") in _ConfluentStub.hits
    assert {"compatibility": "FULL"} in _ConfluentStub.bodies


def test_confluent_rejects_unknown_level(confluent_stub):
    reg = ConfluentRestRegistry(confluent_stub)
    with pytest.raises(ValueError, match="unknown compatibility level"):
        reg.set_compatibility("s", "SIDEWAYS")
    assert _ConfluentStub.hits == []


# ------------------------------------------------------------------- Glue
NEW_UUID = "11223344-5566-7788-99aa-bbccddeeff00"


class _GlueWriteStub(BaseHTTPRequestHandler):
    requests: list[dict] = []
    schema_exists = True
    #: Status sequence: RegisterSchemaVersion pops the first entry,
    #: each GetSchemaVersion poll pops the next.
    statuses: list[str] = ["AVAILABLE"]

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        target = self.headers.get("X-Amz-Target")
        _GlueWriteStub.requests.append({"target": target, "body": body})

        def reply(code, payload):
            out = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.end_headers()
            self.wfile.write(out)

        if target == "AWSGlue.RegisterSchemaVersion":
            if not _GlueWriteStub.schema_exists:
                reply(
                    400,
                    {
                        "__type": "EntityNotFoundException",
                        "Message": "Schema is not found.",
                    },
                )
                return
            reply(
                200,
                {
                    "SchemaVersionId": NEW_UUID,
                    "VersionNumber": 2,
                    "Status": _GlueWriteStub.statuses.pop(0),
                },
            )
        elif target == "AWSGlue.CreateSchema":
            _GlueWriteStub.schema_exists = True
            reply(
                200,
                {
                    "SchemaVersionId": NEW_UUID,
                    "SchemaVersionStatus": _GlueWriteStub.statuses.pop(0),
                    "Compatibility": body.get("Compatibility"),
                },
            )
        elif target == "AWSGlue.GetSchemaVersion":
            reply(
                200,
                {
                    "SchemaVersionId": body["SchemaVersionId"],
                    "SchemaDefinition": AVSC,
                    "Status": _GlueWriteStub.statuses.pop(0),
                },
            )
        else:
            reply(400, {"__type": "UnknownOperationException"})

    def log_message(self, *args):
        pass


@pytest.fixture()
def glue_write_stub():
    _GlueWriteStub.requests = []
    _GlueWriteStub.schema_exists = True
    _GlueWriteStub.statuses = ["AVAILABLE"]
    srv = HTTPServer(("127.0.0.1", 0), _GlueWriteStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_glue_register_existing_schema(glue_write_stub):
    reg = GlueRestRegistry(glue_write_stub)
    uuid = reg.register_schema("reg", "product", AVSC)
    assert uuid == NEW_UUID
    assert [r["target"] for r in _GlueWriteStub.requests] == [
        "AWSGlue.RegisterSchemaVersion"
    ]
    # registered definition cached for subsequent reads
    assert reg.get_schema_json(NEW_UUID) == AVSC
    assert len(_GlueWriteStub.requests) == 1


def test_glue_bootstrap_creates_schema_with_full(glue_write_stub):
    _GlueWriteStub.schema_exists = False
    reg = GlueRestRegistry(glue_write_stub)
    uuid = reg.register_schema("reg", "product", AVSC, compatibility="full")
    assert uuid == NEW_UUID
    targets = [r["target"] for r in _GlueWriteStub.requests]
    assert targets == [
        "AWSGlue.RegisterSchemaVersion",
        "AWSGlue.CreateSchema",
    ]
    create = _GlueWriteStub.requests[1]["body"]
    assert create["Compatibility"] == "FULL"
    assert create["DataFormat"] == "AVRO"
    assert create["RegistryId"] == {"RegistryName": "reg"}


def test_glue_pending_polls_until_available(glue_write_stub):
    _GlueWriteStub.statuses = ["PENDING", "PENDING", "AVAILABLE"]
    slept: list[float] = []
    reg = GlueRestRegistry(glue_write_stub)
    uuid = reg.register_schema(
        "reg", "product", AVSC, poll_interval_sec=0.25, sleep=slept.append
    )
    assert uuid == NEW_UUID
    assert slept == [0.25, 0.25]
    targets = [r["target"] for r in _GlueWriteStub.requests]
    assert targets == [
        "AWSGlue.RegisterSchemaVersion",
        "AWSGlue.GetSchemaVersion",
        "AWSGlue.GetSchemaVersion",
    ]


def test_glue_failure_status_is_incompatible(glue_write_stub):
    _GlueWriteStub.statuses = ["FAILURE"]
    reg = GlueRestRegistry(glue_write_stub)
    with pytest.raises(IncompatibleSchemaError, match="compatibility"):
        reg.register_schema("reg", "product", AVSC, sleep=lambda s: None)
    # a FAILURE version is never cached as readable
    with pytest.raises(KeyError):
        reg2_cache = reg._cache[NEW_UUID]  # noqa: F841


def test_glue_pending_exhausted_times_out(glue_write_stub):
    _GlueWriteStub.statuses = ["PENDING"] * 4
    reg = GlueRestRegistry(glue_write_stub)
    with pytest.raises(TimeoutError):
        reg.register_schema(
            "reg", "product", AVSC, poll_attempts=3, sleep=lambda s: None
        )
