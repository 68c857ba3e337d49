"""GlueRestRegistry against an in-process HTTP stub speaking the public
Glue JSON protocol (POST / + X-Amz-Target: AWSGlue.GetSchemaVersion ->
{"SchemaDefinition": ...}) — the lookup the reference's deserialization
facade performs per distinct schema header (ingest.scala:91-100).
Covers: uuid canonicalization from the 32-hex wire form, success,
EntityNotFoundException -> KeyError, caching, and SigV4 header shape.
No network access — the stub binds a loopback port."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from databricks_end_to_end_streaming_spark.registry import GlueRestRegistry

UUID = "0f1e2d3c-4b5a-6978-8796-a5b4c3d2e1f0"
AVSC = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [{"name": "productId", "type": "string"}],
    }
)


class _GlueStub(BaseHTTPRequestHandler):
    requests: list[dict] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _GlueStub.requests.append(
            {
                "path": self.path,
                "target": self.headers.get("X-Amz-Target"),
                "auth": self.headers.get("Authorization"),
                "body": body,
            }
        )
        if body.get("SchemaVersionId") == UUID:
            out = json.dumps(
                {
                    "SchemaVersionId": UUID,
                    "SchemaDefinition": AVSC,
                    "DataFormat": "AVRO",
                    "Status": "AVAILABLE",
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.end_headers()
            self.wfile.write(out)
        else:
            self.send_response(400)
            self.end_headers()
            self.wfile.write(
                b'{"__type": "EntityNotFoundException",'
                b' "Message": "Schema version is not found."}'
            )

    def log_message(self, *args):
        pass


@pytest.fixture()
def glue_stub():
    _GlueStub.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _GlueStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_glue_registry_resolves_wire_hex(glue_stub):
    reg = GlueRestRegistry(glue_stub)
    # the demux key is the 32-hex slice of the wire header (no dashes)
    schema = reg.get_schema(UUID.replace("-", ""))
    assert schema.name == "product"
    req = _GlueStub.requests[-1]
    assert req["target"] == "AWSGlue.GetSchemaVersion"
    assert req["body"] == {"SchemaVersionId": UUID}


def test_glue_registry_caches_per_uuid(glue_stub):
    reg = GlueRestRegistry(glue_stub)
    reg.get_schema_json(UUID)
    reg.get_schema_json(UUID.replace("-", "").upper())  # same id, other form
    assert len(_GlueStub.requests) == 1


def test_glue_registry_unknown_uuid_is_keyerror(glue_stub):
    reg = GlueRestRegistry(glue_stub)
    with pytest.raises(KeyError):
        reg.get_schema_json("0" * 32)


def test_glue_registry_rejects_non_uuid():
    reg = GlueRestRegistry("http://unused.invalid")
    with pytest.raises(ValueError):
        reg.get_schema_json("not-a-uuid")


def test_glue_registry_sigv4_header_shape(glue_stub):
    reg = GlueRestRegistry(
        glue_stub,
        region="eu-west-1",
        access_key="AKIDEXAMPLE",
        secret_key="secret",
        session_token="tok",
    )
    reg.get_schema_json(UUID)
    auth = _GlueStub.requests[-1]["auth"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
    assert "/eu-west-1/glue/aws4_request" in auth
    assert "SignedHeaders=" in auth and "Signature=" in auth
