"""ConfluentRestRegistry against an in-process HTTP stub server.

Exercises the REST protocol shape the reference resolves schemas through
(GET /schemas/ids/{id} -> {"schema": ...}, ingest_raw.scala:40-51):
success, 404 -> KeyError, basic-auth header, and per-id caching. No
network access — the stub binds a loopback port.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from databricks_end_to_end_streaming_spark.registry import ConfluentRestRegistry

V1 = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [
            {"name": "productId", "type": "string"},
            {"name": "timestamp", "type": "long"},
        ],
    }
)


class _Stub(BaseHTTPRequestHandler):
    hits: list[str] = []
    auth_seen: list[str | None] = []

    def do_GET(self):  # noqa: N802 (http.server API)
        _Stub.hits.append(self.path)
        _Stub.auth_seen.append(self.headers.get("Authorization"))
        if self.path == "/schemas/ids/1":
            body = json.dumps({"schema": V1}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b'{"error_code": 40403, "message": "Schema not found"}')

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def stub_server():
    _Stub.hits = []
    _Stub.auth_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_rest_registry_resolves_and_parses(stub_server):
    reg = ConfluentRestRegistry(stub_server)
    schema = reg.get_schema(1)
    assert schema.name == "product"
    assert [f.name for f in schema.fields] == ["productId", "timestamp"]
    assert json.loads(reg.get_schema_json(1)) == json.loads(V1)


def test_rest_registry_caches_per_id(stub_server):
    reg = ConfluentRestRegistry(stub_server)
    for _ in range(3):
        reg.get_schema_json(1)
    assert _Stub.hits.count("/schemas/ids/1") == 1


def test_rest_registry_404_is_keyerror(stub_server):
    reg = ConfluentRestRegistry(stub_server)
    with pytest.raises(KeyError, match="99"):
        reg.get_schema_json(99)


def test_rest_registry_basic_auth_header(stub_server):
    reg = ConfluentRestRegistry(stub_server, auth_user_info="key:secret")
    reg.get_schema_json(1)
    import base64

    expected = "Basic " + base64.b64encode(b"key:secret").decode()
    assert _Stub.auth_seen[-1] == expected


def test_rest_registry_quotes_weird_ids(stub_server):
    """Glue-style string ids may contain '/', '?', '#', spaces — the
    client must percent-encode them so they stay one path segment (a 404
    -> KeyError) instead of malforming the request."""
    import pytest

    reg = ConfluentRestRegistry(stub_server)
    for weird in ("a/b", "x?y=1", "p#q", "with space"):
        with pytest.raises(KeyError):
            reg.get_schema_json(weird)
    # each request stayed a single quoted path segment
    weird_hits = [h for h in _Stub.hits if h.startswith("/schemas/ids/a%2Fb")]
    assert weird_hits


class _FlakyStub(BaseHTTPRequestHandler):
    """503s for the first N requests per path, then serves schema 1."""

    fail_first: int = 2
    hits: list[str] = []

    def do_GET(self):  # noqa: N802
        _FlakyStub.hits.append(self.path)
        n_prior = _FlakyStub.hits.count(self.path) - 1
        if n_prior < _FlakyStub.fail_first:
            self.send_response(503)
            self.end_headers()
            self.wfile.write(b"try later")
        elif self.path == "/schemas/ids/1":
            body = json.dumps({"schema": V1}).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"{}")

    def log_message(self, *args):
        pass


@pytest.fixture()
def flaky_server():
    _FlakyStub.hits = []
    srv = HTTPServer(("127.0.0.1", 0), _FlakyStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_transient_5xx_is_retried_through(flaky_server):
    """Two 503s then success: the client absorbs the blips instead of
    failing the whole foreachBatch micro-batch."""
    reg = ConfluentRestRegistry(flaky_server, retry_backoff_sec=0.01)
    assert json.loads(reg.get_schema_json(1)) == json.loads(V1)
    assert _FlakyStub.hits.count("/schemas/ids/1") == 3


def test_retries_exhausted_raises_the_5xx(flaky_server):
    import urllib.error

    _FlakyStub.fail_first = 10
    try:
        reg = ConfluentRestRegistry(
            flaky_server, retry_attempts=2, retry_backoff_sec=0.01
        )
        with pytest.raises(urllib.error.HTTPError):
            reg.get_schema_json(1)
        assert _FlakyStub.hits.count("/schemas/ids/1") == 2
    finally:
        _FlakyStub.fail_first = 2


def test_404_is_never_retried(stub_server):
    reg = ConfluentRestRegistry(stub_server, retry_backoff_sec=0.01)
    with pytest.raises(KeyError):
        reg.get_schema_json(42)
    assert _Stub.hits.count("/schemas/ids/42") == 1


def test_backoff_schedule_is_exponential():
    """Unit-level: the helper sleeps 0 times on first-try success and
    doubles the delay per retry; sleep is injected so no real waiting."""
    import urllib.error

    from databricks_end_to_end_streaming_spark.registry import _open_with_retries

    slept: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise urllib.error.URLError("conn reset")
        return "ok"

    out = _open_with_retries(
        flaky, attempts=4, backoff_sec=0.5, sleep=slept.append
    )
    assert out == "ok"
    assert slept == [0.5, 1.0]
