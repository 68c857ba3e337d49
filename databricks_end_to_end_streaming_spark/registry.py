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
import time
from collections.abc import Callable
from typing import Protocol

from .avro.schema import RecordSchema, parse_schema


def _open_with_retries(
    do_request: Callable[[], object],
    attempts: int = 3,
    backoff_sec: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
):
    """Run an HTTP request with exponential-backoff retries on TRANSIENT
    failures only: network-level URLError (connection refused/reset,
    DNS, timeout) and HTTP 429/5xx. Definitive answers — 2xx, 404,
    other 4xx — pass through on the first try, so "schema not found"
    is never retried into extra latency.

    Why here: lookups run on the DRIVER inside foreachBatch; without
    retries one registry blip fails the whole micro-batch and trips the
    stream's restart policy for what a 0.5 s backoff would have
    absorbed. Backoff doubles per attempt (0.5, 1, 2, ...); ``sleep``
    is injectable so tests assert the schedule without waiting."""
    import urllib.error

    last_err: Exception | None = None
    for attempt in range(attempts):
        if attempt:
            sleep(backoff_sec * (2 ** (attempt - 1)))
        try:
            return do_request()
        except urllib.error.HTTPError as e:
            if e.code == 429 or e.code >= 500:
                # drain the body so the stub/server connection can close
                e.read()
                last_err = e
                continue
            raise
        except urllib.error.URLError as e:
            last_err = e
            continue
    assert last_err is not None
    raise last_err


class SchemaRegistry(Protocol):
    def get_schema(self, schema_id: int | str) -> RecordSchema:
        """Resolve a schema id (Confluent int / Glue UUID-hex) to a schema."""
        ...

    def get_schema_json(self, schema_id: int | str) -> str:
        """The raw .avsc JSON for a schema id."""
        ...


class InMemorySchemaRegistry:
    """Dict-backed registry: {schema_id: avsc-json-string}.

    Also carries the WRITE path the reference's producers exercise —
    register-with-compatibility (producer.scala:60-61 registers with
    Glue compatibility FULL) — as the local twin of the REST clients'
    ``register_schema``: sequential int ids per subject, each new
    version gated by the Avro-resolution compatibility checker
    (``avro.compat``) against the subject's latest version.
    """

    def __init__(self, schemas: dict[int | str, str]):
        self._schemas = dict(schemas)
        self._subjects: dict[str, list[int | str]] = {}

    def register(self, schema_id: int | str, schema_json: str) -> None:
        self._schemas[schema_id] = schema_json

    def register_schema(
        self,
        subject: str,
        schema_json: str,
        compatibility: str = "FULL",
    ) -> int:
        """Register a new version under ``subject`` after checking it
        against the subject's LATEST version at ``compatibility``
        (BACKWARD/FORWARD/FULL/NONE). Returns the assigned id; an
        identical re-registration returns the existing id (idempotent,
        matching Confluent's behavior). Raises
        ``avro.compat.IncompatibleSchemaError`` on violation."""
        from .avro.compat import assert_compatible

        versions = self._subjects.setdefault(subject, [])
        canon = json.dumps(json.loads(schema_json), sort_keys=True)
        for vid in versions:
            if json.dumps(json.loads(self._schemas[vid]), sort_keys=True) == canon:
                return vid  # type: ignore[return-value]
        if versions and compatibility.upper() != "NONE":
            assert_compatible(
                schema_json, self._schemas[versions[-1]], compatibility
            )
        int_ids = [i for i in self._schemas if isinstance(i, int)]
        new_id = max(int_ids, default=0) + 1
        self._schemas[new_id] = schema_json
        versions.append(new_id)
        return new_id

    def get_schema_json(self, schema_id: int | str) -> str:
        try:
            return self._schemas[schema_id]
        except KeyError:
            raise KeyError(f"schema id {schema_id!r} not in registry") from None

    def get_schema(self, schema_id: int | str) -> RecordSchema:
        return parse_schema(self.get_schema_json(schema_id))

    def ids(self) -> list[int | str]:
        return list(self._schemas)


class ConfluentRestRegistry:
    """HTTP-backed registry speaking the Confluent Schema Registry REST
    protocol: ``GET {base_url}/schemas/ids/{id}`` returns
    ``{"schema": "<avsc json string>"}`` — the same endpoint the
    reference's RestService client resolves ids against
    (ingest_raw.scala:40-51,128-131).

    stdlib urllib only (no extra deps); per-id results are cached for
    the registry's lifetime, so each distinct schema id costs one REST
    round-trip per driver process — the foreachBatch demux already calls
    this once per distinct id per micro-batch (SURVEY U2), never per-row.
    Optional HTTP Basic auth mirrors Confluent's
    ``basic.auth.user.info`` credentials option.
    """

    def __init__(
        self,
        base_url: str,
        auth_user_info: str | None = None,
        timeout_sec: float = 10.0,
        retry_attempts: int = 3,
        retry_backoff_sec: float = 0.5,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout_sec = timeout_sec
        self.retry_attempts = retry_attempts
        self.retry_backoff_sec = retry_backoff_sec
        self._headers = {
            "Accept": "application/vnd.schemaregistry.v1+json, application/json"
        }
        if auth_user_info:
            import base64

            token = base64.b64encode(auth_user_info.encode()).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self._cache: dict[int | str, str] = {}

    def get_schema_json(self, schema_id: int | str) -> str:
        if schema_id in self._cache:
            return self._cache[schema_id]
        import urllib.error
        import urllib.parse
        import urllib.request

        # ids can be arbitrary strings (Glue-style); quote so '/', '?',
        # '#' or spaces can't malform the path or hit another endpoint.
        url = (
            f"{self.base_url}/schemas/ids/"
            f"{urllib.parse.quote(str(schema_id), safe='')}"
        )
        req = urllib.request.Request(url, headers=self._headers)

        def _do():
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))

        try:
            body = _open_with_retries(
                _do, self.retry_attempts, self.retry_backoff_sec
            )
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(f"schema id {schema_id!r} not in registry") from e
            raise
        schema_json = body["schema"]
        self._cache[schema_id] = schema_json
        return schema_json

    def get_schema(self, schema_id: int | str) -> RecordSchema:
        return parse_schema(self.get_schema_json(schema_id))

    # ---- write path (the reference's producers auto-register schemas;
    # ingest_raw.scala's RestService client exposes the same endpoints) --

    def _post_json(self, path: str, payload: dict) -> dict:
        import urllib.request

        body = json.dumps(payload).encode()
        headers = dict(self._headers)
        headers["Content-Type"] = "application/vnd.schemaregistry.v1+json"
        req = urllib.request.Request(
            f"{self.base_url}{path}", data=body, headers=headers, method="POST"
        )

        def _do():
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))

        return _open_with_retries(
            _do, self.retry_attempts, self.retry_backoff_sec
        )

    def check_compatibility(self, subject: str, schema_json: str) -> bool:
        """Server-side compatibility pre-check: ``POST
        /compatibility/subjects/{subject}/versions/latest``. A 404
        (subject has no versions yet) is compatible by definition —
        the first version has nothing to conflict with."""
        import urllib.error
        import urllib.parse

        try:
            body = self._post_json(
                "/compatibility/subjects/"
                f"{urllib.parse.quote(subject, safe='')}/versions/latest",
                {"schema": schema_json},
            )
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return True
            raise
        return bool(body.get("is_compatible"))

    def register_schema(
        self, subject: str, schema_json: str, check_compat: bool = True
    ) -> int:
        """Register a schema under ``subject`` (``POST
        /subjects/{subject}/versions`` -> ``{"id": N}``), optionally
        preceded by the compatibility pre-check so an incompatible
        evolution fails with a typed ``IncompatibleSchemaError`` BEFORE
        mutating the registry — the pre-flight the reference's FULL
        registration mode implies. The server still enforces its own
        configured level: a 409 on register also maps to
        ``IncompatibleSchemaError`` (pre-check disabled or racing)."""
        import urllib.error
        import urllib.parse

        from .avro.compat import IncompatibleSchemaError

        if check_compat and not self.check_compatibility(subject, schema_json):
            raise IncompatibleSchemaError(
                f"schema is incompatible with latest version of "
                f"subject {subject!r} (registry-side check)",
                [f"subject {subject}: is_compatible=false"],
            )
        try:
            body = self._post_json(
                f"/subjects/{urllib.parse.quote(subject, safe='')}/versions",
                {"schema": schema_json},
            )
        except urllib.error.HTTPError as e:
            if e.code == 409:
                raise IncompatibleSchemaError(
                    f"registry rejected schema for subject {subject!r} "
                    "as incompatible (HTTP 409)",
                    [f"subject {subject}: HTTP 409"],
                ) from e
            if e.code == 422:
                detail = e.read().decode("utf-8", "replace")
                raise ValueError(
                    f"registry rejected schema as invalid Avro: {detail}"
                ) from e
            raise
        new_id = int(body["id"])
        self._cache[new_id] = schema_json
        return new_id

    def set_compatibility(self, subject: str, level: str) -> str:
        """``PUT /config/{subject}`` — pin the subject's compatibility
        level (the reference registers with FULL)."""
        import urllib.parse
        import urllib.request

        from .avro.compat import LEVELS

        if level.upper() not in LEVELS:
            raise ValueError(f"unknown compatibility level {level!r}")
        body = json.dumps({"compatibility": level.upper()}).encode()
        headers = dict(self._headers)
        headers["Content-Type"] = "application/vnd.schemaregistry.v1+json"
        req = urllib.request.Request(
            f"{self.base_url}/config/{urllib.parse.quote(subject, safe='')}",
            data=body,
            headers=headers,
            method="PUT",
        )

        def _do():
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))

        out = _open_with_retries(
            _do, self.retry_attempts, self.retry_backoff_sec
        )
        return out["compatibility"]


class GlueRestRegistry:
    """HTTP client for the AWS Glue Schema Registry ``GetSchemaVersion``
    API — the lookup the reference's GlueSchemaRegistryDeserializationFacade
    performs per distinct schema header (ingest.scala:91-100,133-136).

    Speaks the public Glue JSON protocol: ``POST {endpoint}/`` with
    ``X-Amz-Target: AWSGlue.GetSchemaVersion`` and an x-amz-json-1.1 body
    ``{"SchemaVersionId": "<uuid>"}``; the response's
    ``SchemaDefinition`` is the .avsc JSON. Requests are SigV4-signed
    when credentials are supplied (stdlib hmac implementation of the
    published algorithm); unsigned otherwise, which is what the
    stub-server tests and sigv4-terminating proxies use.

    Ids are the schema-version UUIDs that ``functions.binary.
    glue_schema_uuid`` slices out of the 18-byte wire header (32 hex
    chars, accepted with or without dashes). Cached per id for the
    registry's lifetime — one REST round-trip per distinct id per driver
    process, called from foreachBatch demux (SURVEY U2), never per-row.
    """

    def __init__(
        self,
        endpoint: str,
        region: str = "us-east-1",
        access_key: str | None = None,
        secret_key: str | None = None,
        session_token: str | None = None,
        timeout_sec: float = 10.0,
        retry_attempts: int = 3,
        retry_backoff_sec: float = 0.5,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.session_token = session_token
        self.timeout_sec = timeout_sec
        self.retry_attempts = retry_attempts
        self.retry_backoff_sec = retry_backoff_sec
        self._cache: dict[str, str] = {}

    @staticmethod
    def _canonical_uuid(schema_id: int | str) -> str:
        s = str(schema_id).replace("-", "").lower()
        if len(s) != 32 or any(c not in "0123456789abcdef" for c in s):
            raise ValueError(f"not a Glue schema-version uuid: {schema_id!r}")
        return f"{s[0:8]}-{s[8:12]}-{s[12:16]}-{s[16:20]}-{s[20:32]}"

    def _sigv4_headers(self, body: bytes, amz_target: str) -> dict[str, str]:
        """Minimal SigV4 (AWS's published signing algorithm) over a POST
        to the service root — enough for the Glue JSON protocol."""
        import datetime
        import hashlib
        import hmac
        import urllib.parse

        t = datetime.datetime.now(datetime.timezone.utc)
        amz_date = t.strftime("%Y%m%dT%H%M%SZ")
        datestamp = t.strftime("%Y%m%d")
        host = urllib.parse.urlparse(self.endpoint).netloc
        payload_hash = hashlib.sha256(body).hexdigest()
        headers = {
            "content-type": "application/x-amz-json-1.1",
            "host": host,
            "x-amz-date": amz_date,
            "x-amz-target": amz_target,
        }
        if self.session_token:
            headers["x-amz-security-token"] = self.session_token
        signed = ";".join(sorted(headers))
        canonical = "\n".join(
            [
                "POST",
                "/",
                "",
                "".join(f"{k}:{headers[k]}\n" for k in sorted(headers)),
                signed,
                payload_hash,
            ]
        )
        scope = f"{datestamp}/{self.region}/glue/aws4_request"
        to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                amz_date,
                scope,
                hashlib.sha256(canonical.encode()).hexdigest(),
            ]
        )

        def _hmac(key: bytes, msg: str) -> bytes:
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k = _hmac(f"AWS4{self.secret_key}".encode(), datestamp)
        k = _hmac(_hmac(_hmac(k, self.region), "glue"), "aws4_request")
        signature = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        headers["authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={signature}"
        )
        del headers["host"]  # urllib sets it; keeping it duplicates
        return headers

    def get_schema_json(self, schema_id: int | str) -> str:
        uuid = self._canonical_uuid(schema_id)
        if uuid in self._cache:
            return self._cache[uuid]
        import urllib.error
        import urllib.request

        body = json.dumps({"SchemaVersionId": uuid}).encode()
        target = "AWSGlue.GetSchemaVersion"
        if self.access_key and self.secret_key:
            headers = self._sigv4_headers(body, target)
        else:
            headers = {
                "content-type": "application/x-amz-json-1.1",
                "x-amz-target": target,
            }
        req = urllib.request.Request(
            self.endpoint + "/", data=body, headers=headers, method="POST"
        )

        def _do():
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))

        try:
            payload = _open_with_retries(
                _do, self.retry_attempts, self.retry_backoff_sec
            )
        except urllib.error.HTTPError as e:
            detail = e.read().decode("utf-8", "replace")
            if e.code in (400, 404) and "EntityNotFoundException" in detail:
                raise KeyError(f"schema version {uuid} not in registry") from e
            raise
        schema_json = payload["SchemaDefinition"]
        self._cache[uuid] = schema_json
        return schema_json

    def get_schema(self, schema_id: int | str) -> RecordSchema:
        return parse_schema(self.get_schema_json(schema_id))

    # ---- write path: the reference registers its product schema with
    # Glue at compatibility FULL (producer.scala:60-61) --------------

    def _post(self, amz_target: str, payload: dict) -> dict:
        import urllib.request

        body = json.dumps(payload).encode()
        if self.access_key and self.secret_key:
            headers = self._sigv4_headers(body, amz_target)
        else:
            headers = {
                "content-type": "application/x-amz-json-1.1",
                "x-amz-target": amz_target,
            }
        req = urllib.request.Request(
            self.endpoint + "/", data=body, headers=headers, method="POST"
        )

        def _do():
            with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))

        return _open_with_retries(
            _do, self.retry_attempts, self.retry_backoff_sec
        )

    def register_schema(
        self,
        registry_name: str,
        schema_name: str,
        schema_json: str,
        compatibility: str = "FULL",
        poll_attempts: int = 10,
        poll_interval_sec: float = 0.5,
        sleep: Callable[[float], None] = time.sleep,
    ) -> str:
        """Register a new version of ``schema_name`` (``AWSGlue.
        RegisterSchemaVersion``); if the schema doesn't exist yet,
        create it with ``compatibility`` (``AWSGlue.CreateSchema``,
        DataFormat AVRO) — exactly the bootstrap the reference performs
        with ``--compatibility FULL``. Glue enforces compatibility
        SERVER-side and answers through the version's Status field, so
        this polls PENDING versions (injectable ``sleep``) and maps a
        FAILURE status to ``IncompatibleSchemaError``. Returns the new
        SchemaVersionId (uuid string), cached for subsequent reads."""
        import urllib.error

        from .avro.compat import IncompatibleSchemaError

        try:
            out = self._post(
                "AWSGlue.RegisterSchemaVersion",
                {
                    "SchemaId": {
                        "RegistryName": registry_name,
                        "SchemaName": schema_name,
                    },
                    "SchemaDefinition": schema_json,
                },
            )
            status = out.get("Status", "AVAILABLE")
        except urllib.error.HTTPError as e:
            detail = e.read().decode("utf-8", "replace")
            if e.code in (400, 404) and "EntityNotFoundException" in detail:
                out = self._post(
                    "AWSGlue.CreateSchema",
                    {
                        "RegistryId": {"RegistryName": registry_name},
                        "SchemaName": schema_name,
                        "DataFormat": "AVRO",
                        "Compatibility": compatibility.upper(),
                        "SchemaDefinition": schema_json,
                    },
                )
                status = out.get("SchemaVersionStatus", "AVAILABLE")
            else:
                raise
        # canonicalize like every read-path access, so a proxy returning
        # uppercase/undashed uuids still hits the cache on later reads
        uuid = self._canonical_uuid(out["SchemaVersionId"])
        for _ in range(poll_attempts):
            if status != "PENDING":
                break
            sleep(poll_interval_sec)
            polled = self._post(
                "AWSGlue.GetSchemaVersion", {"SchemaVersionId": uuid}
            )
            status = polled.get("Status", "AVAILABLE")
        if status == "FAILURE":
            # the SCHEMA's server-side level governs existing schemas;
            # the ``compatibility`` argument only applies on the
            # CreateSchema bootstrap — don't name a level we can't know
            raise IncompatibleSchemaError(
                f"Glue rejected schema version {uuid} of "
                f"{registry_name}/{schema_name}: the schema's configured "
                "compatibility level was violated (Status=FAILURE)",
                [f"{registry_name}/{schema_name}: Status=FAILURE"],
            )
        if status == "PENDING":
            raise TimeoutError(
                f"Glue schema version {uuid} still PENDING after "
                f"{poll_attempts} polls"
            )
        self._cache[uuid] = schema_json
        return uuid


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
