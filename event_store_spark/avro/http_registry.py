"""Confluent Schema Registry HTTP client (REST v1, stdlib-only).

The reference wires Confluent's ``KafkaAvroSerializer`` against a live
Schema Registry over HTTP (`PostgresEventStoreAutoConfiguration.java:50-57`
— ``schema.registry.url`` is mandatory; `/root/reference/README.md:56-57`
shows the deployment property). The engine's default registry is the
in-process :class:`~event_store_spark.avro.registry.LocalSchemaRegistry`;
this module is the drop-in HTTP twin for deployments that already run a
registry service, speaking the public REST API
(docs.confluent.io/platform/current/schema-registry/develop/api.html):

- ``POST /subjects/{subject}/versions``  → ``{"id": N}`` (register;
  idempotent — same schema returns the existing global id)
- ``GET  /schemas/ids/{id}``             → ``{"schema": "..."}``
- ``GET  /subjects/{subject}/versions``  → ``[1, 2, ...]``
- ``GET  /subjects/{subject}/versions/{v|latest}`` →
  ``{"subject", "version", "id", "schema"}``

Subject naming is RecordNameStrategy (the reference's choice, so one topic
can carry several record types): the subject is the record's fully
qualified Avro name.

Scale/ops posture mirrors the local registry: schema metadata is tiny and
driver-side only. Ids and (subject, version) pairs are immutable in the
registry contract, so both are cached forever after first fetch — an
executor-free, amortized-zero-HTTP design. Only ``latest`` queries go to
the wire every time (latest genuinely moves under concurrent writers).

In-sandbox there is no registry service; tests run this client against a
stdlib ``http.server`` stub implementing the same five routes
(tests/test_http_registry.py), and the client itself is exercised live
when ``SCHEMA_REGISTRY_URL`` is set — same opt-in pattern as the
``KAFKA_BOOTSTRAP``-gated broker tests.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from event_store_spark.avro.codec import RecordCodec, frame, unframe

#: Confluent's REST content type (v1 wire protocol).
CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


def subject_for(schema: dict | str) -> str:
    """RecordNameStrategy subject: the record's fully qualified name."""
    s = json.loads(schema) if isinstance(schema, str) else schema
    name, ns = s["name"], s.get("namespace")
    return f"{ns}.{name}" if ns and "." not in name else name


class SchemaRegistryError(RuntimeError):
    """Registry returned an HTTP error (carries status + registry body)."""

    def __init__(self, status: int, body: str, url: str):
        super().__init__(f"schema registry {status} at {url}: {body[:200]}")
        self.status = status
        self.body = body


class HttpSchemaRegistry:
    """Drop-in HTTP twin of :class:`LocalSchemaRegistry`.

    Same surface — ``register / versions / codec_by_id / codec_by_name /
    id_by_name / serialize / deserialize`` — so `AvroEventStore` and the
    serde columns accept either. ``name`` arguments take the registration
    subject (fully qualified record name); the bare record name also
    resolves for schemas registered through THIS instance (alias map kept
    client-side, since the wire protocol only knows subjects).
    """

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._codec_by_id: dict[int, RecordCodec] = {}
        self._version_ids: dict[tuple[str, int], int] = {}
        self._alias: dict[str, str] = {}  # bare record name → subject

    # ------------------------------------------------------------- wire

    def _call(self, method: str, path: str, payload: dict | None = None):
        url = self.base_url + path
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            url,
            data=data,
            method=method,
            headers={"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:  # registry-level error body
            body = e.read().decode(errors="replace")
            if e.code == 404:
                raise KeyError(f"{path}: {body[:200]}") from None
            raise SchemaRegistryError(e.code, body, url) from None

    # ---------------------------------------------------------- surface

    def register(self, schema: dict | str) -> int:
        """Register under the record-name subject; returns the global id.

        The registry deduplicates: posting a schema already registered
        under the subject returns its existing id (no new version), which
        is what makes register-on-every-writer-startup safe.
        """
        codec = RecordCodec(schema)
        subject = subject_for(codec.schema)
        body = self._call(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": json.dumps(codec.schema)},
        )
        sid = int(body["id"])
        self._codec_by_id.setdefault(sid, codec)
        self._alias[codec.name] = subject
        return sid

    def _resolve_subject(self, name: str) -> str:
        return self._alias.get(name, name)

    def versions(self, name: str) -> list[int]:
        """GLOBAL schema ids under a subject, oldest first.

        The wire call returns version numbers; each (subject, version) is
        immutable so the version→id mapping is cached — listing versions
        of a stable subject costs one HTTP call after warmup.

        An unknown subject returns [] — drop-in parity with
        `LocalSchemaRegistry.versions` (ADVICE r6: the HTTP 404 used to
        surface as KeyError here, breaking code written against the
        local registry's empty-list contract; `codec_by_id`/`id_by_name`
        keep KeyError, where Local raises too).
        """
        subject = self._resolve_subject(name)
        try:
            listed = self._call("GET", f"/subjects/{subject}/versions")
        except KeyError:
            return []
        out = []
        for v in listed:
            key = (subject, int(v))
            if key not in self._version_ids:
                body = self._call("GET", f"/subjects/{subject}/versions/{v}")
                self._version_ids[key] = int(body["id"])
                if int(body["id"]) not in self._codec_by_id:
                    self._codec_by_id[int(body["id"])] = RecordCodec(
                        body["schema"]
                    )
            out.append(self._version_ids[key])
        return out

    def codec_by_id(self, sid: int) -> RecordCodec:
        if sid not in self._codec_by_id:
            body = self._call("GET", f"/schemas/ids/{sid}")
            self._codec_by_id[sid] = RecordCodec(body["schema"])
        return self._codec_by_id[sid]

    def id_by_name(self, name: str) -> int:
        """Latest global id for a subject — always fetched live."""
        subject = self._resolve_subject(name)
        body = self._call("GET", f"/subjects/{subject}/versions/latest")
        sid = int(body["id"])
        if sid not in self._codec_by_id:
            self._codec_by_id[sid] = RecordCodec(body["schema"])
        self._version_ids[(subject, int(body["version"]))] = sid
        return sid

    def codec_by_name(self, name: str) -> RecordCodec:
        return self.codec_by_id(self.id_by_name(name))

    def serialize(self, name: str, record: dict) -> bytes:
        """record dict → Confluent-framed Avro bytes (T1)."""
        sid = self.id_by_name(name)
        return frame(sid, self._codec_by_id[sid].encode(record))

    def deserialize(self, data: bytes) -> tuple[str, dict]:
        """Confluent-framed bytes → (record name, record dict) (T2)."""
        sid, body = unframe(data)
        codec = self.codec_by_id(sid)
        return codec.name, codec.decode(body)

    def writer_schemas(self, name: str) -> dict[int, dict]:
        """{global id: schema} for every version of a subject — the shape
        :func:`from_confluent_avro` takes for mixed-version decode."""
        return {
            sid: self.codec_by_id(sid).schema for sid in self.versions(name)
        }
