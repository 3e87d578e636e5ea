"""HTTP Schema Registry client against a stdlib Confluent-REST stub.

The reference registers schemas with a LIVE Confluent Schema Registry
(`PostgresEventStoreAutoConfiguration.java:50-57`,
`/root/reference/README.md:56-57`). In-sandbox there is no registry
service, so these tests run :class:`HttpSchemaRegistry` end-to-end against
an in-process ``http.server`` stub that implements the five REST v1 routes
with Confluent's documented semantics (global schema dedup, per-subject
versions, 404 error bodies). When ``SCHEMA_REGISTRY_URL`` is set, the same
tests run against the real service instead — the KAFKA_BOOTSTRAP opt-in
pattern — so the wiring is provable outside the sandbox.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from event_store_spark.avro.http_registry import (
    HttpSchemaRegistry,
    SchemaRegistryError,
    subject_for,
)
from event_store_spark.core.avro_store import AvroEventStore

V1 = {
    "type": "record",
    "name": "OrderPlaced",
    "namespace": "shop.events",
    "fields": [
        {"name": "item", "type": "string"},
        {"name": "qty", "type": "long"},
    ],
}
V2 = {
    "type": "record",
    "name": "OrderPlaced",
    "namespace": "shop.events",
    "fields": [
        {"name": "item", "type": "string"},
        {"name": "qty", "type": "long"},
        {"name": "note", "type": ["null", "string"], "default": None},
    ],
}
OTHER = {
    "type": "record",
    "name": "UserSignedUp",
    "fields": [{"name": "user", "type": "string"}],
}


class _StubState:
    """In-memory registry: Confluent id/version/dedup semantics."""

    def __init__(self):
        self.schemas: dict[str, int] = {}  # canonical json → global id
        self.by_id: dict[int, str] = {}
        self.subjects: dict[str, list[int]] = {}  # subject → ids by version
        self.requests: list[str] = []  # method+path log for cache assertions

    def register(self, subject: str, schema_str: str) -> int:
        canonical = json.dumps(json.loads(schema_str), sort_keys=True)
        sid = self.schemas.get(canonical)
        if sid is None:
            sid = max(self.by_id, default=0) + 1
            self.schemas[canonical] = sid
            self.by_id[sid] = canonical
        versions = self.subjects.setdefault(subject, [])
        if sid not in versions:  # same schema re-post: same version, no-op
            versions.append(sid)
        return sid


def _make_handler(state: _StubState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header(
                "Content-Type", "application/vnd.schemaregistry.v1+json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _404(self, error_code: int, msg: str):
            self._reply(404, {"error_code": error_code, "message": msg})

        def do_POST(self):
            state.requests.append("POST " + self.path)
            parts = self.path.strip("/").split("/")
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            if (
                len(parts) == 3
                and parts[0] == "subjects"
                and parts[2] == "versions"
            ):
                try:
                    json.loads(body["schema"])
                except (KeyError, ValueError):
                    self._reply(
                        422, {"error_code": 42201, "message": "invalid schema"}
                    )
                    return
                self._reply(200, {"id": state.register(parts[1], body["schema"])})
                return
            self._404(40401, "unknown route")

        def do_GET(self):
            state.requests.append("GET " + self.path)
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                sid = int(parts[2])
                if sid not in state.by_id:
                    self._404(40403, "Schema not found")
                    return
                self._reply(200, {"schema": state.by_id[sid]})
                return
            if len(parts) >= 3 and parts[0] == "subjects" and parts[2] == "versions":
                subject = parts[1]
                if subject not in state.subjects:
                    self._404(40401, "Subject not found")
                    return
                ids = state.subjects[subject]
                if len(parts) == 3:
                    self._reply(200, list(range(1, len(ids) + 1)))
                    return
                v = len(ids) if parts[3] == "latest" else int(parts[3])
                if not 1 <= v <= len(ids):
                    self._404(40402, "Version not found")
                    return
                sid = ids[v - 1]
                self._reply(
                    200,
                    {
                        "subject": subject,
                        "version": v,
                        "id": sid,
                        "schema": state.by_id[sid],
                    },
                )
                return
            self._404(40401, "unknown route")

    return Handler


@pytest.fixture()
def registry_env():
    """(base_url, state|None): live service if SCHEMA_REGISTRY_URL is set,
    else an in-process stub. state is None in live mode — cache-hit
    assertions that need the request log skip there."""
    live = os.environ.get("SCHEMA_REGISTRY_URL")
    if live:
        yield live, None
        return
    state = _StubState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", state
    finally:
        server.shutdown()


def test_subject_naming_is_record_name_strategy():
    assert subject_for(V1) == "shop.events.OrderPlaced"
    assert subject_for(OTHER) == "UserSignedUp"


def test_register_dedup_and_evolution(registry_env):
    base, _ = registry_env
    reg = HttpSchemaRegistry(base)
    sid1 = reg.register(V1)
    assert reg.register(V1) == sid1  # idempotent re-register
    sid2 = reg.register(V2)
    assert sid2 != sid1  # evolved schema → new id
    assert reg.versions("shop.events.OrderPlaced") == [sid1, sid2]
    assert reg.id_by_name("shop.events.OrderPlaced") == sid2  # latest
    # bare record name resolves through the client-side alias
    assert reg.id_by_name("OrderPlaced") == sid2


def test_serialize_roundtrip_and_mixed_version_decode(registry_env):
    base, _ = registry_env
    writer_old = HttpSchemaRegistry(base)
    sid1 = writer_old.register(V1)
    old_frame = writer_old.serialize("OrderPlaced", {"item": "w", "qty": 3})

    writer_new = HttpSchemaRegistry(base)
    writer_new.register(V2)
    new_frame = writer_new.serialize(
        "OrderPlaced", {"item": "g", "qty": 1, "note": "rush"}
    )
    assert old_frame[1:5] != new_frame[1:5]  # distinct ids on the wire

    # a FRESH client decodes both frames via id lookup alone (T2)
    reader = HttpSchemaRegistry(base)
    assert reader.deserialize(old_frame) == (
        "OrderPlaced",
        {"item": "w", "qty": 3},
    )
    name, rec = reader.deserialize(new_frame)
    assert rec["note"] == "rush"
    # writer_schemas feeds the dataframe-side mixed-version decoder
    ws = reader.writer_schemas("shop.events.OrderPlaced")
    assert set(ws) == {sid1, sid1 + 1} or len(ws) == 2


def test_dataframe_mixed_version_decode_via_http_schemas(
    spark, registry_env
):
    """T2 on DataFrames with the registry over HTTP: a topic carrying
    frames written under BOTH schema versions decodes through
    `from_confluent_avro` fed by `writer_schemas()` — the per-frame
    writer-schema resolution the reference's deserializer does against
    its live registry."""
    from pyspark.sql import functions as F

    from event_store_spark.avro.spark import from_confluent_avro

    base, _ = registry_env
    reg = HttpSchemaRegistry(base)
    reg.register(V1)
    old_frame = reg.serialize("OrderPlaced", {"item": "w", "qty": 3})
    sid2 = reg.register(V2)
    new_frame = reg.serialize(
        "OrderPlaced", {"item": "g", "qty": 1, "note": "rush"}
    )
    df = spark.createDataFrame(
        [(1, bytearray(old_frame)), (2, bytearray(new_frame))],
        "id int, data binary",
    )
    out = df.select(
        "id",
        from_confluent_avro(
            F.col("data"),
            V2,
            sid2,
            writer_schemas=reg.writer_schemas("shop.events.OrderPlaced"),
        ).alias("p"),
    ).orderBy("id")
    rows = out.collect()
    assert rows[0].p.item == "w" and rows[0].p.note is None  # V1 frame
    assert rows[1].p.note == "rush"  # V2 frame


def test_id_and_version_caching(registry_env):
    base, state = registry_env
    if state is None:
        pytest.skip("request-log assertions need the stub")
    reg = HttpSchemaRegistry(base)
    reg.register(V1)
    reg.register(V2)
    n0 = len(state.requests)
    reg.versions("shop.events.OrderPlaced")  # warms (subject, version)→id
    warm = len(state.requests) - n0
    reg.versions("shop.events.OrderPlaced")  # immutable → 1 listing call
    assert len(state.requests) - n0 - warm == 1
    sid = reg.versions("shop.events.OrderPlaced")[0]
    n1 = len(state.requests)
    reg.codec_by_id(sid)  # already cached by the versions() walk
    assert len(state.requests) == n1


def test_errors(registry_env):
    base, state = registry_env
    if state is None:
        pytest.skip("error-path assertions mutate no live registry")
    reg = HttpSchemaRegistry(base)
    with pytest.raises(KeyError):
        reg.codec_by_id(999)
    # drop-in parity with LocalSchemaRegistry (ADVICE r6): an unseen
    # subject lists as EMPTY, not KeyError — and writer_schemas, which
    # composes versions(), follows
    assert reg.versions("NoSuchSubject") == []
    assert reg.writer_schemas("NoSuchSubject") == {}
    with pytest.raises(SchemaRegistryError) as ei:
        reg._call("POST", "/subjects/x/versions", {"schema": "not json"})
    assert ei.value.status == 422


def test_avro_event_store_accepts_http_registry(spark, tmp_path, registry_env):
    """Drop-in: the S1 save/load path runs unchanged against the HTTP twin
    (same duck-typed surface as LocalSchemaRegistry)."""
    import datetime

    base, _ = registry_env
    reg = HttpSchemaRegistry(base)
    reg.register(V1)
    store = AvroEventStore(spark, str(tmp_path / "s"), reg)
    ts = datetime.datetime(2025, 2, 1, 8, 30)
    df = spark.createDataFrame(
        [("u1", "widget", 3, ts), ("u2", "gadget", 1, ts)],
        "key string, item string, qty long, timestamp timestamp",
    )
    store.save("orders_events", df, "OrderPlaced")
    out = {
        r.payload.item: r.payload.qty
        for r in store.load("orders_events", "OrderPlaced").collect()
    }
    assert out == {"widget": 3, "gadget": 1}
