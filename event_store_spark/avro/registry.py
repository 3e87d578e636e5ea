"""Local schema registry with RecordNameStrategy subject naming.

Stands in for the Confluent Schema Registry the reference talks to over
HTTP: subjects are named by the Avro record name
(`PostgresEventStoreAutoConfiguration.java:50-57` — RecordNameStrategy, so
one topic can carry several record types), ids are assigned monotonically,
and the Confluent 5-byte prefix carries the id on every payload.

The registry is a plain in-memory/JSON-file map — schema metadata is tiny
and driver-side by nature; executors only ever see (id → codec) closures.
"""

from __future__ import annotations

import json
import os

from event_store_spark.avro.codec import RecordCodec, frame, unframe


class LocalSchemaRegistry:
    def __init__(self, path: str | None = None):
        self.path = path
        self._by_id: dict[int, RecordCodec] = {}
        self._by_name: dict[str, int] = {}  # name → latest version's id
        self._versions: dict[str, list[int]] = {}  # name → ids, oldest first
        if path and os.path.exists(path):
            with open(path) as f:
                for sid, schema in sorted(
                    json.load(f).items(), key=lambda kv: int(kv[0])
                ):
                    self._install(int(sid), RecordCodec(schema))

    def _install(self, sid: int, codec: RecordCodec) -> None:
        self._by_id[sid] = codec
        self._by_name[codec.name] = sid
        self._versions.setdefault(codec.name, []).append(sid)

    def register(self, schema: dict | str) -> int:
        """Register under the record-name subject; returns the schema id.

        Re-registering an identical schema is a no-op (same id). A *changed*
        schema under the same subject gets a NEW id — Avro-style evolution:
        old frames keep decoding with their writer schema (looked up by the
        id in each Confluent frame), new writes carry the new id.
        """
        codec = RecordCodec(schema)
        for sid in self._versions.get(codec.name, []):
            if self._by_id[sid].schema == codec.schema:
                return sid
        sid = max(self._by_id, default=0) + 1
        self._install(sid, codec)
        self._persist()
        return sid

    def versions(self, name: str) -> list[int]:
        """Schema ids registered under a subject, oldest first."""
        return list(self._versions.get(name, []))

    def _persist(self) -> None:
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                json.dump({str(i): c.schema for i, c in self._by_id.items()}, f)

    def codec_by_id(self, sid: int) -> RecordCodec:
        return self._by_id[sid]

    def codec_by_name(self, name: str) -> RecordCodec:
        return self._by_id[self._by_name[name]]

    def id_by_name(self, name: str) -> int:
        """Latest registered schema id for a record-name subject."""
        return self._by_name[name]

    def serialize(self, name: str, record: dict) -> bytes:
        """record dict → Confluent-framed Avro bytes (T1)."""
        sid = self._by_name[name]
        return frame(sid, self._by_id[sid].encode(record))

    def deserialize(self, data: bytes) -> tuple[str, dict]:
        """Confluent-framed bytes → (record name, record dict) (T2)."""
        sid, body = unframe(data)
        codec = self._by_id[sid]
        return codec.name, codec.decode(body)
