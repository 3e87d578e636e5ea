"""Avro Object Container Files (OCF) — the .avro SOURCE/SINK format.

The reference stores Avro *messages* (Confluent-framed, registry-governed);
the files an Avro-centric shop actually has at rest are OCF — header
(`Obj\\x01`, metadata map carrying the writer schema JSON + codec, 16-byte
sync marker) followed by blocks of (record count, byte length, serialized
records, sync). This module adds that format to the engine without the
spark-avro package (absent in this environment, and unnecessary for the
flat envelope records the store uses):

- :func:`read_avro_container` — distributed read: `binaryFile` rows fan
  out one FILE per task and a `mapInPandas` decode emits the records as
  top-level columns, resolved to a reader schema with the same Avro
  evolution rules the Confluent path applies (writer schema from each
  file's own header; reader aliases for renames, defaults for added
  fields, dropped fields discarded). Parallelism = file count, the
  natural unit of a lake of bounded-size .avro files; block-level
  splitting of one huge file is the vendored-connector job this module
  deliberately leaves out (write bounded files instead).
- :func:`write_avro_container` — a driver-side single-file writer
  (null/deflate codecs) for fixtures and small exports.
- :func:`write_avro_container_dist` — the distributed sink: one
  `part-<pid>.avro` per partition (deterministic names, so retried
  tasks rewrite idempotently) + a (path, rows) manifest; the file-per-
  partition layout is exactly the parallelism unit the reader consumes.
  The event log's canonical substrate stays parquet by design — this
  exists so .avro consumers can be handed their native format.

Wire format per the public Avro 1.11 spec "Object Container Files".
The sync marker is derived deterministically from the schema (md5) so
round-trip tests are byte-stable; the spec only requires it be
consistent within a file.
"""

from __future__ import annotations

import io
import json
import zlib

from pyspark.sql import DataFrame, SparkSession

from event_store_spark.avro.codec import (
    RecordCodec,
    decode_bytes,
    decode_long,
    encode_bytes,
    encode_long,
)

_MAGIC = b"Obj\x01"


def _sync_for(schema_json: str) -> bytes:
    import hashlib

    return hashlib.md5(schema_json.encode()).digest()


def write_avro_container(
    records: list[dict],
    schema: dict | str,
    path: str,
    codec: str = "null",
    block_records: int = 1000,
) -> None:
    """Write one OCF file (driver-side; see module docstring for scope)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    rc = RecordCodec(schema)
    schema_json = json.dumps(rc.schema)
    sync = _sync_for(schema_json)

    # header: magic, metadata map<string, bytes> (one map block), sync
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out = bytearray(_MAGIC)
    out += encode_long(len(meta))
    for k in sorted(meta):
        out += encode_bytes(k.encode())
        out += encode_bytes(meta[k])
    out += encode_long(0)
    out += sync

    for i in range(0, len(records), block_records):
        block = records[i : i + block_records]
        body = b"".join(rc.encode(r) for r in block)
        if codec == "deflate":
            body = zlib.compress(body)[2:-4]  # raw deflate per the spec
        out += encode_long(len(block))
        out += encode_long(len(body))
        out += body
        out += sync

    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _parse_header(buf: io.BytesIO) -> tuple[RecordCodec, str, bytes]:
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = decode_long(buf)
        if n == 0:
            break
        if n < 0:  # negative count: a byte-size long follows (spec)
            decode_long(buf)
            n = -n
        for _ in range(n):
            k = decode_bytes(buf).decode()
            meta[k] = decode_bytes(buf)
    sync = buf.read(16)
    codec_name = meta.get("avro.codec", b"null").decode()
    if codec_name not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec_name!r}")
    writer = RecordCodec(meta["avro.schema"].decode())
    return writer, codec_name, sync


def _decode_file(content: bytes, project) -> list[dict]:
    buf = io.BytesIO(content)
    writer, codec_name, sync = _parse_header(buf)
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = decode_long(buf)
        size = decode_long(buf)
        body = buf.read(size)
        if len(body) != size:
            raise ValueError("truncated block")
        if codec_name == "deflate":
            body = zlib.decompress(body, -15)
        block = io.BytesIO(body)
        for _ in range(count):
            rows.append(project(writer, writer.decode_stream(block)))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt or split file)")
    return rows


def read_avro_container(
    spark: SparkSession, path: str, reader_schema: dict | str | None = None
) -> DataFrame:
    """Distributed OCF read: records as top-level columns under the
    reader schema (default: the writer schema of the first file, read
    once driver-side — one small header fetch)."""
    import pandas as pd

    from event_store_spark.avro.spark import spark_type_of
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    files = spark.read.format("binaryFile").load(path)

    if reader_schema is None:
        first = files.select("path").orderBy("path").first()
        if first is None:
            raise ValueError(f"no files match {path}")
        import urllib.parse

        local = urllib.parse.urlparse(first["path"]).path
        with open(local, "rb") as fh:
            head = fh.read(1 << 20)
        writer, _, _ = _parse_header(io.BytesIO(head))
        reader_schema = writer.schema

    reader = RecordCodec(reader_schema)
    reader_fields = list(reader.fields)
    lookup: dict[str, list[str]] = {}
    defaults: dict[str, object] = {}
    for f in reader.schema["fields"]:
        lookup[f["name"]] = [f["name"], *f.get("aliases", [])]
        if "default" in f:
            d = f["default"]
            base = f["type"][1] if isinstance(f["type"], list) else f["type"]
            if base == "bytes" and isinstance(d, str):
                d = d.encode("latin-1")
            defaults[f["name"]] = d

    def project(writer: RecordCodec, decoded: dict) -> dict:
        row = {}
        for name, t in reader_fields:
            src = next((k for k in lookup[name] if k in decoded), None)
            if src is not None:
                row[name] = decoded[src]
            elif name in defaults:
                row[name] = defaults[name]
            elif isinstance(t, list):
                row[name] = None
            else:
                raise ValueError(
                    f"reader field {name} missing from writer schema "
                    f"{writer.name} and has no default"
                )
        return row

    ddl = spark_type_of(reader)[len("struct<") : -1]  # top-level columns

    def decode_files(pdfs):
        for pdf in pdfs:
            out: list[dict] = []
            for content in pdf["content"]:
                out.extend(_decode_file(bytes(content), project))
            yield pd.DataFrame(
                out, columns=[n for n, _ in reader_fields]
            ) if out else pd.DataFrame(
                {n: pd.Series([], dtype="object") for n, _ in reader_fields}
            )

    return files.select("content").mapInPandas(decode_files, ddl)


def write_avro_container_dist(
    df: DataFrame, schema: dict | str, out_dir: str, codec: str = "null"
) -> list[tuple[str, int]]:
    """Distributed OCF SINK: each partition writes one `part-<pid>.avro`
    under ``out_dir`` and the returned manifest lists (path, rows).

    The per-partition file is the parallelism unit `read_avro_container`
    consumes, so export→read round-trips at any width; file names are
    deterministic by partition id, so a retried/speculated task rewrites
    its own file with identical content (idempotent, same discipline as
    the engine's batch-keyed sinks). Schema fields must be flat
    primitives matching df columns (the envelope's shape — the
    reference's events table DDL); timestamps are exported as epoch
    longs by the caller (Avro has no bare timestamp primitive in the
    subset the codec supports). ``out_dir`` must be storage every
    executor can reach (a shared filesystem / fuse mount — same contract
    as every other path in local mode)."""
    import os

    import pandas as pd

    from event_store_spark.shipping import ensure_shipped

    rc = RecordCodec(schema)
    names = [n for n, _ in rc.fields]
    missing = set(names) - set(df.columns)
    if missing:
        raise ValueError(f"df lacks schema fields: {sorted(missing)}")
    os.makedirs(out_dir, exist_ok=True)
    schema_obj = rc.schema
    ensure_shipped(df.sparkSession)

    def part(pdfs):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records: list[dict] = []
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                records.append(
                    {
                        k: (bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
                        for k, v in rec.items()
                    }
                )
        if not records:
            yield pd.DataFrame({"path": pd.Series([], dtype="object"),
                                "rows": pd.Series([], dtype="int64")})
            return
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        write_avro_container(records, schema_obj, path, codec=codec)
        yield pd.DataFrame({"path": [path], "rows": [len(records)]})

    manifest = df.select(*names).mapInPandas(part, "path string, rows bigint")
    return [(r.path, r.rows) for r in manifest.collect()]
