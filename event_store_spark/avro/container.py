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
  fields, dropped fields discarded). Parallelism = file count for a
  lake of bounded-size files; when any file exceeds ``split_bytes``
  (default 128 MiB, env ``SPARK_GRAFT_OCF_SPLIT_BYTES``) the read
  switches to SYNC-MARKER BLOCK SPLITTING — the format's own split
  design (VERDICT r7 #5: one 10 GB file used to become a silent 1-task
  stage): each task seeks into its byte range, scans to the next
  16-byte sync, and decodes exactly the blocks that START in its range,
  so a single huge file fans out across the cluster. The split path
  opens files by path (shared-filesystem contract, same as
  `write_avro_container_dist`); non-local URIs fall back to whole-file
  tasks with a loud warning.
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


def _local_path(uri: str) -> str | None:
    """file:-or-bare URI → filesystem path; None for remote schemes."""
    import urllib.parse

    parsed = urllib.parse.urlparse(uri)
    if parsed.scheme in ("", "file"):
        return urllib.parse.unquote(parsed.path) or uri
    return None


def _scan_to_block_start(fh, sync: bytes, from_pos: int) -> int | None:
    """First block start (position AFTER a sync marker) at or beyond
    ``from_pos + 16`` — i.e. the first sync occurring at byte position
    >= from_pos, streamed in 1 MiB chunks with a 15-byte overlap carry.
    None when the file ends first. False positives (the 16 sync bytes
    appearing inside block data) are the same ~2^-128 odds every
    splittable-Avro reader accepts; a hit there fails loudly on the
    next block's structure parse, never silently."""
    fh.seek(from_pos)
    carry = b""
    while True:
        chunk = fh.read(1 << 20)
        if not chunk:
            return None
        data = carry + chunk
        chunk_start = fh.tell() - len(chunk)
        idx = data.find(sync)
        if idx != -1:
            return chunk_start - len(carry) + idx + 16
        carry = data[-15:]


def read_avro_container(
    spark: SparkSession,
    path: str,
    reader_schema: dict | str | None = None,
    split_bytes: int | None = None,
) -> DataFrame:
    """Distributed OCF read: records as top-level columns under the
    reader schema (default: the writer schema of the first file, read
    once driver-side — one small header fetch). Files larger than
    ``split_bytes`` are read as multiple sync-aligned byte-range splits
    (see module docstring); smaller files stay one whole-file task."""
    import os as _os

    import pandas as pd

    from event_store_spark.avro.spark import spark_type_of
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    if split_bytes is None:
        split_bytes = int(
            _os.environ.get("SPARK_GRAFT_OCF_SPLIT_BYTES", str(128 << 20))
        )
    files = spark.read.format("binaryFile").load(path)
    # listing only (path + size): binaryFile defers content to the scan,
    # so this collect is a driver-side file listing, not a data read
    listing = sorted(
        (r["path"], r["length"])
        for r in files.select("path", "length").collect()
    )
    if not listing:
        raise ValueError(f"no files match {path}")

    if reader_schema is None:
        local = _local_path(listing[0][0])
        if local is None:
            raise ValueError(
                "reader_schema inference opens the first file driver-side "
                f"and {listing[0][0]} is not a local/shared path — pass "
                "reader_schema explicitly"
            )
        with open(local, "rb") as fh:
            writer, _, _ = _parse_header(fh)
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
    out_cols = [n for n, _ in reader_fields]

    def _frame(out: list[dict]) -> "pd.DataFrame":
        return (
            pd.DataFrame(out, columns=out_cols)
            if out
            else pd.DataFrame({n: pd.Series([], dtype="object") for n in out_cols})
        )

    oversized = [(p, ln) for p, ln in listing if ln > split_bytes]
    all_local = all(_local_path(p) is not None for p, _ in listing)
    if oversized and not all_local:
        import warnings

        warnings.warn(
            f"read_avro_container: {len(oversized)} file(s) over "
            f"split_bytes={split_bytes} but the input is not on a "
            "local/shared filesystem — byte-range splitting needs "
            "open-by-path, so each file runs as ONE task "
            f"(first oversized: {oversized[0][0]}); write bounded files or "
            "stage onto shared storage",
            stacklevel=2,
        )

    if not oversized or not all_local:
        def decode_files(pdfs):
            for pdf in pdfs:
                out: list[dict] = []
                for content in pdf["content"]:
                    out.extend(_decode_file(bytes(content), project))
                yield _frame(out)

        return files.select("content").mapInPandas(decode_files, ddl)

    # --- sync-marker split plan: one row per byte range, every file ---
    # (split files AND bounded ones ride the same plan so the stage is
    # homogeneous). Planning opens each file once driver-side for its
    # header (writer schema, codec, sync, header end) — a per-file
    # metadata fetch of the same order as the listing itself.
    plan_rows = []
    for p, ln in listing:
        local = _local_path(p)
        with open(local, "rb") as fh:
            writer, codec_name, sync = _parse_header(fh)
            header_end = fh.tell()
        schema_json = json.dumps(writer.schema)
        s = header_end
        while s < ln:
            e = min(s + split_bytes, ln)
            plan_rows.append((p, local, s, e, header_end, schema_json,
                              codec_name + ":" + sync.hex()))
            s = e
        if header_end >= ln:  # header-only file: no blocks
            plan_rows.append((p, local, header_end, ln, header_end,
                              schema_json, codec_name + ":" + sync.hex()))

    # one split per partition, pinned at the RDD layer: a repartition()
    # here would be a shuffle whose partitions AQE sees as tiny (the plan
    # rows are bytes; the COST is the decode after) and coalesces back to
    # one task — exactly the 1-task stage this path exists to prevent
    plan = spark.createDataFrame(
        spark.sparkContext.parallelize(plan_rows, len(plan_rows)),
        "uri string, local string, start long, end long, header_end long,"
        " schema_json string, codec_sync string",
    )

    def decode_splits(pdfs):
        for pdf in pdfs:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                writer = RecordCodec(row.schema_json)
                codec_name, sync_hex = row.codec_sync.split(":")
                sync = bytes.fromhex(sync_hex)
                with open(row.local, "rb") as fh:
                    # ownership rule: a block belongs to the split its
                    # START offset falls in. The first split begins at
                    # header_end exactly; later splits scan from
                    # start-16 so a block starting exactly at `start`
                    # (whose preceding sync straddles the boundary) is
                    # found, and the previous split's `pos < end` test
                    # excludes it there.
                    if row.start <= row.header_end:
                        pos = row.header_end
                    else:
                        pos = _scan_to_block_start(fh, sync, row.start - 16)
                        if pos is None or pos >= row.end:
                            continue
                    fh.seek(pos)
                    while pos < row.end:
                        head = fh.read(1)
                        if not head:
                            break
                        fh.seek(-1, io.SEEK_CUR)
                        count = decode_long(fh)
                        size = decode_long(fh)
                        body = fh.read(size)
                        if len(body) != size:
                            raise ValueError("truncated block")
                        if codec_name == "deflate":
                            body = zlib.decompress(body, -15)
                        block = io.BytesIO(body)
                        for _ in range(count):
                            out.append(
                                project(writer, writer.decode_stream(block))
                            )
                        if fh.read(16) != sync:
                            raise ValueError(
                                "sync marker mismatch (corrupt or split file)"
                            )
                        pos = fh.tell()
            yield _frame(out)

    return plan.mapInPandas(decode_splits, ddl)


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
