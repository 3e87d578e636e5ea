"""Minimal pure-Python PostgreSQL v3 wire-protocol client (live S1/S6).

The reference's native substrate is a Postgres events table
(`PostgresEventStore.java:68-142`, `events_schema.sql:1-13`); this repo's
JDBC twin (`core/jdbc.py`) builds the exact pushdown SQL but needs the
org.postgresql driver jar on the Spark classpath, which this sandbox
cannot fetch. The sandbox DOES ship Postgres server binaries — so this
module implements just enough of the public, stable v3 frontend/backend
protocol (startup, trust/cleartext/md5 auth, simple query) to run the
live round-trip against a real local server with zero dependencies:

- :class:`PgConnection` — one blocking socket connection (TCP or the
  ``.s.PGSQL.<port>`` unix socket), ``query()`` for the simple-query
  cycle with text-format row decoding.
- :func:`create_events_table` / :func:`insert_event` /
  :func:`stamp_lsns` / :func:`scan_events` — the reference event-table
  contract over that connection: the DDL of ``events_schema.sql``, the
  INSERT shape of `PostgresEventStore.java:69-77` (id/lsn left to the
  database), an `LsnUpdater.java:54-85`-style commit-order lsn stamp,
  and replay scans that execute `core.jdbc.scan_query`'s pushdown text
  VERBATIM — proving the keyset predicate is evaluated by the database,
  not by the client.
- :func:`pgwire_scan` — bridges a scan into a Spark DataFrame with the
  event-store schema so replay/subscribe compose against live rows.

Scale honesty: this client is the in-sandbox LIVE HARNESS — a
single-socket, driver-side fetch for correctness/parity testing. The
production 100 TB path stays `core.jdbc.jdbc_scan`: Spark's JDBC source
with lsn-range partitioning, where 1000 executors each open their own
connection. Both paths push the same `scan_query` text, so what this
module verifies against a real server is exactly what the JDBC path
ships.

Protocol notes (all public: PostgreSQL docs, "Frontend/Backend
Protocol"): every backend message is 1 type byte + int32 length
(inclusive of itself) + payload; the startup message alone omits the
type byte. Text result format only (format code 0) — the simple-query
protocol never returns binary columns, which keeps decoding a small
OID→parser map.
"""

from __future__ import annotations

import hashlib
import os
import socket
import struct
import uuid as _uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from event_store_spark.core.cursor import Cursor
from event_store_spark.core.jdbc import scan_query

PROTOCOL_V3 = 196608  # (3 << 16) | 0


class PgError(Exception):
    """ErrorResponse from the backend, with the notable fields kept."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        self.code = fields.get("C", "")
        super().__init__(
            f"{fields.get('S', 'ERROR')} {self.code}: {fields.get('M', '?')}"
        )


@dataclass
class PgResult:
    """One statement's result: column names, decoded rows, command tag."""

    columns: list[str] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)
    command_tag: str = ""


# ---------------------------------------------------------- text decoders

def _dec_bool(s: str):
    return s == "t"


def _dec_bytea(s: str) -> bytes:
    if s.startswith("\\x"):  # bytea_output = 'hex' (server default)
        return bytes.fromhex(s[2:])
    raise ValueError("escape-format bytea unsupported; SET bytea_output=hex")


def _dec_timestamptz(s: str) -> datetime:
    # '2024-06-01 12:00:00.123+00' — fromisoformat handles space + offset
    dt = datetime.fromisoformat(s)
    return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)


#: OID → text-format parser; anything absent stays str (incl. pg_lsn 3220,
#: whose '<hi>/<lo>' text is what callers feed to :func:`lsn_int`)
_DECODERS = {
    16: _dec_bool,
    17: _dec_bytea,
    20: int, 21: int, 23: int, 26: int,
    700: float, 701: float,
    1114: _dec_timestamptz, 1184: _dec_timestamptz,
}


def lsn_int(lsn_text: str) -> int:
    """pg_lsn text ('16/B374D848') → the 64-bit WAL position it names.

    The total order of pg_lsn values is the total order of these ints —
    the event store's bigint lsn column is exactly this mapping, so
    keyset cursors transfer between the parquet store and live Postgres
    without re-sorting."""
    hi, lo = lsn_text.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


# ---------------------------------------------------------- SQL literals

def quote_literal(s: str) -> str:
    """Standard-conforming string literal (the only quoting the simple
    query protocol needs; parameters would use the extended protocol)."""
    return "'" + s.replace("'", "''") + "'"


def bytea_literal(b: bytes) -> str:
    return f"'\\x{b.hex()}'::bytea"


# ------------------------------------------------------------- connection

class PgConnection:
    """One blocking v3-protocol connection running simple queries.

    ``host`` may be a directory containing ``.s.PGSQL.<port>`` (unix
    socket — what the throwaway test cluster listens on) or a TCP host."""

    def __init__(
        self,
        *,
        user: str,
        database: str = "postgres",
        host: str = "/tmp",
        port: int = 5432,
        password: str | None = None,
        timeout: float = 30.0,
        replication: bool = False,
    ):
        self._replication = replication
        if os.path.isdir(host):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(os.path.join(host, f".s.PGSQL.{port}"))
        else:
            self._sock = socket.create_connection((host, port), timeout)
        self._buf = b""
        self.parameters: dict[str, str] = {}
        self._startup(user, database, password)

    # ---- framing

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(type_byte + struct.pack("!i", 4 + len(payload)) + payload)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("backend closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._read_exact(5)
        mtype = head[:1]
        (length,) = struct.unpack("!i", head[1:5])
        return mtype, self._read_exact(length - 4)

    # ---- startup / auth

    def _startup(self, user: str, database: str, password: str | None) -> None:
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00"
        )
        if self._replication:
            # walsender mode pinned to this database — required for
            # START_REPLICATION with a logical slot (core/pgoutput.py)
            params += b"replication\x00database\x00"
        params += b"\x00"
        self._sock.sendall(
            struct.pack("!ii", 8 + len(params), PROTOCOL_V3) + params
        )
        while True:
            mtype, body = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack("!i", body[:4])
                if code == 0:  # AuthenticationOk (trust)
                    continue
                if code == 3:  # cleartext password
                    if password is None:
                        raise PgError({"M": "password required", "C": "28P01"})
                    self._send(b"p", password.encode() + b"\x00")
                    continue
                if code == 5:  # md5: md5(md5(password+user)+salt)
                    if password is None:
                        raise PgError({"M": "password required", "C": "28P01"})
                    salt = body[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\x00")
                    continue
                raise PgError(
                    {"M": f"unsupported auth method {code} "
                          "(this client speaks trust/cleartext/md5)"}
                )
            elif mtype == b"S":  # ParameterStatus
                k, v = body.split(b"\x00")[:2]
                self.parameters[k.decode()] = v.decode()
            elif mtype == b"K":  # BackendKeyData — not needed (no cancel)
                pass
            elif mtype == b"E":
                raise PgError(self._error_fields(body))
            elif mtype == b"Z":  # ReadyForQuery
                return
            elif mtype == b"N":  # NoticeResponse
                pass
            else:
                raise PgError({"M": f"unexpected startup message {mtype!r}"})

    @staticmethod
    def _error_fields(body: bytes) -> dict[str, str]:
        fields = {}
        for part in body.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    # ---- simple query

    def query(self, sql: str) -> PgResult:
        """Run one (or more, ';'-separated) statements; return the LAST
        statement's result set. Raises :class:`PgError` on the first
        error; the protocol's ReadyForQuery resync keeps the connection
        usable afterwards."""
        self._send(b"Q", sql.encode() + b"\x00")
        result = PgResult()
        col_types: list[int] = []
        error: dict[str, str] | None = None
        while True:
            mtype, body = self._read_message()
            if mtype == b"T":  # RowDescription — a fresh result set
                result = PgResult()
                col_types = []
                (ncols,) = struct.unpack("!h", body[:2])
                off = 2
                for _ in range(ncols):
                    end = body.index(b"\x00", off)
                    result.columns.append(body[off:end].decode())
                    # table oid(4) attnum(2) TYPE OID(4) typlen(2)
                    # typmod(4) format(2)
                    (type_oid,) = struct.unpack("!i", body[end + 7:end + 11])
                    col_types.append(type_oid)
                    off = end + 19
            elif mtype == b"D":  # DataRow
                (nvals,) = struct.unpack("!h", body[:2])
                off = 2
                row = []
                for i in range(nvals):
                    (vlen,) = struct.unpack("!i", body[off:off + 4])
                    off += 4
                    if vlen == -1:
                        row.append(None)
                        continue
                    text = body[off:off + vlen].decode()
                    off += vlen
                    dec = _DECODERS.get(col_types[i])
                    row.append(dec(text) if dec else text)
                result.rows.append(tuple(row))
            elif mtype == b"C":  # CommandComplete
                result.command_tag = body.rstrip(b"\x00").decode()
            elif mtype == b"E":
                error = error or self._error_fields(body)
            elif mtype == b"Z":  # ReadyForQuery — cycle done
                if error:
                    raise PgError(error)
                return result
            elif mtype in (b"N", b"S", b"I"):  # notice/param/empty-query
                pass
            else:
                raise PgError({"M": f"unexpected message {mtype!r}"})

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ----------------------------------------------- event-table live contract

def create_events_table(conn: PgConnection, topic: str) -> str:
    """`events_schema.sql:1-13` verbatim semantics: bigserial id PK,
    uuid key, bytea data/metadata, timestamptz, NULLABLE pg_lsn lsn with
    a secondary index. Returns the qualified table name."""
    table = f"events.{topic}"
    if not topic.replace("_", "").isalnum():
        raise ValueError(f"suspicious topic {topic!r}")
    conn.query("CREATE SCHEMA IF NOT EXISTS events")
    conn.query(
        f"""CREATE TABLE IF NOT EXISTS {table} (
                id bigserial PRIMARY KEY,
                key uuid NOT NULL,
                data bytea NOT NULL,
                metadata bytea,
                timestamp timestamp with time zone NOT NULL,
                lsn pg_lsn
            )"""
    )
    conn.query(
        f"CREATE INDEX IF NOT EXISTS {topic}_lsn_idx ON {table} (lsn)"
    )
    return table


def insert_event(
    conn: PgConnection,
    topic: str,
    key: str | _uuid.UUID,
    data: bytes,
    timestamp: datetime,
    metadata: bytes | None = None,
) -> None:
    """`PostgresEventStore.java:69-77`'s INSERT shape: key/data/timestamp
    (+ metadata when present); id is the sequence's, lsn stays NULL until
    the stamper runs — the reference's asynchronous-lsn contract."""
    table = f"events.{topic}"
    cols = "key, data, timestamp" + (", metadata" if metadata is not None else "")
    vals = (
        f"{quote_literal(str(key))}::uuid, {bytea_literal(data)}, "
        f"{quote_literal(timestamp.astimezone(timezone.utc).isoformat())}"
        "::timestamptz"
    )
    if metadata is not None:
        vals += f", {bytea_literal(metadata)}"
    conn.query(f"INSERT INTO {table} ({cols}) VALUES ({vals})")


def stamp_lsns(conn: PgConnection, topic: str) -> int:
    """Commit-order lsn stamp — the `LsnUpdater.java:54-85` twin.

    The reference tails a logical-replication slot and stamps each row
    with its transaction's COMMIT lsn (monotonic across transactions by
    construction). Without a replication consumer, the equivalent
    invariant is had by stamping every not-yet-stamped row with
    ``pg_current_wal_lsn()`` AFTER its transaction committed: all rows
    of one stamped batch share one lsn, successive stamps never
    decrease, and re-running is idempotent (``WHERE lsn IS NULL``) —
    the same at-least-once/idempotent discipline the reference documents.
    The INSERT position (`pg_current_wal_insert_lsn`) is used rather
    than the write position: it has advanced past every committed row's
    WAL record the moment the commit returns, even under asynchronous
    commit, so successive stamps are strictly ordered the way the
    reference's per-transaction commit lsns are. The position is read
    ONCE and bound as a concrete literal — the reference's own
    ``UPDATE ... SET lsn = ?::pg_lsn`` shape (`LsnUpdater.java:100`);
    inlining the volatile function would re-evaluate it per row as the
    UPDATE itself writes WAL, splitting one batch across lsns. Returns
    the number of rows stamped."""
    (pos,) = conn.query("SELECT pg_current_wal_insert_lsn()").rows[0]
    res = conn.query(
        f"UPDATE events.{topic} SET lsn = {quote_literal(pos)}::pg_lsn "
        "WHERE lsn IS NULL"
    )
    return int(res.command_tag.split()[-1])


def scan_events(
    conn: PgConnection, topic: str, after: Cursor | None = None
) -> PgResult:
    """Replay scan running `core.jdbc.scan_query`'s pushdown text
    VERBATIM against the live server — the database serves the
    ``lsn IS NOT NULL AND (lsn, id) > (x, y)`` predicate from its index;
    the client never filters. Ordered by (lsn, id): the total replay
    order (`EventReplicatorWorker.java:66-72`)."""
    sub = scan_query(f"events.{topic}", after, lsn_type="pg_lsn")
    return conn.query(f"SELECT * FROM {sub} ORDER BY lsn, id")


def pgwire_scan(spark, conn: PgConnection, topic: str, after: Cursor | None = None):
    """Live rows → event-store DataFrame (id, key, timestamp, metadata,
    data, lsn-as-bigint) so replay/subscribe/analytics compose against a
    real database. Driver-side fetch by design — see the module
    docstring for why the 100 TB path is `jdbc_scan` instead."""
    res = scan_events(conn, topic, after)
    idx = {c: i for i, c in enumerate(res.columns)}
    rows = [
        (
            r[idx["id"]],
            r[idx["key"]],
            r[idx["timestamp"]],
            r[idx["metadata"]],
            r[idx["data"]],
            lsn_int(r[idx["lsn"]]),
        )
        for r in res.rows
    ]
    return spark.createDataFrame(
        rows,
        "id bigint, key string, timestamp timestamp, "
        "metadata binary, data binary, lsn bigint",
    )
