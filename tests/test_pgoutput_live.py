"""LIVE pgoutput leg: S8 (WAL logical-replication source) + F5 (message
dispatch) + the reference's asynchronous lsn-updater architecture.

Round 12: until now S8/F5 were "absent by design" — the in-batch lsn
stamp replaced the reference's standalone lsn-updater process because no
live Postgres existed here. With the throwaway cluster running at
wal_level=logical and the wire client speaking walsender mode, the
reference-shaped architecture (`LsnUpdater.java`,
`PgOutputMessageParser.java`) executes for real: a publication + slot
(`init.sql:12-16` shape), INSERTs flowing through pgoutput, commit LSNs
stamped asynchronously, restart resuming after the last acked commit.

Parser unit tests mirror PgOutputMessageParserTest.java on hand-built
buffers (no server needed); the live tests reuse test_pg_live's cluster
fixture.
"""

from __future__ import annotations

import struct
import uuid
from datetime import datetime, timezone

import pytest

from event_store_spark.core.pgoutput import (
    BeginMessage,
    CommitMessage,
    InsertMessage,
    LsnUpdater,
    PgOutputParser,
    RelationMessage,
    ReplicationStream,
    lsn_text,
)
from event_store_spark.core.pgwire import (
    PgConnection,
    PgError,
    create_events_table,
    insert_event,
    lsn_int,
    scan_events,
)
from tests.test_pg_live import _BINS, pg  # noqa: F401  (cluster fixture)

pytestmark = pytest.mark.skipif(
    not _BINS, reason="no Postgres server binaries on PATH"
)


# ------------------------------------------------- parser (unit, no server)

def _relation_buf(rel_id=17, schema="events", table="test_events"):
    cols = [("id", 20), ("key", 2950)]
    body = struct.pack("!ci", b"R", rel_id)
    body += schema.encode() + b"\x00" + table.encode() + b"\x00"
    body += b"d" + struct.pack("!h", len(cols))
    for name, oid in cols:
        body += b"\x01" + name.encode() + b"\x00" + struct.pack("!ii", oid, -1)
    return body


def _insert_buf(rel_id=17, values=("42", "k")):
    body = struct.pack("!cic h", b"I", rel_id, b"N", len(values))
    for v in values:
        if v is None:
            body += b"n"
        else:
            body += b"t" + struct.pack("!i", len(v)) + v.encode()
    return body


def test_parses_begin_commit_roundtrip():
    p = PgOutputParser()
    begin = p.parse(struct.pack("!cqqi", b"B", 0x1_0000_0A00, 777_000_000, 901))
    assert begin == BeginMessage(0x1_0000_0A00, 777_000_000, 901)
    commit = p.parse(
        struct.pack("!cbqqq", b"C", 0, 0x1_0000_0A00, 0x1_0000_0A48, 777_000_000)
    )
    assert commit == CommitMessage(0, 0x1_0000_0A00, 0x1_0000_0A48, 777_000_000)
    assert begin.final_lsn == commit.commit_lsn


def test_parses_relation_then_insert_full_tuple():
    p = PgOutputParser()
    rel = p.parse(_relation_buf())
    assert isinstance(rel, RelationMessage)
    assert (rel.relation.schema, rel.relation.table) == ("events", "test_events")
    assert rel.columns == ("id", "key")
    ins = p.parse(_insert_buf(values=("42", None)))
    assert isinstance(ins, InsertMessage)
    assert ins.id == 42 and ins.values == ("42", None)
    assert ins.relation is rel.relation


def test_insert_before_relation_fails():
    with pytest.raises(PgError, match="before its RELATION"):
        PgOutputParser().parse(_insert_buf())


def test_unexpected_tuple_type_fails():
    p = PgOutputParser()
    p.parse(_relation_buf())
    bad = struct.pack("!cic", b"I", 17, b"O")
    with pytest.raises(PgError, match="tuple type"):
        p.parse(bad)


def test_f5_unhandled_message_types_are_skipped():
    """UPDATE/DELETE/TRUNCATE/ORIGIN/TYPE/anything else → None, exactly
    the reference dispatch (PgOutputMessageParser.java:95-101)."""
    p = PgOutputParser()
    for t in (b"U", b"D", b"T", b"O", b"Y", b"M", b"Z"):
        assert p.parse(t + b"\x00" * 30) is None
    assert p.parse(b"") is None


# ---------------------------------------------------------- live S8 stream

def _setup_slot(pg, topic, slot, pub):
    pg.query(f'CREATE PUBLICATION {pub} FOR TABLE events.{topic} '
             "WITH (publish = 'insert')")
    pg.query(f"SELECT pg_create_logical_replication_slot('{slot}', 'pgoutput')")


def _insert(pg, topic, n, payload=b"d"):
    for _ in range(n):
        insert_event(pg, topic, uuid.uuid4(), payload,
                     datetime.now(timezone.utc))


def test_s8_stream_yields_begin_insert_commit_with_matching_lsns(pg):
    topic = "s8_stream_events"
    create_events_table(pg, topic)
    _setup_slot(pg, topic, "esp_s8_slot", "esp_s8_pub")
    try:
        repl = PgConnection(user="esp", database="postgres",
                            host=pg_sockdir(pg), replication=True)
        stream = ReplicationStream(repl, "esp_s8_slot", "esp_s8_pub")
        pg.query(
            "BEGIN; "
            f"INSERT INTO events.{topic} (key, data, timestamp) VALUES "
            f"('{uuid.uuid4()}'::uuid, '\\x01'::bytea, now()), "
            f"('{uuid.uuid4()}'::uuid, '\\x02'::bytea, now()); "
            "COMMIT"
        )
        parser = PgOutputParser()
        seen = []
        while len([m for m in seen if isinstance(m, CommitMessage)]) < 1:
            got = stream.poll(timeout=5.0)
            assert got is not None, f"stream idle before COMMIT; saw {seen}"
            msg = parser.parse(got[1])
            if msg is not None:
                seen.append(msg)
        kinds = [type(m).__name__ for m in seen]
        assert kinds == [
            "BeginMessage", "RelationMessage",
            "InsertMessage", "InsertMessage", "CommitMessage",
        ], kinds
        begin, _rel, i1, i2, commit = seen
        # both inserts belong to ONE transaction whose commit LSN the
        # walsender announced up front (BEGIN.final_lsn)
        assert begin.final_lsn == commit.commit_lsn
        assert i2.id == i1.id + 1
        assert i1.relation.table == topic
        stream.close()
        repl.close()
    finally:
        _teardown_slot(pg, "esp_s8_slot", "esp_s8_pub")


def test_lsn_updater_stamps_commit_lsns_and_resumes_after_restart(pg):
    """The full reference architecture end-to-end: inserts leave lsn
    NULL; the worker stamps each row with its transaction's commit LSN
    (shared within a txn, strictly increasing across txns); replay then
    serves the total (lsn, id) order; and a RESTARTED worker resumes
    from the slot's acked position — already-stamped rows are not
    replayed (O5's last+1 seek, WAL form)."""
    topic = "s8_updater_events"
    create_events_table(pg, topic)
    _setup_slot(pg, topic, "esp_upd_slot", "esp_upd_pub")
    try:
        sock = pg_sockdir(pg)

        def run_worker():
            repl = PgConnection(user="esp", database="postgres",
                                host=sock, replication=True)
            stream = ReplicationStream(
                repl, "esp_upd_slot", "esp_upd_pub")
            sql = PgConnection(user="esp", database="postgres", host=sock)
            upd = LsnUpdater(stream, sql)
            n = upd.process_pending()
            stream.close()
            repl.close()
            sql.close()
            return n

        _insert(pg, topic, 2)          # txn 1, txn 2 (autocommit each)
        pg.query(
            "BEGIN; "
            f"INSERT INTO events.{topic} (key, data, timestamp) VALUES "
            f"('{uuid.uuid4()}'::uuid, '\\x03'::bytea, now()), "
            f"('{uuid.uuid4()}'::uuid, '\\x04'::bytea, now()); "
            "COMMIT"
        )                              # txn 3: two rows, one commit lsn
        assert run_worker() == 4
        rows = pg.query(
            f"SELECT id, lsn FROM events.{topic} ORDER BY id").rows
        assert all(lsn is not None for _id, lsn in rows)
        lsns = [lsn_int(lsn) for _id, lsn in rows]
        assert lsns[0] < lsns[1] < lsns[2]          # per-txn commits increase
        assert lsns[2] == lsns[3]                   # one txn → one commit lsn
        # replay total order is served by the database
        replay = scan_events(pg, topic)
        assert [r[0] for r in replay.rows] == [r[0] for r in rows]

        # restart: new worker, same slot — only NEW rows arrive
        _insert(pg, topic, 1)
        assert run_worker() == 1
        again = pg.query(
            f"SELECT id, lsn FROM events.{topic} ORDER BY id").rows
        assert [r[:2] for r in again[:4]] == [r[:2] for r in rows]  # unchanged
        assert lsn_int(again[4][1]) > lsns[3]
    finally:
        _teardown_slot(pg, "esp_upd_slot", "esp_upd_pub")


def test_updates_on_stamped_rows_do_not_reenter_the_stream(pg):
    """publish='insert' keeps the worker's own UPDATEs out of the
    slot — no feedback loop (the reference relies on the same publication
    setting, init.sql:14)."""
    topic = "s8_noloop_events"
    create_events_table(pg, topic)
    _setup_slot(pg, topic, "esp_nl_slot", "esp_nl_pub")
    try:
        sock = pg_sockdir(pg)
        repl = PgConnection(user="esp", database="postgres",
                            host=sock, replication=True)
        stream = ReplicationStream(repl, "esp_nl_slot", "esp_nl_pub")
        sql = PgConnection(user="esp", database="postgres", host=sock)
        upd = LsnUpdater(stream, sql)
        _insert(pg, topic, 2)
        assert upd.process_pending() == 2
        # drain again: the two UPDATEs the worker just issued must not
        # have produced further INSERT messages
        assert upd.process_pending(idle_timeout=0.3) == 0
        stream.close()
        repl.close()
        sql.close()
    finally:
        _teardown_slot(pg, "esp_nl_slot", "esp_nl_pub")


def pg_sockdir(pg) -> str:
    """Recover the fixture cluster's socket directory from the live
    connection (unix_socket_directories is a reported GUC only when set
    via SHOW; ask the server)."""
    return pg.query("SHOW unix_socket_directories").rows[0][0]


def _teardown_slot(pg, slot, pub):
    try:
        pg.query(f"SELECT pg_drop_replication_slot('{slot}')")
    except PgError:
        pass
    try:
        pg.query(f"DROP PUBLICATION IF EXISTS {pub}")
    except PgError:
        pass


def test_lsn_text_roundtrip():
    for v in (0, 1, 0xFFFF_FFFF, 0x1_0000_0000, 0x12A_0050_3228):
        assert lsn_int(lsn_text(v)) == v


def test_s8_native_structured_streaming_source(spark, pg, tmp_path):
    """The WAL as a real `readStream.format("pgoutput")` source: rows
    arrive with their transaction's commit LSN (shared within a txn,
    increasing across txns), Spark checkpoints offsets, and a RESTART
    from the same checkpoint emits only transactions committed after
    the stop — the slot is only advanced from commit(), after Spark has
    durably recorded the offset."""
    import time

    from event_store_spark.streaming.pgoutput_source import PgOutputDataSource

    topic = "s8_source_events"
    create_events_table(pg, topic)
    _setup_slot(pg, topic, "esp_src_slot", "esp_src_pub")
    spark.dataSource.register(PgOutputDataSource)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.format("pgoutput")
            .option("host", pg_sockdir(pg))
            .option("user", "esp")
            .option("database", "postgres")
            .option("slot", "esp_src_slot")
            .option("publication", "esp_src_pub")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="500 milliseconds")
            .start()
        )

    def rows():
        try:
            return sorted(
                (r["event_id"], r["lsn"], r["topic"], r["vals"])
                for r in spark.read.parquet(out).collect()
            )
        except Exception:
            return []

    def wait_rows(n, timeout=60):
        t0 = time.time()
        while time.time() - t0 < timeout:
            got = rows()
            if len(got) >= n:
                return got
            time.sleep(0.5)
        raise AssertionError(f"only {len(rows())} rows after {timeout}s")

    try:
        q = start()
        _insert(pg, topic, 2)              # txn 1, txn 2
        pg.query(
            "BEGIN; "
            f"INSERT INTO events.{topic} (key, data, timestamp) VALUES "
            f"('{uuid.uuid4()}'::uuid, '\\x05'::bytea, now()), "
            f"('{uuid.uuid4()}'::uuid, '\\x06'::bytea, now()); "
            "COMMIT"
        )                                  # txn 3: one commit lsn
        got = wait_rows(4)
        assert [g[0] for g in got] == [1, 2, 3, 4]
        assert got[0][1] < got[1][1] < got[2][1]   # txn lsns increase
        assert got[2][1] == got[3][1]              # one txn, one lsn
        assert all(g[2] == topic for g in got)
        assert [g[3][0] for g in got] == ["1", "2", "3", "4"]  # id col text
        q.stop()

        _insert(pg, topic, 1)              # committed while source is DOWN
        q2 = start()
        got = wait_rows(5)
        assert [g[0] for g in got] == [1, 2, 3, 4, 5]  # no re-emission
        q2.stop()
    finally:
        _teardown_slot(pg, "esp_src_slot", "esp_src_pub")
