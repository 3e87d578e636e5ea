"""Live-Postgres replicator worker: keyset pages, EOS, lag gauge.

`EventReplicatorWorker.java`'s poll loop against a real server — the
database serves every keyset predicate; the engine's deterministic
batch-dir + commit-last cursor replaces the reference's Kafka
transaction.
"""

from __future__ import annotations

import os

import pytest

from event_store_spark.core.pg_replicator import PgReplicatorWorker
from event_store_spark.core.pgwire import create_events_table, stamp_lsns
from event_store_spark.core.state import ProgressStore
from tests.test_pg_live import _BINS, pg  # noqa: F401  (cluster fixture)
from tests.test_pgoutput_live import _insert

pytestmark = pytest.mark.skipif(
    not _BINS, reason="no Postgres server binaries on PATH"
)


def _landed_ids(spark, out_dir, topic):
    root = os.path.join(out_dir, topic)
    ids = []
    for d in sorted(os.listdir(root)):
        ids += [
            r["id"]
            for r in spark.read.parquet(os.path.join(root, d)).collect()
        ]
    return sorted(ids)


def test_worker_pages_drain_resume_and_lag(spark, pg, tmp_path):
    topic = "repl_worker_events"
    create_events_table(pg, topic)
    _insert(pg, topic, 7)
    assert stamp_lsns(pg, topic) == 7  # one in-batch stamp: shared lsn

    progress = ProgressStore(str(tmp_path / "progress.json"))
    out = str(tmp_path / "out")
    w = PgReplicatorWorker(spark, pg, topic, out, progress, max_rows=3)

    # 7 rows SHARE one lsn — the row-value (lsn, id) keyset must still
    # page 3+3+1 without skips or repeats (same-commit siblings)
    assert w.run() == 3
    assert _landed_ids(spark, out, topic) == [1, 2, 3, 4, 5, 6, 7]
    cur = progress.last_cursor(topic)
    assert cur is not None and cur.id == 7
    assert w.lag() == 0

    # crash-redelivery: replay the LAST page from the pre-page cursor —
    # same predicate, same dir, overwritten byte-for-byte, no dup dirs
    from event_store_spark.core.cursor import Cursor

    again = w.poll_and_send_batch(Cursor(cur.lsn, 6))
    assert (again.lsn, again.id) == (cur.lsn, cur.id)
    assert _landed_ids(spark, out, topic) == [1, 2, 3, 4, 5, 6, 7]
    assert len(os.listdir(os.path.join(out, topic))) == 3

    # unstamped rows are invisible; stamping raises the lag gauge (WAL
    # byte distance), drain returns to 0 and only NEW rows land
    _insert(pg, topic, 2)
    assert w.run() == 0  # lsn IS NULL → not yet eligible (X1 contract)
    assert stamp_lsns(pg, topic) == 2
    assert w.lag() > 0
    assert w.run() == 1
    assert _landed_ids(spark, out, topic) == list(range(1, 10))
    assert w.lag() == 0


def test_full_reference_chain_pgoutput_stamping_feeds_replication(
    spark, pg, tmp_path
):
    """The COMPLETE reference architecture, live: inserts leave lsn
    NULL → the pgoutput LsnUpdater stamps commit LSNs from the WAL →
    the replicator worker pages the stamped rows out in (lsn, id)
    order. Three transactions, the middle one multi-row: replicated
    order equals commit order, and same-commit rows stay adjacent."""
    import uuid

    from event_store_spark.core.pgoutput import LsnUpdater, ReplicationStream
    from event_store_spark.core.pgwire import PgConnection, PgError

    topic = "chain_events"
    create_events_table(pg, topic)
    pg.query(f'CREATE PUBLICATION chain_pub FOR TABLE events.{topic} '
             "WITH (publish = 'insert')")
    pg.query("SELECT pg_create_logical_replication_slot('chain_slot', 'pgoutput')")
    try:
        sock = pg.query("SHOW unix_socket_directories").rows[0][0]
        _insert(pg, topic, 1)                       # txn 1
        pg.query(
            "BEGIN; "
            f"INSERT INTO events.{topic} (key, data, timestamp) VALUES "
            f"('{uuid.uuid4()}'::uuid, '\\x0a'::bytea, now()), "
            f"('{uuid.uuid4()}'::uuid, '\\x0b'::bytea, now()); "
            "COMMIT"
        )                                           # txn 2 (two rows)
        _insert(pg, topic, 1)                       # txn 3

        repl = PgConnection(user="esp", database="postgres",
                            host=sock, replication=True)
        stream = ReplicationStream(repl, "chain_slot", "chain_pub")
        upd = LsnUpdater(stream, pg)
        assert upd.process_pending() == 4
        stream.close()
        repl.close()

        progress = ProgressStore(str(tmp_path / "p.json"))
        out = str(tmp_path / "o")
        w = PgReplicatorWorker(spark, pg, topic, out, progress, max_rows=2)
        assert w.run() == 2
        rows = []
        root = os.path.join(out, topic)
        for d in sorted(os.listdir(root)):
            rows += [
                (r["id"], r["lsn"])
                for r in spark.read.parquet(os.path.join(root, d)).collect()
            ]
        rows.sort()
        assert [i for i, _ in rows] == [1, 2, 3, 4]
        assert rows[0][1] < rows[1][1]          # commit order
        assert rows[1][1] == rows[2][1]         # txn 2's rows share the lsn
        assert rows[2][1] < rows[3][1]
        assert w.lag() == 0
    finally:
        try:
            pg.query("SELECT pg_drop_replication_slot('chain_slot')")
        except PgError:
            pass
        pg.query("DROP PUBLICATION IF EXISTS chain_pub")
