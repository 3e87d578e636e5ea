"""Live-Postgres replicator worker — `EventReplicatorWorker.java` against
the reference's native substrate, in-sandbox.

The engine's `streaming.replicate.Replicator` runs the replication
pipeline over the parquet EventStore (the 100 TB path: Structured
Streaming, Kafka-or-parquet sink, checkpointed EOS). This module is the
REFERENCE-SHAPED worker against a real PostgreSQL server over the wire
client (`core/pgwire.py`): the keyset poll loop
(`EventReplicatorWorker.java:84-118` — `SELECT ... WHERE lsn IS NOT
NULL AND (lsn, id) > (?, ?) ORDER BY lsn, id LIMIT ?`), the
transactional batch send (Kafka transaction in the reference; here the
engine's standard EOS composition: a deterministic batch directory
keyed by the batch's END cursor, overwritten on redelivery, with the
cursor committed LAST via `ProgressStore`'s atomic replace), and the
WAL-byte lag gauge (`SELECT_LAG_SQL`, `EventReplicatorWorker.java:31`).

Scale note: this worker is the reference's own single-threaded design —
one keyset page at a time off one connection. It exists for live parity
evidence; bulk backfills belong to `core.jdbc.jdbc_scan`'s lsn-range
partitioned read and the streaming Replicator.
"""

from __future__ import annotations

import os

from event_store_spark.core.cursor import Cursor
from event_store_spark.core.jdbc import scan_query
from event_store_spark.core.pgwire import PgConnection, lsn_int
from event_store_spark.core.state import ProgressStore


class PgReplicatorWorker:
    """Keyset-paginated replication of one live `*_events` table into a
    parquet topic directory, cursor in a `ProgressStore`."""

    def __init__(
        self,
        spark,
        conn: PgConnection,
        topic: str,
        out_dir: str,
        progress: ProgressStore,
        max_rows: int = 100,
    ):
        self.spark = spark
        self.conn = conn
        self.topic = topic
        self.out_dir = out_dir
        self.progress = progress
        self.max_rows = max_rows

    # ------------------------------------------------------------ polling

    def _poll(self, after: Cursor | None) -> list:
        """One keyset page: the database serves the row-value predicate
        (the S6 pushdown text VERBATIM) plus the reference's LIMIT."""
        sub = scan_query(f"events.{self.topic}", after, lsn_type="pg_lsn")
        return self.conn.query(
            f"SELECT id, key, timestamp, metadata, data, lsn FROM {sub} "
            f"ORDER BY lsn, id LIMIT {int(self.max_rows)}"
        ).rows

    def poll_and_send_batch(self, after: Cursor | None) -> Cursor | None:
        """`pollAndSendBatch` semantics: empty page → None (caller
        stops); else land the page idempotently and commit its END
        cursor, returning it.

        EOS composition (the repo's standard discipline replacing the
        reference's Kafka transaction): the batch directory name is the
        END cursor — a crash after the write but before the cursor
        commit redelivers the SAME page (same predicate, same limit,
        same order), which overwrites the same directory byte-for-byte;
        the cursor commit is one atomic JSON replace."""
        rows = self._poll(after)
        if not rows:
            return None
        *_, last = rows
        idx_id, idx_lsn = 0, 5
        end = Cursor(lsn=lsn_int(last[idx_lsn]), id=int(last[idx_id]))
        df = self.spark.createDataFrame(
            [
                (
                    int(r[0]),
                    str(r[1]),
                    r[2],
                    r[3],
                    r[4],
                    lsn_int(r[5]),
                )
                for r in rows
            ],
            "id bigint, key string, timestamp timestamp, "
            "metadata binary, data binary, lsn bigint",
        )
        batch_dir = os.path.join(
            self.out_dir, self.topic, f"batch-{end.lsn}-{end.id}"
        )
        df.write.mode("overwrite").parquet(batch_dir)
        self.progress.save(self.topic, end)
        return end

    def run(self) -> int:
        """Loop until the table is drained (the reference worker's
        `run()` without the scheduler); returns pages landed. Restart
        resumes from the stored cursor."""
        after = self.progress.last_cursor(self.topic)
        pages = 0
        while True:
            end = self.poll_and_send_batch(after)
            if end is None:
                return pages
            after = end
            pages += 1

    # -------------------------------------------------------------- gauge

    def lag(self) -> int:
        """WAL byte distance between the newest stamped event and the
        replicated cursor — `SELECT MAX(lsn) - '<cursor>'::pg_lsn`
        (SELECT_LAG_SQL verbatim semantics; 0 when drained)."""
        cur = self.progress.last_cursor(self.topic) or Cursor.zero()
        from event_store_spark.core.pgoutput import lsn_text

        (d,) = self.conn.query(
            f"SELECT COALESCE(MAX(lsn) - '{lsn_text(cur.lsn)}'::pg_lsn, 0) "
            f"FROM events.{self.topic} WHERE lsn IS NOT NULL"
        ).rows[0]
        return int(d)
