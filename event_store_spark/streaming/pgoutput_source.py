"""`spark.readStream.format("pgoutput")` — the WAL as a native
Structured Streaming source (S8, Spark-idiomatic form).

`core/pgoutput.py` gives the repo the reference's standalone tailer
(`LsnUpdater.java` shape: a loop stamping rows). This module lifts the
same stream into Spark 4's Python data source API so the WAL composes
with everything Structured Streaming offers — checkpointed offsets,
foreachBatch EOS sinks, watermarked aggregations — exactly how the
reference's Kafka consumer source (S4) composes on the Kafka side:

    spark.dataSource.register(PgOutputDataSource)
    df = (spark.readStream.format("pgoutput")
          .option("host", sockdir).option("user", "app")
          .option("database", "events")
          .option("slot", "event_lsn_updater")
          .option("publication", "event_lsn_publication")
          .load())

Offset/exactly-once contract (the slot IS the source of truth):
- the reader (driver-side, `SimpleDataSourceStreamReader`) polls the
  replication stream and emits only COMPLETE transactions; the offset
  after a batch is the last complete transaction's `end_lsn`;
- the standby-status ack that durably advances the slot is sent ONLY
  from ``commit()`` — i.e. after Spark has checkpointed the offset — so
  a crash at any earlier point replays the unacked tail from the slot
  on reconnect (at-least-once from the server, exactly-once after
  Spark's offset gate, the S4 `kafka_starting_offsets` discipline
  with the slot playing the offsets table);
- ``readBetweenOffsets`` re-filters replayed transactions to
  ``start < end_lsn <= end`` for deterministic batch reconstruction.

Scale shape: one driver-side tailer per source (the WAL is a single
totally-ordered stream — parallelism below a partitioned scan is
meaningless here, same single-walsender shape as the reference);
downstream transformations fan out normally. Rows are
(topic, event_id, commit_lsn, commit_ts_us, xid, values) with values
text-decoded per pgoutput v1.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

#: suffix filter matching the reference worker (F2/LsnUpdater rule)
TOPIC_SUFFIX = "_events"

SCHEMA = (
    "topic string, event_id bigint, lsn bigint, "
    "commit_ts_us bigint, xid int, vals array<string>"
)


class PgOutputDataSource(DataSource):
    """Register with ``spark.dataSource.register(PgOutputDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "pgoutput"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return PgOutputStreamReader(self.options)


class PgOutputStreamReader(SimpleDataSourceStreamReader):
    """Driver-side tailer over one logical slot."""

    def __init__(self, options):
        self._opts = dict(options)
        self._conn = None
        self._stream = None
        self._parser = None

    # ------------------------------------------------------------ plumbing

    def _ensure(self):
        if self._stream is not None:
            return
        import time

        from event_store_spark.core.pgoutput import (
            PgOutputParser,
            ReplicationStream,
        )
        from event_store_spark.core.pgwire import PgConnection, PgError

        o = self._opts
        deadline = time.monotonic() + float(o.get("acquire_seconds", 20))
        while True:
            self._conn = PgConnection(
                user=o["user"],
                database=o.get("database", "postgres"),
                host=o.get("host", "/tmp"),
                port=int(o.get("port", 5432)),
                password=o.get("password"),
                replication=True,
            )
            try:
                self._stream = ReplicationStream(
                    self._conn, o["slot"], o["publication"]
                )
                break
            except PgError as e:
                # restart race: the previous reader's walsender still
                # holds the slot until its process/socket tears down
                self._conn.close()
                self._conn = None
                if "is active" not in str(e) or time.monotonic() > deadline:
                    raise
                time.sleep(0.5)
        self._parser = PgOutputParser()

    def _poll_txns(self, idle_timeout: float):
        """Yield complete transactions as (end_lsn, [row, ...]) until the
        stream goes idle OUTSIDE a transaction."""
        from event_store_spark.core.pgoutput import (
            BeginMessage,
            CommitMessage,
            InsertMessage,
        )

        self._ensure()
        cur: list | None = None
        begin = None
        while True:
            try:
                got = self._stream.poll(timeout=idle_timeout)
            except (ConnectionError, OSError):
                # server restart / walsender drop: forget the dead
                # stream so the NEXT call reconnects (the slot replays
                # the unacked tail — no data loss), and let Spark's
                # retry surface this attempt's failure
                self._stream = None
                self._conn = None
                raise
            if got is None:
                if cur is None:
                    return
                continue  # mid-transaction: the COMMIT is on its way
            msg = self._parser.parse(got[1])
            if isinstance(msg, BeginMessage):
                cur, begin = [], msg
            elif isinstance(msg, InsertMessage) and cur is not None:
                if msg.relation.table.endswith(TOPIC_SUFFIX):
                    cur.append(
                        (
                            msg.relation.table,
                            msg.id,
                            begin.final_lsn,
                            begin.commit_ts_us,
                            begin.xid,
                            list(msg.values),
                        )
                    )
            elif isinstance(msg, CommitMessage):
                yield msg.end_lsn, cur or []
                cur, begin = None, None

    # ------------------------------------------------------------- reader

    def initialOffset(self) -> dict:  # noqa: N802
        return {"lsn": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:  # noqa: N802
        rows: list = []
        last = start.get("lsn", 0)
        for end_lsn, txn_rows in self._poll_txns(
            float(self._opts.get("poll_seconds", 0.5))
        ):
            # the slot re-delivers every unacked transaction after a
            # restart; anything at or below the checkpointed offset was
            # already emitted in a previous batch — skip, don't re-emit
            if end_lsn > start.get("lsn", 0):
                rows.extend(txn_rows)
                last = max(last, end_lsn)
        return iter(rows), {"lsn": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:  # noqa: N802
        """Deterministic replay: the slot re-delivers everything after
        the last ack; keep only transactions in (start, end]."""
        lo, hi = start.get("lsn", 0), end.get("lsn", 0)
        rows: list = []
        for end_lsn, txn_rows in self._poll_txns(
            float(self._opts.get("poll_seconds", 0.5))
        ):
            if lo < end_lsn <= hi:
                rows.extend(txn_rows)
            if end_lsn >= hi:
                break
        return iter(rows)

    def commit(self, end: dict) -> None:  # noqa: N802
        """Spark has durably recorded offsets ≤ end — only now advance
        the slot, so crash-replay windows stay replayable."""
        self._ensure()
        self._stream.ack(end.get("lsn", 0))
