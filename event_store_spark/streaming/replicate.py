"""Replicate: exactly-once, commit-order replication of event tables (X2).

Re-expresses the reference's Postgres→Kafka replicator
(`EventReplicator.java` + `EventReplicatorWorker.java`):

| reference | here |
|---|---|
| keyset scan `WHERE lsn IS NOT NULL AND (lsn,id) > cursor ORDER BY lsn,id LIMIT n` (`EventReplicatorWorker.java:66-72`) | streaming micro-batches + in-batch keyset filter; `maxFilesPerTrigger` bounds batch size (O2) |
| Kafka txn {events + cursor} (`:184-208`) | cursor-keyed idempotent `foreachBatch`: each batch's row range overwrites a directory named by its high-water cursor, then the cursor is saved atomically — redelivery overwrites, checkpoint loss cannot skip or duplicate |
| record shape: key/value/ts + headers incl. `id`,`lsn`, sorted (T7/O4, `:187-230`) | outbound projection with `headers: array<struct<key,value>>` canonically sorted |
| compacted progress topic, last-write-wins (S9, `EventReplicator.java:215-256`) | :class:`ProgressStore` (atomic JSON; Delta/DB in prod) |
| per-topic worker threads (`:174-183`) | one streaming query per topic |
| advisory-lock single writer (X4, `LockManager.java:45-84` + `LockMonitor.java:52-58`) | :class:`streaming.lock.LockManager` lease: acquire at query start (second writer refused), heartbeat per micro-batch, query failure on loss |

Scale: replication never globally sorts — micro-batches arrive in append
(lsn) order from the file source and `sortWithinPartitions` restores the
within-batch (lsn, id) order cheaply. Downstream consumers that need total
order replay via `(lsn, id)` exactly like the reference's consumers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from event_store_spark.core.cursor import Cursor, keyset_after
from event_store_spark.core.envelope import canonical_metadata_entries
from event_store_spark.core.state import ProgressStore
from event_store_spark.core.store import EventStore
from event_store_spark.streaming.lock import LockManager


def to_kafka_records(df: DataFrame) -> DataFrame:
    """Envelope → outbound record shape (T7): key bytes, payload/data value,
    epoch-ms timestamp, canonically sorted headers including id + lsn."""
    if "data" in df.columns:
        value = F.col("data")
    else:
        from pyspark.sql import types as T

        ptype = df.schema["payload"].dataType
        if isinstance(ptype, (T.StructType, T.MapType, T.ArrayType)):
            value = F.encode(F.to_json("payload"), "UTF-8")
        elif isinstance(ptype, T.BinaryType):
            value = F.col("payload")
        else:
            value = F.encode(F.col("payload").cast("string"), "UTF-8")
    meta = F.coalesce(
        canonical_metadata_entries(F.col("metadata")),
        F.array().cast("array<struct<key:string,value:binary>>"),
    )
    extra = F.array(
        F.struct(F.lit("id").alias("key"), F.encode(F.col("id").cast("string"), "UTF-8").alias("value")),
        F.struct(F.lit("lsn").alias("key"), F.encode(F.col("lsn").cast("string"), "UTF-8").alias("value")),
    )
    return df.select(
        F.col("key"),
        value.alias("value"),
        F.unix_millis(F.col("timestamp").cast("timestamp_ltz")).alias("timestamp_ms"),
        F.array_sort(F.concat(extra, meta)).alias("headers"),
        F.col("lsn"),
        F.col("id"),
    )


def from_kafka_records(df: DataFrame) -> DataFrame:
    """Inbound record → event shape (T6): ``data`` = value, timestamp from
    epoch-ms, metadata = {partition?, offset?, header.*} as map<string,binary>.

    Mirrors `ReactorKafkaEventTransformer.java:128-145,169-190`: consumption
    metadata (partition/offset when present, plus every header) is exposed
    read-only on the event. Header-borne ``lsn``/``id`` are also lifted back
    into typed envelope columns for replay ordering.
    """
    meta_cols = [
        F.struct(F.lit(c).alias("key"), F.encode(F.col(c).cast("string"), "UTF-8").alias("value"))
        for c in ("partition", "offset")
        if c in df.columns
    ]
    entries = F.concat(
        F.array(*meta_cols) if meta_cols else F.array().cast("array<struct<key:string,value:binary>>"),
        F.coalesce(F.col("headers"), F.array().cast("array<struct<key:string,value:binary>>")),
    )
    header = lambda name: F.expr(  # noqa: E731 - one-line header lookup
        f"filter(headers, h -> h.key = '{name}')[0].value"
    )
    return df.select(
        F.decode(header("id"), "UTF-8").cast("long").alias("id"),
        F.col("key"),
        F.timestamp_millis(F.col("timestamp_ms")).alias("timestamp"),
        F.map_from_entries(entries).alias("metadata"),
        F.decode(header("lsn"), "UTF-8").cast("long").alias("lsn"),
        F.col("value").alias("data"),
    )


class Replicator:
    """Exactly-once replication of one or more event tables to record tables."""

    def __init__(
        self,
        store: EventStore,
        target_root: str,
        progress: ProgressStore,
        checkpoint_root: str,
        max_files_per_trigger: int | None = None,
        sink: str = "files",
        bootstrap_servers: str | None = None,
        lock: LockManager | None = None,
        kafka_record_sink=None,
    ):
        if sink not in ("files", "kafka"):
            raise ValueError("sink must be 'files' or 'kafka'")
        if sink == "kafka" and not bootstrap_servers:
            raise ValueError("kafka sink requires bootstrap_servers")
        self.store = store
        self.target_root = target_root
        self.progress = progress
        self.checkpoint_root = checkpoint_root
        self.max_files_per_trigger = max_files_per_trigger
        self.sink = sink
        self.bootstrap_servers = bootstrap_servers
        self.lock = lock
        #: injection seam for broker-less contract tests / custom producers:
        #: a callable receiving each batch's (key, value, headers) sink
        #: frame; when set, the kafka branch calls it instead of
        #: `.write.format("kafka").save()` — everything upstream (keyset
        #: filter, record projection, cursor save) runs unchanged.
        self.kafka_record_sink = kafka_record_sink

    def target_path(self, topic: str) -> str:
        return f"{self.target_root}/{topic}"

    def replicate(self, topic: str, available_now: bool = True) -> StreamingQuery:
        spark = self.store.spark
        path = self.store.topic_path(topic)
        if self.lock is not None and not self.lock.acquire():
            # X4: refuse to start a second writer (LockManager.java:45-84 —
            # pg_try_advisory_lock returning false)
            raise RuntimeError(
                "another replicator instance holds the lock; refusing to "
                "start a second writer (X4)"
            )
        self.prune_uncommitted(topic)
        schema = spark.read.parquet(path).schema
        reader = spark.readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(path)

        def sink(df: DataFrame, batch_id: int) -> None:
            if self.lock is not None and not self.lock.heartbeat():
                # lock lost mid-run (lease stolen after an apparent death):
                # fail the query before writing — the streaming analog of
                # LockMonitor's exit(1) (`LockMonitor.java:52-58`, X6)
                raise RuntimeError("replicator lock lost; failing query (X4/X6)")
            cursor = self.progress.last_cursor(topic) or Cursor.zero()
            batch = df.where(keyset_after(cursor))  # F1 eligibility predicate
            # cache so the high-water agg and the write evaluate the
            # (maxFilesPerTrigger-bounded) batch once, not twice
            records = to_kafka_records(batch).sortWithinPartitions("lsn", "id").persist()
            try:
                hw = records.agg(F.max(F.struct("lsn", "id"))).first()[0]
                if hw is None:
                    # nothing past the cursor (redelivery of fully-replicated
                    # data, or an empty trigger) — just record the batch id
                    self.progress.save(topic, cursor, batch_id=batch_id)
                    return
                new_cursor = Cursor(hw["lsn"], hw["id"])
                if self.sink == "kafka":
                    # Broker-native path (S2/S3): produce (key, value,
                    # headers) records. The reference wraps events + the
                    # progress record in ONE Kafka transaction
                    # (`EventReplicatorWorker.java:184-208`); Spark's Kafka
                    # sink is at-least-once, so exactly-once is restored on
                    # the consumer side by the (lsn, id) header cursor —
                    # redelivered records carry an already-seen cursor and
                    # are dropped by Subscription's per-partition keyset
                    # filter (`subscribe.Subscription._kafka_process_and_offset`,
                    # F1) before any projection runs.
                    from event_store_spark.streaming.kafka import (
                        kafka_writer_options,
                        records_to_kafka_sink,
                    )

                    out = records_to_kafka_sink(records)
                    if self.kafka_record_sink is not None:
                        self.kafka_record_sink(out)
                    else:
                        (
                            out.write.format("kafka")
                            .options(
                                **kafka_writer_options(self.bootstrap_servers, topic)
                            )
                            .save()
                        )
                else:
                    # Idempotence is keyed by the batch's high-water CURSOR,
                    # not the Spark batch id: a crash between this write and
                    # the progress save redelivers the same row range, which
                    # OVERWRITES the same directory (the Spark-file analog of
                    # the reference's Kafka transaction) — and unlike batch
                    # ids, cursors stay monotone even if the streaming
                    # checkpoint is lost. The residual hole — crash AND
                    # checkpoint loss re-chunks batches so redelivered ranges
                    # land in differently-named directories — is closed by
                    # prune_uncommitted() at query start (X2).
                    records.write.mode("overwrite").parquet(
                        f"{self.target_path(topic)}/cursor={new_cursor.serialize().replace(':', '_')}"
                    )
                self.progress.save(topic, new_cursor, batch_id=batch_id)
            finally:
                records.unpersist()

        writer = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{self.checkpoint_root}/{topic}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def prune_uncommitted(self, topic: str) -> list[str]:
        """Remove target cursor-directories beyond the saved progress cursor.

        They are uncommitted: a crash between a cursor-directory write and
        the progress save, followed by checkpoint loss, re-chunks micro-
        batches — the rerun writes the same rows under differently-named
        cursor directories while the orphan (rows beyond the saved cursor)
        would remain as duplicates. Progress is the commit record; anything
        past it is rolled back here, then rewritten by the new run. Runs
        under the topic's single writer (X4), so no live query owns these.
        """
        import shutil

        saved = self.progress.last_cursor(topic) or Cursor.zero()
        target = self.target_path(topic)
        if not os.path.isdir(target):
            return []
        pruned = []
        for entry in sorted(os.listdir(target)):
            if not entry.startswith("cursor="):
                continue
            cur = Cursor.parse(entry[len("cursor="):].replace("_", ":"))
            if cur > saved:
                shutil.rmtree(os.path.join(target, entry))
                pruned.append(entry)
        return pruned

    def replicate_all(self, available_now: bool = True) -> list[StreamingQuery]:
        """One query per discovered `_events` table (S7/F2 + per-topic workers)."""
        return [self.replicate(t, available_now) for t in self.store.topics()]

    def lag(self, topic: str) -> int:
        """WAL-distance analog: MAX(lsn) − replicated cursor (A1)."""
        cursor = self.progress.last_cursor(topic) or Cursor.zero()
        return self.store.lag(topic, cursor)
