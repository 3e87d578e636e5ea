"""Subscribe: streaming consumption with offsets-table exactly-once (X3).

Re-expresses `ReactorKafkaEventStore.subscribe` (reference:
`ReactorKafkaEventStore.java:233-246` + intended-usage doc :214-232): the
caller gets a stream of events and composes per-batch processing with an
offset update so that a crash never skips work and never re-runs a batch
whose offset committed (`ReactorKafkaEventStoreIT.java:262-317`). The
residual window — crash after the processor's external effects but before
the offset commit — re-runs that one batch, so projections into external
systems must be idempotent per batch id (see `eos.py`); the reference
avoids the window by putting projection+offset in one DB transaction.

Spark shape: the event table is a file-source streaming DataFrame (new
parquet files = new events, in append order); processing runs in
``foreachBatch`` wrapped by :func:`exactly_once_batch`; the offsets table
records the high-water cursor + batch id in one atomic update. The source
checkpoint gives redelivery-with-same-id; the wrapper gives idempotence.

Scale: the file source scales to object-store event logs (listing cost is
amortized via maxFilesPerTrigger — the analog of the reference's batched
pulls, `EventReplicatorWorker.java:71,134`); ``source="kafka"`` consumes a
broker directly through `streaming.kafka` (format("kafka") + offsets-table
seek + read_committed) with the SAME decoded event shape, so the EOS
composition in `run()` is source-agnostic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from event_store_spark.core.cursor import Cursor
from event_store_spark.core.state import OffsetsTable
from event_store_spark.core.store import EventStore
from event_store_spark.streaming.eos import exactly_once_batch


class Subscription:
    """Streaming consumption of one event table with offsets-table EOS."""

    def __init__(
        self,
        store: EventStore,
        offsets: OffsetsTable,
        checkpoint_root: str,
        max_files_per_trigger: int | None = None,
        source: str = "files",
        bootstrap_servers: str | None = None,
        partitions: list[int] | None = None,
    ):
        if source not in ("files", "kafka"):
            raise ValueError("source must be 'files' or 'kafka'")
        if source == "kafka" and not bootstrap_servers:
            raise ValueError("kafka source requires bootstrap_servers")
        self.store = store
        self.offsets = offsets
        self.checkpoint_root = checkpoint_root
        self.max_files_per_trigger = max_files_per_trigger
        self.source = source
        self.bootstrap_servers = bootstrap_servers
        self.partitions = partitions or [0]

    def _spark(self) -> SparkSession:
        return self.store.spark

    def stream(self, topic: str) -> DataFrame:
        """Streaming DataFrame over the event table (decode-on-read, T6).

        ``source="kafka"`` consumes the broker directly: `format("kafka")`
        with read_committed isolation and `startingOffsets` seeked from the
        offsets table (S4/S5, `ReactorKafkaEventStore.java:233-291`);
        ``source="files"`` streams the parquet event table. Both yield the
        same decoded event shape, so `run()`'s EOS composition is
        source-agnostic.
        """
        if self.source == "kafka":
            from event_store_spark.streaming.kafka import kafka_stream

            extra = {}
            if self.max_files_per_trigger:
                # O2 batching: the offset-count analog of maxFilesPerTrigger
                extra["maxOffsetsPerTrigger"] = str(self.max_files_per_trigger)
            return kafka_stream(
                self._spark(),
                self.bootstrap_servers,
                topic,
                self.offsets,
                self.partitions,
                **extra,
            )
        path = self.store.topic_path(topic)
        schema = self._spark().read.parquet(path).schema
        reader = self._spark().readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.parquet(path)

    def run(
        self,
        topic: str,
        processor: Callable[[DataFrame, int], None],
        available_now: bool = True,
    ) -> StreamingQuery:
        """Process the topic exactly once per micro-batch.

        ``processor(batch_df, batch_id)`` is the user projection; after it
        returns, the offsets table records the batch's high-water (lsn, id)
        cursor and batch id in one atomic update. Redelivered batches are
        skipped before the processor runs.
        """

        def process_and_offset(df: DataFrame, batch_id: int) -> None:
            processor(df, batch_id)
            stats = df.agg(
                F.max(F.struct("lsn", "id")).alias("hw"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            prev_offset = self.offsets.get(topic)
            if stats.n:
                # the stored offset is a 0-based running consumed-row index
                # (Kafka-offset semantics): last consumed = prev + batch rows,
                # making the lag gauge pure arithmetic (A2)
                cursor = Cursor(stats.hw["lsn"], stats.hw["id"])
                self.offsets.upsert(
                    topic, prev_offset + stats.n, batch_id=batch_id, cursor=cursor
                )
            else:
                # empty redelivery: record the batch id but PRESERVE the
                # consumed position (overwriting with -1 would reset the
                # gauge and drop the resume cursor)
                self.offsets.upsert(
                    topic,
                    prev_offset,
                    batch_id=batch_id,
                    cursor=self.offsets.get_cursor(topic),
                )

        fn = exactly_once_batch(
            topic,
            process_and_offset,
            get_last_batch_id=self.offsets.last_batch_id,
            commit=lambda t, b: None,  # committed atomically inside upsert
        )
        writer = (
            self.stream(topic)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", f"{self.checkpoint_root}/{topic}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def lag(self, topic: str) -> int:
        """Consumer lag (A2 analog): events appended beyond the last
        processed position, as O(1) arithmetic — appended total (from the
        store's append ticket) minus consumed count (from the offsets
        table). The reference's gauge is likewise end-offset − processed − 2
        (txn-marker correction, `ReactorKafkaEventStore.java:379-400`);
        without Kafka transaction markers the correction term is zero.
        Round 1 computed this with a full keyset scan-and-count — an
        O(table) Spark job per gauge read."""
        ticket = self.store.high_water(topic)
        total = ticket["total"] if ticket else 0
        consumed = self.offsets.get(topic) + 1  # stored as 0-based index
        return total - consumed


def kafka_starting_offsets(
    offsets: OffsetsTable, topic: str, partitions: list[int]
) -> str:
    """`startingOffsets` JSON for a Kafka source resuming from the offsets
    table — seek(lastOffset + 1) per partition (O5,
    `ReactorKafkaEventStore.java:270-278`). Offset −1 (nothing consumed)
    maps to Kafka's -2 ("earliest") sentinel.

    Usage with a real broker:
        spark.readStream.format("kafka")
             .option("subscribe", topic)
             .option("kafka.isolation.level", "read_committed")
             .option("startingOffsets", kafka_starting_offsets(...))
    (No broker or kafka-sql connector exists in this environment, so this
    builder is unit-tested and the file-source path is the integration-tested
    substrate; swapping sources changes nothing in the EOS composition.)
    """
    import json

    per_partition = {}
    for p in partitions:
        last = offsets.get(topic, p)
        per_partition[str(p)] = -2 if last < 0 else last + 1
    return json.dumps({topic: per_partition})
