"""Kafka-path EOS contract: the full foreachBatch pipeline driven end-to-end
against an injected broker-shaped source (no broker in this environment).

Mirrors the reference's broker integration tests by behavior:
- `ReactorKafkaEventStoreIT.java:262-317` — crash mid-consumption, restart,
  every event projected exactly once
- producer at-least-once semantics: redelivered records (same (lsn, id)
  cursor at NEW broker offsets) are dropped by the consumer's per-partition
  keyset filter before the projection runs (replicate.py's documented
  consumer-side dedupe)
- offsets table stores REAL per-partition broker offsets, so a restart's
  seek(last+1) addresses actual broker positions (multi-partition safe)

The injected source is a streaming DataFrame with the exact
`format("kafka")` source schema, fed through the IDENTICAL decode
composition (`kafka_source_to_records` → `from_kafka_records`) the broker
branch uses — only `.load()` is swapped out.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from event_store_spark.core import EventStore
from event_store_spark.core.cursor import Cursor
from event_store_spark.core.state import OffsetsTable, ProgressStore
from event_store_spark.streaming import Subscription
from event_store_spark.streaming.kafka import KAFKA_SOURCE_SCHEMA
from event_store_spark.streaming.replicate import Replicator, to_kafka_records

TS = datetime.datetime(2025, 1, 4, 12, 0, 0)
TOPIC = "kc_events"
N_PARTITIONS = 2


@pytest.fixture
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "store"))


def _seed(spark, store, n=8, batches=2):
    per = n // batches
    for b in range(batches):
        rows = [
            (f"k{b * per + i}", f"p{b * per + i}", TS + datetime.timedelta(minutes=i))
            for i in range(per)
        ]
        store.append(
            TOPIC,
            spark.createDataFrame(
                rows, "key string, payload string, timestamp timestamp"
            ),
        )


class _FakeBroker:
    """Per-partition append log on parquet: assigns contiguous broker
    offsets per partition across publishes, like a real broker."""

    def __init__(self, spark, store, broker_dir, n_partitions=N_PARTITIONS):
        self.spark = spark
        self.store = store
        self.dir = broker_dir
        self.next_off = {p: 0 for p in range(n_partitions)}

    def _base_expr(self):
        """Per-partition next-offset base as a CASE chain (supports
        partitions added after construction: unknown -> base 0)."""
        expr = None
        for p, off in self.next_off.items():
            cond = F.col("partition") == p
            expr = (
                F.when(cond, F.lit(off)) if expr is None else expr.when(cond, F.lit(off))
            )
        return F.lit(0) if expr is None else expr.otherwise(F.lit(0))

    def _record_offsets(self, broker):
        for r in (
            broker.groupBy("partition").agg(F.max("offset").alias("max_off")).collect()
        ):
            self.next_off[r["partition"]] = max(
                self.next_off.get(r["partition"], 0), r["max_off"] + 1
            )

    def publish(self, only_lsn=None, force_partition=None):
        """'Produce' the store's outbound records into the broker log:
        project `to_kafka_records` output into the exact Kafka SOURCE
        schema with broker-assigned partition (hash of key, or forced) and
        per-partition contiguous offsets. One parquet file per call = one
        micro-batch under maxFilesPerTrigger=1."""
        recs = to_kafka_records(self.store.read_events(TOPIC))
        if only_lsn is not None:
            recs = recs.where(F.col("lsn") == only_lsn)
        if force_partition is not None:
            part = F.lit(force_partition).cast("int")
        else:
            part = F.pmod(F.xxhash64(F.col("key")), F.lit(N_PARTITIONS)).cast("int")
        recs = recs.withColumn("partition", part)
        w = W.partitionBy("partition").orderBy("lsn", "id")
        broker = (
            recs.withColumn(
                "offset", (F.row_number().over(w) - 1 + self._base_expr()).cast("long")
            )
            .select(
                "key",
                "value",
                F.lit(TOPIC).alias("topic"),
                "partition",
                "offset",
                F.timestamp_millis(F.col("timestamp_ms")).alias("timestamp"),
                F.lit(0).alias("timestampType"),
                "headers",
            )
        )
        assert [f.name for f in broker.schema.fields] == [
            f.split(" ")[0] for f in KAFKA_SOURCE_SCHEMA.split(", ")
        ]
        broker.coalesce(1).write.mode("append").parquet(self.dir)
        self._record_offsets(broker)

    def end_offset(self, p: int) -> int:
        """Last assigned offset per partition (-1 when empty)."""
        return self.next_off[p] - 1

    def accept(self, out):
        """Producer-side entry: receive the exact (key, value, headers)
        frame `Replicator(sink="kafka")` hands Spark's Kafka sink and append
        it to the broker log like a real broker — partition by key hash,
        contiguous per-partition offsets, broker-stamped LogAppendTime
        (Spark's sink cannot forward event time; the documented gap)."""
        hdr = lambda n: F.expr(  # noqa: E731
            f"decode(filter(headers, h -> h.key = '{n}')[0].value, 'UTF-8')"
        ).cast("long")
        part = F.pmod(F.xxhash64(F.col("key")), F.lit(N_PARTITIONS)).cast("int")
        recs = out.withColumn("partition", part).withColumn("_lsn", hdr("lsn")).withColumn("_id", hdr("id"))
        w = W.partitionBy("partition").orderBy("_lsn", "_id")
        broker = (
            recs.withColumn(
                "offset", (F.row_number().over(w) - 1 + self._base_expr()).cast("long")
            )
            .select(
                "key",
                "value",
                F.lit(TOPIC).alias("topic"),
                "partition",
                "offset",
                F.lit(TS).cast("timestamp").alias("timestamp"),
                F.lit(1).alias("timestampType"),  # LogAppendTime
                "headers",
            )
        )
        broker.coalesce(1).write.mode("append").parquet(self.dir)
        self._record_offsets(broker)

    def log_rows(self) -> int:
        return self.spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(self.dir).count()


def _subscription(spark, store, offsets, broker_dir, ckpt, partitions=None):
    raw = lambda s: (  # noqa: E731 — injected broker-shaped streaming source
        s.readStream.schema(KAFKA_SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(broker_dir)
    )
    return Subscription(
        store,
        offsets,
        ckpt,
        source="kafka",
        bootstrap_servers="injected:9092",
        partitions=partitions if partitions is not None else list(range(N_PARTITIONS)),
        kafka_raw_source=raw,
    )


def test_kafka_eos_crash_resume_and_producer_redelivery(spark, store, tmp_path):
    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    # two publishes = two files = two micro-batches
    broker.publish(only_lsn=1)
    broker.publish(only_lsn=2)
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []
    crashed = {"done": False}

    def processor(df, batch_id):
        rows = df.select("lsn", "id", "data").collect()
        if rows and not crashed["done"] and batch_id >= 1:
            # crash BEFORE effects on the second batch's first delivery —
            # the worst-case consumer death the reference IT simulates
            crashed["done"] = True
            raise RuntimeError("simulated consumer crash")
        seen.extend((r["lsn"], r["id"]) for r in rows)

    sub = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck"))
    q = sub.run(TOPIC, processor)
    try:
        q.awaitTermination(120)
    except Exception as e:
        assert "simulated consumer crash" in str(e)
    assert crashed["done"]

    # restart with the same checkpoint: the crashed batch redelivers and
    # processes; already-committed batches are skipped by batch id
    q = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck")).run(
        TOPIC, processor
    )
    q.awaitTermination(120)

    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert len(seen) == len(expected) == 8  # exactly once, no dup, no skip
    assert set(seen) == expected
    # offsets table stores REAL broker offsets per partition (seek target)
    for p in range(N_PARTITIONS):
        assert offsets.get(TOPIC, p) == broker.end_offset(p)
        assert offsets.get_cursor(TOPIC, p) is not None

    # producer redelivery: the SAME events re-produced at NEW broker offsets
    # (at-least-once Kafka sink retry) — consumer must drop every record via
    # the per-partition keyset filter yet still advance broker offsets
    broker.publish()
    q = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck")).run(
        TOPIC, processor
    )
    q.awaitTermination(120)
    assert len(seen) == 8  # zero duplicate projections
    for p in range(N_PARTITIONS):
        assert offsets.get(TOPIC, p) == broker.end_offset(p)  # consumed anyway


def test_kafka_producer_crash_resume_duplicates_dropped_end_to_end(
    spark, store, tmp_path
):
    """Full produce→broker→consume loop on the kafka branch, with the
    producer crash the reference IT simulates on the replicator side
    (`EventReplicatorWorker` dies AFTER the Kafka send, BEFORE the progress
    commit): the redelivered micro-batch re-produces the same events at new
    broker offsets (at-least-once sink), and the consumer's per-partition
    keyset filter projects each event exactly once anyway."""
    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    progress = ProgressStore(str(tmp_path / "progress.json"))
    calls = {"n": 0}

    def crashing_sink(out):
        broker.accept(out)  # the send reached the broker...
        calls["n"] += 1
        if calls["n"] == 1:  # ...then the worker dies before progress.save
            raise RuntimeError("simulated producer crash after produce")

    def replicator(ckpt):
        return Replicator(
            store,
            str(tmp_path / "target"),
            progress,
            ckpt,
            max_files_per_trigger=1,
            sink="kafka",
            bootstrap_servers="injected:9092",
            kafka_record_sink=crashing_sink,
        )

    q = replicator(str(tmp_path / "rck")).replicate(TOPIC)
    with pytest.raises(Exception, match="simulated producer crash"):
        q.awaitTermination(120)
    # crash committed nothing: the cursor never advanced past zero (an
    # empty part-file batch may have legitimately recorded a zero cursor)
    assert calls["n"] == 1
    assert (progress.last_cursor(TOPIC) or Cursor.zero()) == Cursor.zero()

    # restart, same checkpoint: the uncommitted batch re-runs — its keyset
    # filter still passes (cursor never advanced) so the SAME events are
    # produced AGAIN at new broker offsets, then replication completes
    q = replicator(str(tmp_path / "rck")).replicate(TOPIC)
    q.awaitTermination(120)
    assert progress.last_cursor(TOPIC) is not None
    n_events = store.read_events(TOPIC).count()
    assert n_events == 8
    assert broker.log_rows() > n_events  # duplicates really reached the log

    # consume the duplicate-bearing broker log: exactly-once projection
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    q = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck")).run(
        TOPIC, processor
    )
    q.awaitTermination(120)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert len(seen) == 8 and set(seen) == expected
    for p in range(N_PARTITIONS):
        assert offsets.get(TOPIC, p) == broker.end_offset(p)


def test_kafka_lagging_partition_not_dropped_by_other_partitions_cursor(
    spark, store, tmp_path
):
    """Per-partition cursors, not a global one: after partition 0 advances
    to a high (lsn, id), a LATER batch delivering partition 1's older
    (lsn, id) rows must still reach the processor (Kafka only orders within
    a partition — a single topic-level cursor would drop them, the exact
    multi-partition bug ADVICE r2 flagged)."""
    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    # partition 0 receives the NEWER lsn=2 rows first; partition 1 receives
    # the OLDER lsn=1 rows in a later batch (cross-partition lag)
    broker.publish(only_lsn=2, force_partition=0)
    broker.publish(only_lsn=1, force_partition=1)
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    q = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck")).run(
        TOPIC, processor
    )
    q.awaitTermination(120)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(seen) == expected and len(seen) == 8  # lsn=1 rows NOT dropped


def test_kafka_lag_gauge_refuses_file_semantics(spark, store, tmp_path):
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    sub = Subscription(
        store,
        offsets,
        str(tmp_path / "ck"),
        source="kafka",
        bootstrap_servers="b:9092",
    )
    with pytest.raises(ValueError, match="broker"):
        sub.lag(TOPIC)


def test_kafka_partition_add_consumed_then_deduped(spark, store, tmp_path):
    """Broker repartition (`ReactorKafkaEventStoreIT.java` partition-growth
    edge): the topic grows a partition the subscription was never
    configured with. First contact consumes the new partition's records
    (no cursor -> vacuous keyset pass) and RECORDS it in the offsets
    table; a later redelivery of the same records at new broker offsets is
    then dedupe-filtered even though the static partition list still
    doesn't know the partition."""
    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    broker.publish(only_lsn=1)  # hashed over the 2 configured partitions
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    ck = str(tmp_path / "ck")
    q = _subscription(spark, store, offsets, broker.dir, ck).run(TOPIC, processor)
    q.awaitTermination(120)
    n_first = len(seen)

    # repartition: lsn=2 lands on brand-new partition 2
    broker.publish(only_lsn=2, force_partition=2)
    q = _subscription(spark, store, offsets, broker.dir, ck).run(TOPIC, processor)
    q.awaitTermination(120)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(seen) == expected and len(seen) == 8
    assert offsets.get(TOPIC, 2) == broker.end_offset(2)  # discovered + recorded
    assert 2 in offsets.partitions(TOPIC)

    # at-least-once redelivery of partition 2's records at NEW offsets
    broker.publish(only_lsn=2, force_partition=2)
    q = _subscription(spark, store, offsets, broker.dir, ck).run(TOPIC, processor)
    q.awaitTermination(120)
    assert len(seen) == 8, "partition-2 redelivery must be dedupe-filtered"
    assert offsets.get(TOPIC, 2) == broker.end_offset(2)  # consumed anyway
    assert n_first + 4 == 8  # sanity: lsn=2 contributed the other half


def test_kafka_rebalance_new_lineage_straddled_cursors(spark, store, tmp_path):
    """Rebalance analog (`ReactorKafkaEventStoreIT.java:262-317` restart
    family): a NEW consumer instance with a FRESH checkpoint (batch ids
    restart at 0) takes over mid-stream while the per-partition cursors
    straddle different depths (p0's high-water (lsn, id) is OLDER than
    p1's). The full broker log redelivers; each partition must be filtered
    by ITS OWN cursor — no duplicates from either partition, and the
    not-yet-consumed tail must flow through."""
    _seed(spark, store, n=12, batches=3)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    broker.publish(only_lsn=1, force_partition=0)  # older data -> p0
    broker.publish(only_lsn=2, force_partition=1)  # newer data -> p1
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    q = _subscription(
        spark, store, offsets, broker.dir, str(tmp_path / "ckA")
    ).run(TOPIC, processor)
    q.awaitTermination(120)
    assert len(seen) == 8
    # straddle: p0's cursor (from lsn=1) is strictly older than p1's
    c0, c1 = offsets.get_cursor(TOPIC, 0), offsets.get_cursor(TOPIC, 1)
    assert (c0.lsn, c0.id) < (c1.lsn, c1.id)

    # the lagging partition receives the NEWEST rows before the rebalance
    broker.publish(only_lsn=3, force_partition=0)

    # new instance, new checkpoint: batch ids restart; every broker file
    # redelivers under the new lineage
    q = _subscription(
        spark, store, offsets, broker.dir, str(tmp_path / "ckB")
    ).run(TOPIC, processor)
    q.awaitTermination(120)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(seen) == expected
    assert len(seen) == 12  # zero dups from either partition, zero skips
    for p in (0, 1):
        assert offsets.get(TOPIC, p) == broker.end_offset(p)


def test_kafka_gcd_partition_resumes_past_retention_gap(spark, store, tmp_path):
    """Out-of-range seek (`ReactorKafkaEventStoreIT.java` retention edge):
    the offsets table knows partition 1 through offset K, but the broker
    GC'd those segments — the live log now starts far beyond K+1. The
    consumer must process the surviving records exactly once and jump its
    stored offset across the retention gap (a real broker needs
    failOnDataLoss=false for the seek itself; the post-seek bookkeeping is
    what this pins)."""
    from event_store_spark.core.cursor import Cursor
    from event_store_spark.streaming.kafka import kafka_reader_options
    from event_store_spark.streaming.subscribe import kafka_starting_offsets
    import json

    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    # the table remembers consuming p1 through offset 5 (cursor from the
    # GC'd era: lsn=1's high water)
    gc_cursor = Cursor(1, 4)
    offsets.upsert(TOPIC, 5, partition=1, cursor=gc_cursor)
    # broker log for p1 restarts at offset 100 — everything before is gone
    broker.next_off[1] = 100
    broker.publish(only_lsn=2, force_partition=1)

    # the startingOffsets JSON a real broker would receive seeks 6 — out of
    # range once segments are GC'd; failOnDataLoss=false is the documented
    # reset path and must be expressible through the option builder
    assert json.loads(kafka_starting_offsets(offsets, TOPIC, [1]))[TOPIC]["1"] == 6
    opts = kafka_reader_options(
        "b:9092", TOPIC, offsets, [1], fail_on_data_loss=False
    )
    assert opts["failOnDataLoss"] == "false"

    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    q = _subscription(
        spark, store, offsets, broker.dir, str(tmp_path / "ck"), partitions=[1]
    ).run(TOPIC, processor)
    q.awaitTermination(120)
    lsn2 = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).where("lsn = 2").select("lsn", "id").collect()
    }
    assert set(seen) == lsn2 and len(seen) == 4  # survivors, exactly once
    # stored offset jumped the retention gap to the real broker position
    assert offsets.get(TOPIC, 1) == broker.end_offset(1) >= 100
    got = offsets.get_cursor(TOPIC, 1)
    assert (got.lsn, got.id) > (gc_cursor.lsn, gc_cursor.id)


def test_kafka_topic_without_partition_zero(spark, store, tmp_path):
    """The batch-id carrier is partition 0's offsets row — an IMPLICIT
    invariant flagged by VERDICT r4: a topic whose live partitions are
    {1, 2} (partition 0 reassigned/empty forever) must still get
    exactly-once batch skipping via the synthetic partition-0 bookkeeping
    row, and redeliveries must still dedupe."""
    _seed(spark, store, n=8, batches=2)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"), n_partitions=3)
    broker.publish(only_lsn=1, force_partition=1)
    broker.publish(only_lsn=2, force_partition=2)
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    ck = str(tmp_path / "ck")
    q = _subscription(
        spark, store, offsets, broker.dir, ck, partitions=[1, 2]
    ).run(TOPIC, processor)
    q.awaitTermination(120)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(seen) == expected and len(seen) == 8
    # the synthetic p0 row carries the batch id even though no p0 records exist
    assert offsets.last_batch_id(TOPIC, 0) is not None
    assert offsets.get(TOPIC, 0) == -1  # and no phantom consumption

    # re-run on the same checkpoint: committed batches skip wholesale
    q = _subscription(
        spark, store, offsets, broker.dir, ck, partitions=[1, 2]
    ).run(TOPIC, processor)
    q.awaitTermination(120)
    assert len(seen) == 8


def test_kafka_checkpoint_loss_duplicate_window_is_one_batch(
    spark, store, tmp_path
):
    """VERDICT r6 #3 — the Kafka-sink EOS contract, bounded and pinned.

    The reference sends events + cursor in ONE Kafka transaction
    (`EventReplicatorWorker.java:184-208`), so its read_committed
    consumers never see duplicates. Spark's Kafka sink has no
    transactions; after CHECKPOINT LOSS the replicator runs in recovery
    mode filtering by the cursor FROZEN at query start. The duplicate
    window foreign consumers can observe is therefore EXACTLY the rows of
    the one micro-batch that reached the broker but whose progress save
    did not land before the crash (≤ maxFilesPerTrigger files' rows) —
    never the relisted backlog, never more than one batch. Consumers
    going through this engine's Subscription recover exactly-once via the
    (lsn, id) keyset dedupe regardless. Contract documented in
    MIGRATION.md ("Kafka sink duplicate window")."""
    _seed(spark, store, n=8, batches=4)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    progress = ProgressStore(str(tmp_path / "progress.json"))
    calls = {"n": 0}
    crashed_batch_rows: set[tuple[int, int]] = set()

    def _row_keys(out) -> set[tuple[int, int]]:
        hdr = lambda n: F.expr(  # noqa: E731
            f"decode(filter(headers, h -> h.key = '{n}')[0].value, 'UTF-8')"
        ).cast("long")
        return {
            (r["l"], r["i"])
            for r in out.select(hdr("lsn").alias("l"), hdr("id").alias("i")).collect()
        }

    def crashing_sink(out):
        keys = _row_keys(out)
        broker.accept(out)  # the send reached the broker...
        calls["n"] += 1
        if calls["n"] == 3 and keys:
            # ...then the worker dies before progress.save for THIS batch
            crashed_batch_rows.update(keys)
            raise RuntimeError("simulated crash after produce")

    def replicator(ckpt, sink_fn):
        return Replicator(
            store,
            str(tmp_path / "target"),
            progress,
            ckpt,
            max_files_per_trigger=1,
            sink="kafka",
            bootstrap_servers="injected:9092",
            kafka_record_sink=sink_fn,
        )

    q = replicator(str(tmp_path / "rck1"), crashing_sink).replicate(TOPIC)
    with pytest.raises(Exception, match="simulated crash"):
        q.awaitTermination(120)
    assert crashed_batch_rows  # the crash really straddled a non-empty batch
    frozen = progress.last_cursor(TOPIC) or Cursor.zero()
    # the frozen cursor covers everything BEFORE the crashed batch
    assert all((lsn, i) > (frozen.lsn, frozen.id) for lsn, i in crashed_batch_rows)

    # checkpoint LOSS: restart under a brand-new lineage (recovery mode)
    q = replicator(str(tmp_path / "rck2"), broker.accept).replicate(TOPIC)
    q.awaitTermination(120)
    assert progress.last_cursor(TOPIC) is not None

    # broker-log census: the crashed batch's rows appear EXACTLY twice,
    # every other row exactly once — the duplicate window is one batch
    hdr = lambda n: F.expr(  # noqa: E731
        f"decode(filter(headers, h -> h.key = '{n}')[0].value, 'UTF-8')"
    ).cast("long")
    log = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(broker.dir)
    census = {
        (r["l"], r["i"]): r["n"]
        for r in log.select(hdr("lsn").alias("l"), hdr("id").alias("i"))
        .groupBy("l", "i")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(census) == expected  # nothing lost, nothing alien
    for key, n in census.items():
        if key in crashed_batch_rows:
            assert n == 2, f"{key}: duplicate window must cover the crashed batch"
        else:
            assert n == 1, f"{key}: duplicated outside the crashed batch"

    # and a Subscription over the duplicate-bearing log is still EOS
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    seen: list[tuple[int, int]] = []

    def processor(df, batch_id):
        seen.extend((r["lsn"], r["id"]) for r in df.select("lsn", "id").collect())

    q = _subscription(spark, store, offsets, broker.dir, str(tmp_path / "ck")).run(
        TOPIC, processor
    )
    q.awaitTermination(120)
    assert sorted(seen) == sorted(expected)


def _hdr_long(name):
    return F.expr(
        f"decode(filter(headers, h -> h.key = '{name}')[0].value, 'UTF-8')"
    ).cast("long")


def _broker_census(spark, broker):
    log = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(broker.dir)
    return {
        (r["l"], r["i"]): r["n"]
        for r in log.select(_hdr_long("lsn").alias("l"), _hdr_long("id").alias("i"))
        .groupBy("l", "i")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_kafka_readback_recovery_is_true_exactly_once(spark, store, tmp_path):
    """With a readable target topic, recovery absorbs what the broker
    already has (the files sink's anti-join pattern pointed at the
    broker): after a crash-after-produce AND checkpoint loss, the rerun
    re-produces NOTHING that landed — even foreign read_committed
    consumers see every event exactly once. The stronger branch of
    VERDICT r6 #3 ('true-EOS test green')."""
    _seed(spark, store, n=8, batches=4)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    progress = ProgressStore(str(tmp_path / "progress.json"))
    calls = {"n": 0}

    def crashing_sink(out):
        broker.accept(out)
        calls["n"] += 1
        if calls["n"] == 3 and out.count():
            raise RuntimeError("simulated crash after produce")

    def replicator(ckpt, sink_fn, reader=None):
        return Replicator(
            store,
            str(tmp_path / "target"),
            progress,
            ckpt,
            max_files_per_trigger=1,
            sink="kafka",
            bootstrap_servers="injected:9092",
            kafka_record_sink=sink_fn,
            kafka_record_reader=reader,
        )

    q = replicator(str(tmp_path / "rck1"), crashing_sink).replicate(TOPIC)
    with pytest.raises(Exception, match="simulated crash"):
        q.awaitTermination(120)

    # checkpoint LOSS + read-back reader: zero duplicates end to end
    reader = lambda topic: spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(  # noqa: E731
        broker.dir
    )
    q = replicator(str(tmp_path / "rck2"), broker.accept, reader).replicate(TOPIC)
    q.awaitTermination(120)

    census = _broker_census(spark, broker)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(census) == expected
    assert all(n == 1 for n in census.values()), {
        k: n for k, n in census.items() if n != 1
    }


def test_kafka_readback_converges_after_torn_batch(spark, store, tmp_path):
    """A crash MID-produce (only half a batch landed) converges under
    read-back recovery: the rerun produces exactly the missing rows —
    no loss, no duplicates. The frozen-cursor fallback cannot do this
    (it re-produces the whole batch); the anti-join absorbs row-by-row."""
    _seed(spark, store, n=8, batches=4)
    broker = _FakeBroker(spark, store, str(tmp_path / "broker"))
    progress = ProgressStore(str(tmp_path / "progress.json"))
    calls = {"n": 0}

    def tearing_sink(out):
        calls["n"] += 1
        if calls["n"] == 3 and out.count():
            # half the batch reaches the broker, then the producer dies
            broker.accept(out.where(_hdr_long("id") % 2 == 0))
            raise RuntimeError("simulated torn produce")
        broker.accept(out)

    def replicator(ckpt, sink_fn, reader=None):
        return Replicator(
            store,
            str(tmp_path / "target"),
            progress,
            ckpt,
            max_files_per_trigger=1,
            sink="kafka",
            bootstrap_servers="injected:9092",
            kafka_record_sink=sink_fn,
            kafka_record_reader=reader,
        )

    q = replicator(str(tmp_path / "rck1"), tearing_sink).replicate(TOPIC)
    with pytest.raises(Exception, match="torn produce"):
        q.awaitTermination(120)

    reader = lambda topic: spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(  # noqa: E731
        broker.dir
    )
    q = replicator(str(tmp_path / "rck2"), broker.accept, reader).replicate(TOPIC)
    q.awaitTermination(120)

    census = _broker_census(spark, broker)
    expected = {
        (r["lsn"], r["id"])
        for r in store.read_events(TOPIC).select("lsn", "id").collect()
    }
    assert set(census) == expected  # the torn batch's missing half landed
    assert all(n == 1 for n in census.values()), {
        k: n for k, n in census.items() if n != 1
    }
