"""EventStore — append-only event tables on Parquet with (lsn, id) ordering.

The Spark-native re-expression of the reference's write/read paths:

- ``append(topic, df)`` ≙ `PostgresEventStore.save` (validate → serialize →
  [encrypt] → insert; `PostgresEventStore.java:109-142`), with one key
  difference by design (SURVEY §7 X1): the commit-order component ``lsn`` is
  assigned *synchronously inside the committed batch* as a monotone append
  epoch, so rows are immediately replicable — no async WAL-tailing stamper
  (`LsnUpdater.java`) is needed, because a Spark batch append is atomic.
- ``read_events(topic)`` / ``replay(topic, after)`` ≙ the replicator's
  ordered keyset scan `WHERE lsn IS NOT NULL AND (lsn, id) > (:lsn, :id)
  ORDER BY lsn, id` (`EventReplicatorWorker.java:66-72`).
- ``topics()`` ≙ `_events`-suffix discovery (`EventReplicator.java:197-204`).
- ``lag(topic, cursor)`` ≙ the replication-lag gauge `MAX(lsn) − cursor`
  (`EventReplicatorWorker.java:242-248`).

Scale posture: one directory per topic; each append writes parquet files
whose (lsn, id) min/max footer stats give keyset-predicate file skipping —
the same role the reference's lsn index plays. Appends never shuffle: id
assignment is `monotonically_increasing_id()` (partition-local), and replay
order is reconstructed from (lsn, id) at read time. A single writer per
topic is assumed, mirroring the reference's advisory-lock single-writer
model (`LockManager.java:45-84`); multi-writer coordination would move the
lsn ticket into a lock service or table MERGE.
"""

from __future__ import annotations

import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.core.cursor import Cursor, keyset_after
from event_store_spark.core.envelope import (
    KEY_TYPES,
    canonical_key,
    truncate_millis,
    typed_key_view,
    validate_metadata,
)
from event_store_spark.core.state import TicketStore, TopicMutex

TOPIC_SUFFIX = "_events"


class EventStore:
    """Append-only, (lsn, id)-ordered event tables under a root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tickets = TicketStore(os.path.join(root, "_meta", "tickets.json"))
        self._append_mutex = TopicMutex(os.path.join(root, "_meta", "locks"))

    # ------------------------------------------------------------- paths

    def topic_path(self, topic: str) -> str:
        self._check_topic(topic)
        return os.path.join(self.root, topic)

    @staticmethod
    def _check_topic(topic: str) -> None:
        if not topic or not topic.endswith(TOPIC_SUFFIX):
            raise ValueError(
                f"topic must end in '{TOPIC_SUFFIX}' "
                "(reference: EventReplicator.java:74, LsnUpdater.java:102)"
            )

    def create_topic(self, topic: str) -> str:
        """Provision an event table directory (X7 analog —
        `EventReplicator.java:156-171` creates replicated topics with
        unlimited retention; parquet directories retain by construction)."""
        path = self.topic_path(topic)
        os.makedirs(path, exist_ok=True)
        return path

    def topics(self) -> list[str]:
        """Discover event tables (suffix filter, F2/S7)."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if d.endswith(TOPIC_SUFFIX) and os.path.isdir(os.path.join(self.root, d))
        )

    # ------------------------------------------------------------- write

    def append(
        self,
        topic: str,
        df: DataFrame,
        key_type: str = "string",
        validate: bool = True,
        partition_by_day: bool = False,
    ) -> Cursor:
        """Append a batch of events; returns the batch's high-water cursor.

        Input columns: ``key`` (typed), a payload column (``payload`` of any
        type, or pre-encoded ``data: binary``), optional ``timestamp``
        (defaults to now, ms-truncated — Event.java:102-104) and optional
        ``metadata: map<string,binary>``.

        All rows of one append share one ``lsn`` (same-commit siblings,
        exactly the invariant the reference's commit-LSN stamping provides);
        ``id`` is unique within the append.

        Scale: an append touches ONLY the incoming batch — the next lsn,
        layout and key-type checks come from the :class:`TicketStore`
        bookkeeping (O(1)), and the batch's high-water id is computed from
        the cached batch itself, never by re-reading the topic. The round-1
        implementation paid two O(table) scans per append (MAX(lsn) +
        post-write re-read); at 100 TB that is two million-file listings
        per append.

        Concurrency: the reserve (read ticket → next lsn → save) and the
        data write run under a per-topic :class:`TopicMutex`, so concurrent
        appends to one topic serialize instead of both reserving the same
        lsn — the advisory-lock single-writer invariant the reference holds
        (`LockManager.java:45-84`), enforced per append rather than assumed.
        """
        if key_type not in KEY_TYPES:
            raise ValueError(f"key_type must be one of {KEY_TYPES}")
        if "key" not in df.columns:
            raise ValueError("input must have a 'key' column")
        payload_cols = [c for c in df.columns if c in ("payload", "data")]
        if not payload_cols:
            raise ValueError("input must have a 'payload' or 'data' column")
        if validate:
            validate_metadata(df)

        self._recover_compaction(topic)
        self._append_mutex.acquire(topic)
        try:
            return self._append_locked(
                topic, df, key_type, partition_by_day, payload_cols
            )
        finally:
            self._append_mutex.release(topic)

    def _recover_compaction(self, topic: str) -> None:
        """Heal a compaction interrupted between its two directory renames.

        ``compact`` swaps via ``rename(path, path.old)`` then
        ``rename(path.compacted, path)`` — a crash between them leaves the
        topic directory MISSING with all data stranded in ``.old``. Publish
        of ``.compacted`` completes before the first rename, so when the
        topic dir is absent: a data-bearing ``.compacted`` means the swap
        can be FINISHED (roll forward); otherwise ``.old`` is restored
        (roll back). Either way no committed row is lost. With the topic
        dir present, a lingering ``.old`` is post-swap debris (the mutex
        excludes an in-flight compact) and is dropped. ``.compacting`` is
        never touched here — it may belong to a live compaction's
        pre-mutex write. Cheap no-op unless crash evidence exists.
        """
        path = self.topic_path(topic)
        old, ordered = f"{path}.old", f"{path}.compacted"
        if not os.path.isdir(old):
            return
        self._append_mutex.acquire(topic)
        try:
            if not os.path.isdir(old):  # raced with another healer
                return
            if not os.path.exists(path):
                if os.path.isdir(ordered) and self._has_data(ordered):
                    os.rename(ordered, path)  # roll forward
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(old, path)  # roll back
                    shutil.rmtree(ordered, ignore_errors=True)
            else:
                shutil.rmtree(old, ignore_errors=True)
        finally:
            self._append_mutex.release(topic)

    def _append_locked(
        self,
        topic: str,
        df: DataFrame,
        key_type: str,
        partition_by_day: bool,
        payload_cols: list[str],
    ) -> Cursor:
        ticket = self._ticket(topic)
        if ticket is not None:
            if ticket["day_partitioned"] != partition_by_day:
                raise ValueError(
                    f"topic {topic!r} layout is "
                    f"{'day-partitioned' if ticket['day_partitioned'] else 'flat'}; "
                    "appends must match the established layout"
                )
            if ticket["key_type"] != key_type:
                raise ValueError(
                    f"topic {topic!r} stores {ticket['key_type']!r} keys; cannot "
                    f"append {key_type!r} keys (reference: one key type per "
                    "table, events_schema.sql DDL)"
                )
        lsn = (ticket["lsn"] if ticket else 0) + 1
        ts = (
            F.col("timestamp").cast("timestamp_ltz")
            if "timestamp" in df.columns
            else F.current_timestamp()
        )
        metadata = (
            F.col("metadata")
            if "metadata" in df.columns
            else F.lit(None).cast("map<string,binary>")
        )
        body = [
            canonical_key(F.col("key"), key_type).alias("key"),
            F.lit(key_type).alias("key_type"),
            truncate_millis(ts).alias("timestamp"),
            metadata.alias("metadata"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[F.col(c) for c in payload_cols],
        ]
        if partition_by_day:
            # Assign ids AFTER an in-partition day sort: each (task, dt)
            # output file then holds one disjoint ascending id range, so the
            # ordered publication below yields a total (lsn, id) visibility
            # order even across dt= subdirectories. The sort is partition-
            # local — appends stay shuffle-free.
            src = df.withColumn(
                "__dt", F.to_date(truncate_millis(ts))
            ).sortWithinPartitions("__dt")
            out = src.select(
                F.monotonically_increasing_id().alias("id"),
                *body,
                F.col("__dt").alias("dt"),
            )
        else:
            out = df.select(F.monotonically_increasing_id().alias("id"), *body)
        # Persist so the high-water agg and the write see the SAME partition
        # evaluations (monotonically_increasing_id is deterministic per
        # partition layout; the cache removes even recompute-order risk).
        # Both jobs are O(batch): new data only, bounded, spills if large.
        out = out.persist()
        try:
            stats = out.agg(
                F.max("id").alias("max_id"), F.count(F.lit(1)).alias("n")
            ).first()
            if stats.n == 0:
                return (
                    Cursor(ticket["lsn"], ticket["max_id"])
                    if ticket
                    else Cursor.zero()
                )
            # MERGE-guard (multi-writer coordination, PERF.md design made
            # real): re-verify mutex ownership immediately before the
            # irrevocable lsn reservation. A writer paused past the
            # heartbeat (SIGSTOP, long GC) can have its lock stolen and a
            # second writer reserve the SAME lsn; aborting here turns that
            # silent cursor corruption into a loud retryable failure.
            if not self._append_mutex.owns(topic):
                raise RuntimeError(
                    f"append lost the topic mutex for {topic!r} before the "
                    "lsn reservation (stolen after a heartbeat lapse?); "
                    "nothing was committed - retry the append"
                )
            # Reserve the ticket BEFORE the data write: a crash in between
            # leaves an lsn gap (harmless), while write-then-save could
            # reissue the same lsn to two appends (cursor corruption). The
            # reservation also claims this append's publication-clock range
            # [clock_start+1, clock_start+n] (one tick per data file; files
            # ≤ rows), so concurrent-topic appends never collide on clocks.
            prev_clock = ticket.get("clock", 0) if ticket else 0
            clock_start = max(prev_clock, int(time.time() * 1000))
            self._tickets.save(
                topic,
                lsn=lsn,
                max_id=stats.max_id,
                total=(ticket["total"] if ticket else 0) + stats.n,
                key_type=key_type,
                day_partitioned=partition_by_day,
                clock=clock_start + stats.n,
            )
            # Stage-then-publish: write the batch OUTSIDE the topic dir,
            # then move each data file into place in (lsn, id) order with a
            # strictly increasing mtime/name sequence. Stream sources order
            # file pickup by (modTime, path); without this, two appends
            # committed within one mtime tick interleave alphabetically
            # (part-00000-<uuidA> < part-00000-<uuidB> < part-00001-<uuidA>)
            # and the Replicator/Subscription keyset cursor silently drops
            # the out-of-order rows. Publication order IS commit order —
            # the role the reference's WAL ordering plays
            # (EventReplicatorWorker.java:66-72 keyset scan). Local-FS
            # semantics; on object stores back the topic with a
            # transactional table format instead.
            # per-TOPIC staging subdirectory: the orphan sweep below must
            # never touch another topic's staging, and topic names may
            # contain any legal character (a name-prefix match would let
            # 'foo_events' delete 'foo_events-eu_events'-in-flight batches)
            topic_staging_root = os.path.join(self.root, "_staging", topic)
            if os.path.isdir(topic_staging_root):
                # orphans from a crashed append to THIS topic (we hold its
                # mutex, so no live writer owns them): unpublished staging is
                # simply a lost batch — its lsn stays a gap, as documented
                shutil.rmtree(topic_staging_root, ignore_errors=True)
            staging = os.path.join(topic_staging_root, f"{lsn}-{uuid.uuid4().hex}")
            writer = out.sortWithinPartitions("id").write
            if partition_by_day:
                # hive-style dt= layout: time-range replay prunes whole
                # partitions statically (the 100 TB event-table layout);
                # (lsn, id) file stats still prune within each day
                writer = writer.partitionBy("dt")
            try:
                writer.parquet(staging)
                published = self._publish_ordered(
                    staging, self.topic_path(topic), clock_start
                )
                # Reconcile the clock to ticks actually CONSUMED: the
                # reservation above is one tick per ROW (files ≤ rows, and
                # the file count isn't known until the write finishes), but
                # publication spends one per FILE — without this re-save the
                # clock (and published mtimes) would drift unboundedly ahead
                # of wall-clock under sustained row throughput. A crash
                # before this line leaves the over-reservation in place:
                # bounded (one batch's rows) and safe, merely sparse.
                self._tickets.save(
                    topic,
                    lsn=lsn,
                    max_id=stats.max_id,
                    total=(ticket["total"] if ticket else 0) + stats.n,
                    key_type=key_type,
                    day_partitioned=partition_by_day,
                    clock=clock_start + published,
                )
            finally:
                shutil.rmtree(staging, ignore_errors=True)
        finally:
            out.unpersist()
        return Cursor(lsn, stats.max_id)

    @staticmethod
    def _publish_ordered(staging: str, final: str, clock_start: int) -> int:
        """Move staged data files into the topic dir in id order, each with
        the next publication-clock tick as both its mtime and its sortable
        file-name sequence — so modTime order AND path order agree with
        commit order, whichever a stream source sorts by. Files land one
        rename at a time, oldest id range first: a concurrent listing sees a
        commit-order prefix, never an out-of-order subset.

        Returns the number of files published (= clock ticks consumed);
        the caller reconciles the ticket clock with it."""
        import pyarrow.parquet as pq

        files = []
        for dirpath, _dirs, names in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                m = re.search(r"part-(\d+)", n)
                files.append(
                    (
                        int(m.group(1)) if m else 0,
                        "" if rel == "." else rel,
                        os.path.join(dirpath, n),
                    )
                )
        # (task index, dt): ascending id ranges by construction — ids are
        # partition-local blocks, day-sorted within each task before
        # assignment, and ISO dt= names sort chronologically
        files.sort()
        seq = 0
        for _part, rel, src in files:
            if pq.ParquetFile(src).metadata.num_rows == 0:
                continue  # empty task output carries no ids to order
            seq += 1
            clk = clock_start + seq
            dest_dir = os.path.join(final, rel) if rel else final
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"part-{clk:020d}-{uuid.uuid4().hex}.parquet")
            # stamp the clock mtime on the STAGED file: rename preserves it,
            # so the published file never transiently exposes its wall-clock
            # write mtime to a concurrent listing
            os.utime(src, ns=(clk * 1_000_000, clk * 1_000_000))
            os.rename(src, dest)
        return seq

    def _ticket(self, topic: str) -> dict | None:
        """The topic's append ticket; recovered by one explicit scan for
        topics written before the ticket store existed (or after losing it —
        the parquet data remains the source of truth)."""
        ticket = self._tickets.get(topic)
        if ticket is not None:
            return ticket
        path = self.topic_path(topic)
        if not self._has_data(path):
            return None
        df = self.spark.read.parquet(path)
        row = df.agg(
            F.max(F.struct("lsn", "id")).alias("hw"),
            F.count(F.lit(1)).alias("n"),
            F.any_value("key_type").alias("kt"),
        ).first()
        ticket = {
            "lsn": row.hw["lsn"],
            "max_id": row.hw["id"],
            "total": row.n,
            "key_type": row.kt,
            "day_partitioned": self._is_day_partitioned(topic),
            # resume the publication clock past every existing file's mtime
            # so recovered topics keep publishing in commit order
            "clock": int(
                max(
                    (os.path.getmtime(f) for f in self._parquet_files(path)),
                    default=0.0,
                )
                * 1000
            ),
        }
        self._tickets.save(topic, **ticket)
        return ticket

    def high_water(self, topic: str) -> dict | None:
        """Bookkept high-water facts ``{lsn, max_id, total, ...}`` (O(1) once
        ticketed) — the substrate for lag gauges and resume decisions."""
        return self._ticket(topic)

    def repair_ticket(self, topic: str) -> dict | None:
        """Rebuild the append ticket from the parquet source of truth.

        Run after a crash that landed between the ticket reservation and the
        data write: the orphaned reservation makes max_id/total (and the
        gauges derived from them) overcount by that batch until repaired.
        One explicit O(topic) scan — the cost the ticket otherwise avoids on
        every append. Mirrors the reference recovering its counters from the
        table itself after losing a sequence cache."""
        self._tickets.drop(topic)
        return self._ticket(topic)

    def _topic_key_type(self, topic: str) -> str | None:
        """The topic's established key type (None for new/empty topics)."""
        ticket = self._ticket(topic)
        return ticket["key_type"] if ticket else None

    @staticmethod
    def _has_data(path: str) -> bool:
        """Topic dir contains parquet data — directly or inside ``dt=``
        partition subdirectories (a freshly provisioned topic is an empty
        directory — X7 — which parquet cannot infer a schema from)."""
        if not os.path.isdir(path):
            return False
        for entry in os.listdir(path):
            if entry.endswith(".parquet"):
                return True
            sub = os.path.join(path, entry)
            if (
                entry.startswith("dt=")
                and os.path.isdir(sub)
                and any(f.endswith(".parquet") for f in os.listdir(sub))
            ):
                return True
        return False

    def _is_day_partitioned(self, topic: str) -> bool:
        path = self.topic_path(topic)
        return os.path.isdir(path) and any(
            e.startswith("dt=") for e in os.listdir(path)
        )

    # -------------------------------------------------------------- read

    def read_events(
        self,
        topic: str,
        after: Cursor | None = None,
        typed_key: bool = False,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> DataFrame:
        """Unordered event scan with optional keyset-resume predicate (F1)
        and, for day-partitioned topics, static partition pruning via
        ``start_day``/``end_day`` (ISO dates, inclusive)."""
        # heal a half-finished compaction BEFORE shape validation: between
        # compaction's two renames the topic dir is absent, and validating
        # first would mis-report "not day-partitioned" forever (no retry
        # could fix it until some other append/compact healed the dir)
        self._recover_compaction(topic)
        if (start_day or end_day) and not self._is_day_partitioned(topic):
            raise ValueError(
                f"topic {topic!r} is not day-partitioned; day-range reads "
                "require append(..., partition_by_day=True)"
            )
        df = self.spark.read.parquet(self.topic_path(topic))
        if start_day is not None:
            df = df.where(F.col("dt") >= F.lit(start_day).cast("date"))
        if end_day is not None:
            df = df.where(F.col("dt") <= F.lit(end_day).cast("date"))
        if after is not None:
            df = df.where(keyset_after(after))
        if typed_key:
            key_type = df.select("key_type").first()
            if key_type is not None:
                df = df.withColumn(
                    "key_view", typed_key_view(F.col("key"), key_type[0])
                )
        return df

    def view(self, topic: str, name: str | None = None) -> str:
        """Register the event table as a temp view for Spark SQL analytics
        (the bridge from the event-log layer to the analytics layer)."""
        view_name = name or topic
        self.read_events(topic).createOrReplaceTempView(view_name)
        return view_name

    def replay(self, topic: str, after: Cursor | None = None) -> DataFrame:
        """Total-order replay: ORDER BY (lsn, id) (O1).

        At scale, prefer bounded replay (`.limit`, per-lsn ranges) — the
        sort is a range exchange, but keyset predicates prune files first.
        """
        return self.read_events(topic, after=after).orderBy("lsn", "id")

    # ------------------------------------------------------- maintenance

    def compact(
        self,
        topic: str,
        target_files: int | None = None,
        cluster_by: tuple[str, str] | None = None,
    ) -> int:
        """Rewrite accumulated small append files into (lsn, id)-range
        partitioned, internally sorted files; returns the new file count.

        Every append creates at least one file, so a long-lived topic
        accumulates small files — the classic streaming-table problem. The
        rewrite uses ``repartitionByRange(lsn, id)`` so each output file
        covers a contiguous cursor range (maximum min/max-stat pruning for
        keyset predicates) and is sorted within, keeping replay merges
        cheap. Takes the topic's append mutex (X4) for the swap. The swap
        is TWO renames (old out, compacted in) — not atomic; a crash
        between them is healed by ``_recover_compaction`` (roll forward if
        the compacted directory is complete, roll back otherwise), which
        every append/read/compact runs first. Readers re-list on next
        query.

        Flat topics keep the ordered-visibility invariant through the
        rewrite: the range-partitioned output files hold disjoint ascending
        (lsn, id) ranges, and they are republished with fresh clock
        mtimes/names, so a NEW replication stream over the compacted topic
        still observes commit order (an EXISTING stream's checkpoint refers
        to replaced files — restart it after compacting, as with any file
        rewrite). Day-partitioned topics trade that away by construction:
        dt= is event-time while (lsn, id) is commit-time, so their files
        cannot be both day-partitioned and cursor-range-disjoint — day
        layout is the analytics path, flat the replication path.

        ``cluster_by=(col_a, col_b)``: DAY-PARTITIONED topics only — lay
        files out along the Z-order curve of two columns instead of
        (lsn, id) ranges, so min-max stats prune on BOTH columns for
        analytics predicates (`plans.layout` measures the effect).
        Numeric columns are range-normalized from a one-row stats read;
        string columns cluster by a 16-bit hash (equality pruning).
        Refused on flat topics: their files must stay cursor-range
        disjoint or replication's ordered-visibility invariant breaks.
        """
        self._recover_compaction(topic)
        path = self.topic_path(topic)
        if not self._has_data(path):
            return 0
        day_partitioned = self._is_day_partitioned(topic)
        df = self.spark.read.parquet(path)
        if target_files is None:
            # walk dt= subdirectories too: a day-partitioned topic has NO
            # top-level parquet files, so a flat listing would see total=0
            # and always compact to a single file
            total = sum(os.path.getsize(f) for f in self._parquet_files(path))
            target_files = max(1, total // (128 * 1024 * 1024))  # ~128 MB files
        tmp = f"{path}.compacting"
        ordered = f"{path}.compacted"
        old = f"{path}.old"
        if cluster_by is not None:
            if not day_partitioned:
                raise ValueError(
                    "cluster_by requires a day-partitioned topic: flat "
                    "topics must keep (lsn, id)-disjoint files for "
                    "replication's ordered-visibility invariant"
                )
            zcol = self._zorder_key(df, cluster_by)
            laid_out = (
                df.withColumn("_z", zcol)
                .repartitionByRange(target_files, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        else:
            laid_out = df.repartitionByRange(
                target_files, "lsn", "id"
            ).sortWithinPartitions("lsn", "id")
        writer = laid_out.write.mode("overwrite")
        if day_partitioned:
            # preserve the established hive layout: dt is a partition column
            # on read, so it must go back out via partitionBy or the rewrite
            # silently flips the topic to flat (breaking later
            # partition_by_day appends and start_day/end_day pruning)
            writer = writer.partitionBy("dt")
        writer.parquet(tmp)
        self._append_mutex.acquire(topic)
        try:
            ticket = self._ticket(topic)
            prev_clock = ticket.get("clock", 0) if ticket else 0
            clock_start = max(prev_clock, int(time.time() * 1000))
            for stale in (ordered, old):
                shutil.rmtree(stale, ignore_errors=True)
            os.makedirs(ordered)
            # part index of repartitionByRange output = ascending range
            self._publish_ordered(tmp, ordered, clock_start)
            n_files = sum(1 for _ in self._parquet_files(ordered))
            if ticket:
                self._tickets.save(
                    topic, **{**ticket, "clock": clock_start + n_files}
                )
            os.rename(path, old)
            os.rename(ordered, path)
            shutil.rmtree(old)
            shutil.rmtree(tmp, ignore_errors=True)
        finally:
            self._append_mutex.release(topic)
        return n_files

    INT_TYPES = ("bigint", "int", "smallint", "tinyint")
    FRACTIONAL_TYPES = ("double", "float")

    def _zorder_key(self, df, cluster_by: tuple[str, str]):
        """16-bit-per-dimension Morton key over two columns: numeric
        columns are range-normalized to [0, 2^16) from a one-row MIN/MAX
        stats read (the `plans.layout` normalization — what production
        Z-order writers do); string columns use the low 16 bits of
        xxhash64 (clusters equal keys for equality pruning; no range
        order exists to preserve).

        MIN-shifting (not just MAX-aligning) is load-bearing: a negative
        value fed to shiftleft/shiftright emits sign-extended garbage
        interleave bits, silently destroying the clustering (ADVICE r5).
        Fractional and decimal columns range-normalize through double
        arithmetic instead of falling into the 16-bit-hash branch (which
        would lose range pruning for them entirely)."""
        from event_store_spark.plans.layout import ZBITS, zvalue

        zmax = (1 << ZBITS) - 1
        types = dict(df.dtypes)

        def kind(c):
            t = types[c]
            if t in self.INT_TYPES:
                return "int"
            if t in self.FRACTIONAL_TYPES or t.startswith("decimal"):
                return "frac"
            return "hash"

        numeric = [c for c in cluster_by if kind(c) != "hash"]
        stats = {}
        if numeric:
            row = df.agg(
                *[F.min(c).alias(f"_mn_{c}") for c in numeric],
                *[F.max(c).alias(f"_mx_{c}") for c in numeric],
            ).head()
            for c in numeric:
                if row[f"_mn_{c}"] is not None:
                    stats[c] = (row[f"_mn_{c}"], row[f"_mx_{c}"])
        dims = []
        for c in cluster_by:
            k = kind(c)
            if k == "hash":
                dims.append(
                    F.pmod(F.xxhash64(F.col(c)), F.lit(1 << ZBITS)).cast("bigint")
                )
            elif c not in stats:  # all-NULL numeric column: degenerate dim
                dims.append(F.lit(0).cast("bigint"))
            elif k == "int":
                lo, hi = int(stats[c][0]), int(stats[c][1])
                bits = (hi - lo).bit_length()
                if bits > ZBITS:
                    # wide ranges: keep the HIGH bits (coarse ranges).
                    # Shift BEFORE subtracting so `col - lo` can never
                    # overflow int64 even when the range spans it; the
                    # +1 rounding slack of per-value shifting is clamped.
                    s = bits - ZBITS
                    dims.append(
                        F.least(
                            F.shiftright(F.col(c).cast("bigint"), s)
                            - F.lit(lo >> s),
                            F.lit(zmax).cast("bigint"),
                        )
                    )
                else:
                    dims.append(
                        F.shiftleft(
                            F.col(c).cast("bigint") - F.lit(lo), ZBITS - bits
                        )
                    )
            else:  # fractional / decimal: normalize through double
                lo, hi = float(stats[c][0]), float(stats[c][1])
                if hi <= lo:
                    dims.append(F.lit(0).cast("bigint"))
                else:
                    scaled = (
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit(hi - lo)
                        * F.lit(float(zmax))
                    )
                    dims.append(
                        F.least(
                            F.greatest(F.floor(scaled), F.lit(0)).cast("bigint"),
                            F.lit(zmax).cast("bigint"),
                        )
                    )
        return zvalue(dims[0], dims[1])

    @staticmethod
    def _parquet_files(path: str) -> list[str]:
        """All parquet data files under ``path``, including dt= subdirs."""
        out = []
        for dirpath, _dirs, files in os.walk(path):
            out.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
            )
        return out

    # ----------------------------------------------------------- metrics

    def lag(self, topic: str, cursor: Cursor) -> int:
        """Replication lag: high-water lsn − cursor.lsn (A1 analog).

        O(1) arithmetic from the append ticket — the reference's gauge is
        likewise bookkeeping math, not a scan
        (`EventReplicatorWorker.java:242-248`)."""
        ticket = self._ticket(topic)
        return (ticket["lsn"] if ticket else 0) - cursor.lsn
