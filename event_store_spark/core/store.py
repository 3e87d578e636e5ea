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

TOPIC_SUFFIX = "_events"


class EventStore:
    """Append-only, (lsn, id)-ordered event tables under a root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

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

        if self._has_data(self.topic_path(topic)) and (
            self._is_day_partitioned(topic) != partition_by_day
        ):
            raise ValueError(
                f"topic {topic!r} layout is "
                f"{'day-partitioned' if self._is_day_partitioned(topic) else 'flat'}; "
                "appends must match the established layout"
            )
        existing = self._topic_key_type(topic)
        if existing is not None and existing != key_type:
            raise ValueError(
                f"topic {topic!r} stores {existing!r} keys; cannot append "
                f"{key_type!r} keys (reference: one key type per table, "
                "events_schema.sql DDL)"
            )
        lsn = self._next_lsn(topic)
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
        out = df.select(
            F.monotonically_increasing_id().alias("id"),
            canonical_key(F.col("key"), key_type).alias("key"),
            F.lit(key_type).alias("key_type"),
            truncate_millis(ts).alias("timestamp"),
            metadata.alias("metadata"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[F.col(c) for c in payload_cols],
        )
        writer = out.sortWithinPartitions("id").write.mode("append")
        if partition_by_day:
            # hive-style dt= layout: time-range replay prunes whole
            # partitions statically (the 100 TB event-table layout);
            # (lsn, id) file stats still prune within each day
            out = out.withColumn("dt", F.to_date("timestamp"))
            writer = (
                out.sortWithinPartitions("id").write.mode("append").partitionBy("dt")
            )
        writer.parquet(self.topic_path(topic))
        max_id = (
            self.spark.read.parquet(self.topic_path(topic))
            .where(F.col("lsn") == lsn)
            .agg(F.max("id"))
            .first()[0]
        )
        return Cursor(lsn, max_id)

    def _topic_key_type(self, topic: str) -> str | None:
        """The topic's established key type (None for new/empty topics)."""
        path = self.topic_path(topic)
        if not self._has_data(path):
            return None
        row = self.spark.read.parquet(path).select("key_type").first()
        return row[0] if row else None

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

    def _next_lsn(self, topic: str) -> int:
        """Monotone append epoch: 1 + MAX(lsn) (parquet footer-stats scan)."""
        path = self.topic_path(topic)
        if not self._has_data(path):
            return 1
        prev = self.spark.read.parquet(path).agg(F.max("lsn")).first()[0]
        return (prev or 0) + 1

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

    def compact(self, topic: str, target_files: int | None = None) -> int:
        """Rewrite accumulated small append files into (lsn, id)-range
        partitioned, internally sorted files; returns the new file count.

        Every append creates at least one file, so a long-lived topic
        accumulates small files — the classic streaming-table problem. The
        rewrite uses ``repartitionByRange(lsn, id)`` so each output file
        covers a contiguous cursor range (maximum min/max-stat pruning for
        keyset predicates) and is sorted within, keeping replay merges
        cheap. Runs under the topic's single writer (X4), swapping
        directories atomically at the end; readers re-list on next query.
        """
        path = self.topic_path(topic)
        if not self._has_data(path):
            return 0
        df = self.spark.read.parquet(path)
        if target_files is None:
            total = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            target_files = max(1, total // (128 * 1024 * 1024))  # ~128 MB files
        tmp = f"{path}.compacting"
        old = f"{path}.old"
        (
            df.repartitionByRange(target_files, "lsn", "id")
            .sortWithinPartitions("lsn", "id")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    # ----------------------------------------------------------- metrics

    def lag(self, topic: str, cursor: Cursor) -> int:
        """Replication lag: MAX(lsn) − cursor.lsn (A1 analog)."""
        max_lsn = (
            self.read_events(topic)
            .where(F.col("lsn").isNotNull())
            .agg(F.max("lsn"))
            .first()[0]
        )
        return (max_lsn or 0) - cursor.lsn
