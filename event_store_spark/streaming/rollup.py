"""Continuous windowed rollup: an incrementally-maintained materialized
aggregate (the hypertable "continuous aggregate" shape).

Batch analog: ``q36`` (hourly count + sum per event type). This is the same
aggregation kept CONTINUOUSLY up to date over a stream: Structured
Streaming's windowed aggregation in update mode holds the running per-window
totals in the state store (restart-safe via the checkpoint), and every
micro-batch emits only the windows it touched; ``foreachBatch`` upserts
those rows into a versioned parquet table.

Exactly-once composition:
- the streaming agg replays deterministically from the checkpoint (same
  batch id → same cumulative rows), so the upsert is idempotent by
  construction — re-merging a replayed batch writes identical values;
- the table swap is a crash-safe pointer flip: each merge writes a fresh
  ``_v<epoch>`` parquet directory, then atomically replaces the ``_CURRENT``
  pointer file (temp-write + os.replace, the TicketStore pattern). A crash
  between the two leaves the previous version intact and the replayed batch
  re-produces the same new version.
- late rows: ``withWatermark`` bounds state; rows later than the watermark
  delay are dropped by the aggregation (never reach the table). The
  watermark itself persists across restarts in the checkpoint commit log.

Scale: per-batch work is proportional to the windows touched by that batch,
not table size; the merge is a key anti-join of a small update set against
the rollup table. On a cluster the versioned-directory swap becomes dynamic
partition overwrite on the window-date partition — same idempotence
argument, partition-local rewrite cost. The rollup table is
aggregate-sized (windows × types), orders of magnitude smaller than the
event stream it summarizes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: how many superseded versions to retain for concurrent readers mid-swap
_KEEP_VERSIONS = 2


class ContinuousRollup:
    """Incrementally-maintained hourly rollup of an events stream.

    Parameters mirror the batch q36 contract: tumbling ``window_duration``
    windows per ``event_type`` with count + sum(value).

    Single maintainer per target: the streaming checkpoint serializes runs
    that share it; running a SECOND maintainer with a different checkpoint
    against the same ``target_path`` would interleave pointer flips (wrap
    the maintainer in `streaming.lock.LockManager` if deployment can't
    guarantee single ownership). Readers are always safe: they only follow
    the committed pointer, and ``_KEEP_VERSIONS`` superseded versions stay
    on disk for readers mid-swap.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        target_path: str,
        checkpoint: str,
        window_duration: str = "1 hour",
        watermark_delay: str = "2 hours",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.source_path = source_path
        self.target_path = target_path
        self.checkpoint = checkpoint
        self.window_duration = window_duration
        self.watermark_delay = watermark_delay
        self.max_files_per_trigger = max_files_per_trigger
        os.makedirs(target_path, exist_ok=True)

    # ------------------------------------------------------------- table read

    def _pointer_path(self) -> str:
        return os.path.join(self.target_path, "_CURRENT")

    def _current_version(self) -> str | None:
        try:
            with open(self._pointer_path()) as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def versions(self) -> list[str]:
        """Version directories still on disk, oldest→newest (the last is
        not necessarily committed — crash debris stays until its batch
        replays; the committed one is ``_current_version()``)."""
        return sorted(
            (d for d in os.listdir(self.target_path) if d.startswith("_v")),
            key=lambda d: int(d[2:]),
        )

    def table(self, version: str | None = None) -> DataFrame:
        """The rollup table as of the latest committed merge — or, with
        ``version`` (a name from :meth:`versions`), time travel to a
        retained superseded snapshot (``_KEEP_VERSIONS`` of them survive
        GC, exactly like a table format's version retention window)."""
        if version is None:
            version = self._current_version()
        elif version not in self.versions():
            raise ValueError(f"unknown rollup version {version!r}")
        if version is None:
            return self.spark.createDataFrame(
                [], "win_start timestamp, event_type string, cnt bigint, sum_value double"
            )
        return self.spark.read.parquet(os.path.join(self.target_path, version))

    # ---------------------------------------------------------------- running

    def _merge(self, batch_df: DataFrame, batch_id: int) -> None:
        updates = batch_df.select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
        current = self._current_version()
        version = f"_v{batch_id}"
        if current == version:
            # replay of a batch that already committed (crash AFTER the
            # pointer flip, before the checkpoint recorded the batch): the
            # flip is the commit marker, so the table already contains this
            # batch's merge — rebuilding would read and overwrite the SAME
            # directory (self-referential rebuild). Skip: idempotent.
            return
        if current is None:
            merged = updates
        else:
            existing = self.spark.read.parquet(
                os.path.join(self.target_path, current)
            )
            merged = existing.join(
                updates.select("win_start", "event_type"),
                ["win_start", "event_type"],
                "left_anti",
            ).unionByName(updates)
        out_dir = os.path.join(self.target_path, version)
        if os.path.exists(out_dir):  # replayed batch: rebuild from scratch
            shutil.rmtree(out_dir)
        merged.write.mode("overwrite").parquet(out_dir)
        # a replayed batch rewrites a directory Spark may have listed before
        # the crash — drop the stale file-status cache entry or readers hit
        # FILE_NOT_EXIST on the torn version's old part files
        self.spark.catalog.refreshByPath(out_dir)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, self._pointer_path())
        self._gc(keep=version)

    def _gc(self, keep: str) -> None:
        versions = sorted(
            (d for d in os.listdir(self.target_path) if d.startswith("_v")),
            key=lambda d: int(d[2:]),
        )
        # retain the current version PLUS _KEEP_VERSIONS superseded ones
        # (the documented mid-swap reader window)
        for stale in versions[: -(_KEEP_VERSIONS + 1)]:
            if stale != keep:
                shutil.rmtree(os.path.join(self.target_path, stale), ignore_errors=True)

    def start(self, available_now: bool = True):
        """Start (or resume) the incremental maintenance query."""
        schema = self.spark.read.parquet(self.source_path).schema
        reader = self.spark.readStream.schema(schema)
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.source_path)
        agg = (
            stream.withWatermark("ts", self.watermark_delay)
            .groupBy(
                F.window("ts", self.window_duration).alias("window"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("value").alias("sum_value"),
            )
        )
        writer = (
            agg.writeStream.outputMode("update")
            .option("checkpointLocation", self.checkpoint)
            .foreachBatch(self._merge)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self) -> None:
        """Process everything currently in the source, then stop."""
        q = self.start(available_now=True)
        q.awaitTermination()
