"""OCF file-arrival ingestion: .avro files → event-store appends, EOS.

The missing direction for an Avro-native shop migrating onto this
engine: their producers drop Object Container Files into a landing
directory; this tailer turns each arriving file into one event-store
append, exactly once. Spark's OSS file-stream sources do not cover
binary formats, so the tailer is a poll loop over the landing glob with
the engine's standard state discipline instead of a readStream:

- **Unit of work = one file = one append.** All of a file's rows land
  under one lsn (same-commit siblings), and every row carries a
  ``src`` metadata entry naming its file — the idempotence key.
- **Exactly-once across crashes** without transactions: a processed-
  files ledger (fsync + os.replace JSON, the ProgressStore pattern)
  short-circuits the normal path; if a crash lands BETWEEN the append
  and the ledger write, the retry finds the file absent from the ledger
  but PRESENT in the topic (one metadata-filtered scan, recovery-only)
  and records it without re-appending — no duplicates, no loss, the
  same absorb-don't-reprocess shape as the replicator's recovery.
- Files are processed in name order (producers that need strict
  ordering name files monotonically — the standard landing-zone
  contract); a file must be fully written before it matches the glob
  (write-then-rename on the producer side, as everywhere).

Scale: the poll lists one directory, the per-file decode is the
distributed `read_avro_container`, and the recovery scan is bounded to
crash windows. State is O(#files) file names — compact the ledger by
archiving ingested files out of the landing dir on whatever cadence
retention wants.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.avro.container import read_avro_container
from event_store_spark.core.store import EventStore

#: reserved metadata key naming the source file of an ingested row
SRC_KEY = "src"


class OcfIngest:
    def __init__(
        self,
        store: EventStore,
        topic: str,
        pattern: str,
        state_path: str,
        to_envelope: Callable[[DataFrame], DataFrame],
        key_type: str = "string",
    ):
        """``to_envelope`` maps the file's decoded columns to the append
        shape (key / payload / optional timestamp); the tailer adds the
        ``src`` metadata entry itself."""
        self.store = store
        self.topic = topic
        self.pattern = pattern
        self.state_path = state_path
        self.to_envelope = to_envelope
        self.key_type = key_type

    # ------------------------------------------------------------- state

    def _ledger(self) -> set[str]:
        try:
            with open(self.state_path) as fh:
                return set(json.load(fh)["files"])
        except OSError:
            return set()

    def _record(self, done: set[str]) -> None:
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump({"files": sorted(done)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.state_path)

    def _already_in_topic(self, fname: str) -> bool:
        """Recovery-only presence probe: did a crashed run already append
        this file? One metadata-filtered scan of the topic."""
        try:
            events = self.store.read_events(self.topic)
        except Exception:
            return False  # topic not created yet
        return (
            events.where(
                F.col("metadata")[SRC_KEY] == F.lit(fname.encode())
            ).limit(1).count()
            > 0
        )

    # -------------------------------------------------------------- poll

    def poll_once(self) -> list[str]:
        """Ingest every unprocessed file matching the pattern, oldest
        name first; returns the file names appended this call."""
        spark = self.store.spark
        done = self._ledger()
        new = [
            p
            for p in sorted(_glob.glob(self.pattern))
            if os.path.basename(p) not in done
        ]
        appended: list[str] = []
        for path in new:
            fname = os.path.basename(path)
            if self._already_in_topic(fname):
                # crash landed between append and ledger: absorb
                done.add(fname)
                self._record(done)
                continue
            rows = read_avro_container(spark, path)
            env = self.to_envelope(rows).withColumn(
                "metadata",
                F.create_map(
                    F.lit(SRC_KEY), F.lit(fname.encode())
                ).cast("map<string,binary>"),
            )
            self.store.append(self.topic, env, key_type=self.key_type)
            done.add(fname)
            self._record(done)
            appended.append(fname)
        return appended
