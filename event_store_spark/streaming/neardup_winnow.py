"""Streaming winnowing near-dup ingest gate over a persisted DedupIndex.

The ingest-time consumer of `plans.dedup_index`'s ``winnow`` kind: as
document micro-batches arrive, each batch is probed against the
persisted fingerprint index AND against itself, duplicates are dropped,
and the admitted documents' fingerprints are folded back into the index
— so a near-dup of ANY previously admitted document (this batch, a prior
batch, or the original corpus build) is caught. `streaming_neardup_lsh`
(stateful.py) keeps its signature state in the streaming state store;
this gate keeps it in the SHARED parquet index, which is what a
production ingest fleet needs: the index outlives the query, serves
concurrent batch probes, and compacts under `GenerationPair`'s atomic
flip.

Admission rule (deterministic, batch-cut-invariant for id-ordered
arrivals): a document is dropped iff it shares ≥ MIN_SHARED winnowing
fingerprints with an indexed document, or with a LOWER-doc_id document
of its own batch (keep-first, the dedup_survivors convention).

Exactly-once across crashes, the engine's standard discipline:
- the admitted-docs sink writes to a DETERMINISTIC per-batch directory
  (``out_dir/batch-<id>``, overwrite) — redelivery rewrites bytes;
- the index append uses `DedupIndex.append(batch_id=...)` — a
  deterministic ``segment-b<id>`` directory, overwrite — so a
  redelivered batch cannot duplicate signature rows;
- the batch id commits LAST via one atomic JSON replace
  (`exactly_once_batch`); any crash before it replays the whole batch
  over those idempotent writes.

Scale shape: the probe broadcasts only the BATCH's fingerprints (the
index side never shuffles — partition-pruned parquet), the within-batch
pair stage is the registered query's in-row expansion bounded by the
stoplist cap, and compaction cadence is the operator's choice via
`DedupIndex.compact()` exactly as with the ANN segment indexes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_store_spark.plans.dedup_index import DedupIndex
from event_store_spark.streaming.eos import exactly_once_batch


class WinnowDedupGate:
    """foreachBatch gate: drop near-dups, land survivors, grow the index."""

    def __init__(self, index: DedupIndex, out_dir: str, state_path: str):
        if index.kind != "winnow":
            raise ValueError(f"gate requires a winnow index, got {index.kind!r}")
        self.index = index
        self.out_dir = out_dir
        self.state_path = state_path

    # ------------------------------------------------------------- state

    def _last_batch_id(self, _topic: str) -> int | None:
        try:
            with open(self.state_path) as fh:
                return json.load(fh)["batch_id"]
        except OSError:
            return None

    def _commit(self, _topic: str, batch_id: int) -> None:
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.state_path)

    # -------------------------------------------------------------- gate

    def admitted(self, batch_docs: DataFrame) -> DataFrame:
        """The batch minus near-dups of the index or of lower-id
        batchmates (pure plan — shared by the sink and by tests)."""
        from event_store_spark.plans.pipeline11 import (
            MIN_SHARED,
            winnow_fingerprints,
        )

        vs_index = self.index.probe(batch_docs).select(
            F.col("new_doc_id").alias("doc_id")
        )
        fp = winnow_fingerprints(batch_docs)
        within = (
            fp.groupBy("f")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
            .where(F.size("ds") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ds, (a, i) -> "
                        "transform(slice(ds, i + 2, size(ds)), "
                        "b -> struct(a AS keep, b AS drop))))"
                    )
                ).alias("p")
            )
            .groupBy(F.col("p.drop").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= MIN_SHARED)
            .select("doc_id")
        )
        dropped = vs_index.unionByName(within).distinct()
        return batch_docs.join(dropped, "doc_id", "left_anti")

    def foreach_batch(self):
        """The exactly-once foreachBatch function for writeStream."""

        def process(df: DataFrame, batch_id: int) -> None:
            keep = self.admitted(df)
            keep.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"batch-{batch_id}")
            )
            # re-read what the sink landed: one source of truth for the
            # index fold, and the recompute-vs-landed gap a retried
            # nondeterministic upstream could open is closed by reading
            # the committed bytes
            landed = self.index.spark.read.parquet(
                os.path.join(self.out_dir, f"batch-{batch_id}")
            )
            self.index.append(landed, batch_id=batch_id)

        return exactly_once_batch(
            "winnow-gate", process, self._last_batch_id, self._commit
        )
