"""Streaming tokenize-at-ingest materialization (VERDICT r10 #8b).

`plans.tokenized` backfills an EXISTING corpus's token/fingerprint
columns in one pass; this maintainer keeps the tokenized side table
current for a GROWING document log — the exact analog of
`streaming.typed_ingest.TypedEventsMaterializer` for the `documents`
envelope. Each arriving micro-batch is tokenized once (the shared
`tokenized_projection`, so the streaming and batch paths cannot drift)
and appended as its own batch subdir with the repo's
overwrite-by-batch-id idempotence: a replayed batch rewrites its own
subdir and never duplicates, and no pointer machinery is needed because
the table is append-only additive.

This closes the parse-at-ingest story for text the way typed_ingest
closed it for JSON props: the governance/dedup/fingerprint consumers
(duplicate_spans, source_similarity_jaccard, winnowing, …) read
(doc_id, w, th, g3) columns maintained here and never re-tokenize at
query time, whether the corpus arrived as a batch drop or a stream.

Scale: the tokenize is map-side per batch (no shuffle — the batch keeps
the append path's natural partitioning), the output is plain parquet
with column pruning, and a `g3`-only consumer never touches a string.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from event_store_spark.plans.tokenized import tokenized_projection


class TokenizedDocsMaterializer:
    def __init__(self, spark: SparkSession, target_path: str, checkpoint: str):
        self.spark = spark
        self.target_path = target_path
        self.checkpoint = checkpoint

    def start(self, docs_stream: DataFrame) -> StreamingQuery:
        """Attach to a streaming documents frame (file/kafka source with
        at least (doc_id, text); envelope metadata columns are carried
        through when present, exactly like the batch backfill)."""

        def sink(df: DataFrame, batch_id: int) -> None:
            out = os.path.join(self.target_path, f"b{batch_id}")
            # overwrite-by-batch-id: replay after a crash rewrites the
            # same subdir — idempotent, exactly-once table contents
            tokenized_projection(df).write.mode("overwrite").parquet(out)
            self.spark.catalog.refreshByPath(out)

        return (
            docs_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def table(self) -> DataFrame:
        """The live tokenized table (union of batch subdirs, lazy scan)."""
        return self.spark.read.option("recursiveFileLookup", "true").parquet(
            self.target_path
        )
