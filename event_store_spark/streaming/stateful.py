"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics the built-in streaming aggregations can't
express (the brief's `applyInPandasWithState` path): arbitrary per-key
state evolved batch-by-batch, with timeout hooks for expiry. State lives in
the streaming state store (RocksDB/HDFS-backed on a cluster), so
parallelism is per-key and restart-safe via the checkpoint — the
Spark-native version of a Kafka Streams `Processor` with a state store.

Shipped example: per-user running counters (event count + value sum) in
update mode — the streaming twin of `events.groupBy(user_id).agg(...)`,
pinned against that batch plan by the test.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_events bigint, total_value double"
STATE_SCHEMA = "total_events bigint, total_value double"


def _update_user_counters(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (total_events, total_value) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total_events],
            "total_value": [total_value],
        }
    )


def running_user_counters(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) over a streaming events table.

    Sink note: pair with a checkpoint-recoverable sink (foreachBatch, kafka,
    file-append) — the memory sink cannot restart from a checkpoint, so
    state continuity across restarts is lost with it.
    """
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_counters,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
