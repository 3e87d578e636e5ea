"""Exactly-once foreachBatch composition (SURVEY §2.8 X2/X3).

The reference gets exactly-once two ways: Kafka transactions wrapping
events+cursor (`EventReplicatorWorker.java:184-208`) and caller-composed DB
transactions wrapping projection+offset (`ReactorKafkaEventStore.java:214-246`).
Spark's sinks have no cross-system transactions, so the engine uses the
canonical Structured-Streaming EOS pattern instead:

    idempotent-by-batchId: the bookkeeping store remembers the last batch_id
    applied per topic; a redelivered batch (same id after crash/restart) is
    skipped entirely, and the user's projection runs at most once per id.

Combined with the checkpointed source (which replays the same batch with the
same id after failure), this yields end-to-end exactly-once for any sink
whose writes are deterministic per batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def exactly_once_batch(
    topic: str,
    process: Callable[[DataFrame, int], None],
    get_last_batch_id: Callable[[str], int | None],
    commit: Callable[[str, int], None],
) -> Callable[[DataFrame, int], None]:
    """Wrap ``process`` so redelivered micro-batches are no-ops.

    ``commit(topic, batch_id)`` must persist the batch id atomically with
    (or after) the effects of ``process`` — with the JSON state stores the
    id rides in the same atomic file replace as the offset/cursor.
    """

    def fn(df: DataFrame, batch_id: int) -> None:
        last = get_last_batch_id(topic)
        if last is not None and batch_id <= last:
            return  # redelivery after crash — effects already applied
        process(df, batch_id)
        commit(topic, batch_id)

    return fn
