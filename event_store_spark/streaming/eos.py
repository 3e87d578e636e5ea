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
whose writes are deterministic AND idempotent per batch (e.g. overwrite
keyed by batch_id/cursor). The boundary is the commit step: ``process``
effects and the batch-id commit are two separate steps, so a crash BETWEEN
them reruns ``process`` once on redelivery — at-least-once for external
effects that aren't idempotent. The reference closes the same gap by
composing projection+offset in one DB transaction
(`ReactorKafkaEventStore.java:214-246`); here the engine's own bookkeeping
(offset/cursor/batch id) rides one atomic file replace, and user-supplied
projections must be batch-idempotent to get the same guarantee.
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

    ``commit(topic, batch_id)`` must persist the batch id atomically WITH
    the effects of ``process`` (the JSON state stores do this: the id rides
    in the same atomic file replace as the offset/cursor). If ``process``
    also writes to an external system outside that commit, those writes run
    again when a crash lands between them — make them idempotent per
    batch id (overwrite, not append) to keep end-to-end exactly-once.
    """

    def fn(df: DataFrame, batch_id: int) -> None:
        last = get_last_batch_id(topic)
        if last is not None and batch_id <= last:
            return  # redelivery after crash — effects already applied
        process(df, batch_id)
        commit(topic, batch_id)

    return fn
