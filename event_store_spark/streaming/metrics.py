"""Streaming metrics: lag gauges surfaced via StreamingQueryListener.

The reference publishes `event.replicator.lag` (WAL-byte distance,
`EventReplicatorWorker.java:88-93,242-248`) and `event.store.consumer.lag`
(`ReactorKafkaEventStore.java:110-111,379-400`) through Micrometer. The
Spark-native transport for per-batch metrics is a
:class:`~pyspark.sql.streaming.StreamingQueryListener` — progress events
carry rows/sec and batch ids; the lag gauges themselves come from the
stores (`Replicator.lag`, `Subscription.lag`) on demand.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressMetricsListener(StreamingQueryListener):
    """Collects per-query progress counters (batches, input rows).

    Attach with ``spark.streams.addListener(listener)``; read
    ``listener.totals`` after (or during) a run. Counters are keyed by query
    name/id so one listener serves every streaming query in the session —
    the analog of the reference's one Micrometer registry.
    """

    def __init__(self) -> None:
        self.totals: dict[str, dict[str, int]] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        self.totals.setdefault(str(event.id), {"batches": 0, "rows": 0})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        t = self.totals.setdefault(str(p.id), {"batches": 0, "rows": 0})
        t["batches"] += 1
        t["rows"] += int(p.numInputRows)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
