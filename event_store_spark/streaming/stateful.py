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


DEDUP_OUTPUT_SCHEMA = "content_hash string, doc_id bigint"
DEDUP_STATE_SCHEMA = "winner bigint"


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        for _ in pdfs:  # hash already admitted in an earlier batch: drop all
            pass
        yield pd.DataFrame(
            {
                "content_hash": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
            }
        )
        return
    winner: int | None = None
    for pdf in pdfs:
        batch_min = int(pdf["doc_id"].min())
        winner = batch_min if winner is None else min(winner, batch_min)
    state.update((winner,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [winner]})


def streaming_first_seen_dedup(docs_stream: DataFrame) -> DataFrame:
    """Cross-batch exact dedup: each content hash is admitted ONCE, ever —
    the ingest-time dedup a training pipeline runs on an unbounded corpus
    (q30's batch dedup, as a stream).

    Unlike `dropDuplicatesWithinWatermark`, the admission decision has no
    horizon: per-hash state (the winning doc_id) lives in the streaming
    state store, so parallelism is per-key, restarts recover from the
    checkpoint, and a duplicate arriving months later is still dropped.
    The unbounded state is the honest cost of unbounded dedup — at 100 TB
    the state store holds one 16-byte-keyed row per distinct document,
    sharded across executors (the same ledger any exact dedup must keep);
    bound it with a TTL timeout when the product semantics allow.
    """
    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    hashed = docs_stream.select(F.md5("text").alias("content_hash"), "doc_id")
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT_SCHEMA = "bucket int, item string, lower_count bigint"
HH_STATE_SCHEMA = "items array<string>, counts array<bigint>"

#: Misra-Gries counter budget per state bucket
HH_CAPACITY = 16


def _misra_gries(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        items, counts = state.get
        counters = dict(zip(list(items), [int(c) for c in counts]))
    else:
        counters = {}
    for pdf in pdfs:
        for item, n in pdf.groupby("item", sort=False)["item"].count().items():
            n = int(n)
            if item in counters:
                counters[item] += n
            elif len(counters) < HH_CAPACITY:
                counters[item] = n
            else:
                # decrement-all by the min needed to open a slot (batched
                # form of the classic one-at-a-time MG decrement)
                dec = min(n, min(counters.values()))
                counters = {
                    i: c - dec for i, c in counters.items() if c - dec > 0
                }
                if n - dec > 0:
                    counters[item] = n - dec
    items = sorted(counters)
    state.update((items, [counters[i] for i in items]))
    yield pd.DataFrame(
        {
            "bucket": [key[0]] * len(items),
            "item": items,
            "lower_count": [counters[i] for i in items],
        }
    )


def streaming_heavy_hitters(stream: DataFrame, item_col: str) -> DataFrame:
    """Misra-Gries heavy hitters over an unbounded stream with BOUNDED
    state: at most {HH_CAPACITY} counters per state bucket, ever — the
    streaming answer to q55's salted batch heavy hitters.

    Guarantee (per bucket): any item with true frequency > n/(capacity+1)
    is guaranteed a surviving counter, and every reported `lower_count`
    undercounts its true frequency by at most n/(capacity+1) (n = rows
    seen by that bucket). Items are hashed across a few state buckets so
    counter maintenance parallelizes; a batch top-k over the emitted
    counters gives the global candidates. Exactly the sketch to run ahead
    of an exact count when the stream can't be stored.
    """
    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    bucketed = stream.select(
        (F.abs(F.hash(F.col(item_col))) % F.lit(4)).cast("int").alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _misra_gries,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUTPUT_SCHEMA = (
    "k bigint, lid bigint, lt bigint, rid bigint, rt bigint"
)
ASOF_STATE_SCHEMA = "rts array<bigint>, rids array<bigint>"


def _asof_enrich(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import bisect

    if state.exists:
        rts, rids = [list(x) for x in state.get]
    else:
        rts, rids = [], []
    lefts = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            if int(r.is_r) == 1:
                # keep the version list sorted by (time, id): a late right
                # version inserts in place and serves only later batches'
                # lefts (processing-order semantics, documented)
                pos = bisect.bisect_right(list(zip(rts, rids)), (int(r.t), int(r.rid)))
                rts.insert(pos, int(r.t))
                rids.insert(pos, int(r.rid))
            else:
                lefts.append((int(r.lid), int(r.t)))
    out = []
    for lid, lt in sorted(lefts, key=lambda x: (x[1], x[0])):
        pos = bisect.bisect_right(rts, lt) - 1
        if pos >= 0:
            out.append((key[0], lid, lt, rids[pos], rts[pos]))
        else:
            out.append((key[0], lid, lt, None, None))
    state.update((rts, rids))
    yield pd.DataFrame(
        out, columns=["k", "lid", "lt", "rid", "rt"]
    ) if out else pd.DataFrame(
        {c: pd.Series([], dtype="object") for c in ["k", "lid", "lt", "rid", "rt"]}
    )


def streaming_asof_enrich(left: DataFrame, right: DataFrame) -> DataFrame:
    """Temporal-table (as-of) enrichment over streams — the Flink
    `FOR SYSTEM_TIME AS OF` analog Spark has no built-in for: each left
    event picks up the LATEST right version with ``right.t <= left.t`` for
    its key, with the per-key version history held in the streaming state
    store across micro-batches.

    Inputs: ``left(k bigint, lid bigint, t bigint)`` and
    ``right(k bigint, rid bigint, t bigint)`` streams (epoch-µs times).
    Output: left rows + matched (rid, rt) or NULLs.

    Semantics are processing-order as-of: a left event is matched against
    every right version that arrived in ITS batch or earlier (versions
    sort by event time inside the state, so out-of-order arrivals within
    the retained history resolve correctly for all LATER lefts; a right
    version arriving after a left event was already emitted does not
    retract it — the same no-retraction contract Flink's processing-time
    temporal join has). State grows with versions per key; prune with a
    TTL/timeout or periodic compaction of superseded versions when the
    version stream is unbounded.
    """
    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    l = left.select(
        "k",
        F.col("lid"),
        F.lit(None).cast("bigint").alias("rid"),
        F.col("t"),
        F.lit(0).alias("is_r"),
    )
    r = right.select(
        "k",
        F.lit(None).cast("bigint").alias("lid"),
        F.col("rid"),
        F.col("t"),
        F.lit(1).alias("is_r"),
    )
    return l.unionByName(r).groupBy("k").applyInPandasWithState(
        _asof_enrich,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
