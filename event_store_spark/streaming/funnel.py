"""Streaming funnel: per-user view -> click -> purchase stage tracking.

The streaming twin of `plans.pipeline6.funnel_stages`, as a stateful
operator (`applyInPandasWithState`) with O(1) state per user — three
timestamps — the bounded-state property that makes a funnel runnable
forever over an unbounded event log.

Ordering contract: stage anchors are FIRST-qualifying events
(vt = first view; ct = first click with ts > vt; pt = first purchase
with ts > ct). A single pass is exact when events are delivered in
event-time order — which the store's ordered replay source guarantees
(S6 `core/store.py:315`, mirroring the reference's lsn-ordered
replication `EventReplicatorWorker.java:66-72`). Each micro-batch is
additionally sorted by (ts, event_id) before folding, so any within-batch
disorder is healed; only an event that time-travels BEHIND an already
anchored earlier stage (out-of-order across batches from a non-ordered
source) can diverge from the batch answer — the same trade every
bounded-state streaming funnel makes. Parity with the batch plan is
pinned by test on ordered multi-batch delivery.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, stage int, vt_us bigint, ct_us bigint, pt_us bigint"
STATE_SCHEMA = "vt_us bigint, ct_us bigint, pt_us bigint"

_STAGES = ("view", "click", "purchase")


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    vt, ct, pt = state.get if state.exists else (None, None, None)
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        batch = pd.concat(frames) if len(frames) > 1 else frames[0]
        batch = batch.sort_values(["ts", "event_id"])
        # vectorized would scan thrice; the row loop is over ONE user's
        # batch slice (bounded by the micro-batch), not the corpus
        for ts, et in zip(batch["ts"], batch["event_type"]):
            us = ts.value // 1000  # pandas ns -> integer micros
            if vt is None:
                if et == "view":
                    vt = us
            elif ct is None:
                if et == "click" and us > vt:
                    ct = us
            elif pt is None:
                if et == "purchase" and us > ct:
                    pt = us
    state.update((vt, ct, pt))
    stage = 0 if vt is None else (1 if ct is None else (2 if pt is None else 3))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "vt_us": [vt],
            "ct_us": [ct],
            "pt_us": [pt],
        }
    )


def streaming_funnel(events_stream: DataFrame) -> DataFrame:
    """Per-user funnel state over a streaming events source (update mode:
    one row per user per micro-batch carrying the current stage).

    State is three nullable bigints per user — at 1B users that is ~24 GB
    across the state store, trivially partitioned by user key; no
    watermark needed because the state never grows past stage 3 (add a
    timeout eviction if abandoned users should expire)."""
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    return (
        events_stream.where(F.col("event_type").isin(*_STAGES))
        .select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
