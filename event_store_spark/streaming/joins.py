"""Watermarked stream-stream interval join.

The streaming twin of :func:`event_store_spark.operators.temporal.
interval_join`: Structured Streaming natively executes a stream-stream
inner join whose condition bounds the two event times to a window, keeping
each side's rows in the state store only until the other side's watermark
passes the bound — the same per-bucket state bound the batch operator gets
from banding, enforced here by the engine's watermark machinery
(Flink's interval join, Spark-native).

Both inputs MUST be streaming DataFrames; the time bound plus the
watermarks are what make unbounded state impossible, so the helper refuses
to build a join without them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    keys: Sequence[str] = (),
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``right_time`` within
    ``[left_time + lower_us, left_time + upper_us]`` (inclusive,
    microseconds), plus optional equi ``keys``.

    ``watermark_delay`` bounds accepted lateness on BOTH sides; state for a
    row is dropped once the opposite watermark clears its join window.
    ``how`` may be ``"inner"`` or ``"leftOuter"``: outer results (left rows
    with NULL right columns) are emitted only once the right watermark has
    passed the row's join window — the engine can't know "no match" any
    earlier, so outer rows trail the inner ones by up to
    ``watermark_delay + (upper - lower)`` of event time. Column names must
    be disjoint apart from ``keys`` (rename before joining, same contract
    as the batch operator).
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    if not left.isStreaming or not right.isStreaming:
        raise ValueError("stream_interval_join requires two streaming DataFrames")
    lw = left.withWatermark(left_time, watermark_delay).alias("l")
    rw = right.withWatermark(right_time, watermark_delay).alias("r")
    cond = (
        F.col(f"r.{right_time}")
        >= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lower_us} MICROSECOND")
    ) & (
        F.col(f"r.{right_time}")
        <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {upper_us} MICROSECOND")
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    out_keys = [F.col(f"l.{k}").alias(k) for k in keys]
    left_out = [F.col(f"l.{c}").alias(c) for c in left.columns if c not in keys]
    right_out = [F.col(f"r.{c}").alias(c) for c in right.columns if c not in keys]
    return lw.join(rw, cond, how).select(*out_keys, *left_out, *right_out)
