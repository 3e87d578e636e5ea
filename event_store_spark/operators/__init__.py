"""Reusable DataFrame-level operators (beyond per-query plans)."""

from event_store_spark.operators.ewma import ewma_segmented
from event_store_spark.operators.graph import connected_components
from event_store_spark.operators.temporal import (
    asof_join,
    interval_join,
    sessionize,
    sessionize_stream,
)

__all__ = [
    "asof_join",
    "connected_components",
    "ewma_segmented",
    "interval_join",
    "sessionize",
    "sessionize_stream",
]
