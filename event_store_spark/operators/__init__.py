"""Reusable DataFrame-level operators (beyond per-query plans)."""

from event_store_spark.operators.temporal import asof_join, interval_join, sessionize

__all__ = ["asof_join", "interval_join", "sessionize"]
