"""Structured Streaming layer: subscribe, replicate, exactly-once sinks."""

from event_store_spark.streaming.eos import exactly_once_batch
from event_store_spark.streaming.replicate import Replicator
from event_store_spark.streaming.subscribe import Subscription

__all__ = ["Subscription", "Replicator", "exactly_once_batch"]
