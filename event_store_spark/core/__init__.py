"""Event-log core: envelope schema, append/read store, cursors, offsets."""

from event_store_spark.core.cursor import Cursor
from event_store_spark.core.store import EventStore

__all__ = ["EventStore", "Cursor"]
