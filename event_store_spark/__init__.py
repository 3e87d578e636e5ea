"""event_store_spark — a PySpark-native analytics + event-log engine.

A brand-new engine with the query and data-processing capabilities of
kagetech/event-store (reference: /root/reference, studied for behavior only),
re-expressed idiomatically on the Spark DataFrame / SQL / Structured
Streaming stack:

- **event-log layer** (`event_store_spark.core`, `.streaming`): append-only,
  envelope-schema event tables with in-batch ``(lsn, id)`` assignment,
  canonical metadata, reserved-key validation, exactly-once ``foreachBatch``
  sinks, cursor/offset resume — the Spark-native answer to the reference's
  Postgres+Kafka replication pipeline.
- **analytics layer** (`event_store_spark.plans`): the declared query
  inventory (SURVEY.md §2.9 Q1–Q37) plus the LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing), each
  DataFrame-first so Catalyst gets pushdown/pruning/broadcast for free.
"""

from event_store_spark.session import get_spark
from event_store_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
