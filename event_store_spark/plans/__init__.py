"""Query plan inventory (SURVEY.md §2.9 + LLM-pipeline operators).

Importing this package populates the registry with every declared query.
"""

from event_store_spark.plans.registry import ORACLE, QUERIES

# populate the registry
from event_store_spark.plans import relational as _relational  # noqa: F401,E402
from event_store_spark.plans import event_queries as _event_queries  # noqa: F401,E402
from event_store_spark.plans import llm as _llm  # noqa: F401,E402
from event_store_spark.plans import multimodal as _multimodal  # noqa: F401,E402
from event_store_spark.plans import relational_ext as _relational_ext  # noqa: F401,E402
from event_store_spark.plans import llm_ext as _llm_ext  # noqa: F401,E402
from event_store_spark.plans import sketches as _sketches  # noqa: F401,E402
from event_store_spark.plans import relational_ext2 as _relational_ext2  # noqa: F401,E402
from event_store_spark.plans import scale_rank as _scale_rank  # noqa: F401,E402
from event_store_spark.plans import pipeline as _pipeline  # noqa: F401,E402
from event_store_spark.plans import ivf as _ivf  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE"]
