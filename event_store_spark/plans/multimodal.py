"""Multimodal pipeline query: binary media columns through mapInPandas.

The decode stage is a deterministic stub (no codecs in this environment),
but every Spark-side mechanism is real — binary column, Arrow batches,
mapInPandas with explicit schema, JVM-side aggregation of the extracted
features — and the byte/hash statistics are oracle-checkable because the
"media" bytes are the UTF-8 encoding of document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.functions.multimodal import attach_binary, extract_features
from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table


@register(
    "multimodal_features",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           ROUND(AVG(CAST(octet_length(encode(text)) AS DOUBLE)), 2) AS avg_bytes,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS distinct_sha
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media → mapInPandas feature extraction → JVM aggregation.

    The oracle recomputes the byte-level stats (n_bytes = UTF-8 octet
    length, sha256 of content) in SQL — verifying that the Arrow/pandas
    batch path neither drops nor mangles rows. The fake width/height
    features are exercised by unit tests instead (no SQL analog).
    """
    docs = load_table(spark, sf_dir, "documents")
    features = extract_features(attach_binary(docs))
    return features.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.round(F.avg(F.col("n_bytes").cast("double")), 2).alias("avg_bytes"),
        F.countDistinct("sha256").cast("bigint").alias("distinct_sha"),
    )
