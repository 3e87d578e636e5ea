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

from event_store_spark.functions.multimodal import (
    attach_binary,
    extract_features,
    frame_sample,
    resize_plan,
)
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


# hex-pair → byte value, in portable SQL (both engines see lowercase hex)
_HEXBYTE = (
    "((strpos('0123456789abcdef', substr(sha256(text), {p}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(sha256(text), {p1}, 1)) - 1))"
)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (SELECT {_HEXBYTE.format(p=5, p1=6)} % 16 + 1 AS n_frames
               FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_videos,
           CAST(SUM((n_frames - 1) // 4 + 1) AS BIGINT) AS n_sampled_frames
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling end-to-end: binary → mapInPandas decode (stub)
    → JVM-side every-4th-frame explode → aggregation.

    The oracle recomputes the stub decoder's frame count (sha256 byte 2
    mod 16 + 1) in SQL and the ceil-division sample count — checking the
    Arrow batch path AND the sequence/explode sampling arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    features = extract_features(attach_binary(docs, media_type="video/fake"))
    sampled = frame_sample(features, every_n=4)
    return sampled.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_videos"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled_frames"),
    )


@register(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (SELECT
            {_HEXBYTE.format(p=1, p1=2)} % 64 + 1 AS w,
            {_HEXBYTE.format(p=3, p1=4)} % 64 + 1 AS h
        FROM documents),
    plan AS (SELECT w, h,
            CASE WHEN greatest(w, h) > 32
                 THEN CAST(FLOOR(w * (32.0 / greatest(w, h))) AS INT) ELSE w END
                AS target_w,
            CASE WHEN greatest(w, h) > 32
                 THEN CAST(FLOOR(h * (32.0 / greatest(w, h))) AS INT) ELSE h END
                AS target_h,
            greatest(w, h) > 32 AS needs_resize
        FROM dims)
    SELECT CAST(SUM(CASE WHEN needs_resize THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resized,
           CAST(SUM(target_w) AS BIGINT) AS sum_w,
           CAST(SUM(target_h) AS BIGINT) AS sum_h
    FROM plan
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over decoded dimensions.

    Dimension math never leaves the JVM; the oracle recomputes the stub
    dims (sha256 bytes 0/1 mod 64 + 1) and the cap-at-32 scaling in SQL —
    pinning the exact floor/ratio arithmetic a pixel pass would receive."""
    docs = load_table(spark, sf_dir, "documents")
    features = extract_features(attach_binary(docs))
    plan = resize_plan(features, max_dim=32)
    return plan.agg(
        F.sum(F.col("needs_resize").cast("int")).cast("bigint").alias("n_resized"),
        F.sum("target_w").cast("bigint").alias("sum_w"),
        F.sum("target_h").cast("bigint").alias("sum_h"),
    )
