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


#: hex digit -> value, as portable SQL (mirrors _HEXBYTE's strpos trick)
#: 24-bit stub hash: a real pHash is 64-bit, but the stub (sha-derived,
#: not locality-sensitive) would then never produce a candidate pair on
#: the fixture corpus and the verify path would go untested; 24 bits is
#: sized so deterministic birthday collisions exercise block-join +
#: Hamming verify end-to-end. The width is ONE constant.
_PHASH_HEX_CHARS = 6
_PHASH_BLOCKS = 3  # pigeonhole: distance <= 2 pairs share >= 1 block of 2


def _duck_phash(col_sql: str) -> str:
    """DuckDB integer from the first `_PHASH_HEX_CHARS` sha256 hex chars."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col_sql}, {p + 1}, 1)) - 1)::BIGINT"
        f" * {16 ** (_PHASH_HEX_CHARS - 1 - p)}::BIGINT"
        for p in range(_PHASH_HEX_CHARS)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_duck_phash('sha256(text)')} AS ph
               FROM documents),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                     bit_count(xor(a.ph, b.ph)) AS hamming
              FROM h a JOIN h b ON a.doc_id < b.doc_id)
    SELECT d1, d2, CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 2
    ORDER BY hamming, d1, d2 LIMIT 50
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the binary media column
    (Hamming distance ≤ 2 on the stub hash), the image-dedup step of a
    multimodal ingest pipeline.

    The pHash itself is the documented STUB: a real implementation decodes
    the image and DCT-hashes the low frequencies (no codecs in this
    sandbox); here the hash is the first 60 bits of sha256(content), so
    only byte-identical media collide — which the fixture corpus has, and
    which the oracle reproduces exactly. Everything around the stub is the
    real scale plan, identical in shape to `dedup_simhash`: split the hash
    into {_PHASH_BLOCKS} pigeonhole blocks of 2 hex chars (8 bits) — any
    pair within Hamming ≤ 2 agrees on at least one whole block — equi-join
    per (block_idx, block), distinct the candidate pairs, verify with one
    `bit_count(xor)`. No all-pairs stage anywhere; swapping in a true DCT
    pHash changes ONE projection."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs)
    hashed = media.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("hex")
    ).select(
        "doc_id",
        F.conv(F.substring("hex", 1, _PHASH_HEX_CHARS), 16, 10)
        .cast("long")
        .alias("ph"),
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BLOCKS - 1))).alias(
            "block_idx"
        ),
        F.col("hex"),
    ).withColumn("block", F.expr("substr(hex, block_idx * 2 + 1, 2)"))
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.ph").alias("ph1"),
            F.col("b.ph").alias("ph2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph1").bitwiseXOR(F.col("ph2")))
    return (
        cand.select("d1", "d2", hamming.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= 2)
        .orderBy("hamming", "d1", "d2")
        .limit(50)
    )
