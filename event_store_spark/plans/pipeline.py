"""Training-data pipeline operators: deterministic sampling & quota capping.

A 100 TB corpus is never trained on whole — pipelines sample, stratify, and
cap per-domain contributions before tokenization. These operators make those
steps engine-native, with the property that matters at scale: **determinism
without coordination**. Every selection is a pure function of the row's key
(md5), so it is reproducible across runs/clusters, needs no RNG state, no
driver-side shuffle, and re-running on a grown corpus keeps prior decisions
stable (only new rows get new verdicts) — the property curriculum/dataset
versioning needs.

All three are oracle-checked (md5 is bit-identical across engines;
hex-string comparison is portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _hash_key(col: str = "doc_id"):
    """Deterministic per-row selection key: md5 of the decimal id string."""
    return F.md5(F.col(col).cast("string"))


@register(
    "sample_stratified",
    oracle="""
    SELECT lang, COUNT(*) AS kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE WHEN lang = 'en' THEN '80' ELSE '28' END
    GROUP BY lang ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum hash sampling: ~50% of en docs, ~15.6% of the rest.

    The keep decision is `md5(doc_id) prefix < stratum threshold` — a pure
    row-local predicate: no shuffle, no RNG, map-side evaluable, pushdown-
    friendly, and stable under corpus growth (each doc's fate never changes).
    Thresholds are hex-prefix fractions (0x80/256 = 50%, 0x28/256 ≈ 15.6%);
    any per-stratum rate is a threshold literal away."""
    threshold = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("28"))
    return (
        _docs(spark, sf_dir)
        .where(F.substring(_hash_key(), 1, 2) < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
        .orderBy("lang")
    )


@register(
    "sample_bottomk",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 25
    """,
)
def sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-size uniform sample via bottom-k on the hash order.

    ORDER BY md5(key) LIMIT k is a uniform-without-replacement k-sample
    that distributes as per-partition top-k heaps merged on the driver
    (TakeOrderedAndProject) — no global sort, no reservoir state, same k
    rows on every engine and every rerun."""
    return (
        _docs(spark, sf_dir)
        .orderBy(_hash_key(), "doc_id")
        .select("doc_id", "lang", "source")
        .limit(25)
    )


@register(
    "source_quota",
    oracle="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents)
    WHERE rn <= 40 ORDER BY source, doc_id
    """,
)
def source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution at 40 docs (anti-domination guard —
    the per-domain quota step every web-scale corpus applies).

    Which 40 survive is again hash-ordered, so quotas are reproducible and
    unbiased by ingestion order. The window partitions by `source` —
    parallel across domains; a pathologically hot domain is one partition,
    bounded by the quota scan itself (rank-then-filter stops mattering
    past the quota; at extreme skew swap in a two-pass band rank per
    `plans.scale_rank`)."""
    w = W.partitionBy("source").orderBy(_hash_key(), "doc_id")
    return (
        _docs(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 40)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )
