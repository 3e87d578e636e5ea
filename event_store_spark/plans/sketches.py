"""Sketch/approximate operators — the 100 TB fast path for distinct counts
and quantiles.

These intentionally have NO DuckDB oracle: both engines implement different
approximation algorithms (Spark: HyperLogLog++ and Greenwald-Khanna; DuckDB:
its own HLL/t-digest), so cross-engine value equality is undefined. The
driver records a rows-only check; the *accuracy* contract (within stated
error of the exact answer) is pinned by tests/test_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table


@register("approx_distinct_users")  # no oracle: algorithm-specific values
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts over events (2% target error).

    At 100 TB this replaces q11's exact COUNT(DISTINCT) — one pass, fixed
    memory per group, partial-mergeable sketches (no distinct expansion)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("event_type")
    )


@register("approx_price_quantiles")  # no oracle: algorithm-specific values
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate order-price quartiles (accuracy 1/10000).

    The scale alternative to q40's exact median: mergeable quantile summaries
    instead of a global sort."""
    return load_table(spark, sf_dir, "orders").agg(
        F.round(
            F.percentile_approx("o_totalprice", F.lit(0.25), F.lit(10000)), 2
        ).alias("p25"),
        F.round(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)), 2
        ).alias("p50"),
        F.round(
            F.percentile_approx("o_totalprice", F.lit(0.75), F.lit(10000)), 2
        ).alias("p75"),
    )
