"""Bucketed (co-located) joins: the shuffle-free layout for repeated joins.

At 100 TB the fact⋈fact join you run every day should not shuffle either
side every run: writing both tables bucketed (+ sorted) by the join key
pre-partitions them once at write time, and every subsequent sort-merge
join and same-key aggregation reads the buckets back with NO Exchange in
the plan. These tests pin that contract mechanically — bucketed scan →
SortMergeJoin with zero Exchange nodes — and that the answer equals the
plain shuffled join's.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from event_store_spark.tables import load_table

BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    for name in ("li_bucketed", "orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        li.write.bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield spark.table("li_bucketed"), spark.table("orders_bucketed")
    for name in ("li_bucketed", "orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _no_broadcast(spark):
    """Force the shuffle-join path so the assertion is about bucketing,
    not about the small side fitting the broadcast threshold."""
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed, sf_correct):
    li_b, ord_b = bucketed
    old = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself is exchange-free; only the tiny post-join
        # per-status aggregation may shuffle
        join_part = plan[plan.index("SortMergeJoin") :]
        assert "Exchange" not in join_part, join_part
        # correctness: equals the plain parquet-scan join
        li = load_table(spark, sf_correct, "lineitem")
        orders = load_table(spark, sf_correct, "orders")
        want = {
            (r.o_orderstatus, r.qty)
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
            .collect()
        }
        got = {(r.o_orderstatus, r.qty) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_reuses_bucket_partitioning(spark, bucketed):
    """A same-key aggregation over ONE bucketed table needs no exchange at
    all: the scan's bucket partitioning satisfies the agg's distribution."""
    li_b, _ = bucketed
    agg = li_b.groupBy("l_orderkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
