"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Spark's
native bucketing (`bucketBy` + `saveAsTable`) pre-partitions both sides by
the join key at write time; a join between two tables bucketed the same way
then runs with **no Exchange on either side** — verified by the plan test.

This is the persistent-layout complement to the per-query hints in
`plans/`: hint-level broadcast for dims, bucketing for repeated big-big
joins on a stable key (the reference's per-topic tables are the same idea —
physical layout chosen to make the hot access path cheap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sort-bucketed) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_pair: tuple[str, str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys (no shuffle)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    lk, rk = key_pair
    return left.join(right, left[lk] == right[rk])


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan
    (BroadcastExchange moves no partitions and doesn't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "Broadcast" not in line and "Reused" not in line
    )
