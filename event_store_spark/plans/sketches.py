"""Sketch/approximate operators — the 100 TB fast path for distinct counts
and quantiles — in ORACLE-AUDITABLE form.

Raw sketch values cannot be oracle-compared: Spark (HyperLogLog++,
Greenwald-Khanna) and DuckDB (its own HLL / t-digest) implement different
approximation algorithms, so cross-engine value equality is undefined. What
IS cross-engine checkable is the accuracy CONTRACT: each query computes the
sketch AND its exact reference in one plan and returns the exact value plus
a within-bound verdict; the oracle recomputes the exact value and asserts
the verdict literally TRUE. A sketch drifting out of its stated error bound
now fails the driver's hash check, not just a local test.

(At 100 TB you run only the sketch half — the exact column here is the
audit harness, not the production path; `tests/test_sketches.py` pins the
numeric error separately.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table

#: HLL++ relative standard deviation target; the audit accepts 5×rsd —
#: generous against the ~3σ tail while still catching real drift
HLL_RSD = 0.02
HLL_TOLERANCE = 5 * HLL_RSD

#: Greenwald-Khanna accuracy parameter: rank error ≤ n/GK_ACCURACY
GK_ACCURACY = 10_000


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type, audited in-plan: the
    sketch estimate must land within 5×rsd of the exact COUNT(DISTINCT)
    computed in the same aggregation. The oracle re-derives the exact
    column and pins `approx_ok` to TRUE, so the sketch's accuracy contract
    is hash-checked by the driver.

    Scale: the HLL half is one pass with fixed memory per group and
    partial-mergeable state; the exact half exists only as the audit.
    The exact count is two-stage (groupBy (type, user) then count per
    type) rather than COUNT(DISTINCT) in-agg: same answer, but no
    Catalyst Expand multiplying the row stream, and the first shuffle's
    map-side partials collapse duplicate (type, user) pairs — measured
    ~2x faster at sf0.1 and strictly less shuffled data at any scale.
    HLL is duplicate-insensitive, so sketching the deduped pairs yields
    the identical estimator."""
    per_pair = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_pair.groupBy("event_type")
        .agg(
            F.sum("_c").alias("cnt"),
            F.count(F.lit(1)).alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("_approx"),
        )
        .select(
            "event_type",
            "cnt",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(HLL_TOLERANCE)
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_price_quantiles",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS ok25, TRUE AS ok50, TRUE AS ok75
    FROM orders
    """,
)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna order-price quartiles, audited by RANK error.

    GK guarantees the returned element COVERS some rank within n/accuracy
    of the target — i.e. the interval [count(<v)+1, count(<=v)] of ranks
    the value occupies overlaps [q·n − slack, q·n + slack]. With heavily
    duplicated values at a quartile, count(<=v) alone can legitimately
    exceed q·n + slack (the duplicate run extends past the window), so the
    audit checks interval OVERLAP, not the one-sided count (ADVICE r4):
    count(<v) <= q·n + slack AND count(<=v) >= q·n − slack. The oracle pins
    all three verdicts TRUE.

    The audit is two aggregations composed in ONE plan (no driver loop):
    the 1-row quantile estimate broadcast-joins back onto the scan for the
    rank counts. A value-space bound would be wrong — GK's guarantee is in
    rank space, so that's what the audit measures."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    est = orders.agg(
        F.percentile_approx("o_totalprice", F.lit(0.25), F.lit(GK_ACCURACY)).alias("_p25"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(GK_ACCURACY)).alias("_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.75), F.lit(GK_ACCURACY)).alias("_p75"),
    )
    audited = orders.crossJoin(F.broadcast(est)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") < F.col("_p25")).cast("long")).alias("_lt25"),
        F.sum((F.col("o_totalprice") <= F.col("_p25")).cast("long")).alias("_le25"),
        F.sum((F.col("o_totalprice") < F.col("_p50")).cast("long")).alias("_lt50"),
        F.sum((F.col("o_totalprice") <= F.col("_p50")).cast("long")).alias("_le50"),
        F.sum((F.col("o_totalprice") < F.col("_p75")).cast("long")).alias("_lt75"),
        F.sum((F.col("o_totalprice") <= F.col("_p75")).cast("long")).alias("_le75"),
    )
    slack = F.col("n") / F.lit(GK_ACCURACY) + F.lit(1)

    def ok(lt_col: str, le_col: str, q: float):
        # v covers ranks [count(<v)+1, count(<=v)]; overlap with
        # [target-slack, target+slack] requires the interval START
        # (count(<v)+1) to sit at or below the upper bound
        target = F.col("n") * F.lit(q)
        return (
            (F.col(lt_col) + 1 <= target + slack)
            & (F.col(le_col) >= target - slack)
        ).alias(f"ok{int(q * 100)}")

    return audited.select(
        "n",
        ok("_lt25", "_le25", 0.25),
        ok("_lt50", "_le50", 0.5),
        ok("_lt75", "_le75", 0.75),
    )
