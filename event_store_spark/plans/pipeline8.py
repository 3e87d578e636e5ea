"""Event-timeline analytics + OLAP pivot, round-5 extension.

Four operators a production event store gets queried with that the
inventory didn't yet cover:

- `pivot_line_status` — a pivot table (wide conditional aggregation),
  the one grouping-sets shape q12 (ROLLUP) / q13 (CUBE) didn't cover.
- `concurrency_peak` — peak simultaneous activity via a SEGMENTED
  sweep-line: the classic "max concurrent sessions" query, implemented
  as the two-pass distributed prefix-sum (per-day local sweeps + an
  O(#days) carry pass) rather than one global sort, so it scales.
- `time_weighted_avg` — TWA of a sampled value over each stream's
  timeline (the signature irregular-time-series aggregate; plain AVG
  over-weights bursts).
- `gap_islands` — per-user longest consecutive-day activity streak
  (gaps-and-islands), the canonical retention/engagement metric.

Reference parity: these consume the ordered event log the reference
exposes via subscribe (`ReactorKafkaEventStore.java:95-118`); the
analytics themselves are the consumer-side queries its users run.
Design rules as the rest of plans/: built-in Catalyst expressions only,
every query DuckDB-oracle-checked with identically aliased columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ------------------------------------------------------------------- pivot

@register(
    "pivot_line_status",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS cnt_f,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS cnt_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_line_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot table: quantity and row count by returnflag × linestatus,
    linestatus spread across columns.

    Uses `groupBy().pivot(col, values)` WITH the explicit value list —
    without it Spark runs an extra distinct-collect job to discover the
    pivot domain, which at 100 TB is a full shuffle just to learn two
    constants. With the list, the pivot compiles to exactly the oracle's
    conditional aggregation: ONE hash aggregate with map-side partials,
    no extra pass."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.coalesce(F.col("F_cnt"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O_cnt"), F.lit(0)).alias("cnt_o"),
    ).orderBy("l_returnflag")


# ------------------------------------------------------- sweep-line peak

#: active window an event contributes to (sweep-line interval length)
CONCURRENCY_WINDOW = "INTERVAL 5 MINUTES"


@register(
    "concurrency_peak",
    oracle="""
    WITH pts AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM events),
    run AS (
        SELECT event_type,
               SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM pts)
    SELECT event_type, MAX(c) AS peak
    FROM run GROUP BY event_type ORDER BY event_type
    """,
)
def concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-active events per type, where each
    event is active for 5 minutes after its timestamp — the classic
    max-concurrent-sessions sweep line (+1 at start, −1 at end, running
    sum, max). Ends sort before starts at the same instant (delta asc),
    making the interval half-open.

    The oracle's single global running sum per type is SEQUENTIAL — one
    partition per event_type would sort the whole 100 TB timeline on 5
    keys. The engine instead runs the distributed two-pass prefix-sum:

    1. per (type, day): local sweep — running sum within the day's
       points, keeping the day's max and its net ±1 balance. Days are
       sound segments because a running sum is a prefix sum: an
       interval crossing midnight just contributes its −1 point to the
       next day's segment.
    2. per type: carry-in offset = prefix sum of day nets over the
       O(#days) day table (a window over days, not rows), then
       peak = max(carry + local_max).

    Within a tie-group of identical (t, delta) sort keys the running
    sum's intermediate values depend on intra-group order, but the
    group's MAX is order-invariant (all deltas in the group are equal,
    so the extremum sits at the group boundary) — the MAX aggregate
    both engines take makes the result deterministic."""
    ev = _events(spark, sf_dir).select("event_type", "ts")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr(CONCURRENCY_WINDOW)).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends).withColumn("day", F.to_date("t"))

    w_day = (
        W.partitionBy("event_type", "day")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = pts.withColumn("run", F.sum("delta").over(w_day))
    day_stats = local.groupBy("event_type", "day").agg(
        F.max("run").alias("local_max"), F.sum("delta").alias("net")
    )
    w_type = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        day_stats.withColumn(
            "carry", F.coalesce(F.sum("net").over(w_type), F.lit(0))
        )
        .groupBy("event_type")
        .agg(F.max(F.col("carry") + F.col("local_max")).alias("peak"))
        .orderBy("event_type")
    )


# --------------------------------------------------- time-weighted average

@register(
    "time_weighted_avg",
    oracle="""
    WITH seg AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               epoch_us(LEAD(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id))
                   - epoch_us(ts) AS dt
        FROM events)
    SELECT event_type,
           CAST(SUM(cents * dt) AS DOUBLE)
               / CAST(SUM(dt) AS DOUBLE) / 100.0 AS twa
    FROM seg WHERE dt IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per event_type: each observation
    is held until the next one, so its weight is the gap to the next
    event (the irregular-time-series aggregate; a plain AVG over-weights
    bursts of rapid-fire events). The last observation of a stream has
    no holding interval and is excluded.

    Determinism discipline (as `event_rate_anomalies`): both the
    weights (integer microsecond gaps) and the values (exact cents)
    are integers, summed as DECIMAL(38,0) / HUGEINT — no FP
    accumulation order anywhere. The one double op is the final
    division of two exactly-represented integers, which IEEE 754 makes
    bit-identical across engines.

    Plan: one shuffle on event_type for the LEAD window, then the hash
    agg reuses that partitioning — at 100 TB the 5-key partitioning is
    the skew concern; the fix is the same day-segmented carry pass as
    `concurrency_peak` (LEAD needs only each segment's first row
    carried to the previous segment)."""
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seg = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dt"),
    )
    dec = "decimal(38,0)"
    return (
        seg.where(F.col("dt").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.sum((F.col("cents") * F.col("dt")).cast(dec)).cast("double")
                / F.sum(F.col("dt").cast(dec)).cast("double")
                / F.lit(100.0)
            ).alias("twa")
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------- gaps and islands

@register(
    "gap_islands",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    isl AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM d),
    runs AS (
        SELECT user_id, anchor, COUNT(*) AS len
        FROM isl GROUP BY user_id, anchor)
    SELECT user_id,
           MAX(len) AS longest_streak,
           COUNT(*) AS n_streaks,
           SUM(len) AS active_days
    FROM runs GROUP BY user_id
    ORDER BY longest_streak DESC, user_id LIMIT 100
    """,
)
def gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of consecutive
    calendar days with at least one event, plus streak count and total
    active days — the canonical engagement-streak query.

    The island anchor is `day − row_number(day)`: constant exactly
    within a consecutive run. All arithmetic is integer dates/counts —
    hash-exact. Plan: distinct (user, day) collapses the event volume
    to at most users × days BEFORE the window (at 100 TB this is the
    step that matters — the window and both downstream hash aggs run
    over the collapsed table, so the second shuffle, on user_id alone,
    moves only distinct user-days). Top-100 by TakeOrdered — no global
    sort materialization."""
    d = (
        _events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    runs = (
        d.withColumn(
            "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
        )
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
        .orderBy(F.col("longest_streak").desc(), "user_id")
        .limit(100)
    )
