"""Generic temporal join operators: as-of join and interval (range) join.

Library-grade versions of the shapes registered as `plans/temporal.py`
queries, usable on arbitrary DataFrames. Both avoid the naive inequality
join (which Catalyst can only execute as a nested-loop / candidate
explosion) in favor of shuffle-friendly compositions:

- :func:`asof_join` — union+carry: tag both inputs, union them, sort each
  key's rows by time inside ONE window, and carry the right side's payload
  forward with ``last(..., ignorenulls=True)``. One shuffle on the key,
  cost O(|L|+|R|) per key, independent of how many right rows precede each
  left row.

- :func:`interval_join` — time-bucket banding: with window length
  ``W = upper - lower``, a right row lands in exactly one ``W``-wide
  bucket and a left row's `[t+lower, t+upper]` interval intersects at most
  two consecutive buckets, so each qualifying pair meets in exactly one
  bucket of an ordinary equi-join (no double counting, no cartesian).
  Optional equi keys tighten the join further.

Both accept timestamp or numeric time columns (timestamps are compared at
microsecond precision).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _as_micros(df: DataFrame, col: str) -> Column:
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp_ltz"))
    return F.col(col).cast("bigint")


def _reject_reserved(prefixes: tuple[str, ...], *dfs: DataFrame) -> None:
    """Internal scratch columns start with '_'; a user column shadowing one
    would be silently misread — fail loudly instead."""
    for df in dfs:
        for c in df.columns:
            if c.startswith(prefixes):
                raise ValueError(
                    f"column {c!r} collides with an internal name; rename it "
                    f"before calling this operator (reserved prefixes: {prefixes})"
                )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` and equal join keys.

    Ties on ``right_time`` break deterministically to the greatest
    ``payload`` tuple (column order = significance, last wins). ``how`` is
    ``"left"`` (unmatched left rows keep NULL payload) or ``"inner"``
    (unmatched left rows dropped). Output: all ``left`` columns + the
    ``payload`` columns.

    Scale: one hash shuffle of |L|+|R| rows on ``keys``; the per-key sorted
    window scan replaces any per-left-row probe or (left × history)
    candidate join.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    _reject_reserved(("_t", "_is_r", "_p_", "_m"), left, right)
    keys = list(keys)
    payload = list(payload)
    left_cols = [c for c in left.columns if c not in keys]
    # a payload column sharing a name with ANY output left column (join
    # keys included — the output emits *keys too) would produce DUPLICATE
    # output column names — valid to Spark, but any downstream reference
    # is ambiguous; fail loudly instead (ADVICE r4)
    clash = sorted(set(payload) & set(left.columns))
    if clash:
        raise ValueError(
            f"payload column(s) {clash} collide with left output columns; "
            "rename or drop them on one side before asof_join"
        )
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)

    r = right.select(
        *keys,
        _as_micros(right, right_time).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols],
    )
    l = left.select(
        *keys,
        _as_micros(left, left_time).alias("_t"),
        F.lit(0).alias("_is_r"),
        *[F.lit(None).cast(right_types[c]).alias(f"_p_{c}") for c in payload],
        *left_cols,
    )
    # rights sort BEFORE lefts at equal time (inclusive <=); among equal-time
    # rights the greatest payload tuple sorts last, so last() keeps it.
    # The payload is carried as ONE struct (non-NULL exactly for right rows,
    # even when individual payload values are NULL) — per-column last()
    # calls would mix fields from different rows when a value is NULL.
    order = [F.col("_t").asc(), F.col("_is_r").desc()] + [
        F.col(f"_p_{c}").asc() for c in payload
    ]
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    pstruct = F.when(
        F.col("_is_r") == 1,
        F.struct(*[F.col(f"_p_{c}").alias(c) for c in payload]),
    )
    carried = r.unionByName(l).select(
        *keys,
        "_is_r",
        *left_cols,
        F.last(pstruct, ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.where(F.col("_is_r") == 0)
    if how == "inner":
        out = out.where(F.col("_m").isNotNull())
    return out.select(
        *keys,
        *left_cols,
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the right rows with ``right_time`` in
    ``[left_time + lower_us, left_time + upper_us]`` (microseconds,
    inclusive), optionally also matching on equi ``keys``.

    ``how`` is ``"inner"`` or ``"left"`` (left keeps zero-match rows with
    NULL right columns). Output: left columns + right columns (right time
    column included; name collisions must be resolved by the caller
    beforehand). Note ``"left"`` evaluates the banded join a second time
    for the zero-match recovery (Catalyst prunes that pass to the left
    tuple columns, and without stable row identities a shared subplan
    can't be expressed); when the recovery isn't needed, ``"inner"`` does
    one pass.

    Scale: the band width is the window length, so each left row explodes
    to at most 2 bucket probes regardless of radius/corpus; the join is a
    plain equi-join on (bucket, *keys) with the range predicate as a
    residual inside the join condition.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    _reject_reserved(("_lt", "_rt", "_bucket"), left, right)
    width = max(upper_us - lower_us, 1)
    keys = list(keys)

    def _floordiv(col: Column) -> Column:
        # floor division that stays exact for |t| < 2^53 µs (pmod makes the
        # numerator exactly divisible, so the double division is integral)
        return ((col - F.pmod(col, F.lit(width))) / F.lit(width)).cast("bigint")

    lt = _as_micros(left, left_time)
    rt = _as_micros(right, right_time)
    lb = left.withColumn("_lt", lt).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _floordiv(F.col("_lt") + F.lit(lower_us)),
                _floordiv(F.col("_lt") + F.lit(upper_us)),
            )
        ),
    )
    r = right.withColumn("_rt", rt).withColumn("_bucket", _floordiv(F.col("_rt")))
    cond = (lb["_bucket"] == r["_bucket"]) & (
        (r["_rt"] >= lb["_lt"] + F.lit(lower_us))
        & (r["_rt"] <= lb["_lt"] + F.lit(upper_us))
    )
    for k in keys:
        cond = cond & (lb[k] == r[k])
    right_out = [c for c in right.columns if c not in keys]
    # the explode is always inner-joined: an unmatched bucket COPY must not
    # produce an output row — only a left row none of whose copies matched
    matched = lb.join(r, cond, "inner")
    matched_out = matched.select(
        *[lb[c] for c in left.columns], *[r[c] for c in right_out]
    )
    if how == "inner":
        return matched_out
    # left-outer: recover zero-match left rows with a null-safe anti join on
    # the full left tuple (identical left rows are interchangeable, so this
    # is exact even with duplicates; <=> keeps NULL-valued columns matched)
    seen = matched.select(*[lb[c].alias(c) for c in left.columns]).distinct()
    anti = left.alias("_l").join(
        seen.alias("_s"),
        [F.col(f"_l.{c}").eqNullSafe(F.col(f"_s.{c}")) for c in left.columns],
        "left_anti",
    )
    right_types = dict(right.dtypes)
    missing = anti.select(
        *left.columns,
        *[F.lit(None).cast(right_types[c]).alias(c) for c in right_out],
    )
    return matched_out.unionByName(missing)


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap_us: int,
    order_cols: Sequence[str] = (),
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign gap-based sessions per key: a new session starts when the gap
    to the previous row (by ``time_col``, then ``order_cols`` for
    deterministic ties) exceeds ``gap_us`` microseconds.

    Adds ``session_col``: the 1-based session ordinal within the key — so
    ``(keys..., session_col)`` is a stable session identifier and
    ``max(session_col)`` per key is the session count.

    Scale: one shuffle on ``keys``, two stacked window functions over the
    same sort (lag + running sum share one exchange+sort); no state beyond
    the window frame. The streaming twin is ``session_window`` + watermark.
    """
    if gap_us < 0:
        raise ValueError("gap_us must be >= 0")
    keys = list(keys)
    t = _as_micros(df, time_col)
    w = W.partitionBy(*keys).orderBy(t.asc(), *[F.col(c).asc() for c in order_cols])
    prev = F.lag(t).over(w)
    new_session = F.when(
        prev.isNull() | ((t - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    run = W.partitionBy(*keys).orderBy(
        t.asc(), *[F.col(c).asc() for c in order_cols]
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(run).cast("bigint"))


def sessionize_stream(df: DataFrame, keys: Sequence[str], time_col: str, gap_us: int):
    """Streaming twin of :func:`sessionize`, sharing its gap parameter and
    boundary semantics: returns ``df.groupBy(session_window(...), *keys)``
    ready for ``.agg(...)`` (count of groups per key = the batch operator's
    ``max(session_seq)``).

    Boundary alignment: the batch operator keeps a row in the SAME session
    when ``delta <= gap_us`` (split strictly beyond the gap), while Spark's
    ``session_window`` closes the window at exactly ``start + gap``
    (half-open — a row landing exactly at the boundary starts a NEW
    session). Spark timestamps are integer microseconds, so passing
    ``gap_us + 1`` microseconds to session_window makes the two
    definitions agree on every input, including exact-boundary events.
    The caller owns the watermark (``df.withWatermark`` before calling)."""
    if gap_us < 0:
        raise ValueError("gap_us must be >= 0")
    return df.groupBy(
        F.session_window(F.col(time_col), f"{gap_us + 1} microseconds"),
        *keys,
    )
