"""Segmented EWMA: the distributed form of the sequential smoothing fold.

`plans.pipeline8.ewma_value` computes EWMA as one Catalyst fold per key —
correct, but it holds each key's whole series in one task
(`collect_list`), the bounded-series contract. This module supplies the
scale path: EWMA is an affine per-element update
``e_i = α·x_i + (1−α)·e_{i−1}``, so a whole SEGMENT of n values composes
into a single affine map ``e_out = A·e_in + B`` with

    A = (1−α)^n
    B = fold of the segment seeded with e_in = 0

Affine maps compose associatively, which means a series can be cut into
arbitrary chronological segments (days, files, micro-batches), each
segment folded independently in parallel, and the per-key result
recovered by composing the O(#segments) little (A, B) pairs in order —
the same two-pass carry pattern as `plans.pipeline8.concurrency_peak`
and the seq_packing prefix sum:

    pass 1 (parallel, heavy):  per (key, segment): fold n values → (A, B)
    pass 2 (tiny):             per key: ordered fold over segments
                               e = A_s·e + B_s, seeded with the series'
                               first value (EWMA's conventional seed)

The recombination associates the arithmetic differently from the pure
sequential fold, so results agree to FP round-off (≤ ~1e-12 relative),
not bit-exactly — which is why the ORACLE-checked query keeps the
sequential form and this operator is property-tested against it with a
tolerance instead (`tests/test_ewma_segmented.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ewma_segmented(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    segment: str,
    alpha: float = 0.1,
) -> DataFrame:
    """EWMA of `value` per `key`, ordered by `order` columns, segmented
    by the `segment` column (chronological within each key — e.g. a day
    or file id). Returns (key, ewma, n).

    Both passes are shuffles on `key` (pass 1 additionally groups by
    segment); pass 2's fold runs over O(#segments) rows per key, never
    raw data. Seed = first value of the whole series, matching the
    sequential fold's convention."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    a, b = F.lit(alpha), F.lit(1.0 - alpha)

    sort_struct = F.struct(*order, F.col(value).alias("_v"))

    def _vals(col: Column) -> Column:
        return F.transform(col, lambda s: s["_v"])

    # pass 1: per (key, segment) — A = (1-a)^n, B = zero-seeded fold
    seg = (
        df.groupBy(key, segment)
        .agg(
            F.array_sort(F.collect_list(sort_struct)).alias("_arr"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            key,
            segment,
            F.pow(b, F.col("_n")).alias("_A"),
            F.aggregate(
                _vals(F.col("_arr")),
                F.lit(0.0),
                lambda acc, x: a * x + b * acc,
            ).alias("_B"),
            F.element_at(_vals(F.col("_arr")), 1).alias("_first"),
            F.col("_n"),
        )
    )

    # pass 2: per key — compose the O(#segments) affine maps in order.
    # The sequential fold SEEDS with the series' first value x_1 (it is
    # not alpha-weighted), but segment 1's (A, B) was built treating x_1
    # as a normal element. Deriving segment 1's map WITHOUT its first
    # element from its full map: prepending x_1 to a map (A', B') gives
    # A = (1−a)·A', B = a·x_1·A' + B', so
    #   A' = A/(1−a),   B' = B − a·x_1·A/(1−a)
    # and segment 1 contributes head = A'·x_1 + B'. For a one-element
    # first segment this reduces to head = x_1 exactly.
    segs = seg.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(segment, "_A", "_B", "_first", "_n"))
        ).alias("_segs"),
        F.sum("_n").alias("n"),
    )
    first_val = F.element_at(F.col("_segs"), 1)["_first"]
    a1 = F.element_at(F.col("_segs"), 1)["_A"]
    b1 = F.element_at(F.col("_segs"), 1)["_B"]
    head = (a1 / b) * first_val + (b1 - a * first_val * a1 / b)
    # single-element first segment: A=(1-a), B=a·x_1 ⇒ head = x_1 exactly
    rest = F.slice(F.col("_segs"), 2, F.size(F.col("_segs")) - 1)
    ewma = F.aggregate(
        rest, head, lambda acc, s: s["_A"] * acc + s["_B"]
    )
    return segs.select(key, ewma.alias("ewma"), "n")
