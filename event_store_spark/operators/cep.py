"""Complex-event-processing pattern matcher (MATCH_RECOGNIZE / Flink-CEP
analog): detect ordered, time-bounded event sequences per key.

Spark has no MATCH_RECOGNIZE; the semantics need a sequential fold over
each key's ordered events, which is exactly the brief's custom-operator
path (b): step predicates are evaluated MAP-SIDE as boolean columns
(whole-stage codegen — arbitrary Catalyst expressions, no user code
crosses to Python), then an Arrow `applyInPandas` runs the tiny DFA per
key over (timestamp, step-flags) only.

Semantics (deterministic, mirrored by the recursive-CTE oracle of
`plans.cep_queries`):

- events are processed in (time_col, *order_cols) order per key;
- skip-till-next-match: events matching no awaited step are ignored;
- non-overlapping: on completion the machine resets — an event serves
  at most one match;
- greedy anchor: while a candidate is open, a new step-1 event does NOT
  re-anchor it;
- `within_us` bounds END-to-START: before each event, an open candidate
  older than the bound is dropped, and the current event is immediately
  eligible to anchor a fresh candidate.

Scale: the shuffle is one hash exchange on the keys; per-key state is
O(#steps) and per-key work is one linear pass (each key's events fit a
task by the same contract as `sessionize`/`asof_join`). Arrow moves
only (key, int64 time, one boolean per step).

The per-match fold is order-sensitive by definition — this is the
operator class (stateful sequence detection) that cannot be a window
composition when matches must not overlap: a window sees per-row
context, not the consumed/not-consumed state of earlier rows.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_pattern(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    order_cols: Sequence[str],
    steps: Sequence[Column],
    within_us: int,
) -> DataFrame:
    """Matches as (keys..., match_idx, start_us, end_us), one row per
    completed non-overlapping match; `match_idx` counts from 1 in match
    order per key. `time_col` must be a timestamp column; `order_cols`
    break time ties to a total order."""
    keys = list(keys)
    n_steps = len(steps)
    if n_steps < 1:
        raise ValueError("pattern needs at least one step")
    flags = [s.cast("boolean").alias(f"_s{i}") for i, s in enumerate(steps)]
    prepared = df.select(
        *keys,
        (F.unix_micros(F.col(time_col))).alias("_us"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        *flags,
    )
    # events matching NO step are semantics-free under skip-till-next-match
    # (they are never consumed, and the lazy stale-candidate expiry they
    # could trigger fires identically at the next matching event, whose
    # timestamp is later) — drop them map-side BEFORE the key shuffle, so
    # the exchange and the per-key fold carry only pattern-relevant events
    any_flag = F.greatest(*[F.coalesce(F.col(f"_s{i}"), F.lit(False)) for i in range(n_steps)]) if n_steps > 1 else F.coalesce(F.col("_s0"), F.lit(False))
    prepared = prepared.where(any_flag)
    out_schema = (
        ", ".join(f"{k} {t}" for k, t in _key_types(prepared, keys))
        + ", match_idx int, start_us bigint, end_us bigint"
    )
    order = ["_us"] + [f"_o{i}" for i in range(len(order_cols))]
    out_cols = [*keys, "match_idx", "start_us", "end_us"]

    # mapInPandas over key-partitioned, Tungsten-sorted partitions instead
    # of groupBy().applyInPandas(): ONE Python crossing per partition (32)
    # rather than one per key (could be millions), with the sort done by
    # Spark, not pandas per group. Arrow may split a key across successive
    # batches of the same partition; the DFA state (current key, step,
    # anchor, match counter) carries across batches and resets on key
    # change — batches arrive in sorted order within the partition.
    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = None
        step, start, n_matches = 0, 0, 0
        for pdf in batches:
            if pdf.empty:
                continue
            key_arrays = [pdf[k].to_numpy() for k in keys]
            us = pdf["_us"].to_numpy()
            flag_arrays = [
                pdf[f"_s{i}"].fillna(False).to_numpy() for i in range(n_steps)
            ]
            rows = []
            for j in range(len(us)):
                kv = tuple(a[j] for a in key_arrays)
                if kv != cur:
                    cur, step, n_matches = kv, 0, 0
                t = int(us[j])
                if step > 0 and t - start > within_us:
                    step = 0  # stale candidate dropped; this event re-tests
                if step == 0:
                    if flag_arrays[0][j]:
                        step, start = 1, t
                        if n_steps == 1:
                            n_matches += 1
                            rows.append((*kv, n_matches, t, t))
                            step = 0
                elif flag_arrays[step][j]:
                    step += 1
                    if step == n_steps:
                        n_matches += 1
                        rows.append((*kv, n_matches, start, t))
                        step = 0
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)

    return (
        prepared.repartition(*keys)
        .sortWithinPartitions(*keys, *order)
        .mapInPandas(fold, schema=out_schema)
    )


def _key_types(df: DataFrame, keys: Sequence[str]) -> list[tuple[str, str]]:
    types = dict(df.dtypes)
    return [(k, types[k]) for k in keys]
