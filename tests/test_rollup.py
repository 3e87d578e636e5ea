"""ContinuousRollup: incrementally-maintained windowed aggregate.

Pins the continuous-aggregate contract:
- after each incremental run, the rollup table equals the q36-shaped BATCH
  aggregation over everything ingested so far (same windows, counts, sums);
- a second run touches only the windows the new files hit (update mode),
  yet the merged table stays complete;
- a replayed merge (same batch id) is idempotent — the version pointer
  swap makes re-running a crashed batch safe;
- rows later than the watermark delay are dropped once the watermark has
  advanced past them (late-data bound), and the drop survives a restart
  because the watermark lives in the checkpoint.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from event_store_spark.streaming.rollup import ContinuousRollup

T0 = datetime.datetime(2025, 3, 1, 0, 0, 0)


SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def _write_batch(spark, src, spec, start_id=0):
    rows = [
        (start_id + i, T0 + datetime.timedelta(minutes=m), 1, t, float(v), "{}")
        for i, (m, t, v) in enumerate(spec)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _expected(spark, src, window="1 hour"):
    df = spark.read.parquet(src)
    return {
        (r.win_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt", "sum_value")
        .collect()
    }


def _got(rollup):
    return {
        (r.win_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in rollup.table().collect()
    }


def test_rollup_matches_batch_and_updates_incrementally(spark, tmp_path):
    src = str(tmp_path / "src")
    rollup = ContinuousRollup(
        spark,
        src,
        str(tmp_path / "rollup"),
        str(tmp_path / "ck"),
        watermark_delay="2 hours",
    )
    _write_batch(
        spark,
        src,
        [(0, "click", 1.5), (10, "click", 2.0), (70, "view", 3.0), (130, "click", 4.0)],
    )
    rollup.run_available()
    assert _got(rollup) == _expected(spark, src)

    # batch 2: touches hour 0 again (same window updated), adds hour 3
    _write_batch(
        spark,
        src,
        [(20, "click", 10.0), (200, "view", 7.0)],
        start_id=100,
    )
    rollup.run_available()
    assert _got(rollup) == _expected(spark, src)
    # hour-0 click window now folds all three rows
    hour0 = _got(rollup)[(T0, "click")]
    assert hour0 == (3, 13.5)


def test_rollup_merge_is_idempotent_on_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    rollup = ContinuousRollup(
        spark, src, str(tmp_path / "rollup"), str(tmp_path / "ck")
    )
    _write_batch(spark, src, [(0, "click", 1.0), (65, "view", 2.0)])
    rollup.run_available()
    before = _got(rollup)

    # simulate a crashed-then-replayed merge: re-run the same cumulative
    # batch the stream produced (update-mode rows are cumulative, so the
    # upsert must converge to the same table)
    updates = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    )
    rollup._merge(updates, batch_id=0)
    assert _got(rollup) == before

    # version GC keeps the table readable and bounded: current + at most
    # _KEEP_VERSIONS superseded versions for readers mid-swap
    versions = [d for d in os.listdir(str(tmp_path / "rollup")) if d.startswith("_v")]
    assert len(versions) <= 3


def test_rollup_drops_rows_beyond_watermark_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    rollup = ContinuousRollup(
        spark,
        src,
        str(tmp_path / "rollup"),
        str(tmp_path / "ck"),
        watermark_delay="1 hour",
    )
    # run 1 advances the event-time watermark to (max ts - 1h) = T0+9h
    _write_batch(spark, src, [(0, "click", 1.0), (600, "view", 2.0)])
    rollup.run_available()

    # run 2 (a restart: new query, same checkpoint): one row far older than
    # the persisted watermark (dropped) and one fresh row (kept)
    _write_batch(spark, src, [(30, "click", 99.0), (610, "view", 5.0)], start_id=50)
    rollup.run_available()

    got = _got(rollup)
    assert got[(T0, "click")] == (1, 1.0)  # late row NOT folded in
    assert got[(T0 + datetime.timedelta(hours=10), "view")] == (2, 7.0)


def test_rollup_crash_between_version_write_and_pointer_flip(spark, tmp_path):
    """A merge that died after writing its version directory but BEFORE the
    pointer flip leaves the table on the previous version (readers never see
    a half-committed merge), and replaying the same batch rebuilds the
    version and lands the flip — the crash window converges."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "rollup")
    rollup = ContinuousRollup(spark, src, target, str(tmp_path / "ck"))
    _write_batch(spark, src, [(0, "click", 1.0), (65, "view", 2.0)])
    rollup.run_available()
    committed = _got(rollup)
    pointer_before = rollup._current_version()

    # crash AFTER flip: replaying the batch that IS the current pointer must
    # short-circuit (the flip is the commit marker), never rebuild in place
    updates = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    )
    committed_batch = int(pointer_before[2:])
    rollup._merge(updates, batch_id=committed_batch)
    assert rollup._current_version() == pointer_before
    assert _got(rollup) == committed

    # crash BEFORE flip: the next batch's version dir exists, pointer doesn't
    next_version = f"_v{committed_batch + 1}"
    torn = os.path.join(target, next_version)
    updates.select(
        F.col("window.start").alias("win_start"), "event_type", "cnt", "sum_value"
    ).write.mode("overwrite").parquet(torn)

    # reader still sees the committed version, not the torn one
    assert rollup._current_version() == pointer_before
    assert _got(rollup) == committed

    # replay rebuilds the torn version from scratch and flips atomically
    rollup._merge(updates, batch_id=committed_batch + 1)
    assert rollup._current_version() == next_version
    assert _got(rollup) == committed  # same cumulative values -> same table


def test_rollup_randomized_incremental_maintenance(spark, tmp_path):
    """Fuzz the incremental merge: several randomized append-and-run
    cycles, after each the rollup table must equal the batch aggregate
    over everything ingested (watermark wide enough that nothing drops)."""
    import random

    rng = random.Random(7)
    src = str(tmp_path / "src")
    rollup = ContinuousRollup(
        spark,
        src,
        str(tmp_path / "rollup"),
        str(tmp_path / "ck"),
        watermark_delay="30 days",
    )
    types = ["click", "view", "purchase"]
    next_id = 0
    for cycle in range(4):
        spec = [
            (rng.randint(0, 72 * 60), rng.choice(types), round(rng.uniform(0, 9), 2))
            for _ in range(rng.randint(1, 25))
        ]
        _write_batch(spark, src, spec, start_id=next_id)
        next_id += len(spec)
        rollup.run_available()
        assert _got(rollup) == _expected(spark, src), f"cycle {cycle}"


def test_rollup_time_travel_to_retained_version(spark, tmp_path):
    """Superseded versions retained by GC are readable as snapshots: after
    a second incremental run, the previous version still shows the table
    as of the first run."""
    import pytest

    src = str(tmp_path / "src")
    rollup = ContinuousRollup(spark, src, str(tmp_path / "rollup"), str(tmp_path / "ck"))
    _write_batch(spark, src, [(0, "click", 1.0)])
    rollup.run_available()
    v1 = rollup._current_version()
    snapshot1 = _got(rollup)

    _write_batch(spark, src, [(10, "click", 2.0), (70, "view", 3.0)], start_id=10)
    rollup.run_available()
    assert rollup._current_version() != v1
    assert _got(rollup) == _expected(spark, src)

    old = {
        (r.win_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in rollup.table(version=v1).collect()
    }
    assert old == snapshot1
    assert v1 in rollup.versions()
    with pytest.raises(ValueError):
        rollup.table(version="_v9999")
