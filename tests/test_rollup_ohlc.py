"""ContinuousOHLC: incrementally-maintained candlestick bars.

Pins the subclass contract on the rollup framework:
- after each incremental run the OHLC table equals the batch
  min_by/max_by aggregation over everything ingested so far — open and
  close converge to the same values however the stream is cut into
  micro-batches (the associative-merge claim);
- a second ingest touching an existing bar UPDATES that bar's
  open/high/low/close/volume correctly (not just appends);
- the base q36 rollup is untouched by the refactor (schema hook).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from event_store_spark.streaming.rollup import ContinuousOHLC, ContinuousRollup

T0 = datetime.datetime(2025, 3, 1, 0, 0, 0)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def _write_batch(spark, src, spec, start_id=0):
    rows = [
        (start_id + i, T0 + datetime.timedelta(minutes=m), 1, t, float(v), "{}")
        for i, (m, t, v) in enumerate(spec)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _batch_ohlc(spark, src, window="1 hour"):
    df = spark.read.parquet(src)
    sk = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    out = (
        df.withColumn("_sk", sk)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("value", "_sk").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "_sk").alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.sum("value").alias("turnover"),
        )
        .select(F.col("w.start").alias("win_start"), "*")
        .drop("w")
    )
    return {
        (r.win_start, r.event_type): (
            r.open,
            r.high,
            r.low,
            r.close,
            r.volume,
            round(r.turnover, 6),
        )
        for r in out.collect()
    }


def _got(rollup):
    return {
        (r.win_start, r.event_type): (
            r.open,
            r.high,
            r.low,
            r.close,
            r.volume,
            round(r.turnover, 6),
        )
        for r in rollup.table().collect()
    }


def test_ohlc_matches_batch_and_updates_bars_incrementally(spark, tmp_path):
    src = str(tmp_path / "src")
    ohlc = ContinuousOHLC(
        spark,
        src,
        str(tmp_path / "bars"),
        str(tmp_path / "ck"),
        watermark_delay="10 hours",
    )
    # first ingest: two bars, deliberately out-of-order values
    _write_batch(
        spark,
        src,
        [(10, "click", 5.0), (0, "click", 2.0), (50, "click", 9.0), (70, "view", 3.0)],
    )
    ohlc.run_available()
    assert _got(ohlc) == _batch_ohlc(spark, src)
    bars = _got(ohlc)
    k = (T0, "click")
    assert bars[k][0] == 2.0 and bars[k][3] == 9.0  # open=min-sk, close=max-sk

    # second ingest: rows land INSIDE the first bar — before its current
    # open and after its current close — plus a fresh bar; the maintained
    # open/close must move, volume must grow
    _write_batch(
        spark,
        src,
        [(55, "click", 1.0), (5, "click", 7.5), (130, "view", 4.0)],
        start_id=100,
    )
    ohlc.run_available()
    assert _got(ohlc) == _batch_ohlc(spark, src)
    bars = _got(ohlc)
    assert bars[k][3] == 1.0  # new close (latest sort key in the bar)
    assert bars[k][4] == 5  # volume grew


def test_base_rollup_schema_hook_unchanged(spark, tmp_path):
    """The refactor's hooks leave the q36 rollup behavior intact, and an
    empty OHLC table carries its own schema."""
    base = ContinuousRollup(
        spark, str(tmp_path / "s1"), str(tmp_path / "t1"), str(tmp_path / "c1")
    )
    assert base.table().columns == ["win_start", "event_type", "cnt", "sum_value"]
    ohlc = ContinuousOHLC(
        spark, str(tmp_path / "s2"), str(tmp_path / "t2"), str(tmp_path / "c2")
    )
    assert ohlc.table().columns == [
        "win_start",
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "turnover",
    ]
