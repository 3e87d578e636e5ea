"""Stream-stream interval join: streaming result == batch interval_join.

S-coverage extension: the watermarked stream-stream join over two event
streams produces exactly the pairs the batch banded operator produces on
the same data (inner mode, same inclusive bounds, same keys).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from event_store_spark.operators.temporal import interval_join
from event_store_spark.streaming.joins import stream_interval_join

T0 = datetime.datetime(2025, 6, 1, 0, 0, 0)
RADIUS_US = 5 * 60 * 1_000_000  # ±5 minutes


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lrows = [
        (i, 1 + (i % 2), T0 + datetime.timedelta(minutes=m))
        for i, m in enumerate([0, 3, 10, 30, 31])
    ]
    rrows = [
        (100 + i, 1 + (i % 2), T0 + datetime.timedelta(minutes=m))
        for i, m in enumerate([1, 4, 6, 27, 60])
    ]
    _write(spark, lsrc, lrows, "lid bigint, k bigint, lts timestamp")
    _write(spark, rsrc, rrows, "rid bigint, k bigint, rts timestamp")

    lstream = spark.readStream.schema(spark.read.parquet(lsrc).schema).parquet(lsrc)
    rstream = spark.readStream.schema(spark.read.parquet(rsrc).schema).parquet(rsrc)
    joined = stream_interval_join(
        lstream, rstream, "lts", "rts", -RADIUS_US, RADIUS_US,
        keys=["k"], watermark_delay="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.lid, r.rid) for r in spark.sql("select * from sj_out").collect()
    }

    batch = interval_join(
        spark.read.parquet(lsrc),
        spark.read.parquet(rsrc),
        left_time="lts", right_time="rts",
        lower_us=-RADIUS_US, upper_us=RADIUS_US,
        keys=["k"], how="inner",
    )
    expected = {(r.lid, r.rid) for r in batch.collect()}
    assert got == expected
    assert expected  # non-vacuous: the fixture produces matches


def test_stream_interval_join_requires_streams(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1, T0)], "lid bigint, lts timestamp")
    with pytest.raises(ValueError):
        stream_interval_join(df, df, "lts", "lts", -1, 1)


def test_stream_interval_left_outer_emits_after_watermark(spark, tmp_path):
    """leftOuter: a left row with no match emits its NULL row only after
    BOTH watermarks clear its join window — verified across incremental
    runs on one checkpoint (the unmatched row from run 1 appears once the
    run-2 data advances the watermarks past its window)."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    m = datetime.timedelta
    # L1 matches R1; L2 never matches
    _write(spark, lsrc,
           [(1, 1, T0), (2, 1, T0 + m(minutes=10))],
           "lid bigint, k bigint, lts timestamp")
    _write(spark, rsrc, [(100, 1, T0 + m(minutes=1))],
           "rid bigint, k bigint, rts timestamp")

    out = str(tmp_path / "out")

    def run():
        lstream = spark.readStream.schema(spark.read.parquet(lsrc).schema).parquet(lsrc)
        rstream = spark.readStream.schema(spark.read.parquet(rsrc).schema).parquet(rsrc)
        joined = stream_interval_join(
            lstream, rstream, "lts", "rts",
            -5 * 60 * 1_000_000, 5 * 60 * 1_000_000,
            keys=["k"], watermark_delay="10 minutes", how="leftOuter",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.lid, r.rid) for r in spark.read.parquet(out).collect()}

    got1 = run()
    assert (1, 100) in got1          # inner match emits immediately
    assert (2, None) not in got1     # outer verdict still open

    # far-future rows on BOTH sides push the global watermark past L2's window
    _write(spark, lsrc, [(3, 1, T0 + m(minutes=200))],
           "lid bigint, k bigint, lts timestamp")
    _write(spark, rsrc, [(101, 1, T0 + m(minutes=120))],
           "rid bigint, k bigint, rts timestamp")
    got2 = run()
    assert (2, None) in got2         # unmatched left row flushed as NULL pair
    assert (3, None) not in got2     # its window hasn't closed yet
