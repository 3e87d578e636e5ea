"""Streaming rate-anomaly operator (streaming/anomaly.py).

The batch twin (`event_rate_anomalies`) is oracle-checked; these pin the
streaming semantics: prequential scoring on day completion, final-day z
identical to the batch formula, late-event drop accounting, and
split-invariance of the fold across micro-batch cuts.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from event_store_spark.streaming.anomaly import _score, _update_rates


class _FakeState:
    def __init__(self):
        self._value = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def _pdf(ts_list):
    return pd.DataFrame({"ts": pd.to_datetime(ts_list)})


def _fold(batches):
    state = _FakeState()
    rows = []
    for b in batches:
        for out in _update_rates(("click",), iter([b]), state):
            rows.extend(out.to_dict("records"))
    return state._value, rows


def _spike_corpus():
    """Nine 10-count days, one 100-count day, one sentinel day-11 event
    (the spike day only completes when a later day arrives)."""
    ts = []
    for d in range(1, 11):
        n = 100 if d == 10 else 10
        ts += [dt.datetime(2024, 1, d, 12)] * n
    ts.append(dt.datetime(2024, 1, 11, 0))
    return ts


def test_final_day_z_matches_batch_formula():
    _, rows = _fold([_pdf(_spike_corpus())])
    spike = [r for r in rows if r["cnt"] == 100]
    assert len(spike) == 1 and spike[0]["anomalous"]
    batch_z = (100 - 19) / math.sqrt((10900 - 190 * 190 / 10) / 9)
    assert abs(spike[0]["z"] - batch_z) < 1e-12
    # the nine quiet days were scored against growing history, none flagged
    assert sum(1 for r in rows if r["anomalous"]) == 1


def test_fold_is_split_invariant():
    ts = _spike_corpus()
    one = _fold([_pdf(ts)])
    many = _fold([_pdf(ts[i : i + 37]) for i in range(0, len(ts), 37)])
    assert one[0] == many[0]          # identical final state
    assert one[1] == many[1]          # identical emitted rows


def test_late_events_dropped_and_counted():
    early = [dt.datetime(2024, 1, 1, 12)] * 3 + [dt.datetime(2024, 1, 2, 12)] * 3
    late = [dt.datetime(2024, 1, 1, 23)] * 2  # day 1 already completed
    closer = [dt.datetime(2024, 1, 3, 1)]
    state, rows = _fold([_pdf(early), _pdf(late), _pdf(closer)])
    # day 1 completed with cnt=3; the 2 late events never mutate it
    assert [r["cnt"] for r in rows] == [3, 3]
    assert state[5] == 2  # late counter
    assert rows[-1]["late_dropped"] == 2


def test_score_guards():
    assert _score(1, 10, 100, 10) is None          # undefined stddev
    assert _score(3, 30, 300, 10) is None          # zero variance
    assert _score(2, 30, 500, 20) is not None


def test_streaming_run_end_to_end(spark, sf_smoke, tmp_path):
    """Real applyInPandasWithState run over the events fixture: completed
    days stream out per type; per-type (day, cnt) rows match the batch
    daily aggregation for every emitted day."""
    from pyspark.sql import functions as F

    from event_store_spark.streaming.anomaly import streaming_rate_anomalies
    from event_store_spark.tables import load_table

    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "src")
    events.orderBy("ts").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_rate_anomalies(stream)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.event_type, r.day_idx): r.cnt
        for r in spark.sql("select * from anom_out").collect()
    }
    assert got, "no completed days emitted"
    batch = {
        (r.event_type, r.day_idx): r.cnt
        for r in events.groupBy(
            "event_type", F.unix_date(F.col("ts").cast("date")).cast("bigint").alias("day_idx")
        ).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for k, cnt in got.items():
        assert batch[k] == cnt, k
