"""Brute-force equivalence tests for the generic temporal operators.

`asof_join` / `interval_join` are compared against straightforward Python
references on seeded random datasets plus hand-built adversarial edges:
time ties (several right rows at one timestamp), exact boundary hits,
NULL payload values, empty sides, keys with rows on only one side, and
negative epoch times (floor-division bucket math).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from event_store_spark.operators.temporal import asof_join, interval_join

LEFT_SCHEMA = "k bigint, lid bigint, t bigint"
RIGHT_SCHEMA = "k bigint, rid bigint, t bigint, val string"


def _brute_asof(lrows, rrows, how):
    out = []
    for k, lid, lt in lrows:
        cands = [r for r in rrows if r[0] == k and r[2] <= lt]
        if cands:
            # latest time, ties -> greatest payload tuple (rid, val) with
            # None sorting lowest (matches NULLS FIRST asc -> last wins)
            best = max(
                cands,
                key=lambda r: (
                    r[2],
                    (r[1] is not None, r[1]),
                    (r[3] is not None, r[3]),
                ),
            )
            out.append((k, lid, lt, best[1], best[3]))
        elif how == "left":
            out.append((k, lid, lt, None, None))
    return sorted(out, key=lambda x: (x[0], x[1]))


def _brute_interval(lrows, rrows, lower, upper, how):
    out = []
    for k, lid, lt in lrows:
        matched = [
            r for r in rrows if lt + lower <= r[2] <= lt + upper
        ]
        if matched:
            out.extend((k, lid, lt, r[0], r[1], r[2], r[3]) for r in matched)
        elif how == "left":
            out.append((k, lid, lt, None, None, None, None))
    return sorted(out, key=lambda x: (x[1], x[4] if x[4] is not None else -1))


def _run_asof(spark, lrows, rrows, how):
    left = spark.createDataFrame(lrows, LEFT_SCHEMA)
    right = spark.createDataFrame(
        rrows, RIGHT_SCHEMA
    ).withColumnRenamed("t", "rt")
    got = asof_join(
        left, right, keys=["k"], left_time="t", right_time="rt",
        payload=["rid", "val"], how=how,
    )
    return sorted(
        ((r.k, r.lid, r.t, r.rid, r.val) for r in got.collect()),
        key=lambda x: (x[0], x[1]),
    )


CASES = [
    # ties: three right rows at one timestamp, NULL payload values among them
    (
        [(1, 10, 100), (1, 11, 99), (1, 12, 50)],
        [(1, 7, 100, "a"), (1, 9, 100, None), (1, None, 100, "z"), (1, 1, 60, "b")],
    ),
    # exact time equality is inclusive; key only on one side
    (
        [(1, 10, 100), (2, 20, 100)],
        [(1, 5, 100, "x"), (3, 6, 90, "y")],
    ),
    # empty right side
    ([(1, 10, 100)], []),
    # empty left side
    ([], [(1, 5, 100, "x")]),
    # negative times
    ([(1, 10, -100), (1, 11, -50)], [(1, 5, -100, "n"), (1, 6, -49, "m")]),
]


@pytest.mark.parametrize("how", ["left", "inner"])
@pytest.mark.parametrize("case", range(len(CASES)))
def test_asof_join_edges(spark, case, how):
    lrows, rrows = CASES[case]
    assert _run_asof(spark, lrows, rrows, how) == _brute_asof(lrows, rrows, how)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_random(spark, seed):
    rng = random.Random(seed)
    # clustered times force plenty of ties and shared keys
    lrows = [
        (rng.randint(0, 4), i, rng.randint(-20, 20) * 10) for i in range(60)
    ]
    rrows = [
        (
            rng.randint(0, 4),
            rng.choice([None, rng.randint(0, 30)]),
            rng.randint(-20, 20) * 10,
            rng.choice([None, "a", "b", "c"]),
        )
        for _ in range(60)
    ]
    for how in ("left", "inner"):
        assert _run_asof(spark, lrows, rrows, how) == _brute_asof(lrows, rrows, how)


def _run_interval(spark, lrows, rrows, lower, upper, how):
    left = spark.createDataFrame(lrows, "k bigint, lid bigint, t bigint")
    right = spark.createDataFrame(
        rrows, "rk bigint, rid bigint, rt bigint, val string"
    )
    got = interval_join(
        left, right, left_time="t", right_time="rt",
        lower_us=lower, upper_us=upper, how=how,
    )
    return sorted(
        (
            (r.k, r.lid, r.t, r.rk, r.rid, r.rt, r.val)
            for r in got.collect()
        ),
        key=lambda x: (x[1], x[4] if x[4] is not None else -1),
    )


@pytest.mark.parametrize("lower,upper", [(-30, 30), (0, 25), (-25, 0), (7, 7)])
@pytest.mark.parametrize("seed", [0, 1])
def test_interval_join_random(spark, seed, lower, upper):
    rng = random.Random(seed)
    lrows = [(rng.randint(0, 3), i, rng.randint(-100, 100)) for i in range(50)]
    rrows = [
        (rng.randint(0, 3), i, rng.randint(-100, 100), rng.choice(["x", "y"]))
        for i in range(50)
    ]
    for how in ("inner", "left"):
        assert _run_interval(spark, lrows, rrows, lower, upper, how) == _brute_interval(
            lrows, rrows, lower, upper, how
        )


def test_interval_join_exact_boundaries(spark):
    """Rows landing exactly on t+lower and t+upper are both included, and
    bucket-edge alignment (right row at a bucket boundary) never drops or
    doubles a match."""
    lrows = [(1, 1, 0)]
    rrows = [
        (9, 1, -30, "low"), (9, 2, 30, "high"),
        (9, 3, -31, "out_low"), (9, 4, 31, "out_high"),
        (9, 5, 0, "mid"), (9, 6, 60, "far"),
    ]
    got = _run_interval(spark, lrows, rrows, -30, 30, "inner")
    assert [g[6] for g in got] == ["low", "high", "mid"]


def test_interval_join_with_keys(spark):
    """Optional equi keys restrict matches to same-key pairs."""
    left = spark.createDataFrame([(1, 1, 0), (2, 2, 0)], "k bigint, lid bigint, t bigint")
    right = spark.createDataFrame(
        [(1, 10, 5, "k1"), (2, 20, 5, "k2"), (3, 30, 5, "k3")],
        "k bigint, rid bigint, rt bigint, val string",
    )
    got = interval_join(
        left, right, left_time="t", right_time="rt",
        lower_us=-10, upper_us=10, keys=["k"], how="left",
    )
    rows = {(r.lid, r.rid) for r in got.collect()}
    assert rows == {(1, 10), (2, 20)}


def test_asof_join_validates_how(spark):
    left = spark.createDataFrame([(1, 1, 0)], LEFT_SCHEMA)
    with pytest.raises(ValueError):
        asof_join(left, left, ["k"], "t", "t", ["lid"], how="outer")
    with pytest.raises(ValueError):
        interval_join(left, left, "t", "t", 5, -5)


def _brute_sessions(rows, gap):
    """rows: (k, rid, t) → {(k, rid): session_seq} with ties by rid."""
    out = {}
    by_key = {}
    for k, rid, t in rows:
        by_key.setdefault(k, []).append((t, rid))
    for k, items in by_key.items():
        items.sort()
        seq, prev = 0, None
        for t, rid in items:
            if prev is None or t - prev > gap:
                seq += 1
            out[(k, rid)] = seq
            prev = t
    return out


@pytest.mark.parametrize("seed,gap", [(0, 15), (1, 15), (2, 0), (3, 1000)])
def test_sessionize_random(spark, seed, gap):
    from event_store_spark.operators.temporal import sessionize

    rng = random.Random(seed)
    rows = [(rng.randint(0, 3), i, rng.randint(0, 200)) for i in range(80)]
    df = spark.createDataFrame(rows, "k bigint, rid bigint, t bigint")
    got = {
        (r.k, r.rid): r.session_seq
        for r in sessionize(df, ["k"], "t", gap, order_cols=["rid"]).collect()
    }
    assert got == _brute_sessions(rows, gap)


def test_sessionize_counts_match_q37_shape(spark, sf_correct):
    """max(session_seq) per user over events == q37's session_count."""
    from event_store_spark.operators.temporal import sessionize
    from event_store_spark.plans import QUERIES
    from event_store_spark.tables import load_table

    ev = load_table(spark, sf_correct, "events")
    got = {
        r.user_id: r.n
        for r in sessionize(ev, ["user_id"], "ts", 1_800_000_000, order_cols=["event_id"])
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("n"))
        .collect()
    }
    expected = {
        r.user_id: r.session_count
        for r in QUERIES["q37"](spark, sf_correct).collect()
    }
    assert {u: got[u] for u in expected} == expected


def test_operators_reject_colliding_internal_names(spark):
    bad = spark.createDataFrame([(1, 0, 5)], "k bigint, _t bigint, t bigint")
    ok = spark.createDataFrame([(1, 5)], "k bigint, t bigint")
    with pytest.raises(ValueError, match="_t"):
        asof_join(bad, ok, ["k"], "t", "t", ["t"])
    bad2 = spark.createDataFrame([(1, 0, 5)], "k bigint, _bucket bigint, t bigint")
    with pytest.raises(ValueError, match="_bucket"):
        interval_join(ok, bad2, "t", "t", -1, 1)


def test_sessionize_stream_shares_batch_definition(spark, tmp_path):
    """One gap definition for both engines (VERDICT r4 item 8): the
    streaming `session_window` path (via sessionize_stream) and the batch
    `sessionize` operator must agree on seeded data INCLUDING events
    landing exactly on the gap boundary — the half-open-window off-by-one
    the +1µs alignment exists for."""
    import datetime

    from event_store_spark.operators.temporal import sessionize, sessionize_stream

    gap_us = 60_000_000  # 1 minute
    t0 = datetime.datetime(2025, 3, 1, 9, 0, 0)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # u1: gaps of exactly 60s (same session for the batch operator),
        # then 61s (split) -> 2 sessions
        ("u1", at(0)), ("u1", at(60)), ("u1", at(120)), ("u1", at(181)),
        # u2: single event -> 1 session
        ("u2", at(0)),
        # u3: 59s / 61s / exactly-60s gaps -> split only at the 61s gap
        ("u3", at(0)), ("u3", at(59)), ("u3", at(120)), ("u3", at(180)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")

    batch = (
        sessionize(df, ["user_id"], "ts", gap_us)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("session_count"))
    )
    expect = {r.user_id: r.session_count for r in batch.collect()}
    assert expect == {"u1": 2, "u2": 1, "u3": 2}

    src = str(tmp_path / "sess_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = sessionize_stream(
        stream.withWatermark("ts", "10 minutes"), ["user_id"], "ts", gap_us
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_unified")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: r.c
        for r in spark.sql(
            "select user_id, count(*) as c from sess_unified group by user_id"
        ).collect()
    }
    assert got == expect


def test_asof_join_rejects_payload_name_collisions(spark):
    """Payload columns colliding with ANY left output column — non-key
    carried columns AND join keys — must raise (review r5: the first guard
    version exempted keys, which still produce duplicate output names)."""
    import datetime

    t = datetime.datetime(2025, 1, 1)
    left = spark.createDataFrame([("k1", t, 1.0)], "k string, ts timestamp, v double")
    right = spark.createDataFrame([("k1", t, 2.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "ts", payload=["v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "ts", payload=["k"])
