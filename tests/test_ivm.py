"""JoinAggregateView (`streaming/ivm.py`): the delta rule must make the
incrementally-maintained join aggregate equal a full recompute after
every batch, under interleaved two-side deltas and replays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_store_spark.streaming.ivm import JoinAggregateView

CUST = [  # c_key, nation
    (1, "DE"), (2, "DE"), (3, "FR"), (4, "JP"),
]
ORDERS = [  # o_key, c_key, amount
    (10, 1, 100.0), (11, 2, 50.0), (12, 3, 75.0),
    (13, 1, 25.0), (14, 4, 10.0), (15, 3, 5.0),
]


def _tagged(spark, custs, orders):
    rows = [("l", c, n, None, None) for c, n in custs] + [
        ("r", c, None, o, a) for o, c, a in orders
    ]
    return spark.createDataFrame(
        rows,
        "_side string, c_key bigint, nation string, o_key bigint, amount double",
    )


def _view(spark, tmp_path, **kw):
    return JoinAggregateView(
        spark,
        join_keys=["c_key"],
        left_cols=["c_key", "nation"],
        right_cols=["c_key", "o_key", "amount"],
        group_cols=["nation"],
        measures={
            "revenue": F.sum("amount"),
            "n_orders": F.count(F.lit(1)),
        },
        target_path=str(tmp_path / "mv"),
        checkpoint=str(tmp_path / "ck"),
        left_schema="c_key bigint, nation string",
        right_schema="c_key bigint, o_key bigint, amount double",
        **kw,
    )


def _full_recompute(spark, custs, orders):
    c = spark.createDataFrame(custs, "c_key bigint, nation string")
    o = spark.createDataFrame(orders, "o_key bigint, c_key bigint, amount double")
    return {
        (r.nation): (r.revenue, r.n_orders)
        for r in c.join(o, "c_key")
        .groupBy("nation")
        .agg(F.sum("amount").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }


def _run(spark, view, src):
    stream = (
        spark.readStream.schema(
            "_side string, c_key bigint, nation string, o_key bigint, amount double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = view.start(stream)
    q.awaitTermination(240)


def test_ivm_matches_full_recompute_across_interleaved_batches(
    spark, tmp_path
):
    """Four delta batches (customers first, then orders, then BOTH sides
    in one batch, then late orders for early customers): after the run
    the view equals the from-scratch join aggregate."""
    src = str(tmp_path / "src")
    batches = [
        _tagged(spark, CUST[:2], []),                 # ΔR only
        _tagged(spark, [], ORDERS[:2]),               # ΔS only (needs R_pre)
        _tagged(spark, CUST[2:], ORDERS[2:4]),        # both sides + ΔR⋈ΔS
        _tagged(spark, [], ORDERS[4:]),               # late orders
    ]
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    view = _view(spark, tmp_path)
    _run(spark, view, src)

    got = {
        r.nation: (r.revenue, r.n_orders) for r in view.table().collect()
    }
    assert got == _full_recompute(spark, CUST, ORDERS)


def test_ivm_replay_is_idempotent(spark, tmp_path):
    """A second query instance over the same checkpoint must leave the
    view AND the side snapshots unchanged; a genuinely new delta then
    merges correctly on top."""
    src = str(tmp_path / "src")
    _tagged(spark, CUST, ORDERS[:3]).coalesce(1).write.parquet(src)
    view = _view(spark, tmp_path)
    _run(spark, view, src)
    before = {
        r.nation: (r.revenue, r.n_orders) for r in view.table().collect()
    }
    assert before == _full_recompute(spark, CUST, ORDERS[:3])

    _run(spark, view, src)  # replay: no new files
    again = {
        r.nation: (r.revenue, r.n_orders) for r in view.table().collect()
    }
    assert again == before

    _tagged(spark, [], ORDERS[3:]).coalesce(1).write.mode("append").parquet(src)
    _run(spark, view, src)
    final = {
        r.nation: (r.revenue, r.n_orders) for r in view.table().collect()
    }
    assert final == _full_recompute(spark, CUST, ORDERS)


def test_ivm_delta_join_costs_scale_with_delta(spark, tmp_path):
    """The refresh never re-reads both full sides: the delta sides ride
    broadcasts in the delta-rule plan (the structural claim behind
    'cost proportional to the change')."""
    src = str(tmp_path / "src")
    _tagged(spark, CUST, ORDERS[:2]).coalesce(1).write.parquet(src)
    view = _view(spark, tmp_path)
    _run(spark, view, src)
    dl = _tagged(spark, [], ORDERS[2:3]).where(F.col("_side") == "l").select(
        "c_key", "nation"
    )
    dr = _tagged(spark, [], ORDERS[2:3]).where(F.col("_side") == "r").select(
        "c_key", "o_key", "amount"
    )
    plan = (
        view._delta_view(dl, dr, batch_id=99)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_distinct_count_view_overlapping_deltas_and_replay(spark, tmp_path):
    """Re-appearing members across batches must NOT double count (the
    non-additive case JoinAggregateView refuses): three batches with
    heavy user overlap per group; the sketch estimates must equal the
    exact distinct counts at this cardinality, and a replayed run
    leaves the view unchanged."""
    from event_store_spark.streaming.ivm import DistinctCountView

    src = str(tmp_path / "dsrc")
    batches = [
        [("click", u) for u in range(0, 60)],
        [("click", u) for u in range(30, 90)]  # 30 repeats
        + [("view", u) for u in range(0, 40)],
        [("view", u) for u in range(0, 40)]  # all repeats
        + [("click", u) for u in range(85, 100)],
    ]
    for b in batches:
        spark.createDataFrame(b, "event_type string, user_id bigint").coalesce(
            1
        ).write.mode("append").parquet(src)
    view = DistinctCountView(
        spark,
        group_cols=["event_type"],
        value_col="user_id",
        target_path=str(tmp_path / "dv"),
        checkpoint=str(tmp_path / "dck"),
        input_schema="event_type string, user_id bigint",
    )
    # typed empty schema BEFORE the first commit (same contract as
    # JoinAggregateView's left/right schemas)
    assert dict(view.table().dtypes) == {
        "event_type": "string",
        "approx_distinct": "bigint",
    }

    def run():
        stream = (
            spark.readStream.schema("event_type string, user_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = view.start(stream)
        q.awaitTermination(240)

    run()
    got = {r.event_type: r.approx_distinct for r in view.table().collect()}
    # exact: click = 0..99 = 100, view = 0..39 = 40; HLL lgk=12 is exact
    # at these cardinalities
    assert got == {"click": 100, "view": 40}

    run()  # replay
    again = {r.event_type: r.approx_distinct for r in view.table().collect()}
    assert again == got


def test_ivm_empty_table_schema_matches_post_commit(spark, tmp_path):
    """Before the first commit, table() must carry the POST-commit types
    (group keys from the declared side schemas, count measures bigint) —
    the pre-fix fabrication of all-string/all-double broke consumers that
    union across the first commit (ADVICE r5)."""
    src = str(tmp_path / "src")
    view = _view(spark, tmp_path)
    empty_dtypes = dict(view.table().dtypes)
    assert view.table().count() == 0
    _tagged(spark, CUST, ORDERS).coalesce(1).write.parquet(src)
    _run(spark, view, src)
    assert dict(view.table().dtypes) == empty_dtypes
    assert empty_dtypes["n_orders"] == "bigint"
    # unioning across the first commit type-checks
    view.table().unionByName(view.table()).collect()


def test_ivm_side_compaction_bounds_subdirs_and_preserves_state(
    spark, tmp_path
):
    """With compact_every=2, per-batch side subdirs fold into one
    snapshot behind the _SNAP pointer: the dir count stays bounded,
    and the view still equals the full recompute after every fold —
    including a post-compaction delta that must read pre-state through
    the snapshot."""
    src = str(tmp_path / "src")
    view = _view(spark, tmp_path, compact_every=2)
    batches = [
        _tagged(spark, CUST[:2], []),
        _tagged(spark, [], ORDERS[:2]),
        _tagged(spark, CUST[2:], ORDERS[2:4]),
        _tagged(spark, [], ORDERS[4:5]),
    ]
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    _run(spark, view, src)
    for side in ("l", "r"):
        assert view._side_snapshot(side) is not None
        n_sub = len(view._side_subdirs(side))
        assert n_sub < len(batches), f"side {side}: {n_sub} subdirs, no fold"
    got = {r.nation: (r.revenue, r.n_orders) for r in view.table().collect()}
    assert got == _full_recompute(spark, CUST, ORDERS[:5])

    # a delta AFTER compaction joins against snapshot-held pre-state
    _tagged(spark, [], ORDERS[5:]).coalesce(1).write.mode("append").parquet(src)
    _run(spark, view, src)
    got = {r.nation: (r.revenue, r.n_orders) for r in view.table().collect()}
    assert got == _full_recompute(spark, CUST, ORDERS)


def test_ivm_replay_of_folded_batch_leaves_no_orphan_subdir(spark, tmp_path):
    """ADVICE r6: replaying a committed batch whose side delta was already
    folded into a _SNAP snapshot must NOT re-create its b{id} subdir —
    such a dir (id <= snapshot watermark) is excluded from pre-state and
    every future fold, so it would be a permanent orphan. The view's
    state must also stay correct after the replay."""
    src = str(tmp_path / "src")
    view = _view(spark, tmp_path, compact_every=2)
    batches = [
        _tagged(spark, CUST[:2], []),
        _tagged(spark, [], ORDERS[:2]),
        _tagged(spark, CUST[2:], ORDERS[2:4]),
        _tagged(spark, [], ORDERS[4:5]),
    ]
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    _run(spark, view, src)
    snaps = {side: view._side_snapshot(side) for side in ("l", "r")}
    assert all(s is not None for s in snaps.values())

    # replay a batch below each side's snapshot watermark via the public
    # merge path (exactly what a checkpoint-loss restart does)
    for side, snap in snaps.items():
        folded_id = snap[0]  # watermark batch itself is folded
        view._merge(batches[folded_id], folded_id)
        subdirs = dict(view._side_subdirs(side))
        assert folded_id not in subdirs, (
            f"side {side}: replay re-created folded subdir b{folded_id}"
        )
        assert all(i > snap[0] for i in subdirs), subdirs

    got = {r.nation: (r.revenue, r.n_orders) for r in view.table().collect()}
    assert got == _full_recompute(spark, CUST, ORDERS[:5])
