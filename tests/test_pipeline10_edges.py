"""Edge shapes for the round-11 pipeline10 rewrites."""

from unittest import mock

import event_store_spark.plans.pipeline10 as p10


def test_mad_outliers_empty_log_returns_zero_rows_with_schema(spark):
    """An empty events log must yield zero rows (the oracle's GROUP BY
    shape), not a zero-arg create_map analysis error."""
    df = spark.createDataFrame([], "event_type string, value double")
    with mock.patch.object(p10, "hot_table", lambda s, d, n, cols=None: df):
        out = p10.mad_outliers(spark, "empty")
    assert out.columns == ["event_type", "med", "mad", "n_outliers"]
    assert out.collect() == []


def test_mad_outliers_matches_reference_computation(spark):
    """Driver-folded literal median maps reproduce the two-pass MAD rule
    on a hand-checked frame."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
            ("b", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    with mock.patch.object(p10, "hot_table", lambda s, d, n, cols=None: df):
        got = {r.event_type: r for r in p10.mad_outliers(spark, "ref").collect()}
    # a: median 2.5; adev [1.5, 0.5, 0.5, 97.5] -> MAD 1.0; 97.5 > 3*1.4826
    a = got["a"]
    assert (a.med, a.mad, a.n_outliers) == (2.5, 1.0, 1)
    # b: constant series -> MAD 0, no adev exceeds 0 threshold... adev all 0
    b = got["b"]
    assert (b.med, b.mad, b.n_outliers) == (5.0, 0.0, 0)


def test_mad_outliers_tolerates_null_event_type(spark):
    """ADVICE r11: a NULL event_type group must not become a null map
    key ("Cannot use null as map key"); the NULL group's stats stay
    exact via the sentinel key."""
    rows = [(None, 1.0), (None, 2.0), (None, 3.0), (None, 100.0),
            ("b", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    with mock.patch.object(p10, "hot_table", lambda s, d, n, cols=None: df):
        got = {r.event_type: r for r in p10.mad_outliers(spark, "nul").collect()}
    n = got[None]
    assert (n.med, n.mad, n.n_outliers) == (2.5, 1.0, 1)
    assert got["b"].n_outliers == 0


def test_mad_outliers_high_cardinality_broadcast_fallback(spark):
    """Past MAD_LITERAL_MAP_MAX event types the plan must switch to the
    broadcast-join form (no unbounded plan literals) and still agree."""
    rows = [(f"t{i:04d}", float(v)) for i in range(5) for v in (1, 2, 3, 100)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    with mock.patch.object(p10, "hot_table", lambda s, d, n, cols=None: df), \
            mock.patch.object(p10, "MAD_LITERAL_MAP_MAX", 3):
        got = {r.event_type: r for r in p10.mad_outliers(spark, "hc").collect()}
    assert len(got) == 5
    for r in got.values():
        assert (r.med, r.mad, r.n_outliers) == (2.5, 1.0, 1)


def test_dq_checks_reports_fused_lineitem_rows(spark):
    """The fused lineitem pass still yields both check rows with correct
    counts: one orphaned orderkey and one non-positive quantity."""
    cust = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    orders = spark.createDataFrame(
        [(1, 10), (2, 20)], "o_custkey bigint, o_orderkey bigint"
    )
    li = spark.createDataFrame(
        [(10, 5.0), (20, -1.0), (99, 2.0)], "l_orderkey bigint, l_quantity double"
    )
    docs = spark.createDataFrame([("x",), (None,)], "text string")
    ev = spark.createDataFrame(
        [("2024-06-01 00:00:00",)], "ts string"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts")

    tables = {"customer": cust, "orders": orders, "lineitem": li}
    with mock.patch.object(
        p10, "hot_table",
        lambda s, d, n, cols=None: {**tables, "events": ev}[n],
    ), mock.patch.object(p10, "load_table", lambda s, d, n: docs):
        out = {r.check_name: r for r in p10.dq_checks(spark, "x").collect()}
    assert out["lineitem_orderkey_ri"].measured == 1  # orderkey 99
    assert out["lineitem_orderkey_ri"].passed == 0
    assert out["lineitem_quantity_positive"].measured == 1  # the -1.0
    assert out["customer_key_unique"].measured == 0
    assert out["documents_text_null_bp"].measured == 5000  # 1 of 2 null
    assert len(out) == 6
