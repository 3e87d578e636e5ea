"""Funnel / cohort / resample / profiling / weighted-sample semantics
(plans/pipeline6.py).

Oracle parity at sf0.01 is covered by test_oracle_parity; these pin the
SEMANTICS on constructed inputs where the right answer is computable by
hand — stage ordering in the funnel, week arithmetic, forward-fill vs
leading gaps, A-ES weight monotonicity.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from unittest import mock

from pyspark.sql import functions as F

import event_store_spark.plans.pipeline6 as p6

EV_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def _run(spark, fn, rows, schema=EV_SCHEMA):
    df = spark.createDataFrame(rows, schema)
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        return fn(spark, "ignored").collect()


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def test_funnel_requires_stage_order(spark):
    """A purchase BEFORE the first click must not convert stage 3, and a
    click at exactly the first-view timestamp must not convert stage 2
    (strict ordering)."""
    rows = [
        # user 1: full ordered funnel
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(2), 1, "click", 0.0),
        (3, _ts(3), 1, "purchase", 0.0),
        # user 2: purchase precedes click -> stops at click
        (4, _ts(1), 2, "view", 0.0),
        (5, _ts(3), 2, "click", 0.0),
        (6, _ts(2), 2, "purchase", 0.0),
        # user 3: click ties the view timestamp -> stops at view
        (7, _ts(1), 3, "view", 0.0),
        (8, _ts(1), 3, "click", 0.0),
        # user 4: clicks without ever viewing -> no stage at all
        (9, _ts(1), 4, "click", 0.0),
        (10, _ts(2), 4, "purchase", 0.0),
    ]
    [r] = _run(spark, p6.funnel_stages, rows)
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 2, 1)


def test_funnel_uses_first_qualifying_event(spark):
    """Stage anchors are the FIRST qualifying events: a second, later view
    must not re-anchor the click requirement."""
    rows = [
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(5), 1, "view", 0.0),
        (3, _ts(2), 1, "click", 0.0),   # after first view -> converts
        (4, _ts(3), 1, "purchase", 0.0),
    ]
    [r] = _run(spark, p6.funnel_stages, rows)
    assert (r.n_view, r.n_click, r.n_purchase) == (1, 1, 1)


def test_cohort_retention_week_offsets(spark):
    """2024-01-01 is a Monday: signup that week + activity 0/1/3 weeks out
    lands in offsets {0, 1, 3}; pre-signup-week activity is excluded."""
    rows = [
        (1, _ts(3), 1, "signup", 0.0),          # week of Jan 1
        (2, _ts(4), 1, "click", 0.0),           # offset 0
        (3, _ts(10), 1, "view", 0.0),           # offset 1
        (4, _ts(24), 1, "purchase", 0.0),       # offset 3
        (5, _ts(2), 2, "click", 0.0),           # pre-signup, same week -> INCLUDED (>= cw)
        (6, _ts(9), 2, "signup", 0.0),          # week of Jan 8
    ]
    got = {
        (r.cohort_week_ms, r.week_offset): r.n_users
        for r in _run(spark, p6.cohort_retention, rows)
    }
    wk1 = int(dt.datetime(2024, 1, 1).timestamp() * 1000)
    wk2 = int(dt.datetime(2024, 1, 8).timestamp() * 1000)
    # user 1: signup + 3 activity rows in weeks 0,0,1,3 of wk1
    assert got[(wk1, 0)] == 1 and got[(wk1, 1)] == 1 and got[(wk1, 3)] == 1
    # user 2: signup week wk2; the Jan-2 click is before cw -> excluded
    assert got[(wk2, 0)] == 1
    assert (wk2, -1) not in got and len(got) == 4


def test_resample_ffill_carries_and_leaves_leading_nulls(spark):
    """One observation on Jan 3 and one on Jan 10: days 1-2 stay NULL,
    days 3-9 carry the Jan-3 value, days 10+ carry the Jan-10 value."""
    rows = [
        (1, _ts(3), 1, "click", 95.0),
        (2, _ts(10), 1, "click", 99.0),
        (3, _ts(5), 1, "view", 10.0),  # below threshold -> view series all NULL
    ]
    out = _run(spark, p6.resample_ffill, rows)
    by_series = {}
    for r in out:
        by_series.setdefault(r.event_type, {})[r.day_idx] = r.v_filled
    click = by_series["click"]
    jan = dt.date(2024, 1, 3).toordinal() - dt.date(1970, 1, 1).toordinal()
    assert click[jan - 1] is None and click[jan - 2] is None
    assert all(click[jan + k] == 95.0 for k in range(0, 7))
    assert all(click[jan + 7 + k] == 99.0 for k in range(0, 5))
    assert set(by_series["view"].values()) == {None}
    assert len(click) == 30  # full grid


def test_profile_columns_counts_nulls_and_ndv(spark):
    rows = [(1.0, None), (2.0, 5.0), (2.0, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "l_discount double, l_tax double")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df), mock.patch.object(
        p6, "PROFILE_COLS", ["l_discount", "l_tax"]
    ):
        out = {r.col_name: r for r in p6.profile_columns(spark, "x").collect()}
    d = out["l_discount"]
    assert (d.n_rows, d.n_nulls, d.ndv, d.min_v, d.max_v) == (4, 1, 2, 1.0, 2.0)
    assert abs(d.avg_v - round(5.0 / 3, 2)) < 1e-9
    t = out["l_tax"]
    assert (t.n_rows, t.n_nulls, t.ndv) == (4, 1, 2)


def test_sample_weighted_prefers_heavy_docs_and_matches_reference_key(spark):
    """With equal hash input, larger weight ⇒ larger (closer to 0) key; and
    the Spark key must equal the Python-recomputed A-ES key exactly."""
    rows = [(i, "s", 100 * (i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        got = [r.doc_id for r in p6.sample_weighted(spark, "x").collect()]
    assert len(got) == p6.WEIGHTED_K == len(set(got))

    def akey(doc_id, w):
        h = hashlib.md5(f"{doc_id}:{p6.WEIGHTED_SEED}".encode()).hexdigest()
        u = (int(h[:8], 16) + 1) / 4294967296.0
        return math.log(u) / w

    expect = sorted(rows, key=lambda r: (-akey(r[0], r[2]), r[0]))[: p6.WEIGHTED_K]
    assert got == [r[0] for r in expect]


def test_interarrival_gap_math(spark):
    """Gaps partition by type and tie-break on event_id; floor vs round
    semantics on the ms conversions are pinned."""
    rows = [
        (1, _ts(1, 0, 0), 1, "click", 0.0),
        (2, _ts(1, 0, 1), 1, "click", 0.0),    # 60_000 ms
        (3, _ts(1, 0, 4), 1, "click", 0.0),    # 180_000 ms
        (4, _ts(1), 1, "view", 0.0),           # lone event: no gap row
    ]
    out = {r.event_type: r for r in _run(spark, p6.interarrival_stats, rows)}
    c = out["click"]
    assert (c.n_gaps, c.avg_gap_ms, c.max_gap_ms) == (2, 120_000, 180_000)
    assert out["view"].n_gaps == 0


def test_price_histogram_bins_cover_and_clamp(spark):
    """min lands in bin 0, max clamps into the last bin, counts total."""
    rows = [(float(v),) for v in [0, 1, 2, 50, 99, 100]]
    df = spark.createDataFrame(rows, "o_totalprice double")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        out = {r.bin: r for r in p6.price_histogram(spark, "x").collect()}
    assert out[0].cnt == 3 and out[0].bin_min == 0.0  # 0,1,2 in [0,5)
    assert out[p6.HIST_BINS - 1].cnt == 2  # 99 and the clamped max 100
    assert sum(r.cnt for r in out.values()) == 6


def test_bigram_logprob_add_one_smoothing(spark):
    """Bands recomputed from first principles: corpus bigram/unigram counts
    with add-one smoothing, per-doc mean NLL, floor(round(.,6)) banding."""
    docs = [
        (1, "a b a b", "en"),
        (2, "x y", "fr"),
        (3, "b a", "en"),
        (4, "solo", "en"),  # single token: no bigrams -> drops out
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        got = {
            (r.lang, r.nll_band): r.n_docs
            for r in p6.text_bigram_logprob(spark, "x").collect()
        }

    toks = {d: t.split() for d, t, _ in docs}
    c1: dict = {}
    c2: dict = {}
    for t in toks.values():
        for w in t:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    V = len(c1)
    expect: dict = {}
    for (d, _, lang) in docs:
        t = toks[d]
        pairs = list(zip(t, t[1:]))
        if not pairs:
            continue
        nll = sum(
            -math.log((c2[(a, b)] + 1.0) / (c1[a] + V)) for a, b in pairs
        ) / len(pairs)
        band = math.floor(round(nll, 6))
        key = (lang, band)
        expect[key] = expect.get(key, 0) + 1
    assert got == expect


def test_streaming_funnel_matches_batch(spark, sf_smoke, tmp_path):
    """Stateful streaming funnel == batch funnel on ordered multi-batch
    delivery: events split into 4 time-ordered parquet files, streamed one
    file per trigger; final per-user stages must aggregate to the batch
    funnel's stage counts."""
    from event_store_spark.streaming.funnel import streaming_funnel
    from event_store_spark.tables import load_table

    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "ordered_src")
    # 4 contiguous time slices, written oldest-first so file mtime order
    # == event-time order (the ordered-replay delivery contract)
    import time

    bounds = [r[0] for r in events.selectExpr(
        "percentile(cast(ts as double), array(0.25, 0.5, 0.75))"
    ).collect()][0]
    import os

    os.makedirs(src)
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        part = events
        if lo is not None:
            part = part.where(F.col("ts").cast("double") > lo)
        if hi is not None:
            part = part.where(F.col("ts").cast("double") <= hi)
        part.coalesce(1).write.parquet(str(tmp_path / f"slice{i}"))
        import glob
        import shutil

        [f] = glob.glob(str(tmp_path / f"slice{i}" / "*.parquet"))
        shutil.copy(f, os.path.join(src, f"{i:02d}.parquet"))
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
        lo = hi

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql(
        "select user_id, max_by(stage, batch) as stage from "
        "(select *, monotonically_increasing_id() as batch from funnel_out) "
        "group by user_id"
    ).collect()
    # update-mode: the LAST emitted row per user is the final state; memory
    # sink appends in batch order, so max_by over arrival order picks it
    stages = [r.stage for r in rows]
    got = (
        sum(1 for s in stages if s >= 1),
        sum(1 for s in stages if s >= 2),
        sum(1 for s in stages if s >= 3),
    )
    import event_store_spark.plans.pipeline6 as mod6

    [b] = mod6.funnel_stages(spark, sf_smoke).collect()
    assert got == (b.n_view, b.n_click, b.n_purchase)


def test_source_token_drift_kl_math(spark):
    """KL bands recomputed from first principles; a source matching the
    corpus mix scores near zero, a skewed one scores positive."""
    docs = [
        (1, "a b a b", "s_mixed"),
        (2, "a b", "s_mixed"),
        (3, "z z z z z z", "s_skewed"),
        (4, "a b a b", "s_mixed2"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        got = {
            r.source: r.kl_centinat_band
            for r in p6.source_token_drift(spark, "x").collect()
        }

    st: dict = {}
    for _, text, src in docs:
        for w in text.split():
            st[(src, w)] = st.get((src, w), 0) + 1
    n_s: dict = {}
    c_t: dict = {}
    for (src, w), c in st.items():
        n_s[src] = n_s.get(src, 0) + c
        c_t[w] = c_t.get(w, 0) + c
    total = sum(c_t.values())
    expect: dict = {}
    for src in n_s:
        kl = sum(
            (c / n_s[src]) * math.log((c / n_s[src]) / (c_t[w] / total))
            for (s2, w), c in st.items()
            if s2 == src
        )
        expect[src] = math.floor(round(kl * 100, 6))
    assert got == expect
    assert got["s_skewed"] > got["s_mixed"] >= 0


def test_event_rate_anomalies_flags_spike_day(spark):
    """Nine 10-count days and one 100-count day: only the spike exceeds
    2 sample stddevs (z = (100-19)/28.46 ≈ 2.85 -> band 284); a stream
    with a single day (undefined stddev) emits nothing."""
    rows = []
    eid = 0
    for d in range(1, 11):
        n = 100 if d == 10 else 10
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(d), 1, "click", 0.0))
    rows.append((eid + 1, _ts(1), 1, "signup", 0.0))  # 1-day stream: skipped
    out = _run(spark, p6.event_rate_anomalies, rows)
    assert len(out) == 1
    r = out[0]
    spike_idx = dt.date(2024, 1, 10).toordinal() - dt.date(1970, 1, 1).toordinal()
    assert (r.event_type, r.day_idx, r.cnt) == ("click", spike_idx, 100)
    expected_z = (100 - 19) / math.sqrt((10900 - 190 * 190 / 10) / 9)
    assert r.z_centi_band == math.floor(round(expected_z * 100, 6))


def test_funnel_windowed_enforces_deadline(spark):
    """A click 8 days after the first view misses the 7-day window; a
    click 6 days after converts, and its purchase clock restarts."""
    rows = [
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(9), 1, "click", 0.0),    # 8 days: too late
        (3, _ts(1), 2, "view", 0.0),
        (4, _ts(7), 2, "click", 0.0),    # 6 days: converts
        (5, _ts(15), 2, "purchase", 0.0),  # 8 days after click: too late
        (6, _ts(1), 3, "view", 0.0),
        (7, _ts(5), 3, "click", 0.0),
        (8, _ts(10), 3, "purchase", 0.0),  # 5 days after click: converts
    ]
    [r] = _run(spark, p6.funnel_windowed, rows)
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 2, 1)


def test_event_transitions_counts_and_bp(spark):
    """user 1: view->click->view; user 2: view->click. Transition rows:
    view->click x2 (from row-total 2 -> 10000bp), click->view x1."""
    rows = [
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(2), 1, "click", 0.0),
        (3, _ts(3), 1, "view", 0.0),
        (4, _ts(1), 2, "view", 0.0),
        (5, _ts(2), 2, "click", 0.0),
    ]
    got = {
        (r.prev_type, r.next_type): (r.cnt, r.p_bp)
        for r in _run(spark, p6.event_transitions, rows)
    }
    assert got == {
        ("view", "click"): (2, 10000),
        ("click", "view"): (1, 10000),
    }


def test_sample_weighted_raises_on_nonpositive_weight(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [(1, "s", 100), (2, "s", 0)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        with pytest.raises(Exception) as ei:
            p6.sample_weighted(spark, "x").collect()
    assert "weight must be > 0" in str(ei.value)


def test_sample_weighted_stratified_topk_per_lang(spark):
    """Every lang contributes exactly min(10, docs-in-lang) rows, and the
    picks per lang are the top A-ES keys recomputed in Python."""
    rows = [(i, ["en", "fr"][i % 2], 100 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df):
        out = _run_df(spark, p6.sample_weighted_stratified)
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert all(len(v) == 10 for v in by_lang.values())

    def akey(doc_id, w):
        h = hashlib.md5(f"{doc_id}:{p6.WEIGHTED_SEED}".encode()).hexdigest()
        return math.log((int(h[:8], 16) + 1) / 4294967296.0) / w

    for lang in ("en", "fr"):
        pool = [(i, n) for i, l, n in rows if l == lang]
        want = sorted(
            sorted(pool, key=lambda r: (-akey(r[0], r[1]), r[0]))[:10]
        )
        assert sorted(by_lang[lang]) == [i for i, _ in want]


def _run_df(spark, fn):
    return fn(spark, "ignored").collect()


def test_profile_columns_empty_table_reports_zero_rows_per_column(spark):
    """Empty lineitem must still emit one row per profiled column with
    zero counts and NULL min/max/avg — the oracle's per-branch scalar
    aggregates never collapse to zero rows (ADVICE r10)."""
    df = spark.createDataFrame([], "l_discount double, l_tax double")
    with mock.patch.object(p6, "load_table", lambda s, d, n: df), mock.patch.object(
        p6, "PROFILE_COLS", ["l_discount", "l_tax"]
    ):
        out = {r.col_name: r for r in p6.profile_columns(spark, "empty").collect()}
    assert set(out) == {"l_discount", "l_tax"}
    for r in out.values():
        assert (r.n_rows, r.n_nulls, r.ndv) == (0, 0, 0)
        assert r.min_v is None and r.max_v is None and r.avg_v is None
