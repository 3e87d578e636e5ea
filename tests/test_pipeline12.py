"""dedup_substring_spans (plans/pipeline12.py).

Oracle parity at sf0.01 is covered by test_oracle_parity; these tests pin
the SEMANTICS on constructed inputs where the right answer is computable
by hand — maximal-run recovery, the MIN_SUB_LEN floor, the stop-phrase
cap — and the plan shape the 100 TB story depends on (no pair join, no
cartesian; the only exchanges are the gram agg and the diagonal window).
"""

from __future__ import annotations


def _spans_on(spark, rows):
    """Run dedup_substring_spans on an in-memory documents table."""
    from unittest import mock

    import event_store_spark.plans.pipeline12 as p12

    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(p12, "load_table", lambda s, d, n: docs):
        return [r.asDict() for r in p12.dedup_substring_spans(spark, "ignored").collect()]


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_maximal_span_recovered_once(spark):
    """A 20-token run shared verbatim by two docs yields exactly ONE
    maximal span per direction-normalized pair — len 20, at the right
    offsets on both sides — never the 13 overlapping 8-gram sub-spans."""
    shared = _words("s", 20)
    rows = [
        (1, shared + " " + _words("a", 10)),           # span at pos 0
        (2, _words("b", 10) + " " + shared),           # span at pos 10
        (3, _words("c", 30)),                          # no duplication
    ]
    got = _spans_on(spark, rows)
    assert got == [
        {
            "doc_id": 1,
            "start_pos": 0,
            "len_tokens": 20,
            "partner_doc_id": 2,
            "partner_pos": 10,
        }
    ]


def test_min_len_floor(spark):
    """A shared run of MIN_SUB_LEN-1 tokens is below the reporting floor;
    MIN_SUB_LEN exactly is reported."""
    import event_store_spark.plans.pipeline12 as p12

    n = p12.MIN_SUB_LEN
    below, at = _words("u", n - 1), _words("v", n)
    rows = [
        (1, below + " " + _words("a", 8)),
        (2, below + " " + _words("b", 8)),
        (3, at + " " + _words("c", 8)),
        (4, at + " " + _words("d", 8)),
    ]
    got = _spans_on(spark, rows)
    assert [(r["doc_id"], r["len_tokens"], r["partner_doc_id"]) for r in got] == [
        (3, n, 4)
    ]


def test_disjoint_runs_reported_separately(spark):
    """Two disjoint 16-token shared runs in the same doc pair come back as
    two spans with their own offsets, not merged across the gap."""
    r1, r2 = _words("x", 16), _words("y", 16)
    rows = [
        (1, r1 + " " + _words("g", 9) + " " + r2),
        (2, r1 + " " + _words("h", 9) + " " + r2),
    ]
    got = _spans_on(spark, rows)
    assert [(r["start_pos"], r["len_tokens"], r["partner_pos"]) for r in got] == [
        (0, 16, 0),
        (25, 16, 25),
    ]


def test_stop_phrase_cap_drops_boilerplate(spark):
    """A run shared by MORE than MAX_GRAM_OCCS docs is boilerplate: every
    one of its grams exceeds the occurrence cap, so no span is emitted —
    the in-plan bound that keeps pair fan-out ≤ CAP² at 100 TB."""
    import event_store_spark.plans.pipeline12 as p12

    chrome = _words("n", 16)
    rows = [
        (i, chrome + " " + _words(f"d{i}_", 4)) for i in range(p12.MAX_GRAM_OCCS + 1)
    ]
    assert _spans_on(spark, rows) == []


def test_plan_no_pair_join_single_window(spark, sf_correct):
    """Scale pin: anchor pairs expand in-row from the capped occurrence
    list — the plan has NO join of any kind and no cartesian; the only
    window is the diagonal-run numbering, partitioned by (da, db, delta)
    so no single-reducer sort exists."""
    from event_store_spark.plans import QUERIES

    df = QUERIES["dedup_substring_spans"](spark, sf_correct)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, "pair expansion regressed to a hits self-join"
    assert plan.count("Window") == 1
    import re

    win = next(l for l in plan.splitlines() if "Window" in l)
    assert re.search(r"windowspecdefinition\(da#\d+L?, db#\d+L?, delta#\d+L?", win), win


def _removal_on(spark, rows):
    from unittest import mock

    import event_store_spark.plans.pipeline12 as p12

    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(p12, "load_table", lambda s, d, n: docs):
        return {
            r["doc_id"]: r.asDict()
            for r in p12.dedup_substring_removal(spark, "ignored").collect()
        }


def test_removal_cuts_later_doc_keep_first(spark):
    """Keep-first semantics: the shared 20-token run survives in doc 1
    and is cut from doc 2; untouched docs don't appear."""
    shared = _words("s", 20)
    rows = [
        (1, shared + " " + _words("a", 10)),
        (2, _words("b", 10) + " " + shared),
        (3, _words("c", 30)),
    ]
    got = _removal_on(spark, rows)
    assert got == {
        2: {"doc_id": 2, "n_tokens": 30, "removed_tokens": 20,
            "kept_tokens": 10}
    }


def test_removal_overlapping_cuts_union_not_sum(spark):
    """Doc 3 shares X[0:20) with doc 1 and X[4:24) with doc 2: its cut
    budget is the interval UNION (24 tokens), never 20+20. Doc 2 also
    loses its 16-token overlap with the earlier doc 1."""
    X = [f"x{i}" for i in range(30)]
    rows = [
        (1, " ".join(X[0:20])),
        (2, " ".join(X[4:24])),
        (3, " ".join(X)),
    ]
    got = _removal_on(spark, rows)
    assert got[3]["removed_tokens"] == 24 and got[3]["n_tokens"] == 30
    assert got[2]["removed_tokens"] == 16 and got[2]["kept_tokens"] == 4
    assert 1 not in got  # earliest copy keeps everything


def test_incremental_plan_equi_join_keyed_windows(spark, sf_correct):
    """Scale pin for the batch-vs-corpus probe: the gram join is a hash
    equi-join on the gram hash (no cartesian, no residual-only join),
    and both windows are keyed — (new, idx, delta) for run recovery,
    (new) for best-match — so no single-reducer sort exists."""
    import re

    from event_store_spark.plans import QUERIES

    df = QUERIES["dedup_substring_incremental"](spark, sf_correct)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    for w in wins:
        assert re.search(
            r"windowspecdefinition\((new_id|da)#\d+L?,", w
        ), w
