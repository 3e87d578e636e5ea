"""Journal→artifact reduction (scale_bench.reduce_journal): the summary
lists are derived from per_query, so the r10 contradiction class (a row
in errored_* AND carrying successful numbers) cannot recur."""

import sys

sys.path.insert(0, "/root/repo")
from scale_bench import reduce_journal


def _done(*recs):
    return {f"{r['side']}:{r['name']}": r for r in recs}


def test_statuses_partition_and_lists_derive_from_per_query():
    done = _done(
        {"side": "engine", "name": "a", "s": 1.0, "err": None},
        {"side": "oracle", "name": "a", "s": 2.0, "capped": False, "err": None},
        {"side": "engine", "name": "b", "s": 3.0, "err": None},
        {"side": "oracle", "name": "b", "s": 60.0, "capped": True, "err": None},
        {"side": "engine", "name": "c", "s": 0.5, "err": "GuardError: by design"},
        {"side": "oracle", "name": "c", "s": 4.0, "capped": False, "err": None},
        {"side": "engine", "name": "d", "s": 1.5, "err": None},
        {"side": "oracle", "name": "d", "s": 90.0, "capped": True,
         "err": "backstop kill: host wall time"},
    )
    out = reduce_journal(done)
    pq = out["per_query"]
    # exactly one status per side per row
    assert pq["a"]["engine_status"] == "ok" and pq["a"]["oracle_status"] == "ok"
    assert pq["b"]["oracle_status"] == "capped"
    assert pq["c"]["engine_status"] == "error"
    # backstop kill = capped with a note, NOT an errored oracle
    assert pq["d"]["oracle_status"] == "capped"
    assert "oracle_note" in pq["d"]["note"]
    assert out["errored_oracles"] == {}
    assert out["errored_engine"] == {"c": "GuardError: by design"}
    assert out["capped_oracles"] == ["b", "d"]
    # the invariant the r10 artifact broke: nothing listed as errored may
    # carry an ok status, and comparable excludes every non-ok row
    for n in out["errored_engine"]:
        assert pq[n]["engine_status"] == "error"
    assert out["comparable_engine_total"] == 1.0
    assert out["comparable_oracle_total"] == 2.0
    assert out["engine_vs_oracle_comparable"] == 0.5


def test_retry_survivor_last_line_wins_no_contradiction():
    """A row that first erred and then succeeded on resume (last journal
    line wins) must appear ONLY as ok — the exact r10 contradiction."""
    done = _done(
        {"side": "engine", "name": "x", "s": 9.0, "err": "boom"},
    )
    # resume overwrites the key, as scale_bench's journal() does
    done["engine:x"] = {"side": "engine", "name": "x", "s": 2.0, "err": None}
    done["oracle:x"] = {
        "side": "oracle", "name": "x", "s": 3.0, "capped": False, "err": None
    }
    out = reduce_journal(done)
    assert out["errored_engine"] == {}
    assert out["per_query"]["x"]["engine"] == 2.0
    assert out["engine_vs_oracle_comparable"] == round(2.0 / 3.0, 3)


def test_engine_total_excludes_time_to_failure():
    """ADVICE r11: engine_total must sum only engine_status=='ok' rows —
    an errored row's seconds are time-to-failure, not engine time."""
    done = _done(
        {"side": "engine", "name": "a", "s": 1.0, "err": None},
        {"side": "oracle", "name": "a", "s": 2.0, "capped": False, "err": None},
        {"side": "engine", "name": "bad", "s": 40.0, "err": "OOM: boom"},
        {"side": "oracle", "name": "bad", "s": 3.0, "capped": False, "err": None},
    )
    out = reduce_journal(done)
    assert out["engine_total"] == 1.0
    assert out["errored_engine"] == {"bad": "OOM: boom"}


def test_dead_engine_child_row_is_error_not_number():
    done = _done(
        {"side": "engine", "name": "y", "s": None,
         "err": "engine child exited 137:", "isolated": True},
        {"side": "oracle", "name": "y", "s": 5.0, "capped": False, "err": None},
    )
    out = reduce_journal(done)
    assert out["per_query"]["y"]["engine_status"] == "error"
    assert out["engine_total"] == 5.0 - 5.0 + 0.0  # no engine seconds counted
    assert out["comparable_oracle_total"] == 0.0
