"""Multi-writer append coordination (VERDICT r4 'missing' #4).

The reference holds a single-writer invariant via a Postgres advisory
lock (LockManager.java:45-84); here concurrent appends to one topic
serialize on the per-topic TopicMutex over a shared filesystem, and the
commit point (lsn ticket save) re-verifies ownership so a writer whose
lock was stolen after a heartbeat lapse aborts loudly instead of
double-reserving an lsn.
"""

from __future__ import annotations

import datetime
import os
import threading

import pytest

from event_store_spark.core import EventStore
from event_store_spark.core.state import TopicMutex

TS = datetime.datetime(2025, 1, 4, 12, 0, 0)


def _df(spark, tag, n=3):
    rows = [(f"{tag}-{i}", f"p{i}", TS) for i in range(n)]
    return spark.createDataFrame(
        rows, "key string, payload string, timestamp timestamp"
    )


def test_mutex_owns_reflects_theft(tmp_path):
    m = TopicMutex(str(tmp_path), timeout_seconds=5, stale_seconds=3600)
    m.acquire("t_events")
    assert m.owns("t_events") is True
    with open(m._path("t_events"), "w") as f:  # thief overwrites the token
        f.write("foreign-token")
    assert m.owns("t_events") is False
    assert m.owns("never_acquired") is False


def test_mutex_steal_race_restores_live_lock(tmp_path, monkeypatch):
    """Same TOCTOU guard as streaming.lock (review r5): a release + fresh
    acquire landing between the staleness check and the rename must not
    lose the live lock."""
    import time as _time

    breaker = TopicMutex(str(tmp_path), timeout_seconds=1, stale_seconds=10)
    stale = TopicMutex(str(tmp_path), timeout_seconds=5, stale_seconds=10)
    stale.acquire("t_events")
    # silence the stale holder's heartbeat, then age the lock
    stale._held[stale._held_key("t_events")][1].set()
    path = stale._path("t_events")
    os.utime(path, (0, 0))

    live = TopicMutex(str(tmp_path), timeout_seconds=5, stale_seconds=10)
    orig_getmtime = os.path.getmtime
    swapped = {"done": False}

    def getmtime_then_swap(p):
        out = orig_getmtime(p)
        if p == path and not swapped["done"] and (_time.time() - out) > 10:
            swapped["done"] = True
            os.unlink(path)  # stale holder releases...
            live.acquire("t_events")  # ...and a live writer acquires
        return out

    monkeypatch.setattr(os.path, "getmtime", getmtime_then_swap)
    with pytest.raises(TimeoutError):
        breaker.acquire("t_events")  # live lock correctly blocks the breaker
    monkeypatch.undo()
    assert swapped["done"]
    assert live.owns("t_events") is True  # survived the attempted steal
    leftovers = [p for p in os.listdir(tmp_path) if ".stale." in p]
    assert leftovers == []


def test_append_aborts_when_mutex_stolen_before_commit(spark, tmp_path, monkeypatch):
    """The MERGE-guard: ownership re-verified at the commit point; a stolen
    mutex aborts the append BEFORE the lsn reservation, committing
    nothing."""
    store = EventStore(spark, str(tmp_path / "store"))
    store.append("mw_events", _df(spark, "seed"))

    def stolen(topic):
        return False

    monkeypatch.setattr(store._append_mutex, "owns", stolen)
    with pytest.raises(RuntimeError, match="lost the topic mutex"):
        store.append("mw_events", _df(spark, "late"))
    monkeypatch.undo()
    # nothing committed: ticket lsn unchanged, no data from the aborted batch
    assert store.read_events("mw_events").where("key like 'late%'").count() == 0
    cur = store.append("mw_events", _df(spark, "retry"))
    # the guard fired BEFORE the lsn reservation, so the aborted append
    # left no gap: seed=1, retry=2
    assert cur.lsn == 2


def test_two_instances_interleaved_appends_one_lsn_each(spark, tmp_path):
    """Two EventStore instances over the SAME root (the two-driver
    deployment): interleaved appends serialize on the shared lock files;
    every append gets a distinct lsn, all rows land, replay order is a
    total (lsn, id) order with no collisions."""
    root = str(tmp_path / "store")
    a = EventStore(spark, root)
    b = EventStore(spark, root)
    for i in range(3):
        a.append("mw2_events", _df(spark, f"a{i}", n=2))
        b.append("mw2_events", _df(spark, f"b{i}", n=2))
    rows = a.read_events("mw2_events").select("lsn", "id", "key").collect()
    assert len(rows) == 12
    lsns = sorted({r.lsn for r in rows})
    assert lsns == list(range(1, 7))  # six appends, six distinct lsns
    # (lsn, id) is unique — the cursor invariant multi-writer must keep
    assert len({(r.lsn, r.id) for r in rows}) == 12


def test_two_threads_racing_appends_distinct_lsns(spark, tmp_path):
    """Genuinely concurrent appends from two threads sharing nothing but
    the filesystem: the mutex serializes them; lsns stay distinct and
    every row survives."""
    root = str(tmp_path / "store")
    errors: list[Exception] = []

    def writer(tag):
        try:
            st = EventStore(spark, root)
            for i in range(3):
                st.append("mw3_events", _df(spark, f"{tag}{i}", n=2))
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    t1 = threading.Thread(target=writer, args=("x",))
    t2 = threading.Thread(target=writer, args=("y",))
    t1.start(), t2.start()
    t1.join(120), t2.join(120)
    assert errors == []
    st = EventStore(spark, root)
    rows = st.read_events("mw3_events").select("lsn", "id", "key").collect()
    assert len(rows) == 12
    assert len({r.lsn for r in rows}) == 6  # every append a distinct lsn
    assert len({(r.lsn, r.id) for r in rows}) == 12


def test_owns_is_thread_scoped_after_theft(tmp_path):
    """Review r5: with per-topic bookkeeping, a sibling thread's fresh
    acquire after this thread's lock was stolen made the victim's owns()
    compare the sibling's token against itself (guard bypassed) and its
    release() unlink the sibling's LIVE lock. The bookkeeping is now
    keyed per (topic, thread): the victim sees owns()==False and its
    release leaves the sibling's lock intact."""
    m = TopicMutex(str(tmp_path), timeout_seconds=5, stale_seconds=3600)
    acquired = threading.Event()
    proceed = threading.Event()
    result: dict[str, object] = {}

    def victim():
        m.acquire("tv_events")
        acquired.set()
        proceed.wait(30)
        result["owns"] = m.owns("tv_events")
        m.release("tv_events")  # must NOT unlink the sibling's live lock

    t = threading.Thread(target=victim)
    t.start()
    assert acquired.wait(10)
    # external theft: the victim's lock vanishes and the MAIN thread (a
    # sibling of the victim on the same instance) acquires fresh
    os.unlink(m._path("tv_events"))
    m.acquire("tv_events")
    proceed.set()
    t.join(30)
    assert result["owns"] is False  # victim's guard fires
    assert m.owns("tv_events") is True  # sibling's lock survived the release
    m.release("tv_events")
