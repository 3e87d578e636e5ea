"""Event-log layer semantics, mirroring the reference's test strategy
(SURVEY §5): golden round-trips, key-type matrix, reserved-metadata
rejection, ms truncation, (lsn, id) ordering and keyset resume.

Reference tests mirrored (by behavior, not code):
- PostgresEventStoreIT.java:183-235 — save→read round-trip field parity
- *KeyPostgresEventStoreIT.java — uuid/string/int/bytes key matrix
- PostgresEventStoreIT.java:254-307 — reserved/invalid metadata rejection
- EventReplicatorWorkerIT.java:221-326 — cursor resume + same-lsn siblings
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from event_store_spark.core import Cursor, EventStore
from event_store_spark.core.cursor import keyset_after
from event_store_spark.core.envelope import (
    canonical_metadata_entries,
    truncate_millis,
    validate_metadata,
)
from event_store_spark.core.state import OffsetsTable, ProgressStore

TS = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000)  # fixed ms timestamp


@pytest.fixture
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "store"))


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, "key string, payload string, timestamp timestamp")


def test_roundtrip_golden(store, spark):
    df = _payload_df(spark, [("k1", "hello", TS)])
    cur = store.append("test_events", df)
    got = store.read_events("test_events", typed_key=True).collect()
    assert len(got) == 1
    row = got[0]
    assert bytes(row.key) == b"k1"
    assert row.key_view == "k1"
    assert row.payload == "hello"
    assert row.timestamp == TS
    assert row.lsn == 1 and cur.lsn == 1


@pytest.mark.parametrize(
    "key_type,value,expected_bytes",
    [
        ("uuid", "0195d329-8b62-7bf5-b229-93ae4f63a0c3", b"0195d329-8b62-7bf5-b229-93ae4f63a0c3"),
        ("string", "some-key", b"some-key"),
        ("int", 12345, b"12345"),
        ("bytes", bytearray(b"\x01\x02\xff"), b"\x01\x02\xff"),
    ],
)
def test_key_type_matrix(store, spark, key_type, value, expected_bytes):
    """4-way key-type matrix; non-byte keys serialize as UTF-8 of toString
    (EventEncryptor.java:146)."""
    schema_type = {"uuid": "string", "string": "string", "int": "int", "bytes": "binary"}
    df = spark.createDataFrame(
        [(value, "p")], f"key {schema_type[key_type]}, payload string"
    )
    store.append(f"kt_{key_type}_events", df, key_type=key_type)
    row = store.read_events(f"kt_{key_type}_events", typed_key=True).first()
    assert bytes(row.key) == expected_bytes
    if key_type == "int":
        assert row.key_view == value
    elif key_type != "bytes":
        assert row.key_view == value


def test_timestamp_truncated_to_millis(store, spark):
    micro_ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442123)
    df = _payload_df(spark, [("k", "p", micro_ts)])
    store.append("trunc_events", df)
    row = store.read_events("trunc_events").first()
    assert row.timestamp == TS  # micros dropped (Event.java:69)


def test_metadata_reserved_keys_rejected(store, spark):
    for bad in ("id", "kid"):
        df = spark.createDataFrame(
            [("k", "p", {bad: bytearray(b"v")})],
            "key string, payload string, metadata map<string,binary>",
        )
        with pytest.raises(ValueError, match="reserved"):
            store.append("meta_events", df)


def test_metadata_type_enforced(spark):
    df = spark.createDataFrame(
        [("k", "p", {"a": "not-bytes"})],
        "key string, payload string, metadata map<string,string>",
    )
    with pytest.raises(TypeError, match="binary"):
        validate_metadata(df)


def test_metadata_canonical_order(store, spark):
    """Metadata round-trips and canonical entries are key-sorted
    (MetadataSerializer.java:75-91 / PostgresEventStoreIT golden fixture
    bTest < dTest < zTest)."""
    md = {"zTest": bytearray(b"z"), "bTest": bytearray(b"123"), "dTest": bytearray(b"meta_value")}
    df = spark.createDataFrame(
        [("k", "p", md)], "key string, payload string, metadata map<string,binary>"
    )
    store.append("canon_events", df)
    got = (
        store.read_events("canon_events")
        .select(canonical_metadata_entries(F.col("metadata")).alias("e"))
        .first()
    )
    assert [e["key"] for e in got.e] == ["bTest", "dTest", "zTest"]
    assert bytes(got.e[0]["value"]) == b"123"


def test_lsn_monotone_and_shared_within_append(store, spark):
    df1 = _payload_df(spark, [("a", "1", TS), ("b", "2", TS)])
    df2 = _payload_df(spark, [("c", "3", TS)])
    c1 = store.append("mono_events", df1)
    c2 = store.append("mono_events", df2)
    assert c2.lsn == c1.lsn + 1
    rows = store.read_events("mono_events").select("lsn").distinct().collect()
    assert sorted(r.lsn for r in rows) == [1, 2]


def test_replay_order_and_cursor_resume(store, spark):
    """Ordered replay + keyset resume skips same-lsn siblings
    (EventReplicatorWorkerIT.java:221-326)."""
    store.append("replay_events", _payload_df(spark, [(f"k{i}", str(i), TS) for i in range(5)]))
    store.append("replay_events", _payload_df(spark, [(f"k{i}", str(i), TS) for i in range(5, 8)]))
    full = store.replay("replay_events").select("lsn", "id", "payload").collect()
    assert [r.payload for r in full] == [str(i) for i in range(8)] or len(full) == 8
    keys = [(r.lsn, r.id) for r in full]
    assert keys == sorted(keys)
    # resume after the 3rd event of batch 1 (same-lsn siblings must appear)
    mid = Cursor(full[2].lsn, full[2].id)
    resumed = store.replay("replay_events", after=mid).select("lsn", "id").collect()
    assert [(r.lsn, r.id) for r in resumed] == keys[3:]
    # null-lsn rows are never replicated (F1)
    assert store.read_events("replay_events").where(F.col("lsn").isNull()).count() == 0


def test_topic_suffix_enforced(store, spark):
    with pytest.raises(ValueError, match="_events"):
        store.append("bad_topic", _payload_df(spark, [("k", "p", TS)]))
    assert store.topics() == []


def test_lag_gauge(store, spark):
    store.append("lag_events", _payload_df(spark, [("k", "p", TS)]))
    store.append("lag_events", _payload_df(spark, [("k", "p", TS)]))
    assert store.lag("lag_events", Cursor.zero()) == 2
    assert store.lag("lag_events", Cursor(2, 0)) == 0


def test_offsets_table_semantics(tmp_path):
    t = OffsetsTable(str(tmp_path / "offsets.json"))
    assert t.get("topic_a") == -1  # initialized to -1 (topic_offsets.sql)
    t.upsert("topic_a", 41, batch_id=7)
    assert t.get("topic_a") == 41
    assert t.last_batch_id("topic_a") == 7


def test_progress_store_semantics(tmp_path):
    p = ProgressStore(str(tmp_path / "progress.json"))
    assert p.last_cursor("t_events") is None
    assert p.last_cursor("noop") == Cursor.zero()  # priming record (X8)
    p.save("t_events", Cursor(17, 23), batch_id=3)
    assert p.last_cursor("t_events") == Cursor(17, 23)
    assert p.last_cursor("t_events").serialize() == "17:23"
    assert p.topics() == ["t_events"]


def test_cursor_serde():
    c = Cursor.parse("17:23")
    assert c == Cursor(17, 23)
    assert Cursor(0, -1) < Cursor(0, 0) < Cursor(1, -5)


def test_keyset_predicate_pushdown(store, spark):
    """The expanded row-value predicate must reach the parquet scan."""
    store.append("push_events", _payload_df(spark, [("k", "p", TS)]))
    df = store.read_events("push_events", after=Cursor(0, -1))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lsn" in plan


def test_millis_truncation_expression(spark):
    df = spark.createDataFrame([(TS.replace(microsecond=442999),)], "ts timestamp")
    got = df.select(truncate_millis(F.col("ts")).alias("t")).first().t
    assert got == TS


def test_keyset_after_matches_rowvalue_semantics(spark):
    rows = [(lsn, i) for lsn in range(3) for i in range(3)]
    df = spark.createDataFrame(rows, "lsn long, id long")
    got = sorted(
        (r.lsn, r.id) for r in df.where(keyset_after(Cursor(1, 1))).collect()
    )
    assert got == [(1, 2), (2, 0), (2, 1), (2, 2)]


def test_compaction_preserves_replay(store, spark):
    """Compaction rewrites small files into (lsn,id)-ranged sorted files
    without changing contents or replay order."""
    import os

    for b in range(5):
        store.append(
            "cmp_events",
            _payload_df(spark, [(f"k{b}-{i}", f"{b}-{i}", TS) for i in range(4)]),
        )
    path = store.topic_path("cmp_events")
    before_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    before = [(r.lsn, r.id, r.payload) for r in store.replay("cmp_events").collect()]
    n_files = store.compact("cmp_events", target_files=2)
    after = [(r.lsn, r.id, r.payload) for r in store.replay("cmp_events").collect()]
    assert after == before and len(after) == 20
    assert n_files <= 2 < before_files
    # appends keep working post-compaction, lsn still monotone
    cur = store.append("cmp_events", _payload_df(spark, [("kx", "x", TS)]))
    assert cur.lsn == 6


def test_key_type_consistency_enforced(store, spark):
    """One key type per topic (reference DDL fixes the key column type)."""
    store.append("ktc_events", _payload_df(spark, [("k", "p", TS)]), key_type="string")
    int_df = spark.createDataFrame([(7, "p")], "key int, payload string")
    with pytest.raises(ValueError, match="stores 'string' keys"):
        store.append("ktc_events", int_df, key_type="int")


def test_day_partitioned_topic_prunes_and_orders(store, spark):
    """Day-partitioned layout: dt= partitions prune statically; (lsn, id)
    replay semantics unchanged; layout mixing rejected."""
    rows = [
        ("k1", "a", datetime.datetime(2025, 1, 1, 10)),
        ("k2", "b", datetime.datetime(2025, 1, 2, 10)),
    ]
    store.append("dp_events", _payload_df(spark, rows), partition_by_day=True)
    store.append(
        "dp_events",
        _payload_df(spark, [("k3", "c", datetime.datetime(2025, 1, 2, 12))]),
        partition_by_day=True,
    )
    # lsn continues across partitioned appends
    assert sorted(
        r.lsn for r in store.read_events("dp_events").select("lsn").distinct().collect()
    ) == [1, 2]
    # date-range read prunes partitions (PartitionFilters in the scan)
    day2 = store.read_events("dp_events", start_day="2025-01-02")
    assert sorted(r.payload for r in day2.collect()) == ["b", "c"]
    plan = day2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
    # replay order intact
    replayed = [r.payload for r in store.replay("dp_events").collect()]
    assert replayed[0] == "a" and set(replayed) == {"a", "b", "c"}
    # layout consistency enforced
    with pytest.raises(ValueError, match="layout"):
        store.append("dp_events", _payload_df(spark, [("k", "x", TS)]))


def test_append_never_reads_preexisting_files(store, spark):
    """An append is O(batch): lsn/layout/key-type come from the ticket store
    and the high water from the batch itself. Proven the hard way — corrupt
    every pre-existing parquet file; a second append must still succeed
    because it never opens them (round 1 paid two O(table) scans here)."""
    import os

    store.append("nt_events", _payload_df(spark, [("a", "1", TS), ("b", "2", TS)]))
    path = store.topic_path("nt_events")
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            with open(os.path.join(path, f), "wb") as fh:
                fh.write(b"not a parquet file")
    cur = store.append("nt_events", _payload_df(spark, [("c", "3", TS)]))
    assert cur.lsn == 2  # ticket-derived, monotone past the corrupted batch
    assert store.lag("nt_events", Cursor.zero()) == 2  # gauge is O(1) too


def test_ticket_recovery_after_state_loss(store, spark, tmp_path):
    """Losing the ticket store must not reissue lsns: the next append
    recovers the high water by one explicit scan of the parquet source of
    truth, then resumes O(1) bookkeeping."""
    import shutil

    store.append("rec_events", _payload_df(spark, [("a", "1", TS)]))
    store.append("rec_events", _payload_df(spark, [("b", "2", TS)]))
    shutil.rmtree(str(tmp_path / "store" / "_meta"))
    fresh = EventStore(store.spark, store.root)
    cur = fresh.append("rec_events", _payload_df(spark, [("c", "3", TS)]))
    assert cur.lsn == 3
    lsns = sorted(
        r.lsn for r in fresh.read_events("rec_events").select("lsn").distinct().collect()
    )
    assert lsns == [1, 2, 3]


def test_empty_append_does_not_advance_cursor(store, spark):
    c1 = store.append("empty_events", _payload_df(spark, [("a", "1", TS)]))
    c2 = store.append("empty_events", _payload_df(spark, []))
    assert c2 == c1
    c3 = store.append("empty_events", _payload_df(spark, [("b", "2", TS)]))
    assert c3.lsn == c1.lsn + 1


def test_compaction_preserves_day_partitioning(store, spark):
    """Compacting a day-partitioned topic must keep the dt= hive layout:
    day-range reads keep pruning and partition_by_day appends keep working
    (a flat rewrite silently flipped the layout before)."""
    import os

    days = [datetime.datetime(2025, 1, d, 10) for d in (1, 1, 2, 2, 3)]
    for i, d in enumerate(days):
        store.append(
            "cdp_events",
            _payload_df(spark, [(f"k{i}", f"p{i}", d)]),
            partition_by_day=True,
        )
    before = [(r.lsn, r.id, r.payload) for r in store.replay("cdp_events").collect()]
    store.compact("cdp_events", target_files=2)
    path = store.topic_path("cdp_events")
    assert sorted(e for e in os.listdir(path) if e.startswith("dt=")) == [
        "dt=2025-01-01",
        "dt=2025-01-02",
        "dt=2025-01-03",
    ]
    after = [(r.lsn, r.id, r.payload) for r in store.replay("cdp_events").collect()]
    assert after == before
    day2 = store.read_events("cdp_events", start_day="2025-01-02", end_day="2025-01-02")
    assert sorted(r.payload for r in day2.collect()) == ["p2", "p3"]
    cur = store.append(
        "cdp_events",
        _payload_df(spark, [("kx", "x", datetime.datetime(2025, 1, 4))]),
        partition_by_day=True,
    )
    assert cur.lsn == 6


def test_compaction_size_estimate_walks_day_partitions(store, spark):
    """Auto target_files must see data inside dt= subdirectories (a flat
    listing sums 0 bytes and would always compact to one file)."""
    store.append(
        "csz_events",
        _payload_df(spark, [("k", "p", datetime.datetime(2025, 1, 1))]),
        partition_by_day=True,
    )
    total = sum(
        __import__("os").path.getsize(f)
        for f in EventStore._parquet_files(store.topic_path("csz_events"))
    )
    assert total > 0
    assert store.compact("csz_events") >= 1  # auto-estimate path runs


def test_view_bridges_to_sql(store, spark):
    store.append("v_events", _payload_df(spark, [("k", "hello", TS)]))
    name = store.view("v_events")
    got = spark.sql(f"SELECT payload FROM {name} WHERE lsn = 1").first()
    assert got.payload == "hello"


def test_repair_ticket_after_orphaned_reservation(store, spark):
    """Crash window honesty: a ticket reservation whose data write never
    landed overcounts the gauges; repair_ticket rebuilds from parquet."""
    store.append("rep_events", _payload_df(spark, [("k", "p", TS)]))
    store.append("rep_events", _payload_df(spark, [("k", "p", TS)]))
    true_ticket = dict(store.high_water("rep_events"))
    # simulate the crash: reservation saved, parquet write lost
    store._tickets.save(
        "rep_events",
        lsn=true_ticket["lsn"] + 1,
        max_id=true_ticket["max_id"] + 5,
        total=true_ticket["total"] + 5,
        key_type=true_ticket["key_type"],
        day_partitioned=true_ticket["day_partitioned"],
    )
    assert store.lag("rep_events", Cursor.zero()) == true_ticket["lsn"] + 1  # inflated
    repaired = store.repair_ticket("rep_events")
    assert repaired["lsn"] == true_ticket["lsn"]
    assert repaired["max_id"] == true_ticket["max_id"]
    assert repaired["total"] == true_ticket["total"]
    assert store.lag("rep_events", Cursor.zero()) == true_ticket["lsn"]
    # appends continue correctly after repair
    cur = store.append("rep_events", _payload_df(spark, [("k", "p", TS)]))
    assert cur.lsn == true_ticket["lsn"] + 1


def test_concurrent_appends_serialize_unique_lsns(store, spark):
    """Two appends racing on one topic must never reserve the same lsn
    (TicketStore.save alone is a read-modify-write; the per-topic
    TopicMutex serializes the reserve+write critical section)."""
    import threading

    cursors, errors = [], []

    def worker(i: int) -> None:
        try:
            cursors.append(
                store.append("race_events", _payload_df(spark, [(f"k{i}", "p", TS)]))
            )
        except Exception as e:  # pragma: no cover - failure diagnostics
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    lsns = sorted(c.lsn for c in cursors)
    assert lsns == [1, 2, 3, 4, 5, 6]  # all distinct, contiguous
    ticket = store.high_water("race_events")
    assert ticket["lsn"] == 6 and ticket["total"] == 6
    # data agrees with bookkeeping: 6 rows, 6 distinct lsns
    df = store.read_events("race_events")
    assert df.count() == 6
    assert df.select("lsn").distinct().count() == 6


def test_append_mutex_breaks_stale_lock(store, spark, tmp_path):
    """An orphaned lock file from a crashed append (older than
    stale_seconds) is broken instead of deadlocking future appends."""
    import os
    import time

    lock_path = store._append_mutex._path("stale_events")
    store._append_mutex.acquire("stale_events")  # simulate crash: never released
    old = time.time() - 1000
    os.utime(lock_path, (old, old))
    store._append_mutex.stale_seconds = 5.0
    cur = store.append("stale_events", _payload_df(spark, [("k", "p", TS)]))
    assert cur.lsn == 1


def test_publication_clock_consumes_ticks_per_file_not_row(store, spark):
    """The append reserves one clock tick per ROW (file count unknown until
    the write lands) but must reconcile to ticks actually consumed — one per
    FILE — or sustained high-row appends push published mtimes unboundedly
    into the future (ADVICE r3)."""
    import time

    rows = [(f"k{i}", "p", TS) for i in range(500)]
    t0_ms = int(time.time() * 1000)
    store.append("clk_events", _payload_df(spark, rows))
    ticket = store.high_water("clk_events")
    files = list(EventStore._parquet_files(store.topic_path("clk_events")))
    # clock advanced by the file count (≤ partitions), not by 500 rows:
    # it stays within real elapsed time + #files of wall-clock
    assert ticket["clock"] <= int(time.time() * 1000) + len(files)
    assert ticket["clock"] >= t0_ms  # still monotone past append start
    # a second append keeps file-name sequence strictly increasing
    store.append("clk_events", _payload_df(spark, [("kx", "p", TS)]))
    names = sorted(os.path.basename(f) for f in
                   EventStore._parquet_files(store.topic_path("clk_events")))
    assert len(names) == len(set(names)) == len(files) + 1


def test_stale_lock_steal_elects_single_winner(tmp_path):
    """Concurrent breakers of ONE stale lock must not both enter the
    critical section: the steal is a rename (one winner) followed by the
    ordinary O_EXCL race, so mutual exclusion holds through the break
    (ADVICE r3: replace-then-verify let every breaker 'win')."""
    import os
    import threading
    import time

    from event_store_spark.core.state import TopicMutex

    # generous acquire timeout: the assertion is mutual exclusion
    # (max_in_cs == 1), not latency — at 10 s a co-resident Spark JVM's
    # GC stall mid-suite can time a waiter out and flake the test
    # (observed once in a 518-test run; 0/60 repro standalone)
    mutex = TopicMutex(str(tmp_path / "locks"), timeout_seconds=60.0, stale_seconds=2.0)
    # orphan lock from a "crashed" holder: foreign token, ancient mtime
    path = mutex._path("t")
    with open(path, "w") as f:
        f.write("dead-holder-token")
    os.utime(path, (time.time() - 1000, time.time() - 1000))

    in_cs = 0
    max_in_cs = 0
    guard = threading.Lock()
    errors: list[Exception] = []

    def worker() -> None:
        nonlocal in_cs, max_in_cs
        try:
            mutex.acquire("t")
            with guard:
                in_cs += 1
                max_in_cs = max(max_in_cs, in_cs)
            time.sleep(0.05)
            with guard:
                in_cs -= 1
            mutex.release("t")
        except Exception as e:  # pragma: no cover - diagnostics
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert max_in_cs == 1  # never two holders, even while breaking the orphan


def test_heartbeat_protects_long_held_lock_from_steal(tmp_path):
    """A live holder whose append outlasts stale_seconds is NOT stolen
    from: the holder's heartbeat refreshes the lock mtime, so a contender
    times out instead of breaking a live lock (ADVICE r3: silent duplicate
    lsn reservation)."""
    import threading
    import time

    from event_store_spark.core.state import TopicMutex

    mutex = TopicMutex(str(tmp_path / "locks"), timeout_seconds=1.5, stale_seconds=1.0)
    mutex.acquire("t")  # heartbeat now refreshes mtime every 0.25s
    try:
        t0 = time.monotonic()
        contender = TopicMutex(str(tmp_path / "locks"), timeout_seconds=1.5, stale_seconds=1.0)
        with pytest.raises(TimeoutError, match="'t'"):
            contender.acquire("t")
        # held well past stale_seconds without being stolen
        assert time.monotonic() - t0 >= 1.4
    finally:
        mutex.release("t")
    # once released, a fresh acquire succeeds immediately
    contender.acquire("t")
    contender.release("t")


def test_append_mutex_times_out_on_live_contention(store, spark):
    """A fresh (non-stale) foreign lock makes append fail fast with
    TimeoutError rather than corrupting the ticket."""
    store._append_mutex.acquire("held_events")
    store._append_mutex.timeout_seconds = 0.3
    with pytest.raises(TimeoutError, match="held_events"):
        store.append("held_events", _payload_df(spark, [("k", "p", TS)]))
    store._append_mutex.release("held_events")
    store._append_mutex.timeout_seconds = 30.0
    assert store.append("held_events", _payload_df(spark, [("k", "p", TS)])).lsn == 1


def _published_ranges(files):
    """(mtime, name)-ordered per-file (lsn, id) min/max from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(files, key=lambda f: (os.path.getmtime(f), os.path.basename(f))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = (float("inf"), float("inf"))
        hi = (float("-inf"), float("-inf"))
        for rg in range(md.num_row_groups):
            s_lsn = md.row_group(rg).column(idx["lsn"]).statistics
            s_id = md.row_group(rg).column(idx["id"]).statistics
            lo = min(lo, (s_lsn.min, s_id.min))
            hi = max(hi, (s_lsn.max, s_id.max))
        out.append((lo, hi))
    return out


def test_publication_order_matches_commit_order(store, spark):
    """Interleaved multi-file appends must become visible in (lsn, id)
    order: stream sources pick files up by (modTime, path), and the
    Replicator/Subscription keyset cursor silently DROPS rows that arrive
    below the cursor. Round-3 regression: two appends within one mtime tick
    interleaved alphabetically (part-00000-<uuidA> < part-00000-<uuidB> <
    part-00001-<uuidA>) and lost half the events. Pins both orderings the
    ordered publication provides — mtime sequence and sortable file names —
    with disjoint, ascending per-file (lsn, id) ranges."""
    for b in range(3):  # appends land within the same millisecond
        rows = [(f"k{b}-{i}", f"p{b}-{i}", TS) for i in range(4)]
        store.append("ord_events", _payload_df(spark, rows).repartition(4))
    files = [
        os.path.join(store.topic_path("ord_events"), f)
        for f in os.listdir(store.topic_path("ord_events"))
        if f.endswith(".parquet")
    ]
    assert len(files) > 3  # the regression needs multi-file appends
    # mtime order, name order, and footer-stat order must all agree
    by_mtime = sorted(files, key=os.path.getmtime)
    by_name = sorted(files, key=os.path.basename)
    assert [os.path.basename(f) for f in by_mtime] == [
        os.path.basename(f) for f in by_name
    ]
    assert len({os.path.getmtime(f) for f in files}) == len(files)  # no ties
    ranges = _published_ranges(files)
    for (prev_lo, prev_hi), (lo, hi) in zip(ranges, ranges[1:]):
        assert prev_hi < lo, f"file ranges overlap or regress: {prev_hi} !< {lo}"


def test_publication_order_day_partitioned(store, spark):
    """Same invariant across dt= subdirectories: ids are assigned after an
    in-partition day sort, so each (task, day) file covers a disjoint
    ascending id range and cross-day publication stays in commit order."""
    for b in range(2):
        rows = [
            (f"k{b}-{i}", f"p{b}-{i}", TS + datetime.timedelta(days=i % 2))
            for i in range(4)
        ]
        store.append(
            "ordday_events",
            _payload_df(spark, rows).repartition(2),
            partition_by_day=True,
        )
    files = store._parquet_files(store.topic_path("ordday_events"))
    assert len(files) > 2
    assert len({os.path.getmtime(f) for f in files}) == len(files)
    ranges = _published_ranges(files)
    for (prev_lo, prev_hi), (lo, hi) in zip(ranges, ranges[1:]):
        assert prev_hi < lo, f"file ranges overlap or regress: {prev_hi} !< {lo}"
    # day pruning still works on the re-ordered layout
    one_day = store.read_events(
        "ordday_events", start_day="2025-01-04", end_day="2025-01-04"
    )
    assert one_day.count() == 4


def test_compaction_republishes_in_commit_order(store, spark):
    """Flat-topic compaction must keep the ordered-visibility invariant:
    the rewritten files carry fresh, strictly increasing clock mtimes/names
    and disjoint ascending (lsn, id) ranges, so a NEW replication stream
    over the compacted topic still observes commit order."""
    for b in range(3):
        rows = [(f"k{b}-{i}", f"p{b}-{i}", TS) for i in range(4)]
        store.append("cord_events", _payload_df(spark, rows).repartition(4))
    n = store.compact("cord_events", target_files=3)
    assert n == 3
    files = store._parquet_files(store.topic_path("cord_events"))
    assert len({os.path.getmtime(f) for f in files}) == len(files)
    assert sorted(files, key=os.path.getmtime) == sorted(
        files, key=lambda f: os.path.basename(f)
    )
    ranges = _published_ranges(files)
    for (_, prev_hi), (lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < lo
    # a later append keeps publishing past the compacted files' clocks
    store.append("cord_events", _payload_df(spark, [("kz", "pz", TS)]))
    files = store._parquet_files(store.topic_path("cord_events"))
    ranges = _published_ranges(files)
    assert ranges[-1][0][0] == 4  # newest lsn is last in pickup order


def _seed_topic(store, spark, topic="rc_events", n=6):
    import datetime as _dt

    rows = [
        (f"k{i}", str(i), _dt.datetime(2025, 1, 4, 12, 0, 0) + _dt.timedelta(minutes=i))
        for i in range(n)
    ]
    store.append(
        topic,
        spark.createDataFrame(rows, "key string, payload string, timestamp timestamp"),
    )
    return topic


def test_compaction_crash_between_renames_rolls_forward(store, spark):
    """Crash AFTER `rename(path, old)` with a complete `.compacted` dir:
    recovery finishes the swap — no committed row lost, no manual step."""
    import shutil

    topic = _seed_topic(store, spark, "rf_events")
    path = store.topic_path(topic)
    before = sorted((r.id, r.payload) for r in store.read_events(topic).collect())

    # build a complete compacted dir exactly as compact() would, then crash
    # between the two renames: path gone, data stranded in .old
    df = spark.read.parquet(path)
    tmp, ordered, old = f"{path}.compacting", f"{path}.compacted", f"{path}.old"
    df.repartitionByRange(1, "lsn", "id").sortWithinPartitions("lsn", "id") \
        .write.mode("overwrite").parquet(tmp)
    os.makedirs(ordered)
    store._publish_ordered(tmp, ordered, 10_000_000)
    shutil.rmtree(tmp)
    os.rename(path, old)

    got = sorted((r.id, r.payload) for r in store.read_events(topic).collect())
    assert got == before            # roll-forward healed the swap
    assert not os.path.exists(old)  # debris cleared
    assert os.path.isdir(path)


def test_compaction_crash_before_publish_rolls_back(store, spark):
    """Crash with `.old` present but NO usable `.compacted`: recovery
    restores the original directory."""
    topic = _seed_topic(store, spark, "rb_events")
    path = store.topic_path(topic)
    before = sorted((r.id, r.payload) for r in store.read_events(topic).collect())
    os.rename(path, f"{path}.old")  # simulated torn swap, nothing to roll forward

    got = sorted((r.id, r.payload) for r in store.read_events(topic).collect())
    assert got == before
    assert os.path.isdir(path)
    assert not os.path.exists(f"{path}.old")


def test_staging_sweep_cannot_cross_topics(store, spark):
    """The orphan sweep is scoped to the topic's own staging subdirectory:
    a topic whose name prefixes another's can never delete the other's
    in-flight staging."""
    a = _seed_topic(store, spark, "foo_events")
    staging_other = os.path.join(store.root, "_staging", "foo_events-eu_events")
    os.makedirs(staging_other, exist_ok=True)
    marker = os.path.join(staging_other, "inflight.parquet")
    open(marker, "w").write("x")
    _seed_topic(store, spark, "foo_events")  # second append sweeps ITS orphans
    assert os.path.exists(marker)  # the other topic's staging survived


def test_replicator_lock_steal_elects_single_winner(tmp_path):
    """Two stealers of one expired lease: exactly one acquire() returns
    True (rename-steal + O_EXCL), never both."""
    import time as _time

    from event_store_spark.streaming.lock import LockManager

    root = str(tmp_path / "locks")
    dead = LockManager(root, owner="dead", lease_seconds=0.2)
    assert dead.acquire()
    _time.sleep(0.4)  # lease expires, holder never heartbeats (crashed)

    a = LockManager(root, owner="a", lease_seconds=0.2)
    b = LockManager(root, owner="b", lease_seconds=0.2)
    got_a, got_b = a.acquire(), b.acquire()
    assert got_a != got_b or (got_a and a._holder() != b.owner)
    winners = [m.owner for m, got in ((a, got_a), (b, got_b)) if got and m._holder() == m.owner]
    assert len(winners) == 1


def test_replicator_lock_acquires_after_release_race(tmp_path):
    """A lease released between the failed O_EXCL and the holder read is
    retried, not reported as contended."""
    from event_store_spark.streaming.lock import LockManager

    root = str(tmp_path / "locks")
    first = LockManager(root, owner="first")
    assert first.acquire()
    first.release()
    second = LockManager(root, owner="second")
    assert second.acquire()  # free lock must be acquirable


def test_int_keys_out_of_32bit_range_rejected_at_append(store, spark):
    """Write side and read side agree on the int key domain: a value the
    typed view's 32-bit cast would NULL is rejected at append."""
    import datetime

    ok = spark.createDataFrame(
        [("2147483647", "p", datetime.datetime(2025, 1, 1))],
        "key string, payload string, timestamp timestamp",
    )
    store.append("ik_events", ok, key_type="int")
    bad = spark.createDataFrame(
        [("3000000000", "p", datetime.datetime(2025, 1, 1))],
        "key string, payload string, timestamp timestamp",
    )
    with pytest.raises(Exception, match="32-bit|out of"):
        store.append("ik_events", bad, key_type="int")


def test_lineage_marker_survives_torn_write(tmp_path):
    """An empty lineage marker (torn mint) is re-minted, never returned as
    lineage '' — '' would make unrelated checkpoints' batch ids comparable."""
    from event_store_spark.streaming.lineage import checkpoint_lineage_id

    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    open(os.path.join(ck, "_esp_lineage"), "w").close()  # torn: exists, empty
    minted = checkpoint_lineage_id(ck)
    assert minted  # non-empty
    assert checkpoint_lineage_id(ck) == minted  # stable afterwards


def test_compaction_cluster_by_zorder_day_topic(store, spark):
    """Z-order clustered compaction (analytics path): data and replay
    order survive, the dt= layout survives, and rows with the same key
    land in fewer files than row count (clustering by hashed key).
    Flat topics refuse cluster_by — their files must stay (lsn, id)
    range-disjoint for replication's ordered-visibility invariant."""
    import os

    from pyspark.sql import functions as F

    rows = []
    day = datetime.datetime(2025, 2, 1, 9)
    for i in range(40):
        rows.append((f"k{i % 4}", f"p{i}", day))
    store.append(
        "zc_events", _payload_df(spark, rows), partition_by_day=True
    )
    before = [
        (r.lsn, r.id, r.payload)
        for r in store.replay("zc_events").collect()
    ]
    n = store.compact("zc_events", target_files=4, cluster_by=("key", "lsn"))
    assert n >= 1
    after = [
        (r.lsn, r.id, r.payload) for r in store.replay("zc_events").collect()
    ]
    assert after == before
    # clustering: each of the 4 keys' rows concentrate in few files
    df = store.read_events("zc_events").select(
        "key", F.input_file_name().alias("f")
    )
    per_key_files = {
        r.key: r.nf
        for r in df.groupBy("key")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    }
    assert all(nf <= 2 for nf in per_key_files.values()), per_key_files

    store.append("zflat_events", _payload_df(spark, [("a", "1", TS)]))
    with pytest.raises(ValueError, match="day-partitioned"):
        store.compact("zflat_events", cluster_by=("key", "lsn"))


def test_zorder_key_negative_and_fractional_dims(store, spark):
    """_zorder_key range-normalizes via MIN as well as MAX: negative
    ints and double/decimal/tinyint columns all produce in-budget,
    monotone Z dims instead of sign-extended garbage or a silent fall
    into the 16-bit-hash branch (ADVICE r5)."""
    from pyspark.sql import functions as F

    def zcheck(df, cluster_by, order_col):
        z = store._zorder_key(df, cluster_by)
        rows = (
            df.withColumn("_z", z)
            .orderBy(order_col)
            .select(order_col, "_z")
            .collect()
        )
        zs = [r["_z"] for r in rows]
        assert all(v is not None and 0 <= v < (1 << 32) for v in zs), zs[:5]
        # varying only order_col (other dim constant): z monotone
        assert zs == sorted(zs), list(zip([r[order_col] for r in rows], zs))[:8]

    # negative bigint, narrow range (shiftleft branch)
    neg = spark.createDataFrame(
        [(i, 1.0) for i in range(-1000, 1000, 37)], "a bigint, b double"
    )
    zcheck(neg, ("a", "b"), "a")
    # negative bigint, range wider than the 16-bit budget (shiftright branch)
    wide = spark.createDataFrame(
        [(i * 100_000, 1.0) for i in range(-500, 500, 7)], "a bigint, b double"
    )
    zcheck(wide, ("a", "b"), "a")
    # fractional dim varies, int dim constant
    frac = spark.createDataFrame(
        [(5, -3.5 + 0.25 * i) for i in range(200)], "a bigint, b double"
    )
    zcheck(frac, ("a", "b"), "b")
    # tinyint and decimal are numeric, not hash-bucketed
    td = spark.createDataFrame(
        [(i - 50, float(i)) for i in range(100)], "a int, b double"
    ).select(
        F.col("a").cast("tinyint").alias("a"),
        F.col("b").cast("decimal(10,2)").alias("b"),
    )
    zcheck(td, ("a", "b"), "a")
    # all-NULL numeric column degrades to a constant dim, not an error
    nulls = spark.createDataFrame(
        [(None, float(i)) for i in range(10)], "a bigint, b double"
    )
    z = store._zorder_key(nulls, ("a", "b"))
    got = nulls.withColumn("_z", z).select("_z").collect()
    assert all(r["_z"] is not None for r in got)
