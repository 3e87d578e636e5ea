"""OCF landing-zone ingestion (`streaming/ocf_ingest.py`): arriving
.avro files become event-store appends exactly once — across polls,
across new arrivals, and across a crash that lands between the append
and the ledger write."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_store_spark.avro.container import write_avro_container
from event_store_spark.core import EventStore
from event_store_spark.streaming.ocf_ingest import OcfIngest

SCHEMA = {
    "type": "record",
    "name": "shop.events.OrderPlaced",
    "fields": [
        {"name": "order_id", "type": "long"},
        {"name": "amount", "type": "double"},
    ],
}


def _file(tmp_path, name, ids):
    write_avro_container(
        [{"order_id": i, "amount": float(i)} for i in ids],
        SCHEMA,
        str(tmp_path / "landing" / name),
    )


def _ingest(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "store"))
    return store, OcfIngest(
        store,
        "orders_events",
        str(tmp_path / "landing" / "*.avro"),
        str(tmp_path / "ledger.json"),
        to_envelope=lambda df: df.select(
            F.col("order_id").cast("string").alias("key"),
            F.concat(F.lit("amt="), F.col("amount").cast("string")).alias(
                "payload"
            ),
        ),
    )


def test_files_ingest_exactly_once_across_polls(spark, tmp_path):
    (tmp_path / "landing").mkdir()
    _file(tmp_path, "f1.avro", [1, 2, 3])
    _file(tmp_path, "f2.avro", [4, 5])
    store, ing = _ingest(spark, tmp_path)

    assert ing.poll_once() == ["f1.avro", "f2.avro"]
    ev = store.read_events("orders_events")
    assert ev.count() == 5
    # one append per file: all of a file's rows share one lsn
    lsns = {
        r.src: r.n
        for r in ev.select(
            F.decode(F.col("metadata")["src"], "UTF-8").alias("src"), "lsn"
        )
        .groupBy("src")
        .agg(F.countDistinct("lsn").alias("n"))
        .collect()
    }
    assert lsns == {"f1.avro": 1, "f2.avro": 1}

    assert ing.poll_once() == []  # idempotent re-poll
    assert store.read_events("orders_events").count() == 5

    _file(tmp_path, "f3.avro", [6])
    assert ing.poll_once() == ["f3.avro"]
    assert store.read_events("orders_events").count() == 6


def test_crash_between_append_and_ledger_is_absorbed(spark, tmp_path):
    """Lose the ledger AFTER ingesting (the worst crash point replayed
    for every file at once): the restarted tailer's FIRST poll finds
    every file already in the topic via one distinct-src scan and
    records it WITHOUT re-appending."""
    import os

    (tmp_path / "landing").mkdir()
    _file(tmp_path, "f1.avro", [1, 2])
    _file(tmp_path, "f2.avro", [3])
    store, ing = _ingest(spark, tmp_path)
    ing.poll_once()
    assert store.read_events("orders_events").count() == 3

    os.remove(str(tmp_path / "ledger.json"))  # simulated crash window
    _store2, ing2 = _ingest(spark, tmp_path)  # crash ⇒ process restart
    assert ing2.poll_once() == []  # absorbed, not re-appended
    assert store.read_events("orders_events").count() == 3
    assert ing2._ledger() == {"f1.avro", "f2.avro"}  # ledger rebuilt

    # and ingestion continues normally afterwards
    _file(tmp_path, "f3.avro", [9, 10])
    assert ing2.poll_once() == ["f3.avro"]
    assert store.read_events("orders_events").count() == 5


def test_recovery_probe_runs_once_per_process(spark, tmp_path):
    """The topic presence probe is bounded to the crash window: one scan
    on the first poll with unprocessed files, ZERO scans on the normal
    path afterwards (ADVICE r7: the per-file probe made ingest
    O(new_files x topic_size))."""
    (tmp_path / "landing").mkdir()
    _file(tmp_path, "f1.avro", [1])
    store, ing = _ingest(spark, tmp_path)

    probes = []
    orig = ing._srcs_in_topic
    ing._srcs_in_topic = lambda: probes.append(1) or orig()

    assert ing.poll_once() == ["f1.avro"]
    assert len(probes) == 1  # first poll with new files: exactly one scan
    _file(tmp_path, "f2.avro", [2])
    _file(tmp_path, "f3.avro", [3])
    assert ing.poll_once() == ["f2.avro", "f3.avro"]
    assert ing.poll_once() == []
    assert len(probes) == 1  # never again in this process


def test_recursive_glob_colliding_basenames_both_ingest(spark, tmp_path):
    """Two files named data.avro under different subdirectories must get
    distinct idempotence keys (path relative to the landing root), not
    collide on basename with the second silently dropped (ADVICE r7)."""
    (tmp_path / "landing" / "a").mkdir(parents=True)
    (tmp_path / "landing" / "b").mkdir(parents=True)
    _file(tmp_path, "a/data.avro", [1, 2])
    _file(tmp_path, "b/data.avro", [3])
    store = EventStore(spark, str(tmp_path / "store"))
    ing = OcfIngest(
        store,
        "orders_events",
        str(tmp_path / "landing" / "**" / "*.avro"),
        str(tmp_path / "ledger.json"),
        to_envelope=lambda df: df.select(
            F.col("order_id").cast("string").alias("key"),
            F.lit("p").alias("payload"),
        ),
    )
    import os

    sep = os.sep
    assert ing.poll_once() == [f"a{sep}data.avro", f"b{sep}data.avro"]
    assert store.read_events("orders_events").count() == 3
    assert ing.poll_once() == []  # both ledgered under distinct keys
