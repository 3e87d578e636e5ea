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
    for every file at once): the re-poll finds every file already in
    the topic via the src metadata probe and records it WITHOUT
    re-appending."""
    import os

    (tmp_path / "landing").mkdir()
    _file(tmp_path, "f1.avro", [1, 2])
    _file(tmp_path, "f2.avro", [3])
    store, ing = _ingest(spark, tmp_path)
    ing.poll_once()
    assert store.read_events("orders_events").count() == 3

    os.remove(str(tmp_path / "ledger.json"))  # simulated crash window
    assert ing.poll_once() == []  # absorbed, not re-appended
    assert store.read_events("orders_events").count() == 3
    assert ing._ledger() == {"f1.avro", "f2.avro"}  # ledger rebuilt

    # and ingestion continues normally afterwards
    _file(tmp_path, "f3.avro", [9, 10])
    assert ing.poll_once() == ["f3.avro"]
    assert store.read_events("orders_events").count() == 5
