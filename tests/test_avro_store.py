"""AvroEventStore: one-call save/load with serde + optional AEAD, and
micro-batch bounding (O2) on replication."""

from __future__ import annotations

import datetime

from event_store_spark.avro import LocalSchemaRegistry
from event_store_spark.core.avro_store import AvroEventStore
from event_store_spark.core.state import ProgressStore
from event_store_spark.crypto import EventEncryptor
from event_store_spark.streaming import Replicator

SCHEMA = {
    "type": "record",
    "name": "OrderPlaced",
    "fields": [
        {"name": "item", "type": "string"},
        {"name": "qty", "type": "long"},
    ],
}
TS = datetime.datetime(2025, 2, 1, 8, 30)


def test_save_load_plaintext(spark, tmp_path):
    reg = LocalSchemaRegistry()
    reg.register(SCHEMA)
    store = AvroEventStore(spark, str(tmp_path / "s"), reg)
    df = spark.createDataFrame(
        [("u1", "widget", 3, TS), ("u2", "gadget", 1, TS)],
        "key string, item string, qty long, timestamp timestamp",
    )
    cur = store.save("orders_events", df, "OrderPlaced")
    assert cur.lsn == 1
    out = {r.payload.item: r.payload.qty for r in store.load("orders_events", "OrderPlaced").collect()}
    assert out == {"widget": 3, "gadget": 1}


def test_save_load_encrypted_roundtrip(spark, tmp_path):
    reg = LocalSchemaRegistry()
    sid = reg.register(SCHEMA)
    enc = EventEncryptor({"kms://k": EventEncryptor.generate_key()})
    store = AvroEventStore(spark, str(tmp_path / "s"), reg, encryptor=enc)
    df = spark.createDataFrame(
        [("u1", "secret-item", 9, TS, {"mTest": bytearray(b"v")})],
        "key string, item string, qty long, timestamp timestamp, metadata map<string,binary>",
    )
    store.save("sec_events", df, "OrderPlaced", encryption_key="kms://k")
    raw = store.read_events("sec_events").first()
    assert bytes(raw.metadata["kid"]) == b"kms://k"
    plain_frame = reg.serialize("OrderPlaced", {"item": "secret-item", "qty": 9})
    assert bytes(raw.data) != plain_frame  # ciphertext at rest
    out = store.load("sec_events", "OrderPlaced").first()
    assert out.payload.item == "secret-item" and out.payload.qty == 9
    assert bytes(out.metadata["mTest"]) == b"v"


def test_replication_micro_batch_bounding(spark, tmp_path):
    """maxFilesPerTrigger bounds each replication transaction (O2 — the
    reference's LIMIT-100 batched pulls)."""
    reg = LocalSchemaRegistry()
    reg.register(SCHEMA)
    store = AvroEventStore(spark, str(tmp_path / "s"), reg)
    for i in range(3):
        df = spark.createDataFrame(
            [(f"u{i}", f"it{i}", i, TS)], "key string, item string, qty long, timestamp timestamp"
        )
        store.save("mb_events", df, "OrderPlaced")
    progress = ProgressStore(str(tmp_path / "p.json"))
    rep = Replicator(
        store,
        str(tmp_path / "k"),
        progress,
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    q = rep.replicate("mb_events")
    q.awaitTermination(120)
    # one micro-batch per file → final batch id ≥ 2 (0-indexed), all rows out
    assert progress.last_batch_id("mb_events") >= 2
    assert spark.read.parquet(rep.target_path("mb_events")).count() == 3
