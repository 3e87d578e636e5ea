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


SCHEMA_V2 = {
    "type": "record",
    "name": "OrderPlaced",
    "fields": [
        {"name": "item", "type": "string"},
        {"name": "qty", "type": "long"},
        {"name": "discount", "type": ["null", "double"], "default": None},
        {"name": "channel", "type": "string", "default": "web"},
    ],
}


def test_load_decodes_mixed_schema_versions(spark, tmp_path):
    """Rows written before a schema evolution keep decoding: each frame is
    resolved by ITS writer id; reader-schema fields the writer lacked take
    their Avro defaults (registry contract, ADVICE r1)."""
    reg = LocalSchemaRegistry()
    v1 = reg.register(SCHEMA)
    store = AvroEventStore(spark, str(tmp_path / "s"), reg)
    df1 = spark.createDataFrame(
        [("u1", "widget", 3, TS)],
        "key string, item string, qty long, timestamp timestamp",
    )
    store.save("evo_events", df1, "OrderPlaced")

    v2 = reg.register(SCHEMA_V2)
    assert v2 != v1  # changed schema under the same subject → new id
    df2 = spark.createDataFrame(
        [("u2", "gadget", 1, 0.25, "store", TS)],
        "key string, item string, qty long, discount double, channel string, "
        "timestamp timestamp",
    )
    store.save("evo_events", df2, "OrderPlaced")

    rows = {
        r.payload.item: r.payload
        for r in store.load("evo_events", "OrderPlaced").collect()
    }
    assert rows["widget"].qty == 3
    assert rows["widget"].discount is None  # nullable default
    assert rows["widget"].channel == "web"  # declared default
    assert rows["gadget"].discount == 0.25
    assert rows["gadget"].channel == "store"


def test_strict_decode_still_rejects_foreign_frames(spark, tmp_path):
    """Without writer_schemas the single-version check stays strict."""
    import pandas as pd
    import pytest
    from event_store_spark.avro.codec import RecordCodec, frame
    from event_store_spark.avro.spark import from_confluent_avro
    from pyspark.sql import functions as F

    codec = RecordCodec(SCHEMA)
    body = codec.encode({"item": "x", "qty": 1})
    df = spark.createDataFrame([(frame(99, body),)], "data binary")
    with pytest.raises(Exception, match="schema id mismatch"):
        df.select(from_confluent_avro(F.col("data"), SCHEMA, 1)).collect()


def test_decode_newer_frames_with_older_reader(spark):
    """Evolution, reverse direction: frames written with the NEWER schema
    decode under the older reader — extra writer fields are discarded
    (reader projection), mirroring Avro reader/writer resolution."""
    from event_store_spark.avro.codec import RecordCodec, frame
    from event_store_spark.avro.spark import from_confluent_avro
    from pyspark.sql import functions as F

    v2 = RecordCodec(SCHEMA_V2)
    body = v2.encode(
        {"item": "widget", "qty": 4, "discount": 0.1, "channel": "app"}
    )
    df = spark.createDataFrame([(frame(2, body),)], "data binary")
    out = df.select(
        from_confluent_avro(
            F.col("data"), SCHEMA, 1, writer_schemas={1: SCHEMA, 2: SCHEMA_V2}
        ).alias("p")
    ).first()
    assert out.p.item == "widget" and out.p.qty == 4
    assert list(out.p.asDict()) == ["item", "qty"]  # v2-only fields dropped


def test_encrypted_and_plaintext_saves_share_topic_and_key_type(spark, tmp_path):
    """save(topic, df, name) and save(..., encryption_key=...) are
    interchangeable per topic (EventStore.java:94): the encrypted path
    records the CALLER's key_type, so mixing them neither trips the
    ticket key-type check nor degrades the typed key view."""
    import datetime

    from event_store_spark.avro import LocalSchemaRegistry
    from event_store_spark.core.avro_store import AvroEventStore
    from event_store_spark.crypto.aead import EventEncryptor

    reg = LocalSchemaRegistry()
    reg.register({"type": "record", "name": "Mix",
                  "fields": [{"name": "text", "type": "string"}]})
    enc = EventEncryptor({"kms://m": EventEncryptor.generate_key()})
    store = AvroEventStore(spark, str(tmp_path / "store"), reg, enc)
    ts = datetime.datetime(2025, 1, 4, 12, 0, 0)
    df1 = spark.createDataFrame([("u1", "plain", ts)], "key string, text string, timestamp timestamp")
    df2 = spark.createDataFrame([("u2", "sealed", ts)], "key string, text string, timestamp timestamp")

    store.save("mix_events", df1, "Mix", key_type="string")
    store.save("mix_events", df2, "Mix", key_type="string", encryption_key="kms://m")

    out = store.load("mix_events", "Mix")
    got = {r.payload.text for r in out.collect()}
    assert got == {"plain", "sealed"}
    typed = store.read_events("mix_events", typed_key=True)
    keys = {r.key_view for r in typed.collect()}
    assert keys == {"u1", "u2"}  # typed view intact for BOTH rows
