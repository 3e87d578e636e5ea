"""Kafka source/sink path (S2–S5) without a broker.

The option/adapter layer is pure; these tests inject DataFrames with the
exact `format("kafka")` source schema and assert the same behaviors the
reference pins in its Kafka tests:

- consumer options: subscribe + read_committed + offsets-table seek
  (KafkaReceiverConfigurationTest.java:56-69, ReactorKafkaEventStore.java:270-278)
- record shape round-trip broker-side: what the Replicator produces is what
  the Subscription decodes (EventReplicatorWorker.java:187-230 ↔
  ReactorKafkaEventTransformer.java:128-190)
- sink projection: exactly (key, value, headers), binary key/value
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from event_store_spark.core import EventStore
from event_store_spark.core.state import OffsetsTable
from event_store_spark.streaming import (
    Replicator,
    Subscription,
    kafka_reader_options,
    kafka_source_to_records,
    kafka_writer_options,
    records_to_kafka_sink,
)
from event_store_spark.streaming.kafka import KAFKA_SOURCE_SCHEMA
from event_store_spark.streaming.replicate import from_kafka_records, to_kafka_records

TS = datetime.datetime(2025, 1, 4, 12, 0, 0)


@pytest.fixture
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "store"))


def test_reader_options_seek_from_offsets_table(tmp_path):
    """startingOffsets resumes at last+1 per partition; -1 → earliest (-2);
    read_committed isolation and headers always on."""
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    offsets.upsert("t_events", 41, partition=0)
    opts = kafka_reader_options("broker:9092", "t_events", offsets, [0, 1])
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "t_events"
    assert opts["includeHeaders"] == "true"
    assert opts["kafka.isolation.level"] == "read_committed"
    assert opts["failOnDataLoss"] == "true"
    assert json.loads(opts["startingOffsets"]) == {"t_events": {"0": 42, "1": -2}}


def test_reader_options_default_earliest():
    opts = kafka_reader_options("b:9092", "t_events")
    assert opts["startingOffsets"] == "earliest"


def test_writer_options():
    opts = kafka_writer_options("broker:9092", "t_events")
    # no includeHeaders: that's a SOURCE option; the sink emits headers
    # whenever the DataFrame carries a headers column
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "t_events",
    }


def test_sink_projection_shape(spark, store):
    """The Kafka sink consumes exactly (key, value, headers) with binary
    key/value; bookkeeping columns (lsn, id, timestamp_ms) are dropped."""
    store.append(
        "sp_events",
        spark.createDataFrame(
            [("k1", "p1", TS)], "key string, payload string, timestamp timestamp"
        ),
    )
    out = records_to_kafka_sink(to_kafka_records(store.read_events("sp_events")))
    assert out.columns == ["key", "value", "headers"]
    fields = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert fields["key"] == "binary" and fields["value"] == "binary"
    assert fields["headers"] == "array<struct<key:string,value:binary>>"


def test_broker_roundtrip_via_injected_kafka_frame(spark, store):
    """Producer → broker → consumer simulated end-to-end: project the
    Replicator's outbound records into the exact Kafka SOURCE schema (as the
    broker would hand them back), then decode through the Subscription path
    (kafka_source_to_records + from_kafka_records). Envelope fields,
    header-borne (lsn, id) cursor, and consumption metadata must all
    survive."""
    store.append(
        "rt_events",
        spark.createDataFrame(
            [("k1", "p1", TS, {"hTest": bytearray(b"hv")})],
            "key string, payload string, timestamp timestamp, metadata map<string,binary>",
        ),
    )
    produced = records_to_kafka_sink(to_kafka_records(store.read_events("rt_events")))
    # what the broker hands back: sink columns + broker-assigned fields
    broker = produced.select(
        "key",
        "value",
        F.lit("rt_events").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(7).cast("long").alias("offset"),
        F.lit(TS).alias("timestamp"),
        F.lit(0).alias("timestampType"),
        "headers",
    )
    assert [f.name for f in broker.schema.fields] == [
        f.split(" ")[0] for f in KAFKA_SOURCE_SCHEMA.split(", ")
    ]
    events = from_kafka_records(kafka_source_to_records(broker))
    row = events.first()
    assert bytes(row.key) == b"k1"
    assert row.lsn == 1 and row.id is not None  # cursor restored from headers
    assert row.timestamp == TS
    assert bytes(row.data) == b"p1"
    md = {k: bytes(v) for k, v in row.metadata.items()}
    assert md["hTest"] == b"hv"
    assert md["partition"] == b"0" and md["offset"] == b"7"  # consumption metadata


def test_subscription_kafka_source_validation(store, tmp_path):
    offsets = OffsetsTable(str(tmp_path / "offsets.json"))
    with pytest.raises(ValueError, match="bootstrap_servers"):
        Subscription(store, offsets, str(tmp_path / "ck"), source="kafka")
    with pytest.raises(ValueError, match="source"):
        Subscription(store, offsets, str(tmp_path / "ck"), source="pulsar")


def test_replicator_kafka_sink_validation(store, tmp_path):
    from event_store_spark.core.state import ProgressStore

    progress = ProgressStore(str(tmp_path / "progress.json"))
    with pytest.raises(ValueError, match="bootstrap_servers"):
        Replicator(store, str(tmp_path / "t"), progress, str(tmp_path / "ck"), sink="kafka")
    with pytest.raises(ValueError, match="sink"):
        Replicator(store, str(tmp_path / "t"), progress, str(tmp_path / "ck"), sink="s3")


def test_offsets_without_partitions_rejected():
    """Passing an offsets table without the full partition list raises
    instead of silently discarding the resume position (which would
    re-read the whole topic from 'earliest' on every restart)."""
    import pytest

    from event_store_spark.core.state import OffsetsTable
    from event_store_spark.streaming.kafka import kafka_reader_options

    import tempfile, os
    offs = OffsetsTable(os.path.join(tempfile.mkdtemp(), "o.json"))
    with pytest.raises(ValueError, match="partition list"):
        kafka_reader_options("b:9092", "t_events", offsets=offs, partitions=None)
    with pytest.raises(ValueError, match="partition list"):
        kafka_reader_options("b:9092", "t_events", offsets=offs, partitions=[])


def test_unknown_media_type_raises_in_feature_extract(spark):
    """extract_features goes through decode_media, so an unregistered
    codec fails loudly instead of emitting fake features."""
    import pytest

    from event_store_spark.functions.multimodal import attach_binary, extract_features
    from event_store_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(3)
    bad = attach_binary(docs, media_type="image/png")
    with pytest.raises(Exception, match="no codec"):
        extract_features(bad).collect()
