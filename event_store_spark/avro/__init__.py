"""Avro binary serde + Confluent wire framing + schema registries
(in-process LocalSchemaRegistry, Confluent-REST HttpSchemaRegistry)."""

from event_store_spark.avro.codec import (
    RecordCodec,
    decode_map_bytes,
    encode_map_bytes,
    frame,
    unframe,
)
from event_store_spark.avro.http_registry import HttpSchemaRegistry
from event_store_spark.avro.registry import LocalSchemaRegistry

__all__ = [
    "HttpSchemaRegistry",
    "RecordCodec",
    "encode_map_bytes",
    "decode_map_bytes",
    "frame",
    "unframe",
    "LocalSchemaRegistry",
]
