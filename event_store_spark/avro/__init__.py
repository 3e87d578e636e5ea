"""Avro binary serde + Confluent wire framing + local schema registry."""

from event_store_spark.avro.codec import (
    RecordCodec,
    decode_map_bytes,
    encode_map_bytes,
    frame,
    unframe,
)
from event_store_spark.avro.registry import LocalSchemaRegistry

__all__ = [
    "RecordCodec",
    "encode_map_bytes",
    "decode_map_bytes",
    "frame",
    "unframe",
    "LocalSchemaRegistry",
]
