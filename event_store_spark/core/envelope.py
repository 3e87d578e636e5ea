"""The Event envelope — Spark-native data model for event tables.

Re-expresses the reference's fundamental record
``Event<K, V>(key, payload, timestamp, metadata)`` (`Event.java:49`) and its
physical row ``(id, key, data, metadata, timestamp, lsn)``
(`events_schema.sql:1-13`) as a fixed StructType:

- ``id: long`` — per-topic monotone within an append (bigserial analog)
- ``key: binary`` — canonical key bytes; non-binary key types are serialized
  as UTF-8 of their string form, exactly like the reference does when keys
  cross to Kafka/crypto (`EventEncryptor.java:146`,
  `EventReplicatorWorker.java:211-217`)
- ``key_type: string`` — 'uuid' | 'string' | 'int' | 'bytes', preserving the
  reference's 4-way key-type test matrix for typed read views
- ``timestamp: timestamp`` — truncated to milliseconds (`Event.java:69`)
- ``metadata: map<string,binary>`` — values MUST be binary
  (`EventStore.java:68-69`); reserved keys ``id``/``kid`` rejected on save
  (`EventStore.java:46,57`, `PostgresEventStore.java:113-119`); canonical
  key-sorted order applied at serialization boundaries
  (`MetadataSerializer.java:80`)
- ``lsn: long`` — commit-order component; assigned in-batch at append (the
  Spark-native answer to the reference's async LSN stamping, SURVEY §7)
- payload: either a typed ``payload`` struct column (columnar at rest — the
  Spark-first representation) or an encoded ``data: binary`` column when a
  codec/encryptor is attached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reserved metadata keys (EventStore.java:46,52,57)
SOURCE_ID = "id"
SOURCE_LSN = "lsn"
ENCRYPTION_KEY_ID = "kid"
RESERVED_METADATA_KEYS = (SOURCE_ID, ENCRYPTION_KEY_ID)

KEY_TYPES = ("uuid", "string", "int", "bytes")

METADATA_TYPE = T.MapType(T.StringType(), T.BinaryType())

ENVELOPE_FIELDS = [
    T.StructField("id", T.LongType(), False),
    T.StructField("key", T.BinaryType(), False),
    T.StructField("key_type", T.StringType(), False),
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("metadata", METADATA_TYPE, True),
    T.StructField("lsn", T.LongType(), True),
]


def canonical_key(col: Column, key_type: str) -> Column:
    """Canonical binary key bytes per key type.

    uuid/string/int → UTF-8 bytes of the string form; bytes → passthrough.
    """
    if key_type == "bytes":
        return col.cast("binary")
    if key_type not in KEY_TYPES:
        raise ValueError(f"unsupported key_type {key_type!r}; one of {KEY_TYPES}")
    as_str = col.cast("string")
    if key_type == "int":
        # fail at APPEND time for values outside Java Integer range: the
        # typed read view casts to 32-bit int (reference parity), which
        # would otherwise fail every later read under ANSI mode (or
        # silently NULL the key with ANSI off). try_cast keeps the probe
        # itself from throwing so the deliberate error below is what fires.
        as_str = F.when(
            col.isNotNull() & as_str.try_cast("int").isNull(),
            F.raise_error(
                F.concat(F.lit("int key out of 32-bit range: "), as_str)
            ),
        ).otherwise(as_str)
    return F.encode(as_str, "UTF-8")


def typed_key_view(key: Column, key_type: str) -> Column:
    """Decode the canonical binary key back to its typed view."""
    if key_type == "bytes":
        return key
    decoded = F.decode(key, "UTF-8")
    if key_type == "int":
        return decoded.cast("int")
    return decoded  # uuid and string views are strings


def truncate_millis(ts: Column) -> Column:
    """Millisecond truncation, mirroring Event.java:69."""
    return F.timestamp_millis(F.unix_millis(ts.cast("timestamp_ltz")))


def canonical_metadata_entries(metadata: Column) -> Column:
    """Key-sorted entries array — the canonical metadata order applied at
    every serialization boundary (MetadataSerializer.java:80, header sorting
    in ReactorKafkaEventTransformer.java:163-166)."""
    return F.array_sort(F.map_entries(metadata))


def validate_metadata(df: DataFrame, column: str = "metadata") -> None:
    """Reject reserved metadata keys at append time (F4).

    Mirrors PostgresEventStore.java:113-119 (IllegalArgumentException on
    ``id``/``kid``). Value-type enforcement is structural in Spark: the
    column must already be map<string,binary>.
    """
    if column not in df.columns:
        return
    dtype = df.schema[column].dataType
    if not isinstance(dtype, T.MapType) or not isinstance(
        dtype.valueType, T.BinaryType
    ):
        raise TypeError(
            f"metadata must be map<string,binary>, got {dtype.simpleString()} "
            "(reference: metadata values must be byte[], EventStore.java:68-69)"
        )
    cond = None
    for k in RESERVED_METADATA_KEYS:
        c = F.map_contains_key(F.col(column), k)
        cond = c if cond is None else (cond | c)
    bad = df.where(F.col(column).isNotNull() & cond).limit(1).count()
    if bad:
        raise ValueError(
            f"metadata must not contain reserved keys {RESERVED_METADATA_KEYS} "
            "(reference: PostgresEventStore.java:113-119)"
        )
