"""DataFrame-side Avro serde: struct column ⇄ Confluent-framed bytes (T1/T2).

Arrow-batched pandas UDFs wrapping the pure-Python codec — the engine's
stand-in for `to_avro`/`from_avro` + the 5-byte Confluent prefix (the
spark-avro module jar is not present, and `from_avro` would not speak the
prefix anyway — SURVEY §7 "Confluent wire format").

Only the (payload → bytes) boundary crosses into Python, once per batch via
Arrow; all other envelope columns stay JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from event_store_spark.avro.codec import RecordCodec, frame, unframe
from event_store_spark.shipping import ensure_shipped

_AVRO_TO_SPARK = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def spark_type_of(codec: RecordCodec) -> str:
    """Spark struct DDL equivalent of a flat Avro record schema."""
    fields = []
    for name, t in codec.fields:
        base = t[1] if isinstance(t, list) else t
        fields.append(f"{name} {_AVRO_TO_SPARK[base]}")
    return f"struct<{', '.join(fields)}>"


def to_confluent_avro(payload: Column, schema: dict | str, schema_id: int) -> Column:
    """struct column → Confluent-framed Avro binary column."""
    ensure_shipped()
    codec = RecordCodec(schema)

    @F.pandas_udf("binary")
    def ser(pdf: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [frame(schema_id, codec.encode(row)) for row in pdf.to_dict("records")]
        )

    return ser(payload)


def from_confluent_avro(data: Column, schema: dict | str, schema_id: int) -> Column:
    """Confluent-framed Avro binary column → struct column.

    The schema id in each frame is checked against ``schema_id`` —
    mirroring the registry lookup the reference's deserializer performs.
    """
    ensure_shipped()
    codec = RecordCodec(schema)
    out_type = spark_type_of(codec)

    @F.pandas_udf(out_type)
    def de(col: pd.Series) -> pd.DataFrame:
        rows = []
        for b in col:
            sid, body = unframe(bytes(b))
            if sid != schema_id:
                raise ValueError(f"schema id mismatch: frame {sid} != {schema_id}")
            rows.append(codec.decode(body))
        return pd.DataFrame(rows, columns=[n for n, _ in codec.fields])

    return de(data)
