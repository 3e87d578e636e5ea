"""Avro schema-evolution matrix across writer versions on ONE topic.

The reference inherits full Avro resolution rules from the Confluent
registry (RecordNameStrategy — PostgresEventStoreAutoConfiguration.java:
50-57); the repo resolves each frame by its writer id and projects to the
reader schema (avro/spark.py). This matrix pins the four standard
evolution moves the registry would accept, decoded in ONE mixed-version
pass:

  v1 -> v2: field ADD with default      (reader fills the default)
  v2 -> v3: field REMOVE                (reader discards the extra)
  v3 -> v4: field RENAME via aliases    (reader matches writer name)
  int -> long PROMOTION                 (v1 wrote int, readers use long)
  float -> double PROMOTION             (same lane)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_store_spark.avro import LocalSchemaRegistry
from event_store_spark.avro.codec import RecordCodec, frame
from event_store_spark.avro.spark import from_confluent_avro

V1 = {
    "type": "record",
    "name": "Click",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "n", "type": "int"},
        {"name": "score", "type": "float"},
        {"name": "legacy", "type": "string"},
    ],
}
# ADD "region" with default
V2 = {
    "type": "record",
    "name": "Click",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "n", "type": "int"},
        {"name": "score", "type": "float"},
        {"name": "legacy", "type": "string"},
        {"name": "region", "type": "string", "default": "eu"},
    ],
}
# REMOVE "legacy"
V3 = {
    "type": "record",
    "name": "Click",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "n", "type": "int"},
        {"name": "score", "type": "float"},
        {"name": "region", "type": "string", "default": "eu"},
    ],
}
# RENAME url -> href (alias), PROMOTE n int->long, score float->double
V4 = {
    "type": "record",
    "name": "Click",
    "fields": [
        {"name": "href", "type": "string", "aliases": ["url"]},
        {"name": "n", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "region", "type": "string", "default": "eu"},
    ],
}


def _mixed_frames(reg):
    """One frame per writer version, same subject, one topic's worth."""
    rows = [
        (
            "w1",
            frame(
                reg.register(V1),
                RecordCodec(V1).encode(
                    {"url": "a.com", "n": 1, "score": 1.5, "legacy": "x"}
                ),
            ),
        ),
        (
            "w2",
            frame(
                reg.register(V2),
                RecordCodec(V2).encode(
                    {
                        "url": "b.com",
                        "n": 2,
                        "score": 2.5,
                        "legacy": "y",
                        "region": "us",
                    }
                ),
            ),
        ),
        (
            "w3",
            frame(
                reg.register(V3),
                RecordCodec(V3).encode(
                    {"url": "c.com", "n": 3, "score": 3.5, "region": "ap"}
                ),
            ),
        ),
        (
            "w4",
            frame(
                reg.register(V4),
                RecordCodec(V4).encode(
                    {"href": "d.com", "n": 4, "score": 4.5, "region": "sa"}
                ),
            ),
        ),
    ]
    return rows


def _decode_all(spark, reg, reader):
    rows = _mixed_frames(reg)
    df = spark.createDataFrame(rows, "w string, data binary")
    writers = {sid: reg.codec_by_id(sid).schema for sid in reg.versions("Click")}
    out = df.select(
        "w",
        from_confluent_avro(
            F.col("data"), reader, reg.id_by_name("Click"), writer_schemas=writers
        ).alias("p"),
    )
    return {r.w: r.p for r in out.collect()}


def test_latest_reader_decodes_all_writer_versions(spark):
    """Reader=V4 over a topic spanning all four writer versions: rename via
    alias (v1-v3 wrote `url`), default fill (v1 lacked `region`), and
    int->long / float->double promotion, in one pass."""
    reg = LocalSchemaRegistry()
    got = _decode_all(spark, reg, V4)
    assert got["w1"].asDict() == {
        "href": "a.com", "n": 1, "score": 1.5, "region": "eu"
    }
    assert got["w2"].asDict() == {
        "href": "b.com", "n": 2, "score": 2.5, "region": "us"
    }
    assert got["w3"].asDict() == {
        "href": "c.com", "n": 3, "score": 3.5, "region": "ap"
    }
    assert got["w4"].asDict() == {
        "href": "d.com", "n": 4, "score": 4.5, "region": "sa"
    }


def test_intermediate_reader_projects_both_directions(spark):
    """Reader=V3 sees older frames (default fill) AND newer frames (the v4
    writer renamed url->href; V3's `url` field must NOT silently match)."""
    reg = LocalSchemaRegistry()
    # V3's url has no alias for href, so the v4 frame cannot supply it and
    # url has no default -> loud error, not a silent null
    with pytest.raises(Exception, match="url"):
        _decode_all(spark, reg, V3)


def test_v3_reader_with_back_alias_accepts_renamed_frames(spark):
    """The forward-compat fix for the rename: the OLD reader gains the
    alias to the NEW name (aliases work in either direction)."""
    reg = LocalSchemaRegistry()
    v3_aliased = {
        "type": "record",
        "name": "Click",
        "fields": [
            {"name": "url", "type": "string", "aliases": ["href"]},
            {"name": "n", "type": "int"},
            {"name": "score", "type": "float"},
            {"name": "region", "type": "string", "default": "eu"},
        ],
    }
    got = _decode_all(spark, reg, v3_aliased)
    assert got["w4"].url == "d.com"
    assert got["w1"].url == "a.com" and got["w1"].region == "eu"
    # v1's legacy field is discarded by every later reader
    assert "legacy" not in got["w1"].asDict()


def test_field_remove_discards_without_error(spark):
    """Reader=V4 never sees v1/v2's `legacy` value — field-remove is a
    clean projection, not an error, and no stale key leaks through."""
    reg = LocalSchemaRegistry()
    got = _decode_all(spark, reg, V4)
    for w in ("w1", "w2", "w3", "w4"):
        assert set(got[w].asDict()) == {"href", "n", "score", "region"}


def test_promotion_precision(spark):
    """int->long and float->double must preserve exact values including
    ones that exercise the 32-bit boundary on the long side."""
    reg = LocalSchemaRegistry()
    sid1 = reg.register(V1)
    big = 2**31 - 1  # max int the v1 writer can carry
    rows = [
        (
            "edge",
            frame(
                sid1,
                RecordCodec(V1).encode(
                    {"url": "e.com", "n": big, "score": 0.5, "legacy": "z"}
                ),
            ),
        )
    ]
    reg.register(V2), reg.register(V3)
    sid4 = reg.register(V4)
    df = spark.createDataFrame(rows, "w string, data binary")
    writers = {sid: reg.codec_by_id(sid).schema for sid in reg.versions("Click")}
    out = df.select(
        from_confluent_avro(F.col("data"), V4, sid4, writer_schemas=writers).alias("p")
    ).first()
    assert out.p.n == big
    assert out.p.score == 0.5  # 0.5 is exact in float32 -> survives widening
