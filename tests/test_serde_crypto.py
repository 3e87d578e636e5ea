"""Avro codec / Confluent framing / AEAD crypto semantics.

Mirrors (by behavior): MetadataSerializerTest.java:42-77 (canonical sort),
PostgresEventStoreIT golden round-trips, EventEncryptorIT.java:140-230 and
EncryptedPostgresEventStoreIT.java:188-228 (AAD + tamper detection).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from event_store_spark.avro import (
    LocalSchemaRegistry,
    RecordCodec,
    decode_map_bytes,
    encode_map_bytes,
    frame,
    unframe,
)
from event_store_spark.avro.codec import decode_long, encode_long
from event_store_spark.avro.spark import from_confluent_avro, to_confluent_avro
from event_store_spark.crypto import EventEncryptor, build_aad

TEST_SCHEMA = {
    "type": "record",
    "name": "TestPayload",
    "fields": [{"name": "text", "type": "string"}],
}


# ---------------------------------------------------------------- codec

def test_zigzag_long_roundtrip():
    import io

    for n in (0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO(encode_long(n))
        assert decode_long(buf) == n


def test_map_bytes_golden_and_canonical_order():
    # {"k": b"v"} → count 1, "k", b"v", terminator — Avro spec golden bytes
    assert encode_map_bytes({"k": b"v"}) == b"\x02\x02k\x02v\x00"
    assert encode_map_bytes({}) == b"\x00"
    assert encode_map_bytes(None) == b"\x00"
    # canonical: keys sorted regardless of insertion order
    a = encode_map_bytes({"zTest": b"z", "bTest": b"123", "dTest": b"meta"})
    b = encode_map_bytes({"bTest": b"123", "dTest": b"meta", "zTest": b"z"})
    assert a == b
    assert list(decode_map_bytes(a)) == ["bTest", "dTest", "zTest"]


def test_map_bytes_rejects_non_bytes():
    with pytest.raises(TypeError):
        encode_map_bytes({"a": "not-bytes"})


def test_record_codec_roundtrip():
    schema = {
        "type": "record",
        "name": "AllTypes",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
            {"name": "opt", "type": ["null", "string"]},
        ],
    }
    codec = RecordCodec(schema)
    rec = {"s": "hé", "l": -42, "d": 2.5, "b": True, "raw": b"\x00\xff", "opt": None}
    assert codec.decode(codec.encode(rec)) == rec
    rec2 = dict(rec, opt="present")
    assert codec.decode(codec.encode(rec2)) == rec2


def test_confluent_framing():
    body = b"avro-body"
    framed = frame(7, body)
    assert framed[:1] == b"\x00" and struct.unpack(">i", framed[1:5])[0] == 7
    assert unframe(framed) == (7, body)
    with pytest.raises(ValueError, match="magic"):
        unframe(b"\x01xxxxxx")


def test_registry_record_name_strategy(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path / "registry.json"))
    sid = reg.register(TEST_SCHEMA)
    sid2 = reg.register({"type": "record", "name": "Other", "fields": []})
    assert sid != sid2
    assert reg.register(TEST_SCHEMA) == sid  # same record name → same subject
    data = reg.serialize("TestPayload", {"text": "hello"})
    assert unframe(data)[0] == sid
    assert reg.deserialize(data) == ("TestPayload", {"text": "hello"})
    # persisted across instances
    reg2 = LocalSchemaRegistry(str(tmp_path / "registry.json"))
    assert reg2.deserialize(data) == ("TestPayload", {"text": "hello"})


# ---------------------------------------------------------------- crypto

def test_aad_layout_golden():
    """AAD = key ‖ int64_be(ts_ms) ‖ canonical metadata, id/kid excluded."""
    aad = build_aad(b"key-bytes", 1736025221442, {"z": b"1", "a": b"2"})
    expected = (
        b"key-bytes"
        + struct.pack(">q", 1736025221442)
        + encode_map_bytes({"a": b"2", "z": b"1"})
    )
    assert aad == expected
    # empty metadata contributes a ZERO-LENGTH segment, not the Avro
    # empty-map terminator byte: EventEncryptor.java:139-142 serializes the
    # map only when non-empty, so the reference AAD for (key, ts, {}) is
    # exactly key ‖ int64_be(ts) and nothing else
    assert build_aad(b"k", 0, None) == b"k" + b"\x00" * 8
    assert build_aad(b"k", 0, {}) == b"k" + b"\x00" * 8
    # reserved keys never enter the AAD (EventEncryptor.java:115-137);
    # a map that becomes empty AFTER filtering is the empty case too
    assert build_aad(b"k", 1, {"id": b"9", "kid": b"u"}) == b"k" + struct.pack(">q", 1)
    assert build_aad(b"k", 1, {"id": b"9", "kid": b"u", "a": b"x"}) == build_aad(
        b"k", 1, {"a": b"x"}
    )


def test_encrypt_decrypt_and_tamper():
    enc = EventEncryptor({"kms://key1": EventEncryptor.generate_key()})
    aad = build_aad(b"k1", 1736025221442, {"m": b"v"})
    ct = enc.encrypt(b"payload", aad, "kms://key1")
    assert enc.decrypt(ct, aad, "kms://key1") == b"payload"
    from cryptography.exceptions import InvalidTag

    tampered = ct[:-1] + bytes([ct[-1] ^ 1])
    with pytest.raises(InvalidTag):
        enc.decrypt(tampered, aad, "kms://key1")
    with pytest.raises(InvalidTag):  # metadata tamper changes AAD
        enc.decrypt(ct, build_aad(b"k1", 1736025221442, {"m": b"TAMPER"}), "kms://key1")
    with pytest.raises(InvalidTag):  # timestamp tamper
        enc.decrypt(ct, build_aad(b"k1", 1736025221443, {"m": b"v"}), "kms://key1")


def test_encryptor_requires_256bit_keys():
    with pytest.raises(ValueError, match="32 bytes"):
        EventEncryptor({"kid": b"short"})


# ----------------------------------------------------- dataframe round trip

def test_dataframe_serialize_encrypt_roundtrip(spark, tmp_path):
    """Full T1→C1→(store)→C2→T2 pipeline on DataFrames: struct payload →
    Confluent Avro → AEAD encrypt → decrypt → struct, golden-compared."""
    import datetime

    from event_store_spark.core import EventStore

    reg = LocalSchemaRegistry()
    sid = reg.register(TEST_SCHEMA)
    enc = EventEncryptor({"kms://k1": EventEncryptor.generate_key()})

    ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000)
    df = spark.createDataFrame(
        [("key-1", "secret message", ts, {"mTest": bytearray(b"mv")})],
        "key string, text string, timestamp timestamp, metadata map<string,binary>",
    )
    payload = df.select(
        "key",
        "timestamp",
        "metadata",
        to_confluent_avro(F.struct("text"), TEST_SCHEMA, sid).alias("data"),
    )

    store = EventStore(spark, str(tmp_path / "store"))
    # envelope-ize first (append assigns id/lsn), then encrypt the data col
    store.append("enc_events", payload)
    raw = store.read_events("enc_events")
    encrypted = enc.encrypt_df(raw, "kms://k1")

    # at-rest ciphertext differs from plaintext and carries kid
    enc_row = encrypted.first()
    assert bytes(enc_row.metadata["kid"]) == b"kms://k1"
    plain_frame = reg.serialize("TestPayload", {"text": "secret message"})
    assert bytes(enc_row.data) != plain_frame

    decrypted = enc.decrypt_df(encrypted)
    out = decrypted.select(
        from_confluent_avro(F.col("data"), TEST_SCHEMA, sid).alias("payload"),
        "metadata",
    ).first()
    assert out.payload.text == "secret message"
    assert bytes(out.metadata["mTest"]) == b"mv"


def test_empty_metadata_aad_matches_reference_layout(spark):
    """Empty-metadata ciphertext from the DataFrame UDF decrypts against the
    reference AAD layout key ‖ int64_be(ts) with a ZERO-LENGTH metadata
    segment (EventEncryptor.java:139-142) — the default case, so this is
    what decides cross-decryptability with the reference. Also proves the
    UDF path and build_aad agree byte-for-byte on the empty case."""
    import datetime

    key = EventEncryptor.generate_key()
    enc = EventEncryptor({"kms://k1": key})
    ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000, tzinfo=datetime.timezone.utc)
    ts_ms = int(ts.timestamp() * 1000)
    df = spark.createDataFrame(
        [(bytearray(b"payload"), bytearray(b"k1"), ts.replace(tzinfo=None), None)],
        "data binary, key binary, timestamp timestamp, metadata map<string,binary>",
    )
    row = enc.encrypt_df(df, "kms://k1").first()
    # reference layout: nothing after the 8 timestamp bytes
    ref_aad = b"k1" + struct.pack(">q", ts_ms)
    assert build_aad(b"k1", ts_ms, {"kid": b"kms://k1"}) == ref_aad
    assert enc.decrypt(bytes(row.data), ref_aad, "kms://k1") == b"payload"


def test_decrypt_passthrough_without_kid(spark):
    """Rows lacking kid pass through decrypt unchanged (C2 conditional)."""
    import datetime

    enc = EventEncryptor({"kms://k1": EventEncryptor.generate_key()})
    ts = datetime.datetime(2025, 1, 4)
    df = spark.createDataFrame(
        [(bytearray(b"plain"), bytearray(b"k"), ts, None)],
        "data binary, key binary, timestamp timestamp, metadata map<string,binary>",
    )
    out = enc.decrypt_df(df).first()
    assert bytes(out.data) == b"plain"


def test_crypto_shredding_makes_rows_unreadable(spark):
    """C3 extension: destroying a key (crypto-shredding) makes exactly that
    key's rows unreadable — NULL payloads under missing_key='null', fail-fast
    under the default — while other keys' rows still decrypt, and the stored
    ciphertext is untouched."""
    import datetime

    k1, k2 = EventEncryptor.generate_key(), EventEncryptor.generate_key()
    enc = EventEncryptor({"kms://u1": k1, "kms://u2": k2})
    ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000)
    df = spark.createDataFrame(
        [(bytearray(b"a"), bytearray(b"user1-data"), ts, None),
         (bytearray(b"b"), bytearray(b"user2-data"), ts, None)],
        "key binary, data binary, timestamp timestamp, metadata map<string,binary>",
    )
    sealed = (
        enc.encrypt_df(df.where(F.col("key") == F.lit(b"a")), "kms://u1")
        .unionByName(enc.encrypt_df(df.where(F.col("key") == F.lit(b"b")), "kms://u2"))
        .cache()
    )
    sealed.count()  # pin ciphertext before the key disappears

    enc.shred("kms://u1")
    with pytest.raises(KeyError):
        enc.shred("kms://u1")  # already gone

    out = {
        bytes(r.key): (None if r.data is None else bytes(r.data))
        for r in enc.decrypt_df(sealed, missing_key="null").collect()
    }
    assert out[b"a"] is None  # shredded -> permanently unreadable
    assert out[b"b"] == b"user2-data"  # unaffected key still decrypts

    # default mode stays fail-fast on the unknown kid
    with pytest.raises(Exception):
        enc.decrypt_df(sealed).collect()

    with pytest.raises(ValueError):
        enc.decrypt_df(sealed, missing_key="ignore")


def test_map_bytes_key_order_matches_java_above_bmp():
    """Cross-engine AAD/metadata parity for non-BMP keys: Java TreeMap
    compares UTF-16 units, so a supplementary character (surrogates
    D800..) sorts BELOW a private-use BMP char (E000..) — the opposite of
    Python's code-point order."""
    from event_store_spark.avro.codec import (
        decode_map_bytes,
        encode_map_bytes,
        java_string_order,
    )

    supp, private = "\U00010000", ""
    assert sorted([supp, private]) == [private, supp]  # Python code points
    assert sorted([supp, private], key=java_string_order) == [supp, private]
    enc = encode_map_bytes({private: b"p", supp: b"s"})
    assert list(decode_map_bytes(enc)) == [supp, private]  # Java order stored


def test_encrypt_df_replaces_existing_kid(spark):
    """Re-encryption (key rotation): a metadata map already carrying a kid
    entry must not blow up map_concat's duplicate-key policy — the new kid
    replaces the old."""
    import datetime

    k1, k2 = EventEncryptor.generate_key(), EventEncryptor.generate_key()
    enc = EventEncryptor({"kms://old": k1, "kms://new": k2})
    ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000)
    df = spark.createDataFrame(
        [(bytearray(b"a"), bytearray(b"payload"), ts, None)],
        "key binary, data binary, timestamp timestamp, metadata map<string,binary>",
    )
    sealed_old = enc.encrypt_df(df, "kms://old")
    plain = enc.decrypt_df(sealed_old).select("key", "data", "timestamp", "metadata")
    sealed_new = enc.encrypt_df(plain, "kms://new")  # metadata already has kid
    row = sealed_new.first()
    assert bytes(row.metadata["kid"]) == b"kms://new"
    out = enc.decrypt_df(sealed_new).first()
    assert bytes(out.data) == b"payload"


def test_confluent_avro_nullable_long_none_roundtrip(spark):
    """Arrow turns null bigint cells into NaN; the serializer must restore
    them to Avro null (and a NULL data value decodes to a null struct —
    the shredded-row read path)."""
    schema = {
        "type": "record",
        "name": "NullableEvt",
        "fields": [
            {"name": "text", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
        ],
    }
    reg = LocalSchemaRegistry()
    sid = reg.register(schema)
    df = spark.createDataFrame(
        [("a", 7), ("b", None)], "text string, n bigint"
    )
    framed = df.select(
        "text", to_confluent_avro(F.struct("text", "n"), schema, sid).alias("data")
    )
    back = framed.select(
        "text", from_confluent_avro(F.col("data"), schema, sid).alias("p")
    ).collect()
    got = {r.text: r.p.n for r in back}
    assert got == {"a": 7, "b": None}

    # NULL data -> an ACTUAL null struct (ADVICE r4): `p IS NULL` must
    # identify crypto-shredded rows, not just a struct of null fields
    nulled = framed.withColumn(
        "data", F.when(F.col("text") == "b", F.lit(None)).otherwise(F.col("data"))
    )
    decoded = nulled.select(
        "text", from_confluent_avro(F.col("data"), schema, sid).alias("p")
    )
    back2 = decoded.collect()
    got2 = {r.text: r.p for r in back2}
    assert got2["a"] == ("a", 7)
    assert got2["b"] is None
    shredded = decoded.where(F.col("p").isNull()).collect()
    assert [r.text for r in shredded] == ["b"]


def test_salted_join_same_named_keys(spark):
    """The common case — identical key names on both sides — must not be
    an ambiguous reference."""
    from event_store_spark.functions.skew import salted_join

    left = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k bigint, l string")
    right = spark.createDataFrame([(1, "A"), (2, "B")], "k bigint, r string")
    got = {
        (r.l, r.r)
        for r in salted_join(left, right, "k", "k").select("l", "r").collect()
    }
    assert got == {("x", "A"), ("y", "A"), ("z", "B")}


def test_kms_style_key_resolver_roundtrip_and_caching(spark):
    """A pluggable KeyResolver (the reference's KMS `Aead` bean analog,
    EventEncryptor.java:86-97) drives the DataFrame path end to end; a
    CachingKeyResolver memoizes successes (one inner hit per kid), never
    caches misses, and invalidate() surfaces a KMS-side revocation."""
    import datetime

    from event_store_spark.crypto import (
        CachingKeyResolver,
        EventEncryptor,
        KeyResolver,
    )

    calls = []

    class FakeKms(KeyResolver):
        def __init__(self, keys):
            self.keys = dict(keys)

        def resolve(self, kid):
            calls.append(kid)
            return self.keys.get(kid)

    key = EventEncryptor.generate_key()
    kms = FakeKms({"kms://r1": key})
    cached = CachingKeyResolver(kms)
    enc = EventEncryptor(cached)

    # bytes API through the resolver
    aad = build_aad(b"k", 7, None)
    assert enc.decrypt(enc.encrypt(b"pt", aad, "kms://r1"), aad, "kms://r1") == b"pt"
    assert calls.count("kms://r1") == 1  # second resolve was a cache hit

    # unknown kid: driver-side fail-fast, and the miss is NOT cached
    with pytest.raises(KeyError):
        enc.encrypt(b"pt", aad, "kms://nope")
    kms.keys["kms://nope"] = EventEncryptor.generate_key()
    enc.encrypt(b"pt", aad, "kms://nope")  # rotated-in key is visible

    # DataFrame path through the same resolver
    ts = datetime.datetime(2025, 1, 4, 21, 13, 41, 442000)
    df = spark.createDataFrame(
        [(bytearray(b"payload"), bytearray(b"k"), ts, None)],
        "data binary, key binary, timestamp timestamp, metadata map<string,binary>",
    )
    sealed = enc.encrypt_df(df, "kms://r1").cache()
    sealed.count()
    out = enc.decrypt_df(sealed).first()
    assert bytes(out.data) == b"payload"

    # revocation with a cache in front: KMS delete + invalidate
    del kms.keys["kms://r1"]
    cached.invalidate("kms://r1")
    got = enc.decrypt_df(sealed, missing_key="null").first()
    assert got.data is None
    # a non-revocable resolver refuses shred() instead of lying
    with pytest.raises(TypeError, match="not revocable"):
        enc.shred("kms://r1")
