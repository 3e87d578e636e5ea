"""Property-based tests (hypothesis) for the Avro codec — round-trip laws
hold for arbitrary inputs, not just the golden vectors."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from event_store_spark.avro.codec import (
    RecordCodec,
    decode_long,
    decode_map_bytes,
    encode_long,
    encode_map_bytes,
    frame,
    unframe,
)

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
keys = st.text(min_size=0, max_size=20)
blobs = st.binary(min_size=0, max_size=64)


@given(longs)
@settings(max_examples=200)
def test_long_roundtrip(n):
    assert decode_long(io.BytesIO(encode_long(n))) == n


@given(st.dictionaries(keys, blobs, max_size=8))
@settings(max_examples=100)
def test_map_roundtrip_and_canonical(d):
    enc = encode_map_bytes(d)
    out = decode_map_bytes(enc)
    assert out == d
    from event_store_spark.avro.codec import java_string_order

    # stored order is canonical JAVA order (UTF-16 units, TreeMap parity —
    # diverges from Python's code-point sort only above the BMP)
    assert list(out) == sorted(d, key=java_string_order)
    # canonical: same bytes regardless of insertion order
    assert enc == encode_map_bytes(dict(sorted(d.items(), reverse=True)))


@given(st.integers(min_value=0, max_value=2**31 - 1), blobs)
@settings(max_examples=100)
def test_frame_roundtrip(sid, body):
    assert unframe(frame(sid, body)) == (sid, body)


record_schema = {
    "type": "record",
    "name": "Prop",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
    ],
}


@given(
    st.text(max_size=50),
    longs,
    st.floats(allow_nan=False, allow_infinity=False),
    blobs,
    st.none() | longs,
)
@settings(max_examples=100)
def test_record_roundtrip(s, n, d, b, opt):
    codec = RecordCodec(record_schema)
    rec = {"s": s, "n": n, "d": d, "b": b, "opt": opt}
    assert codec.decode(codec.encode(rec)) == rec


@given(
    st.lists(
        st.tuples(
            st.text(max_size=30),
            longs,
            st.floats(allow_nan=False, allow_infinity=False),
            st.none() | st.binary(max_size=32),
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_decode_stream_over_back_to_back_records(rows):
    """`RecordCodec.decode_stream` must walk records written back-to-back
    with NO per-record framing (the Object Container File block layout)
    and leave the cursor exactly at each boundary — a one-byte drift on
    any field type corrupts every later record in the block."""
    import io

    from event_store_spark.avro.codec import RecordCodec

    schema = {
        "type": "record",
        "name": "t.Block",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": ["null", "bytes"]},
        ],
    }
    rc = RecordCodec(schema)
    recs = [{"s": s, "n": n, "d": d, "b": b} for s, n, d, b in rows]
    blob = b"".join(rc.encode(r) for r in recs)
    buf = io.BytesIO(blob)
    got = [rc.decode_stream(buf) for _ in recs]
    assert buf.read() == b""  # cursor landed exactly at the end
    assert got == recs
