"""Multimodal plumbing: binary columns, stubbed decode, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from event_store_spark.functions.multimodal import (
    attach_binary,
    decode_media,
    extract_features,
    frame_sample,
)
from event_store_spark.tables import load_table


def test_decode_stub_deterministic():
    meta = decode_media(b"some-bytes", "image/fake")
    assert meta == decode_media(b"some-bytes", "image/fake")
    assert 1 <= meta["width"] <= 64 and meta["n_frames"] == 1
    video = decode_media(b"some-bytes", "video/fake")
    assert video["n_frames"] >= 1


def test_decode_unknown_codec_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"x", "image/png")


def test_extract_features_schema_and_values(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(5)
    media = attach_binary(docs, "video/fake")
    feats = extract_features(media)
    rows = {r.doc_id: r for r in feats.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert rows.keys() == src.keys()
    for doc_id, r in rows.items():
        raw = src[doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.sha256 == hashlib.sha256(raw).hexdigest()
        assert 1 <= r.width <= 64 and 1 <= r.n_frames <= 16


def test_frame_sample_indices(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(10)
    feats = extract_features(attach_binary(docs, "video/fake"))
    sampled = frame_sample(feats, every_n=4)
    per_doc = {
        r.doc_id: r.cnt
        for r in sampled.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()
    }
    n_frames = {r.doc_id: r.n_frames for r in feats.collect()}
    for doc_id, cnt in per_doc.items():
        assert cnt == (n_frames[doc_id] + 3) // 4  # ceil(n/4) sampled frames


# ---------------------------------------------------------------- real codecs


def _ppm(w, h, px):
    """Encode a (h, w, 3) uint8 array as binary PPM (P6) with a comment."""
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + px.tobytes()


def _pgm(w, h, px):
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


def _bmp24(px):
    """Encode a (h, w, 3) uint8 RGB array as bottom-up 24-bit BI_RGB BMP."""
    import struct

    h, w, _ = px.shape
    row = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        line = px[r, :, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row - len(line))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(header) + info + bytes(body)


def _px(w, h, ch=3, seed=1):
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint16).astype("uint8")
    return a


def test_real_ppm_pgm_bmp_roundtrip():
    """The pure-numpy codecs decode REAL rasters: header dims exact and
    the pixel pass reproduces the encoded array byte-for-byte."""
    import numpy as np

    from event_store_spark.functions.multimodal import decode_pixels

    px = _px(5, 3)
    assert decode_media(_ppm(5, 3, px), "image/x-portable-pixmap") == {
        "width": 5, "height": 3, "n_frames": 1,
    }
    assert np.array_equal(decode_pixels(_ppm(5, 3, px), "image/x-portable-pixmap"), px)

    g = _px(4, 2, ch=1, seed=2)
    assert decode_media(_pgm(4, 2, g), "image/x-portable-graymap") == {
        "width": 4, "height": 2, "n_frames": 1,
    }
    assert np.array_equal(decode_pixels(_pgm(4, 2, g), "image/x-portable-graymap"), g)

    # BMP with a width that forces row padding (5*3=15 -> padded to 16)
    b = _px(5, 4, seed=3)
    assert decode_media(_bmp24(b), "image/bmp") == {
        "width": 5, "height": 4, "n_frames": 1,
    }
    assert np.array_equal(decode_pixels(_bmp24(b), "image/bmp"), b)


def test_real_ppm_flows_through_feature_and_resize_plumbing(spark):
    """VERDICT r9 #7 pin: a NON-fake media type flows end-to-end through
    extract_features -> resize_plan with dimensions read from the actual
    file header, not the hash stub."""
    import numpy as np

    from event_store_spark.functions.multimodal import resize_plan

    big = _ppm(48, 12, _px(48, 12, seed=4))
    small = _ppm(8, 6, _px(8, 6, seed=5))
    media = spark.createDataFrame(
        [(1, bytearray(big), "image/x-portable-pixmap"),
         (2, bytearray(small), "image/x-portable-pixmap")],
        "doc_id bigint, content binary, media_type string",
    )
    feats = extract_features(media)
    rows = {r.doc_id: r for r in feats.collect()}
    assert (rows[1].width, rows[1].height) == (48, 12)
    assert (rows[2].width, rows[2].height) == (8, 6)
    assert rows[1].sha256 == hashlib.sha256(big).hexdigest()
    plan = {r.doc_id: r for r in resize_plan(feats, max_dim=32).collect()}
    assert plan[1].needs_resize and (plan[1].target_w, plan[1].target_h) == (32, 8)
    assert not plan[2].needs_resize and (plan[2].target_w, plan[2].target_h) == (8, 6)


def test_real_codec_rejects_malformed_and_unsupported():
    with pytest.raises(ValueError, match="netpbm"):
        decode_media(b"P3\n1 1\n255\n0 0 0", "image/x-portable-pixmap")
    with pytest.raises(NotImplementedError, match="24-bit"):
        import struct

        hdr = (b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0))
        decode_media(hdr, "image/bmp")
    with pytest.raises(NotImplementedError, match="pixel codec"):
        from event_store_spark.functions.multimodal import decode_pixels

        decode_pixels(b"x", "image/fake")
