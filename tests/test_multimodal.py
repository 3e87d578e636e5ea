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
