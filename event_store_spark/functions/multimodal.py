"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: media lives in an opaque
``binary`` column (or object-store pointers) with typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each partition streams through Python once,
in bounded batches, with an explicit output schema.

The decode step is STUBBED — image/audio codecs are not available in this
environment — behind :func:`decode_media`, which produces a deterministic
fake (seeded by content bytes) so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested. Swap
``decode_media`` for PIL/ffmpeg in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature-extraction stage
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, sha256 string, "
    "width int, height int, n_frames int"
)


def decode_media(content: bytes, media_type: str) -> dict:
    """STUB decoder — deterministic fake dimensions derived from content.

    Real deployments replace this with PIL / torchaudio / ffmpeg. Raises
    for unknown media types, mirroring a codec-not-found failure mode.
    """
    if media_type not in ("image/fake", "audio/fake", "video/fake"):
        raise NotImplementedError(
            f"no codec for {media_type!r} (decode is stubbed in this environment)"
        )
    digest = hashlib.sha256(content).digest()
    return {
        "width": digest[0] % 64 + 1,
        "height": digest[1] % 64 + 1,
        "n_frames": (digest[2] % 16 + 1) if media_type == "video/fake" else 1,
    }


def attach_binary(docs: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Fixture helper: wrap document text as an opaque binary media column."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.lit(media_type).alias("media_type"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (one Python pass/partition).

    The worker calls :func:`decode_media` (importable on executors via
    ensure_shipped) — THE swap point for a real codec — so an unknown
    media type raises the codec-not-found error instead of silently
    producing fake features, and the stub math exists in exactly one
    place.
    """

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        from event_store_spark.functions.multimodal import decode_media as _decode

        for pdf in batches:
            rows = []
            for doc_id, content, mt in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                raw = bytes(content)
                decoded = _decode(raw, mt)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mt,
                        "n_bytes": len(raw),
                        "sha256": _hashlib.sha256(raw).hexdigest(),
                        **decoded,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "n_bytes", "sha256", "width", "height", "n_frames",
            ])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_plan(features: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize planning: target dimensions capped at ``max_dim`` preserving
    aspect ratio.

    Dimension arithmetic is pure JVM expression — only re-encoding the
    pixels would need Python (the stubbed decode stage). Emitting the plan
    separately from the decode lets the expensive pixel pass be scheduled
    (or skipped for already-small media) from cheap metadata.
    """
    g = F.greatest("width", "height")
    factor = F.when(g > max_dim, F.lit(float(max_dim)) / g).otherwise(F.lit(1.0))
    return features.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * factor).cast("int").alias("target_w"),
        F.floor(F.col("height") * factor).cast("int").alias("target_h"),
        (g > max_dim).alias("needs_resize"),
    )


def frame_sample(features: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling: explode sampled frame indices per media row.

    JVM-side (sequence + explode) — sampling *selection* needs no Python;
    only decoding the selected frames would (in the stubbed decode stage).
    """
    return features.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
