"""AEAD encryption for event payloads (C1–C3)."""

from event_store_spark.crypto.aead import EventEncryptor, build_aad

__all__ = ["EventEncryptor", "build_aad"]
