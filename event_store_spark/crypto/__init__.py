"""AEAD encryption for event payloads (C1–C3)."""

from event_store_spark.crypto.aead import (
    CachingKeyResolver,
    EventEncryptor,
    InMemoryKeyResolver,
    KeyResolver,
    build_aad,
)

__all__ = [
    "CachingKeyResolver",
    "EventEncryptor",
    "InMemoryKeyResolver",
    "KeyResolver",
    "build_aad",
]
