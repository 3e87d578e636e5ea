"""Selective release of memoized per-session caches (VERDICT r10 #1a).

Every index/side-table build in plans/ follows one memo idiom: a
module-level ``WeakKeyDictionary[SparkSession, dict[key, artifact]]``
whose artifacts are (possibly cached) DataFrames or tuples containing
them. A long benchmark suite that runs 45+ queries in ONE JVM therefore
accumulates every family's cached index in the same unified memory pool,
and a late heavy query (triangle_count's 13.6 GB exchange at the 100×
point) executes under memory pressure a real deployment would never
have — r10 measured 223.6 s in-suite vs 139.8 s standalone for the
identical plan.

This module gives the benchmark a fence: snapshot the memo state right
after the shared write-path artifacts are materialized (typed events,
tokenized docs, gram sets, minhash signatures, postings — the
ingest-billed keep-set), then before each declared-heavy query drop and
unpersist every memo entry that appeared SINCE the snapshot. The
keep-set artifacts survive (their accounting is ingest, not the query);
everything else rebuilds on demand, exactly as it would in a fresh
session — so in-suite measurements match standalone ones.

Discovery is structural (scan imported event_store_spark modules for
WeakKeyDictionary attributes) rather than a hand-maintained registry, so
a new plan family's memo is fenced automatically.
"""

from __future__ import annotations

import sys
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession


def _iter_memos():
    """(module_name, attr_name, memo) for every module-level
    WeakKeyDictionary in an imported event_store_spark module."""
    for name, mod in list(sys.modules.items()):
        if not name.startswith("event_store_spark") or mod is None:
            continue
        for attr, val in list(vars(mod).items()):
            if isinstance(val, WeakKeyDictionary):
                yield name, attr, val


def _unpersist_value(val) -> None:
    """Unpersist any DataFrame reachable one level deep in a memo value
    (values are DataFrames, (centroids, DataFrame) tuples, etc.)."""
    if isinstance(val, DataFrame):
        val.unpersist(blocking=False)
        return
    if isinstance(val, (tuple, list)):
        for item in val:
            if isinstance(item, DataFrame):
                item.unpersist(blocking=False)


def memo_snapshot(spark: SparkSession) -> dict:
    """{(module, attr): frozenset(entry keys)} for this session — the
    keep-set boundary. Take it right after materializing the shared
    ingest artifacts."""
    snap = {}
    for mod_name, attr, memo in _iter_memos():
        store = memo.get(spark)
        if isinstance(store, dict):
            snap[(mod_name, attr)] = frozenset(store.keys())
    return snap


def release_query_caches(spark: SparkSession, keep: dict | None = None) -> int:
    """Drop (and unpersist) every memo entry NOT present in the ``keep``
    snapshot. Returns the number of entries released. Entries rebuild
    lazily on next use — semantics are unchanged, only residency is."""
    keep = keep or {}
    released = 0
    for mod_name, attr, memo in _iter_memos():
        store = memo.get(spark)
        if not isinstance(store, dict):
            continue
        kept_keys = keep.get((mod_name, attr), frozenset())
        for key in [k for k in store if k not in kept_keys]:
            _unpersist_value(store.pop(key))
            released += 1
    return released
