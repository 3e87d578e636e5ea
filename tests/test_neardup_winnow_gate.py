"""Streaming winnow near-dup gate: exact sequential semantics, EOS, and
the real writeStream path.

Exact parity is pinned by driving the gate's foreachBatch function
directly with a known batch order (what Structured Streaming does, with
delivery order made explicit) against an independent pure-Python
sequential reference built on the property-tested fingerprint selector.
The real `readStream`→`writeStream` path is then exercised end-to-end
with availableNow, checking the order-independent invariants plus
checkpoint-replay and crash-redelivery idempotence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_store_spark.plans.dedup_index import (
    WINNOW_MAX_FP_DOCS,
    DedupIndex,
)
from event_store_spark.plans.pipeline11 import MIN_SHARED
from event_store_spark.streaming.neardup_winnow import WinnowDedupGate
from event_store_spark.tables import load_table
from tests.test_winnowing_properties import select_doubled

SF = "/root/testdata/sf0.001"
BASE_SRC = ("src2", "src3")  # arriving slice; the rest is the index corpus


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    return (
        docs.where(~F.col("source").isin(*BASE_SRC)),
        docs.where(F.col("source").isin(*BASE_SRC)).orderBy("doc_id"),
    )


def _py_fps(rows):
    """doc_id -> fingerprint set via the property-tested reference."""
    return {
        r["doc_id"]: select_doubled(r["text"].split()) for r in rows
    }


def _reference_admitted(index_rows, arriving_rows, batch_cuts):
    """Sequential fold: index fps stoplisted at build; admitted batch
    fps join unfiltered (compact re-enforces later); within a batch the
    LOWER id wins; earlier batches win over later ones."""
    from collections import Counter

    idx_fps = _py_fps(index_rows)
    occ = Counter(f for fps in idx_fps.values() for f in fps)
    indexed = [
        {f for f in fps if occ[f] <= WINNOW_MAX_FP_DOCS}
        for fps in idx_fps.values()
    ]
    arr_fps = _py_fps(arriving_rows)
    admitted = []
    for batch in batch_cuts:
        survivors = []
        for doc_id in batch:  # ascending ids within the batch
            fps = arr_fps[doc_id]
            dup = any(
                len(fps & other) >= MIN_SHARED for other in indexed
            ) or any(
                len(fps & arr_fps[s]) >= MIN_SHARED for s in survivors
            )
            if not dup:
                survivors.append(doc_id)
        for s in survivors:
            indexed.append(arr_fps[s])
            admitted.append(s)
    return sorted(admitted)


def test_gate_matches_sequential_reference_and_redelivery(
    spark, corpus, tmp_path
):
    index_docs, arriving = corpus
    idx = DedupIndex.build(spark, index_docs, str(tmp_path / "ix"), "winnow")
    gate = WinnowDedupGate(
        idx, str(tmp_path / "out"), str(tmp_path / "gate.json")
    )
    fn = gate.foreach_batch()

    rows = arriving.collect()
    ids = [r["doc_id"] for r in rows]
    cuts = [ids[:20], ids[20:35], ids[35:]]
    for bid, cut in enumerate(cuts):
        fn(arriving.where(F.col("doc_id").isin(cut)), bid)

    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            str(tmp_path / "out" / "batch-*")
        ).collect()
    )
    want = _reference_admitted(index_docs.collect(), rows, cuts)
    assert got == want
    assert 0 < len(got) < len(ids)  # the gate really dropped something

    # ledger short-circuit: redelivering an old batch id is a no-op
    before = sorted(os.listdir(tmp_path / "ix"))
    fn(arriving.where(F.col("doc_id").isin(cuts[0])), 0)
    assert sorted(os.listdir(tmp_path / "ix")) == before

    # crash-redelivery of the LAST batch (ledger rolled back): outputs
    # and signature rows are rewritten byte-idempotently, not duplicated
    n_sig = idx.signatures().count()
    gate._commit("winnow-gate", 1)
    fn(arriving.where(F.col("doc_id").isin(cuts[2])), 2)
    assert idx.signatures().count() == n_sig
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out" / "batch-*")).collect()
    ) == want

    # compaction folds the batch segments and preserves every verdict:
    # a copy of an admitted doc probes as its duplicate afterwards
    idx.compact()
    assert not [
        d for d in os.listdir(tmp_path / "ix") if d.startswith("segment")
    ]
    copy = arriving.where(F.col("doc_id") == got[0]).withColumn(
        "doc_id", F.lit(10_000_000).cast("bigint")
    )
    hits = idx.probe(copy).collect()
    assert any(r["match_doc_id"] == got[0] for r in hits)


def test_gate_through_real_stream(spark, corpus, tmp_path):
    index_docs, arriving = corpus
    idx = DedupIndex.build(spark, index_docs, str(tmp_path / "ix"), "winnow")
    gate = WinnowDedupGate(
        idx, str(tmp_path / "out"), str(tmp_path / "gate.json")
    )
    src = str(tmp_path / "src")
    for i, lo in enumerate(range(0, 50, 17)):
        ids = [r["doc_id"] for r in arriving.collect()][lo : lo + 17]
        arriving.where(F.col("doc_id").isin(ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"part{i}"))

    def run():
        q = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/part*")
            .writeStream.foreachBatch(gate.foreach_batch())
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    run()
    admitted = spark.read.parquet(str(tmp_path / "out" / "batch-*"))
    got = sorted(r["doc_id"] for r in admitted.collect())
    assert got and len(got) < 50
    assert len(got) == len(set(got))  # no doc admitted twice

    # every admitted doc, probed as a fresh copy, is now caught; and a
    # checkpoint replay of the same source changes nothing
    copy = admitted.limit(1).withColumn(
        "doc_id", F.lit(10_000_001).cast("bigint")
    )
    assert idx.probe(copy).count() >= 1
    before = got
    run()
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out" / "batch-*")).collect()
    ) == before
