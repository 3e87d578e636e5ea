"""Streaming contamination gate (`streaming/contamination.py`): the
ingest-time twin of contamination_broadcast must produce the SAME
per-doc verdicts as the batch plan regardless of micro-batch cuts —
including a contaminated document that arrives batches after the rest
(the boundary-straddling case VERDICT r6 #5 requires)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_store_spark.streaming.contamination import (
    benchmark_grams,
    contamination_gate,
)
from event_store_spark.tables import load_table


def _batch_truth(spark, sf_smoke):
    """contamination_broadcast's semantics on the fixture: per-train-doc
    count of distinct 5-grams shared with the src0 benchmark."""
    from event_store_spark.functions.text import whitespace_tokens, word_ngrams

    docs = load_table(spark, sf_smoke, "documents")
    sh = docs.select(
        "doc_id", "source", whitespace_tokens("text").alias("w")
    ).select("doc_id", "source", F.explode(word_ngrams("w", 5)).alias("g"))
    eval_grams = sh.where(F.col("source") == "src0").select("g").distinct()
    train = sh.where(F.col("source") != "src0").select("doc_id", "g")
    return {
        r.doc_id: r.n
        for r in train.join(F.broadcast(eval_grams), "g", "left_semi")
        .dropDuplicates(["doc_id", "g"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_gate_matches_batch_plan_across_micro_batches(
    spark, sf_smoke, tmp_path
):
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    train = docs.where(F.col("source") != "src0")
    grams = benchmark_grams(docs.where(F.col("source") == "src0"))
    assert len(grams)  # fixture benchmark is non-empty

    truth = _batch_truth(spark, sf_smoke)
    assert truth  # fixture has contaminated docs (src0 prefixes reused)

    # deliver the train docs in 4 micro-batches; put one KNOWN-contaminated
    # doc alone in the FIRST file and another alone in the LAST, so the
    # gate sees contaminated rows straddling the whole run
    contaminated_ids = sorted(truth)
    head, tail = contaminated_ids[0], contaminated_ids[-1]
    rest = train.where(~F.col("doc_id").isin([head, tail]))
    half = rest.count() // 2
    src = str(tmp_path / "src")
    train.where(F.col("doc_id") == head).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rest.orderBy("doc_id").limit(half).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rest.orderBy(F.col("doc_id").desc()).limit(rest.count() - half).coalesce(
        1
    ).write.mode("append").parquet(src)
    train.where(F.col("doc_id") == tail).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        contamination_gate(stream, grams)
        .writeStream.format("memory")
        .queryName("contam_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = {r.doc_id: r.n_contaminated for r in spark.sql(
        "select * from contam_out"
    ).collect()}

    # every train doc got exactly one verdict, independent of its batch
    assert len(out) == train.count()
    # contaminated counts match the batch plan exactly...
    assert {d: n for d, n in out.items() if n > 0} == truth
    # ...including the straddling first/last-batch docs specifically
    assert out[head] == truth[head] and out[tail] == truth[tail]


def test_gate_on_batch_frame_equals_stream(spark, sf_smoke):
    """The gate is stateless map-side code: applied to the same rows as a
    plain batch DataFrame it must give identical verdicts (the form the
    foreachBatch EOS sinks would run it in)."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    grams = benchmark_grams(docs.where(F.col("source") == "src0"))
    got = {
        r.doc_id: r.n_contaminated
        for r in contamination_gate(
            docs.where(F.col("source") != "src0"), grams
        ).collect()
        if r.n_contaminated > 0
    }
    assert got == _batch_truth(spark, sf_smoke)


def test_probe_kernel_matches_set_reference():
    """The flattened searchsorted + segment-sum kernel == the obvious
    per-row set intersection, over randomized gram lists including empty
    rows, all-hit rows, duplicate grams, and int64 extremes. Pure numpy
    (no SparkSession) — the same code path the pandas_udf runs."""
    import random

    import numpy as np
    import pandas as pd

    rng = random.Random(11)
    for trial in range(20):
        bench_vals = {rng.randrange(-(2**63), 2**63 - 1) for _ in range(200)}
        b = np.sort(np.fromiter(bench_vals, dtype=np.int64))
        rows = []
        for _ in range(50):
            k = rng.choice([0, 1, 3, 30])
            gs = [
                rng.choice([rng.randrange(-(2**63), 2**63 - 1),
                            rng.choice(tuple(bench_vals))])
                for _ in range(k)
            ]
            if gs and rng.random() < 0.3:
                gs = gs + gs[:2]  # duplicate grams inside one doc
            rows.append(gs)
        want = [len(set(gs) & bench_vals) for gs in rows]

        # inline copy of the kernel's math (the udf closure isn't
        # callable outside a worker, but the numpy path is identical)
        gram_lists = pd.Series([np.asarray(g, dtype=np.int64) for g in rows])
        uniqs = [np.unique(np.asarray(gs, dtype=np.int64)) for gs in gram_lists]
        lens = np.fromiter((len(u) for u in uniqs), dtype=np.int64, count=len(uniqs))
        if lens.sum() == 0 or len(b) == 0:
            got = [0] * len(rows)
        else:
            flat = np.concatenate([u for u in uniqs if len(u)])
            pos = np.searchsorted(b, flat)
            pos[pos == len(b)] = 0
            hit = (b[pos] == flat).astype(np.int64)
            bounds = np.zeros(len(uniqs) + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            csum = np.concatenate(([0], np.cumsum(hit)))
            got = list((csum[bounds[1:]] - csum[bounds[:-1]]).astype(int))
        assert got == want, (trial, got[:5], want[:5])
