"""Streaming benchmark-contamination gate (VERDICT r6 #5).

The ingest-time twin of `plans.pipeline4.contamination_broadcast`: the
batch plan decontaminates an EXISTING corpus by broadcasting the
benchmark's distinct n-grams and semi-joining the corpus map-side; this
gate applies the same test to documents AS THEY ARRIVE, so contaminated
text never lands in the training corpus at all.

Physical shape, matched to the batch plan's scale argument:

- The benchmark side is small by nature (a held-out eval set); its
  distinct grams are computed once, collected once, and shipped to every
  executor as a `SparkContext.broadcast` frozen set — the same
  runtime-filter role the batch plan's `F.broadcast(eval_grams)` plays,
  with exact membership instead of a Bloom false-positive rate.
- The probe is PER-ROW and STATELESS: a document's grams are wholly
  contained in its row, so the per-doc distinct-contaminated-gram count
  needs no cross-batch state, no shuffle, and no output-mode/watermark
  machinery — every micro-batch is gated map-side in one narrow stage
  (an Arrow-batched pandas set-probe; a JVM join would force a per-batch
  shuffle or a stream-static join + stateful agg for the same answer).
- Batching is invisible by construction: any micro-batch cut of the
  same rows yields the same per-doc verdicts (pinned across 3+ cuts,
  including a contaminated doc arriving batches after the rest, by
  tests/test_streaming_contamination.py).

At 100 TB of arriving text the gate's cost is one tokenize + set-probe
per document on the ingest path — the decontamination plan you want,
since the corpus never crosses the network for the check.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: n-gram order shared with the batch contamination family
CONTAM_NGRAM = 5


def benchmark_grams(eval_docs: DataFrame, n: int = CONTAM_NGRAM) -> set:
    """Distinct word n-grams of the benchmark corpus, as a driver-side
    frozen set. ONE bounded collect: the eval set is small by nature —
    if it were not, training data IS the benchmark (the batch plan's
    broadcast makes the identical assumption)."""
    from event_store_spark.functions.text import whitespace_tokens, word_ngrams

    rows = (
        eval_docs.select(whitespace_tokens("text").alias("w"))
        .select(F.explode(word_ngrams("w", n)).alias("g"))
        .distinct()
        .collect()
    )
    return frozenset(r.g for r in rows)


def contamination_gate(
    docs_stream: DataFrame, grams: set, n: int = CONTAM_NGRAM
) -> DataFrame:
    """Gate a document stream against a broadcast benchmark-gram set.

    Returns a stream of ``(doc_id, source, n_contaminated)`` where
    ``n_contaminated`` counts the doc's DISTINCT grams that appear in
    the benchmark — the same number `contamination_broadcast` computes
    via dropDuplicates + count (a doc with 0 is clean and passes the
    gate; the caller routes on the column). Works identically on a
    batch DataFrame, which is what the batch==streaming pin exploits."""
    from event_store_spark.functions.text import whitespace_tokens, word_ngrams
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    spark = docs_stream.sparkSession
    bc = spark.sparkContext.broadcast(grams)

    @F.pandas_udf("int")
    def n_contam(gram_lists: pd.Series) -> pd.Series:
        bench = bc.value
        return gram_lists.apply(
            lambda gs: sum(1 for g in set(gs) if g in bench)
        )

    return (
        docs_stream.select(
            "doc_id", "source", whitespace_tokens("text").alias("w")
        )
        .select(
            "doc_id",
            "source",
            n_contam(word_ngrams("w", n)).alias("n_contaminated"),
        )
    )
