"""Streaming benchmark-contamination gate (VERDICT r6 #5).

The ingest-time twin of `plans.pipeline4.contamination_broadcast`: the
batch plan decontaminates an EXISTING corpus by broadcasting the
benchmark's distinct n-grams and semi-joining the corpus map-side; this
gate applies the same test to documents AS THEY ARRIVE, so contaminated
text never lands in the training corpus at all.

Physical shape, matched to the batch plan's scale argument:

- Grams travel as xxhash64 longs (the `contamination_ngram` convention —
  the gram is only a membership key that never reaches the output;
  equality of hashes ⇔ equality of grams up to 2^-64 collisions), so the
  JVM side ships 8-byte longs across Arrow instead of ~40-byte strings.
- The benchmark side is small by nature (a held-out eval set); its
  distinct gram hashes are computed once, collected once, and shipped to
  every executor as a SORTED int64 array behind a
  `SparkContext.broadcast` — the same runtime-filter role the batch
  plan's `F.broadcast(eval_grams)` plays, with exact membership instead
  of a Bloom false-positive rate.
- The probe is PER-ROW and STATELESS: a document's grams are wholly
  contained in its row, so the per-doc distinct-contaminated-gram count
  needs no cross-batch state, no shuffle, and no output-mode/watermark
  machinery — every micro-batch is gated map-side in one narrow stage.
  Inside the Arrow batch the membership test is one flattened
  `searchsorted` + segment-sum for the WHOLE batch (three C calls).
  Measured honestly (PERF.md "ingest path"): at the 10× corpus the gate
  runs ~6-8k docs/s on local[32] and is dominated by tokenize + 5-gram
  construction, not the probe — a string-frozenset probe measured the
  same wall-clock there. The hashed form is still the right scale shape:
  ~5× less Arrow payload (8-byte longs vs ~40-byte gram strings) and an
  O(log n) probe that stays flat when the benchmark-gram set grows far
  beyond this fixture's 123k.
- Batching is invisible by construction: any micro-batch cut of the
  same rows yields the same per-doc verdicts (pinned across 3+ cuts,
  including a contaminated doc arriving batches after the rest, by
  tests/test_streaming_contamination.py).

At 100 TB of arriving text the gate's cost is one tokenize + hashed
set-probe per document on the ingest path — the decontamination plan you
want, since the corpus never crosses the network for the check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module scope: pandas_udf type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: n-gram order shared with the batch contamination family
CONTAM_NGRAM = 5


def benchmark_grams(eval_docs: DataFrame, n: int = CONTAM_NGRAM) -> "np.ndarray":
    """Distinct word n-gram HASHES of the benchmark corpus, as a sorted
    driver-side int64 array. ONE bounded collect: the eval set is small
    by nature — if it were not, training data IS the benchmark (the
    batch plan's broadcast makes the identical assumption)."""
    from event_store_spark.functions.text import (
        whitespace_tokens,
        word_ngram_hashes,
    )

    rows = (
        eval_docs.select(whitespace_tokens("text").alias("w"))
        .select(F.explode(word_ngram_hashes("w", n)).alias("g"))
        .distinct()
        .collect()
    )
    return np.sort(np.fromiter((r.g for r in rows), dtype=np.int64, count=len(rows)))


def contamination_gate(
    docs_stream: DataFrame, grams: "np.ndarray", n: int = CONTAM_NGRAM
) -> DataFrame:
    """Gate a document stream against a broadcast benchmark-gram set.

    Returns a stream of ``(doc_id, source, n_contaminated)`` where
    ``n_contaminated`` counts the doc's DISTINCT grams that appear in
    the benchmark — the same number `contamination_broadcast` computes
    via dropDuplicates + count (a doc with 0 is clean and passes the
    gate; the caller routes on the column). Works identically on a
    batch DataFrame, which is what the batch==streaming pin exploits."""
    from event_store_spark.functions.text import (
        whitespace_tokens,
        word_ngram_hashes,
    )
    from event_store_spark.shipping import ensure_shipped

    ensure_shipped()
    spark = docs_stream.sparkSession
    bench = np.ascontiguousarray(np.asarray(grams, dtype=np.int64))
    bc = spark.sparkContext.broadcast(bench)

    @F.pandas_udf("int")
    def n_contam(gram_lists: pd.Series) -> pd.Series:
        b = bc.value
        # ONE flattened membership pass for the whole Arrow batch:
        # per-row np.isin would re-sort the benchmark array every call
        # (measured 457 docs/s at the 10x corpus); flatten + one
        # searchsorted + segment-sum runs the same test in three C calls
        # for the batch (measured ~100x faster).
        uniqs = [
            np.unique(np.asarray(gs, dtype=np.int64)) for gs in gram_lists
        ]
        lens = np.fromiter((len(u) for u in uniqs), dtype=np.int64, count=len(uniqs))
        if lens.sum() == 0 or len(b) == 0:
            return pd.Series(np.zeros(len(gram_lists), dtype=np.int32))
        flat = np.concatenate([u for u in uniqs if len(u)])
        pos = np.searchsorted(b, flat)
        pos[pos == len(b)] = 0
        hit = (b[pos] == flat).astype(np.int64)
        bounds = np.zeros(len(uniqs) + 1, dtype=np.int64)
        np.cumsum(lens, out=bounds[1:])
        csum = np.concatenate(([0], np.cumsum(hit)))
        out = (csum[bounds[1:]] - csum[bounds[:-1]]).astype(np.int32)
        return pd.Series(out)

    return (
        docs_stream.select(
            "doc_id", "source", whitespace_tokens("text").alias("w")
        )
        .select(
            "doc_id",
            "source",
            n_contam(word_ngram_hashes("w", n)).alias("n_contaminated"),
        )
    )
