"""BPE tokenizer training as an iterative Spark plan.

Byte-pair-encoding training is the canonical iterative corpus algorithm a
training-data pipeline runs: k rounds of (count adjacent symbol pairs →
take the most frequent → merge it corpus-wide). Each round is the
word-count shape (`plans.pipeline5.bpe_pair_counts`) plus a corpus-wide
map; this module supplies the full loop with the two disciplines every
iterative Spark algorithm needs (per `operators.graph`):

- O(1) driver state per round: only the winning pair (two strings + a
  count) is collected — never token data;
- lineage control: the token table is localCheckpoint()ed on a fixed
  cadence so round r's plan does not replay rounds 1..r-1 (the
  uncheckpointed chain is the classic iterative-Spark failure mode).

Merge semantics are the standard greedy left-to-right non-overlapping
pass, implemented as a Catalyst `aggregate` fold over each token array —
pure codegen, no UDF. Ties on count break by (t1, t2) ascending so the
learned merge table is deterministic across engines and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: checkpoint the token table every N merge rounds
CHECKPOINT_EVERY = 4


def adjacent_pairs(w: str = "w") -> Column:
    """Exploded-ready array of (t1, t2) structs for each adjacent pair of
    the named token-array column."""
    if not w.replace("_", "").isalnum():
        raise ValueError(f"adjacent_pairs needs a plain column name, got {w!r}")
    # guard: slice errors on negative length, so docs with < 2 tokens
    # yield an explicit empty pair list
    return F.expr(
        f"CASE WHEN size({w}) < 2 THEN CAST(array() AS array<struct<t1:string,t2:string>>)"
        f" ELSE transform(slice({w}, 1, size({w}) - 1),"
        f" (x, i) -> struct(x AS t1, {w}[i + 1] AS t2)) END"
    )


def merge_pair(w: Column, t1: Column, t2: Column) -> Column:
    """Greedy left-to-right merge of adjacent (t1, t2) into t1||t2 —
    exactly the non-overlapping greedy pass a string `replace` performs,
    which is what the SQL oracle uses.

    Two execution strategies, picked per row on the scalar t1 = t2 test:

    - t1 ≠ t2 (the overwhelmingly common case): consecutive matches can
      never overlap (an overlap at i, i+1 needs w[i+1] to be both t2 and
      t1), so every position is decided independently — a vectorized
      transform (merge-start → merged symbol, consumed second element →
      NULL, else keep) + filter. O(n) per doc, no array re-allocation.
    - t1 = t2 (runs like 'a a a'): matches chain, so greedy pairing
      depends on run parity; the sequential `aggregate` fold handles it.
      The fold re-allocates the accumulator per element (O(n²) copying)
      — acceptable because a self-pair argmax is rare and the fold is
      the only Catalyst-expressible sequential scan.

    Both branches were measured: the fold alone costs ~7x the positional
    pass at sf0.1 (PERF.md round-5 continuation)."""
    merged = F.concat(t1, t2)
    fold = F.aggregate(
        w,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == t1)
            & (x == t2),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    n = F.size(w)
    positional = F.filter(
        F.transform(
            w,
            lambda x, i: F.when(
                (x == t1) & (i < n - 1) & (F.element_at(w, i + 2) == t2),
                merged,
            )
            .when(
                (x == t2) & (i > 0) & (F.element_at(w, i) == t1),
                F.lit(None).cast("string"),
            )
            .otherwise(x),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(t1 == t2, fold).otherwise(positional)


def bpe_train(tokens: DataFrame, k: int, w_col: str = "w") -> tuple[list, DataFrame]:
    """Learn k BPE merges over a token-array column.

    Returns ``(merges, tokens_after)`` where merges is a list of
    ``(t1, t2, count)`` in learned order and tokens_after carries the
    corpus with all k merges applied. Stops early (shorter list) when no
    adjacent pair remains.

    Per round: one shuffle (pair hash-agg with map-side partials), one
    O(1) TakeOrdered collect for the argmax, one map-side fold over the
    corpus. Token lineage is localCheckpoint()ed every
    ``CHECKPOINT_EVERY`` rounds, so plan depth is bounded regardless of
    k."""
    cur = tokens
    merges: list[tuple[str, str, int]] = []
    for r in range(k):
        pairs = cur.select(F.explode(adjacent_pairs(w_col)).alias("p")).select(
            "p.t1", "p.t2"
        )
        top = (
            pairs.groupBy("t1", "t2")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "t1", "t2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        t1, t2, cnt = top[0].t1, top[0].t2, int(top[0].cnt)
        merges.append((t1, t2, cnt))
        cur = cur.withColumn(
            w_col, merge_pair(F.col(w_col), F.lit(t1), F.lit(t2))
        )
        if (r + 1) % CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur
