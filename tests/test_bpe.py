"""BPE training operator (operators/bpe.py + plans/pipeline7.py).

Oracle parity at sf0.01 pins the 3-round registered query; these pin the
merge semantics against a from-first-principles Python BPE on adversarial
and random corpora — including the overlap cases where greedy
left-to-right merging is the defined behavior ('a a a' + (a,a) -> 'aa a').
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from event_store_spark.operators.bpe import bpe_train, merge_pair


def _ref_merge(tokens: list[str], t1: str, t2: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == t1 and tokens[i + 1] == t2:
            out.append(t1 + t2)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _ref_bpe(corpus: list[list[str]], k: int):
    merges = []
    cur = [list(t) for t in corpus]
    for _ in range(k):
        counts: dict = {}
        for toks in cur:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (t1, t2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((t1, t2, cnt))
        cur = [_ref_merge(t, t1, t2) for t in cur]
    return merges, cur


def _spark_tokens(spark, corpus):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id bigint, w array<string>"
    )


def test_merge_pair_greedy_overlap_cases(spark):
    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        (["b", "a", "b"], "a", "b", ["b", "ab"]),
        (["a", "a", "b"], "a", "b", ["a", "ab"]),
        ([], "a", "b", []),
        (["x"], "a", "b", ["x"]),
    ]
    df = spark.createDataFrame(
        [(i, w) for i, (w, *_rest) in enumerate(cases)], "i bigint, w array<string>"
    )
    for i, (w, t1, t2, want) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(merge_pair(F.col("w"), F.lit(t1), F.lit(t2)).alias("m"))
            .first()
            .m
        )
        assert got == want, (w, t1, t2, got, want)


def test_bpe_train_matches_reference_on_random_corpora(spark):
    rng = random.Random(11)
    for trial in range(4):
        corpus = [
            [rng.choice("ab c d".split()) for _ in range(rng.randint(0, 12))]
            for _ in range(15)
        ]
        k = 6  # crosses the CHECKPOINT_EVERY=4 boundary
        want_merges, want_tokens = _ref_bpe(corpus, k)
        got_merges, got_df = bpe_train(_spark_tokens(spark, corpus), k)
        assert got_merges == want_merges, trial
        got_tokens = {
            r.doc_id: list(r.w) for r in got_df.orderBy("doc_id").collect()
        }
        assert [got_tokens[i] for i in range(len(corpus))] == want_tokens, trial


def test_bpe_train_stops_when_no_pairs_remain(spark):
    corpus = [["x", "y"]]  # one merge possible, then singleton docs only
    merges, after = bpe_train(_spark_tokens(spark, corpus), 5)
    assert [m[:2] for m in merges] == [("x", "y")]
    assert after.first().w == ["xy"]


def test_bpe_merged_symbols_compound_across_rounds(spark):
    """Round 2 must treat round 1's merged symbol as one token: 'a b c'
    corpus where (a,b) wins round 1 and (ab,c) wins round 2."""
    corpus = [["a", "b", "c"]] * 3 + [["a", "b"]]
    merges, after = bpe_train(_spark_tokens(spark, corpus), 2)
    assert [m[:2] for m in merges] == [("a", "b"), ("ab", "c")]
    assert after.where(F.col("doc_id") == 0).first().w == ["abc"]
