"""Property tests for text_winnowing's fingerprint selection.

The registered plan selects, per document, the set of minimum 4-gram
values over every 5-gram-window (computed by the doubled sliding-min
m2/m4/w5 expressions). Two properties make that trustworthy beyond the
oracle fixtures:

1. the doubling decomposition equals the brute-force per-window min —
   for ANY token sequence (the m4-overlap trick is easy to get wrong
   off by one);
2. the winnowing DETECTION GUARANTEE (Schleimer/Wilkerson/Aiken §3):
   any two documents sharing a verbatim token run of length
   ≥ K + W − 1 (= 8) share at least one selected fingerprint — the
   whole reason the scheme admits bounded fingerprint density.

Both run against a pure-Python reference of the exact plan arithmetic
(struct grams = token tuples; tuple order is the plan's comparison
order); one Spark case pins the plan to the reference on real fixture
documents so the reference cannot drift from the shipped expressions.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from event_store_spark.plans.pipeline11 import WIN_K, WIN_W

VOCAB = ["a", "b", "ab", "ba", "x1", "zz", "q"]


def grams_of(tokens: list[str]) -> list[tuple[str, ...]]:
    return [
        tuple(tokens[i : i + WIN_K]) for i in range(len(tokens) - WIN_K + 1)
    ]


def select_doubled(tokens: list[str]) -> set[tuple[str, ...]]:
    """The plan's m2/m4/w5 doubling, verbatim in Python."""
    g = grams_of(tokens)
    if len(g) < WIN_W:
        return set()
    m2 = [min(g[i], g[i + 1]) for i in range(len(g) - 1)]
    m4 = [min(m2[i], m2[i + 2]) for i in range(len(m2) - 2)]
    w5 = [min(m4[i], m4[i + 1]) for i in range(len(m4) - 1)]
    return set(w5)


def select_brute(tokens: list[str]) -> set[tuple[str, ...]]:
    g = grams_of(tokens)
    return {
        min(g[i : i + WIN_W]) for i in range(len(g) - WIN_W + 1)
    }


tokens_st = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(tokens_st)
def test_doubling_equals_brute_force(tokens):
    assert select_doubled(tokens) == select_brute(tokens)


@settings(max_examples=200, deadline=None)
@given(
    prefix_a=tokens_st,
    suffix_a=tokens_st,
    prefix_b=tokens_st,
    suffix_b=tokens_st,
    shared=st.lists(
        st.sampled_from(VOCAB), min_size=WIN_K + WIN_W - 1, max_size=16
    ),
)
def test_detection_guarantee(prefix_a, suffix_a, prefix_b, suffix_b, shared):
    """A verbatim shared run of >= K+W-1 tokens ⇒ >= 1 shared selected
    fingerprint, wherever the run is embedded in either document."""
    doc_a = prefix_a + shared + suffix_a
    doc_b = prefix_b + shared + suffix_b
    assert select_doubled(doc_a) & select_doubled(doc_b)


def test_plan_matches_reference(spark):
    """The shipped Spark expressions select exactly the reference's
    fingerprint sets on real fixture documents."""
    from pyspark.sql import functions as F

    from event_store_spark.functions.text import whitespace_tokens
    from event_store_spark.plans import pipeline11 as p11
    from event_store_spark.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", whitespace_tokens("text").alias("w"))
        .where(F.size("w") >= WIN_K + WIN_W - 1)
        .limit(50)
    )
    gram_expr = (
        "transform(sequence(0, size(w) - {k}), i -> struct({fields}))".format(
            k=WIN_K,
            fields=", ".join(f"w[i+{j}] AS t{j}" for j in range(WIN_K)),
        )
    )
    lvl = (
        docs.select("doc_id", "w", F.expr(gram_expr).alias("gr"))
        .withColumn(
            "m2",
            F.expr("transform(sequence(0, size(gr) - 2), i -> least(gr[i], gr[i+1]))"),
        )
        .withColumn(
            "m4",
            F.expr("transform(sequence(0, size(m2) - 3), i -> least(m2[i], m2[i+2]))"),
        )
        .withColumn(
            "w5",
            F.expr("transform(sequence(0, size(m4) - 2), i -> least(m4[i], m4[i+1]))"),
        )
    )
    got = {}
    want = {}
    for r in lvl.select("doc_id", "w", "w5").collect():
        got[r["doc_id"]] = {tuple(f) for f in r["w5"]}
        want[r["doc_id"]] = select_doubled(list(r["w"]))
    assert got == want and len(got) > 0


def test_ingest_wf_column_matches_query_time_selection(spark):
    """The side table's winnow-at-ingest `wf` column (r12) must hold
    exactly the xxhash64 of the same distinct grams the query-time
    `winnow_fingerprints` selection picks — the two formulations share
    the K=4/W=5 string-min contract and may never drift."""
    from pyspark.sql import functions as F

    from event_store_spark.plans.pipeline11 import winnow_fingerprints
    from event_store_spark.plans.tokenized import tokenized_projection
    from event_store_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    want = {
        (r["doc_id"], r["h"])
        for r in winnow_fingerprints(docs)
        .select(
            "doc_id",
            F.xxhash64("f.t0", "f.t1", "f.t2", "f.t3").alias("h"),
        )
        .collect()
    }
    got = {
        (r["doc_id"], r["h"])
        for r in tokenized_projection(docs)
        .select("doc_id", F.explode("wf").alias("h"))
        .collect()
    }
    assert got == want and len(got) > 0
