"""duplicate_spans + ann_sq8_topk (plans/pipeline5.py).

Oracle parity at sf0.01 is covered by test_oracle_parity; these tests pin
the SEMANTICS on constructed inputs where the right answer is computable
by hand — interval-union arithmetic, quantization round-trip bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _spans_on(spark, rows):
    """Run the duplicate_spans pipeline on an in-memory documents table."""
    from unittest import mock

    import event_store_spark.plans.pipeline5 as p5

    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(p5, "load_table", lambda s, d, n: docs):
        return {
            r.doc_id: r.asDict()
            for r in p5.duplicate_spans(spark, "ignored").collect()
        }


def test_duplicate_spans_interval_union(spark):
    """Two docs sharing one 10-token run: every start position of the run's
    three 8-gram windows is duplicated, and the union must count 10 tokens
    once — not 3 × 8 = 24."""
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(10))),
        (2, " ".join(f"b{i}" for i in range(10)) + " " + shared),
        (3, " ".join(f"c{i}" for i in range(20))),  # no duplication
    ]
    got = _spans_on(spark, rows)
    assert set(got) == {1, 2}
    assert got[1]["covered_tokens"] == 10 and got[1]["n_tokens"] == 20
    assert got[2]["covered_tokens"] == 10 and got[2]["n_tokens"] == 20
    assert got[1]["coverage_bp"] == 5000


def test_duplicate_spans_disjoint_and_overlapping_runs(spark):
    """A doc duplicating two DISJOINT 8-token runs counts both fully;
    within-doc repetition alone (same gram twice in ONE doc) is not
    cross-document duplication and contributes nothing."""
    run1 = " ".join(f"x{i}" for i in range(8))
    run2 = " ".join(f"y{i}" for i in range(8))
    filler = " ".join(f"f{i}" for i in range(8))
    rows = [
        (1, f"{run1} {filler} {run2}"),
        (2, run1),
        (3, run2),
        # doc 4 repeats its own 8-gram twice, shared with no one
        (4, " ".join(f"z{i}" for i in range(8)) + " " + " ".join(f"z{i}" for i in range(8))),
    ]
    got = _spans_on(spark, rows)
    assert got[1]["covered_tokens"] == 16
    assert got[2]["covered_tokens"] == 8
    assert got[3]["covered_tokens"] == 8
    assert 4 not in got


def test_sq8_reconstruction_error_bound(spark, sf_correct):
    """Quantize→reconstruct must land within half a quantization step of
    the original in every dimension: |x − r| ≤ (mx−mn)/255/2 (+ float→
    double noise). This pins the arithmetic (a sign slip or off-by-one in
    the ±128 shift violates the bound immediately)."""
    from event_store_spark.functions.vectors import as_double
    from event_store_spark.tables import load_table

    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    lims = (
        emb.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "mn", "mx"))).alias("s"))
        .select(
            F.transform("s", lambda e: e["mn"]).alias("mns"),
            F.transform("s", lambda e: e["mx"]).alias("mxs"),
        )
    )
    checked = (
        emb.crossJoin(F.broadcast(lims))
        .select(
            F.expr(
                """
                aggregate(sequence(0, size(v) - 1), true, (ok, i) -> ok AND (
                  CASE WHEN mxs[i] = mns[i] THEN v[i] = mns[i]
                       ELSE abs(v[i] - (
                         (CAST(CAST(FLOOR((v[i] - mns[i]) * 255.0D
                              / (mxs[i] - mns[i]) + 0.5D) - 128 AS TINYINT)
                              AS DOUBLE) + 128.0D)
                         * (mxs[i] - mns[i]) / 255.0D + mns[i]))
                        <= (mxs[i] - mns[i]) / 255.0D * 0.5000001D
                  END))
                """
            ).alias("ok")
        )
        .agg(F.min("ok").alias("all_ok"))
        .collect()
    )
    assert checked[0].all_ok is True


def test_sq8_topk_close_to_exact_topk(spark, sf_correct):
    """SQ8 is lossy but 8 bits/dim keeps cosine ranks stable on this
    corpus: the quantized top-5 must overlap the exact top-5 by ≥ 3."""
    from event_store_spark.plans import QUERIES

    exact = {r.vec_id for r in QUERIES["q33"](spark, sf_correct).collect()}
    sq8 = {r.vec_id for r in QUERIES["ann_sq8_topk"](spark, sf_correct).collect()}
    assert len(exact & sq8) >= 3


def test_interval_union_fold_matches_bruteforce(spark):
    """The r6 collect_list+aggregate-fold interval union must equal the
    brute-force union length on adversarial position sets: duplicates,
    nested overlaps, exact-tangent spans, big gaps, unsorted input."""
    from pyspark.sql import functions as F

    from event_store_spark.plans import pipeline5 as p5

    cases = [
        [0],
        [0, 1, 2, 3],                 # chained overlaps
        [0, 8, 16],                   # exactly tangent
        [0, 0, 0],                    # duplicates
        [5, 3, 40, 41, 3, 100],       # unsorted + dup + gaps
        [0, 2, 4, 6, 30, 31, 32, 59],
        list(range(0, 100, 7)),
    ]
    span = p5.SPAN_TOKENS

    def brute(ps):
        covered = set()
        for p in ps:
            covered.update(range(p, p + span))
        return len(covered)

    df = spark.createDataFrame(
        [(i, ps) for i, ps in enumerate(cases)], "doc_id int, ps array<int>"
    )
    union_len = F.expr(
        f"""aggregate(
              sort_array(ps),
              named_struct('cov', 0L, 'e', 0L),
              (acc, p) -> named_struct(
                  'cov', acc.cov + greatest(0L, CAST(p AS BIGINT)
                          + {span}L - greatest(CAST(p AS BIGINT), acc.e)),
                  'e', greatest(acc.e, CAST(p AS BIGINT) + {span}L)),
              acc -> acc.cov)"""
    )
    got = {r.doc_id: r.c for r in df.select("doc_id", union_len.alias("c")).collect()}
    want = {i: brute(ps) for i, ps in enumerate(cases)}
    assert got == want
