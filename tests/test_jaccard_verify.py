"""plans.jaccard.exact_jaccard: the bounded-payload verify (VERDICT r8
#2) — hard-path ≡ easy-path exactness, prune soundness, and the
registered callers' plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_store_spark.plans import QUERIES
from event_store_spark.plans.jaccard import exact_jaccard
from event_store_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _pairs(spark):
    """A deterministic candidate set: consecutive-id pairs plus a few
    far pairs — includes true near-dups and clear non-dups."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = docs.select(F.col("doc_id").alias("d1"))
    return (
        a.withColumn("d2", F.col("d1") + 1)
        .unionByName(a.withColumn("d2", F.col("d1") + 37))
        .join(docs.select(F.col("doc_id").alias("d2")), "d2", "left_semi")
        .where(F.col("d1") % 3 == 0)
    )


def test_hard_path_equals_easy_path(spark):
    """Forcing k below every doc's gram count routes ALL pairs through
    the inverted-index row re-check; k above every count routes all
    through the sketch intersect. Identical (n_a, n_b, inter, jac) per
    pair pins the hard path's exactness (fixture docs have ≤ 98 distinct
    grams, so k=16 vs k=4096 splits the paths completely); a middling k
    exercises the mixed union too."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pairs = _pairs(spark)

    def snap(k):
        out = exact_jaccard(docs, pairs, "d1", "d2", k=k)
        return sorted(
            (r["d1"], r["d2"], r["n_a"], r["n_b"], r["inter"],
             round(r["jac"], 10))
            for r in out.collect()
        )

    easy, mixed, hard = snap(4096), snap(60), snap(16)
    assert easy and easy == hard == mixed
    assert any(r[4] > 0 for r in easy)  # some pair really intersects


def test_min_jaccard_prune_drops_nothing_qualifying(spark):
    """The size-ratio prune only removes pairs that cannot reach the
    threshold: filtered full output == pruned output."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pairs = _pairs(spark)
    full = exact_jaccard(docs, pairs, "d1", "d2")
    pruned = exact_jaccard(docs, pairs, "d1", "d2", min_jaccard=0.5)
    want = sorted(
        (r["d1"], r["d2"], round(r["jac"], 10))
        for r in full.where(F.col("jac") >= 0.5).collect()
    )
    got = sorted(
        (r["d1"], r["d2"], round(r["jac"], 10))
        for r in pruned.where(F.col("jac") >= 0.5).collect()
    )
    assert got == want


def test_verify_callers_scan_the_persisted_sketch_table(spark):
    """dedup_incremental and dedup_minhash_verified verify against the
    PERSISTED (doc_id, _n, _sk) side table — the executed plan scans it
    (the _sk sketch column appears; the tokenize+slice happened at write
    time) and the full-gram-array join payload is gone."""
    for name in ("dedup_incremental", "dedup_minhash_verified"):
        plan = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "_sk" in plan, name
        assert "CartesianProduct" not in plan, name
