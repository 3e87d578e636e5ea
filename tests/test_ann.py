"""Multi-probe ANN semantics: probes > 1 and recall ≥ single-bucket.

The oracle-parity suite already checks ann_multiprobe_topk's values; these
tests pin the *approximation* properties the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_store_spark.plans import QUERIES


def _top5(spark, sf, name):
    return [(r["vec_id"], r["sim"]) for r in QUERIES[name](spark, sf).collect()]


def test_multiprobe_probes_five_distinct_buckets(spark, sf_correct):
    """The exploded probe set is the query bucket + its 4 Hamming-1 flips."""
    from event_store_spark.plans.llm import _emb, _flip_bit
    from event_store_spark.functions.vectors import as_double

    emb = _emb(spark, sf_correct).select("vec_id", as_double("embedding").alias("v"))
    bucket = F.concat(
        *[
            F.when(F.col("v")[p * 16] >= F.col("v")[p * 16 + 8], "1").otherwise("0")
            for p in range(4)
        ]
    )
    tb = emb.withColumn("bucket", bucket).where(F.col("vec_id") == 0).select(
        F.col("bucket").alias("tb")
    )
    probes = tb.select(
        F.explode(
            F.array(F.col("tb"), *[_flip_bit(F.col("tb"), i) for i in range(4)])
        ).alias("pb")
    )
    vals = [r["pb"] for r in probes.collect()]
    assert len(vals) == 5
    assert len(set(vals)) == 5  # all probes distinct → join needs no dedup
    home = vals[0]
    for p in vals[1:]:  # each flip is exactly Hamming distance 1 from home
        assert sum(a != b for a, b in zip(home, p)) == 1


def test_multiprobe_recall_at_least_single_bucket(spark, sf_correct):
    """Multi-probe candidates ⊇ single-bucket candidates, so its top-5 vs
    the exact q33 top-5 can only match or improve — never regress."""
    exact = {v for v, _ in _top5(spark, sf_correct, "q33")}
    single = _top5(spark, sf_correct, "ann_lsh_topk")
    multi = _top5(spark, sf_correct, "ann_multiprobe_topk")
    recall_single = len({v for v, _ in single} & exact)
    recall_multi = len({v for v, _ in multi} & exact)
    assert recall_multi >= recall_single
    # elementwise: the k-th best multiprobe sim dominates the k-th single
    for (_, s_multi), (_, s_single) in zip(multi, single):
        assert s_multi >= s_single


def test_embedding_dedup_bucket_guard_trips_on_pathological_bucket(spark):
    """A bucket larger than max_bucket fails fast inside the executed plan
    instead of silently enumerating a quadratic pair join."""
    import pytest
    from pyspark.sql import functions as F

    from event_store_spark.plans.llm import embedding_near_dup_pairs

    # 6 identical vectors → one bucket of 6 > max_bucket=5
    emb = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.lit([1.0] * 64).alias("v"),
    )
    with pytest.raises(Exception, match="max_bucket=5"):
        embedding_near_dup_pairs(emb, max_bucket=5).collect()
    # under the bound the same frame enumerates pairs normally
    ok = embedding_near_dup_pairs(emb, max_bucket=6, k=100).collect()
    assert len(ok) == 15  # C(6,2) pairs, all sim == 1.0
