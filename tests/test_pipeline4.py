"""epoch_shuffle + dedup_minhash_survivors (plans/pipeline4.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_store_spark.plans.pipeline4 import epoch_shuffle
from event_store_spark.tables import load_table


def _order(df):
    """Global order as materialized: partition index, then position."""
    return [
        r.doc_id
        for r in df.select("doc_id", F.spark_partition_id().alias("_p"))
        .withColumn("_pos", F.monotonically_increasing_id())
        .orderBy("_p", "_pos")
        .collect()
    ]


def test_epoch_shuffle_is_deterministic_permutation(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    a = _order(epoch_shuffle(docs, 7, ["doc_id"]))
    b = _order(epoch_shuffle(docs, 7, ["doc_id"]))
    assert a == b  # same seed -> identical permutation
    assert sorted(a) == sorted(r.doc_id for r in docs.collect())  # a permutation
    c = _order(epoch_shuffle(docs, 8, ["doc_id"]))
    assert sorted(c) == sorted(a)
    assert c != a  # different seed -> different permutation


def test_epoch_shuffle_matches_hash_order(spark, sf_smoke):
    """The materialized partition-major order IS ascending hash order —
    i.e. range partitioning + within-partition sort produced a true
    global sort without a single-partition stage."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    shuffled = epoch_shuffle(docs, 7, ["doc_id"])
    got = _order(shuffled)
    want = [
        r.doc_id
        for r in docs.select(
            "doc_id",
            F.md5(
                F.concat(
                    F.lit("7|"),
                    F.length(F.col("doc_id").cast("string")).cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("h"),
        )
        .orderBy("h")
        .collect()
    ]
    assert got == want


def test_epoch_shuffle_plan_has_no_single_partition_sort(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    plan = epoch_shuffle(docs, 7, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    # range partitioning, not a global Sort over SinglePartition
    assert "rangepartitioning" in plan.lower()
    assert "singlepartition" not in plan.lower()


def test_epoch_shuffle_key_injective_and_guards(spark):
    """Netstring segments: ('x|y','z') and ('x','y|z') must NOT collide;
    NULL ids and a pre-existing _shuffle_key column fail loudly; output
    columns equal input columns (internal key dropped)."""
    import pytest

    df = spark.createDataFrame([("x|y", "z"), ("x", "y|z")], "a string, b string")
    out = epoch_shuffle(df, 7, ["a", "b"])
    assert out.columns == ["a", "b"]
    rows = {(r.a, r.b) for r in out.collect()}
    assert rows == {("x|y", "z"), ("x", "y|z")}  # both survive, distinct keys

    nulled = spark.createDataFrame([("x", None)], "a string, b string")
    with pytest.raises(Exception, match="NULL"):
        epoch_shuffle(nulled, 7, ["a", "b"]).collect()

    clashing = spark.createDataFrame([("x",)], "_shuffle_key string")
    with pytest.raises(ValueError, match="_shuffle_key"):
        epoch_shuffle(clashing, 7, ["_shuffle_key"])


def test_interleave_sources_prefix_respects_weights(spark, sf_smoke):
    """In any prefix of the interleaved stream, a weight-w source appears
    ~w times as often as a weight-1 source (stride scheduling contract),
    and per-source documents appear in rn order."""
    from event_store_spark.plans import QUERIES

    rows = QUERIES["interleave_sources"](spark, sf_smoke).collect()
    assert len(rows) == 200
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.rn)
    for src, rns in by_source.items():
        assert rns == sorted(rns), src  # emitted in per-source order
        assert rns == list(range(1, len(rns) + 1)), src  # no skips
    # weight groups: sources with N%3==2 (weight 3) must appear about 3x
    # as often as N%3==0 (weight 1) in the prefix
    def weight(src):
        return int(src[3:]) % 3 + 1
    counts = {w: [] for w in (1, 2, 3)}
    for src, rns in by_source.items():
        counts[weight(src)].append(len(rns))
    assert all(counts[w] for w in (1, 2, 3)), (
        f"fixture must cover every weight class in the prefix; got {counts}"
    )
    avg = {w: sum(v) / len(v) for w, v in counts.items()}
    assert avg[3] > avg[2] > avg[1]
    assert 2.0 <= avg[3] / avg[1] <= 4.0  # ~3x, tolerant of edge truncation
