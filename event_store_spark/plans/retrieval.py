"""Retrieval-pipeline operators: two-stage retrieve→rerank and
deterministic negative sampling.

- rerank: the production retrieval shape — a cheap recall stage (LSH
  bucket scan) over-fetches candidates, an expensive precision stage
  rescores ONLY those. Here the rerank scorer is cosine over the first
  half of the embedding (a stand-in for "a different, costlier model" that
  both engines can compute exactly); the point is the composition: the
  rerank cost is bounded by the candidate count, never the corpus.

- negative sampling: contrastive training needs k negatives per anchor,
  reproducible across runs and workers. Candidates pair up inside md5
  hash buckets (equi-join — per-anchor work is bucket-sized, never corpus
  -sized) and each anchor keeps the k smallest md5(anchor|candidate) —
  coordination-free, deterministic at any parallelism, and unbiased
  w.r.t. content because the hash ignores it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from event_store_spark.functions.vectors import as_double, cosine
from event_store_spark.plans.llm import hyperplane_bucket
from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table

RECALL_K = 20  # stage-1 over-fetch
FINAL_K = 5
NEG_K = 4
NEG_BUCKETS = 16
#: target candidates per negative-sampling bucket: the adaptive modulus
#: max(NEG_BUCKETS, ceil(n/NEG_TARGET)) keeps per-anchor candidate work
#: constant as the corpus grows (round 8 — measured exponent 1.67 at 30×
#: with a fixed bucket count)
NEG_TARGET = 512


@register(
    "ann_rerank",
    oracle=f"""
    WITH bucketed AS (SELECT vec_id, embedding,
        (CASE WHEN embedding[1]  >= embedding[9]  THEN '1' ELSE '0' END ||
         CASE WHEN embedding[17] >= embedding[25] THEN '1' ELSE '0' END ||
         CASE WHEN embedding[33] >= embedding[41] THEN '1' ELSE '0' END ||
         CASE WHEN embedding[49] >= embedding[57] THEN '1' ELSE '0' END) AS bucket
        FROM embeddings),
    t AS (SELECT embedding AS tv, bucket AS tb FROM bucketed WHERE vec_id = 0),
    recall AS (SELECT b.vec_id, b.embedding, t.tv,
        ROW_NUMBER() OVER (ORDER BY
            list_sum(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE) * t.tv[i]))
            / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE) * b.embedding[i])))
             * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(t.tv[i] AS DOUBLE) * t.tv[i])))) DESC,
            b.vec_id) AS rn
        FROM bucketed b, t WHERE b.bucket = t.tb AND b.vec_id <> 0),
    rerank AS (SELECT vec_id,
        list_sum(list_transform(range(1, 33),
            i -> CAST(embedding[i] AS DOUBLE) * tv[i]))
        / (sqrt(list_sum(list_transform(range(1, 33),
            i -> CAST(embedding[i] AS DOUBLE) * embedding[i])))
         * sqrt(list_sum(list_transform(range(1, 33),
            i -> CAST(tv[i] AS DOUBLE) * tv[i])))) AS sim2
        FROM recall WHERE rn <= {RECALL_K})
    SELECT vec_id, ROUND(sim2, 4) AS sim2 FROM rerank
    ORDER BY sim2 DESC, vec_id LIMIT {FINAL_K}
    """,
)
def ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval for vec_id=0: LSH-bucket recall (top-20 by
    full-vector cosine) → rerank by a second scorer (cosine over dims
    1–32) → top-5. Stage-2 cost is O(RECALL_K), independent of corpus
    size; swap the stand-in scorer for a Pandas-UDF cross-encoder and the
    plan shape is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    bucketed = emb.withColumn("bucket", hyperplane_bucket(F.col("v")))
    target = bucketed.where(F.col("vec_id") == 0).select(
        F.col("v").alias("tv"), F.col("bucket").alias("tb")
    )
    recall = (
        bucketed.where(F.col("vec_id") != 0)
        .join(F.broadcast(target), F.col("bucket") == F.col("tb"))
        .select("vec_id", "v", "tv", cosine(F.col("v"), F.col("tv")).alias("sim1"))
        .orderBy(F.col("sim1").desc(), "vec_id")
        .limit(RECALL_K)
    )
    half = 32
    sub = lambda c: F.slice(c, 1, half)  # noqa: E731
    return (
        recall.select(
            "vec_id",
            F.round(cosine(sub(F.col("v")), sub(F.col("tv"))), 4).alias("sim2"),
        )
        .orderBy(F.col("sim2").desc(), "vec_id")
        .limit(FINAL_K)
    )


@register(
    "contrastive_negatives",
    oracle=f"""
    WITH n AS (SELECT CAST(GREATEST({NEG_BUCKETS},
                           CEIL(COUNT(*) / {NEG_TARGET}.0)) AS INTEGER)
                   AS nb
               FROM documents),
    d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
    b AS (SELECT doc_id, h,
                 CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % n.nb AS bucket
          FROM d, n),
    anchors AS (SELECT doc_id AS anchor_id, bucket FROM b
                WHERE doc_id % 50 = 0),
    pairs AS (SELECT a.anchor_id, c.doc_id AS neg_id,
                     md5(CAST(a.anchor_id AS VARCHAR) || '|'
                         || CAST(c.doc_id AS VARCHAR)) AS ph
              FROM anchors a JOIN b c
                ON a.bucket = c.bucket AND c.doc_id <> a.anchor_id),
    ranked AS (SELECT anchor_id, neg_id,
                      ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY ph, neg_id) AS rnk
               FROM pairs)
    SELECT anchor_id, neg_id, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {NEG_K}
    ORDER BY anchor_id, rnk LIMIT 500
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling: every 50th document is an
    anchor; its {NEG_K} negatives are the same-hash-bucket documents with
    the smallest md5(anchor|candidate).

    Pair enumeration happens INSIDE md5 buckets (equi-join on the
    bucket), and — round 8 — the bucket count GROWS WITH THE CORPUS:
    buckets = max({NEG_BUCKETS}, ⌈n/{NEG_TARGET}⌉), the adaptive_planes
    rule applied here, with the corpus count riding the plan as a
    broadcast one-row aggregate (no driver count() job). A fixed bucket
    count made per-anchor candidates grow with n and the pair stage
    quadratic — measured exponent 1.67 at the 30× corpus (PERF.md); the
    adaptive modulus pins candidates-per-anchor at ~{NEG_TARGET}, so
    pair work is O(#anchors · {NEG_TARGET}) — linear. The bucket hash
    reads 4 md5 hex chars (domain 65,536) so the modulus has headroom;
    the oracle computes the identical count-dependent modulus, keeping
    both engines in lockstep at every scale. Per-anchor rank is a window
    partitioned by anchor. Reproducible at any parallelism: nothing
    depends on row order or RNG state — the property a training pipeline
    needs to re-materialize identical batches."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    nb = d.agg(
        F.greatest(
            F.lit(NEG_BUCKETS),
            F.ceil(F.count(F.lit(1)) / NEG_TARGET).cast("int"),
        ).alias("_nb")
    )
    b = d.crossJoin(F.broadcast(nb)).select(
        "doc_id",
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("int") % F.col("_nb")).alias(
            "bucket"
        ),
    )
    anchors = b.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("anchor_id"), "bucket"
    )
    pairs = anchors.join(b, "bucket").where(F.col("doc_id") != F.col("anchor_id"))
    ranked = pairs.select(
        "anchor_id",
        F.col("doc_id").alias("neg_id"),
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ).alias("ph"),
    ).withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("anchor_id").orderBy("ph", "neg_id")
        ).cast("bigint"),
    )
    return (
        ranked.where(F.col("rnk") <= NEG_K)
        .select("anchor_id", "neg_id", "rnk")
        .orderBy("anchor_id", "rnk")
        .limit(500)
    )
