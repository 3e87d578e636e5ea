"""Training-pipeline operators, round 5: epoch shuffling and the
actionable near-dup keep-list.

Same design rules as the rest of plans/: built-in Catalyst expressions,
every registered query DuckDB-oracle-checked, no global single-partition
stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table

EPOCH_SEED = 7  # fixture seed for the registered query (callers pass their own)


def epoch_shuffle(df: DataFrame, seed: int, id_cols: list[str]) -> DataFrame:
    """Deterministic epoch-wide shuffle: a pseudo-random total order from
    md5(seed || id), materialized WITHOUT a global sort bottleneck.

    The dataloader op every epoch of large-scale training needs: same seed
    -> identical permutation on any cluster layout (hash order is a pure
    function of the data); different seed -> an independent permutation.

    Scale: `repartitionByRange` on the hash samples range bounds (one
    lightweight pass) and gives disjoint, ORDERED partition ranges;
    `sortWithinPartitions` then yields a globally ordered dataset without
    ever collecting it to one partition — reading partitions in index
    order IS the permutation. A `Window.orderBy(hash)` row_number would
    move the corpus through a single partition (the classic mistake this
    operator exists to avoid).
    """
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols]))
    return (
        df.withColumn("_shuffle_key", h)
        .repartitionByRange("_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
    )


@register(
    "epoch_shuffle_head",
    oracle=f"""
    SELECT doc_id, md5('{EPOCH_SEED}|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
)
def epoch_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 documents of the seed-{EPOCH_SEED} epoch permutation.

    The registered probe uses orderBy(limit) — Spark plans a TakeOrdered
    (per-partition top-k + k-way driver merge), never a global sort — and
    pins the hash order byte-for-byte against the oracle, which pins the
    full `epoch_shuffle` operator's order too (same key expression; the
    operator itself is permutation-property-tested in
    tests/test_pipeline4.py since its output is corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws("|", F.lit(str(EPOCH_SEED)), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", h.alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(100)
    )


def _register_dedup_minhash_survivors():
    from event_store_spark.plans.llm import LSH_BAND, N_MINHASH

    oracle = f"""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                 FROM documents),
    sh AS (SELECT doc_id,
                  UNNEST(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM tok),
    mh AS (SELECT doc_id, seed,
                  MIN(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
           FROM sh, (SELECT UNNEST(range({N_MINHASH})) AS seed) seeds
           GROUP BY doc_id, seed),
    sig AS (SELECT doc_id, seed // {LSH_BAND} AS band,
                   string_agg(mh, ',' ORDER BY seed) AS bandkey
            FROM mh GROUP BY doc_id, seed // {LSH_BAND}),
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             FROM sig a JOIN sig b
               ON a.band = b.band AND a.bandkey = b.bandkey
              AND a.doc_id < b.doc_id),
    edges AS (SELECT d1 AS src, d2 AS dst FROM cand
              UNION ALL SELECT d2, d1 FROM cand),
    reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src)
        SELECT a, MIN(b) AS cluster FROM r GROUP BY a)
    SELECT CAST(cluster AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(COUNT(*) - 1 AS BIGINT) AS dropped
    FROM reach GROUP BY cluster
    ORDER BY cluster_size DESC, keep_id LIMIT 100
    """

    @register("dedup_minhash_survivors", oracle=oracle)
    def dedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The ACTIONABLE near-dup dedup output: one kept document per
        MinHash-CC cluster (min doc_id = the component label itself) with
        the cluster size and how many copies a curation pass would drop —
        the keep-list a 100 TB dedup job actually materializes, not just
        the statistics (`dedup_minhash_clusters` reports those).

        Reuses the memoized candidate build + the checkpointed
        large-star/small-star components; one extra hash aggregate over
        the label table. The cluster label IS the min id (connected
        components' invariant), so no survivors join is needed.
        """
        from event_store_spark.plans.llm import minhash_cc_labels

        labels = minhash_cc_labels(spark, sf_dir)
        return (
            labels.groupBy(F.col("cluster").alias("keep_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
            .select(
                F.col("keep_id").cast("bigint"),
                "cluster_size",
                (F.col("cluster_size") - 1).cast("bigint").alias("dropped"),
            )
            .orderBy(F.col("cluster_size").desc(), "keep_id")
            .limit(100)
        )


_register_dedup_minhash_survivors()
