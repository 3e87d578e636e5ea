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


def _netstring(col) -> "F.Column":
    """Length-prefixed string encoding (`len:value`): concatenating
    netstrings is injective, so multi-column keys cannot collide the way
    plain delimiter joins do (('x|y','z') vs ('x','y|z')). NULL ids are a
    contract violation (the permutation would silently drop the segment)
    and raise inside the executed plan."""
    s = col.cast("string")
    guarded = F.when(
        s.isNull(),
        F.raise_error(F.lit("epoch_shuffle: id column is NULL; ids must be non-null")),
    ).otherwise(s)
    return F.concat(F.length(guarded).cast("string"), F.lit(":"), guarded)


def epoch_shuffle(df: DataFrame, seed: int, id_cols: list[str]) -> DataFrame:
    """Deterministic epoch-wide shuffle: a pseudo-random total order from
    md5(seed || netstring(ids)), materialized WITHOUT a global sort
    bottleneck.

    The dataloader op every epoch of large-scale training needs: same seed
    -> identical permutation on any cluster layout (the hash order is a
    pure function of the data — id segments are length-prefixed so
    distinct id tuples can never build the same key, and NULL ids fail
    loudly); different seed -> an independent permutation.

    Scale: `repartitionByRange` on the hash samples range bounds (one
    lightweight pass) and gives disjoint, ORDERED partition ranges;
    `sortWithinPartitions` then yields a globally ordered dataset without
    ever collecting it to one partition — reading partitions in index
    order IS the permutation. A `Window.orderBy(hash)` row_number would
    move the corpus through a single partition (the classic mistake this
    operator exists to avoid). Output columns == input columns (the
    internal sort key is dropped; dropping is a projection, so the
    per-partition order it established survives).
    """
    if "_shuffle_key" in df.columns:
        raise ValueError(
            "column '_shuffle_key' collides with epoch_shuffle's internal "
            "sort key; rename it before shuffling"
        )
    h = F.md5(
        F.concat(F.lit(f"{seed}|"), *[_netstring(F.col(c)) for c in id_cols])
    )
    return (
        df.withColumn("_shuffle_key", h)
        .repartitionByRange("_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )


@register(
    "epoch_shuffle_head",
    oracle=f"""
    SELECT doc_id,
           md5('{EPOCH_SEED}|' || length(CAST(doc_id AS VARCHAR)) || ':'
               || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
)
def epoch_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 documents of the seed-{EPOCH_SEED} epoch permutation.

    The registered probe uses orderBy(limit) — Spark plans a TakeOrdered
    (per-partition top-k + k-way driver merge), never a global sort — and
    pins the hash order byte-for-byte against the oracle using the SAME
    netstring key expression as `epoch_shuffle`, so the probe pins the
    operator's order too (the operator itself is
    permutation-property-tested in tests/test_pipeline4.py since its
    output is corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat(F.lit(f"{EPOCH_SEED}|"), _netstring(F.col("doc_id")))
    )
    return (
        docs.select("doc_id", h.alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(100)
    )


def _register_dedup_minhash_survivors():
    from event_store_spark.plans.llm import MINHASH_CAND_CTE, MINHASH_REACH_CTE

    oracle = f"""
    WITH {MINHASH_CAND_CTE},
    {MINHASH_REACH_CTE}
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


@register(
    "contamination_broadcast",
    oracle="""
    WITH toks AS (SELECT doc_id, source,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, len(w) - 3),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                           || w[i+3] || ' ' || w[i+4])) AS g
           FROM toks WHERE len(w) >= 5),
    eval_sh AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
    train_sh AS (SELECT DISTINCT doc_id, g FROM sh WHERE source <> 'src0')
    SELECT t.doc_id, COUNT(*) AS n_contaminated
    FROM train_sh t JOIN eval_sh e USING (g)
    GROUP BY t.doc_id
    ORDER BY n_contaminated DESC, doc_id LIMIT 50
    """,
)
def contamination_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan, BROADCAST formulation — since round
    9 this is ALSO `contamination_ngram`'s registered body (pipeline.py
    delegates here; the r8 100× dossier measured the old groupBy form at
    exponent 1.54 / 112.8 s vs 17.2 s for this plan, so the scale-safe
    shape is the default and the groupBy form survives as the
    `contamination_grouped` parity twin).

    The EVAL side — small by nature: the held-out benchmark — is made
    distinct (a shuffle of eval grams only) and broadcast; the corpus
    side is a map-only explode + broadcast semi-join probe, so the full
    training corpus NEVER crosses the network. Only the contaminated
    survivors (tiny by construction — if they weren't, training data IS
    the benchmark) are shuffled for the per-(doc, gram) dedup and the
    per-doc count. At 100 TB this is the decontamination plan: broadcast
    of benchmark-gram hashes ≈ the runtime-filter/Bloom pattern, with
    exact semantics instead of a false positive rate.
    """
    return _contamination_broadcast_plan(spark, sf_dir)


def _contamination_broadcast_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The shared broadcast-probe plan body (see the registered
    docstrings of `contamination_broadcast` and `contamination_ngram`)."""
    from event_store_spark.functions.text import whitespace_tokens, word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", whitespace_tokens("text").alias("w")
    ).select("doc_id", "source", F.explode(word_ngrams("w", 5)).alias("g"))
    eval_grams = sh.where(F.col("source") == "src0").select("g").distinct()
    train = sh.where(F.col("source") != "src0").select("doc_id", "g")
    contaminated = train.join(F.broadcast(eval_grams), "g", "left_semi")
    return (
        contaminated.dropDuplicates(["doc_id", "g"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy(F.col("n_contaminated").desc(), "doc_id")
        .limit(50)
    )


@register(
    "interleave_sources",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
               (CAST(substr(source, 4) AS INT) % 3) + 1 AS weight
        FROM documents)
    SELECT source, doc_id, CAST(rn AS BIGINT) AS rn,
           CAST((10000 * (2*rn - 1)) // (2 * weight) AS BIGINT) AS sched_bp
    FROM ranked
    ORDER BY sched_bp, source, doc_id
    LIMIT 200
    """,
)
def interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted round-robin interleave across sources — the
    dataloader MIXING op: each source emits its rn-th document at stride
    position (rn - 1/2) / weight (classic stride scheduling), so a
    weight-3 source appears 3x as often as a weight-1 source in any
    prefix of the interleaved stream, deterministically at any
    parallelism. Weights here derive from the fixture source ordinal
    (1 + N % 3) standing in for mixture_weights' learned values.

    sched_bp is computed in INTEGER arithmetic (10000*(2rn-1)) div (2w) —
    exact in both engines, no float rounding drift. Scale: one
    per-source-partitioned window (never a global sort of the corpus) and
    a TakeOrdered head; the full-stream materialization of the same order
    is epoch_shuffle-style range partitioning on sched_bp.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    weight = (F.substring("source", 4, 10).cast("int") % 3) + 1
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        weight.alias("weight"),
    )
    return (
        ranked.select(
            "source",
            "doc_id",
            "rn",
            F.expr("(10000 * (2*rn - 1)) div (2 * weight)").alias("sched_bp"),
        )
        .orderBy("sched_bp", "source", "doc_id")
        .limit(200)
    )
