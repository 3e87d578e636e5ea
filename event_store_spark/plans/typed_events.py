"""Parse-at-ingest typed `events.props` — the 100 TB answer to JSON queries.

q28/q52 parse the JSON `props` string per row at QUERY time; that is a
map-side single-parse plan, but at 100 TB the parse itself is the compute
bill (VERDICT r6: 12-18x the oracle at the 10x corpus, both defenses
rejected — "the 100 TB answer is to not parse JSON per query at all").
The engine owns the write path, so the fix is an ingest-time typed
materialization: `props` is parsed ONCE per corpus into typed columns
(`key_name`, `k_str`, `k_int`) written as a column-pruned parquet side
table; every subsequent query is a flat typed scan with zero JSON work.

`q28_typed`/`q52_typed` serve from the typed table; the string-parse
forms (q28 at plans/relational.py, q52 at plans/relational_ext2.py) stay
registered as the fallback for corpora the engine did not ingest.

Publication is atomic (write staged dir, os.rename into place) following
the repo's pointer-flip discipline, keyed by a digest of the source
parquet's identity (path, mtime, size) so a regenerated fixture
invalidates the cache. In production this column would be materialized by
`EventStore.append` itself at write time; the side table is the batch
backfill of exactly that layout.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.finalsort import catalog_sort, filtered_sort
from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table, parquet_identity, table_path

_TYPED_MEMO: "WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    WeakKeyDictionary()
)


def _typed_dir(sf_dir: str) -> str:
    """Deterministic per-corpus cache dir keyed by the source parquet's
    identity. As in `plans.tokenized._tok_dir` (ADVICE r10/r11), the
    digest covers the RECURSIVE part-file listing — relative path, size,
    mtime per data file (`tables.parquet_identity`) — so replacing part
    files in place (same names, any nesting level) still invalidates."""
    src = table_path(sf_dir, "events")
    digest = hashlib.md5(parquet_identity(src).encode()).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), "event_store_spark_typed", digest, "events_typed"
    )


def typed_projection(df: DataFrame) -> DataFrame:
    """The one parse: events envelope → typed columns. Shared by the
    batch backfill below and the streaming maintainer
    (`streaming.typed_ingest.TypedEventsMaterializer`), so the two paths
    cannot drift."""
    parsed = F.from_json("props", "map<string,string>")
    return df.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.map_keys(parsed)[0].alias("key_name"),
        parsed["k"].alias("k_str"),
        # try_cast: ANSI mode makes plain CAST throw on a non-numeric
        # value; ingest must tolerate foreign payloads (NULL, like
        # DuckDB's TRY_CAST) rather than poison the whole batch
        parsed["k"].try_cast("int").alias("k_int"),
    )


def typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-parsed events table (all envelope columns, `props`
    replaced by typed projections). Materialized once per corpus; served
    as a plain parquet scan thereafter — scans prune to the queried
    typed column, and no JSON parser runs at query time."""
    memo = _TYPED_MEMO.setdefault(spark, {})
    got = memo.get(sf_dir)
    if got is not None:
        return got

    final = _typed_dir(sf_dir)
    if not os.path.isdir(final):
        typed = typed_projection(load_table(spark, sf_dir, "events"))
        staged = f"{final}.staged-{os.getpid()}"
        # Spread the write so readers scan in parallel: the fixture arrives
        # as 1-2 row-groups, and a single-file typed table would serialize
        # every downstream agg on one core. At cluster scale the append
        # path's natural partitioning does this; here 8 files ~ the local
        # sweet spot (scan threads vs per-file footer overhead).
        typed.repartition(8).write.mode("overwrite").parquet(staged)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        try:
            os.rename(staged, final)  # atomic publish
        except OSError:
            # Losing the publish race is fine (final exists — theirs is
            # equivalent); any other rename failure must surface rather
            # than become a missing-path read (ADVICE r10, as tokenized)
            shutil.rmtree(staged, ignore_errors=True)
            if not os.path.isdir(final):
                raise

    df = spark.read.parquet(final)
    memo[sf_dir] = df
    return df


@register(
    "q28_typed",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k_value, COUNT(*) AS cnt
    FROM events GROUP BY k_value ORDER BY k_value NULLS FIRST
    """,
)
def q28_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q28 over the ingest-parsed column: a pruned (k_str) scan + hash
    agg — no JSON parse in the plan. The oracle still parses (DuckDB has
    no ingest path), which is exactly the comparison the scale story
    needs: identical answers, parse amortized to ingest on our side."""
    return (
        typed_events(spark, sf_dir)
        .select(F.col("k_str").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(lambda d: catalog_sort(d, F.col("k_value").asc_nulls_first()))
    )


@register(
    "q52_typed",
    oracle="""
    SELECT json_keys(props)[1] AS key_name,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q52_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52 over the ingest-parsed columns (key_name, k_int): one pruned
    scan, one hash agg, zero query-time JSON."""
    return (
        typed_events(spark, sf_dir)
        .groupBy("key_name")
        .agg(
            F.sum("k_int").cast("bigint").alias("sum_k"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .transform(lambda d: catalog_sort(d, "key_name"))
    )
