"""JDBC (Postgres) source/sink for the event table (S1/S6 live path).

The store's canonical substrate here is the parquet event log; the
reference's is a Postgres table (`PostgresEventStore.java`: insert with
commit-order lsn, keyset-paged scans). This module is the live-database
twin of those two rows, the same way tests/test_kafka_live.py is the live
twin of the injected Kafka path:

- :func:`jdbc_scan` reads an events table over `format("jdbc")` with the
  keyset predicate PUSHED DOWN into the remote SQL (the reference's
  ``WHERE (lsn, id) > (?, ?)`` served by the PK index — pushing it keeps
  the database doing the pruning instead of Spark filtering a full
  export) and lsn-range partitioning so a 1000-executor cluster reads the
  table in parallel slices.
- :func:`jdbc_sink` appends the event shape to a table.

Everything that composes a Spark read/write is a PURE option/SQL builder,
unit-tested without a database; the live round-trip test activates only
when ``POSTGRES_URL`` is set (tests/test_jdbc_live.py), mirroring the
broker-gated Kafka tests. The Postgres JDBC driver jar must be on the
session classpath (``--jars postgresql-<ver>.jar``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_store_spark.core.cursor import Cursor

#: event-table columns, in the reference's declared order
EVENT_COLUMNS = ("id", "key", "timestamp", "metadata", "data", "lsn")


def pg_lsn_literal(lsn: int) -> str:
    """The 64-bit lsn back in pg_lsn text form ('hi/lo' hex) — the
    inverse of `core.pgwire.lsn_int`, for predicates against the
    reference schema's native ``pg_lsn`` column."""
    return f"'{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}'"


def keyset_predicate_sql(after: Cursor, lsn_type: str = "bigint") -> str:
    """The reference's keyset row-value predicate as remote SQL (F1).

    Postgres evaluates ``(lsn, id) > (x, y)`` with one PK-index range
    scan — the exact clause `PostgresEventStore.java` pages with; Spark's
    own Filter pushdown cannot synthesize a row-value comparison, which
    is why it goes into the pushdown query text instead of a
    ``.where()``.

    ``lsn_type='pg_lsn'`` renders the cursor's lsn as a pg_lsn literal
    for the reference schema's native column type
    (`events_schema.sql:10`); the default bigint form serves tables that
    store the 64-bit position directly."""
    if lsn_type == "pg_lsn":
        lsn = f"{pg_lsn_literal(int(after.lsn))}::pg_lsn"
    else:
        lsn = str(int(after.lsn))
    return f"(lsn, id) > ({lsn}, {int(after.id)})"


def scan_query(
    table: str, after: Cursor | None = None, lsn_type: str = "bigint"
) -> str:
    """Pushdown subquery for the `dbtable` option: projection pinned to
    the event columns (column pruning at the SOURCE — the database never
    serializes columns Spark would drop) plus the keyset predicate.

    ``lsn IS NOT NULL`` is unconditional (ADVICE r6): in the reference,
    events.lsn is NULLABLE — stamped asynchronously by the LSN Updater —
    and every replicator read filters ``WHERE lsn IS NOT NULL AND
    (lsn, id) > ...`` (`EventReplicatorWorker.java:66-72`). Without it a
    full scan returns unstamped rows whose commit order does not exist
    yet (orderBy sorts NULLs first, so "ordered replay" would consume
    them ahead of everything, and a cursor taken from one is garbage);
    it also keeps an lsn-partitioned read from dumping every NULL-lsn
    row into one partition's slice."""
    if not table.replace("_", "").replace(".", "").isalnum():
        raise ValueError(f"suspicious table name {table!r}")
    cols = ", ".join(EVENT_COLUMNS)
    where = " WHERE lsn IS NOT NULL"
    if after is not None:
        where += f" AND {keyset_predicate_sql(after, lsn_type)}"
    return f"(SELECT {cols} FROM {table}{where}) AS esp_scan"


def jdbc_reader_options(
    url: str,
    table: str,
    after: Cursor | None = None,
    *,
    partition_column: str = "lsn",
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    user: str | None = None,
    password: str | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Options for a parallel JDBC scan of one event table.

    ``lower_bound``/``upper_bound`` delimit the lsn range Spark splits
    into ``num_partitions`` slices (rows outside still arrive — bounds
    shape parallelism, never filter); pass the table's MIN/MAX lsn from a
    bounds query, or leave both None for a single-partition read (fine
    for dimension-sized tables, wrong for the 100 TB fact — the same
    rule as broadcast sizing)."""
    opts = {
        "url": url,
        "dbtable": scan_query(table, after),
        "fetchsize": str(fetch_size),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if lower_bound is not None and upper_bound is not None:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    after: Cursor | None = None,
    **reader_kwargs,
) -> DataFrame:
    """Event-shape DataFrame from a live Postgres events table (S6).

    Same columns as `EventStore.read_events`, so replay/subscribe/
    analytics compose unchanged: ``jdbc_scan(...).orderBy("lsn", "id")``
    is the reference's ordered replay against the real database."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_reader_options(url, table, after, **reader_kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """Append the event shape to a live table (S1 live twin).

    The parquet store's in-batch lsn stamping has no JDBC analog — the
    DATABASE mints commit-order lsns (the reference's
    ``pg_current_xact_id()`` default); this sink therefore writes the
    payload columns and lets table defaults assign id/lsn when the
    incoming frame omits them."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode("append")
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()
