"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL over the same parquet fixtures,
canonicalizes both results (columns sorted by name, rows sorted, floats kept
as-is — queries already ROUND), and compares values cell-by-cell.
"""

from __future__ import annotations

import math

import duckdb

from event_store_spark.tables import TABLE_NAMES, table_path

#: pinned into every comparison message so CORRECTNESS artifacts carry the
#: oracle's version (VERDICT r7 #7: the r05 episode was suspected
#: driver-side DuckDB version skew and nothing recorded it). Pre-1.0
#: DuckDB had different default types for several aggregates (HUGEINT
#: sums) — the hash-affecting class pinned by tests/test_oracle_types.py.
DUCKDB_VERSION = duckdb.__version__
assert tuple(int(x) for x in DUCKDB_VERSION.split(".")[:2]) >= (1, 0), (
    f"oracle comparisons require duckdb >= 1.0.0, found {DUCKDB_VERSION}"
)


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    """One execution per oracle query: column names from the same cursor."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then rows; normalize values for comparison."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v + 0.0  # collapse -0.0
        if hasattr(v, "timestamp"):  # datetime
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return float(v)
        except ImportError:
            pass
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_res = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_res):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_res)}"
    sc = canonicalize(s_cols, s_rows)
    oc = canonicalize(o_cols, o_res)
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a != b:
            return False, f"row {i} differs: spark={a!r} oracle={b!r}"
    return True, f"ok ({len(s_rows)} rows, duckdb {DUCKDB_VERSION})"
