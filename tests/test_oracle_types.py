"""Oracle output-type discipline (round-6 driver-hash root cause).

CORRECTNESS_r05 reported 4 hash mismatches (approx_token_counts_cms,
bpe_encoded_stats, concurrency_peak, gap_islands) that no local
configuration could reproduce. A mechanical sweep found the one feature
separating them from the 46 green queries in the same sample: their
oracle SQL produced a DuckDB HUGEINT column (SUM over BIGINT widens).
DuckDB's fetchall() yields Python ints for HUGEINT (what the local
harness compares), but `.df()` — the other canonical fetch path —
converts HUGEINT to float64, so a driver hashing the pandas
representation sees "123.0" where Spark's int64 says "123": rows and
schema match, values don't. The fix is CAST(... AS BIGINT) in the
oracle; this test pins the discipline so no future oracle regresses.

DECIMAL is banned for the same reason (fetch-path-dependent Python
representation: Decimal vs float64); queries needing fixed-point
semantics cast to DOUBLE or scale to integer cents explicitly.

BOOLEAN is banned as belt-and-braces: its stringification differs
between engines (Python True vs Spark true) and across fetch paths
(numpy bool_ vs Python bool), and the only r05 boolean-bearing sample
sat among the four mismatches. Audit verdict columns cast to INT on
both sides (the approx_token_counts_cms convention).
"""

from __future__ import annotations

import duckdb
import pytest

import event_store_spark.plans  # noqa: F401 — populates the registry
from event_store_spark.plans.registry import ORACLE
from event_store_spark.tables import TABLE_NAMES, table_path

SF_DIR = "/root/testdata/sf0.001"

#: types whose Python/pandas representation differs by fetch path
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "BOOLEAN")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF_DIR, name)}'"
        )
    return c


def test_no_fetch_path_dependent_types(con):
    offenders = {}
    for name, sql in ORACLE.items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(str(t).startswith(b) for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output types whose Python value representation depends on "
        f"the DuckDB fetch path (cast to BIGINT/DOUBLE): {offenders}"
    )


def test_oracle_duckdb_version_pinned():
    """VERDICT r7 #7: the r05 mismatch episode was suspected driver-side
    DuckDB version skew with nothing recording the version. The harness
    now asserts >= 1.0.0 at import and stamps the version into every
    comparison message (and bench.py stamps it into BENCH_DETAIL.json),
    so future artifacts carry the oracle version they were checked by."""
    from tests.oracle_harness import DUCKDB_VERSION

    assert DUCKDB_VERSION == duckdb.__version__
    assert tuple(int(x) for x in DUCKDB_VERSION.split(".")[:2]) >= (1, 0)
