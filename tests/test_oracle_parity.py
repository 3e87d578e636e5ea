"""t2 correctness: every registered query hash-matches its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate at sf0.01 (the same scale the
driver uses).
"""

from __future__ import annotations

import pytest

from event_store_spark.plans import ORACLE, QUERIES
from tests.oracle_harness import compare

ORACLE_CHECKED = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf_correct, name):
    df = QUERIES[name](spark, sf_correct)
    ok, msg = compare(df, ORACLE[name], sf_correct)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows_smoke(spark, sf_smoke):
    """t1 smoke: every query runs end-to-end at sf0.001 (≥0 rows, stable schema)."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} produced no schema"
        df.collect()


def test_registry_consistency():
    """Every oracle belongs to a registered query; entry contract exposes
    exactly the registry (driver-contract invariant)."""
    import __spark_entry__ as mod

    assert set(ORACLE) <= set(QUERIES)
    assert set(mod.queries()) == set(QUERIES)
    assert mod.oracle_sql() == ORACLE
