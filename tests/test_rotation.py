"""Registry rotation contract (VERDICT r6 #1).

The external correctness driver samples a PREFIX of the registry each
round. The rotation must therefore order queries by the round of their
newest green driver row, ascending — never-checked first, stalest next,
latest-round greens last — so every sample drains the oldest-evidence
cohort. Round 6's coarse checked/unchecked split left 17 of the 44
r02/r03-checked queries outside the 50-query sample; this pins the
fine-grained order. Pure-Python (no SparkSession needed).
"""

from event_store_spark.plans import QUERIES, ORACLE, _LATEST_GREEN_ROUND


def test_registry_sorted_by_staleness():
    rounds = [_LATEST_GREEN_ROUND.get(n, -1) for n in QUERIES]
    assert rounds == sorted(rounds), (
        "registry must be ordered by newest-green-round ascending"
    )


def test_oracle_order_matches_queries():
    # The driver zips QUERIES and ORACLE prefixes; both dicts must agree.
    q = [n for n in QUERIES if n in ORACLE]
    o = list(ORACLE)
    assert q == o


def test_stalest_cohort_fronts_sample():
    """Every query whose newest green row is from round <= (max_round - 2)
    must appear inside the driver's 50-query prefix (as long as the cohort
    fits — it does: 43 as of r06)."""
    if not _LATEST_GREEN_ROUND:
        return  # no artifacts (fresh checkout) — nothing to pin
    max_round = max(_LATEST_GREEN_ROUND.values())
    stale = {
        n
        for n in QUERIES
        if _LATEST_GREEN_ROUND.get(n, -1) <= max_round - 2
    }
    prefix = set(list(QUERIES)[: max(50, len(stale))])
    missing = stale - prefix
    assert not missing, f"stale queries outside the sample prefix: {missing}"
