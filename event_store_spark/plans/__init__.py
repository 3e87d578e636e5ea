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

#: Least-recently-driver-checked ROTATION. The external correctness driver
#: samples a prefix of this registry each round; a fixed order would leave
#: the same tail queries perpetually unchecked, and the round-2 static
#: priority list had the dual flaw (previously-green queries pushed to the
#: tail are the least likely to be re-checked for regressions — ADVICE r3).
#: The fair policy is rotation: queries that did NOT get a green row in the
#: most recent driver pass come first (in registration order), queries that
#: did come last. Over two consecutive rounds every query gets a driver row;
#: regressions in green queries surface at most one round late. Local parity
#: (tests/test_oracle_parity.py) stays exhaustive every run regardless.
_CHECKED_LAST_ROUND = {
    # green rows in CORRECTNESS_r03.json (q51 errored there — comparator
    # could not hash its array column, fixed in relational_ext2 — so it
    # rotates to the FRONT, not here)
    "q1", "q2", "q3", "q4", "q38", "q39", "q40",
    "q41", "q42", "q43", "q44", "q45", "q46", "q47", "q48", "q49", "q50",
    "q52", "q53", "q54", "q55_salted_heavy_hitters",
    "q19_scale", "q50_scale",
    "sample_stratified", "sample_bottomk", "source_quota",
    "contamination_ngram", "quality_filter", "vocab_topk",
    "tfidf_top_terms", "text_pii_scrub",
    "dedup_survivors", "dedup_clusters",
    "dedup_embedding", "dedup_embedding_label", "dedup_minhash_verified",
    "ann_ivf_topk", "ann_ivf_sampled", "ann_ivf_nprobe", "ann_batch_topk",
    "multimodal_features", "multimodal_frame_sample", "multimodal_resize",
    "corpus_curation", "text_repetition", "dataset_split", "mixture_weights",
    # approx_* deliberately NOT listed: r03 recorded them as rows-only
    # (no_oracle); they now carry audit oracles and should be driver-checked
    # early in the rotation
}


def _apply_rotation() -> None:
    order = [n for n in QUERIES if n not in _CHECKED_LAST_ROUND] + [
        n for n in QUERIES if n in _CHECKED_LAST_ROUND
    ]
    for d in (QUERIES, ORACLE):
        items = [(n, d[n]) for n in order if n in d]
        d.clear()
        d.update(items)


_apply_rotation()

__all__ = ["QUERIES", "ORACLE"]
