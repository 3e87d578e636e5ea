#!/usr/bin/env python
"""Engine-only suite measurement for optimization A/B runs.

Replicates bench.py's session + warmup + rep-major engine loop over the
FULL query inventory (so cross-query interactions — cache pressure,
listener/cleaner state, shuffle-file accumulation — are present exactly
as in the driver's bench), but skips the DuckDB oracle pass and adds a
construct/execute split plus a Spark job count per query. Writes
/tmp/suitebench.json and prints the slowest rows.

Usage: python tools/suitebench.py [--reps 3] [--out /tmp/suitebench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/suitebench.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from event_store_spark.plans import QUERIES
    from event_store_spark.session import get_spark

    spark = get_spark("suitebench", cpus=cpus)
    sf_dir = args.sf_dir

    # bench.py's warmup, verbatim
    QUERIES["q1"](spark, sf_dir).collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    _warm = F.pandas_udf(lambda s: s, "int")
    spark.range(4).select(_warm(F.col("id").cast("int"))).collect()
    from event_store_spark.plans.typed_events import typed_events

    typed_events(spark, sf_dir)
    from event_store_spark.plans.ir import bm25_postings

    bm25_postings(spark, sf_dir)
    from event_store_spark.plans.jaccard import verify_sketches

    verify_sketches(spark, sf_dir)
    from event_store_spark.plans.llm import _minhash_signatures

    _minhash_signatures(spark, sf_dir).count()
    from event_store_spark.plans.tokenized import (
        source_gram_comatrix,
        source_gram_masks,
        source_gram_sets,
        tokenized_docs,
    )

    tokenized_docs(spark, sf_dir)
    _masks = source_gram_masks(spark, sf_dir)
    if _masks is not None:
        _masks[0].count()
        _com = source_gram_comatrix(spark, sf_dir)
        if _com is not None:
            _com[0].count()
    else:
        source_gram_sets(spark, sf_dir).count()
    from event_store_spark.plans.hnsw import _hnsw_graph
    from event_store_spark.tables import hot_table

    hot_table(spark, sf_dir, "events").count()
    _hnsw_graph(spark, sf_dir).count()

    tracker = spark.sparkContext.statusTracker()

    def last_job() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    construct: dict[str, list[float]] = {n: [] for n in QUERIES}
    jobs: dict[str, list[int]] = {n: [] for n in QUERIES}
    for rep in range(args.reps):
        for name in sorted(QUERIES):
            spark.sparkContext.setJobDescription(f"suite:{name}")
            j0 = last_job()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            samples[name].append(t2 - t0)
            construct[name].append(t1 - t0)
            jobs[name].append(last_job() - j0)
            spark.sparkContext.setJobDescription(None)
    med = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    out = {
        "total": round(sum(med.values()), 3),
        "reps": args.reps,
        "per_query": {
            n: {
                "median": med[n],
                "all": [round(x, 3) for x in samples[n]],
                "construct": [round(x, 3) for x in construct[n]],
                "jobs": jobs[n],
            }
            for n in sorted(QUERIES)
        },
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("total", out["total"])
    for n, v in sorted(med.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{n:36s} {v:7.3f}  jobs {jobs[n]}  "
              f"construct {[round(x, 3) for x in construct[n]]}")


if __name__ == "__main__":
    main()
