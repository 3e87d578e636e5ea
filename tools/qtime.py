#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds.

Usage:
    python tools/qtime.py [--reps N] [--explain DIR_SUFFIX] [--noop] q1 q2 ...
    python tools/qtime.py --reps 5 dedup_simhash dedup_simhash64

Replicates bench.py's session + warmup (so numbers are comparable to the
driver's), then times ONLY the named queries, interleaved rep-major, and
prints per-query medians. With --explain <suffix>, writes each query's
`.explain("formatted")` output to plans/r12/<name>_<suffix>.txt.
With --noop, times `df.write.format("noop")` instead of collect()
(guide §1.4) — collect() stays the default because it is the driver's
own bench convention.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/<round>/<q>_<suffix>.txt explain dumps")
    ap.add_argument("--round", default="r13",
                    help="plans/ subdir for --explain dumps")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from event_store_spark.plans import QUERIES
    from event_store_spark.session import get_spark

    spark = get_spark("qtime", cpus=cpus)
    sf_dir = args.sf_dir

    # bench.py's warmup, verbatim (JVM, python workers, side tables)
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

    if args.explain:
        os.makedirs(os.path.join(REPO, "plans", args.round), exist_ok=True)
        for name in args.names:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(REPO, "plans", args.round,
                                f"{name}_{args.explain}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}")

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.reps):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name in args.names:
        s = samples[name]
        print(f"{name:42s} median {statistics.median(s):7.3f}  "
              f"all {[round(x, 3) for x in s]}")


if __name__ == "__main__":
    main()
