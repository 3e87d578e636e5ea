#!/usr/bin/env python
"""Benchmark harness: run the full query inventory and print ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from event_store_spark.plans import QUERIES
    from event_store_spark.session import get_spark

    spark = get_spark("event-store-spark-bench", cpus=cpus)

    # warm the JVM + file listing once (not counted): tiny metadata-only action
    for name in ("q1",):
        QUERIES[name](spark, sf_dir).collect()
    # warm the Python worker pool + UDF shipping zip (reused across all
    # pandas-UDF queries; spin-up is environment cost, not plan cost)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from event_store_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    _warm = F.pandas_udf(lambda s: s, "int")
    spark.range(4).select(_warm(F.col("id").cast("int"))).collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        # collect() is the driver's own measurement convention: results are
        # small by construction (every query aggregates or limits)
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite wall-clock, full query inventory "
                f"({len(timings)} queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
