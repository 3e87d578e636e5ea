"""Vector math over `array<float>` embedding columns — no Python UDFs.

Everything here compiles to Catalyst higher-order functions
(`zip_with` + `aggregate` = a sequential left fold), so dot products run
inside the JVM and the accumulation order is deterministic (index order),
which keeps results bit-identical with a sequential oracle evaluation.

At 100 TB the same expressions vectorize per-row inside whole-stage codegen;
for top-k similarity prefer the LSH/bucketed plans in
`event_store_spark.plans.llm` so the candidate set, not the corpus, is scanned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    """Cast an array<float> embedding to array<double> for stable math."""
    return F.col(v).cast("array<double>") if isinstance(v, str) else v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: aggregate(zip_with(a, b, *), 0.0, +)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))
