"""Segmented EWMA == sequential EWMA, under arbitrary segmentation.

The operator's claim is algebraic (affine segment maps compose), so the
test is a property: for random series and RANDOM segment cuts, the
two-pass segmented fold must agree with the plain sequential fold to FP
round-off — including the seed convention (first value unweighted),
one-element segments, and a one-element series.
"""

from __future__ import annotations

import math
import random

import pytest

from event_store_spark.operators.ewma import ewma_segmented

ALPHA = 0.1


def _sequential(xs: list[float]) -> float:
    e = xs[0]
    for x in xs[1:]:
        e = ALPHA * x + (1 - ALPHA) * e
    return e


def _run(spark, series: dict[str, list[float]], cuts: dict[str, list[int]]):
    """Build (key, seq, value, segment) rows; segment id = index of the
    cut bucket, zero-padded so it sorts chronologically."""
    rows = []
    for key, xs in series.items():
        bounds = cuts[key]
        for i, x in enumerate(xs):
            seg = sum(1 for b in bounds if i >= b)
            rows.append((key, i, x, f"{seg:06d}"))
    df = spark.createDataFrame(rows, "key string, seq long, value double, seg string")
    out = ewma_segmented(df, "key", ["seq"], "value", "seg", alpha=ALPHA)
    return {r["key"]: (r["ewma"], r["n"]) for r in out.collect()}


def test_segmented_matches_sequential_random_cuts(spark):
    rng = random.Random(7)
    series = {
        f"k{i}": [round(rng.uniform(-50, 50), 2) for _ in range(rng.randint(1, 60))]
        for i in range(8)
    }
    cuts = {}
    for key, xs in series.items():
        n_cuts = rng.randint(0, max(0, len(xs) - 1))
        cuts[key] = sorted(rng.sample(range(1, len(xs)), n_cuts)) if n_cuts else []
    got = _run(spark, series, cuts)
    for key, xs in series.items():
        want = _sequential(xs)
        e, n = got[key]
        assert n == len(xs)
        assert math.isclose(e, want, rel_tol=1e-9, abs_tol=1e-9), (
            key,
            e,
            want,
            cuts[key],
        )


def test_every_element_its_own_segment(spark):
    """Degenerate maximal segmentation: each value a one-element segment
    (the streaming micro-batch extreme)."""
    xs = [3.0, -1.5, 2.25, 10.0, 0.5]
    got = _run(spark, {"k": xs}, {"k": list(range(1, len(xs)))})
    assert math.isclose(got["k"][0], _sequential(xs), rel_tol=1e-12)


def test_single_element_series(spark):
    got = _run(spark, {"k": [42.0]}, {"k": []})
    assert got["k"] == (42.0, 1)


def test_alpha_validation():
    with pytest.raises(ValueError):
        ewma_segmented(None, "k", ["seq"], "v", "s", alpha=1.0)
