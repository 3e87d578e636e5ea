"""knn_graph_blas: the GEMM-select / exact-re-rank twin of knn_graph.

The twin's whole claim is BIT-identical output to the fold plan (same
oracle, same ranks, same doubles) — so the pin here is row-for-row
equality against knn_graph at both fixture SFs, plus unit checks that the
per-bucket kernel's exact re-rank really reproduces the engine's
left-to-right fold (not BLAS reassociation) and that candidate selection
survives a forced-small candidate width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from event_store_spark.plans import graphq
from event_store_spark.plans.graphq import (
    KNN_K,
    _knn_blas_bucket_topk,
    knn_graph,
    knn_graph_blas,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_blas_twin_equals_fold_plan(spark, sf):
    assert _rows(knn_graph_blas(spark, sf)) == _rows(knn_graph(spark, sf))


def _kernel_reference(pdf: pd.DataFrame) -> set[tuple]:
    """Sequential-fold all-pairs reference: rank EVERY in-bucket pair by
    (sim desc, nbr asc) with the engine's exact accumulation order."""
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    n, d = X.shape
    out = []
    for i in range(n):
        cand = []
        for j in range(n):
            if j == i:
                continue
            accd = 0.0
            acca = 0.0
            accb = 0.0
            for dd in range(d):
                accd = accd + X[i, dd] * X[j, dd]
                acca = acca + X[i, dd] * X[i, dd]
                accb = accb + X[j, dd] * X[j, dd]
            sim = accd / (np.sqrt(acca) * np.sqrt(accb))
            cand.append((-sim, ids[j]))
        cand.sort()
        for pos, (neg, nbr) in enumerate(cand[:KNN_K], 1):
            out.append((ids[i], pos, nbr, -neg))
    return set(out)


def _mk_bucket(n: int, d: int = 64, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32).astype(np.float64)
    return pd.DataFrame(
        {"vec_id": np.arange(100, 100 + n), "v": list(X), "bucket": "b"}
    )


def test_kernel_matches_sequential_fold_reference():
    pdf = _mk_bucket(40)
    got = set(
        _knn_blas_bucket_topk(pdf)[["vec_id", "pos", "nbr", "sim"]]
        .itertuples(index=False, name=None)
    )
    assert got == _kernel_reference(pdf)


def test_kernel_survives_minimum_candidate_width(monkeypatch):
    # KNN_BLAS_CAND squeezed to K: selection has no slack, so any
    # approx-vs-exact boundary disagreement would surface as a rank flip
    monkeypatch.setattr(graphq, "KNN_BLAS_CAND", KNN_K)
    pdf = _mk_bucket(60, seed=11)
    got = _knn_blas_bucket_topk(pdf)
    ref = _kernel_reference(pdf)
    # with zero slack only the MEMBERSHIP can degrade on reassociation
    # ties; random gaussian data has none, so require full equality
    assert set(got.itertuples(index=False, name=None)) == ref


def test_kernel_small_and_degenerate_buckets():
    assert _knn_blas_bucket_topk(_mk_bucket(1)).empty
    two = _knn_blas_bucket_topk(_mk_bucket(2))
    # 2 vectors -> each has exactly one neighbor at pos 1
    assert list(two["pos"]) == [1, 1]
    assert set(zip(two["vec_id"], two["nbr"])) == {(100, 101), (101, 100)}


def test_duplicate_vectors_tiebreak_by_nbr():
    pdf = _mk_bucket(5, seed=3)
    # make three identical vectors: their sims vs any probe are EXACTLY
    # equal, so ranking must fall back to nbr ascending
    v = pdf["v"][0]
    pdf.at[2, "v"] = v.copy()
    pdf.at[4, "v"] = v.copy()
    got = _knn_blas_bucket_topk(pdf)
    ref = _kernel_reference(pdf)
    assert set(got.itertuples(index=False, name=None)) == ref


def test_tie_group_wider_than_candidate_set():
    # More identical vectors than KNN_BLAS_CAND in ONE bucket: every
    # pairwise sim among the duplicates ties EXACTLY (bitwise-equal GEMM
    # rows), so the candidate boundary falls INSIDE the tie group. The
    # selection must keep the LOWEST nbr ids of the tie (the ones the
    # (sim DESC, nbr ASC) rank rule puts first), not an argpartition-
    # arbitrary subset — this is the plausible dedup-corpus shape where
    # the bug class surfaces.
    n = graphq.KNN_BLAS_CAND + 4  # tie group alone exceeds the width
    pdf = _mk_bucket(n, seed=13)
    v = pdf["v"][0]
    for i in range(1, n):
        pdf.at[i, "v"] = v.copy()
    got = _knn_blas_bucket_topk(pdf)
    ref = _kernel_reference(pdf)
    assert set(got.itertuples(index=False, name=None)) == ref
    # each vector's neighbors must be the lowest-id OTHER duplicates
    by_vec = got.sort_values(["vec_id", "pos"]).groupby("vec_id")["nbr"].agg(list)
    for vec_id, nbrs in by_vec.items():
        expect = [i for i in range(100, 100 + n) if i != vec_id][:KNN_K]
        assert nbrs == expect


def test_mixed_tie_and_distinct_vectors():
    # tie group (> candidate width) PLUS genuinely distinct vectors:
    # selection must still rank real near-neighbors above tie members
    # when their sims differ, and use nbr order only within exact ties.
    n = graphq.KNN_BLAS_CAND + 6
    pdf = _mk_bucket(n, seed=29)
    v = pdf["v"][0]
    for i in range(1, n - 3):
        pdf.at[i, "v"] = v.copy()
    got = _knn_blas_bucket_topk(pdf)
    ref = _kernel_reference(pdf)
    assert set(got.itertuples(index=False, name=None)) == ref
