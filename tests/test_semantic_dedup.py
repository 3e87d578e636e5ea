"""SemDeDup greedy-drop rule pinned against a brute-force reference.

Oracle parity (test_oracle_parity) proves the registered queries on the
fixture; this file proves the per-cell GEMM kernel itself — seeded random
and adversarial inputs, compared against the obvious O(n²) Python double
loop — so a numpy indexing slip (triangle orientation, axis of any(),
sort-before-stack) cannot hide behind a fixture where it happens not to
matter.
"""

from __future__ import annotations

import math
import random

import pytest

from event_store_spark.plans.semantic import SEM_TAU, _dropped


def _brute_dropped(rows: list[tuple[int, list[float], int]]) -> set[int]:
    """rows: (vec_id, v, cell). Drop b iff ANY a with a.cell == b.cell,
    a.vec_id < b.vec_id and round(cos, 4) >= SEM_TAU."""
    out = set()
    for bid, bv, bcell in rows:
        for aid, av, acell in rows:
            if acell != bcell or aid >= bid:
                continue
            d = sum(x * y for x, y in zip(av, bv))
            na = math.sqrt(sum(x * x for x in av))
            nb = math.sqrt(sum(x * x for x in bv))
            if round(d / (na * nb), 4) >= SEM_TAU:
                out.add(bid)
                break
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, cell int"
    )
    got = {r.vec_id for r in _dropped(df).collect()}
    assert got == _brute_dropped(rows), rows
    return got


def test_dropped_random_cells(spark):
    rng = random.Random(6)
    for _ in range(4):
        rows = [
            (
                i,
                [rng.uniform(-1, 1) for _ in range(6)],
                rng.randrange(3),
            )
            for i in range(30)
        ]
        _run(spark, rows)


def test_dropped_identical_clique_keeps_min_id(spark):
    """An identical-vector clique drops everyone but its minimum id; a
    lone member of another cell survives even if identical (pairs never
    cross cells)."""
    v = [0.3, -0.7, 0.2, 0.9]
    rows = [(10, v, 0), (11, v, 0), (12, v, 0), (13, v, 1)]
    got = _run(spark, rows)
    assert got == {11, 12}


def test_dropped_unordered_input_and_singletons(spark):
    """Arrival order must not matter (the kernel sorts by vec_id before
    building the triangle) and 1-member cells return nothing."""
    v = [1.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0]  # orthogonal: never similar
    rows = [(5, v, 0), (1, v, 0), (3, w, 0), (9, w, 2)]
    got = _run(spark, rows)
    assert got == {5}


def test_dropped_threshold_boundary(spark):
    """Vectors engineered to straddle SEM_TAU: cos exactly at the
    threshold is a drop (>=), just under survives."""
    a = [1.0, 0.0]
    # unit vector at angle theta from `a` has cos(theta) as its x-coord
    at = [SEM_TAU, math.sqrt(1 - SEM_TAU**2)]
    under = [SEM_TAU - 0.01, math.sqrt(1 - (SEM_TAU - 0.01) ** 2)]
    assert _run(spark, [(1, a, 0), (2, at, 0)]) == {2}  # >= tau drops
    assert _run(spark, [(1, a, 0), (2, under, 0)]) == set()  # just under


def test_dropped_guard_raises_on_oversized_cell(spark, monkeypatch):
    import event_store_spark.plans.semantic as sem

    monkeypatch.setattr(sem, "SEM_MAX_CELL", 10)
    rows = [(i, [float(i % 3), 1.0], 0) for i in range(11)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, cell int"
    )
    with pytest.raises(Exception, match="SEM_MAX_CELL"):
        sem._dropped(df).collect()


# ---------------------------------------------------------------- atypical

def _brute_dropped_atypical(rows, centroids):
    """Greedy over (typicality, vec_id) rank: drop b iff ANY same-cell a
    ranked earlier with round(cos(a,b), 4) >= SEM_TAU, where typicality =
    round(cos(v, centroid of cell), 4)."""
    cmap = dict(centroids)

    def typ(v, cell):
        c = cmap[cell]
        d = sum(x * y for x, y in zip(v, c))
        nv = math.sqrt(sum(x * x for x in v))
        nc = math.sqrt(sum(x * x for x in c))
        return round(d / (nv * nc), 4)

    ranked = {(vid): (typ(v, cell), vid) for vid, v, cell in rows}
    out = set()
    for bid, bv, bcell in rows:
        for aid, av, acell in rows:
            if acell != bcell or aid == bid:
                continue
            if ranked[aid] >= ranked[bid]:
                continue
            d = sum(x * y for x, y in zip(av, bv))
            na = math.sqrt(sum(x * x for x in av))
            nb = math.sqrt(sum(x * x for x in bv))
            if round(d / (na * nb), 4) >= SEM_TAU:
                out.add(bid)
                break
    return out


def _run_atypical(spark, rows, centroids):
    from event_store_spark.plans.semantic import _dropped as dropped_fn

    df = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, cell int"
    )
    got = {r.vec_id for r in dropped_fn(df, centroids=centroids).collect()}
    assert got == _brute_dropped_atypical(rows, centroids), rows
    return got


def test_atypical_random_cells(spark):
    rng = random.Random(7)
    for _ in range(4):
        centroids = [
            (cell, [rng.uniform(-1, 1) for _ in range(6)]) for cell in range(3)
        ]
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)], rng.randrange(3))
            for i in range(30)
        ]
        _run_atypical(spark, rows, centroids)


def test_atypical_clique_keeps_farthest_from_centroid(spark):
    """The paper's criterion (Abbas et al. 2023 §2): in a similar clique
    the survivor is the member with the LOWEST cosine to the centroid —
    not the minimum id."""
    centroids = [(0, [1.0, 0.0])]
    # all three near-identical (pairwise cos ~1), typicality ordered 3<2<1
    rows = [
        (1, [1.0, 0.001], 0),
        (2, [1.0, 0.011], 0),
        (3, [1.0, 0.021], 0),
    ]
    got = _run_atypical(spark, rows, centroids)
    assert got == {1, 2}  # id 3 (most atypical) survives; min-id would keep 1


def test_atypical_typ_tie_breaks_by_vec_id(spark):
    centroids = [(0, [1.0, 0.0])]
    v = [0.5, 0.5]
    rows = [(9, v, 0), (4, v, 0)]  # identical → identical typicality
    got = _run_atypical(spark, rows, centroids)
    assert got == {9}
