"""PageRank operator: exactness vs a NumPy power-iteration reference,
dangling-mass redistribution, and bounded-lineage iteration.

The operator's contract is EXACT fixed-iteration power steps (not
approximate convergence), so the reference comparison uses a tight
tolerance: both sides compute the same IEEE products, differing only in
summation order (~1e-15 relative).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from event_store_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping, iterations):
    """Dense reference: synchronous power iteration with uniform dangling
    redistribution, from the uniform vector."""
    out = {u: [] for u in range(n)}
    for u, v in edge_list:
        out[u].append(v)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - damping) / n)
        dm = sum(r[u] for u in range(n) if not out[u])
        nxt += damping * dm / n
        for u in range(n):
            if out[u]:
                w = r[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += damping * w
        r = nxt
    return r


def _run(spark, n, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, **kw).collect()}
    return got


def test_pagerank_matches_numpy_with_dangling(spark):
    # 0->1->2->3 (3 dangling), plus 0->2 and a 4<->0 cycle back-edge
    edge_list = [(0, 1), (1, 2), (2, 3), (0, 2), (4, 0), (0, 4)]
    ref = _numpy_pagerank(5, edge_list, 0.85, 7)
    got = _run(spark, 5, edge_list, damping=0.85, iterations=7)
    assert set(got) == set(range(5))
    for v in range(5):
        assert got[v] == pytest.approx(ref[v], rel=1e-12)
    # dangling redistribution keeps total mass at exactly 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_no_dangling_star(spark):
    # undirected star, center 0, leaves 1..6: center outranks leaves and
    # the leaf ranks are identical by symmetry
    edge_list = []
    for leaf in range(1, 7):
        edge_list += [(0, leaf), (leaf, 0)]
    ref = _numpy_pagerank(7, edge_list, 0.85, 6)
    got = _run(spark, 7, edge_list, damping=0.85, iterations=6)
    for v in range(7):
        assert got[v] == pytest.approx(ref[v], rel=1e-12)
    assert got[0] > got[1]
    leaf_ranks = {round(got[v], 15) for v in range(1, 7)}
    assert len(leaf_ranks) == 1


def test_pagerank_deep_iteration_bounded_lineage(spark):
    # 40-node directed ring, 24 iterations with checkpoints every 3: the
    # eager localCheckpoints keep plan depth bounded (this test hangs or
    # blows planning time if lineage accumulates across all 24 steps).
    # On a ring every node has in/out degree 1, so PageRank is exactly
    # uniform at every iteration — a closed form the output must hit.
    n = 40
    edge_list = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, n, edge_list, damping=0.85, iterations=24,
               checkpoint_every=3)
    for v in range(n):
        assert got[v] == pytest.approx(1.0 / n, rel=1e-12)


def test_pagerank_validates_parameters(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)


def test_pagerank_weighted_matches_numpy(spark):
    # weighted edges: expand each weighted edge into w parallel unit edges
    # for the NumPy reference (row-normalization is identical)
    weighted = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5)]
    expanded = [(u, v) for (u, v, w) in weighted for _ in range(w)]
    ref = _numpy_pagerank(3, expanded, 0.85, 6)
    edges = spark.createDataFrame(weighted, "src long, dst long, weight long")
    from event_store_spark.operators.graph import pagerank as pr

    got = {r["node"]: r["rank"] for r in
           pr(edges, damping=0.85, iterations=6).collect()}
    for v in range(3):
        assert got[v] == pytest.approx(ref[v], rel=1e-12)


def test_pagerank_ship_graph_bipartite(spark, sf_smoke):
    # the million-edge-at-sf0.1 bipartite part<->supplier graph, at smoke
    # scale: ranks sum to 1 (no dangling nodes in a symmetrized graph),
    # suppliers (odd ids) out-rank parts (even ids) on average because
    # each supplier ships many parts
    from event_store_spark.operators.graph import pagerank as pr
    from event_store_spark.tables import load_table

    pairs = (
        load_table(spark, sf_smoke, "lineitem")
        .select(
            (F.col("l_partkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    out = pr(edges, damping=0.85, iterations=3, checkpoint_every=2)
    rows = out.collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    sup = [r["rank"] for r in rows if r["node"] % 2 == 1]
    part = [r["rank"] for r in rows if r["node"] % 2 == 0]
    assert sup and part
    assert sum(sup) / len(sup) > sum(part) / len(part)


def test_pagerank_isolated_orientation_counts(spark):
    # a node appearing only as dst is dangling; its mass recycles.
    # 0->1, 2->1: ranks of 0 and 2 equal; 1 highest; sums to 1.
    got = _run(spark, 3, [(0, 1), (2, 1)], damping=0.5, iterations=4)
    ref = _numpy_pagerank(3, [(0, 1), (2, 1)], 0.5, 4)
    for v in range(3):
        assert got[v] == pytest.approx(ref[v], rel=1e-12)
    assert got[0] == pytest.approx(got[2], rel=1e-12)
    assert got[1] > got[0]


# ---------------------------------------------------------------- label prop

def _py_label_prop(nodes, edges, rounds):
    """Reference: synchronous clamped majority vote, smallest-label ties."""
    seed = dict(nodes)
    cur = dict(nodes)
    for _ in range(rounds):
        votes = {}
        for u, v in edges:
            lab = cur.get(u)
            if lab is not None:
                votes.setdefault(v, {}).setdefault(lab, 0)
                votes[v][lab] += 1
        nxt = {}
        for n in cur:
            if seed[n] is not None:
                nxt[n] = seed[n]
            elif n in votes:
                nxt[n] = min(votes[n], key=lambda l: (-votes[n][l], l))
            else:
                nxt[n] = None
        cur = nxt
    return cur


def _run_lp(spark, nodes, edges, rounds, **kw):
    from event_store_spark.operators.graph import label_propagation

    ndf = spark.createDataFrame(nodes, "node long, label string")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = label_propagation(ndf, edf, rounds=rounds, **kw)
    return {r["node"]: r["label"] for r in out.collect()}


def test_label_propagation_matches_reference(spark):
    nodes = [(0, "a"), (1, None), (2, None), (3, "b"), (4, None), (5, None)]
    # chain 0-1-2-3 (symmetric) + 4 fed by both sides, 5 isolated
    sym = [(0, 1), (1, 2), (2, 3), (1, 4), (3, 4)]
    edges = sym + [(v, u) for (u, v) in sym]
    for rounds in (1, 2, 3):
        ref = _py_label_prop(nodes, edges, rounds)
        got = _run_lp(spark, nodes, edges, rounds)
        assert got == ref, (rounds, got, ref)
    # after 2 rounds both labels reach node 4; tie broken to 'a'
    assert _run_lp(spark, nodes, edges, 2)[4] == "a"
    # the isolated node never acquires a label
    assert _run_lp(spark, nodes, edges, 3)[5] is None


def test_label_propagation_seeds_clamped_and_flips(spark):
    # node 2's majority flips as the frontier moves; seed 0 never changes
    nodes = [(0, "x"), (1, None), (2, None), (3, "y"), (4, "y")]
    edges = [(0, 1), (1, 2), (3, 2), (4, 2), (2, 1)]
    for rounds in (1, 2, 4):
        ref = _py_label_prop(nodes, edges, rounds)
        got = _run_lp(spark, nodes, edges, rounds)
        assert got == ref
        assert got[0] == "x"


def test_label_propagation_random_graphs_match_reference(spark):
    import random

    rng = random.Random(7)
    labels = ["a", "b", "c", None, None, None]
    for trial in range(3):
        n = 12
        nodes = [(i, rng.choice(labels)) for i in range(n)]
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        edges = [(u, v) for (u, v) in edges if u != v]
        rounds = rng.choice([1, 2, 3, 5])
        ref = _py_label_prop(nodes, edges, rounds)
        got = _run_lp(spark, nodes, edges, rounds, checkpoint_every=2)
        assert got == ref, (trial, rounds)


def test_query_driver_fold_matches_operator(spark, monkeypatch):
    """pagerank_events' r12 driver fold (NumPy power steps over the
    collected O(#types²) edge table) must emit row-for-row the same
    rank_e8 values as the distributed operator path it replaced — the
    guard only changes WHERE the tiny iteration runs, never the result."""
    from event_store_spark.plans import graphq
    from event_store_spark.plans.graphq import pagerank_events

    sf = "/root/testdata/sf0.01"
    folded = [tuple(r) for r in pagerank_events(spark, sf).collect()]
    # force the fallback: a zero guard sends every corpus down the
    # distributed operator path
    monkeypatch.setattr(graphq, "PR_DRIVER_EDGE_MAX", -1)
    distributed = [tuple(r) for r in pagerank_events(spark, sf).collect()]
    assert folded == distributed
    assert len(folded) > 0
