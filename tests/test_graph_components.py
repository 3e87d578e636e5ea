"""connected_components (operators/graph.py): large-star/small-star
alternation vs ground truth on adversarial graph shapes.

The round-4 implementation needed O(diameter) rounds; these tests pin the
O(log n) behavior on exactly the shapes that break naive propagation —
deep chains — plus stars, forests, cycles, and randomized graphs checked
against a union-find oracle.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from event_store_spark.operators.graph import connected_components


def _uf_labels(n_vertices, edges):
    """Union-find ground truth: vertex -> min id of its component."""
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label by component min (roots are mins
    # because we always attach the larger root under the smaller)
    return {v: find(v) for v in range(n_vertices)}


def _run(spark, n_vertices, edges, **kw):
    vertices = spark.createDataFrame(
        [(i,) for i in range(n_vertices)], "doc_id long"
    )
    if edges:
        edf = spark.createDataFrame(edges, "src long, dst long")
    else:
        edf = spark.createDataFrame([], "src long, dst long")
    out = connected_components(vertices, edf, **kw)
    return {r["doc_id"]: r["cluster"] for r in out.collect()}


def test_chain_150_deep(spark):
    """A 150-vertex path: diameter 149. Naive propagation needs ~150 rounds;
    star alternation must finish well inside max_rounds=20 (log2(150)≈8)."""
    n = 150
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edges, max_rounds=20, checkpoint_every=3)
    assert got == {i: 0 for i in range(n)}


def test_two_chains_and_isolates(spark):
    # chain 0..59, chain 60..119 (reversed edge orientation), isolates 120..129
    edges = [(i, i + 1) for i in range(59)] + [
        (i + 1, i) for i in range(60, 119)
    ]
    got = _run(spark, 130, edges, max_rounds=20)
    want = {i: 0 for i in range(60)}
    want.update({i: 60 for i in range(60, 120)})
    want.update({i: i for i in range(120, 130)})
    assert got == want


def test_star_and_cycle(spark):
    # star centered at 50 over 0..49 plus a 30-cycle on 100..129
    edges = [(50, i) for i in range(50)]
    edges += [(100 + i, 100 + (i + 1) % 30) for i in range(30)]
    got = _run(spark, 130, edges, max_rounds=20)
    for i in range(51):
        assert got[i] == 0
    for i in range(100, 130):
        assert got[i] == 100


def test_duplicate_and_self_edges_tolerated(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]
    got = _run(spark, 6, edges, max_rounds=10)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 4}


def test_empty_edges(spark):
    got = _run(spark, 5, [], max_rounds=5)
    assert got == {i: i for i in range(5)}


@pytest.mark.parametrize("seed", [7, 1234])
def test_random_forest_vs_union_find(spark, seed):
    rng = random.Random(seed)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    got = _run(spark, n, edges, max_rounds=25)
    assert got == _uf_labels(n, edges)


def test_nonconvergence_raises(spark):
    """max_rounds too low for the shape -> loud RuntimeError, not a wrong
    answer."""
    n = 60
    edges = [(i, i + 1) for i in range(n - 1)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, n, edges, max_rounds=1)


def test_lineage_stays_bounded_on_deep_chain(spark):
    """The checkpoint cadence must keep plan depth bounded: after running a
    deep chain, the result's logical plan string must not grow with rounds
    (localCheckpoint truncates lineage to a scan)."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(vertices, edf, max_rounds=30, checkpoint_every=2)
    plan = out._jdf.queryExecution().analyzed().toString()
    # a truncated lineage bottoms out at LogicalRDD scans after at most
    # (checkpoint_every - 1) un-checkpointed rounds; union branches
    # duplicate subtrees in the string, so the bound is loose — but a
    # NON-truncated 30-round run would show hundreds of Joins
    assert plan.count("Join") <= 16, plan[:2000]
    assert {r["cluster"] for r in out.collect()} == {0}


def test_dedup_clusters_null_texts_stay_singletons(spark, tmp_path):
    """Review r5 (experimentally verified divergence): SQL equality never
    matches NULL = NULL, so NULL-text documents must stay singleton
    clusters — a bare groupBy on the prefix would merge them all."""
    import duckdb

    from event_store_spark.plans import ORACLE
    from event_store_spark.plans.llm_ext import dedup_clusters

    rows = [(1, None, "xx", "s", None), (2, None, "xx", "s", None),
            (3, "hello world", "xx", "s", 11), (4, "hello world", "xx", "s", 11)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = dedup_clusters(spark, sf).first()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = con.execute(ORACLE["dedup_clusters"]).fetchone()
    assert (got.n_clusters, got.max_cluster_size, got.n_multi_clusters) == want
    assert got.n_clusters == 3 and got.n_multi_clusters == 1  # NULLs singleton
