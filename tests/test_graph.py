"""Connected components (operators/graph.py): alternating-star iteration
vs a Python union-find oracle, on planted shapes (chain, star, V) and
random graphs, plus the cc-vs-greedy dedup_pipeline semantics split."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mbrngq_spark.operators.graph import connected_components
from tests.conftest import SF_DIR


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue            # self-loop-only nodes are isolated → absent
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]),
                               "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_cc_chain(spark):
    # worst case for label propagation: a long path
    _check(spark, [(i, i + 1) for i in range(60)])


def test_cc_star_and_v(spark):
    # star family + the V shape where greedy keep-smallest differs
    _check(spark, [(100, 1), (100, 2), (100, 3), (200, 150), (50, 200)])


def test_cc_multiple_components_and_dup_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (7, 8), (8, 9), (9, 7),
                   (20, 21), (5, 5)])


def test_cc_random_graphs(spark):
    rng = np.random.default_rng(7)
    for _ in range(3):
        n = 120
        edges = [(int(a), int(b))
                 for a, b in rng.integers(0, n, size=(150, 2))
                 if a != b]
        _check(spark, edges)


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_cc_differs_from_greedy_on_v_family(spark):
    """V-shaped family (two perturbed copies of one base, mutually
    dissimilar, base has the LARGEST id): greedy keeps both local minima,
    cc keeps only the component minimum."""
    from mbrngq_spark.operators.dedup import dedup_pipeline

    base = " ".join(f"w{i}" for i in range(40))
    pert_a = " ".join(f"pa{i}" for i in range(20)) + " " + base
    pert_b = " ".join(f"pb{i}" for i in range(20)) + " " + base
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [pert_a, pert_b, base]}),
        "doc_id long, text string")
    kw = dict(threshold=0.55, num_hashes=16, bands=16)
    greedy = {r.doc_id for r in dedup_pipeline(corpus, **kw).collect()}
    cc = {r.doc_id
          for r in dedup_pipeline(corpus, clustering="cc", **kw).collect()}
    # pairs: (1,3) and (2,3); J(1,2) ≈ 0.49 < 0.55
    assert greedy == {1, 2}
    assert cc == {1}


def test_cc_adversarial_single_giant_component(spark):
    """r4 verdict item 8: ALL nodes form ONE component (the worst case
    for the alternating-star round count and any bucket-cap interplay) —
    50k nodes wired as a path (max diameter) plus long-range chords that
    mimic LSH bucket edges. Asserts the single component label is the
    global minimum for every node AND the round count stays within the
    O(log² n) budget (no max_iter blowup)."""
    n = 50_000
    rng = np.random.default_rng(7)
    path = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    chords = np.stack([rng.integers(0, n, 5_000),
                       rng.integers(0, n, 5_000)], axis=1)
    edges = np.concatenate([path, chords])
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]),
        "id_a long, id_b long")
    out = connected_components(df, max_iter=30)
    agg = out.agg(F.count("*").alias("n"),
                  F.countDistinct("component").alias("ncomp"),
                  F.min("component").alias("mn"),
                  F.max("component").alias("mx")).first()
    assert agg["n"] == n
    assert agg["ncomp"] == 1
    assert agg["mn"] == 0 and agg["mx"] == 0


def test_cc_giant_component_via_dedup_pipeline(spark):
    """The same worst case through the DEDUP entry point: a corpus where
    every doc chains to the next by shared text (one giant near-dup
    family) keeps exactly the minimum doc id."""
    from mbrngq_spark.operators.dedup import dedup_pipeline

    n = 300
    rows = []
    # doc i shares a long run of tokens with doc i+1 → a Jaccard chain
    words = [f"w{j}" for j in range(n + 40)]
    for i in range(n):
        rows.append((i, " ".join(words[i:i + 40])))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dedup_pipeline(docs, threshold=0.6, num_hashes=16, bands=16,
                         clustering="cc")
    keep = sorted(r.doc_id for r in out.collect())
    assert keep == [0]


def test_sssp_khop_matches_python_bellman_ford(spark):
    """k-round relaxation == pure-Python Bellman-Ford (exact ints) on
    the ε-graph of the sf fixture, multi-source."""
    from mbrngq_spark import harness as H
    from mbrngq_spark.operators.distance_join import distance_join
    from mbrngq_spark.operators.graph import sssp_khop

    docs_geo = H.load_docs_geo(spark, SF_DIR)
    ep = distance_join(docs_geo, docs_geo, H.DBSCAN_EPS, self_join=True)
    wq = F.round(F.col("dist") * F.lit(1e6)).cast("long")
    edges = (ep.select(F.col("a_id").alias("src"),
                       F.col("b_id").alias("dst"), wq.alias("wq"))
             .unionByName(ep.select(F.col("b_id").alias("src"),
                                    F.col("a_id").alias("dst"),
                                    wq.alias("wq"))))
    srcs = spark.createDataFrame([(i,) for i in (0, 1, 2)], "id long")
    k = 5
    got = {int(r.id): int(r.distq)
           for r in sssp_khop(edges, srcs, k).collect()}

    ed = [(int(r.src), int(r.dst), int(r.wq)) for r in edges.collect()]
    dist = {0: 0, 1: 0, 2: 0}
    for _ in range(k):
        nxt = dict(dist)
        for s, t, w in ed:
            if s in dist and dist[s] + w < nxt.get(t, 1 << 62):
                nxt[t] = dist[s] + w
        dist = nxt
    assert got == dist
    assert len(got) > 3  # reaches beyond the seeds


def test_sssp_khop_bounded_hops_semantics(spark):
    """On a weighted chain, k rounds reach exactly k hops, and a short
    heavy edge loses to a longer light path once enough rounds run."""
    from mbrngq_spark.operators.graph import sssp_khop

    # chain 0-1-2-3 weight 1 each, plus direct 0->3 weight 10
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)],
        "src long, dst long, wq long")
    srcs = spark.createDataFrame([(0,)], "id long")
    d1 = {int(r.id): int(r.distq)
          for r in sssp_khop(edges, srcs, 1).collect()}
    assert d1 == {0: 0, 1: 1, 3: 10}          # 1 hop: direct edges only
    d3 = {int(r.id): int(r.distq)
          for r in sssp_khop(edges, srcs, 3).collect()}
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}     # light path wins at 3 hops
