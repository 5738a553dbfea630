"""HLL cardinality sketch: cross-engine-exact registers, merge algebra,
partition invariance, and estimator accuracy (the 100 TB metrics path —
sketches move, items don't)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators import sketch as S


def _items(tag: str, n: int) -> list[str]:
    return [hashlib.md5(f"{tag}/{i}".encode()).hexdigest()[:12]
            for i in range(n)]


@pytest.fixture(scope="module")
def frame(spark):
    rows = ([("a", it) for it in _items("x", 700)]
            + [("b", it) for it in _items("y", 60)]
            # overlap: half of b's items also appear under a
            + [("a", it) for it in _items("y", 30)])
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "item"])).localCheckpoint()


def test_register_twins_bit_equal(spark, frame):
    reg, rho = S.hll_register_cols(F.col("item"))
    rows = frame.select("item", reg.alias("r"), rho.alias("p")).collect()
    for r in rows:
        assert (r["r"], r["p"]) == S.hll_register_py(r["item"])


def test_merge_equals_direct(spark, frame):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) register-for-register
    — the property that lets daily/partition sketches roll up without
    re-reading items."""
    a = frame.filter(F.col("k") == "a").withColumn("k", F.lit("all"))
    b = frame.filter(F.col("k") == "b").withColumn("k", F.lit("all"))
    direct = S.hll_sketch(frame.withColumn("k", F.lit("all")),
                          ["k"], "item")
    merged = S.hll_merge([S.hll_sketch(a, ["k"], "item"),
                          S.hll_sketch(b, ["k"], "item")], ["k"])
    sym = direct.exceptAll(merged).union(merged.exceptAll(direct))
    assert sym.count() == 0


def test_partitioning_invariance(spark, frame):
    """Shuffle layout must not change the estimate (the int64-exact
    harmonic sum is order-independent by construction)."""
    outs = []
    for parts in (1, 13):
        est = S.hll_estimate(
            S.hll_sketch(frame.repartition(parts), ["k"], "item"), ["k"])
        outs.append({r["k"]: (r["n_registers"], r["estimate"])
                     for r in est.collect()})
    assert outs[0] == outs[1]


def test_estimate_matches_python_twin_and_exact(spark, frame):
    pdf = frame.toPandas()
    est = {r["k"]: r["estimate"]
           for r in S.hll_estimate(S.hll_sketch(frame, ["k"], "item"),
                                   ["k"]).collect()}
    for k, grp in pdf.groupby("k"):
        items = grp["item"].tolist()
        assert est[k] == S.hll_estimate_py(items)
        exact = len(set(items))
        assert abs(est[k] / exact - 1) < 0.12, (k, est[k], exact)


def test_sketch_is_one_partial_aggregation(spark, frame):
    """The sketch build must plan as partial+final hash aggregate around
    ONE register-keyed exchange — at scale the shuffle carries register
    partials, never items."""
    plan = S.hll_sketch(frame, ["k"], "item")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_max" in plan or "partial" in plan.lower()
    assert plan.count("Exchange") <= 2  # AQE prints Final+Initial trees


# --- count-min sketch --------------------------------------------------------

def test_cm_bucket_twins_bit_equal(spark, frame):
    cols = [cm for d in range(S.CM_D)
            for cm in [S.cm_bucket_col(F.col("item"), d).alias(f"b{d}")]]
    rows = frame.select("item", *cols).collect()
    for r in rows:
        for d in range(S.CM_D):
            assert r[f"b{d}"] == S.cm_bucket_py(r["item"], d), (r["item"], d)


def test_cm_merge_equals_direct_counter_exact(spark, frame):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) counter-for-counter —
    CMS merge is exact addition, stronger than HLL's max algebra."""
    a = frame.filter(F.col("k") == "a").withColumn("k", F.lit("all"))
    b = frame.filter(F.col("k") == "b").withColumn("k", F.lit("all"))
    direct = S.cm_sketch(frame.withColumn("k", F.lit("all")), ["k"], "item")
    merged = S.cm_merge([S.cm_sketch(a, ["k"], "item"),
                         S.cm_sketch(b, ["k"], "item")], ["k"])
    sym = direct.exceptAll(merged).union(merged.exceptAll(direct))
    assert sym.count() == 0


def test_cm_query_overestimates_never_underestimates(spark, frame):
    """est(x) >= true count(x) for every occurring item (the count-min
    guarantee), and == under no collisions; absent items still return a
    collision-bounded overestimate (>= 0)."""
    sk = S.cm_sketch(frame, ["k"], "item")
    probes = frame.select("k", "item").distinct()
    est = {(r["k"], r["item"]): r["est"]
           for r in S.cm_query(sk, probes, ["k"], "item").collect()}
    truth = frame.groupBy("k", "item").count().collect()
    for r in truth:
        assert est[(r["k"], r["item"])] >= r["count"], (r["k"], r["item"])


def test_cm_query_matches_python_twin(spark, frame):
    pdf = frame.toPandas()
    items_a = pdf[pdf.k == "a"]["item"].tolist()
    sk = S.cm_sketch(frame.filter(F.col("k") == "a"), ["k"], "item")
    probe_items = sorted(set(items_a))[:20] + ["never-seen-item"]
    probes = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * len(probe_items), "item": probe_items}))
    got = {r["item"]: r["est"]
           for r in S.cm_query(sk, probes, ["k"], "item").collect()}
    for it in probe_items:
        assert got[it] == S.cm_query_py(items_a, it), it


def test_cm_weighted_and_partition_invariance(spark, frame):
    """Weighted counts thread through, and shuffle layout never changes
    the counter state (integer sums are order-independent)."""
    wf = frame.withColumn("w", (F.length("item") % 3 + 1).cast("long"))
    outs = []
    for parts in (1, 13):
        sk = S.cm_sketch(wf.repartition(parts), ["k"], "item",
                         weight_col="w")
        outs.append({(r["k"], r["row"], r["col"]): r["cnt"]
                     for r in sk.collect()})
    assert outs[0] == outs[1]
    total_w = wf.agg(F.sum("w")).collect()[0][0]
    per_row = {}
    for (k, row, col), cnt in outs[0].items():
        per_row[row] = per_row.get(row, 0) + cnt
    assert all(v == total_w for v in per_row.values())


def test_cm_sketch_is_one_partial_aggregation(spark, frame):
    plan = S.cm_sketch(frame, ["k"], "item")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert plan.count("Exchange") <= 2


# --- Bloom filter ------------------------------------------------------------

def test_bf_position_twins_bit_equal(spark, frame):
    cols = [S.bf_position_col(F.col("item"), d).alias(f"p{d}")
            for d in range(S.BF_K)]
    for r in frame.select("item", *cols).collect():
        for d in range(S.BF_K):
            assert r[f"p{d}"] == S.bf_position_py(r["item"], d)
            assert 0 <= r[f"p{d}"] < S.BF_BITS


def test_bf_no_false_negatives_and_python_twin(spark, frame):
    """member=1 for EVERY inserted item (the Bloom guarantee), and the
    membership decision — including false positives — matches the
    pure-Python twin bit-for-bit."""
    items_a = [r["item"] for r in
               frame.filter(F.col("k") == "a").select("item").collect()]
    bf = S.bf_build(frame.filter(F.col("k") == "a"), ["k"], "item")
    probe_items = sorted(set(items_a))[:30] + [f"absent/{i}"
                                               for i in range(50)]
    probes = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * len(probe_items), "item": probe_items}))
    got = {r["item"]: r["member"]
           for r in S.bf_might_contain(bf, probes, ["k"], "item").collect()}
    for it in probe_items:
        assert got[it] == S.bf_member_py(items_a, it), it
    for it in probe_items[:30]:
        assert got[it] == 1, it


def test_bf_merge_idempotent_and_equals_direct(spark, frame):
    """OR-merge: merge(bf(A), bf(B)) == bf(A∪B) word-exact, and merging
    a filter with ITSELF is a no-op (the exactly-once algebra)."""
    a = frame.filter(F.col("k") == "a").withColumn("k", F.lit("all"))
    b = frame.filter(F.col("k") == "b").withColumn("k", F.lit("all"))
    direct = S.bf_build(frame.withColumn("k", F.lit("all")), ["k"], "item")
    bfa = S.bf_build(a, ["k"], "item")
    merged = S.bf_merge([bfa, S.bf_build(b, ["k"], "item")], ["k"])
    sym = direct.exceptAll(merged).union(merged.exceptAll(direct))
    assert sym.count() == 0
    twice = S.bf_merge([bfa, bfa], ["k"])
    sym2 = bfa.exceptAll(twice).union(twice.exceptAll(bfa))
    assert sym2.count() == 0


def test_bf_prune_col_mapside_no_shuffle(spark, frame):
    """The join-pruning shape: collected bitmap embedded as a literal
    array, corpus filtered map-side — keeps every true member, plan has
    no Exchange and no Python."""
    small = frame.filter(F.col("k") == "b")
    state = S.bf_build(small, ["k"], "item").collect()
    pruned = frame.filter(S.bf_prune_col(state, F.col("item")))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    kept = {r["item"] for r in pruned.select("item").collect()}
    true_members = {r["item"] for r in small.select("item").collect()}
    assert true_members <= kept
    # the 4096-bit filter over 60 items should prune most of the 700
    assert len(kept) < frame.select("item").distinct().count() * 0.5


# --- histogram quantile sketch ----------------------------------------------

@pytest.fixture(scope="module")
def vframe(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    rows = [("a", float(v)) for v in rng.uniform(0, 100, 900)] + \
           [("b", float(v)) for v in np.concatenate(
               [rng.uniform(0, 10, 300), rng.uniform(90, 100, 100)])]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v"])).localCheckpoint()


def test_qh_merge_equals_direct(spark, vframe):
    a = vframe.filter(F.col("k") == "a").withColumn("k", F.lit("all"))
    b = vframe.filter(F.col("k") == "b").withColumn("k", F.lit("all"))
    direct = S.qh_sketch(vframe.withColumn("k", F.lit("all")),
                         ["k"], "v", 0.0, 100.0)
    merged = S.qh_merge([S.qh_sketch(a, ["k"], "v", 0.0, 100.0),
                         S.qh_sketch(b, ["k"], "v", 0.0, 100.0)], ["k"])
    sym = direct.exceptAll(merged).union(merged.exceptAll(direct))
    assert sym.count() == 0


def test_qh_quantiles_match_python_twin_and_truth(spark, vframe):
    qs = [0.25, 0.5, 0.9, 0.99, 1.0]
    sk = S.qh_sketch(vframe, ["k"], "v", 0.0, 100.0)
    got = {(r["k"], r["q"]): r["est"]
           for r in S.qh_quantiles(sk, ["k"], qs, 0.0, 100.0).collect()}
    pdf = vframe.toPandas()
    for k, grp in pdf.groupby("k"):
        vals = grp["v"].tolist()
        for q in qs:
            assert got[(k, q)] == S.qh_quantile_py(vals, q, 0.0, 100.0), \
                (k, q)
            # within one bin width of the exact empirical quantile
            import numpy as np
            exact = float(np.quantile(np.array(vals), q))
            assert abs(got[(k, q)] - exact) <= 100.0 / S.QH_BINS + 1e-9, \
                (k, q, got[(k, q)], exact)


def test_qh_out_of_domain_clamps(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["x"] * 4, "v": [-5.0, 0.0, 99.9, 140.0]}))
    sk = S.qh_sketch(df, ["k"], "v", 0.0, 100.0)
    rows = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert rows.get(0) == 2 and rows.get(S.QH_BINS - 1) == 2


def test_qh_partition_invariance(spark, vframe):
    outs = []
    for parts in (1, 13):
        est = S.qh_quantiles(
            S.qh_sketch(vframe.repartition(parts), ["k"], "v", 0.0, 100.0),
            ["k"], [0.5, 0.95], 0.0, 100.0)
        outs.append({(r["k"], r["q"]): r["est"] for r in est.collect()})
    assert outs[0] == outs[1]


def test_tile_distinct_pyramid_rollup_equals_direct(spark):
    """Pyramid HLL: every coarser level's rolled-up registers equal a
    direct sketch built at that resolution (register-for-register), and
    per-tile estimates track exact distinct counts."""
    from mbrngq_spark import grid
    from mbrngq_spark.operators.tiles import tile_distinct_pyramid
    from tests.conftest import SF_DIR
    from mbrngq_spark.functions import derive

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_geo = derive.with_geometry(docs).select("doc_id", "x", "y")
    dg = docs_geo.withColumn("user", F.col("doc_id") % 37)
    pyr = tile_distinct_pyramid(dg, "user", [2, 4, 6]).collect()
    got = {}
    for r in pyr:
        got.setdefault(r["res"], {})[(r["cell"], r["register"])] = r["rho"]
    assert set(got) == {2, 4, 6}
    for res in (2, 4):
        direct = S.hll_sketch(
            dg.withColumn("cell", grid.cell_encode(F.col("x"), F.col("y"),
                                                   res)),
            ["cell"], "user")
        exp = {(r["cell"], r["register"]): r["rho"]
               for r in direct.collect()}
        assert got[res] == exp, res
    # estimate sanity at the coarsest level vs exact distinct
    est = {r["cell"]: r["estimate"] for r in S.hll_estimate(
        spark.createDataFrame(
            [(c, reg, rho) for (c, reg), rho in got[2].items()],
            "cell long, register long, rho long"), ["cell"]).collect()}
    exact = {r["cell"]: r["n"] for r in
             dg.withColumn("cell", grid.cell_encode(F.col("x"), F.col("y"),
                                                    2))
             .groupBy("cell").agg(F.countDistinct("user").alias("n"))
             .collect()}
    for c, n in exact.items():
        assert abs(est[c] / n - 1) < 0.25, (c, est[c], n)


# --- KMV / theta: bottom-k distinct hashes, set algebra ----------------------

def test_kmv_hash_twins_bit_equal(spark, frame):
    import duckdb
    rows = frame.select(
        "item", S.kmv_hash_col(F.col("item")).alias("h")).collect()
    for r in rows[:50]:
        assert r["h"] == S.kmv_hash_py(r["item"])
    pdf = frame.select("item").distinct().toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    duck = dict(con.sql(
        f"SELECT item, {S.kmv_hash_sql('item')} FROM t").fetchall())
    for r in rows:
        assert duck[r["item"]] == r["h"]


def test_kmv_merge_equals_direct(spark, frame):
    """bottom-k(A ∪ B) == bottom-k(merge of per-part bottom-k) row-for-
    row — exact mergeability (a union's k minima come from some part's
    k minima)."""
    a = frame.filter(F.col("k") == "a").withColumn("k", F.lit("all"))
    b = frame.filter(F.col("k") == "b").withColumn("k", F.lit("all"))
    direct = S.kmv_sketch(frame.withColumn("k", F.lit("all")),
                          ["k"], "item")
    merged = S.kmv_merge([S.kmv_sketch(a, ["k"], "item"),
                          S.kmv_sketch(b, ["k"], "item")], ["k"])
    sym = direct.exceptAll(merged).union(merged.exceptAll(direct))
    assert sym.count() == 0


def test_kmv_sketch_matches_duckdb_twin(spark, frame):
    import duckdb
    got = {(r["k"], r["rk"]): r["h"]
           for r in S.kmv_sketch(frame, ["k"], "item").collect()}
    con = duckdb.connect()
    con.register("t", frame.toPandas())
    exp = {(k, rk): h for k, rk, h in con.sql(
        S.kmv_sketch_sql("t", "k", "item")).fetchall()}
    assert got == exp


def test_kmv_estimate_accuracy_and_python_twin(spark, frame):
    ests = {r["k"]: (r["n_sample"], r["estimate"])
            for r in S.kmv_estimate(
                S.kmv_sketch(frame, ["k"], "item"), ["k"]).collect()}
    items = {k: [r["item"] for r in
                 frame.filter(F.col("k") == k).distinct().collect()]
             for k in ("a", "b")}
    # b has 60 < K=64 distinct items → the exact branch
    assert ests["b"] == (60, 60.0)
    # a has 730 distinct → the estimator branch; exact-equal to the
    # Python twin, and within the ~1/sqrt(K-2) KMV error envelope
    assert ests["a"][0] == S.KMV_K
    assert ests["a"][1] == S.kmv_estimate_py(items["a"])
    assert abs(ests["a"][1] / 730 - 1) < 0.5


def test_kmv_intersection_matches_twin_and_envelope(spark, frame):
    import duckdb
    import pandas as pd
    # high-overlap fixture: c ⊃ a-side items so |a ∩ c| is large enough
    # for the theta estimator to be meaningful at K=64
    rows = ([("a", it) for it in _items("x", 700)]
            + [("c", it) for it in _items("x", 700)]
            + [("c", it) for it in _items("z", 300)])
    big = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "item"]))
    sk = S.kmv_sketch(big, ["k"], "item")
    got = S.kmv_intersect_pairs(sk, "k").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["key_a"], r["key_b"]) == ("a", "c")
    tw = S.kmv_intersect_py([x for k, x in rows if k == "a"],
                            [x for k, x in rows if k == "c"])
    assert r["estimate"] == tw
    assert abs(r["estimate"] / 700 - 1) < 0.6
    con = duckdb.connect()
    con.register("t", big.toPandas())
    duck = con.sql(S.kmv_intersect_pairs_sql(
        S.kmv_sketch_sql("t", "k", "item"))).fetchall()
    assert [(r["key_a"], r["key_b"], r["n_common"], r["estimate"])] \
        == duck
    # disjoint pair: estimate must be exactly 0 in every engine
    rows2 = ([("p", it) for it in _items("p", 200)]
             + [("q", it) for it in _items("q", 200)])
    d2 = spark.createDataFrame(pd.DataFrame(rows2, columns=["k", "item"]))
    r2 = S.kmv_intersect_pairs(
        S.kmv_sketch(d2, ["k"], "item"), "k").collect()
    assert len(r2) == 1 and r2[0]["n_common"] == 0 \
        and r2[0]["estimate"] == 0.0


def test_kmv_rank_shuffle_is_group_limited(spark, frame):
    """Scale shape: the bottom-k rank must plan as WindowGroupLimit —
    each map task forwards ≤ K rows per key into the exchange, so the
    rank shuffle is sketch-sized, never corpus-sized."""
    plan = S.kmv_sketch(frame, ["k"], "item") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_kmv_pair_stats_matches_twins_and_truth(spark, frame):
    """Union/jaccard pair estimates: exact-equal to the Python AND
    DuckDB twins, and within the KMV error envelope of the true overlap
    (frame: |a|=730, |b|=60, |a∩b|=30, |a∪b|=760 → true j ≈ 0.0395)."""
    import duckdb
    sk = S.kmv_sketch(frame, ["k"], "item")
    got = S.kmv_pair_stats(sk, "k").collect()
    assert len(got) == 1
    r = got[0]
    items = {k: [x["item"] for x in
                 frame.filter(F.col("k") == k).distinct().collect()]
             for k in ("a", "b")}
    assert r["jaccard"] == S.kmv_jaccard_py(items["a"], items["b"])
    con = duckdb.connect()
    con.register("t", frame.toPandas())
    duck = con.sql(S.kmv_pair_stats_sql(
        S.kmv_sketch_sql("t", "k", "item"))).fetchall()
    assert [(r["key_a"], r["key_b"], r["n_common"], r["est_inter"],
             r["est_union"], r["jaccard"])] == duck
    # union is estimator-branch (760 > K); envelope like the base test
    assert abs(r["est_union"] / 760 - 1) < 0.5
    assert 0.0 <= r["jaccard"] <= 1.0
