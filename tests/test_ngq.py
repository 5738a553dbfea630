"""NGQ vs the exhaustive brute-force oracle (the reference's CheckNearGroup
semantics, RTree.cs:1478-1595). Uses a doc subset small enough for full
enumeration while keeping L-truncation ACTIVE (L < per-category count), so
the exactness bound is genuinely exercised."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.config import EngineConfig
from mbrngq_spark.functions import derive
from mbrngq_spark.operators.ngq import nearest_group
from mbrngq_spark.oracle import ngq_bruteforce
from tests.conftest import SF_DIR

QUERIES = pd.DataFrame({
    "query_id": [0, 1, 2, 3, 4, 5, 6, 7],
    "qx": [11.5, 80.25, 50.0, 3.125, 97.5, 25.0, 66.0, 42.75],
    "qy": [23.25, 14.5, 50.0, 96.875, 2.5, 75.0, 33.5, 58.125],
})


@pytest.fixture(scope="module")
def docs_geo(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # subset: brute force is O(prod per-category sizes)
    return (derive.with_geometry(docs)
            .filter(F.col("doc_id") < 150)
            .select("doc_id", "x", "y", "category"))


@pytest.fixture(scope="module")
def docs_pdf(docs_geo):
    return docs_geo.toPandas()


@pytest.mark.parametrize("k,L", [(1, 8), (10, 16), (10, 32)])
def test_ngq_matches_bruteforce(spark, docs_geo, docs_pdf, k, L):
    cfg = EngineConfig(ngq_candidates=L)
    got = (nearest_group(spark, docs_geo, QUERIES, k=k, L=L, cfg=cfg)
           .orderBy("query_id", "group_rank").toPandas())
    assert got["exact"].all(), "L-truncation bound violated — raise L"
    for _, q in QUERIES.iterrows():
        exp = ngq_bruteforce(docs_pdf, q.qx, q.qy, m=3, k=k)
        sub = got[got.query_id == q.query_id].reset_index(drop=True)
        assert len(sub) == len(exp)
        for c in range(3):
            assert sub[f"c{c}_id"].tolist() == exp[f"c{c}_id"].tolist(), \
                f"query {q.query_id} members mismatch in category {c}"
        np.testing.assert_allclose(sub.min_dist.to_numpy(),
                                   exp.min_dist.to_numpy(), rtol=0, atol=1e-9)


def test_ngq_distributed_queries_match_pandas_mode(spark, docs_geo):
    """Spark-DataFrame queries (distributed planner + distributed
    escalation bookkeeping) must equal the pandas-mode output."""
    q_df = spark.createDataFrame(QUERIES)
    a = (nearest_group(spark, docs_geo, QUERIES, k=5, L=16)
         .orderBy("query_id", "group_rank").toPandas())
    b = (nearest_group(spark, docs_geo, q_df.repartition(4), k=5, L=16)
         .orderBy("query_id", "group_rank").toPandas())
    for c in ("query_id", "group_rank", "c0_id", "c1_id", "c2_id"):
        assert a[c].tolist() == b[c].tolist()
    np.testing.assert_allclose(a.min_dist.to_numpy(), b.min_dist.to_numpy(),
                               rtol=0, atol=0)


def test_certifying_L_distributed_matches_driver(spark, docs_geo):
    """The mapInPandas certifying-L (distributed escalation bookkeeping)
    must equal the driver-side NumPy computation on the same stats + bad
    set — it is the same kernel, batched behind a broadcast."""
    from mbrngq_spark.operators.knn import certifying_L, \
        certifying_L_distributed, planner_stats
    stats, res = planner_stats(docs_geo, None, 16)
    bad = pd.DataFrame({"query_id": [0, 1, 2],
                        "qx": [10.0, 55.0, 90.0],
                        "qy": [12.0, 48.0, 77.0],
                        "kth": [8.0, 3.0, 15.0]})
    exp = certifying_L(stats, bad, res)
    got = certifying_L_distributed(
        spark, stats, spark.createDataFrame(bad).repartition(2), res)
    assert got == exp


def test_ngq_distributed_escalation_with_tiny_L(spark, docs_geo):
    """L=2 forces round-1 bound failures, so the DataFrame-queries run
    exercises the distributed escalation (semi/anti joins + mapInPandas
    certifying-L) end-to-end; both modes must converge to the same exact
    answers."""
    a = (nearest_group(spark, docs_geo, QUERIES, k=5, L=2)
         .orderBy("query_id", "group_rank").toPandas())
    b = (nearest_group(spark, docs_geo,
                       spark.createDataFrame(QUERIES).repartition(3),
                       k=5, L=2)
         .orderBy("query_id", "group_rank").toPandas())
    assert a["exact"].all() and b["exact"].all()
    for c in ("query_id", "group_rank", "c0_id", "c1_id", "c2_id"):
        assert a[c].tolist() == b[c].tolist()


@pytest.mark.parametrize("m", [2, 4, 5])
def test_ngq_parametric_m(spark, m):
    """Config.m is a free parameter in the reference (Config.cs:11) — the
    engine kernel must be generic over category count, not hardwired m=3."""
    cfg = EngineConfig(m=m)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_geo = (derive.with_geometry(docs, cfg)
                .filter(F.col("doc_id") < 120)
                .select("doc_id", "x", "y", "category"))
    pdf = docs_geo.toPandas()
    assert set(pdf.category.unique()) == set(range(m))
    got = (nearest_group(spark, docs_geo, QUERIES.head(4), k=3, L=10, cfg=cfg)
           .orderBy("query_id", "group_rank").toPandas())
    assert got["exact"].all()
    for _, q in QUERIES.head(4).iterrows():
        exp = ngq_bruteforce(pdf, q.qx, q.qy, m=m, k=3)
        sub = got[got.query_id == q.query_id].reset_index(drop=True)
        assert len(sub) == len(exp)
        for c in range(m):
            assert sub[f"c{c}_id"].tolist() == exp[f"c{c}_id"].tolist()


def test_ngq_group_has_one_member_per_category(spark, docs_geo, docs_pdf):
    got = nearest_group(spark, docs_geo, QUERIES, k=5, L=16).toPandas()
    cat_of = dict(zip(docs_pdf.doc_id, docs_pdf.category))
    for c in range(3):
        assert got[f"c{c}_id"].map(cat_of).eq(c).all()


def test_ngq_score_formula_spot_check(spark, docs_geo, docs_pdf):
    # recompute one group's score by hand: innerDist + interDist
    got = nearest_group(spark, docs_geo, QUERIES.head(1), k=1, L=16).toPandas()
    row = got.iloc[0]
    pts = docs_pdf.set_index("doc_id")
    mem = [(pts.loc[row[f"c{c}_id"], "x"], pts.loc[row[f"c{c}_id"], "y"])
           for c in range(3)]
    q = QUERIES.iloc[0]
    inner = max(np.hypot(a[0] - b[0], a[1] - b[1])
                for i, a in enumerate(mem) for b in mem[i + 1:])
    inter = min(np.hypot(a[0] - q.qx, a[1] - q.qy) for a in mem)
    assert row.min_dist == pytest.approx(inner + inter, abs=1e-9)
