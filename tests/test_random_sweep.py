"""Seeded randomized query sweeps on all three reference distributions —
the enabled version of the reference's disabled 10k soak loop
(mbR-NGQ/UI/RTreeViewer.cs:63-72, SURVEY.md §5c). Uniform exercises the
average case; gaussian-island is the dense-cell skew case the planner and
the L-truncation bound must survive."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators.knn import knn_join
from mbrngq_spark.operators.ngq import nearest_group
from mbrngq_spark.oracle import knn_bruteforce, ngq_bruteforce
from mbrngq_spark.sources.synth import documents_spans, query_points, \
    with_geometry_spans

N_DOCS = 400
N_QUERIES = 25


@pytest.fixture(scope="module", params=["uniform", "gaussian", "gaussian_island"])
def corpus(request, spark):
    docs = (with_geometry_spans(documents_spans(spark, N_DOCS),
                                distribution=request.param)
            .withColumn("doc_id", F.substring("doc_id", 5, 8).cast("long"))
            .select("doc_id", "x", "y", "category"))
    return request.param, docs.cache(), docs.toPandas()


@pytest.fixture(scope="module")
def queries(spark):
    return query_points(spark, N_QUERIES).toPandas()


def test_knn_sweep(spark, corpus, queries):
    dist, docs, pdf = corpus
    got = knn_join(spark, docs, queries, k=7).toPandas()
    for _, q in queries.iterrows():
        exp = knn_bruteforce(pdf, q.qx, q.qy, k=7)
        sub = got[got.query_id == q.query_id].sort_values("rank")
        assert sub.doc_id.tolist() == exp.doc_id.tolist(), \
            f"{dist}: kNN mismatch at query {q.query_id}"


def test_ngq_sweep(spark, corpus, queries):
    dist, docs, pdf = corpus
    got = (nearest_group(spark, docs, queries, k=8, L=24)
           .orderBy("query_id", "group_rank").toPandas())
    assert got["exact"].all(), f"{dist}: truncation bound violated"
    for _, q in queries.iterrows():
        exp = ngq_bruteforce(pdf, q.qx, q.qy, m=3, k=8)
        sub = got[got.query_id == q.query_id].reset_index(drop=True)
        assert len(sub) == len(exp), f"{dist}: count mismatch q{q.query_id}"
        for c in range(3):
            assert sub[f"c{c}_id"].tolist() == exp[f"c{c}_id"].tolist(), \
                f"{dist}: NGQ member mismatch at query {q.query_id} cat {c}"
        np.testing.assert_allclose(sub.min_dist.to_numpy(),
                                   exp.min_dist.to_numpy(), rtol=0, atol=1e-9)
