"""Trainable quality classifier (VERDICT r5 item 5): the distributed
logistic-regression trainer must walk the identical quantized-gradient
trajectory as the pure-Python reference (the oracle's weight source),
on BOTH sides of the hybrid local/distributed threshold, and the
learned scores must actually rank quality (AUC sanity vs the noisy
seed labels)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators import quality as Q


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame({"text": Q.quality_fixture()})).localCheckpoint()


def test_feature_and_label_twins_bit_equal(spark, corpus):
    """JVM Column features/labels == pure-Python features/labels,
    bit-for-bit (exact IEEE over integer counts — the cross-engine
    contract every trainer path relies on)."""
    t = F.col("text")
    rows = corpus.select(
        "text", *[c.alias(f"x{j}")
                  for j, c in enumerate(Q.quality_feature_cols(t))],
        Q.quality_label_col(t).alias("y")).collect()
    for r in rows:
        feats = Q.quality_features_py(r["text"])
        assert [r[f"x{j}"] for j in range(Q.N_FEATURES)] == feats
        assert r["y"] == Q.quality_label_py(r["text"])


def test_hybrid_paths_equal_at_threshold_boundary(spark, corpus):
    """local_threshold=0 forces the per-iteration distributed
    aggregation; the default takes the driver-local matrix path. Both
    must equal the reference trainer exactly (the quantized-update
    construction makes sum-order jitter invisible)."""
    w_ref = Q.train_quality_reference(Q.quality_fixture(), iters=6)
    w_local = Q.train_quality_classifier(corpus, iters=6)
    w_dist = Q.train_quality_classifier(corpus, iters=6,
                                        local_threshold=0)
    assert w_local == w_ref
    assert w_dist == w_ref


def test_auc_sanity(spark, corpus):
    """The learned model must rank the (noise-flipped) seed labels well:
    noise caps attainable AUC at ~0.875; require > 0.8."""
    w = Q.train_quality_classifier(corpus)
    scored = Q.score_quality(corpus, w).select(
        "quality_score", Q.quality_label_col(F.col("text")).alias("y"))
    pdf = scored.toPandas()
    a = Q.auc(pdf["quality_score"].tolist(), pdf["y"].tolist())
    assert a > 0.8, a


def test_scoring_is_map_only(spark, corpus):
    """score_quality at 100 TB is a pure-codegen projection: no
    Exchange anywhere in its plan."""
    w = Q.train_quality_reference(Q.quality_fixture())
    plan = Q.score_quality(corpus, w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_score_sql_twin_matches_column_form(spark, corpus):
    """quality_score_sql (the DuckDB replay) == quality_score_col on the
    same weights, via Spark's own SQL parser — guards expression drift
    between the two generators."""
    w = Q.train_quality_reference(Q.quality_fixture())
    both = corpus.select(
        Q.quality_score_col(F.col("text"), w).alias("a"),
        F.expr(Q.quality_score_sql("text", w)).alias("b"))
    assert both.filter(F.col("a") != F.col("b")).count() == 0
