"""Focused tests for the round-7 optimization internals.

Each optimization changed HOW an operator executes, never WHAT it
computes — these tests pin the invariants the rewrites rely on:
memoized encoder Columns are value-identical and actually cached,
input spreading never changes values, the scoped shuffle override
always restores session state, and the pandas / distributed
nearest_group paths stay row-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import grid
from mbrngq_spark.config import DEFAULT, bounded_shuffle, refine_partitions, \
    spread_small_input


def test_cell_encode_named_matches_and_caches(spark):
    df = spark.range(500).select(
        (F.rand(7) * 100).alias("x"), (F.rand(11) * 100).alias("y"))
    df = df.select(F.round("x", 6).alias("x"), F.round("y", 6).alias("y"))
    a = df.select(grid.cell_encode(F.col("x"), F.col("y"), 7, DEFAULT)
                  .alias("c")).collect()
    b = df.select(grid.cell_encode_named(7, DEFAULT).alias("c")).collect()
    assert [r.c for r in a] == [r.c for r in b]
    # identical Column object returned on repeat (the py4j-build memo)
    c1 = grid.cell_encode_named(7, DEFAULT)
    c2 = grid.cell_encode_named(7, DEFAULT)
    assert c1 is c2
    # distinct key → distinct expression
    assert grid.cell_encode_named(6, DEFAULT) is not c1


def test_row_major_tile_named_matches(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0.0, 50.0, 99.9], "y": [0.0, 50.0, 99.9]}))
    a = df.select(grid.row_major_tile_id(F.col("x"), F.col("y"), 6, DEFAULT)
                  .alias("t")).collect()
    b = df.select(grid.row_major_tile_id_named(6, DEFAULT).alias("t")) \
        .collect()
    assert [r.t for r in a] == [r.t for r in b]


def test_spread_small_input_values_and_parallelism(spark):
    df = spark.range(100).coalesce(1).select(F.col("id"))
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_input(df)
    assert out.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(100))
    # an already-wide input passes through untouched (no added shuffle)
    wide = spark.range(100).repartition(
        spark.sparkContext.defaultParallelism + 4)
    assert spread_small_input(wide) is wide


def test_bounded_shuffle_restores_conf_on_error(spark):
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    with pytest.raises(RuntimeError):
        with bounded_shuffle(spark):
            assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= 8
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe


def test_refine_partitions_positive(spark):
    assert refine_partitions(spark) >= 1


def test_nearest_group_pandas_vs_distributed_identical(spark):
    from mbrngq_spark.operators.ngq import nearest_group
    from mbrngq_spark.sources.synth import documents_spans, query_points, \
        with_geometry_spans

    docs = (with_geometry_spans(documents_spans(spark, 4000),
                                distribution="gaussian_island")
            .withColumn("doc_id", F.substring("doc_id", 5, 8).cast("long"))
            .select("doc_id", "x", "y", "category"))
    docs = docs.cache()
    qp = query_points(spark, 25).toPandas()
    a = nearest_group(spark, docs, qp, k=5, L=8).toPandas()
    b = nearest_group(spark, docs, query_points(spark, 25), k=5, L=8) \
        .toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    docs.unpersist()


def test_build_index_hot_and_cold_schema_identical(spark):
    from mbrngq_spark.index import IndexLayout, build_index
    from mbrngq_spark.sources.synth import documents_spans, \
        with_geometry_spans

    docs = (with_geometry_spans(documents_spans(spark, 2000))
            .withColumn("doc_id", F.substring("doc_id", 5, 8).cast("long"))
            .select("doc_id", "x", "y", "category"))
    cold, _ = build_index(docs, IndexLayout(hot_threshold=10**9))
    hot, _ = build_index(docs, IndexLayout(hot_threshold=1))
    assert cold.columns == hot.columns
    assert [f.dataType for f in cold.schema.fields] == \
        [f.dataType for f in hot.schema.fields]
    # hot path actually split: fine cells differ from index cells somewhere
    assert hot.filter(F.col("cell_fine") != F.col("cell")).count() > 0
    assert cold.filter(F.col("cell_fine") != F.col("cell")).count() == 0
