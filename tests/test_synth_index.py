"""Synthetic source determinism + index build + the span-sequence invariant
(input_hint: (kind, text, media_ref, order) byte-identical through every
shuffle/join)."""

import pytest
from pyspark.sql import functions as F

from mbrngq_spark.index import IndexLayout, build_index, verify_span_invariant, \
    write_index, read_index
from mbrngq_spark.sources.synth import documents_spans, query_points, \
    span_checksum, with_geometry_spans


@pytest.fixture(scope="module")
def docs(spark):
    return with_geometry_spans(documents_spans(spark, 2000))


def test_documents_deterministic(spark):
    a = documents_spans(spark, 200).collect()
    b = documents_spans(spark, 200).collect()
    assert a == b
    assert all(1 <= len(r.spans) <= 4 for r in a)
    # offsets are the positions 0..len-1 in order
    assert all([s.offset for s in r.spans] == list(range(len(r.spans))) for r in a)
    # text spans carry text, media spans carry refs
    for r in a:
        for s in r.spans:
            if s.kind == "text":
                assert s.text and not s.media_ref
            else:
                assert s.media_ref and not s.text


def test_geometry_distributions(spark):
    base = documents_spans(spark, 3000)
    uni = with_geometry_spans(base, distribution="uniform").select("x", "y").toPandas()
    isl = with_geometry_spans(base, distribution="gaussian_island").select("x", "y").toPandas()
    assert uni.x.between(0, 100).all() and isl.x.between(0, 100).all()
    # island is the skew fixture: much tighter spread than uniform
    assert isl.x.std() < uni.x.std() * 0.6


def test_span_invariant_through_shuffle_and_join(spark, docs):
    with_ck = docs.withColumn("span_ck", span_checksum(F.col("spans")))
    # force a wide shuffle + a self-join, then re-verify
    shuffled = with_ck.repartition(16, "category").sortWithinPartitions("x")
    other = docs.select("doc_id", F.col("x").alias("x2"))
    joined = shuffled.join(other, "doc_id")
    assert verify_span_invariant(joined) == 0
    assert joined.count() == docs.count()


def test_index_build_and_partition_prune(spark, docs, tmp_path):
    layout = IndexLayout(hot_threshold=10_000_000)  # no hot cells at this n
    indexed, stats = build_index(docs, layout)
    path = str(tmp_path / "idx")
    write_index(indexed, path)
    back = read_index(spark, path)
    assert back.count() == docs.count()
    assert verify_span_invariant(back) == 0
    # partition pruning: a coarse-cell filter must not read all files
    plan = back.filter(F.col("cell_coarse") == 0)._jdf.queryExecution() \
               .executedPlan().toString()
    assert "cell_coarse" in plan
    # stats ≡ recount (SURVEY.md §5d invariant)
    n_docs = docs.count()
    assert stats.agg(F.sum("n")).collect()[0][0] == n_docs
    # catmask only uses m bits
    assert stats.filter(F.col("catmask") >= 8).count() == 0


def test_adaptive_split_on_skew(spark):
    docs = with_geometry_spans(documents_spans(spark, 5000),
                               distribution="gaussian_island")
    layout = IndexLayout(hot_threshold=30)
    indexed, stats = build_index(docs, layout)
    hot = indexed.filter(F.col("is_hot"))
    assert hot.count() > 0, "island fixture must trigger hot cells"
    # hot docs got finer cells and spread salts
    fine = hot.select(F.countDistinct("cell_fine").alias("nf"),
                      F.countDistinct("cell").alias("nc"),
                      F.countDistinct("salt").alias("ns")).collect()[0]
    assert fine.nf > fine.nc
    assert fine.ns > 1


def test_query_points_in_bounds(spark):
    qp = query_points(spark, 100).toPandas()
    assert qp.qx.between(0, 100).all() and qp.qy.between(0, 100).all()
    assert len(qp) == 100
