"""Co-located joins via bucketing — the zero-shuffle layout for repeated
cell-keyed joins (brief: "bucketing for co-located joins").

At 100 TB the index and any cell-keyed companion table (tile stats,
per-cell models, the ε-join probe side) are written bucketed by cell; a
join between two tables bucketed the same way needs NO Exchange on either
side. This test proves the engine's layout delivers exactly that plan."""

import pytest
from pyspark.sql import functions as F

from mbrngq_spark import grid
from mbrngq_spark.functions import derive
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .transform(derive.with_geometry)
            .withColumn("cell", grid.cell_encode(F.col("x"), F.col("y"), 4))
            .select("doc_id", "x", "y", "category", "cell"))
    # external tables under tmp_path (warehouse.dir is a static conf)
    (docs.write.mode("overwrite")
     .option("path", str(tmp_path / "docs_b"))
     .bucketBy(N_BUCKETS, "cell").sortBy("cell")
     .saveAsTable("docs_b"))
    (docs.groupBy("cell").agg(F.count("*").alias("n_cell"))
     .write.mode("overwrite")
     .option("path", str(tmp_path / "stats_b"))
     .bucketBy(N_BUCKETS, "cell").sortBy("cell")
     .saveAsTable("stats_b"))
    yield "docs_b", "stats_b"
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")


def test_bucketed_cell_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "cell")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, \
            "bucketed cell join must be co-located (no shuffle)"
        assert joined.count() == spark.table(a).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_values_match_unbucketed(spark, bucketed_pair):
    a, b = bucketed_pair
    bucketed = (spark.table(a).join(spark.table(b), "cell")
                .groupBy("cell").agg(F.count("*").alias("n"),
                                     F.max("n_cell").alias("nc"))
                .toPandas().sort_values("cell").reset_index(drop=True))
    # every doc joins its cell's stats row; n == n_cell per cell
    assert (bucketed["n"] == bucketed["nc"]).all()
