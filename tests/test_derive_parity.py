"""Spark ↔ DuckDB bit-exact parity of the derived geometry.

The driver's correctness gate hashes values produced independently by Spark
and DuckDB; the derived (x, y, category) must therefore be BIT-identical in
both engines. These tests prove it on the real testdata documents table."""

import duckdb
import numpy as np

from mbrngq_spark.functions import derive
from tests.conftest import SF_DIR


def test_xy_cat_bit_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = (derive.with_geometry(docs)
           .select("doc_id", "x", "y", "category")
           .orderBy("doc_id")
           .toPandas())

    con = duckdb.connect()
    oracle = con.sql(f"""
        SELECT doc_id,
               {derive.x_sql()} AS x,
               {derive.y_sql()} AS y,
               {derive.category_sql()} AS category
        FROM '{SF_DIR}/documents.parquet'
        ORDER BY doc_id
    """).df()

    np.testing.assert_array_equal(got["doc_id"].to_numpy(), oracle["doc_id"].to_numpy())
    # bit-exact, not approx: both engines do the same int64 ops + one divide
    assert (got["x"].to_numpy() == oracle["x"].to_numpy()).all()
    assert (got["y"].to_numpy() == oracle["y"].to_numpy()).all()
    assert (got["category"].to_numpy() == oracle["category"].to_numpy()).all()


def test_geometry_in_bounds_and_spread(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pdf = derive.with_geometry(docs).select("x", "y", "category").toPandas()
    assert pdf["x"].between(0, 100).all()
    assert pdf["y"].between(0, 100).all()
    assert set(pdf["category"].unique()) == {0, 1, 2}
    # roughly uniform: each category gets a fair share
    counts = pdf["category"].value_counts()
    assert counts.min() > len(pdf) * 0.2
