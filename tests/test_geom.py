"""Geometry kernel unit tests — mirrors the reference's PointDist test
(UnitTest/RTreeTest.cs:11-17: dist((0,0),(10,10)) == sqrt(200) ± 1e-4) and
hand-computed MINDIST/MAXDIST values for the §2.3 formulas."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import geom

TOL = 1e-4  # the reference's own tolerance (UnitTest/RTreeTest.cs:16)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_point_dist(spark):
    c = geom.dist_point(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0))
    assert one(spark, c) == pytest.approx(math.sqrt(200.0), abs=TOL)


def test_mindist_point_rect(spark):
    # inside → 0
    c = geom.mindist_point_rect(F.lit(5.0), F.lit(5.0),
                                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0))
    assert one(spark, c) == 0.0
    # left of rect → pure x gap
    c = geom.mindist_point_rect(F.lit(-3.0), F.lit(5.0),
                                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0))
    assert one(spark, c) == pytest.approx(3.0, abs=TOL)
    # diagonal corner gap
    c = geom.mindist_point_rect(F.lit(-3.0), F.lit(-4.0),
                                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0))
    assert one(spark, c) == pytest.approx(5.0, abs=TOL)


def test_mindist_rect_rect(spark):
    # overlap → 0
    c = geom.mindist_rect_rect(F.lit(0.0), F.lit(0.0), F.lit(5.0), F.lit(5.0),
                               F.lit(4.0), F.lit(4.0), F.lit(9.0), F.lit(9.0))
    assert one(spark, c) == 0.0
    # disjoint, 3-4-5
    c = geom.mindist_rect_rect(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0),
                               F.lit(4.0), F.lit(5.0), F.lit(6.0), F.lit(7.0))
    assert one(spark, c) == pytest.approx(5.0, abs=TOL)


def test_maxdist_point_rect(spark):
    c = geom.maxdist_point_rect(F.lit(0.0), F.lit(0.0),
                                F.lit(1.0), F.lit(1.0), F.lit(4.0), F.lit(3.0))
    assert one(spark, c) == pytest.approx(5.0, abs=TOL)


def test_predicates(spark):
    inter = geom.rect_intersects(F.lit(0.0), F.lit(0.0), F.lit(5.0), F.lit(5.0),
                                 F.lit(5.0), F.lit(5.0), F.lit(9.0), F.lit(9.0))
    assert one(spark, inter) is True  # touching counts (<=/>=, Rectangle.cs:187-199)
    cont = geom.rect_contains(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                              F.lit(2.0), F.lit(2.0), F.lit(3.0), F.lit(3.0))
    assert one(spark, cont) is True


def test_numpy_twins_match_columns(spark):
    rng = np.random.default_rng(42)
    px, py = rng.uniform(0, 100, 50), rng.uniform(0, 100, 50)
    xmin, ymin = rng.uniform(0, 50, 50), rng.uniform(0, 50, 50)
    xmax, ymax = xmin + rng.uniform(0, 50, 50), ymin + rng.uniform(0, 50, 50)
    import pandas as pd
    pdf = pd.DataFrame(dict(px=px, py=py, xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax))
    df = spark.createDataFrame(pdf)
    got = (df.select(
        geom.mindist_point_rect(F.col("px"), F.col("py"), F.col("xmin"),
                                F.col("ymin"), F.col("xmax"), F.col("ymax")).alias("mind"),
        geom.maxdist_point_rect(F.col("px"), F.col("py"), F.col("xmin"),
                                F.col("ymin"), F.col("xmax"), F.col("ymax")).alias("maxd"))
        .toPandas())
    np.testing.assert_allclose(got["mind"],
                               geom.np_mindist_point_rect(px, py, xmin, ymin, xmax, ymax),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["maxd"],
                               geom.np_maxdist_point_rect(px, py, xmin, ymin, xmax, ymax),
                               rtol=0, atol=1e-12)


def test_group_min_dist():
    # equilateral-ish: members (0,0),(3,0),(0,4); q at (0,0)
    xy = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 4.0]])
    # inner = max pairwise = 5 (3-4-5); inter = min dist to q = 0
    assert geom.np_group_min_dist(xy, 0.0, 0.0) == pytest.approx(5.0)
    # q at (10,0): inter = 7 (to point (3,0))
    assert geom.np_group_min_dist(xy, 10.0, 0.0) == pytest.approx(12.0)
