"""Polygon-polygon intersects join vs a NumPy orientation/PNPOLY oracle
— exact pair set on concave fixtures × per-doc squares, each pair
refined exactly once (min-shared-cell dedup)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.functions import derive
from mbrngq_spark.operators.overlay import polygon_intersects_join
from tests.conftest import SF_DIR

# the concave arrow + pentagon from the PIP tests
POLYS = pd.DataFrame({
    "a_id": [0, 1],
    "vx": [[10.0, 50.0, 50.0, 30.0, 50.0, 50.0, 10.0],
           [60.0, 95.0, 70.0, 90.0, 65.0]],
    "vy": [[40.0, 40.0, 55.0, 30.0, 5.0, 20.0, 20.0],
           [60.0, 65.0, 75.0, 95.0, 90.0]],
})
S = 2.0


def _orient(px, py, qx, qy, rx, ry):
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _seg_cross(a1, a2, b1, b2):
    o1 = _orient(*a1, *a2, *b1)
    o2 = _orient(*a1, *a2, *b2)
    o3 = _orient(*b1, *b2, *a1)
    o4 = _orient(*b1, *b2, *a2)
    return o1 * o2 < 0 and o3 * o4 < 0


def _pnpoly(px, py, vx, vy):
    n, inside, j = len(vx), False, len(vx) - 1
    for i in range(n):
        if ((vy[i] > py) != (vy[j] > py)
                and px < (vx[j] - vx[i]) * (py - vy[i])
                / (vy[j] - vy[i]) + vx[i]):
            inside = not inside
        j = i
    return inside


def _np_intersects(avx, avy, bvx, bvy):
    ae = [((avx[i], avy[i]), (avx[(i + 1) % len(avx)],
                              avy[(i + 1) % len(avx)]))
          for i in range(len(avx))]
    be = [((bvx[i], bvy[i]), (bvx[(i + 1) % len(bvx)],
                              bvy[(i + 1) % len(bvx)]))
          for i in range(len(bvx))]
    return (any(_seg_cross(e1[0], e1[1], e2[0], e2[1])
                for e1 in ae for e2 in be)
            or _pnpoly(bvx[0], bvy[0], avx, avy)
            or _pnpoly(avx[0], avy[0], bvx, bvy))


@pytest.fixture(scope="module")
def squares(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    g = derive.with_geometry(docs).select("doc_id", "x", "y")
    b = g.select(
        F.col("doc_id").alias("b_id"),
        F.array(F.col("x") - S, F.col("x") + S, F.col("x") + S,
                F.col("x") - S).alias("vx"),
        F.array(F.col("y") - S, F.col("y") - S, F.col("y") + S,
                F.col("y") + S).alias("vy"))
    return b, g.toPandas()


def test_overlay_matches_numpy_oracle(spark, squares):
    b, pdf = squares
    a = spark.createDataFrame(POLYS,
                              "a_id long, vx array<double>, vy array<double>")
    got = sorted((int(r.a_id), int(r.b_id))
                 for r in polygon_intersects_join(a, b).collect())
    exp = []
    for _, p in POLYS.iterrows():
        for r in pdf.itertuples():
            bvx = [r.x - S, r.x + S, r.x + S, r.x - S]
            bvy = [r.y - S, r.y - S, r.y + S, r.y + S]
            if _np_intersects(list(p.vx), list(p.vy), bvx, bvy):
                exp.append((int(p.a_id), int(r.doc_id)))
    assert got == sorted(exp)
    assert len(got) == len(set(got))  # min-cell dedup: no duplicate pairs
    assert 0 < len(got) < 2 * len(pdf)


def test_overlay_containment_both_ways(spark):
    """No edge crossings: tiny square inside the arrow, and the arrow
    inside a huge square — both directions must hit via the vertex
    containment fallback."""
    a = spark.createDataFrame(POLYS,
                              "a_id long, vx array<double>, vy array<double>")
    b = spark.createDataFrame(
        pd.DataFrame({
            "b_id": [100, 101, 102],
            "vx": [[14.0, 15.0, 15.0, 14.0],      # inside the arrow
                   [0.0, 99.0, 99.0, 0.0],        # contains everything
                   [70.0, 71.0, 71.0, 70.0]],     # inside the pentagon bbox
            "vy": [[35.0, 35.0, 36.0, 36.0],
                   [0.0, 0.0, 99.0, 99.0],
                   [10.0, 10.0, 11.0, 11.0]]}),
        "b_id long, vx array<double>, vy array<double>")
    got = sorted((int(r.a_id), int(r.b_id))
                 for r in polygon_intersects_join(a, b).collect())
    assert (0, 100) in got and (0, 101) in got and (1, 101) in got
    assert (1, 102) not in got and (0, 102) not in got


def test_polygon_measures_exact(spark):
    """Shoelace area / perimeter / centroid vs a Python replay with the
    SAME fold order — bit-exact doubles, signed area orientation, and
    null centroid on a degenerate ring."""
    from mbrngq_spark.operators.overlay import polygon_measures

    fixt = pd.DataFrame({
        "poly_id": [0, 1, 2, 3],
        "vx": [[0.0, 4.0, 4.0, 0.0],          # CCW square
               [0.0, 0.0, 4.0, 4.0],          # CW square (negative area)
               [10.0, 45.0, 20.0],            # triangle
               [5.0, 5.0, 5.0]],              # degenerate
        "vy": [[0.0, 0.0, 3.0, 3.0],
               [0.0, 3.0, 3.0, 0.0],
               [10.0, 15.0, 40.0],
               [5.0, 5.0, 5.0]],
    })
    df = spark.createDataFrame(
        fixt, "poly_id long, vx array<double>, vy array<double>")
    got = {int(r.poly_id): (r.area, r.perimeter, r.cx, r.cy)
           for r in polygon_measures(df).collect()}

    import math
    for _, p in fixt.iterrows():
        vx, vy = list(p.vx), list(p.vy)
        n = len(vx)
        two_a = per = cxn = cyn = 0.0
        for i in range(n):
            j = (i + 1) % n
            c = vx[i] * vy[j] - vx[j] * vy[i]
            two_a += c
            per += math.sqrt((vx[j] - vx[i]) ** 2 + (vy[j] - vy[i]) ** 2)
            cxn += (vx[i] + vx[j]) * c
            cyn += (vy[i] + vy[j]) * c
        g = got[int(p.poly_id)]
        assert g[0] == two_a / 2 and g[1] == per
        if two_a != 0:
            assert g[2] == cxn / (3 * two_a) and g[3] == cyn / (3 * two_a)
        else:
            assert g[2] is None and g[3] is None
    assert got[0][0] == 12.0 and got[1][0] == -12.0
