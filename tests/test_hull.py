"""Distributed convex hull — partition-split equality, containment, and
degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import harness as H
from mbrngq_spark.functions import derive
from mbrngq_spark.operators.hull import convex_hull, np_monotone_chain
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_geo(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return derive.with_geometry(docs).select("doc_id", "x", "y", "category")


def _driver_hull(pdf):
    qx = np.round(pdf.x.to_numpy() * 1e6).astype(np.int64)
    qy = np.round(pdf.y.to_numpy() * 1e6).astype(np.int64)
    ids = pdf.doc_id.to_numpy().astype(np.int64)
    # dedup quantized points keeping min id
    import pandas as pd
    d = (pd.DataFrame({"id": ids, "qx": qx, "qy": qy})
         .groupby(["qx", "qy"], as_index=False)["id"].min())
    idx = np_monotone_chain(d["id"].to_numpy(), d["qx"].to_numpy(),
                            d["qy"].to_numpy())
    h = d.iloc[idx].reset_index(drop=True)
    return [(int(r.id), int(r.qx), int(r.qy)) for r in h.itertuples()]


def test_hull_matches_driver_chain_any_partitioning(spark, docs_geo):
    """Two-stage distributed hull == single driver-side chain, for both
    the natural layout and an adversarial 13-way random repartition
    (hull(∪ partition hulls) == hull(all))."""
    exp = _driver_hull(docs_geo.toPandas())
    for df in (docs_geo, docs_geo.repartition(13)):
        rows = sorted(convex_hull(df).collect(), key=lambda r: r.pos)
        got = [(int(r.id), int(r.qx), int(r.qy)) for r in rows]
        assert got == exp
        # next_id closes the cycle in emission order
        for i, r in enumerate(rows):
            assert int(r.next_id) == int(rows[(i + 1) % len(rows)].id)


def test_hull_contains_all_points_and_is_convex(spark, docs_geo):
    rows = sorted(convex_hull(docs_geo).collect(), key=lambda r: r.pos)
    hx = np.array([r.qx for r in rows], dtype=np.int64)
    hy = np.array([r.qy for r in rows], dtype=np.int64)
    pdf = docs_geo.toPandas()
    px = np.round(pdf.x.to_numpy() * 1e6).astype(np.int64)
    py = np.round(pdf.y.to_numpy() * 1e6).astype(np.int64)
    n = len(rows)
    for i in range(n):
        ax, ay = hx[i], hy[i]
        bx, by = hx[(i + 1) % n], hy[(i + 1) % n]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        assert (cross >= 0).all()  # every point left of / on every edge
        # strictly convex at each vertex (collinear vertices were popped)
        cx, cy = hx[(i + 2) % n], hy[(i + 2) % n]
        assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0


def test_hull_degenerate_inputs(spark):
    one = spark.createDataFrame([(7, 3.0, 4.0)], "doc_id long, x double, y double")
    got = convex_hull(one).collect()
    assert [(r.id, r.qx, r.qy) for r in got] == [(7, 3000000, 4000000)]
    two = spark.createDataFrame([(1, 5.0, 5.0), (2, 1.0, 9.0)],
                                "doc_id long, x double, y double")
    got = sorted(convex_hull(two).collect(), key=lambda r: r.pos)
    assert [(r.id, r.qx, r.qy) for r in got] == [
        (2, 1000000, 9000000), (1, 5000000, 5000000)]
    # duplicate quantized points collapse to the min id
    dup = spark.createDataFrame(
        [(9, 0.0, 0.0), (3, 0.0, 0.0), (5, 10.0, 0.0), (6, 0.0, 10.0)],
        "doc_id long, x double, y double")
    got = sorted(convex_hull(dup).collect(), key=lambda r: r.pos)
    assert sorted(int(r.id) for r in got) == [3, 5, 6]


def test_hull_diameter_is_global_max_pair(spark, docs_geo):
    """Farthest pair over the hull == exhaustive quadratic max over ALL
    quantized points, with the (a_id, b_id) tiebreak."""
    from mbrngq_spark.operators.hull import hull_diameter

    r = hull_diameter(docs_geo).collect()
    assert len(r) == 1
    r = r[0]
    pdf = docs_geo.toPandas()
    import pandas as pd
    qx = np.round(pdf.x.to_numpy() * 1e6).astype(np.int64)
    qy = np.round(pdf.y.to_numpy() * 1e6).astype(np.int64)
    ids = pdf.doc_id.to_numpy().astype(np.int64)
    d = (pd.DataFrame({"id": ids, "qx": qx, "qy": qy})
         .groupby(["qx", "qy"], as_index=False)["id"].min())
    x = d["qx"].to_numpy()[:, None] - d["qx"].to_numpy()[None, :]
    y = d["qy"].to_numpy()[:, None] - d["qy"].to_numpy()[None, :]
    d2 = x * x + y * y
    best = None
    di = d["id"].to_numpy()
    mx = d2.max()
    ii, jj = np.where(d2 == mx)
    for i, j in zip(ii, jj):
        a, b = sorted((int(di[i]), int(di[j])))
        if best is None or (a, b) < best:
            best = (a, b)
    assert (int(r.a_id), int(r.b_id), int(r.d2q)) == (*best, int(mx))
    assert float(r.dist) == float(np.sqrt(float(mx))) / 1e6


def test_hull_diameter_tiebreak(spark):
    """A square has two equal diagonals — the (a_id, b_id) tiebreak must
    pick the lexicographically smallest pair."""
    from mbrngq_spark.operators.hull import hull_diameter

    sq = spark.createDataFrame(
        [(4, 0.0, 0.0), (2, 1.0, 0.0), (3, 1.0, 1.0), (9, 0.0, 1.0)],
        "doc_id long, x double, y double")
    r = hull_diameter(sq).collect()[0]
    # diagonals: (4,3) and (2,9) -> sorted pairs (3,4) and (2,9); min = (2,9)
    assert (int(r.a_id), int(r.b_id)) == (2, 9)


def test_skyline_matches_quadratic_dominance(spark, docs_geo):
    """Two-stage skyline == O(n²) dominance check on the quantized
    points, under natural AND adversarial partitioning."""
    import pandas as pd
    from mbrngq_spark.operators.hull import skyline

    pdf = docs_geo.toPandas()
    qx = np.round(pdf.x.to_numpy() * 1e6).astype(np.int64)
    qy = np.round(pdf.y.to_numpy() * 1e6).astype(np.int64)
    ids = pdf.doc_id.to_numpy().astype(np.int64)
    d = (pd.DataFrame({"id": ids, "qx": qx, "qy": qy})
         .groupby(["qx", "qy"], as_index=False)["id"].min())
    x = d["qx"].to_numpy(); y = d["qy"].to_numpy()
    dom = ((x[:, None] <= x[None, :]) & (y[:, None] <= y[None, :])
           & ((x[:, None] < x[None, :]) | (y[:, None] < y[None, :])))
    np.fill_diagonal(dom, False)
    exp = {(int(d["id"].iloc[i]), int(x[i]), int(y[i]))
           for i in range(len(d)) if not dom[:, i].any()}
    for df in (docs_geo, docs_geo.repartition(11)):
        got = {(int(r.id), int(r.qx), int(r.qy))
               for r in skyline(df).collect()}
        assert got == exp
    assert 0 < len(exp) < len(d)


def test_skyline_staircase_semantics(spark):
    """Hand-built fixture: the staircase keeps exactly the undominated
    points, including an x-tie resolved to the smaller y."""
    from mbrngq_spark.operators.hull import skyline

    pts = [(1, 1.0, 5.0), (2, 1.0, 7.0),   # x-tie: only (1,5) survives
           (3, 2.0, 3.0), (4, 3.0, 4.0),   # (3,4) dominated by (2,3)
           (5, 4.0, 1.0), (6, 5.0, 2.0)]   # (5,2) dominated by (4,1)
    df = spark.createDataFrame(pts, "doc_id long, x double, y double")
    got = sorted(int(r.id) for r in skyline(df).collect())
    assert got == [1, 3, 5]
