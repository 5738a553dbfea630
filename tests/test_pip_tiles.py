"""Point-in-polygon (general concave polygons vs NumPy PNPOLY oracle) and
raster-tile ↔ vector assignment."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import grid
from mbrngq_spark.functions import derive
from mbrngq_spark.operators.pip import point_in_polygon_join
from mbrngq_spark.operators.tiles import assign_tiles, tile_vector_assignment
from mbrngq_spark.oracle import point_in_polygon as np_pip
from tests.conftest import SF_DIR

# a concave "arrow" and a star-ish concave pentagon — exercises the even-odd
# rule beyond what convex half-plane tests cover
POLYS = pd.DataFrame({
    "poly_id": [0, 1],
    "vx": [[10.0, 50.0, 50.0, 30.0, 50.0, 50.0, 10.0],
           [60.0, 95.0, 70.0, 90.0, 65.0]],
    "vy": [[40.0, 40.0, 55.0, 30.0, 5.0, 20.0, 20.0],
           [60.0, 65.0, 75.0, 95.0, 90.0]],
})


@pytest.fixture(scope="module")
def docs_geo(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return derive.with_geometry(docs).select("doc_id", "x", "y", "category")


def test_pip_concave_matches_numpy_oracle(spark, docs_geo):
    got = point_in_polygon_join(spark, docs_geo, POLYS).toPandas()
    pdf = docs_geo.toPandas()
    for _, p in POLYS.iterrows():
        exp_mask = np_pip(pdf.x.to_numpy(), pdf.y.to_numpy(),
                          np.array(p.vx), np.array(p.vy))
        exp = set(pdf.doc_id[exp_mask])
        sub = set(got[got.poly_id == p.poly_id]["doc_id"])
        assert sub == exp, f"poly {p.poly_id}: {len(sub)} vs {len(exp)}"


def test_pip_count_sanity(spark, docs_geo):
    # the arrow polygon is non-trivial: some docs inside, most outside
    got = point_in_polygon_join(spark, docs_geo, POLYS).toPandas()
    n = docs_geo.count()
    for pid in (0, 1):
        k = (got.poly_id == pid).sum()
        assert 0 < k < n


def test_tile_vector_assignment(spark, docs_geo):
    got = tile_vector_assignment(spark, docs_geo, POLYS, res=4).toPandas()
    # ground truth: PIP oracle + row-major tile encode
    pdf = docs_geo.toPandas()
    tiles_all = grid.np_quantize(pdf.y.to_numpy(), 0.0, 100.0, 4) * 16 + \
        grid.np_quantize(pdf.x.to_numpy(), 0.0, 100.0, 4)
    for _, p in POLYS.iterrows():
        mask = np_pip(pdf.x.to_numpy(), pdf.y.to_numpy(),
                      np.array(p.vx), np.array(p.vy))
        exp = pd.Series(tiles_all[mask]).value_counts()
        sub = got[got.poly_id == p.poly_id].set_index("tile_id")["n_docs"]
        assert sub.sort_index().to_dict() == exp.sort_index().to_dict()


def test_tile_assignment_deterministic_total(spark, docs_geo):
    out = assign_tiles(docs_geo, res=6)
    assert out.count() == docs_geo.count()
    # every tile id within range
    mx = out.agg(F.max("tile_id")).collect()[0][0]
    assert 0 <= mx < 4096
