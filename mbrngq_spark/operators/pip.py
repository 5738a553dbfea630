"""Point-in-polygon join (north_rule operator).

Generalizes the reference's containment range query (RTree.Contains,
mbR-NGQ/Data/RTree.cs:2002-2070 — SURVEY.md Q2) from rects to polygons:

  prune   — docs ⋈_broadcast covering-cells(polygon bbox)  (index prune,
            same shape as range_query.py; cells at index resolution)
  refine  — exact even-odd ray-crossing test in a VECTORIZED pandas UDF
            (Arrow batches; the polygon vertex table is a closure-captured
            broadcast — polygons are the small side by assumption).

The doc side is never shuffled; the UDF is the only Python in the path and
runs on Arrow batches (input_hint: no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbrngq_spark.config import DEFAULT, EngineConfig
from mbrngq_spark.operators.knn import with_cell
from mbrngq_spark.operators.range_query import covering_cells


def _pip_kernel(px: np.ndarray, py: np.ndarray,
                vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Even-odd ray crossing (PNPOLY), vectorized over points."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(vx)
    j = n - 1
    for i in range(n):
        cond = ((vy[i] > py) != (vy[j] > py)) & \
               (px < (vx[j] - vx[i]) * (py - vy[i]) / (vy[j] - vy[i]) + vx[i])
        inside ^= cond
        j = i
    return inside


def point_in_polygon_join(spark: SparkSession, docs_geo: DataFrame,
                          polygons: pd.DataFrame, res: int | None = None,
                          cfg: EngineConfig = DEFAULT,
                          id_col: str = "doc_id") -> DataFrame:
    """docs × polygons containment join.

    ``polygons``: pandas (poly_id, vx: list[float], vy: list[float]).
    Returns (poly_id, doc_id, x, y) for docs strictly inside each polygon
    (even-odd rule)."""
    res = res or cfg.index_res
    # bbox covers → reuse the rect machinery for the prune phase
    bboxes = pd.DataFrame({
        "rect_id": polygons["poly_id"],
        "xmin": [min(v) for v in polygons["vx"]],
        "ymin": [min(v) for v in polygons["vy"]],
        "xmax": [max(v) for v in polygons["vx"]],
        "ymax": [max(v) for v in polygons["vy"]],
    })
    cover = covering_cells(bboxes, res, cfg).rename(columns={"rect_id": "poly_id"})
    cover_df = spark.createDataFrame(cover)
    docs_c = with_cell(docs_geo, res, cfg)
    cand = docs_c.join(F.broadcast(cover_df), "cell")

    polys = {int(r.poly_id): (np.asarray(r.vx, dtype=np.float64),
                              np.asarray(r.vy, dtype=np.float64))
             for r in polygons.itertuples(index=False)}

    @F.pandas_udf(T.BooleanType())
    def pip(poly_id: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        px = x.to_numpy(np.float64)
        py = y.to_numpy(np.float64)
        pid = poly_id.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        for p, (vx, vy) in polys.items():
            mask = pid == p
            if mask.any():
                out[mask] = _pip_kernel(px[mask], py[mask], vx, vy)
        return pd.Series(out)

    return (cand
            .filter(pip(F.col("poly_id"), F.col("x"), F.col("y")))
            .select("poly_id", id_col, "x", "y"))
