"""kNN / nearest-neighbor join over the cell-grid index.

Re-expresses the reference's ``RTree.Nearest`` (mbR-NGQ/Data/RTree.cs:454-474
public, :2428-2456 recursive descent — SURVEY.md Q3) and its generalization to
top-k, Spark-first:

  phase 0  cell stats    — tiny per-(cell, category) aggregate table, bounded
                           by 4^res rows regardless of data size (at 100 TB it
                           is still ≤ 4^res·m rows → always broadcastable).
  phase 1  plan          — per query, a *provably sufficient* search radius
                           from the stats (vectorized NumPy, no driver loop
                           per row): sort cells by MINDIST(cell, q), take
                           cells until ≥ k docs are covered, radius = max
                           MAXDIST over taken cells. Any doc outside that
                           radius cannot be a top-k answer — this is the
                           distributed analog of the R-tree's best-first
                           MINDIST pruning (RTree.cs:2448-2452).
  phase 2  candidates    — explode (query_id, cell) pairs for cells with
                           MINDIST ≤ radius, broadcast-hash-join to docs on
                           cell id (no shuffle of the big side).
  phase 3  exact refine  — euclidean distance (Point.cs:67-75) + window
                           rank per query. One shuffle, keyed by query_id;
                           AQE skew-join splits hot queries.

Tie-breaking: deterministic (dist, doc_id) order (SURVEY.md §7.4 — the
reference's insertion-order heap ties, HeapPriorityQueue.cs:193-197, are not
reproducible; the oracle compares sets at equal distance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mbrngq_spark import geom, grid
from mbrngq_spark.config import DEFAULT, EngineConfig


def cell_stats(docs_geo: DataFrame, res: int,
               cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-(cell, category) aggregates — the distributed index metadata.

    Equivalent to the reference's per-node bookkeeping: count + MBR
    (Node.cs:137-148) + category bitmap (RTree.cs:209-247 CalculateBitArray,
    here one row per category; ``bit_or`` masks are built in index.py)."""
    return (docs_geo
            .withColumn("cell", grid.cell_encode(F.col("x"), F.col("y"), res, cfg))
            .groupBy("cell", "category")
            .agg(F.count("*").alias("n"),
                 F.min("x").alias("xmin"), F.min("y").alias("ymin"),
                 F.max("x").alias("xmax"), F.max("y").alias("ymax")))


def plan_candidate_cells(stats: pd.DataFrame, queries: pd.DataFrame,
                         k: int, res: int, cfg: EngineConfig = DEFAULT,
                         per_category: bool = False) -> pd.DataFrame:
    """Vectorized candidate-cell planner.

    ``stats``: (cell, [category,] n) — the tiny phase-0 table.
    ``queries``: (query_id, qx, qy).
    Returns (query_id, [category,] cell) pairs covering every doc that could
    be a top-k answer. Pure NumPy: a Q×C distance matrix over the non-empty
    cells (C ≤ 4^res). For very large Q this function is called per Arrow
    batch inside mapInPandas, so no single matrix exceeds batch_size×C.
    """
    out_q, out_c, out_cat = [], [], []
    cats = sorted(stats["category"].unique()) if per_category else [None]
    qids = queries["query_id"].to_numpy()
    qxs = queries["qx"].to_numpy(dtype=np.float64)
    qys = queries["qy"].to_numpy(dtype=np.float64)

    for cat in cats:
        sub = stats if cat is None else stats[stats["category"] == cat]
        # stats may be per-(cell, category): collapse to one row per cell so
        # the emitted (query_id, cell) pairs are unique
        sub = sub.groupby("cell", as_index=False)["n"].sum()
        cells = sub["cell"].to_numpy(dtype=np.int64)
        counts = sub["n"].to_numpy(dtype=np.int64)
        if len(cells) == 0:
            continue
        xmin, ymin, xmax, ymax = grid.np_cell_box(cells, res, cfg)
        for qi in range(len(qids)):
            qx, qy = qxs[qi], qys[qi]
            mind = geom.np_mindist_point_rect(qx, qy, xmin, ymin, xmax, ymax)
            maxd = geom.np_maxdist_point_rect(qx, qy, xmin, ymin, xmax, ymax)
            order = np.argsort(mind, kind="stable")
            csum = np.cumsum(counts[order])
            enough = np.searchsorted(csum, k)  # first idx with csum >= k
            if enough >= len(order):
                radius = np.inf  # fewer than k docs exist → take everything
            else:
                radius = maxd[order[: enough + 1]].max()
            take = cells[mind <= radius]
            out_q.extend([qids[qi]] * len(take))
            out_c.extend(take.tolist())
            if cat is not None:
                out_cat.extend([cat] * len(take))
    data = {"query_id": out_q, "cell": out_c}
    if per_category:
        data["category"] = out_cat
    return pd.DataFrame(data)


def with_cell(docs_geo: DataFrame, res: int, cfg: EngineConfig = DEFAULT) -> DataFrame:
    return docs_geo.withColumn("cell", grid.cell_encode(F.col("x"), F.col("y"), res, cfg))


def knn_join(spark: SparkSession, docs_geo: DataFrame, queries: pd.DataFrame,
             k: int, res: int | None = None, cfg: EngineConfig = DEFAULT,
             keep_ties: bool = False, id_col: str = "doc_id") -> DataFrame:
    """Top-k nearest docs per query point.

    ``queries`` is a small pandas frame (query_id, qx, qy) — queries are
    always the broadcast side. Returns (query_id, doc_id, dist, rank)
    with rank 1..k ordered by (dist, doc_id).

    ``keep_ties=True`` reproduces the reference's Nearest contract of keeping
    all co-minimal answers (RTree.cs:2440-2443) via RANK instead of
    ROW_NUMBER.
    """
    res = res or cfg.index_res
    stats = cell_stats(docs_geo, res, cfg).toPandas()
    cand = plan_candidate_cells(stats, queries, k, res, cfg)

    cand_df = spark.createDataFrame(cand)
    q_df = spark.createDataFrame(queries)
    docs_c = with_cell(docs_geo, res, cfg)

    joined = (docs_c
              .join(F.broadcast(cand_df), "cell")
              .join(F.broadcast(q_df), "query_id")
              .withColumn("dist", geom.dist_point(F.col("x"), F.col("y"),
                                                  F.col("qx"), F.col("qy"))))
    rank_fn = F.rank() if keep_ties else F.row_number()
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(),
                                               F.col(id_col).asc())
    return (joined
            .withColumn("rank", rank_fn.over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "dist", "rank"))
