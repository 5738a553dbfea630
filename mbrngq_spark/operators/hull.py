"""Distributed convex hull — the classic two-stage reduction.

The reference's geometry kernel stops at rectangles (Rectangle.cs MBRs);
the convex hull is the exact replacement for "the MBR of a point set"
when the downstream consumer wants a tight boundary (coverage footprints,
dataset extent reporting, hull-based outlier trims).

Exactness: coordinates are quantized to an integer micro-grid FIRST
(round(x·quant), HALF_UP both engines), so every orientation test is an
exact int64 cross product — no epsilon, no libm, bit-identical across
Spark / NumPy / DuckDB. |coord| ≤ 2^31-ish keeps the cross products
< 2^63 (the domain is [0,100]·10⁶ → products ≤ 4·10^16).

Shape at scale (the standard parallel hull):

- stage 0: exact dedup of quantized points keeping the min id (a set
  has no duplicates; min-id makes vertex identity deterministic);
- stage 1: per-PARTITION Andrew's monotone chain (Arrow-batched NumPy,
  map-only) — each partition forwards only its local hull, O(√n)
  expected for random data, O(n) worst case;
- stage 2: the surviving candidates (tiny) collapse to one task for the
  final chain. hull(∪ partition hulls) == hull(all points) because a
  point inside its partition's hull is inside the global hull.

Collinearity contract: the chain POPS collinear vertices (strict turns
only), so interior-of-edge points are never hull vertices. The derived
fixture coordinates sit on a 10⁻³ lattice, so collinear-on-edge points
are COMMON — the DuckDB oracle therefore tests each directed edge (a,b)
as: every other point is strictly left, OR exactly on the line and
strictly between a and b (0 < (r−a)·(b−a) < |b−a|², all int64-exact).
That is precisely "a and b are consecutive CCW hull vertices under the
popped-collinear convention".
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "id long, qx long, qy long"


def np_monotone_chain(ids: np.ndarray, qx: np.ndarray,
                      qy: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over exact int64 coords → indices of the
    hull vertices in CCW order starting at the lexicographically
    smallest point. Strict turns only (collinear points popped).
    Assumes points are distinct."""
    n = len(ids)
    order = np.lexsort((qy, qx))
    if n <= 2:
        return order

    def half(idx):
        h: list[int] = []
        for i in idx:
            while len(h) >= 2:
                ax, ay = qx[h[-2]], qy[h[-2]]
                bx, by = qx[h[-1]], qy[h[-1]]
                if (bx - ax) * (qy[i] - ay) - (by - ay) * (qx[i] - ax) <= 0:
                    h.pop()
                else:
                    break
            h.append(int(i))
        return h

    lower = half(order)
    upper = half(order[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hull(points: DataFrame, id_col: str = "doc_id",
                quant: float = 1e6) -> DataFrame:
    """(pos, id, qx, qy, next_id): the convex hull of the quantized
    point set, CCW from the lexicographically smallest vertex, each
    vertex carrying the id of the NEXT hull vertex (the directed edge
    set — a start-independent encoding of the cyclic order)."""
    pts = (points
           .select(F.col(id_col).alias("id"),
                   F.round(F.col("x") * F.lit(quant)).cast("long")
                   .alias("qx"),
                   F.round(F.col("y") * F.lit(quant)).cast("long")
                   .alias("qy"))
           .groupBy("qx", "qy").agg(F.min("id").alias("id")))

    def local_hull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        idx = np_monotone_chain(df["id"].to_numpy(),
                                df["qx"].to_numpy(),
                                df["qy"].to_numpy())
        yield df.iloc[idx][["id", "qx", "qy"]]

    def final_hull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        idx = np_monotone_chain(df["id"].to_numpy(),
                                df["qx"].to_numpy(),
                                df["qy"].to_numpy())
        h = df.iloc[idx].reset_index(drop=True)
        h["pos"] = np.arange(len(h), dtype=np.int64)
        h["next_id"] = np.roll(h["id"].to_numpy(), -1)
        yield h[["pos", "id", "qx", "qy", "next_id"]]

    cand = pts.select("id", "qx", "qy").mapInPandas(local_hull, _SCHEMA)
    return cand.repartition(1).mapInPandas(
        final_hull, "pos long, id long, qx long, qy long, next_id long")


def np_skyline(ids: np.ndarray, qx: np.ndarray,
               qy: np.ndarray) -> np.ndarray:
    """Indices of the min-min skyline (Pareto frontier): points no other
    point dominates (qx ≤, qy ≤, one strict). Classic staircase sweep
    over the (qx, qy)-sorted order; assumes distinct points."""
    order = np.lexsort((qy, qx))
    keep = []
    best_y = None
    for i in order:
        if best_y is None or qy[i] < best_y:
            keep.append(int(i))
            best_y = qy[i]
    return np.asarray(keep, dtype=np.int64)


def skyline(points: DataFrame, id_col: str = "doc_id",
            quant: float = 1e6) -> DataFrame:
    """(id, qx, qy): the min-min skyline of the quantized point set —
    the classic spatial-DB dominance query ("cheapest AND closest").

    Same two-stage reduction as the hull, and valid for the same
    transitivity reason: a globally dominated point is dominated by
    some chain that terminates at a partition-local skyline point, so
    skyline(∪ local skylines) == skyline(all). Exact int64 comparisons
    throughout; duplicate quantized points collapse to the min id."""
    pts = (points
           .select(F.col(id_col).alias("id"),
                   F.round(F.col("x") * F.lit(quant)).cast("long")
                   .alias("qx"),
                   F.round(F.col("y") * F.lit(quant)).cast("long")
                   .alias("qy"))
           .groupBy("qx", "qy").agg(F.min("id").alias("id")))

    def local_sky(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        idx = np_skyline(df["id"].to_numpy(), df["qx"].to_numpy(),
                         df["qy"].to_numpy())
        yield df.iloc[idx][["id", "qx", "qy"]]

    cand = pts.select("id", "qx", "qy").mapInPandas(local_sky, _SCHEMA)
    return cand.repartition(1).mapInPandas(local_sky, _SCHEMA)


def hull_diameter(points: DataFrame, id_col: str = "doc_id",
                  quant: float = 1e6) -> DataFrame:
    """Farthest pair (the point-set diameter): ONE row
    (a_id, b_id, d2q, dist) with d2q the exact int64 squared quantized
    distance and dist = sqrt(d2q)/quant.

    The farthest pair is always a pair of STRICT hull vertices (distance
    to an edge-interior point is strictly below the max of the edge's
    endpoints — |q−(a+t(b−a))|² is strictly convex in t), so the
    quadratic scan runs over the hull's O(h) vertices, not the corpus:
    corpus-scale work is the hull reduction; the pair scan is h² rows on
    one executor. Ties break on (a_id, b_id) — exact int comparisons,
    identical in every engine. The hull is localCheckpointed before the
    self-join — without it the full two-stage hull reduction (dedup +
    per-partition chains + final chain) executes once per join side."""
    h = convex_hull(points, id_col=id_col, quant=quant) \
        .localCheckpoint(eager=True)
    a = h.select(F.col("id").alias("a_id"), F.col("qx").alias("aqx"),
                 F.col("qy").alias("aqy"))
    b = h.select(F.col("id").alias("b_id"), F.col("qx").alias("bqx"),
                 F.col("qy").alias("bqy"))
    d2 = ((F.col("bqx") - F.col("aqx")) * (F.col("bqx") - F.col("aqx"))
          + (F.col("bqy") - F.col("aqy")) * (F.col("bqy") - F.col("aqy")))
    return (a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
            .withColumn("d2q", d2)
            .orderBy(F.col("d2q").desc(), F.col("a_id"), F.col("b_id"))
            .limit(1)
            .select("a_id", "b_id", "d2q",
                    (F.sqrt(F.col("d2q").cast("double"))
                     / F.lit(quant)).alias("dist")))
