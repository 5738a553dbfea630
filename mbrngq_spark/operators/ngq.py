"""NGQ — nearest group query, the reference's flagship operator.

Reference: ``RTree.NearestGroup`` (mbR-NGQ/Data/RTree.cs:1040-1335 + helpers,
SURVEY.md Q4): find the top-k groups, one member per category 0..m-1,
minimizing

    minDist(G, q) = innerDist(G) + interDist(G, q)
                  = max pairwise dist among members + min dist from q to any
                    member                      (RTree.cs:938-966)

The reference runs a single-threaded best-first branch-and-bound with
per-category inverted R-trees and a theta threshold pool. The distributed
re-expression (SURVEY.md §3.1) is two-phase:

  phase 1  candidate retrieval — per (query, category), the top-L nearest
           docs via the same cell-grid planner as kNN (knn.py). L-truncation
           is EXACT when the refined k-th best score ≤ the L-th candidate
           distance of every truncated category, because any group touching
           a doc beyond rank L has score ≥ that doc's distance to q
           (triangle inequality:  score = innerDist + interDist
            ≥ (d_i − d_min) + d_min = d_i ).  This bound plays the role of
           the reference's theta pruning (RTree.cs:1391-1469,1961-1970);
           the refine step verifies it and flags each query row `exact`.

  phase 2  exact refine — one shuffle keyed by query_id, then
           groupBy(query_id).applyInPandas: cross-category enumeration
           with NumPy broadcasting — semantically the reference's ORACLE
           (CheckNearGroup enumeration, RTree.cs:1505-1556), which its own
           search must equal, so it is the unambiguous ground truth
           (SURVEY.md §7.4). Before enumerating, the kernel prunes with the
           theta machinery (greedy-anchor upper bound T + per-candidate
           innerDist lower bounds — see theta_bounds), selects the top-k by
           an O(N) partition, and bounds total work by ``refine_budget``
           cells, flagging budget-capped queries in a ``capped`` column.

Adaptivity (nearest_group): queries whose L-truncation bound fails are
re-run ONCE per round at the CERTIFYING depth computed from the stats grid
(knn.certifying_L) — not blind doubling — and budget-capped queries are
terminal (deeper L provably cannot certify them). This keeps clustered
corpora (each category its own dense blob — the GaussianIsland regime,
where the bound is geometrically uncertifiable under any practical L)
within a small constant of the uniform-data cost, with honesty flags.

Tie-break: (score, member-id tuple) — deterministic total order replacing
the reference's heap-insertion-order ties (HeapPriorityQueue.cs:193-197).
Skew: dense queries are bounded by construction (≤ m·L rows per query group);
the shuffle is by query_id so AQE's skew handling is irrelevant here — the
heavy side stays in phase 1's broadcast join.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbrngq_spark import geom
from mbrngq_spark.config import DEFAULT, EngineConfig
from mbrngq_spark.operators.knn import cell_stats, plan_candidate_cells, \
    plan_cells_distributed, planner_stats, with_cell


def candidate_topL(spark: SparkSession, docs_geo: DataFrame,
                   queries: pd.DataFrame | DataFrame, L: int, res: int,
                   cfg: EngineConfig = DEFAULT,
                   id_col: str = "doc_id",
                   stats: pd.DataFrame | None = None) -> DataFrame:
    """Phase 1: top-L nearest docs per (query, category).

    Returns (query_id, category, doc_id, x, y, dq, rn) with rn ≤ L ordered
    by (dq, doc_id). With pandas ``queries`` the doc side is only
    broadcast-joined on cell id — never shuffled; with a Spark-DataFrame
    ``queries`` (large batches) the planner runs distributed per Arrow
    batch (plan_cells_distributed) and AQE picks the join strategy."""
    if stats is None:
        stats = cell_stats(docs_geo, res, cfg).toPandas()
    docs_c = with_cell(docs_geo, res, cfg)
    if isinstance(queries, DataFrame):
        cand_df = plan_cells_distributed(spark, stats, queries, L, res, cfg,
                                         per_category=True)
        joined = (docs_c.join(cand_df, ["cell", "category"])
                  .join(queries.select("query_id", "qx", "qy"), "query_id"))
    else:
        cand = plan_candidate_cells(stats, queries, L, res, cfg,
                                    per_category=True)
        # attach (qx, qy) driver-side: ONE broadcast + ONE join instead
        # of a second broadcast exchange + join per round (the query
        # coordinates are a pandas merge away; identical join graph)
        cand = cand.merge(queries[["query_id", "qx", "qy"]], on="query_id")
        # explicit schema: an empty-corpus plan yields an empty frame,
        # where pandas schema inference would fail
        cand_df = spark.createDataFrame(
            cand, "query_id long, cell long, radius double, category int, "
                  "qx double, qy double")
        joined = docs_c.join(F.broadcast(cand_df), ["cell", "category"])
    joined = (joined
              .withColumn("dq", geom.dist_point(F.col("x"), F.col("y"),
                                                F.col("qx"), F.col("qy")))
              # provably-sufficient per-(query, category) radius: prune
              # BEFORE the rank shuffle (≡ theta prune, RTree.cs:1391-1469)
              .filter(F.col("dq") <= F.col("radius")))
    # ONE exchange serves both the rank window and the downstream refine
    # groupBy: hashpartitioning(query_id) satisfies the window's clustered
    # distribution on (query_id, category) AND the refine's on (query_id),
    # so neither inserts its own shuffle. The explicit partition count
    # keeps AQE from coalescing the CPU-heavy refine to ~1 task, and the
    # partial WindowGroupLimit still cuts per-map-partition input to L
    # below this exchange (the degenerate-density volume guard).
    from mbrngq_spark.config import refine_partitions
    w = Window.partitionBy("query_id", "category") \
              .orderBy(F.col("dq").asc(), F.col(id_col).asc())
    return (joined
            .repartition(refine_partitions(spark), "query_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= L)
            .select("query_id", "category", id_col, "x", "y", "dq", "rn"))


def _refine_schema(m: int, id_type: T.DataType | None = None) -> T.StructType:
    """Output schema; member-id columns inherit the input id type (the
    input_hint table carries STRING doc ids — int ids are just the common
    case for the testdata tables)."""
    id_type = id_type or T.LongType()
    fields = [T.StructField("query_id", T.LongType()),
              T.StructField("group_rank", T.IntegerType())]
    fields += [T.StructField(f"c{i}_id", id_type) for i in range(m)]
    fields += [T.StructField("min_dist", T.DoubleType()),
               T.StructField("exact", T.BooleanType()),
               T.StructField("capped", T.BooleanType())]
    return T.StructType(fields)


def _make_refine(m: int, k: int, L: int, cat_totals: dict[int, int],
                 budget: int = 1 << 22):
    """Build the per-query exact enumeration kernel (vectorized NumPy).

    Semantics = the reference oracle's partial-group expansion collapsed to a
    dense cross-category enumeration (RTree.cs:1505-1556): every combination
    of one member per category is scored with GetGroupMinDist
    (RTree.cs:938-966) and the top-k by (score, id-tuple) are kept."""

    def enumerate_topk(xs, ys, ids, dqs):
        """Dense cross-category enumeration → (top_ids per category,
        top_scores) under the deterministic (score, id-tuple) total order.
        The id gather + lexsort run only on the ≤k-score head selected by
        an O(N) partition — materializing member-id arrays for the full
        product was the kernel's dominant cost at large L."""
        sizes = [len(i) for i in ids]

        def expand(a: np.ndarray, axis: int) -> np.ndarray:
            shape = [1] * m
            shape[axis] = -1
            return a.reshape(shape)

        # innerDist: max pairwise distance (skips i==j pairs exactly like the
        # reference skipping same-element pairs, RTree.cs:946-956)
        inner = np.zeros(tuple(sizes), dtype=np.float64)
        for i, j in itertools.combinations(range(m), 2):
            dx = expand(xs[i], i) - expand(xs[j], j)
            dy = expand(ys[i], i) - expand(ys[j], j)
            np.maximum(inner, np.sqrt(dx * dx + dy * dy), out=inner)
        # interDist: min distance from q to any member (RTree.cs:958-962)
        inter = np.full(tuple(sizes), np.inf)
        for i in range(m):
            np.minimum(inter, expand(dqs[i], i), out=inter)
        score = (inner + inter).ravel()

        if score.size > k:
            kth = np.partition(score, k - 1)[k - 1]
            head = np.nonzero(score <= kth)[0]   # ≥ k rows incl. score ties
        else:
            head = np.arange(score.size)
        idx = np.unravel_index(head, tuple(sizes))
        head_ids = [ids[c][idx[c]] for c in range(m)]
        order = np.lexsort(tuple(head_ids[::-1]) + (score[head],))[:k]
        return [hid[order] for hid in head_ids], score[head][order]

    def theta_bounds(xs, ys, dqs):
        """(T, LBs): T = a kth-best-score upper bound from k distinct
        greedy anchor groups (anchor in the largest category; other members
        = its nearest candidate per category — ≡ the reference seeding a
        theta pool with feasible groups, RTree.cs:1961-1970); LBs[c][i] =
        max over other categories of the min distance from candidate i to
        that category's candidate set — a lower bound on innerDist of ANY
        enumerable group containing i. Prune i when dq_i > T or LB_i > T:
        score ≥ dq_i (triangle) and score ≥ LB_i, both strict-> safe even
        under (score, id) tie-breaking."""
        sizes = [len(d) for d in dqs]
        pair_min = {}
        LBs = [np.zeros(s) for s in sizes]
        for i, j in itertools.combinations(range(m), 2):
            dx = xs[i][:, None] - xs[j][None, :]
            dy = ys[i][:, None] - ys[j][None, :]
            D = np.sqrt(dx * dx + dy * dy)
            pair_min[(i, j)] = D
            np.maximum(LBs[i], D.min(axis=1), out=LBs[i])
            np.maximum(LBs[j], D.min(axis=0), out=LBs[j])
        a = int(np.argmax(sizes))
        if sizes[a] < k:
            return np.inf, LBs
        # greedy groups anchored at every candidate of category a
        sel = {}
        for c in range(m):
            if c == a:
                continue
            D = pair_min[(min(a, c), max(a, c))]
            D = D if a < c else D.T            # rows = anchor axis
            sel[c] = np.argmin(D, axis=1)
        members_x = [xs[a] if c == a else xs[c][sel[c]] for c in range(m)]
        members_y = [ys[a] if c == a else ys[c][sel[c]] for c in range(m)]
        members_dq = [dqs[a] if c == a else dqs[c][sel[c]] for c in range(m)]
        inner = np.zeros(sizes[a])
        for i, j in itertools.combinations(range(m), 2):
            dx = members_x[i] - members_x[j]
            dy = members_y[i] - members_y[j]
            np.maximum(inner, np.sqrt(dx * dx + dy * dy), out=inner)
        greedy = inner + np.min(np.stack(members_dq), axis=0)
        return float(np.partition(greedy, k - 1)[k - 1]), LBs

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        per_cat = []
        for c in range(m):
            sub = pdf[pdf["category"] == c].sort_values("rn")
            if len(sub) == 0:
                return pd.DataFrame()  # a category is empty → no groups exist
            per_cat.append(sub)

        xs = [s["x"].to_numpy(np.float64) for s in per_cat]
        ys = [s["y"].to_numpy(np.float64) for s in per_cat]
        # no dtype cast: int64 for long ids, object for string ids —
        # np.lexsort only needs orderable keys
        ids = [s["doc_id"].to_numpy() for s in per_cat]
        dqs = [s["dq"].to_numpy(np.float64) for s in per_cat]
        sizes = [len(i) for i in ids]

        # theta tightening (≡ RTree.cs:1961-1970): prune candidates that
        # provably cannot appear in any top-k group — see theta_bounds.
        # Handles clustered data where dq alone prunes nothing (each
        # category in its own distant blob → every score shares a large
        # inter-blob innerDist; LB cuts the blob's far side).
        if int(np.prod(sizes)) > 4096:
            T, LBs = theta_bounds(xs, ys, dqs)
            if np.isfinite(T):
                keep = [(dq <= T) & (lb <= T) for dq, lb in zip(dqs, LBs)]
                xs = [a[kp] for a, kp in zip(xs, keep)]
                ys = [a[kp] for a, kp in zip(ys, keep)]
                ids = [a[kp] for a, kp in zip(ids, keep)]
                dqs = [a[kp] for a, kp in zip(dqs, keep)]

        # enumeration budget: the dense product is the exact kernel's cost;
        # past the budget, truncate each list by dq order and SAY SO —
        # `capped` marks results whose exactness cannot be certified by
        # escalating L (the adaptive loop stops retrying those queries)
        capped = False
        cur = [len(i) for i in ids]
        if int(np.prod(cur)) > budget:
            capped = True
            per_cap = max(int(budget ** (1.0 / m)), k)
            xs = [a[:per_cap] for a in xs]
            ys = [a[:per_cap] for a in ys]
            ids = [a[:per_cap] for a in ids]
            dqs = [a[:per_cap] for a in dqs]

        top_ids, top_scores = enumerate_topk(xs, ys, ids, dqs)

        # exactness: kth best truncated score must not exceed the L-th
        # candidate distance of any truncated category (see module doc).
        # NOTE: uses the ORIGINAL per-category lists' last dq (pre-pruning
        # never drops anything the bound needs — pruning only removed
        # candidates that cannot affect kth)
        kth = top_scores[-1] if len(top_scores) else np.inf
        exact = not capped   # a budget-truncated enumeration can't certify
        for c in range(m):
            truncated = sizes[c] >= L and cat_totals.get(c, 0) > sizes[c]
            if truncated and kth > per_cat[c]["dq"].iloc[-1]:
                exact = False

        n_out = len(top_scores)
        out = {"query_id": np.full(n_out, qid, dtype=np.int64),
               "group_rank": np.arange(1, n_out + 1, dtype=np.int32)}
        for c in range(m):
            out[f"c{c}_id"] = top_ids[c]
        out["min_dist"] = top_scores
        out["exact"] = np.full(n_out, exact)
        out["capped"] = np.full(n_out, capped)
        return pd.DataFrame(out)

    return refine


def _nearest_group_once(spark: SparkSession, docs_geo: DataFrame,
                        queries: pd.DataFrame, k: int, L: int, res: int,
                        cfg: EngineConfig, stats: pd.DataFrame,
                        refine_budget: int = 1 << 22) -> DataFrame:
    m = cfg.m
    cat_totals = {int(c): int(v) for c, v in
                  stats.groupby("category")["n"].sum().items()}
    cands = candidate_topL(spark, docs_geo, queries, L, res, cfg, stats=stats)
    refine = _make_refine(m, k, L, cat_totals, refine_budget)
    id_type = docs_geo.schema["doc_id"].dataType
    # no repartition here: cands is already hash(query_id)-partitioned
    # with an explicit (non-coalescible) count — see candidate_topL
    return (cands
            .groupBy("query_id")
            .applyInPandas(refine, schema=_refine_schema(m, id_type)))


def nearest_group(spark: SparkSession, docs_geo: DataFrame,
                  queries: pd.DataFrame | DataFrame, k: int | None = None,
                  L: int | None = None, res: int | None = None,
                  cfg: EngineConfig = DEFAULT,
                  max_rounds: int = 4,
                  refine_budget: int = 1 << 22) -> DataFrame:
    """Top-k nearest groups per query point (SURVEY.md Q4).

    ``queries`` may be a small pandas frame (driver-planned, broadcast) or
    a Spark DataFrame for large query batches — planning, escalation
    bookkeeping and re-queries then all stay distributed (no driver loop,
    no collect of query ids).

    Returns (query_id, group_rank, c0_id..c{m-1}_id, min_dist, exact),
    group_rank 1..k ordered by (min_dist, id tuple).

    ADAPTIVE: queries whose L-truncation bound fails (dense-cluster inputs —
    the GaussianIsland regime, DataGenerators.cs:30-83) are retried, up to
    ``max_rounds`` times, at the CERTIFYING depth — the stats grid bounds
    how many docs lie within each failed query's kth score, which is
    exactly the L the bound needs (knn.certifying_L) — instead of blind
    doubling; ``refine_budget`` caps the exact enumeration, and queries
    whose refine was budget-capped are terminal (their answers carry
    exact=false, capped=true — deeper L cannot change them). This is the
    distributed analog of the reference widening its search until theta
    certifies the answer."""
    from mbrngq_spark.operators.knn import certifying_L, \
        certifying_L_distributed
    k = k or cfg.k
    L = L or cfg.ngq_candidates
    m = cfg.m
    per_cap = max(int(refine_budget ** (1.0 / m)), k)
    # ONE corpus scan feeds the res choice, the planner, the per-category
    # totals (exactness flag), and every escalation round
    # occupancy buckets in planner_stats are (cell, category), so the
    # L target is already per-group — no separate group knob
    stats, res = planner_stats(docs_geo, res, L, cfg)
    distributed = isinstance(queries, DataFrame)
    if not distributed:
        return _nearest_group_pandas(spark, docs_geo, queries, k, L, res,
                                     cfg, max_rounds, refine_budget,
                                     stats, per_cap)

    remaining = queries
    done: DataFrame | None = None
    for rnd in range(max_rounds):
        out = _nearest_group_once(spark, docs_geo, remaining, k, L, res,
                                  cfg, stats, refine_budget) \
            .localCheckpoint(eager=True)
        # escalate only queries the L-bound failed AND whose refine wasn't
        # budget-capped: for capped queries a deeper L hits the same cap,
        # so retrying burns rounds without changing the (flagged-inexact)
        # answer — clustered-corpus queries land here by geometry.
        # ONE aggregate yields both the bad-query set and each query's kth
        # score (exact/capped are per-query constants, so the filter keeps
        # whole query groups) — previously a distinct + a semi-join +
        # a second aggregate, i.e. two extra jobs per round.
        bad_kth = (out.filter(~F.col("exact") & ~F.col("capped"))
                   .groupBy("query_id").agg(F.max("min_dist").alias("kth"))
                   .localCheckpoint(eager=True))
        bad_df = bad_kth.select("query_id")
        none_bad = bad_kth.isEmpty()
        good = out if none_bad else out.join(bad_df, "query_id", "left_anti")
        done = good if done is None else done.unionByName(good)
        if none_bad:
            return done
        if rnd == max_rounds - 1:
            break
        remaining = remaining.join(bad_df, "query_id", "left_semi")
        # jump to the certifying depth; clamp at the budget's per-category
        # cap — past it the kernel would truncate anyway, so deeper
        # retrieval cannot certify and the round would be pure waste.
        # Bookkeeping stays distributed: per-batch certifying_L in
        # mapInPandas (stats broadcast), driver receives ONE scalar —
        # no .toPandas() of the (possibly huge) bad-query set
        bad_q = bad_kth.join(
            remaining.select("query_id", "qx", "qy"), "query_id")
        cert = certifying_L_distributed(spark, stats, bad_q, res, cfg)
        next_L = min(max(cert, 2 * L), per_cap)
        if next_L <= L:
            # no useful depth left under the budget: results for these
            # queries are already as good as the budget allows
            return done.unionByName(
                out.join(bad_df, "query_id", "left_semi"))
        L = next_L
    # rounds exhausted: whatever is left is returned with exact=False visible
    last = out.join(bad_df, "query_id", "left_semi")
    return done.unionByName(last) if done is not None else last


def _nearest_group_pandas(spark: SparkSession, docs_geo: DataFrame,
                          queries: pd.DataFrame, k: int, L: int, res: int,
                          cfg: EngineConfig, max_rounds: int,
                          refine_budget: int, stats: pd.DataFrame,
                          per_cap: int) -> DataFrame:
    """The small-Q (pandas queries) adaptive loop: each round's result is
    k·Q rows — inherently driver-sized, since the queries themselves were
    handed over as a pandas frame — so the round executes as ONE Spark
    action (an Arrow collect) and all escalation bookkeeping (bad set,
    kth bound, certifying depth) runs in pandas. The localCheckpoint +
    per-round aggregate jobs of the distributed loop would cost 2-3 extra
    job rounds here for data that fits in one collect."""
    from mbrngq_spark.operators.knn import certifying_L

    m = cfg.m
    id_type = docs_geo.schema["doc_id"].dataType
    schema = _refine_schema(m, id_type)
    remaining = queries
    parts: list[pd.DataFrame] = []

    def finish(extra: pd.DataFrame | None = None) -> DataFrame:
        all_parts = parts + ([extra] if extra is not None else [])
        final = pd.concat(all_parts, ignore_index=True) if all_parts \
            else pd.DataFrame()
        if len(final) == 0:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(final, schema)

    for rnd in range(max_rounds):
        out = _nearest_group_once(spark, docs_geo, remaining, k, L, res,
                                  cfg, stats, refine_budget).toPandas()
        bad_mask = ~out["exact"] & ~out["capped"]
        parts.append(out[~bad_mask])
        if not bad_mask.any():
            return finish()
        if rnd == max_rounds - 1:
            return finish(out[bad_mask])
        bad_rows = out[bad_mask]
        remaining = remaining[remaining["query_id"]
                              .isin(bad_rows["query_id"].unique())]
        kth = (bad_rows.groupby("query_id", as_index=False)["min_dist"]
               .max().rename(columns={"min_dist": "kth"}))
        cert = certifying_L(
            stats, kth.merge(remaining[["query_id", "qx", "qy"]],
                             on="query_id"), res, cfg)
        next_L = min(max(cert, 2 * L), per_cap)
        if next_L <= L:
            return finish(bad_rows)
        L = next_L
    return finish()
