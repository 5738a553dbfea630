"""Interval-overlap join — the temporal analog of the celled ε-join.

The reference is spatial-only; interval overlap is the 1-D version of
its rectangle-intersects predicate (Rectangle.cs:187-199) applied to
time. Used for session co-presence, booking conflicts, validity-window
joins — anywhere two row sets carry [t0, t1] ranges.

Shape at scale: each interval explodes to its covered time BUCKETS
(bounded JVM sequence/explode at a width chosen so typical intervals
span few buckets); candidates meet in ONE bucket-keyed equi-join; a
pair sharing many buckets is kept EXACTLY once by the first-shared-
bucket arithmetic (bucket == floor(max(a.t0, b.t0)/width) — the same
min-shared-cell dedup the overlay join uses, no distinct). Overlapping
pairs always share that bucket, so the join is provably lossless. All
comparisons are exact int64 — no rounding discipline needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(a: DataFrame, b: DataFrame, width: int,
                          closed: bool = True) -> DataFrame:
    """Pairs of intervals with CLOSED overlap (ostart ≤ oend; set
    ``closed=False`` for strict overlap ostart < oend). Inputs carry
    (id, t0, t1) with t0 ≤ t1, int64 epochs; extra columns pass through
    prefixed a_/b_. Returns (a_id, b_id, ostart, oend, overlap_s)."""
    w = int(width)

    def cover(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(c).alias(f"{tag}_{c}") for c in df.columns]
        return (df.select(
            *cols,
            F.explode(F.sequence(F.expr(f"t0 div {w}"),
                                 F.expr(f"t1 div {w}"))).alias("bucket")))

    ca, cb = cover(a, "a"), cover(b, "b")
    ostart = F.greatest("a_t0", "b_t0")
    oend = F.least("a_t1", "b_t1")
    first_shared = F.expr(f"greatest(a_t0, b_t0) div {w}")
    pred = (ostart <= oend) if closed else (ostart < oend)
    return (ca.join(cb, "bucket")
            .filter(pred & (F.col("bucket") == first_shared))
            .drop("bucket")
            .withColumn("ostart", ostart)
            .withColumn("oend", oend)
            .withColumn("overlap_s", oend - ostart))


def session_copresence(sessions: DataFrame, width: int = 86400,
                       min_overlap: int = 0) -> DataFrame:
    """Cross-user session co-presence: per unordered user pair, the
    count of overlapping session pairs, total overlapped seconds (exact
    int64 sum), and the span of co-presence. ``sessions`` carries
    (user_id, session_idx, t0, t1)."""
    base = sessions.select(
        F.col("user_id").alias("id"),
        F.col("session_idx").alias("sidx"), "t0", "t1")
    pairs = (interval_overlap_join(base, base, width)
             .filter((F.col("a_id") < F.col("b_id"))
                     & (F.col("overlap_s") >= F.lit(int(min_overlap)))))
    return (pairs.groupBy(F.col("a_id").alias("ua"),
                          F.col("b_id").alias("ub"))
            .agg(F.count(F.lit(1)).alias("n_overlaps"),
                 F.sum("overlap_s").cast("long").alias("total_overlap_s"),
                 F.min("ostart").alias("first_te"),
                 F.max("oend").alias("last_te")))
