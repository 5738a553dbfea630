"""As-of (point-in-time) join — the temporal sibling of the spatial kNN
join (k=1 on the time axis, one-sided).

The reference engine is purely spatial; as-of is engine-new surface the
brief's training-data pipelines need (align events to the latest snapshot
of a slowly-changing dimension, clicks to the most recent view, trades to
quotes). kdb/pandas do this with a per-key binary search; Flink/Trino with
a sorted merge. The Spark-first shape used here is the UNION + WINDOW
trick:

  1. tag left rows (side=1) and right rows (side=0), union them on the
     shared key/time columns;
  2. ONE shuffle keyed by ``on`` and an in-partition sort by
     (ts, side, right-row order) — right rows sort before left rows at
     equal timestamps, so backward semantics are ``right.ts <= left.ts``;
  3. ``last(right-row STRUCT, ignoreNulls)`` over rows UNBOUNDED
     PRECEDING → CURRENT ROW carries the most recent right row — as one
     atomic struct, so nullable right payload columns never splice fields
     from different rows — onto every left row;
  4. keep side=1 rows; optionally null out matches older than
     ``tolerance``.

Why this scales where a range-join does not: a naive
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` explodes to O(|l|·|r|)
rows per key before the max-ts filter; the window form moves each row
across the wire exactly ONCE (shuffle volume |l| + |r|), and skewed keys
are split by AQE like any other window. On a 100 TB event table
partitioned by day, the union reads only the partitions the left side's
time range touches (both scans keep their pushed filters — the union is
planned per leg).

DuckDB's native ``ASOF JOIN`` is the gate oracle (events_asof); pytest
checks equality against ``pandas.merge_asof`` per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance_us: int | None = None,
              direction: str = "backward",
              suffix: str = "_r",
              tiebreak: str | None = None) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' takes the
    smallest ``right_ts >= left_ts``) within the same ``on`` key — LEFT
    semantics: unmatched left rows keep nulls in the right columns.

    ``tolerance_us`` (microseconds) nulls out matches farther than the
    given horizon — pandas.merge_asof's ``tolerance``.

    Result columns: all left columns, then every right column except
    ``on``/``right_ts`` suffixed with ``suffix``, plus ``{right_ts}{suffix}``
    (the matched timestamp) — nullable.

    ``tiebreak`` names a right column that makes the match deterministic
    when several right rows share a (key, ts): the max-``tiebreak`` row
    wins. Without it, equal-ts right rows match arbitrarily (same caveat
    as DuckDB ASOF)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    payload = [c for c in rcols if c != right_ts]

    # All right columns ride in ONE struct so the match is atomic: a right
    # row with NULLs in some payload columns still carries as a unit (a
    # struct with null fields is itself non-null), instead of each column
    # back-filling from a DIFFERENT older row (merge_asof/DuckDB semantics).
    r_struct_t = T.StructType([right.schema[c] for c in rcols])
    lt = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_t).alias("__r"))
    rt = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("__r"))
    u = lt.unionByName(rt)

    # backward: ascending ts, right (side=0) before left at equal ts →
    # last right row seen is the match. forward: descending ts, so the
    # "last seen" right row is the nearest FUTURE one; side order keeps
    # equal-ts right rows eligible.
    ts_order: Column = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    order = [ts_order, F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col("__r")[tiebreak].asc_nulls_first())
    w = (Window.partitionBy("__k")
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (u.select("*", F.last("__r", ignorenulls=True).over(w).alias("__m"))
         .filter(F.col("__side") == 1))

    matched_ts = F.col("__m")[right_ts]
    if tolerance_us is not None:
        # cast: unix_micros rejects TIMESTAMP_NTZ (common for parquet ts);
        # the gap is a difference, so the epoch interpretation cancels
        gap = F.unix_micros(F.col("__ts").cast("timestamp")) \
            - F.unix_micros(matched_ts.cast("timestamp"))
        if direction == "forward":
            gap = -gap
        ok = matched_ts.isNotNull() & (gap <= F.lit(tolerance_us))
        out_match = [F.when(ok, F.col("__m")[c])
                     .otherwise(F.lit(None)).alias(f"{c}{suffix}")
                     for c in [right_ts] + payload]
    else:
        out_match = [F.col("__m")[c].alias(f"{c}{suffix}")
                     for c in [right_ts] + payload]

    return u.select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    *out_match)
