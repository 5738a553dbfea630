"""Stream-×-stream interval join — the event-correlation pipeline
(clicks to the views that preceded them, trades to quotes in a window).

Unlike the as-of enrichment (query_stream.enrich_asof_stream — stream ×
STATIC), both sides here are unbounded, so Structured Streaming's
watermarked stream-stream inner join carries the state: each side is
watermarked, the join condition bounds the event-time range, and the
engine can therefore evict state older than the watermark — state size
stays proportional to the interval, not the stream history. This is the
exact declarative shape Spark documents for interval joins; the
batch-equality test (test_streaming) runs the same data through the
static DataFrame join and compares."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  max_gap_s: int,
                  left_ts: str = "ts", right_ts: str = "ts") -> DataFrame:
    """Inner join: right rows with ``left_ts - max_gap_s ≤ right_ts ≤
    left_ts`` per key. Works identically for static frames (the batch
    twin) and watermarked streams (stream-stream join with bounded
    state). Right columns other than the key/ts are suffixed ``_r``."""
    r = right.select(
        F.col(on).alias("__rk"), F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns
          if c not in (on, right_ts)])
    cond = ((F.col(on) == F.col("__rk"))
            & (F.col("__rts") <= F.col(left_ts))
            & (F.col("__rts") >= F.col(left_ts)
               - F.expr(f"INTERVAL {max_gap_s} SECONDS")))
    return (left.join(r, cond, "inner")
            .drop("__rk")
            .withColumnRenamed("__rts", f"{right_ts}_r"))


def interval_join_stream(left_stream: DataFrame, right_stream: DataFrame,
                         on: str, max_gap_s: int, out_path: str,
                         checkpoint: str,
                         trigger: dict | None = None) -> StreamingQuery:
    """Watermarked stream-stream interval join → append parquet sink.
    Watermarks are 2× the gap so late rows inside the join range are
    still matched before state eviction."""
    wm = f"{2 * max_gap_s} seconds"
    joined = interval_join(left_stream.withWatermark("ts", wm),
                           right_stream.withWatermark("ts", wm),
                           on, max_gap_s)
    writer = (joined.writeStream.format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
