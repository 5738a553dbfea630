"""Streaming query serving: a live stream of query points answered against
a (static or snapshot-resolved) document index.

The reference application is strictly request-response over an in-memory
tree (RTreeViewer.cs drives one query per UI action); the engine's stream
twin treats QUERIES as the unbounded side — each micro-batch of query
points runs the SAME batch operators (knn_join / nearest_group with
DataFrame queries, i.e. the distributed mapInPandas planner) via
foreachBatch, writing results to an append sink. The doc side stays a
static DataFrame: at scale it is the cell-partitioned index table, so each
micro-batch join is the usual broadcast-candidate plan, and micro-batch
latency is the batch operator's latency on Q = batch size.

foreachBatch (not a continuous join) is the right shape here: spatial
planning needs the per-batch stats broadcast, and results are final per
query — no watermark or state is involved.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mbrngq_spark.config import DEFAULT, EngineConfig


def serve_knn_stream(docs_geo: DataFrame, query_stream: DataFrame,
                     k: int, out_path: str, checkpoint: str,
                     cfg: EngineConfig = DEFAULT,
                     max_dist: float | None = None,
                     trigger: dict | None = None) -> StreamingQuery:
    """Answer a stream of (query_id, qx, qy) with top-k joins per
    micro-batch; results land in ``out_path`` parquet partitioned by
    ``batch_id``. End-to-end EXACTLY-ONCE: the checkpoint deduplicates
    triggers, and the per-batch dynamic partition overwrite makes a
    retried micro-batch replace its own partition instead of appending a
    second copy (a plain append sink under foreachBatch is only
    at-least-once)."""
    from mbrngq_spark.operators.knn import knn_join

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        out = knn_join(batch_df.sparkSession, docs_geo, batch_df, k,
                       cfg=cfg, max_dist=max_dist)
        _write_idempotent(out, batch_id, out_path)

    return _start(query_stream, handle, checkpoint, trigger)


def serve_ngq_stream(docs_geo: DataFrame, query_stream: DataFrame,
                     k: int, L: int, out_path: str, checkpoint: str,
                     cfg: EngineConfig = DEFAULT,
                     trigger: dict | None = None) -> StreamingQuery:
    """NGQ per micro-batch of query points (distributed planning +
    escalation inside each batch)."""
    from mbrngq_spark.operators.ngq import nearest_group

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        out = nearest_group(batch_df.sparkSession, docs_geo, batch_df,
                            k=k, L=L, cfg=cfg)
        _write_idempotent(out, batch_id, out_path)

    return _start(query_stream, handle, checkpoint, trigger)


def enrich_asof_stream(left_stream: DataFrame, right_static: DataFrame,
                       on: str, out_path: str, checkpoint: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       tolerance_us: int | None = None,
                       trigger: dict | None = None) -> StreamingQuery:
    """Point-in-time enrichment of a stream against a STATIC right side
    (e.g. a dimension snapshot resolved from a snapshot table): each
    micro-batch runs the batch as-of join — correct because the right
    side is fixed, so a row's match never depends on which micro-batch
    carried it. (Stream-×-stream as-of would need event-time state and
    watermark reasoning — deliberately not claimed here.) Same idempotent
    batch_id-partitioned sink as the kNN/NGQ serving."""
    from mbrngq_spark.operators.asof import asof_join

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        out = asof_join(batch_df, right_static, on, left_ts, right_ts,
                        tolerance_us)
        _write_idempotent(out, batch_id, out_path)

    return _start(left_stream, handle, checkpoint, trigger)


def _write_idempotent(out: DataFrame, batch_id: int, out_path: str) -> None:
    """Idempotent micro-batch sink: each batch owns the partition
    ``batch_id=<n>`` and dynamic-overwrites exactly that partition, so a
    replay after a partial write leaves one copy of the batch's rows."""
    from pyspark.sql import functions as F

    (out.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_path))


def _start(query_stream: DataFrame,
           handle: Callable[[DataFrame, int], None],
           checkpoint: str, trigger: dict | None) -> StreamingQuery:
    writer = (query_stream.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
