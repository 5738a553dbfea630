"""Streaming ingestion into a snapshot table — the north rule's "resume
from the last committed Iceberg snapshot" for the UNBOUNDED input side.

Each micro-batch commits one snapshot via ``SnapshotTable.append_batch``,
which records the micro-batch id in the manifest: together with the
streaming checkpoint this is end-to-end exactly-once — a batch replayed
after a crash (foreachBatch is at-least-once on retry) finds its id in the
snapshot history and no-ops, and a reader always sees whole committed
batches, never a torn write. Restarting the stream against the same
checkpoint resumes from the first unprocessed source file, and the table
resumes from its last committed snapshot — the two cursors never
disagree because the manifest carries the batch id.

This mirrors Iceberg's Structured Streaming sink semantics
(write.format("iceberg") commit-per-epoch) on the offline snapshot layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mbrngq_spark.plans.snapshots import SnapshotTable


def run_id_for_checkpoint(checkpoint: str) -> str:
    """Stable ingestion-run identity: same checkpoint → same run (replays
    dedup), fresh checkpoint → new run (restarted batch ids commit)."""
    import hashlib
    import os

    return hashlib.sha1(
        os.path.abspath(checkpoint).encode()).hexdigest()[:16]


def ingest_snapshot_stream(stream_df: DataFrame, table: SnapshotTable,
                           checkpoint: str,
                           trigger: dict | None = None) -> StreamingQuery:
    """Commit each micro-batch of ``stream_df`` as one table snapshot.

    The replay-dedup key is ``(run_id, batch_id)`` where run_id hashes the
    checkpoint path: restarting against a FRESH checkpoint (batch ids back
    to 0) commits normally instead of colliding with a previous run's
    manifest ids and being dropped as replays."""
    run_id = run_id_for_checkpoint(checkpoint)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        table.append_batch(batch_df, batch_id, run_id=run_id)

    writer = (stream_df.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
