"""spark-submit entry point: exactly-once streaming ingestion into a
snapshot table (north_rule packaging — the unbounded-input sibling of
build_index_job.py).

Run (local sandbox; on a cluster swap the master and add executor confs):

    cd /root/repo && python tools/package_pyfiles.py && \\
    spark-submit --master 'local[8]' \\
        --py-files dist/mbrngq_spark.zip \\
        jobs/ingest_stream_job.py \\
        --src /tmp/ingest_src --table /tmp/ingest_tbl \\
        --ckpt /tmp/ingest_ckpt

Each micro-batch commits one table snapshot whose manifest records the
micro-batch id; killing the job mid-stream and rerunning with the same
--ckpt resumes from the first unprocessed source file, replayed batches
no-op, and readers always see whole committed batches
(mbrngq_spark/streaming/snapshot_stream.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="parquet directory watched as a file stream")
    ap.add_argument("--table", required=True, help="snapshot-table root")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--schema",
                    default="doc_id long, text string",
                    help="DDL schema of the source files")
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mbrngq-ingest-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mbrngq_spark.plans.snapshots import SnapshotTable
    from mbrngq_spark.streaming.snapshot_stream import ingest_snapshot_stream

    table = SnapshotTable(spark, args.table)
    stream = (spark.readStream.schema(args.schema)
              .option("maxFilesPerTrigger", args.max_files_per_trigger)
              .parquet(args.src))
    q = ingest_snapshot_stream(stream, table, args.ckpt,
                               trigger={"availableNow": True})
    q.awaitTermination()
    snap = table.current_snapshot_id()
    n = table.read().count() if snap else 0
    print(f"ingest done: snapshot={snap} rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
