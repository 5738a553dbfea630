"""spark-submit entry point: checkpointed index build (north_rule packaging).

Run (local sandbox; on a cluster swap the master and add executor confs):

    cd /root/repo && python tools/package_pyfiles.py && \\
    spark-submit --master 'local[8]' \\
        --py-files dist/mbrngq_spark.zip \\
        jobs/build_index_job.py \\
        --n-docs 100000 --out /tmp/idx_out --ckpt /tmp/idx_ckpt \\
        --run-id demo1

The job is resumable: work is split into coarse-cell partition units; each
unit commits a lineage+metrics row (mbrngq_spark/plans/checkpoint.py), and a
rerun with the same --run-id skips committed units (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--distribution", default="uniform")
    ap.add_argument("--fail-unit", type=int, default=None,
                    help="test hook: crash after writing this unit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("mbrngq-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mbrngq_spark.index import IndexLayout, build_index
    from mbrngq_spark.plans.checkpoint import run_checkpointed
    from mbrngq_spark.sources.synth import documents_spans, with_geometry_spans

    layout = IndexLayout()
    docs = with_geometry_spans(
        documents_spans(spark, args.n_docs), distribution=args.distribution)
    docs = docs.withColumn("doc_id",
                           F.substring("doc_id", 5, 8).cast("long"))
    indexed, stats = build_index(docs, layout)
    indexed = indexed.persist()

    units = [r.c for r in
             indexed.select(F.col("cell_coarse").alias("c")).distinct().collect()]

    def process(unit: int):
        return indexed.filter(F.col("cell_coarse") == unit)

    fail_on = (lambda u: u == args.fail_unit) if args.fail_unit is not None \
        else None
    summary = run_checkpointed(spark, args.run_id, sorted(units), process,
                               args.out, args.ckpt, fail_on=fail_on)
    stats.write.mode("overwrite").parquet(f"{args.out}/_cell_stats")
    print(f"build_index done: {summary}")
    spark.stop()


if __name__ == "__main__":
    main()
