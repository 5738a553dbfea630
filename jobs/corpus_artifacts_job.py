"""spark-submit entry point: build the persisted corpus-serving artifacts
in one pass (north_rule packaging — the offline half of the retrieval +
tokenizer tiers):

    cd /root/repo && python tools/package_pyfiles.py && \\
    spark-submit --master 'local[8]' \\
        --py-files dist/mbrngq_spark.zip \\
        jobs/corpus_artifacts_job.py \\
        --docs /root/testdata/sf0.01/documents.parquet \\
        --emb /root/testdata/sf0.01/embeddings.parquet \\
        --out /tmp/corpus_artifacts --bpe-merges 32

Outputs under --out:
  bm25/   — term-hash-bucket-partitioned postings (df denormalized) + the
            1-row stats table; the query path (search.bm25_topk_from_artifact)
            scans nothing corpus-sized.
  ivf/    — pivot-partitioned inverted lists + pivots table; probes are
            partition pruning (similarity.probe_ivf_index).
  bpe/    — the merges table LEARNED from the corpus
            (text.train_bpe → parquet (rank, a, b, n)), consumable by
            n_tokens_bpe_col / bpe_encode_udf / bpe_count_sql.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--emb", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--bpe-merges", type=int, default=32)
    ap.add_argument("--nlist", type=int, default=16)
    ap.add_argument("--bm25-buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mbrngq-corpus-artifacts") \
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mbrngq_spark.operators.search import build_bm25_artifact
    from mbrngq_spark.operators.similarity import build_ivf_index
    from mbrngq_spark.operators.text import train_bpe

    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    emb = spark.read.parquet(args.emb)

    build_bm25_artifact(docs, f"{args.out}/bm25",
                        n_buckets=args.bm25_buckets)
    build_ivf_index(emb, f"{args.out}/ivf", nlist=args.nlist)
    merges = train_bpe(docs, num_merges=args.bpe_merges)
    spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank long, a string, b string, n long") \
        .coalesce(1).write.mode("overwrite").parquet(f"{args.out}/bpe")
    print(f"artifacts written to {args.out}: bm25 (buckets="
          f"{args.bm25_buckets}), ivf (nlist={args.nlist}), "
          f"bpe ({len(merges)} merges)")
    spark.stop()


if __name__ == "__main__":
    main()
