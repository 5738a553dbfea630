"""Deduplication operators for the training-data pipeline.

Four tiers, all shuffle-disciplined:

- exact          — hash-groupBy on the normalized text (one shuffle on a
                   64/128-bit digest, never on the raw text bytes).
- MinHash + LSH  — word-shingle → H minhashes → B bands → bucket equi-join.
                   Signatures are built ENTIRELY JVM-side (split / transform /
                   slice / xxhash64 / array_min — no Python), so the map side
                   is codegen'd; the only shuffles are the band-bucket
                   self-join and the final verify.
- SimHash        — 64-bit sign-of-sum sketch over token hashes; near-dups =
                   small hamming distance, candidates via 16-bit chunk bands.
- n-gram Jaccard — exact similarity used to VERIFY candidate pairs (explode
                   shingles → count intersection / union). Only runs on LSH
                   survivors, so the quadratic blowup never touches the full
                   corpus.

Scale: the corpus is only ever shuffled by digest/bucket keys; candidate
pairs are a tiny fraction of n². Banding parameters (H, B) trade recall vs
candidate volume the standard MinHash-LSH way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_N = 3  # word-shingle width


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct text, keeper = min id.

    Returns (text_md5, keeper_id, dup_count)."""
    return (docs
            .withColumn("text_md5", F.md5(F.col(text_col)))
            .groupBy("text_md5")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("dup_count")))


def shingles_col(text: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles, built JVM-side."""
    toks = F.split(text, " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), k),
                     lambda j: F.concat_ws(" ", F.slice(toks, j, n)))
    return F.array_distinct(sh)


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig: array<long>[H]): sig[i] = min over shingles of
    xxhash64(shingle, i).

    ONE nested higher-order expression: the shingle array is evaluated once
    per row (separate per-sig columns would let Catalyst's CollapseProject
    inline — and recompute — the shingle construction H times; measured 16×
    slower). Seeding via an extra hash input gives H independent families
    without any Python."""
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    sig = F.transform(
        seeds,
        lambda seed: F.array_min(
            F.transform(F.col("sh"), lambda s: F.xxhash64(s, seed))))
    return (docs
            .select(id_col, shingles_col(F.col(text_col)).alias("sh"))
            .select(id_col, sig.alias("sig")))


def lsh_candidate_pairs(sigs: DataFrame, num_hashes: int = 16, bands: int = 4,
                        id_col: str = "doc_id",
                        max_bucket: int = 1000) -> DataFrame:
    """Band the signature array, bucket-join per band, union distinct pairs
    (a<b). Caller should persist ``sigs`` (each band re-reads it).

    ``max_bucket`` drops degenerate buckets (boilerplate/empty-text clusters
    whose quadratic pair blowup would dominate at corpus scale — the
    standard production-dedup guard; dropped buckets are near-identical
    families better handled by exact dedup first)."""
    rows = num_hashes // bands
    band_hashes = F.array(*[
        F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows), F.lit(b))
        for b in range(bands)])
    # ONE pass over the signatures: explode bands → (band, bucket) keys →
    # one degenerate-bucket filter → one self-join (instead of a per-band
    # loop of join pipelines — bands× fewer shuffles and jobs)
    bucketed = sigs.select(F.col(id_col).alias("id"),
                           F.posexplode(band_hashes).alias("band", "bucket"))
    ok = (bucketed.groupBy("band", "bucket").count()
          .filter(F.col("count") <= max_bucket)
          .select("band", "bucket"))
    bucketed = bucketed.join(F.broadcast(ok), ["band", "bucket"])
    other = bucketed.select(F.col("id").alias("id_b"), "band", "bucket")
    return (bucketed.join(other, ["band", "bucket"])
            .filter(F.col("id") < F.col("id_b"))
            .select(F.col("id").alias("id_a"), "id_b")
            .distinct())


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  shingle_side: str = "pairs") -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage).
    Returns (id_a, id_b, jaccard).

    ``shingle_side`` picks where the (expensive) shingle construction runs:
    - 'pairs' (default): texts join to the pair list FIRST and shingles are
      built per surviving pair row — O(pairs) shingle builds. Right when
      candidates are a sliver of n (the LSH production case; Catalyst will
      not hoist an expensive projection below a join by itself).
    - 'docs': shingles are built once per doc BEFORE the join — O(docs)
      builds, reused across pairs. Right for dense pair sets (all-pairs
      verification), where pairs ≫ docs."""
    if shingle_side == "docs":
        sh = docs.select(F.col(id_col).alias("id"),
                         shingles_col(F.col(text_col)).alias("sh")) \
                 .withColumn("n_sh", F.size(F.col("sh")))
        joined = (pairs
                  .join(sh.select(F.col("id").alias("id_a"),
                                  F.col("sh").alias("sh_a"),
                                  F.col("n_sh").alias("n_a")), "id_a")
                  .join(sh.select(F.col("id").alias("id_b"),
                                  F.col("sh").alias("sh_b"),
                                  F.col("n_sh").alias("n_b")), "id_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.col("n_a") + F.col("n_b") - inter
    else:
        texts = docs.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("t"))
        joined = (pairs
                  .join(texts.select(F.col("id").alias("id_a"),
                                     F.col("t").alias("t_a")), "id_a")
                  .join(texts.select(F.col("id").alias("id_b"),
                                     F.col("t").alias("t_b")), "id_b")
                  .withColumn("sh_a", shingles_col(F.col("t_a")))
                  .withColumn("sh_b", shingles_col(F.col("t_b"))))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (joined
            .withColumn("jaccard", inter.cast("double") / union.cast("double"))
            .select("id_a", "id_b", "jaccard"))


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7,
                            num_hashes: int = 16, bands: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: sketch → band join →
    exact-Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard).

    Signatures AND candidate pairs are persisted across their reuses (the
    verify stage references the pair set three times — unpersisted, the
    whole band-join chain would recompute each time). The corpus is spread
    across the full parallelism first — sketching is the CPU-heavy stage
    and a small input often arrives as a single file split."""
    spark = docs.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    d = docs.repartition(n_part)
    sigs = minhash_signatures(d, num_hashes, text_col, id_col).persist()
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col).persist()
    try:
        cands.count()  # materialize both persisted stages
        out = jaccard_pairs(d, cands, text_col, id_col) \
            .filter(F.col("jaccard") >= threshold)
        # pin results before releasing upstream storage
        out = out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
        cands.unpersist()
    return out


def simhash_col(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash, fully JVM-side: per token hash, each bit contributes
    ±1; the sketch bit is the sign of the sum. Built as a fold over the
    token array (no explode, no shuffle on the map side)."""
    toks = F.split(text, " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_contrib(b: int):
        # unary lambda on purpose — see hasher() note above
        return lambda h: F.when(
            F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1,
            F.lit(1)).otherwise(F.lit(-1))

    bit_cols = []
    for b in range(bits):
        contrib = F.transform(hashes, bit_contrib(b))
        s = F.aggregate(contrib, F.lit(0), lambda acc, v: acc + v)
        bit_cols.append(F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))
    out = F.lit(0).cast("long")
    for b, bc in enumerate(bit_cols):
        out = out.bitwiseOR(F.shiftleft(bc, b))
    return out


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dup pairs: candidates share one of four 16-bit chunks
    (any pair with hamming ≤ 3 must agree on ≥1 chunk — pigeonhole), then
    exact hamming verify. Returns (id_a, id_b, hamming)."""
    sk = docs.select(F.col(id_col).alias("id"),
                     simhash_col(F.col(text_col)).alias("sh"))
    pairs = None
    for c in range(4):
        chunk = F.shiftrightunsigned(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF))
        a = sk.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      chunk.alias("ck"))
        b = sk.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      chunk.alias("ck"))
        p = (a.join(b, "ck").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sh_a", "sh_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.distinct()
            .withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
