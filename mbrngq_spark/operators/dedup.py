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
    """(id, sig_0..sig_{H-1}): sig_i = min over shingles of xxhash64(shingle, i).

    Seeding via an extra literal hash input gives H independent hash families
    without any Python."""
    out = docs.select(id_col, shingles_col(F.col(text_col)).alias("sh"))

    def hasher(seed: int):
        # NB: the lambda must be unary — PySpark passes the element index as
        # a second argument to binary lambdas, which would clobber the seed
        return lambda s: F.xxhash64(s, F.lit(seed))

    for i in range(num_hashes):
        out = out.withColumn(
            f"sig_{i}", F.array_min(F.transform(F.col("sh"), hasher(i))))
    return out.drop("sh")


def lsh_candidate_pairs(sigs: DataFrame, num_hashes: int = 16, bands: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signature, bucket-join per band, union distinct pairs (a<b)."""
    rows = num_hashes // bands
    pairs = None
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows + r}") for r in range(rows)]
        bucketed = sigs.select(F.col(id_col).alias("id"),
                               F.xxhash64(*cols).alias("bucket"))
        other = bucketed.select(F.col("id").alias("id_b"), "bucket")
        p = (bucketed.join(other, "bucket")
             .filter(F.col("id") < F.col("id_b"))
             .select(F.col("id").alias("id_a"), "id_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage).

    Returns (id_a, id_b, jaccard)."""
    sh = docs.select(F.col(id_col).alias("id"),
                     shingles_col(F.col(text_col)).alias("sh"),
                     F.size(shingles_col(F.col(text_col))).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                  F.col("n_sh").alias("n_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                  F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (pairs.join(a, "id_a").join(b, "id_b")
            .withColumn("jaccard",
                        inter.cast("double")
                        / (F.col("n_a") + F.col("n_b") - inter).cast("double"))
            .select("id_a", "id_b", "jaccard"))


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7,
                            num_hashes: int = 16, bands: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: sketch → band join →
    exact-Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(docs, num_hashes, text_col, id_col)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col)
    return jaccard_pairs(docs, cands, text_col, id_col) \
        .filter(F.col("jaccard") >= threshold)


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
