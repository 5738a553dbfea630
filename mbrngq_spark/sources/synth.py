"""Deterministic synthetic sources — the engine's own input tables.

Generates the BASELINE.json ``input_hint`` table shape entirely in Spark
(seeded, hash-based, no RNG state, no external data — FIXTURES.md):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus derived geometry in the reference's coordinate space with the reference's
three point distributions (mbR-NGQ/Data/DataGenerators.cs): uniform
(:10-28), gaussian blobs σ=0.3·extent (:85-137), gaussian islands
σ=0.05·extent (:30-83 — the app default and our skew fixture).

Everything is a pure Column program over ``spark.range`` — reproducible on
any cluster size, and generation parallelism scales with the range split.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mbrngq_spark.config import DEFAULT, EngineConfig

SPAN_KINDS = ("text", "image", "audio", "video")


def _u(col: Column, salt: str, mod: int = 1_000_000) -> Column:
    """Uniform [0,1) from a hash — deterministic, seed 42 via salt."""
    return (F.pmod(F.xxhash64(col, F.lit(salt), F.lit(42)), F.lit(mod))
            .cast("double") / F.lit(float(mod)))


def documents_spans(spark: SparkSession, n: int) -> DataFrame:
    """The interleaved text+media documents table (FIXTURES.md §1).

    Span count 1..4; per-span kind/text/media_ref derived from
    (doc_id, position) hashes; ``offset`` is the span position — the
    order-preservation invariant rides on it."""
    did = F.col("doc_id")
    nspans = (F.lit(1) + F.pmod(F.xxhash64(did, F.lit("nspans")), F.lit(4))).cast("int")

    def span(j: Column) -> Column:
        kind = F.element_at(
            F.array(*[F.lit(k) for k in SPAN_KINDS]),
            (F.lit(1) + F.pmod(F.xxhash64(did, F.lit("kind"), j),
                               F.lit(len(SPAN_KINDS)))).cast("int"))
        is_text = kind == F.lit("text")
        return F.struct(
            kind.alias("kind"),
            F.when(is_text, F.concat(F.lit("t-"), did, F.lit("-"), j.cast("string")))
             .otherwise(F.lit("")).alias("text"),
            F.when(~is_text, F.concat(F.lit("ref://"), did, F.lit("/"), j.cast("string")))
             .otherwise(F.lit("")).alias("media_ref"),
            j.cast("int").alias("offset"))

    return (spark.range(n)
            .select(F.format_string("doc-%08d", F.col("id")).alias("doc_id"))
            .withColumn("spans",
                        F.transform(F.sequence(F.lit(0), nspans - 1), span)))


def span_checksum(spans_col: Column) -> Column:
    """Order-sensitive checksum of the full span sequence — the invariant
    verified after every shuffle/join (input_hint: span-sequence equality
    of (kind, text, media_ref, order)). xxhash64 hashes the nested
    array<struct> directly (order-sensitive, JVM-side — ~3× cheaper than
    hashing a JSON rendering)."""
    return F.xxhash64(spans_col)


def with_geometry_spans(docs: DataFrame, cfg: EngineConfig = DEFAULT,
                        distribution: str = "uniform") -> DataFrame:
    """documents → + (x, y, category) per the reference's generators.

    - uniform:          ≡ UniformGenerator (DataGenerators.cs:10-28)
    - gaussian:         m blobs, σ = 0.3·extent (DataGenerators.cs:85-137)
    - gaussian_island:  σ = 0.05·extent (DataGenerators.cs:30-83) — SKEW:
      nearly all docs land in a few cells; exercises salting + adaptive
      splitting (north_rule).
    Gaussian offsets via Box-Muller on two hash-uniforms, clamped to bounds
    (the reference rejection-resamples; clamping keeps the program a pure
    Column expression — the distribution tail difference is irrelevant to
    the skew property under test)."""
    did = F.col("doc_id")
    cat = F.pmod(F.xxhash64(did, F.lit("cat")), F.lit(cfg.m)).cast("int")
    docs = docs.withColumn("category", cat)

    if distribution == "uniform":
        x = F.lit(cfg.min_x) + _u(did, "x") * F.lit(cfg.width)
        y = F.lit(cfg.min_y) + _u(did, "y") * F.lit(cfg.height)
    elif distribution in ("gaussian", "gaussian_island"):
        sigma = 0.3 if distribution == "gaussian" else 0.05
        inner = 0.2 if distribution == "gaussian" else 0.8
        # blob center per category, hashed from the category value
        ccol = F.col("category").cast("string")
        cx = F.lit(cfg.min_x + cfg.width * (1 - inner) / 2) \
            + _u(ccol, "cx") * F.lit(cfg.width * inner)
        cy = F.lit(cfg.min_y + cfg.height * (1 - inner) / 2) \
            + _u(ccol, "cy") * F.lit(cfg.height * inner)
        # Box-Muller (same transform as DataGenerators.cs:125-136)
        u1 = _u(did, "bm1")
        u2 = _u(did, "bm2")
        r = F.sqrt(F.lit(-2.0) * F.log(u1 + F.lit(1e-12)))
        z1 = r * F.cos(F.lit(2.0 * math.pi) * u2)
        z2 = r * F.sin(F.lit(2.0 * math.pi) * u2)
        x = cx + z1 * F.lit(sigma * cfg.width)
        y = cy + z2 * F.lit(sigma * cfg.height)
        x = F.greatest(F.least(x, F.lit(cfg.max_x)), F.lit(cfg.min_x))
        y = F.greatest(F.least(y, F.lit(cfg.max_y)), F.lit(cfg.min_y))
    else:
        raise ValueError(f"unknown distribution: {distribution}")

    return docs.withColumn("x", x).withColumn("y", y)


def query_points(spark: SparkSession, q: int,
                 cfg: EngineConfig = DEFAULT) -> DataFrame:
    """(query_id, qx, qy) hash-uniform in bounds (FIXTURES.md §3)."""
    qid = F.col("query_id")
    return (spark.range(q).select(F.col("id").alias("query_id"))
            .withColumn("qx", F.lit(cfg.min_x)
                        + _u(qid.cast("string"), "qx") * F.lit(cfg.width))
            .withColumn("qy", F.lit(cfg.min_y)
                        + _u(qid.cast("string"), "qy") * F.lit(cfg.height)))
