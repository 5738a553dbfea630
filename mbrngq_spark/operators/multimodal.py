"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codec calls are STUBBED (image/audio
libraries are not in this container — see ``_decode_bytes``); everything
Spark-side — schemas, explode/join plumbing, UDF signatures, batch shapes,
partitioning — is real and tested. Swap ``_decode_bytes`` for PIL/librosa
on a real cluster and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def media_table(docs_spans: DataFrame) -> DataFrame:
    """Explode the interleaved spans into a media-asset table with opaque
    binary payloads + typed metadata. The payload bytes here are a
    deterministic synthetic stand-in (hash-expanded from media_ref); on real
    data this column is the fetched object bytes."""
    sp = F.explode(F.col("spans")).alias("s")
    media = (docs_spans.select("doc_id", sp)
             .filter(F.col("s.kind") != "text")
             .select("doc_id",
                     F.col("s.kind").alias("kind"),
                     F.col("s.media_ref").alias("media_ref")))
    fake_bytes = F.to_binary(
        F.sha2(F.col("media_ref"), 256), F.lit("hex"))
    meta = F.struct(
        (F.lit(16) + F.pmod(F.xxhash64("media_ref", F.lit("w")), F.lit(48)))
        .cast("int").alias("width"),
        (F.lit(16) + F.pmod(F.xxhash64("media_ref", F.lit("h")), F.lit(48)))
        .cast("int").alias("height"),
        F.when(F.col("kind") == "audio",
               (F.lit(1000) + F.pmod(F.xxhash64("media_ref", F.lit("d")),
                                     F.lit(9000))).cast("int"))
        .otherwise(F.lit(0)).alias("duration_ms"))
    return media.withColumn("content", fake_bytes).withColumn("meta", meta)


def _decode_bytes(content: bytes, kind: str) -> np.ndarray:
    """STUB decode: real implementation would be PIL.Image.open /
    soundfile.read; this container has neither, so features are a
    deterministic function of the payload bytes (stable across runs and
    partitionings — exactly what the plumbing tests need)."""
    h = np.frombuffer(content[:32].ljust(32, b"\0"), dtype=np.uint8)
    rng = np.random.default_rng(int(h.sum()) * 131 + len(content))
    return rng.standard_normal(N_FEATURES).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode + featurize. One Arrow batch in, one out; no
    per-row Python calls outside the vectorized loop body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_bytes(c, k) for c, k in
                     zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "features": [f.tolist() for f in feats],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_meta(media: DataFrame, max_side: int) -> DataFrame:
    """'Resize' = metadata transform (aspect-preserving clamp of the typed
    meta; the byte re-encode is part of the stubbed codec layer)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.withColumn(
        "meta",
        F.struct(F.round(w * scale).cast("int").alias("width"),
                 F.round(h * scale).cast("int").alias("height"),
                 F.col("meta.duration_ms").alias("duration_ms")))


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for time-based media: one output row per sampled
    timestamp (audio/video only; images pass through with ts 0). Real
    decoding of the frame bytes is the stubbed codec layer; the row
    explosion, schema, and timestamps are the real plumbing."""
    n_frames = F.when(F.col("meta.duration_ms") > 0,
                      F.floor(F.col("meta.duration_ms") / F.lit(every_ms)) + 1) \
                .otherwise(F.lit(1)).cast("int")
    ts = F.explode(F.sequence(F.lit(0), n_frames - 1))
    return (media
            .select("doc_id", "media_ref", "kind", "meta",
                    ts.alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms)))
