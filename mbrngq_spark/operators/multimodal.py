"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

Codec status (this container has no image/audio libraries — PIL, soundfile
etc. are absent):

- image → REAL 24-bit BMP: synthesis, header parse, pixel decode and
  nearest-neighbor resize are pure NumPy (BMP is self-describing).
- audio → REAL 16-bit PCM WAV: RIFF header parse + sample decode, pure
  NumPy.
- video → STUB (no container/codec is parseable without libraries);
  deterministic hash features stand in, clearly marked by kind.

Everything Spark-side — schemas, explode/join plumbing, UDF signatures,
batch shapes, partitioning — is identical for all three kinds, so swapping
the video stub for a real decoder changes nothing around it.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16
WAV_RATE = 8000

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


# --- real encoders (pure NumPy/struct — used by the synthetic source) -------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)   # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit BMP bytes → (H, W, 3) uint8 RGB."""
    assert content[:2] == b"BM"
    offset = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    assert bpp == 24, "only 24-bit BMP supported"
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.frombuffer(content, dtype=np.uint8,
                         count=stride * abs(h), offset=offset)
    img = body.reshape(abs(h), stride)[:, :row].reshape(abs(h), w, 3)
    if h > 0:                                     # bottom-up storage
        img = img[::-1]
    return img[:, :, ::-1]                        # BGR → RGB


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
                      b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (int16 samples, sample_rate)."""
    assert content[:4] == b"RIFF" and content[8:12] == b"WAVE"
    rate = struct.unpack_from("<I", content, 24)[0]
    n = struct.unpack_from("<I", content, 40)[0]
    return np.frombuffer(content, dtype="<i2", count=n // 2, offset=44), rate


# --- the media-asset table ---------------------------------------------------

def media_table(docs_spans: DataFrame) -> DataFrame:
    """Explode the interleaved spans into a media-asset table with binary
    payloads + typed metadata. Payloads are REAL encoded media synthesized
    deterministically from (media_ref, meta): images are 24-bit BMPs,
    audio is PCM WAV — exactly what a fetch-from-object-store stage would
    deliver; video payloads are hash bytes (codec stub)."""
    sp = F.explode(F.col("spans")).alias("s")
    media = (docs_spans.select("doc_id", sp)
             .filter(F.col("s.kind") != "text")
             .select("doc_id",
                     F.col("s.kind").alias("kind"),
                     F.col("s.media_ref").alias("media_ref")))
    meta = F.struct(
        (F.lit(16) + F.pmod(F.xxhash64("media_ref", F.lit("w")), F.lit(48)))
        .cast("int").alias("width"),
        (F.lit(16) + F.pmod(F.xxhash64("media_ref", F.lit("h")), F.lit(48)))
        .cast("int").alias("height"),
        F.when(F.col("kind") == "audio",
               (F.lit(1000) + F.pmod(F.xxhash64("media_ref", F.lit("d")),
                                     F.lit(9000))).cast("int"))
        .otherwise(F.lit(0)).alias("duration_ms"))
    media = media.withColumn("meta", meta)

    def synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, kind, m in zip(pdf["media_ref"], pdf["kind"],
                                    pdf["meta"]):
                rng = np.random.default_rng(
                    abs(hash_ref(ref)))
                if kind == "image":
                    px = rng.integers(0, 256,
                                      (m["height"], m["width"], 3),
                                      dtype=np.uint8)
                    out.append(encode_bmp(px))
                elif kind == "audio":
                    n = int(m["duration_ms"] * WAV_RATE / 1000)
                    t = np.arange(n, dtype=np.float64)
                    f = 100.0 + float(rng.integers(0, 900))
                    wave = (np.sin(2 * np.pi * f * t / WAV_RATE) * 12000)
                    out.append(encode_wav(wave.astype(np.int16)))
                else:                              # video: codec stub
                    out.append(rng.integers(0, 256, 256,
                                            dtype=np.uint8).tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_ref": pdf["media_ref"],
                                "kind": pdf["kind"],
                                "content": out,
                                "meta": pdf["meta"]})

    return media.select("doc_id", "media_ref", "kind",
                        F.lit(None).cast("binary").alias("content"), "meta") \
        .mapInPandas(synthesize, schema=MEDIA_SCHEMA)


def hash_ref(ref: str) -> int:
    """Deterministic 63-bit seed from a media_ref (no PYTHONHASHSEED
    dependence)."""
    h = 1469598103934665603
    for b in ref.encode():
        h = ((h ^ b) * 1099511628211) & ((1 << 63) - 1)
    return h


# --- decode + featurize -------------------------------------------------------

def _features(content: bytes, kind: str) -> np.ndarray:
    """REAL decode for self-describing formats; stub for video."""
    out = np.zeros(N_FEATURES, dtype=np.float32)
    if kind == "image" and content[:2] == b"BM":
        img = decode_bmp(content).astype(np.float32)
        out[0], out[1] = img.shape[1], img.shape[0]          # w, h
        out[2:5] = img.mean(axis=(0, 1)) / 255.0             # channel means
        out[5:8] = img.std(axis=(0, 1)) / 255.0
        out[8] = float(img.mean()) / 255.0
    elif kind == "audio" and content[:4] == b"RIFF":
        s, rate = decode_wav(content)
        x = s.astype(np.float32) / 32768.0
        out[0] = len(s) / rate                               # duration s
        out[1] = rate
        out[2] = float(np.sqrt(np.mean(x * x)))              # rms
        out[3] = float(np.abs(x).max(initial=0.0))
        out[4] = float(np.mean(np.abs(np.diff(np.signbit(x)))))  # zcr
    else:
        # STUB (video): deterministic function of the payload bytes —
        # stable across runs and partitionings; swap for a real decoder
        # when codec libraries exist
        h = np.frombuffer(content[:32].ljust(32, b"\0"), dtype=np.uint8)
        rng = np.random.default_rng(int(h.sum()) * 131 + len(content))
        out[:] = rng.standard_normal(N_FEATURES).astype(np.float32)
    return out


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode + featurize. One Arrow batch in, one out; no
    per-row Python calls outside the vectorized loop body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features(c, k) for c, k in
                     zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "features": [f.tolist() for f in feats],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_side: int) -> DataFrame:
    """REAL aspect-preserving nearest-neighbor resize for BMP payloads
    (decode → index-map → re-encode, pure NumPy); non-image rows pass
    through. Meta is updated to the actual re-encoded dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for c, k, m in zip(pdf["content"], pdf["kind"], pdf["meta"]):
                if k == "image" and c[:2] == b"BM":
                    img = decode_bmp(c)
                    h, w, _ = img.shape
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = max(int(round(w * scale)), 1), \
                        max(int(round(h * scale)), 1)
                    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
                    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
                    img2 = img[yi][:, xi]
                    contents.append(encode_bmp(img2))
                    metas.append({"width": nw, "height": nh,
                                  "duration_ms": m["duration_ms"]})
                else:
                    contents.append(c)
                    metas.append(m)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_ref": pdf["media_ref"],
                                "kind": pdf["kind"],
                                "content": contents,
                                "meta": metas})

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def resize_meta(media: DataFrame, max_side: int) -> DataFrame:
    """'Resize' as a metadata-only transform (aspect-preserving clamp) —
    the cheap planning twin of resize_images."""
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
    decoding of video frame bytes is the stubbed codec layer; the row
    explosion, schema, and timestamps are the real plumbing."""
    n_frames = F.when(F.col("meta.duration_ms") > 0,
                      F.floor(F.col("meta.duration_ms") / F.lit(every_ms)) + 1) \
                .otherwise(F.lit(1)).cast("int")
    ts = F.explode(F.sequence(F.lit(0), n_frames - 1))
    return (media
            .select("doc_id", "media_ref", "kind", "meta",
                    ts.alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms)))
