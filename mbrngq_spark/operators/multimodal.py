"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

Codec status (this container has no image/audio/video libraries — PIL,
soundfile, ffmpeg etc. are absent — so all three codecs are pure
NumPy/struct over self-describing formats):

- image → REAL 24-bit BMP: synthesis, header parse, pixel decode and
  nearest-neighbor resize.
- audio → REAL 16-bit PCM WAV: RIFF header parse + sample decode.
- video → REAL AVI (RIFF, same container family as WAV): avih/strh/strf
  headers; frames either as uncompressed bottom-up 24-bit DIB '00db'
  chunks or as COMPRESSED MJPEG '00dc' chunks — one baseline JPEG per
  frame, encoded/decoded by the from-scratch pure-NumPy T.81 codec
  (operators/jpeg.py: DCT, Annex-K quant + Huffman tables, 4:4:4 and
  4:2:0). Encode, full-frame decode, and frame sampling all round-trip
  for both codecs. (H.264-class inter-frame codecs remain out of scope.)

Metadata (width/height/duration) is derived from ``media_ref`` via md5-hex
arithmetic — identical in Spark and DuckDB — so the media pipeline's decoded
outputs are value-checkable by the SQL oracle: the decoder must round-trip
exactly the meta the synthesizer encoded.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16
WAV_RATE = 8000
AVI_FPS = 10                    # frame every 100 ms — durations round-trip

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


def _dib_body(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → bottom-up BGR DIB body with 4-byte row pad
    (the shared pixel layout of BMP files and AVI '00db' frames)."""
    h, w, _ = pixels.shape
    row = w * 3
    body = np.zeros((h, row + ((-row) % 4)), dtype=np.uint8)
    body[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)
    return body.tobytes()


def _dib_decode(body: bytes, w: int, h: int) -> np.ndarray:
    row = w * 3
    stride = row + ((-row) % 4)
    px = np.frombuffer(body, dtype=np.uint8, count=stride * h) \
        .reshape(h, stride)[:, :row].reshape(h, w, 3)
    return px[::-1, :, ::-1]


def encode_avi(frames: np.ndarray, fps: int = AVI_FPS,
               codec: str = "DIB", quality: int = 85) -> bytes:
    """(N, H, W, 3) uint8 RGB → AVI (RIFF) bytes: LIST hdrl (avih + LIST
    strl (strh 'vids' + strf BITMAPINFOHEADER)) followed by LIST movi.

    ``codec``: 'DIB' writes uncompressed bottom-up 24-bit '00db' chunks;
    'MJPG' writes one baseline JPEG per frame in '00dc' chunks (fourcc
    MJPG in strh + strf.biCompression) — the compressed shape real
    MJPEG corpora have, via the from-scratch jpeg.py codec."""
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unknown AVI codec: {codec}")
    n, h, w, _ = frames.shape
    if codec == "MJPG":
        from mbrngq_spark.operators.jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality, subsampling="420")
                    for f in frames]
        cc, handler, compression = b"00dc", b"MJPG", \
            struct.unpack("<I", b"MJPG")[0]
        frame_bytes = max(len(p) for p in payloads)
    else:
        payloads = [_dib_body(f) for f in frames]
        cc, handler, compression = b"00db", b"DIB ", 0
        frame_bytes = (w * 3 + ((-w * 3) % 4)) * h
    movi_items = b"".join(
        cc + struct.pack("<I", len(p)) + p + (b"\x00" if len(p) & 1 else b"")
        for p in payloads)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" \
        + movi_items
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # HASINDEX off
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = b"strh" + struct.pack("<I", 56) + struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", handler, 0, 0, 0, 0,
        1, fps, 0, n, frame_bytes, 0, 0, 0, 0, w, h)
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_bytes,
        2835, 2835, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) \
        + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) \
        + b"hdrl" + avih + strl
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, data_offset, size) over a RIFF chunk run (word-
    aligned, per spec)."""
    while off + 8 <= end:
        cc = buf[off:off + 4]
        sz = struct.unpack_from("<I", buf, off + 4)[0]
        yield cc, off + 8, sz
        off += 8 + sz + (sz & 1)


def decode_avi(content: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → ((N, H, W, 3) uint8 RGB frames, fps). Parses the real
    RIFF structure (hdrl's avih for dims/rate, movi's frame chunks) — not
    a fixed-offset shortcut — so any spec-shaped AVI decodes, not just
    our encoder's output. '00db' chunks decode as uncompressed bottom-up
    DIB; '00dc' chunks whose payload is a JPEG stream decode through the
    pure-NumPy baseline JPEG decoder (MJPEG)."""
    assert content[:4] == b"RIFF" and content[8:12] == b"AVI ", "not AVI"
    w = h = fps = None
    payloads: list[tuple[bytes, int, int]] = []

    def walk(off: int, end: int) -> None:
        nonlocal w, h, fps
        for cc, data, sz in _riff_chunks(content, off, end):
            if cc == b"LIST":
                walk(data + 4, data + sz)          # recurse past list type
            elif cc == b"avih":
                us_per_frame, ww, hh = struct.unpack_from("<I", content, data)[0], \
                    struct.unpack_from("<I", content, data + 32)[0], \
                    struct.unpack_from("<I", content, data + 36)[0]
                w, h, fps = ww, hh, round(1_000_000 / us_per_frame)
            elif cc in (b"00db", b"00dc"):
                payloads.append((cc, data, sz))

    walk(12, len(content))
    assert w is not None and payloads, "missing avih header or frames"

    def frame(cc: bytes, d: int, s: int) -> np.ndarray:
        buf = content[d:d + s]
        # Dispatch on the fourcc ALONE: a '00db' uncompressed DIB whose
        # first pixel happens to encode B,G = 0xFF,0xD8 must not be fed to
        # the JPEG decoder (2^-16 per frame on random content).
        if cc == b"00dc":
            assert buf[:2] == b"\xFF\xD8", "compressed chunk is not MJPEG"
            from mbrngq_spark.operators.jpeg import decode_jpeg

            img = decode_jpeg(buf)
            assert img.shape[:2] == (h, w), "frame dims disagree with avih"
            return img
        return _dib_decode(buf, w, h)

    frames = np.stack([frame(cc, d, s) for cc, d, s in payloads])
    return frames, fps


# --- the media-asset table ---------------------------------------------------

def _md5_seed(ref: Column, salt: str) -> Column:
    """Deterministic small int from a media_ref, via md5-hex character
    codes — md5 hex is bit-identical in Spark and DuckDB (the proven
    lsh_candidates_md5 trick), so every meta field derived from this is
    recomputable by the SQL oracle."""
    m = F.md5(F.concat(ref, F.lit(salt)))
    return F.ascii(F.substring(m, 1, 1)) * F.lit(131) \
        + F.ascii(F.substring(m, 2, 1))


def media_meta_col(kind: Column, ref: Column) -> Column:
    """Typed media metadata from (kind, media_ref): width/height 16..63 px,
    audio duration 1000..9999 ms, video duration 100·(1..30) ms (a whole
    number of AVI_FPS frames, so decoded duration round-trips exactly)."""
    width = (F.lit(16) + _md5_seed(ref, "/w") % F.lit(48)).cast("int")
    height = (F.lit(16) + _md5_seed(ref, "/h") % F.lit(48)).cast("int")
    duration = (
        F.when(kind == "audio",
               F.lit(1000) + _md5_seed(ref, "/d") % F.lit(9000))
        .when(kind == "video",
              F.lit(1000 // AVI_FPS)
              * (F.lit(1) + _md5_seed(ref, "/v") % F.lit(30)))
        .otherwise(F.lit(0))).cast("int")
    return F.struct(width.alias("width"), height.alias("height"),
                    duration.alias("duration_ms"))


def synthesize_media(refs: DataFrame,
                     video_codec: str = "DIB") -> DataFrame:
    """(doc_id, media_ref, kind) → the media-asset table with binary
    payloads + typed metadata. Payloads are REAL encoded media synthesized
    deterministically from (media_ref, meta) — exactly what a
    fetch-from-object-store stage would deliver: 24-bit BMP images, PCM WAV
    audio, AVI video (``video_codec``: uncompressed 'DIB' or compressed
    'MJPG' via the pure-NumPy baseline JPEG encoder)."""
    media = refs.withColumn("meta", media_meta_col(F.col("kind"),
                                                   F.col("media_ref")))

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
                else:                              # video: real AVI
                    n_frames = int(m["duration_ms"] * AVI_FPS / 1000)
                    px = rng.integers(0, 256,
                                      (n_frames, m["height"], m["width"], 3),
                                      dtype=np.uint8)
                    out.append(encode_avi(px, codec=video_codec))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_ref": pdf["media_ref"],
                                "kind": pdf["kind"],
                                "content": out,
                                "meta": pdf["meta"]})

    return media.select("doc_id", "media_ref", "kind",
                        F.lit(None).cast("binary").alias("content"), "meta") \
        .mapInPandas(synthesize, schema=MEDIA_SCHEMA)


def media_table(docs_spans: DataFrame) -> DataFrame:
    """Explode the interleaved spans into the media-asset table (media
    spans only; see synthesize_media for the payload contract)."""
    sp = F.explode(F.col("spans")).alias("s")
    refs = (docs_spans.select("doc_id", sp)
            .filter(F.col("s.kind") != "text")
            .select("doc_id",
                    F.col("s.kind").alias("kind"),
                    F.col("s.media_ref").alias("media_ref")))
    return synthesize_media(refs)


def hash_ref(ref: str) -> int:
    """Deterministic 63-bit seed from a media_ref (no PYTHONHASHSEED
    dependence)."""
    h = 1469598103934665603
    for b in ref.encode():
        h = ((h ^ b) * 1099511628211) & ((1 << 63) - 1)
    return h


# --- decode + featurize -------------------------------------------------------

def _features(content: bytes, kind: str) -> np.ndarray:
    """REAL decode + featurize for all three kinds (BMP / WAV / AVI).
    Integer-valued slots (dims, duration_ms, frame count) are exact in
    float32, so the SQL oracle can value-check the decode round-trip.
    Unrecognized payloads featurize to zeros with out[15] = -1 (an
    honest 'unknown codec' flag, not fake features); payloads whose
    magic matches but whose body is CORRUPT (truncated fetch, bit rot —
    guaranteed at 100 TB) get out[15] = -2 instead of killing the task
    (_features is wrapped by _features_safe)."""
    out = np.zeros(N_FEATURES, dtype=np.float32)
    if kind == "image" and content[:2] == b"BM":
        img = decode_bmp(content).astype(np.float32)
        out[0], out[1] = img.shape[1], img.shape[0]          # w, h
        out[2:5] = img.mean(axis=(0, 1)) / 255.0             # channel means
        out[5:8] = img.std(axis=(0, 1)) / 255.0
        out[8] = float(img.mean()) / 255.0
    elif kind == "audio" and content[:4] == b"RIFF" \
            and content[8:12] == b"WAVE":
        s, rate = decode_wav(content)
        x = s.astype(np.float32) / 32768.0
        out[0] = len(s) / rate                               # duration s
        out[1] = rate
        out[2] = float(np.sqrt(np.mean(x * x)))              # rms
        out[3] = float(np.abs(x).max(initial=0.0))
        out[4] = float(np.mean(np.abs(np.diff(np.signbit(x)))))  # zcr
        out[5] = len(s) * 1000.0 / rate                      # duration_ms
    elif kind == "video" and content[:4] == b"RIFF" \
            and content[8:12] == b"AVI ":
        frames, fps = decode_avi(content)
        n, h, w, _ = frames.shape
        out[0], out[1] = w, h
        out[2] = n                                           # frame count
        out[3] = n * 1000.0 / fps                            # duration_ms
        out[4] = fps
        f0 = frames[0].astype(np.float32)
        out[5:8] = f0.mean(axis=(0, 1)) / 255.0              # frame-0 means
        out[8] = float(frames.astype(np.float32).mean()) / 255.0
    else:
        out[15] = -1.0
    return out


def _features_safe(content: bytes, kind: str) -> np.ndarray:
    """A corrupt payload (valid magic, broken body) must flag the ROW,
    never fail the TASK — at corpus scale some fetches are always
    truncated."""
    try:
        return _features(content, kind)
    except Exception:
        out = np.zeros(N_FEATURES, dtype=np.float32)
        out[15] = -2.0                 # decode error (vs -1 unknown codec)
        return out


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode + featurize. One Arrow batch in, one out; no
    per-row Python calls outside the vectorized loop body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features_safe(c, k) for c, k in
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
    """Metadata-tier frame sampling for time-based media: one output row
    per sampled timestamp (audio/video only; images pass through with
    ts 0) — the cheap planning twin of frame_sample_decoded."""
    n_frames = F.when(F.col("meta.duration_ms") > 0,
                      F.floor(F.col("meta.duration_ms") / F.lit(every_ms)) + 1) \
                .otherwise(F.lit(1)).cast("int")
    ts = F.explode(F.sequence(F.lit(0), n_frames - 1))
    return (media
            .select("doc_id", "media_ref", "kind", "meta",
                    ts.alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms)))


def frame_sample_decoded(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: decode each AVI payload, take the frame
    nearest every ``every_ms`` timestamp, re-encode each sampled frame as a
    BMP — sampled frames become IMAGE rows (kind='image') that feed
    directly into resize_images / extract_features. Non-video rows are
    dropped. mapInPandas: one Arrow batch in → ≥0 frame rows out."""
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_SCHEMA["meta"].dataType),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in ("doc_id", "media_ref", "frame_idx",
                                    "frame_ts_ms", "content", "meta")}
            for did, ref, kind, c in zip(pdf["doc_id"], pdf["media_ref"],
                                         pdf["kind"], pdf["content"]):
                if kind != "video" or c[:4] != b"RIFF":
                    continue
                try:
                    frames, fps = decode_avi(bytes(c))
                except Exception:
                    continue           # corrupt payload: skip, don't kill
                n, h, w, _ = frames.shape
                dur_ms = n * 1000 // fps
                for i, ts in enumerate(range(0, dur_ms, every_ms)):
                    fi = min(ts * fps // 1000, n - 1)
                    rows["doc_id"].append(did)
                    rows["media_ref"].append(f"{ref}#f{fi}")
                    rows["frame_idx"].append(fi)
                    rows["frame_ts_ms"].append(ts)
                    rows["content"].append(encode_bmp(frames[fi]))
                    rows["meta"].append({"width": w, "height": h,
                                         "duration_ms": 0})
            if not rows["doc_id"]:
                continue               # all-skipped batch: an EMPTY frame
                # would infer float64 for the meta struct column
            yield pd.DataFrame({
                "doc_id": rows["doc_id"], "media_ref": rows["media_ref"],
                "kind": ["image"] * len(rows["doc_id"]),
                "frame_idx": rows["frame_idx"],
                "frame_ts_ms": rows["frame_ts_ms"],
                "content": rows["content"], "meta": rows["meta"]})

    return media.mapInPandas(run, schema=schema)
