"""Multimodal plumbing: media table schema, Arrow-batched feature extraction
(deterministic across partitionings — the stubbed codec is a pure function
of the payload), resize metadata, frame sampling."""

from pyspark.sql import functions as F

from mbrngq_spark.operators import multimodal as mm
from mbrngq_spark.sources.synth import documents_spans


def _media(spark, n=400):
    return mm.media_table(documents_spans(spark, n))


def test_media_table_schema_and_payloads(spark):
    media = _media(spark)
    got = media.limit(50).toPandas()
    assert set(got.columns) == {"doc_id", "kind", "media_ref", "content", "meta"}
    assert set(got["kind"].unique()) <= {"image", "audio"}
    assert all(isinstance(b, (bytes, bytearray)) and len(b) == 32
               for b in got["content"])
    assert all(m["width"] >= 16 and m["height"] >= 16 for m in got["meta"])
    # audio rows carry duration, image rows don't
    aud = got[got["kind"] == "audio"]
    img = got[got["kind"] == "image"]
    assert (aud["meta"].map(lambda m: m["duration_ms"]) >= 1000).all()
    assert (img["meta"].map(lambda m: m["duration_ms"]) == 0).all()


def test_feature_extraction_deterministic_across_partitioning(spark):
    media = _media(spark)
    a = mm.extract_features(media.repartition(2)).toPandas() \
        .set_index("media_ref")["features"].map(tuple).sort_index()
    b = mm.extract_features(media.repartition(7)).toPandas() \
        .set_index("media_ref")["features"].map(tuple).sort_index()
    assert len(a) == len(b) and len(a) > 0
    assert (a == b).all()
    assert all(len(f) == mm.N_FEATURES for f in a)


def test_resize_clamps_aspect(spark):
    media = _media(spark)
    out = mm.resize_meta(media, max_side=24).select("meta").toPandas()
    assert all(max(m["width"], m["height"]) <= 24 for m in out["meta"])
    assert all(m["width"] >= 1 and m["height"] >= 1 for m in out["meta"])


def test_frame_sampling(spark):
    media = _media(spark)
    frames = mm.frame_sample(media, every_ms=1000)
    got = frames.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.max("frame_ts_ms").alias("max_ts")).toPandas().set_index("kind")
    # images: exactly one frame at ts 0
    assert got.loc["image", "max_ts"] == 0
    # audio: multiple frames, spaced by every_ms
    assert got.loc["audio", "max_ts"] >= 1000
    one = frames.filter(F.col("kind") == "audio").limit(20).toPandas()
    assert (one["frame_ts_ms"] == one["frame_idx"] * 1000).all()
