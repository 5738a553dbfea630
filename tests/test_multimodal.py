"""Multimodal pipeline: real BMP/WAV/AVI codecs (pure NumPy — images,
audio AND video are genuinely decoded), media table schema, Arrow-batched
feature extraction (deterministic across partitionings), real pixel
resize, real video frame sampling."""

import numpy as np
from pyspark.sql import functions as F

from mbrngq_spark.operators import multimodal as mm
from mbrngq_spark.sources.synth import documents_spans


def _media(spark, n=400):
    return mm.media_table(documents_spans(spark, n))


def test_bmp_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)  # odd stride pad
    back = mm.decode_bmp(mm.encode_bmp(img))
    np.testing.assert_array_equal(back, img)


def test_wav_roundtrip():
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32767, 5000, dtype=np.int16)
    back, rate = mm.decode_wav(mm.encode_wav(s, rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(back, s)


def test_avi_roundtrip():
    rng = np.random.default_rng(5)
    vid = rng.integers(0, 256, (7, 19, 33, 3), dtype=np.uint8)  # odd stride
    back, fps = mm.decode_avi(mm.encode_avi(vid, fps=10))
    assert fps == 10
    np.testing.assert_array_equal(back, vid)


def test_media_table_schema_and_payloads(spark):
    media = _media(spark)
    got = media.limit(80).toPandas()
    assert set(got.columns) == {"doc_id", "kind", "media_ref", "content", "meta"}
    assert set(got["kind"].unique()) <= {"image", "audio", "video"}
    # payloads are REAL encoded media matching their typed metadata
    for _, r in got.iterrows():
        if r["kind"] == "image":
            img = mm.decode_bmp(bytes(r["content"]))
            assert img.shape == (r["meta"]["height"], r["meta"]["width"], 3)
        elif r["kind"] == "audio":
            s, rate = mm.decode_wav(bytes(r["content"]))
            assert len(s) == int(r["meta"]["duration_ms"] * rate / 1000)
        else:
            frames, fps = mm.decode_avi(bytes(r["content"]))
            assert frames.shape[1:] == (r["meta"]["height"],
                                        r["meta"]["width"], 3)
            assert frames.shape[0] * 1000 // fps == r["meta"]["duration_ms"]
    aud = got[got["kind"] == "audio"]
    img = got[got["kind"] == "image"]
    vid = got[got["kind"] == "video"]
    assert (aud["meta"].map(lambda m: m["duration_ms"]) >= 1000).all()
    assert (img["meta"].map(lambda m: m["duration_ms"]) == 0).all()
    assert (vid["meta"].map(lambda m: m["duration_ms"] % 100) == 0).all()
    assert len(vid) > 0


def test_feature_extraction_deterministic_across_partitioning(spark):
    media = _media(spark)
    a = mm.extract_features(media.repartition(2)).toPandas() \
        .set_index("media_ref")["features"].map(tuple).sort_index()
    b = mm.extract_features(media.repartition(7)).toPandas() \
        .set_index("media_ref")["features"].map(tuple).sort_index()
    assert len(a) == len(b) and len(a) > 0
    assert (a == b).all()
    assert all(len(f) == mm.N_FEATURES for f in a)


def test_features_reflect_decoded_content(spark):
    """Image features carry the REAL decoded dimensions; audio features the
    REAL duration/rate — proof the decode isn't a stub."""
    media = _media(spark)
    feats = mm.extract_features(media).join(
        media.select("media_ref", "meta"), "media_ref").toPandas()
    for _, r in feats.iterrows():
        f = r["features"]
        if r["kind"] == "image":
            assert f[0] == r["meta"]["width"] and f[1] == r["meta"]["height"]
            assert 0.0 < f[8] < 1.0                     # global mean
        elif r["kind"] == "audio":
            assert abs(f[0] - r["meta"]["duration_ms"] / 1000.0) < 2e-3
            assert f[1] == mm.WAV_RATE
            assert 0.0 < f[2] <= 1.0                    # rms of a sine
            assert f[5] == r["meta"]["duration_ms"]     # exact round-trip
        elif r["kind"] == "video":
            assert f[0] == r["meta"]["width"] and f[1] == r["meta"]["height"]
            assert f[3] == r["meta"]["duration_ms"]     # exact round-trip
            assert f[2] == r["meta"]["duration_ms"] * mm.AVI_FPS / 1000
            assert f[4] == mm.AVI_FPS


def test_resize_images_reencodes_pixels(spark):
    media = _media(spark).filter(F.col("kind") == "image")
    out = mm.resize_images(media, max_side=24).toPandas()
    for _, r in out.iterrows():
        img = mm.decode_bmp(bytes(r["content"]))
        assert max(img.shape[0], img.shape[1]) <= 24
        assert img.shape == (r["meta"]["height"], r["meta"]["width"], 3)


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


def test_frame_sample_decoded_yields_real_images(spark):
    """REAL video frame sampling: sampled AVI frames re-encode as BMP
    image rows whose pixels equal the source video's frames, and feed the
    image pipeline (extract_features sees real dims)."""
    media = _media(spark, n=120)
    vids = media.filter(F.col("kind") == "video")
    sampled = mm.frame_sample_decoded(vids, every_ms=200)
    got = sampled.toPandas()
    assert len(got) > 0 and (got["kind"] == "image").all()
    src = {r["media_ref"]: bytes(r["content"])
           for _, r in vids.toPandas().iterrows()}
    for _, r in got.head(10).iterrows():
        ref = r["media_ref"].rsplit("#", 1)[0]
        frames, fps = mm.decode_avi(src[ref])
        np.testing.assert_array_equal(
            mm.decode_bmp(bytes(r["content"])), frames[r["frame_idx"]])
    feats = mm.extract_features(
        sampled.select("doc_id", "media_ref", "kind", "content")).toPandas()
    assert len(feats) == len(got)
    w = {r["media_ref"]: r["meta"]["width"] for _, r in got.iterrows()}
    assert all(f[0] == w[ref] for ref, f
               in zip(feats["media_ref"], feats["features"]))


def test_jpeg_roundtrip_smooth_psnr():
    """Baseline JPEG codec: smooth content must round-trip at high
    fidelity in both subsampling modes; dims exact for awkward sizes."""
    from mbrngq_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256],
                   axis=-1).astype(np.uint8)
    for ss in ("444", "422", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=ss))
        assert dec.shape == img.shape
        mse = np.mean((dec.astype(np.float64) - img) ** 2)
        psnr = 10 * np.log10(255 * 255 / mse)
        assert psnr > 35, (ss, psnr)


def test_jpeg_rejects_progressive():
    from mbrngq_spark.operators.jpeg import decode_jpeg, encode_jpeg
    import pytest
    import struct as st

    buf = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(buf).find(b"\xFF\xC0")
    buf[i + 1] = 0xC2                       # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(buf))


def test_mjpeg_avi_roundtrip_and_frame_sample():
    """MJPEG AVI: '00dc' JPEG chunks decode to the right dims/frame
    count, frames visually match (smooth content), and odd-sized JPEG
    payloads keep RIFF word alignment."""
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:21, 0:33]
    base = np.stack([(yy * 5) % 256, (xx * 3) % 256, ((xx + yy) * 4) % 256],
                    axis=-1).astype(np.uint8)
    frames = np.stack([(base.astype(np.int64) + 17 * i) % 256
                       for i in range(7)]).astype(np.uint8)
    avi = mm.encode_avi(frames, fps=10, codec="MJPG", quality=92)
    dec, fps = mm.decode_avi(avi)
    assert fps == 10 and dec.shape == frames.shape
    err = np.abs(dec.astype(np.float64) - frames).mean()
    assert err < 12.0, err                  # lossy but close (4:2:0)
    # compressed AVI is smaller than the DIB form of the same frames
    assert len(avi) < len(mm.encode_avi(frames, fps=10))


def test_mixed_codec_media_pipeline(spark):
    """synthesize_media(video_codec='MJPG') feeds the SAME featurize and
    frame-sample stages: integer slots (dims, frame count, duration)
    stay exact through the lossy codec."""
    import pandas as pd

    refs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [str(i) for i in range(6)],
        "kind": ["video"] * 6,
        "media_ref": [f"ref://v{i}" for i in range(6)],
    }))
    media = mm.synthesize_media(refs, video_codec="MJPG")
    feats = {r["doc_id"]: r for r in mm.extract_features(media).collect()}
    metas = {r["doc_id"]: r["meta"] for r in media.collect()}
    for did, m in metas.items():
        f = feats[did]["features"]
        assert int(f[0]) == m["width"] and int(f[1]) == m["height"]
        assert int(f[3]) == m["duration_ms"]
    sampled = mm.frame_sample_decoded(media, every_ms=500).collect()
    assert sampled and all(r["kind"] == "image" for r in sampled)
    for r in sampled:                       # sampled frames are real BMPs
        img = mm.decode_bmp(bytes(r["content"]))
        assert img.shape == (r["meta"]["height"], r["meta"]["width"], 3)


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn: the encoder byte-aligns and resets DC prediction at
    each restart; the decoder resynchronizes — fidelity unchanged."""
    from mbrngq_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256],
                   axis=-1).astype(np.uint8)
    for ss in ("444", "420"):
        for ri in (1, 3, 7):
            enc = encode_jpeg(img, 90, ss, restart_interval=ri)
            assert b"\xFF\xDD" in enc            # DRI present
            dec = decode_jpeg(enc)
            mse = np.mean((dec.astype(np.float64) - img) ** 2)
            assert 10 * np.log10(255 * 255 / mse) > 35


def test_corrupt_payloads_flag_rows_not_tasks(spark):
    """Truncated/corrupt media (valid magic, broken body) must flag the
    row (features[15] == -2) and frame sampling must skip it — never
    fail the Spark task."""
    import pandas as pd

    img = mm.encode_bmp(np.zeros((8, 8, 3), np.uint8))
    wav = mm.encode_wav(np.zeros(100, np.int16))
    avi = mm.encode_avi(np.zeros((2, 8, 8, 3), np.uint8), codec="MJPG")
    rows = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "media_ref": ["r1", "r2", "r3", "r4"],
        "kind": ["image", "audio", "video", "video"],
        "content": [img[:30], wav[:20], avi[:60],
                    avi[:-40]],            # all truncated mid-body
        "meta": [{"width": 8, "height": 8, "duration_ms": 0}] * 4,
    })
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r.doc_id: r.features
             for r in mm.extract_features(media).collect()}
    assert all(f[15] < 0 for f in feats.values())      # every row flagged
    assert len(feats) == 4
    sampled = mm.frame_sample_decoded(media).collect()
    assert sampled == []                   # corrupt videos skipped quietly
