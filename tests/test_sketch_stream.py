"""Streaming + lineage integration of the HLL sketch: batch≡stream
register equality, idempotent-merge exactly-once under an injected
crash-replay, and the checkpointed per-unit metrics rollup."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators import sketch as S
from mbrngq_spark.plans.checkpoint import (rollup_unit_sketches,
                                           run_checkpointed)
from mbrngq_spark.streaming.sketch_stream import (hll_sketch_stream,
                                                  merge_sketch_into)

SRC_SCHEMA = "k string, item string"


def _pdf(batch: int, n: int = 120) -> pd.DataFrame:
    rows = [("a" if i % 3 else "b",
             hashlib.md5(f"it/{batch}/{i}".encode()).hexdigest()[:10])
            for i in range(n)]
    return pd.DataFrame(rows, columns=["k", "item"])


def test_stream_sketch_equals_batch(spark, tmp_path):
    """complete-mode streaming registers == batch registers on the same
    rows. State is bounded (≤ keys × 256) so no watermark is needed."""
    src = str(tmp_path / "src")
    frames = [_pdf(b) for b in range(4)]
    for pdf in frames:
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SRC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (hll_sketch_stream(stream, ["k"], "item")
         .writeStream.format("memory").queryName("hll_s")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["k"], r["register"]): r["rho"]
           for r in spark.sql("select * from hll_s").collect()}
    batch = spark.createDataFrame(pd.concat(frames), SRC_SCHEMA)
    exp = {(r["k"], r["register"]): r["rho"]
           for r in S.hll_sketch(batch, ["k"], "item").collect()}
    assert got == exp


def test_merge_sink_exactly_once_by_idempotence(spark, tmp_path):
    """Crash AFTER a batch is merged into the state table, BEFORE the
    stream checkpoint commits; the restart replays that batch. Because
    register-wise max-merge is idempotent, the replay must leave the
    state byte-identical to the batch sketch of all rows — no (run_id,
    batch_id) bookkeeping needed."""
    import pyspark.errors

    src = str(tmp_path / "src")
    frames = [_pdf(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    marker = tmp_path / "crashed-once"
    inner = merge_sketch_into(spark, state, ["k"], "item", "k string")

    def handle(df, bid):
        inner(df, bid)
        if bid == 1 and not marker.exists():
            marker.write_text("x")   # merged but never checkpointed
            raise RuntimeError("injected")

    def run():
        q = (spark.readStream.schema(SRC_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(handle)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        run()
    assert marker.exists()
    run()                            # replays the merged batch
    got = {(r["k"], r["register"]): r["rho"]
           for r in spark.read.parquet(state).collect()}
    batch = spark.createDataFrame(pd.concat(frames), SRC_SCHEMA)
    exp = {(r["k"], r["register"]): r["rho"]
           for r in S.hll_sketch(batch, ["k"], "item").collect()}
    assert got == exp


def test_checkpoint_unit_sketch_rollup(spark, tmp_path):
    """Per-unit metrics sketches roll up to the estimate of the whole
    run (merge == direct by the sketch algebra), including after a
    crash-resume, without re-reading unit data."""
    frames = {u: _pdf(u, 150) for u in range(3)}

    def process(u):
        return spark.createDataFrame(frames[u], SRC_SCHEMA)

    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    with pytest.raises(RuntimeError):
        run_checkpointed(spark, "r1", [0, 1, 2], process, outp, ckpt,
                         fail_on=lambda u: u == 1, sketch_item="item")
    stats = run_checkpointed(spark, "r1", [0, 1, 2], process, outp, ckpt,
                             sketch_item="item")
    assert stats["skipped"] == 1 and stats["attempted"] == 2
    est = rollup_unit_sketches(spark, outp, ckpt, "r1").collect()[0]
    allpdf = pd.concat(frames.values())
    direct = S.hll_estimate(
        S.hll_sketch(spark.createDataFrame(allpdf, SRC_SCHEMA)
                     .withColumn("key", F.lit("all")), ["key"], "item"),
        ["key"]).collect()[0]
    assert (est["n_registers"], est["estimate"]) == \
        (direct["n_registers"], direct["estimate"])
    exact = allpdf["item"].nunique()
    assert abs(est["estimate"] / exact - 1) < 0.12


def test_cm_stream_sketch_equals_batch(spark, tmp_path):
    """Streaming count-min counters == batch counters on the same rows
    (state bounded at keys × D × W)."""
    from mbrngq_spark.streaming.sketch_stream import cm_sketch_stream

    src = str(tmp_path / "src")
    frames = [_pdf(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SRC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (cm_sketch_stream(stream, ["k"], "item")
         .writeStream.format("memory").queryName("cm_s")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["k"], r["row"], r["col"]): r["cnt"]
           for r in spark.sql("select * from cm_s").collect()}
    batch = spark.createDataFrame(pd.concat(frames), SRC_SCHEMA)
    exp = {(r["k"], r["row"], r["col"]): r["cnt"]
           for r in S.cm_sketch(batch, ["k"], "item").collect()}
    assert got == exp


def test_cm_merge_sink_exactly_once_by_path(spark, tmp_path):
    """CMS merge is SUM (not idempotent), so the crash-replay contract
    moves from algebra to PATH: a replayed batch overwrites its own
    delta directory, and the summed state equals the batch sketch of
    all rows — double-counting would be caught as 2× counters."""
    import pyspark.errors
    from mbrngq_spark.streaming.sketch_stream import (merge_cm_sketch_into,
                                                      read_cm_state)

    src = str(tmp_path / "src")
    frames = [_pdf(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    marker = tmp_path / "crashed-once"
    inner = merge_cm_sketch_into(spark, state, ["k"], "item")

    def handle(df, bid):
        inner(df, bid)
        if bid == 1 and not marker.exists():
            marker.write_text("x")   # delta written, never checkpointed
            raise RuntimeError("injected")

    def run():
        q = (spark.readStream.schema(SRC_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(handle)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        run()
    assert marker.exists()
    run()                            # replays the written batch
    got = {(r["k"], r["row"], r["col"]): r["cnt"]
           for r in read_cm_state(spark, state, ["k"],
                                  "k string").collect()}
    batch = spark.createDataFrame(pd.concat(frames), SRC_SCHEMA)
    exp = {(r["k"], r["row"], r["col"]): r["cnt"]
           for r in S.cm_sketch(batch, ["k"], "item").collect()}
    assert got == exp


def test_kmv_merge_sink_exactly_once_by_idempotence(spark, tmp_path):
    """KMV bottom-k state: crash AFTER batch 1 merged, BEFORE the stream
    checkpoint commits; the restart replays the batch. Bottom-k merge
    dedups by hash, so the replay is a no-op and the final state equals
    the batch sketch of ALL rows — the HLL exactly-once shape, carrying
    set-INTERSECTION capability the HLL state can't."""
    import pyspark.errors

    from mbrngq_spark.streaming.sketch_stream import merge_kmv_sketch_into

    src = str(tmp_path / "src")
    frames = [_pdf(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    marker = tmp_path / "crashed-once"
    inner = merge_kmv_sketch_into(spark, state, ["k"], "item", "k string")

    def handle(df, bid):
        inner(df, bid)
        if bid == 1 and not marker.exists():
            marker.write_text("x")
            raise RuntimeError("injected")

    def run():
        q = (spark.readStream.schema(SRC_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(handle)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        run()
    assert marker.exists()
    run()
    got = {(r["k"], r["rk"]): r["h"]
           for r in spark.read.parquet(state).collect()}
    batch = spark.createDataFrame(pd.concat(frames), SRC_SCHEMA)
    exp = {(r["k"], r["rk"]): r["h"]
           for r in S.kmv_sketch(batch, ["k"], "item").collect()}
    assert got == exp


def test_heatmap_merge_equals_batch_and_replay_safe(spark, tmp_path):
    """Streaming KDE heatmap: delta-dir state summed across batches ==
    the one-shot batch heatmap (quantize-before-sum associativity), and
    a crash-replayed batch does NOT double-count (path idempotence)."""
    import pyspark.errors
    from mbrngq_spark.operators.tiles import tile_heatmap
    from mbrngq_spark.streaming.sketch_stream import (merge_heatmap_into,
                                                      read_heatmap_state)

    geo_schema = "doc_id long, x double, y double"

    def _geo(batch, n=100):
        return pd.DataFrame({
            "doc_id": range(batch * n, (batch + 1) * n),
            "x": [(i * 37 % 1000) / 10.0 for i in
                  range(batch * n, (batch + 1) * n)],
            "y": [(i * 61 % 1000) / 10.0 for i in
                  range(batch * n, (batch + 1) * n)]})

    src = str(tmp_path / "src")
    frames = [_geo(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, geo_schema).coalesce(1) \
            .write.mode("append").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    marker = tmp_path / "crashed-once"
    inner = merge_heatmap_into(spark, state, h=10.0, res=4)

    def handle(df, bid):
        inner(df, bid)
        if bid == 1 and not marker.exists():
            marker.write_text("x")   # delta written, never checkpointed
            raise RuntimeError("injected crash")

    stream = (spark.readStream.schema(geo_schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(
            (pyspark.errors.exceptions.base.PySparkException, Exception)):
        q.awaitTermination(180)
    q2 = (spark.readStream.schema(geo_schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream.foreachBatch(handle)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(180)

    got = {(int(r.cell)): (int(r.n_docs), int(r.wq))
           for r in read_heatmap_state(spark, state).collect()}
    batch_all = spark.createDataFrame(pd.concat(frames), geo_schema)
    exp = {(int(r.cell)): (int(r.n_docs), int(r.wq))
           for r in tile_heatmap(batch_all, 10.0, 4).collect()}
    assert got == exp


def test_pyramid_merge_equals_batch_and_replay_safe(spark, tmp_path):
    """Streaming cell-pyramid: delta-dir state folded across batches ==
    the one-shot batch pyramid (sum/bit_or associativity), surviving an
    injected crash between delta write and checkpoint commit."""
    import pyspark.errors
    from mbrngq_spark.plans.rollup_store import pyramid_agg
    from mbrngq_spark.streaming.sketch_stream import (merge_pyramid_into,
                                                      read_pyramid_state)

    geo_schema = "doc_id long, x double, y double, category int"

    def _geo(batch, n=120):
        ids = range(batch * n, (batch + 1) * n)
        return pd.DataFrame({
            "doc_id": ids,
            "x": [(i * 37 % 1000) / 10.0 for i in ids],
            "y": [(i * 61 % 1000) / 10.0 for i in ids],
            "category": [i % 3 for i in ids]})

    src = str(tmp_path / "src")
    frames = [_geo(b) for b in range(3)]
    for pdf in frames:
        spark.createDataFrame(pdf, geo_schema).coalesce(1) \
            .write.mode("append").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    marker = tmp_path / "crashed-once"
    inner = merge_pyramid_into(spark, state, levels=(2, 4))

    def handle(df, bid):
        inner(df, bid)
        if bid == 1 and not marker.exists():
            marker.write_text("x")
            raise RuntimeError("injected crash")

    stream = (spark.readStream.schema(geo_schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(
            (pyspark.errors.exceptions.base.PySparkException, Exception)):
        q.awaitTermination(180)
    q2 = (spark.readStream.schema(geo_schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream.foreachBatch(handle)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(180)

    got = {(int(r.res), int(r.cell)): (int(r.n_docs), int(r.catmask))
           for r in read_pyramid_state(spark, state).collect()}
    batch_all = spark.createDataFrame(pd.concat(frames), geo_schema)
    exp = {(int(r.res), int(r.cell)): (int(r.n_docs), int(r.catmask))
           for r in pyramid_agg(batch_all, (2, 4)).collect()}
    assert got == exp
    assert len(got) > 16
