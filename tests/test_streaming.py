"""Structured Streaming: streamed docs index into the same cells as batch;
windowed per-cell counts with watermark emit closed windows in append mode."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbrngq_spark.streaming.cell_stream import windowed_cell_counts, \
    with_stream_geometry

SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def test_stream_matches_batch_cells(spark, tmp_path):
    # 5 files = 5 micro-batches (maxFilesPerTrigger=1) so the watermark
    # advances between batches; each file is one minute of events
    src_dir = str(tmp_path / "stream_src")
    for minute in range(5):
        pdf = pd.DataFrame({
            "doc_id": [f"doc-{minute * 100 + i:08d}" for i in range(100)],
            "ts": pd.to_datetime(minute * 60, unit="s"),
        })
        spark.createDataFrame(pdf, SRC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src_dir)

    src = (spark.readStream.schema(SRC_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(src_dir))
    geo = with_stream_geometry(src)
    agg = windowed_cell_counts(geo, window="1 minute", watermark="30 seconds")

    q = (agg.writeStream.format("memory").queryName("cellcounts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql("select * from cellcounts").toPandas()
    # windows whose end precedes the final watermark are emitted (append
    # semantics hold back only the still-open tail)
    assert len(got) > 0
    assert got["n"].sum() > 0
    # every streamed cell id matches the batch encoder for the same doc_id
    batch = (spark.range(500)
             .select(F.format_string("doc-%08d", F.col("id")).alias("doc_id")))
    batch_cells = with_stream_geometry(batch).select("cell").toPandas()
    assert set(got["cell"]) <= set(batch_cells["cell"])
    # catmask stays within m bits
    assert (got["catmask"] < 8).all() and (got["catmask"] > 0).all()
    # window bounds are aligned minutes
    assert ((got["win_end"] - got["win_start"]).dt.total_seconds() == 60).all()
