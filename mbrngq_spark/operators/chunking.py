"""Document chunking + sequence packing — the sequencing stage of a
training-data pipeline (long docs → overlapping token windows → fixed
token-budget training sequences).

Both stages are deterministic Column arithmetic (no UDF, no RNG), so a
resumable pipeline reproduces the exact same chunk and sequence ids on
retry, and the DuckDB oracle can value-check every boundary.

- ``chunk_documents``: sliding token windows of ``chunk_tokens`` with
  ``overlap``, stride = chunk_tokens − overlap; the final window is
  truncated, every doc emits ≥ 1 chunk. Map-only (explode of a computed
  sequence — no shuffle).
- ``pack_sequences``: assigns every chunk a training-sequence id by
  GLOBAL token prefix-sum over the deterministic (doc_id, chunk_idx)
  order: seq_id = floor(global_token_start / budget). This is
  concat-then-split packing at chunk granularity — a sequence may
  overhang its budget by < chunk_tokens where a chunk straddles a
  boundary (documented contract; token-exact splitting would cut inside
  chunks). The prefix sum is the scalable TWO-PASS form: range
  repartition → per-partition window cumsum → tiny per-partition totals
  to the driver → broadcast offsets back. No global single-partition
  window (the naive Window.orderBy-without-partition plan serializes
  the whole table through one task — a 100 TB non-starter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_idx, tok_start, tok_len, chunk_text) — sliding
    whitespace-token windows. tok_start is 0-based."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    d = docs.select(F.col(id_col), toks.alias("__ts")) \
        .withColumn("__n", F.size("__ts"))
    n_chunks = F.greatest(
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(float(step))),
        F.lit(1).cast("long"))
    d = d.select(id_col, "__ts", "__n",
                 F.explode(F.sequence(F.lit(0).cast("long"),
                                      n_chunks - 1)).alias("chunk_idx"))
    start = F.col("chunk_idx") * step
    ln = F.least(F.lit(chunk_tokens).cast("long"), F.col("__n") - start)
    return d.select(
        id_col, "chunk_idx",
        start.alias("tok_start"),
        ln.alias("tok_len"),
        F.array_join(F.slice("__ts", (start + 1).cast("int"),
                             ln.cast("int")), " ").alias("chunk_text"))


def chunk_spans(docs: DataFrame, budget: int = 32,
                media_cost: int = 1, id_col: str = "doc_id",
                spans_col: str = "spans") -> DataFrame:
    """Span-aware chunking for INTERLEAVED documents (the input_hint
    table: ``spans: array<struct<kind, text, media_ref, offset>>``) —
    the multimodal twin of chunk_documents.

    Packs each document's span sequence into chunks of ≤ ``budget``
    tokens IN ORDER: a text span costs its whitespace token count and
    may be SPLIT at token boundaries when it straddles a chunk edge; a
    media span costs ``media_cost`` and is ATOMIC (never split, never
    reordered — a media reference is one unit for a training sequence).
    A chunk is closed exactly when adding the next unit would exceed the
    budget, so every chunk except a doc's last is full-to-budget for
    text-only runs.

    INVARIANT (the north rule's span-sequence equality THROUGH the
    chunker, pytest-asserted): concatenating a doc's chunks in
    (chunk_idx, position) order and merging adjacent text pieces
    reproduces the original (kind, text, media_ref, order) sequence
    token for token.

    Execution: one Arrow-batched mapInPandas — map-only, no shuffle; the
    per-doc loop is bounded by the span count (≤ a few dozen in real
    layouts) and a text span's pieces come from NumPy prefix sums over
    token lengths (cut points + character offsets into the normalized
    string), not token-list slicing — the piece loop is O(pieces), never
    O(tokens·pieces). Output rows are the exploded chunk members:
    (doc_id, chunk_idx, pos_in_chunk, kind, text, media_ref,
    src_offset, piece_idx, n_tokens)."""
    if budget < 1 or media_cost < 1 or media_cost > budget:
        raise ValueError("need 1 <= media_cost <= budget")
    # inherit the id type — the input_hint table carries STRING doc ids
    # (the ngq._refine_schema discipline)
    id_t = docs.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_t}, chunk_idx long, pos_in_chunk long, "
                  "kind string, text string, media_ref string, "
                  "src_offset int, piece_idx long, n_tokens long")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, spans in zip(pdf[id_col], pdf[spans_col]):
                chunk, pos, used = 0, 0, 0
                for s in spans:
                    kind = s["kind"]
                    if kind == "text":
                        toks = [t for t in (s["text"] or "").split(" ")
                                if t]
                        ntok = len(toks)
                        if ntok == 0:
                            continue
                        if used == budget:
                            chunk, pos, used = chunk + 1, 0, 0
                        # piece cut points at [budget-used, +budget, ...];
                        # char offsets via prefix sum so each piece is one
                        # O(1) slice of the normalized string
                        cuts = np.arange(budget - used, ntok, budget)
                        starts = np.concatenate(([0], cuts))
                        ends = np.append(cuts, ntok)
                        norm = " ".join(toks)
                        off = np.concatenate(
                            ([0], np.cumsum(
                                np.fromiter((len(t) + 1 for t in toks),
                                            np.int64, ntok))))
                        npieces = len(starts)
                        rows.extend(
                            (did, chunk + i, pos if i == 0 else 0, "text",
                             norm[off[a]:off[b] - 1], "", s["offset"], i,
                             int(b - a))
                            for i, (a, b) in enumerate(zip(starts, ends)))
                        chunk += npieces - 1
                        pos = (pos if npieces == 1 else 0) + 1
                        used = ((used if npieces == 1 else 0)
                                + int(ends[-1] - starts[-1]))
                    else:
                        if used + media_cost > budget:
                            chunk, pos, used = chunk + 1, 0, 0
                        rows.append((did, chunk, pos, kind, "",
                                     s["media_ref"], s["offset"], 0,
                                     media_cost))
                        pos += 1
                        used += media_cost
            if rows:
                yield pd.DataFrame(rows, columns=[
                    id_col, "chunk_idx", "pos_in_chunk", "kind", "text",
                    "media_ref", "src_offset", "piece_idx", "n_tokens"])

    return docs.select(id_col, spans_col).mapInPandas(gen,
                                                      schema=out_schema)


def staged_partial_sums(chunks: DataFrame, id_col: str = "doc_id") \
        -> DataFrame:
    """Pass 1 of the packing prefix sum: range-partitioned chunks with
    (__pid, __cum) per-partition running token totals. Split out so the
    plan audit can assert the range partitioning on the PRE-checkpoint
    lineage (pack_sequences checkpoints it away)."""
    c = (chunks.repartitionByRange(id_col, "chunk_idx")
         .withColumn("__pid", F.spark_partition_id()))
    w = (Window.partitionBy("__pid").orderBy(id_col, "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return c.withColumn("__cum", F.sum("tok_len").over(w))


def pack_sequences(chunks: DataFrame, budget: int = 256,
                   id_col: str = "doc_id") -> DataFrame:
    """chunks + (seq_id, seq_offset): the training sequence each chunk
    starts in, and its token offset inside it, under concat-then-split
    packing over the global (doc_id, chunk_idx) order."""
    spark = chunks.sparkSession
    # Materialize ONE range partitioning shared by both actions below.
    # RangePartitioner re-samples per action (seed derives from the RDD id),
    # so without this the totals-collect and the final join could disagree
    # on partition boundaries once inputs exceed the sampler — rows near a
    # boundary would mix __pid/__cum from one layout with __off from the
    # other (same per-round discipline as graph.connected_components).
    c = staged_partial_sums(chunks, id_col).localCheckpoint(eager=True)
    # pass 2: per-partition totals are P scalars — driver-cumsum them
    # into start offsets and broadcast back (the textbook distributed
    # prefix sum; the collect is O(partitions), not O(rows))
    totals = {r["__pid"]: r["t"] for r in
              c.groupBy("__pid").agg(F.max("__cum").alias("t")).collect()}
    run, offs = 0, {}
    for pid in sorted(totals):
        offs[pid] = run
        run += totals[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offs.items()], "__pid int, __off long")
    c = c.join(F.broadcast(off_df), "__pid")
    gstart = F.col("__cum") + F.col("__off") - F.col("tok_len")
    return (c.withColumn("seq_id", F.floor(gstart / F.lit(budget)))
            .withColumn("seq_offset", gstart % F.lit(budget))
            .drop("__pid", "__cum", "__off"))
