"""Chunking + sequence packing vs a pure-Python oracle."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mbrngq_spark.operators.chunking import chunk_documents, pack_sequences


def _py_chunks(text, chunk_tokens, overlap):
    ts = [t for t in text.split(" ") if t]
    n = len(ts)
    step = chunk_tokens - overlap
    n_chunks = max(-(-(n - overlap) // step), 1)
    out = []
    for i in range(n_chunks):
        s = i * step
        ln = min(chunk_tokens, n - s)
        out.append((i, s, ln, " ".join(ts[s:s + ln])))
    return out


def test_chunks_match_python_oracle(spark):
    rng = np.random.default_rng(31)
    docs = {i: " ".join(f"t{rng.integers(50)}"
                        for _ in range(int(rng.integers(1, 400))))
            for i in range(40)}
    docs[40] = ""                      # empty doc still emits one chunk
    ddf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
    got = {}
    for r in chunk_documents(ddf, 64, 8).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.tok_start, r.tok_len, r.chunk_text))
    for d, text in docs.items():
        assert sorted(got[d]) == _py_chunks(text, 64, 8), d


def test_packing_is_contiguous_prefix_sum(spark):
    rng = np.random.default_rng(32)
    docs = {i: " ".join(f"t{rng.integers(50)}"
                        for _ in range(int(rng.integers(1, 300))))
            for i in range(50)}
    ddf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
    chunks = chunk_documents(ddf, 64, 8)
    packed = pack_sequences(chunks, budget=256).collect()
    rows = sorted(packed, key=lambda r: (r.doc_id, r.chunk_idx))
    cum = 0
    for r in rows:                    # replay the global prefix sum
        assert r.seq_id == cum // 256, (r.doc_id, r.chunk_idx)
        assert r.seq_offset == cum % 256
        cum += r.tok_len
    # determinism across partitionings
    packed2 = pack_sequences(chunks.repartition(13), budget=256).collect()
    assert sorted((r.doc_id, r.chunk_idx, r.seq_id) for r in packed2) \
        == sorted((r.doc_id, r.chunk_idx, r.seq_id) for r in packed)


def test_chunking_rejects_bad_overlap(spark):
    import pytest

    ddf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(ddf, 32, 32)


def test_chunk_spans_reassembly_invariant(spark):
    """Span-aware chunking of the INTERLEAVED spans table: concatenating
    each doc's chunks in (chunk_idx, pos_in_chunk) order and merging
    adjacent text pieces reproduces the original (kind, text, media_ref,
    order) sequence token for token — the north rule's invariant THROUGH
    the chunker. Media spans are atomic; no chunk exceeds the budget."""
    from mbrngq_spark.operators.chunking import chunk_spans
    from mbrngq_spark.sources.synth import documents_spans

    budget = 4
    docs = documents_spans(spark, 300)
    spans_by_doc = {r.doc_id: r.spans for r in docs.collect()}
    out = chunk_spans(docs, budget=budget).collect()

    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx,
                                        r.pos_in_chunk)):
        by_doc.setdefault(r.doc_id, []).append(r)

    assert set(by_doc) == set(spans_by_doc)
    for did, rows in by_doc.items():
        # budget compliance per chunk
        used = {}
        for r in rows:
            used[r.chunk_idx] = used.get(r.chunk_idx, 0) + r.n_tokens
        assert all(v <= budget for v in used.values()), (did, used)
        # reassemble: merge adjacent text pieces of the same source span
        seq = []
        for r in rows:
            if (r.kind == "text" and seq and seq[-1][0] == "text"
                    and seq[-1][3] == r.src_offset):
                seq[-1] = ("text", seq[-1][1] + " " + r.text, "",
                           r.src_offset)
            else:
                seq.append((r.kind, r.text, r.media_ref, r.src_offset))
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in spans_by_doc[did]
               if not (s["kind"] == "text" and not s["text"])]
        assert seq == exp, did


def test_chunk_spans_splits_long_text_atomically_media(spark):
    """A long text span splits across chunks at token boundaries; a
    media span that would overflow opens a new chunk instead of
    splitting."""
    import pandas as pd

    from mbrngq_spark.operators.chunking import chunk_spans

    spans = [
        {"kind": "text", "text": " ".join(f"w{i}" for i in range(7)),
         "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": "ref://x/1",
         "offset": 1},
        {"kind": "text", "text": "a b", "media_ref": "", "offset": 2},
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "spans": [spans]}),
        "doc_id long, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>")
    out = sorted(chunk_spans(df, budget=3).collect(),
                 key=lambda r: (r.chunk_idx, r.pos_in_chunk))
    got = [(r.chunk_idx, r.kind, r.text, r.media_ref, r.n_tokens)
           for r in out]
    assert got == [
        (0, "text", "w0 w1 w2", "", 3),
        (1, "text", "w3 w4 w5", "", 3),
        (2, "text", "w6", "", 1),
        (2, "image", "", "ref://x/1", 1),
        (2, "text", "a", "", 1),
        (3, "text", "b", "", 1),
    ]
