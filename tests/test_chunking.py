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
