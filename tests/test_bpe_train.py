"""Distributed BPE training (text.train_bpe): the Spark job's learned
merge sequence must EXACTLY equal the pure-Python reference trainer's on
the same corpus, the learned table must be causally ordered (feeds the
encoder directly), and counts under the learned table must agree between
the greedy encoder and the replace chain."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators.text import (
    _merge_pair_col, _validate_merges, bpe_train_fixture, n_tokens_bpe_col,
    train_bpe, train_bpe_reference)

from tests.conftest import SF_DIR


def _word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def test_merge_pair_fold_overlaps(spark):
    """Leftmost-non-overlapping semantics of the JVM fold: 'aaa' + (a,a)
    → [aa, a]; 'abab' + (a,b) → [ab, ab]; no-match arrays unchanged."""
    pdf = pd.DataFrame({"toks": [list("aaa"), list("abab"), list("xyz")]})
    df = spark.createDataFrame(pdf)
    got = [list(m) for m in
           df.select(_merge_pair_col(F.col("toks"), "a", "a").alias("m"))
           .toPandas()["m"]]
    assert got[0] == ["aa", "a"]
    got2 = [list(m) for m in
            df.select(_merge_pair_col(F.col("toks"), "a", "b").alias("m"))
            .toPandas()["m"]]
    assert got2[1] == ["ab", "ab"]
    assert got2[2] == ["x", "y", "z"]


def test_train_bpe_matches_reference_on_fixture(spark):
    words = bpe_train_fixture()
    corpus = spark.createDataFrame(
        pd.DataFrame({"text": [" ".join([w] * c) for w, c in words]}))
    got = train_bpe(corpus, num_merges=16)
    exp = train_bpe_reference(dict(words), 16)
    assert got == exp


def test_train_bpe_matches_reference_on_documents(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 150).select("text"))
    texts = [r.text for r in docs.collect()]
    got = train_bpe(docs, num_merges=20)
    exp = train_bpe_reference(_word_counts(texts), 20)
    assert got == exp
    # learned table is causally ordered → feeds every encoder directly
    _validate_merges([(a, b) for a, b, _ in got])


def test_learned_table_chain_equals_greedy_encode(spark):
    """n_tokens under the learned table: the pure-Column replace chain
    must equal a python greedy min-rank encode (the bpe_encode_udf
    algorithm) per document."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 60).select("doc_id", "text"))
    merges = train_bpe(docs.select("text"), num_merges=12)
    pairs = [(a, b) for a, b, _ in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    def encode_word(w):
        toks = list(w)
        while len(toks) > 1:
            best = None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = pairs[best]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    got = {r.doc_id: r.n for r in
           docs.select("doc_id",
                       n_tokens_bpe_col(F.col("text"), pairs).alias("n"))
           .collect()}
    for r in docs.collect():
        exp = sum(len(encode_word(w)) for w in r.text.split(" ") if w)
        assert got[r.doc_id] == exp, r.doc_id


def test_train_bpe_stops_when_counts_dry():
    """min_count floor: a corpus of all-distinct single chars learns
    nothing."""
    exp = train_bpe_reference({"a": 1, "b": 1, "c": 1}, 10)
    assert exp == []


def test_train_bpe_empty_and_trivial_corpora(spark):
    """Spark path edge cases: empty corpus and single-char vocab learn
    nothing (no crash, no bogus merges)."""
    import pandas as pd

    empty = spark.createDataFrame(pd.DataFrame({"text": []}),
                                  "text string")
    assert train_bpe(empty, num_merges=5) == []
    chars = spark.createDataFrame(pd.DataFrame({"text": ["a b c"]}))
    assert train_bpe(chars, num_merges=5) == []


def test_byte_level_matches_reference_on_fixture(spark):
    """Byte-level training (GPT-style pretokens + UTF-8 byte alphabet)
    equals the pure-Python byte reference on the same rebuilt docs —
    including the space-carrying 'Ġ'-prefixed symbols."""
    from mbrngq_spark.operators.text import (byte_symbols,
                                             train_bpe_bytes_reference)

    words = bpe_train_fixture()
    texts = [" ".join([w] * c) for w, c in words]
    corpus = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = train_bpe(corpus, num_merges=12, byte_level=True)
    exp = train_bpe_bytes_reference(texts, 12)
    assert got == exp and len(got) == 12
    # the space byte really participates (pretokens carry ' ')
    space_sym = byte_symbols(" ")[0]
    assert any(space_sym in a + b for a, b, _ in got)


def test_pretokenize_twins_agree(spark):
    """re.findall and regexp_extract_all produce identical pretoken
    streams for the shared pattern (the cross-engine premise of the
    byte-level trainer)."""
    from pyspark.sql import functions as F

    from mbrngq_spark.operators.text import BYTE_PRETOK_RE, pretokenize

    texts = ["it's a test-case, no?  two  spaces",
             "don't stop 123abc x9 !!",
             "", "   ", "tab\tsep and.dots..."]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [list(r["p"]) for r in
           df.select(F.regexp_extract_all(
               F.col("text"), F.lit(BYTE_PRETOK_RE), F.lit(0))
               .alias("p")).collect()]
    assert got == [pretokenize(t) for t in texts]


def test_hybrid_trainer_equality_at_threshold_boundary(spark):
    """local_above semantics: num_merges <= local_above stays fully
    distributed, num_merges > local_above finishes driver-side — both
    must learn the SAME table (char and byte level), so the hybrid is a
    pure scheduling change."""
    words = bpe_train_fixture()
    texts = [" ".join([w] * c) for w, c in words]
    corpus = spark.createDataFrame(pd.DataFrame({"text": texts}))
    m = 10
    dist = train_bpe(corpus, m)                          # no threshold
    at = train_bpe(corpus, m, local_above=m)             # boundary: dist
    above = train_bpe(corpus, m, local_above=m - 1)      # hybrid path
    assert dist == at == above and len(dist) == m
    bdist = train_bpe(corpus, m, byte_level=True)
    bhyb = train_bpe(corpus, m, byte_level=True, local_above=0)
    assert bdist == bhyb and len(bdist) == m
