"""Text-analysis operators: feature math vs hand-computed values, fingerprint
order-sensitivity, language-ID heuristic on constructed samples."""

import pandas as pd
from pyspark.sql import functions as F

from mbrngq_spark.operators import text
from tests.conftest import SF_DIR


def test_features_hand_computed(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a bb ccc", "x the y the z"],
    }))
    got = text.with_text_features(df).toPandas().set_index("doc_id")
    assert got.loc[1, "n_tokens"] == 3
    assert got.loc[2, "n_tokens"] == 5
    assert got.loc[1, "n_stop"] == 0
    assert got.loc[2, "n_stop"] == 2          # two ' the ' hits
    assert got.loc[1, "avg_token_len"] == 2.0  # (8-2)/3


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["ab", "ba"]}))
    got = text.with_text_features(df).toPandas().set_index("doc_id")
    # same multiset of chars, different order → different fingerprint
    assert got.loc[1, "fingerprint"] != got.loc[2, "fingerprint"]
    # and the exact value: 'ab' = 97*1 + 98*2 = 293
    assert got.loc[1, "fingerprint"] == 293


def test_lang_id_on_marker_text(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the thing and the other thing of note",
                 "der ich und ein schoenes ding",
                 "el que de la casa que de",
                 "0123 456789"],
    }))
    got = df.withColumn("lang", text.lang_id_udf()(F.col("text"))).toPandas()
    langs = dict(zip(got.doc_id, got.lang))
    assert langs[1] == "en"
    assert langs[2] == "de"
    assert langs[3] == "es"
    assert langs[4] == "und"


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["mail me at a.user+x@sub.example.org or b@x.io thanks",
                 "call +49-170-55512345 tomorrow",
                 "server at 192.168.0.17 and 10.0.0.1 are up",
                 "nothing to see here at all"],
    }))
    got = text.with_pii_counts(df).toPandas().set_index("doc_id")
    assert got.loc[1, "n_email"] == 2
    assert got.loc[2, "n_phone"] == 1
    assert got.loc[3, "n_ipv4"] == 2
    assert (got.loc[4, ["n_email", "n_phone", "n_ipv4"]] == 0).all()
    scrubbed = text.scrub_pii(df).toPandas().set_index("doc_id")
    redacted = text.with_pii_counts(
        text.scrub_pii(df)).toPandas().set_index("doc_id")
    assert (redacted[["n_email", "n_phone", "n_ipv4"]] == 0).all().all()
    assert "<PII>" in scrubbed.loc[1, "text"]
    assert "a.user" not in scrubbed.loc[1, "text"]


def test_deterministic_sampling_rates_and_stability(spark):
    """Hash sampling: kept set is exactly reproducible, rates land near
    target, strata honor their weights, and different salts draw
    (near-)independent samples."""
    from mbrngq_spark.operators.sampling import sample_uniform, \
        stratified_sample

    docs = spark.range(20_000).select(F.col("id").alias("doc_id"),
                                      F.concat(F.lit("src"),
                                               (F.col("id") % 4)
                                               .cast("string"))
                                      .alias("source"))
    a = sample_uniform(docs, 0.3)
    n = a.count()
    assert abs(n / 20_000 - 0.3) < 0.02
    assert a.exceptAll(sample_uniform(docs, 0.3)).count() == 0  # stable
    b = set(r.doc_id for r in sample_uniform(docs, 0.3, salt="s2")
            .select("doc_id").collect())
    a_ids = set(r.doc_id for r in a.select("doc_id").collect())
    overlap = len(a_ids & b) / 20_000
    assert abs(overlap - 0.09) < 0.02            # ≈ rate² → independent
    s = stratified_sample(docs, {"src0": 0.0, "src1": 0.5}).groupBy(
        "source").count().toPandas().set_index("source")["count"]
    assert "src0" not in s.index
    assert abs(s["src1"] / 5000 - 0.5) < 0.05
    assert s["src2"] == 5000 and s["src3"] == 5000


def test_sampling_threshold_rounds_to_nearest_grain(spark):
    """rate=0.3 must give threshold 300/1000 exactly (int(round(...))),
    not 299 from binary float truncation: the kept set equals an explicit
    sample_unit < 300 filter."""
    from mbrngq_spark.operators.sampling import sample_uniform, sample_unit

    docs = spark.range(5_000).select(F.col("id").alias("doc_id"))
    kept = sample_uniform(docs, 0.3)
    exact = docs.filter(sample_unit(F.col("doc_id")) < F.lit(300))
    assert kept.exceptAll(exact).count() == 0
    assert exact.exceptAll(kept).count() == 0


def test_bpe_encoder_tokens_and_count_agree(spark):
    """Real BPE: greedy min-rank UDF tokens vs the JVM wrap+replace-chain
    count — equal per document on the corpus; hand-checked token ids."""
    from mbrngq_spark.operators.text import bpe_encode_udf, n_tokens_bpe_col

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    both = docs.select(
        "doc_id",
        n_tokens_bpe_col(F.col("text")).alias("n_col"),
        F.size(bpe_encode_udf()(F.col("text"))).cast("long").alias("n_udf"))
    assert both.filter(F.col("n_col") != F.col("n_udf")).count() == 0

    hand = spark.createDataFrame(
        pd.DataFrame({"text": ["the cat", "interesting", ""]}))
    toks = [r.t for r in
            hand.select(bpe_encode_udf()(F.col("text")).alias("t")).collect()]
    assert toks[0] == ["the", "c", "at"]
    assert toks[2] == []
    assert "ing" in toks[1][-1] or toks[1][-1] == "ing"


def test_bpe_twins_agree_property(spark):
    """Hypothesis-style sweep: on random ASCII word soups (runs of
    spaces, merge-heavy digraphs, digits, punctuation) the greedy UDF
    encoder and the JVM replace-chain count agree on every string."""
    import numpy as np

    rng = np.random.default_rng(53)
    pieces = ["the", "er", "ing", "a", "zz", "th", "ion", "1900", "!",
              "and", "x", "prothe", "erer", ",", "19", "00", "q"]
    texts = []
    for _ in range(300):
        k = rng.integers(0, 12)
        sep = " " * int(rng.integers(1, 3))
        texts.append(sep.join(str(rng.choice(pieces)) for _ in range(k)))
    texts += ["", " ", "  ", "a", "the"]
    from mbrngq_spark.operators.text import bpe_encode_udf, n_tokens_bpe_col

    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    bad = df.select(
        n_tokens_bpe_col(F.col("text")).alias("a"),
        F.size(bpe_encode_udf()(F.col("text"))).cast("long").alias("b")) \
        .filter(F.col("a") != F.col("b")).count()
    assert bad == 0


def test_repetition_features_planted_and_twin(spark):
    """Gopher-style repetition metrics: planted repetitive docs score
    high, clean docs low; Spark output equals the pure-Python kernel;
    the plan is map-only (no Exchange)."""
    from mbrngq_spark.operators.text import (repetition_features_py,
                                             with_repetition_features)
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "spam ham spam ham spam ham eggs",          # bigram stuffing
            "nav bar\nnav bar\nnav bar\ncontent here",  # duplicate lines
            "all tokens here are fully distinct words",
            "a b c a b c a b c a b c",                  # trigram dup
        ]}))
    out = with_repetition_features(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["doc_id"]: (r["dup_line_frac"], r["dup_token_frac"],
                         r["top_bigram_frac"], r["dup_trigram_frac"])
           for r in out.collect()}
    pdf = docs.toPandas()
    for _, row in pdf.iterrows():
        assert got[row.doc_id] == repetition_features_py(row.text), \
            row.doc_id
    assert got[1][2] > 0.8          # top bigram dominates
    assert got[2][0] > 0.4          # duplicated lines
    assert got[3] == (0.0, 0.0) + got[3][2:] and got[3][2] < 0.4
    assert got[4][3] == 1.0         # fully covered by repeated trigrams


def test_unigram_perplexity_separates_gibberish(spark):
    """Perplexity filter: under an LM trained on a natural-ish corpus,
    repeated-vocabulary text scores higher (less negative avg_logp)
    than unseen-token gibberish; unseen tokens hit the OOV floor; every
    doc gets a score."""
    from mbrngq_spark.operators.text import (train_unigram_lm,
                                             with_perplexity)
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["the cat sat on the mat and the dog ran"] * 4 + [
            "the cat ran on the mat",
            "the dog sat and the cat sat",
            "zq xv jj qqq wplk zzzz",            # gibberish: all OOV-ish
            "the mat and the dog"]}))
    lm, oov = train_unigram_lm(corpus)
    assert oov < 0
    got = {r["doc_id"]: r["avg_logp"]
           for r in with_perplexity(corpus, lm, oov).collect()}
    assert set(got) == set(range(8))
    natural = [got[i] for i in (0, 4, 5, 7)]
    assert all(n > got[6] for n in natural)      # gibberish scores lowest
    # a fully-OOV doc scores exactly the OOV floor (quantized mean)
    all_oov = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["mmmm nnnn oooo"]}))
    s = with_perplexity(all_oov, lm, oov).collect()[0]["avg_logp"]
    assert s == round(oov / 1e6, 6)
