"""Text-analysis operators for the training-data pipeline (brief: language-ID,
quality scoring, token counting, document fingerprinting).

All hot-path features are pure Column arithmetic (codegen'd, no Python); the
only UDF is the language-ID trigram scorer, which is a vectorized pandas UDF
over Arrow batches. Fingerprint and counts are defined with arithmetic that
is reproducible in ANSI SQL so the DuckDB oracle can verify them bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_PRIME = 1000000007


def n_tokens_col(text: Column) -> Column:
    """Whitespace token count via pure length arithmetic (single-space
    separated corpora): #spaces + 1. Matches the SQL oracle exactly."""
    return (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1) \
        .cast("long")


def substr_hits_col(text: Column, needle: str) -> Column:
    """Occurrence count of ``needle`` via length difference (SQL-exact)."""
    n = len(needle)
    return ((F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
            / F.lit(n)).cast("long")


BPE_PAT = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def n_tokens_bpe_col(text: Column) -> Column:
    """BPE-ish subword-count proxy: letter runs + single digits + single
    non-alnum marks (the GPT-2 pre-tokenizer's shape, ASCII-simplified so
    the Java and RE2 regex dialects agree — cross-engine checkable)."""
    return F.regexp_count(text, F.lit(BPE_PAT)).cast("long")


def fingerprint_col(text: Column) -> Column:
    """Order-sensitive document fingerprint: sum(code(c_i) * i) mod P over
    1-based char positions — a positional rolling hash kept SQL-reproducible
    (no builtin modpow in either engine). JVM-side via transform+aggregate,
    no explode, no Python."""
    weighted = F.transform(F.split(text, ""),
                           lambda c, i: (F.ascii(c) * (i + F.lit(1))).cast("long"))
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return total % F.lit(FP_PRIME)


def avg_token_len_col(text: Column) -> Column:
    nt = n_tokens_col(text)
    return (F.length(text) - (nt - 1)).cast("double") / nt.cast("double")


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + token count, stopword hits, punctuation, avg token length,
    a [0,1] quality score, and the positional fingerprint."""
    t = F.col(text_col)
    nt = n_tokens_col(t)
    stop = substr_hits_col(t, " the ") + substr_hits_col(t, " a ")
    quality = F.round(
        F.least(nt.cast("double") / F.lit(200.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stop.cast("double") * F.lit(10.0) / nt.cast("double"), F.lit(1.0))
        * F.lit(0.5), 6)
    return (docs
            .withColumn("n_tokens", nt)
            .withColumn("n_tokens_bpe", n_tokens_bpe_col(t))
            .withColumn("n_stop", stop.cast("long"))
            .withColumn("avg_token_len", F.round(avg_token_len_col(t), 6))
            .withColumn("quality", quality)
            .withColumn("fingerprint", fingerprint_col(t)))


# --- PII detection (training-data scrubbing tier) ----------------------------

# ASCII-only, no lookaround, no \b: the subset where Java regex (Spark) and
# RE2 (DuckDB) agree token-for-token, so counts are cross-engine checkable.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
    "phone": "[+][0-9]{2}[- ][0-9]{3}[- ][0-9]{4,8}",
    "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (emails / intl phone numbers / IPv4
    literals) — the detection half of a scrub stage, pure ``regexp_count``
    Column math (codegen'd, map-only; at 100 TB this is a projection, no
    shuffle)."""
    t = F.col(text_col)
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(t, F.lit(pat)).cast("long"))
    return out


def scrub_pii(docs: DataFrame, text_col: str = "text",
              replacement: str = "<PII>") -> DataFrame:
    """Redact every PII match in place (the scrub half). Patterns are
    applied longest-entity-first so an email's host part is not first
    mangled by the IPv4 rule."""
    t = F.col(text_col)
    for name in ("email", "phone", "ipv4"):
        t = F.regexp_replace(t, PII_PATTERNS[name], replacement)
    return docs.withColumn(text_col, t)


# --- language ID: char-trigram profile scoring (vectorized pandas UDF) ------

_PROFILES = {
    "en": ["the", "and", " th", "ing", "ion", " of", "of ", "ed ", " to", "er "],
    "de": ["der", "die", "und", "ein", "ich", "sch", "en ", "ch ", " de", "nd "],
    "es": ["de ", " de", "la ", "el ", "que", " la", "os ", "ión", " qu", "es "],
    "fr": ["es ", " de", "de ", "le ", "ent", " le", "la ", "et ", " la", "ion"],
}


def lang_id_udf():
    """Language-ID by trigram-profile hit counting. Returns 'und' when no
    profile scores — honest for synthetic shuffled-vocab corpora."""

    @F.pandas_udf(T.StringType())
    def lang_id(text: pd.Series) -> pd.Series:
        langs = list(_PROFILES)
        scores = np.zeros((len(text), len(langs)), dtype=np.int64)
        low = text.fillna("").str.lower()
        for li, lang in enumerate(langs):
            for tri in _PROFILES[lang]:
                scores[:, li] += low.str.count(tri, flags=0).to_numpy(np.int64)
        best = scores.argmax(axis=1)
        hit = scores.max(axis=1) > 0
        out = np.where(hit, np.array(langs)[best], "und")
        return pd.Series(out)

    return lang_id
