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


# --- real BPE tokenizer (merges-table encode) --------------------------------
#
# A GPT-2-STYLE byte-pair encoder over an explicit ranked merges table.
# The table is engine-local (no external vocab file — built over common
# English digraphs/trigraphs) but the MACHINERY is the real thing: encode
# applies merges in rank order, leftmost-non-overlapping, each side of a
# merge being a base character or the product of an EARLIER merge
# (validated at import). Token counts drive corpus-mix weights, so the
# count must be exact and cross-engine checkable.
#
# Two equivalent encoders:
#  * n_tokens_bpe_col — pure Column form used in the hot path: wrap every
#    char as " c " (one regexp_replace), then ONE plain `replace` per
#    merge (" a  b " -> " ab "). Both Spark and DuckDB replace() scan
#    left-to-right non-overlapping and continue AFTER the replacement,
#    which is exactly BPE's leftmost application, and the wrapped form
#    makes token boundaries unambiguous (a pattern can never match a
#    token prefix/suffix or cross a space, since merge tokens contain no
#    spaces). Sequential application in rank order equals greedy
#    min-rank BPE because a valid merges table is causally ordered: a
#    later merge can only create tokens no earlier merge references.
#    bpe_count_sql() emits the same chain as DuckDB SQL — bit-identical.
#  * bpe_encode_udf — Arrow-vectorized greedy min-rank encoder returning
#    the actual token arrays (word-level cache), for pipelines that need
#    tokens, not counts. test_text.py asserts both agree per document.
#
# ASCII corpora assumed (Java regex "." is a UTF-16 unit, RE2's a rune —
# identical on ASCII).

BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("a", "l"), ("e", "d"),
    ("in", "g"), ("t", "o"), ("o", "u"), ("i", "s"), ("i", "t"),
    ("a", "s"), ("l", "e"), ("o", "f"), ("i", "on"), ("m", "e"),
    ("d", "e"), ("h", "i"), ("s", "e"), ("r", "o"), ("c", "on"),
    ("p", "ro"), ("l", "i"), ("l", "a"), ("u", "n"), ("u", "s"),
    ("w", "i"), ("c", "a"), ("c", "e"), ("c", "h"), ("b", "e"),
    ("d", "i"), ("m", "a"), ("n", "e"), ("n", "o"), ("p", "a"),
    ("p", "e"), ("s", "a"), ("t", "i"), ("a", "m"), ("u", "r"),
    ("0", "0"), ("1", "9"), ("2", "0"), ("at", "ion"), ("er", "s"),
    ("an", "d"),
]


def _validate_merges(merges: list[tuple[str, str]] | None = None) -> None:
    seen: set[str] = set()
    for a, b in (BPE_MERGES if merges is None else merges):
        for side in (a, b):
            if len(side) > 1 and side not in seen:
                raise AssertionError(
                    f"merge side {side!r} is neither a base char nor an "
                    "earlier merge product — table is not causally ordered")
        seen.add(a + b)


_validate_merges()


def n_tokens_bpe_col(text: Column,
                     merges: list[tuple[str, str]] | None = None) -> Column:
    """Exact BPE token count (whitespace excluded), computed JVM-side as
    a wrap + chained-replace pipeline — map-only, codegen'd, no Python.

    Count identity: every token in the encoded form is ``" tok "`` and an
    ORIGINAL space survives as a single space-char token (no merge ever
    touches one), so splitting the encoded form on runs of spaces melts
    the space-tokens into their neighboring delimiters and the non-empty
    segments are EXACTLY the real tokens. One reference to the encoded
    string — Catalyst cannot duplicate the replace chain the way a
    two-length count formula made it."""
    # wrap via split+join (plain char scan), not a per-char regex — the
    # regex form cost ~2s per 5k docs alone
    s = F.concat(F.lit(" "), F.array_join(F.split(text, ""), "  "),
                 F.lit(" "))
    for a, b in (BPE_MERGES if merges is None else merges):
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    segs = F.filter(F.split(s, " +"), lambda x: x != F.lit(""))
    return F.size(segs).cast("long")


def bpe_count_sql(col: str,
                  merges: list[tuple[str, str]] | None = None) -> str:
    """The DuckDB twin of n_tokens_bpe_col — same wrap, same replace
    chain, same count identity, generated from the same merges table
    (BPE_MERGES by default; pass a learned table for the trained-BPE
    gate)."""
    expr = f"(' ' || array_to_string(string_split({col}, ''), '  ') || ' ')"
    for a, b in (BPE_MERGES if merges is None else merges):
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return (f"CAST(len(list_filter(string_split_regex({expr}, ' +'), "
            f"x -> x <> '')) AS BIGINT)")


def bpe_encode_udf():
    """Arrow-vectorized greedy BPE encoder: text → array<string> tokens
    (whitespace is a boundary, not a token). Word-level cache — real
    corpora repeat words heavily, so the per-word merge loop amortizes to
    a dict hit."""
    ranks = {m: i for i, m in enumerate(BPE_MERGES)}

    def _encode_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        toks = list(w)
        while len(toks) > 1:
            best = None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = BPE_MERGES[best]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        cache[w] = toks
        return toks

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts.fillna(""):
            toks: list[str] = []
            for w in t.split(" "):
                if w:
                    toks.extend(_encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return encode


# --- distributed BPE TRAINING (learn the merges table from a corpus) ---------
#
# The encoder above consumes a ranked merges table; a real pipeline LEARNS
# it (Sennrich-style): repeatedly pick the adjacent token pair with the
# highest corpus-weighted position count and merge it leftmost-
# non-overlapping everywhere. The distributed form keeps the (word, count,
# tokens) vocabulary a DataFrame end-to-end:
#
#   round r:  explode adjacent pairs (map-only over the vocab) →
#             groupBy(pair).sum(count)  — ONE pair-keyed shuffle, input
#             bounded by Σ word tokens over the DISTINCT-word vocab (tiny
#             vs the corpus: word counting already collapsed it) →
#             take the argmax row to the driver (O(1) rows/round) →
#             rewrite every tokens array with ONE JVM-side aggregate fold
#             (no Python) — localCheckpoint per round (the graph.py CC
#             discipline) so lineage stays flat across bounded rounds.
#
# Tie-break: max count, then lexicographically smallest (a, b) — a total
# order both the Spark and the pure-Python reference trainer share, so the
# learned sequences are comparable token-for-token.

def _merge_pair_col(toks: Column, a: str, b: str) -> Column:
    """Leftmost-non-overlapping single-pair merge as a JVM-side fold:
    append each token, collapsing it into the accumulator's tail when the
    tail is `a` and it is `b`. Overlaps resolve leftmost exactly like
    greedy BPE ('aaa' + (a,a) → [aa, a]) because a merged tail `ab` can
    never equal `a` again."""
    return F.aggregate(
        toks, F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (t == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(t))))


# adjacent pairs via zip_with of two slices — length-0 slices make this
# SAFE for fully-merged single-token words (sequence(1, 0) is DESCENDING
# in Spark, so the index form errors under ANSI there)
_PAIR_EXPR = ("zip_with(slice(tokens, 1, size(tokens) - 1), "
              "slice(tokens, 2, size(tokens) - 1), "
              "(x, y) -> struct(x AS a, y AS b))")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """One training round's pair statistics over the (w, cnt, tokens)
    vocabulary: corpus-weighted adjacent-pair position counts — ONE
    pair-keyed shuffle with map-side partial aggregation (plan-audit
    asserted); the caller takes the (n desc, a, b) argmax via
    orderBy().limit(1), which plans as TakeOrderedAndProject (per-
    partition top-1 + driver merge), never a global sort shuffle."""
    return (vocab
            .filter(F.size("tokens") > 1)
            .select("cnt", F.explode(F.expr(_PAIR_EXPR)).alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n")))


# --- byte-level alphabet + pretokenizer (GPT-style) --------------------------
#
# Real tokenizers train over UTF-8 BYTES of regex pretokens, not characters
# of whitespace words. The byte alphabet is the public GPT-2 printable
# remapping (every byte gets a distinct printable char, so tokens stay
# plain strings and the char-level trainer machinery — _PAIR_EXPR,
# _merge_pair_col, the (count desc, pair asc) total order — is reused
# verbatim; UTF-8 keeps code-point order == byte order, so Spark's binary
# string sort and Python's str compare agree on the tie-break).
#
# The pretokenizer is the standard contraction/letters/digits/other/space
# split, kept in the Java∩Python regex subset (ASCII classes, no \p{L})
# so re.findall and regexp_extract_all produce identical streams.

BYTE_PRETOK_RE = (r"'(?:s|t|re|ve|m|ll|d)"
                  r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte↔printable-unicode bijection: printable ASCII
    and Latin-1 blocks map to themselves, the rest shift to 256+n."""
    bs = (list(range(33, 127)) + list(range(161, 173))
          + list(range(174, 256)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def byte_symbols(word: str) -> list[str]:
    """UTF-8 bytes of ``word`` as GPT-2 printable symbols (pure Python —
    the reference trainer's and the vocab UDF's shared init)."""
    m = bytes_to_unicode()
    return [m[b] for b in word.encode("utf-8")]


def pretokenize(text: str) -> list[str]:
    """Pure-Python twin of the Spark-side regexp_extract_all pretokenize."""
    import re
    return re.findall(BYTE_PRETOK_RE, text)


def _byte_syms_udf():
    """Vectorized word → byte-symbol array. Runs over the DISTINCT-word
    vocabulary only (post word-count collapse — tiny vs the corpus), so
    the one Python touchpoint in byte-level training is vocab-sized and
    map-only."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def to_syms(w: pd.Series) -> pd.Series:
        m = bytes_to_unicode()
        return w.map(lambda s: [m[b] for b in s.encode("utf-8")])
    return to_syms


def train_bpe(docs: DataFrame, num_merges: int, text_col: str = "text",
              min_count: int = 2, byte_level: bool = False,
              local_above: int | None = None) -> list[tuple[str, str, int]]:
    """Learn a BPE merges table from a corpus — returns
    [(a, b, pair_count), ...] in merge order (causally ordered by
    construction, so it feeds n_tokens_bpe_col / bpe_count_sql /
    bpe_encode_udf directly).

    The per-round driver traffic is ONE argmax row; everything corpus-
    sized stays distributed. Stops early when no pair reaches
    ``min_count``.

    ``byte_level``: GPT-style training — regex pretokens (BYTE_PRETOK_RE,
    spaces kept on the token) over the UTF-8 byte alphabet instead of
    whitespace words over characters.

    ``local_above``: hybrid trainer for production merge counts. One
    Spark round per merge is the right shape while rounds are few, but a
    50k-merge vocab would pay 50k sequential shuffle rounds — and after
    the ONE distributed word-count collapse the distinct-word vocabulary
    is driver-sized. Above the threshold the collapsed (word, cnt) table
    is collected ONCE and training finishes driver-side via
    train_bpe_reference — identical semantics (pytest-asserted equality
    at the threshold boundary), Spark scheduling off the critical path."""
    spark = docs.sparkSession
    if byte_level:
        words = F.regexp_extract_all(F.col(text_col),
                                     F.lit(BYTE_PRETOK_RE), F.lit(0))
        vocab = (docs
                 .select(F.explode(words).alias("w"))
                 .groupBy("w").agg(F.count("*").alias("cnt"))
                 .withColumn("tokens", _byte_syms_udf()(F.col("w"))))
    else:
        vocab = (docs
                 .select(F.explode(F.filter(F.split(F.col(text_col), " "),
                                            lambda t: t != F.lit("")))
                         .alias("w"))
                 .groupBy("w").agg(F.count("*").alias("cnt"))
                 .withColumn("tokens", F.split("w", "")))
    vocab = vocab.localCheckpoint(eager=True)
    if local_above is not None and num_merges > local_above:
        wc = {r["w"]: int(r["cnt"])
              for r in vocab.select("w", "cnt").collect()}
        return train_bpe_reference(wc, num_merges, min_count,
                                   byte_level=byte_level)
    merges: list[tuple[str, str, int]] = []
    pair_expr = F.expr(_PAIR_EXPR)
    for _ in range(num_merges):
        best = (pair_counts(vocab)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best or best[0]["n"] < min_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        vocab = (vocab.withColumn(
                    "tokens",
                    F.when(F.array_contains(
                        F.transform(pair_expr,
                                    lambda p: (p["a"] == F.lit(a))
                                    & (p["b"] == F.lit(b))), True),
                           _merge_pair_col(F.col("tokens"), a, b))
                    .otherwise(F.col("tokens")))
                 .localCheckpoint(eager=True))
    return merges


def train_bpe_reference(word_counts: dict[str, int],
                        num_merges: int,
                        min_count: int = 2,
                        byte_level: bool = False) \
        -> list[tuple[str, str, int]]:
    """Pure-Python twin of train_bpe (the pytest ground truth and the
    DuckDB-oracle generator for the bpe_train gate): same position-level
    pair counting, same (count desc, pair asc) tie-break, same leftmost-
    non-overlapping merge. ``byte_level`` inits each word as its UTF-8
    byte symbols (caller pretokenizes — see train_bpe_bytes_reference)."""
    vocab = {w: (byte_symbols(w) if byte_level else list(w))
             for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            toks = vocab[w]
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        top = max(counts.values())
        if top < min_count:
            break
        a, b = min(p for p, n in counts.items() if n == top)
        merges.append((a, b, top))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == a
                        and toks[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


def train_bpe_bytes_reference(texts: list[str], num_merges: int,
                              min_count: int = 2) \
        -> list[tuple[str, str, int]]:
    """Pure-Python twin of train_bpe(byte_level=True) on raw documents:
    pretokenize with the SAME regex, count pretokens, train over byte
    symbols."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in pretokenize(t):
            wc[w] = wc.get(w, 0) + 1
    return train_bpe_reference(wc, num_merges, min_count, byte_level=True)


def bpe_train_fixture(n_words: int = 120) -> list[tuple[str, int]]:
    """Deterministic synthetic (word, count) training corpus, derived
    from md5 in pure Python — both the Spark gate and the oracle build
    the SAME corpus independently, so the oracle (which cannot train in
    SQL) carries the pure-Python trainer's expected merge sequence as
    literals. hashlib.md5 is the only dependency; no RNG."""
    import hashlib
    agg: dict[str, int] = {}
    for i in range(n_words):
        h = hashlib.md5(f"bpe/{i}".encode()).hexdigest()
        ln = 3 + int(h[3], 16) % 5
        w = "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:ln])
        cnt = 1 + int(h[6:8], 16) % 40
        # SUM duplicate draws (the 16-nibble → 26-letter map can collide
        # at larger n_words): the Spark corpus groupBy-sums word counts,
        # and dict(fixture) would silently keep only the LAST count —
        # aggregating here keeps both trainers byte-identical at any
        # n_words, and first-occurrence order keeps the list stable.
        agg[w] = agg.get(w, 0) + cnt
    return list(agg.items())


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
    # BPE count via the word-cached Arrow UDF — measured 3× faster than
    # the pure-Column replace chain (n_tokens_bpe_col), which remains the
    # cross-engine-checkable twin (tests assert equality per document)
    return (docs
            .withColumn("n_tokens", nt)
            .withColumn("n_tokens_bpe",
                        F.size(bpe_encode_udf()(t)).cast("long"))
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


# --- repetition features (Gopher-style quality filters) ----------------------
#
# Production corpus filters (Gopher / FineWeb lineage) drop documents
# dominated by REPEATED content: duplicated lines (navigation chrome),
# one n-gram covering most of the text (keyword stuffing), many
# duplicated n-grams (templated spam). Per-document local counting — a
# map-only vectorized Arrow kernel at 100 TB (no cross-doc state, no
# shuffle) — with the identical relational recomputation in DuckDB.
# Token convention: split on single space (matches n_tokens_col =
# spaces + 1, empties kept). Ratios are rounded HALF_UP at 6 dp like
# Spark/DuckDB round (Python's banker's round diverges exactly on
# power-of-two denominators, e.g. 1/128 at 6 dp).

_REP_SCHEMA = T.StructType([
    T.StructField("dup_line_frac", T.DoubleType()),
    T.StructField("dup_token_frac", T.DoubleType()),
    T.StructField("top_bigram_frac", T.DoubleType()),
    T.StructField("dup_trigram_frac", T.DoubleType()),
])


def repetition_features_py(text: str) -> tuple[float, float, float, float]:
    """Pure-Python twin (also the kernel the pandas UDF maps)."""
    from mbrngq_spark.operators.sketch import _round_half_up
    lines = text.split("\n")
    toks = text.split(" ")
    n, nl = len(toks), len(lines)
    dup_line = 1.0 - len(set(lines)) / nl
    dup_tok = 1.0 - len(set(toks)) / n
    if n >= 2:
        cnt: dict[str, int] = {}
        for i in range(n - 1):
            g = toks[i] + " " + toks[i + 1]
            cnt[g] = cnt.get(g, 0) + 1
        top_bg = min(2.0 * max(cnt.values()) / n, 1.0)
    else:
        top_bg = 0.0
    if n >= 3:
        cnt3: dict[str, int] = {}
        for i in range(n - 2):
            g = toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
            cnt3[g] = cnt3.get(g, 0) + 1
        dup3 = sum(c for c in cnt3.values() if c >= 2)
        dup_tg = min(3.0 * dup3 / n, 1.0)
    else:
        dup_tg = 0.0
    return tuple(_round_half_up(v, 6)
                 for v in (dup_line, dup_tok, top_bg, dup_tg))


def with_repetition_features(docs: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Adds dup_line_frac / dup_token_frac / top_bigram_frac /
    dup_trigram_frac — one vectorized Arrow UDF, map-only."""
    @F.pandas_udf(_REP_SCHEMA)
    def rep(texts: pd.Series) -> pd.DataFrame:
        rows = [repetition_features_py(t) for t in texts]
        return pd.DataFrame(rows, columns=[f.name for f in _REP_SCHEMA])

    return (docs.withColumn("__r", rep(F.col(text_col)))
            .select("*", "__r.*").drop("__r"))


def repetition_sql(table_expr: str = "documents") -> str:
    """DuckDB twin: (doc_id, dup_line_frac, dup_token_frac,
    top_bigram_frac, dup_trigram_frac) — identical float ops, DuckDB's
    round is half-away like the Python twin's HALF_UP for positives."""
    return f"""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS t,
                 string_split(text, chr(10)) AS l
          FROM {table_expr}),
        base AS (
          SELECT doc_id, len(t) AS n,
                 round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l),
                       6) AS dup_line_frac,
                 round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t),
                       6) AS dup_token_frac
          FROM tk),
        bg AS (
          SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                 FOR i IN range(1, len(t))]) AS g
          FROM tk WHERE len(t) >= 2),
        bgm AS (
          SELECT doc_id, max(c) AS mc FROM (
            SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
          GROUP BY 1),
        tg AS (
          SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN range(1, len(t) - 1)]) AS g
          FROM tk WHERE len(t) >= 3),
        tgs AS (
          SELECT doc_id, sum(c) AS sc FROM (
            SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
          WHERE c >= 2 GROUP BY 1)
        SELECT b.doc_id, b.dup_line_frac, b.dup_token_frac,
               round(CASE WHEN bgm.mc IS NULL THEN 0.0
                     ELSE least(2.0 * bgm.mc / b.n, 1.0) END, 6)
                 AS top_bigram_frac,
               round(CASE WHEN tgs.sc IS NULL THEN 0.0
                     ELSE least(3.0 * tgs.sc / b.n, 1.0) END, 6)
                 AS dup_trigram_frac
        FROM base b
        LEFT JOIN bgm ON b.doc_id = bgm.doc_id
        LEFT JOIN tgs ON b.doc_id = tgs.doc_id
    """


# --- unigram-LM perplexity filtering (CCNet-style quality signal) ------------
#
# The other standard corpus quality signal: score each document by its
# mean token log-probability under a unigram LM trained on the corpus
# (low = gibberish / boilerplate, the CCNet perplexity-filter lineage,
# here with a unigram model so the whole path stays relational).
# Cross-engine discipline: ln differs ~1 ulp between libms, so each
# token's logp is QUANTIZED to micro-nats (round 6dp → int64)
# immediately (the bm25 idf rule); per-doc aggregation then runs on
# exact int64 sums — order-independent — and only the final mean
# divides back to double with a fixed op order.

def train_unigram_lm(docs: DataFrame, text_col: str = "text"
                     ) -> tuple[DataFrame, int]:
    """→ ((token, logp_micro) table, oov_logp_micro). Add-one smoothing
    over the corpus vocabulary: logp = ln((cnt+1)/(N+V)), micro-nat
    quantized; OOV gets the cnt=0 formula. One token-keyed shuffle; the
    (N, V) stats collect is a single row."""
    toks = docs.select(F.explode(F.split(F.col(text_col), " "))
                       .alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    n, v = counts.agg(F.sum("cnt"), F.count("*")).collect()[0]
    nv = float(int(n) + int(v))
    lm = counts.select(
        "tok",
        F.round(F.log((F.col("cnt") + 1).cast("double") / F.lit(nv))
                * 1000000.0).cast("long").alias("logp_micro"))
    import math

    from mbrngq_spark.operators.sketch import _round_half_up
    oov = int(_round_half_up(math.log(1.0 / nv) * 1000000.0, 0))
    return lm, oov


def with_perplexity(docs: DataFrame, lm: DataFrame, oov_logp_micro: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, avg_logp): mean micro-quantized token log-prob per document
    (6dp). Corpus side is a map-only explode + broadcast LM join +
    doc-keyed re-agg of (long, long) pairs — the contamination_check
    shuffle shape; higher avg_logp = more natural text."""
    ex = docs.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    j = ex.join(F.broadcast(lm), "tok", "left")
    return (j.groupBy(id_col)
            .agg(F.sum(F.coalesce(F.col("logp_micro"),
                                  F.lit(oov_logp_micro).cast("long")))
                 .alias("__s"),
                 F.count(F.lit(1)).alias("__n"))
            .select(id_col,
                    F.round(F.col("__s").cast("double") / F.col("__n")
                            / F.lit(1000000.0), 6).alias("avg_logp")))


def perplexity_sql(table_expr: str = "documents") -> str:
    """DuckDB twin: train the same smoothed unigram LM over
    ``table_expr`` and score every row — identical quantization and
    fixed-op-order mean."""
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM {table_expr}),
        cnts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        st AS (SELECT CAST(CAST(sum(c) AS BIGINT)
                           + CAST(count(*) AS BIGINT) AS DOUBLE) AS nv
               FROM cnts),
        lm AS (SELECT tok,
                      CAST(round(ln(CAST(c + 1 AS DOUBLE)
                                    / (SELECT nv FROM st))
                                 * 1000000.0) AS BIGINT) AS lp
               FROM cnts),
        oov AS (SELECT CAST(round(ln(1.0 / (SELECT nv FROM st))
                                  * 1000000.0) AS BIGINT) AS lp)
        SELECT t.doc_id,
               round(CAST(sum(coalesce(lm.lp, (SELECT lp FROM oov)))
                          AS DOUBLE) / count(*) / 1000000.0, 6)
                 AS avg_logp
        FROM tok t LEFT JOIN lm ON t.tok = lm.tok
        GROUP BY 1
    """
