"""Substring-level exact dedup: shared verbatim passages flagged as
maximal token spans, then scrubbed — the within-document analog of
document-level dedup (VERDICT r5 item 1).

Ground truth is recomputed in pure Python per test (positional n-gram
sharing + island merge), so every assertion is value-level."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mbrngq_spark.operators.dedup import (scrub_substring_spans,
                                          shared_substring_spans)


def _py_spans(texts: dict[int, str], n: int, min_run: int):
    """Pure-Python twin: (doc_id, span_start, span_len) set."""
    sh = {}  # shingle -> set(doc_id)
    pos = {}  # doc_id -> [(pos0, shingle)]
    for d, t in texts.items():
        toks = t.split(" ")
        pos[d] = []
        for p in range(max(0, len(toks) - n + 1)):
            s = " ".join(toks[p:p + n])
            sh.setdefault(s, set()).add(d)
            pos[d].append((p, s))
    out = set()
    for d, ps in pos.items():
        flagged = sorted(p for p, s in ps if len(sh[s]) >= 2)
        run: list[int] = []
        for p in flagged + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= min_run:
                    out.add((d, run[0], run[-1] - run[0] + n))
                run = []
            if p is not None:
                run.append(p)
    return out


def _df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}),
        "doc_id long, text string")


BOILER = "standard license terms apply to this work all rights reserved"


@pytest.fixture(scope="module")
def corpus():
    texts = {
        0: f"unique alpha words here {BOILER} and a tail zero",
        1: f"other beta content {BOILER} different ending one",
        2: f"{BOILER} starts this doc two",            # span at offset 0
        3: "totally unrelated text with no shared passage at all",
        4: "short doc",                                 # < n tokens
        # passage repeated twice WITHIN one doc but in no other doc:
        5: "repeat me now please again repeat me now please again done",
    }
    return texts


def test_spans_match_python_twin(spark, corpus):
    got = shared_substring_spans(_df(spark, corpus), n=4, min_run=2)
    rows = {(r["doc_id"], r["span_start"], r["span_len"])
            for r in got.collect()}
    assert rows == _py_spans(corpus, 4, 2)
    assert rows, "planted boilerplate must be flagged"
    # the boilerplate span is found in every doc that carries it
    assert {d for d, _, _ in rows} >= {0, 1, 2}


def test_within_doc_repeat_not_flagged(spark, corpus):
    got = shared_substring_spans(_df(spark, corpus), n=4, min_run=2)
    assert got.filter(F.col("doc_id").isin(3, 4, 5)).count() == 0


def test_span_offsets_are_exact(spark, corpus):
    """Every flagged span, sliced out of the original token stream, is a
    passage that occurs verbatim in >= 2 docs."""
    spans = shared_substring_spans(_df(spark, corpus), n=4, min_run=2)
    texts = {d: t.split(" ") for d, t in corpus.items()}
    passages: dict[str, set[int]] = {}
    for r in spans.collect():
        toks = texts[r["doc_id"]]
        assert 0 <= r["span_start"]
        assert r["span_start"] + r["span_len"] <= len(toks)
        frag = " ".join(toks[r["span_start"]:r["span_start"] + r["span_len"]])
        passages.setdefault(frag, set()).add(r["doc_id"])
    # the common boilerplate surfaces as the SAME maximal passage everywhere
    assert any(BOILER in frag and len(ds) >= 3
               for frag, ds in passages.items())


def test_scrub_preserves_sequence(spark, corpus):
    """Scrub == delete exactly the flagged token ranges: remaining tokens
    equal the original sequence minus covered positions, order intact."""
    df = _df(spark, corpus)
    spans = shared_substring_spans(df, n=4, min_run=2)
    out = {r["doc_id"]: r for r in
           scrub_substring_spans(df, spans).collect()}
    expect_spans = _py_spans(corpus, 4, 2)
    for d, t in corpus.items():
        toks = t.split(" ")
        covered = set()
        for (dd, s, ln) in expect_spans:
            if dd == d:
                covered.update(range(s, s + ln))
        keep = [tok for i, tok in enumerate(toks) if i not in covered]
        assert out[d]["text"] == " ".join(keep)
        assert out[d]["n_tokens_kept"] == len(keep)
    # untouched docs pass through byte-identical
    assert out[3]["text"] == corpus[3]
    assert out[4]["text"] == corpus[4]


def test_min_run_threshold(spark):
    """A single isolated shared shingle (run length 1) is below min_run=2
    and stays unflagged; at min_run=1 it is flagged with span_len == n."""
    texts = {
        10: "aa bb cc dd xx yy zz qq",
        11: "pp rr aa bb cc dd ss tt uu",
    }
    df = _df(spark, texts)
    assert shared_substring_spans(df, n=4, min_run=2).count() == 0
    got = {(r["doc_id"], r["span_start"], r["span_len"])
           for r in shared_substring_spans(df, n=4, min_run=1).collect()}
    assert got == {(10, 0, 4), (11, 2, 4)} == _py_spans(texts, 4, 1)
