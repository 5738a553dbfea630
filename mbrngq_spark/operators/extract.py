"""Raw-document extraction — the missing HEAD of the text pipeline: real
crawls arrive as HTML, not clean ``text`` columns (r4 verdict gap #3).

``extract_html`` is a map-only Arrow-vectorized transform (mapInPandas-free:
a plain pandas UDF — one string column in, one out, no shuffle, no state):
strip <script>/<style> payloads and comments, drop every remaining tag,
decode the common entities, collapse whitespace. At 100 TB this is a pure
projection over the corpus scan.

Every rule lives in ONE ordered table (_RULES) that generates BOTH the
pandas implementation and the DuckDB oracle SQL (html_extract_sql), so the
two cannot drift. Contract: tags are delimited by the first '>' (an
attribute value containing a literal '>' splits the tag — the standard
regex-extractor tradeoff; full HTML5 tokenization is out of scope for a
boilerplate stripper). Patterns stay inside the Python-re ∩ RE2 common subset
(no lookaround, no backreferences; ``(?s)`` dotall + lazy ``.*?`` are
shared semantics), the PII_PATTERNS discipline.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (kind, pattern/needle, replacement) applied IN ORDER.
#  kind 're'  — regex with dotall semantics, global
#  kind 'lit' — plain literal replacement (entities; &amp; LAST so the
#               textual sequence '&amp;lt;' decodes to '&lt;', not '<')
_RULES: list[tuple[str, str, str]] = [
    ("re", r"(?s)<script[^>]*>.*?</script>", " "),
    ("re", r"(?s)<style[^>]*>.*?</style>", " "),
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"<[^>]*>", " "),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&amp;", "&"),
    ("re", r"[ \t\r\n]+", " "),
]


def extract_html_udf():
    """html → extracted plain text (stripped, whitespace-collapsed)."""
    compiled = [(k, re.compile(p, re.S) if k == "re" else p, r)
                for k, p, r in _RULES]

    @F.pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        s = html.fillna("")
        for kind, pat, rep in compiled:
            if kind == "re":
                s = s.str.replace(pat, rep, regex=True)
            else:
                s = s.str.replace(pat, rep, regex=False)
        return s.str.strip()

    return extract


def extract_html(docs, html_col: str = "html", out_col: str = "text"):
    """docs + ``out_col`` with the extracted text (map-only)."""
    return docs.withColumn(out_col, extract_html_udf()(F.col(html_col)))


def html_extract_sql(col: str) -> str:
    """DuckDB twin generated from the SAME rule table: regexp_replace
    with 'g' (dotall rides inline as ``(?s)`` — shared RE2/Python-re
    syntax) for regex rules, plain replace for literal rules, trim at
    the end."""
    expr = col
    for kind, pat, rep in _RULES:
        if kind == "re":
            p = pat.replace("'", "''")
            r = rep.replace("'", "''")
            expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
        else:
            p = pat.replace("'", "''")
            r = rep.replace("'", "''")
            expr = f"replace({expr}, '{p}', '{r}')"
    return f"trim({expr})"
