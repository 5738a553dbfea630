"""HTML/boilerplate extraction (operators/extract.py): rule-table edge
cases and the pandas-re ↔ rule-order contract the DuckDB oracle replays."""

import pandas as pd
from pyspark.sql import functions as F

from mbrngq_spark.operators.extract import extract_html, extract_html_udf


def _run(spark, htmls):
    df = spark.createDataFrame(pd.DataFrame({"html": htmls}))
    return [r.t for r in
            df.select(extract_html_udf()(F.col("html")).alias("t"))
            .collect()]


def test_basic_strip_and_collapse(spark):
    got = _run(spark, [
        "<html><body><h1>Title</h1>\n<p>hello   world</p></body></html>"])
    assert got == ["Title hello world"]


def test_script_style_payloads_removed_across_newlines(spark):
    got = _run(spark, [
        '<script type="a">\nvar x = "<p>not text</p>";\n</script>keep'
        "<style>\n.c{color:red}\n</style>me"])
    assert got == ["keep me"]


def test_comments_and_entities(spark):
    got = _run(spark, [
        "a<!-- hidden\nmultiline -->b &lt;tag&gt; &quot;q&#39; x&nbsp;y"])
    assert got == ["a b <tag> \"q' x y"]


def test_amp_decoded_last(spark):
    # '&amp;lt;' must become the literal '&lt;', never '<'
    got = _run(spark, ["&amp;lt; and &amp;amp; and &amp;"])
    assert got == ["&lt; and &amp; and &"]


def test_extract_html_column_wrapper(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "html": ["<b>x</b> y"]}))
    out = extract_html(df).select("doc_id", "text").collect()
    assert out[0].text == "x y"


def test_empty_and_null_rows(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"html": pd.Series(["", None, "<p></p>"],
                                        dtype="object")}))
    got = [r.t for r in
           df.select(extract_html_udf()(F.col("html")).alias("t"))
           .collect()]
    assert got == ["", "", ""]
