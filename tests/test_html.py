"""HTML -> visible-text extraction (round 5).

Two layers of validation, mirroring the codec test strategy:
1. hand-computed fixtures — the expected text is written out by hand from
   the documented rule chain, so a symmetric bug in the rules can't hide;
2. cross-engine twin — the generated DuckDB expression applies the same
   rule table and must agree byte-for-byte on a tricky corpus (nested
   tags inside comments, entities, script bodies containing markup).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddspark.pipeline.html import html_to_text, html_to_text_oracle_expr

CASES = [
    # (html, expected visible text)
    ("<p>hello</p>", "hello"),
    ("<p>a</p><p>b</p>", "a\nb"),
    ("plain text, no markup", "plain text, no markup"),
    ("", ""),
    # script/style bodies vanish entirely, including markup inside them
    ("<script>var x = '<div>not text</div>';</script>after", "after"),
    ("<style>p { color: red }</style>body", "body"),
    ("<SCRIPT src='x.js'>ignored()</SCRIPT>ok", "ok"),
    # comments vanish, including tags inside them
    ("a<!-- <p>hidden</p> -->b", "ab"),
    # block elements break lines; inline tags don't
    ("<div>one</div><div>two</div>", "one\ntwo"),
    ("<b>bold</b> and <i>italic</i>", "bold and italic"),
    ("line1<br/>line2<br>line3", "line1\nline2\nline3"),
    ("<ul><li>x</li><li>y</li></ul>", "x\ny"),
    ("<h1>Title</h1>para", "Title\npara"),
    # entity decoding, &amp; last so double-escapes stay escaped
    ("1 &lt; 2 &amp;&amp; 3 &gt; 2", "1 < 2 && 3 > 2"),
    ("&quot;q&quot; &#39;s&#39;", "\"q\" 's'"),
    ("a&nbsp;b", "a b"),
    ("&amp;lt; stays", "&lt; stays"),
    # whitespace normalisation
    ("  spaced\t\tout  ", "spaced out"),
    ("<p>  a  </p>\n\n\n<p>  b  </p>", "a\nb"),
    # multiline script (the (?s) flag)
    ("<script>\nline1\nline2\n</script>kept", "kept"),
    # attributes with '>'-free junk
    ('<a href="http://x/?a=1&amp;b=2">link</a>', "link"),
    # unknown named entities are left verbatim (documented boundary)
    ("&copy; 2024", "&copy; 2024"),
]


def test_hand_computed_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i long, html string"
    )
    got = {r.i: r.txt for r in df.select("i", html_to_text(F.col("html")).alias("txt")).collect()}
    for i, (html, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {html!r} -> {got[i]!r}, want {want!r}"


def test_full_page(spark):
    page = (
        "<html><head><title>T</title><style>body{margin:0}</style>"
        "<script>if (1 < 2) { go('<b>'); }</script></head>"
        "<body><!-- nav --><h1>Header</h1>"
        "<p>First &amp; second.</p>"
        "<div>Tail&nbsp;note</div></body></html>"
    )
    df = spark.createDataFrame([(page,)], "html string")
    (txt,) = df.select(html_to_text(F.col("html")).alias("t")).first()
    # <title> is inline by the rule table; <h1> opens a new line
    assert txt == "T\nHeader\nFirst & second.\nTail note"


def test_duckdb_twin_agrees(spark):
    rows = [(i, h) for i, (h, _) in enumerate(CASES)] + [
        (100, "<table><tr><td>c1</td><td>c2</td></tr></table>"),
        (101, "<p>unclosed <div>nested"),
        (102, "text with < bare bracket"),
        (103, "<script>no close tag swallows rest"),
        (104, "&amp;amp;&amp;"),
    ]
    df = spark.createDataFrame(rows, "i long, html string")
    got = (
        df.select("i", html_to_text(F.col("html")).alias("txt"))
        .orderBy("i")
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["i", "html"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT i, {html_to_text_oracle_expr('html')} AS txt FROM t ORDER BY i"
    ).df()
    assert list(got["txt"]) == list(want["txt"])


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i long, html string")
    assert df.select(html_to_text(F.col("html")).alias("t")).first().t is None
