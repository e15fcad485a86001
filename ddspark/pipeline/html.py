"""HTML -> text extraction as a pure column-expression chain.

The first stage of every web-crawl pipeline (C4, RefinedWeb, Dolma) is
pulling visible text out of raw HTML.  This implements the standard
regex-cascade extraction — drop script/style/comment blocks, turn block
elements into line breaks, strip remaining tags, decode the common
entities, normalise whitespace — as a single JVM ``regexp_replace`` /
``replace`` chain: whole-stage-codegen, scan speed, no Python.

The rule table below is SHARED by the Spark builder and the SQL-twin
builder, so the two engines apply byte-identical rules (patterns are
RE2-safe: no backreferences, inline ``(?is)`` flags only — the common
subset of Java regex and RE2 that Spark and DuckDB both implement).

Scope boundary (documented, like the codec modules): numeric character
references other than ``&#39;`` and exotic named entities are left
verbatim; a full HTML5 parser (tree construction, CDATA, broken-markup
recovery) is out of scope — real crawls tolerate that, C4 itself is
regex-based at this stage.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["html_to_text", "html_to_text_oracle_expr"]

# (pattern, replacement) applied in order; replacement is one of
# "", " ", "\n".  RE2-safe.
_REGEX_STEPS: list[tuple[str, str]] = [
    # invisible machinery first
    (r"(?is)<script\b[^>]*>.*?</script>", ""),
    (r"(?is)<style\b[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    # block-level boundaries become line breaks
    (
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|"
        r"article|header|footer)\b[^>]*/?>",
        "\n",
    ),
    # every remaining tag vanishes
    (r"(?s)<[^>]*>", ""),
]

# literal entity decodes, in order — &amp; LAST so '&amp;lt;' decodes to
# the text '&lt;', not to '<'
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# whitespace normalisation, after tags/entities.  Edge newlines use
# \A/\z, the only end-anchors Java regex and RE2 agree on ($ matches
# before a final newline in Java but not in RE2).
_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t]+", " "),       # collapse horizontal runs
    (r" ?\n ?", "\n"),      # trim spaces hugging line breaks
    (r"\n{2,}", "\n"),      # collapse blank lines
    (r"\A\n+|\n+\z", ""),   # strip edge newlines (trim only eats spaces)
]


def html_to_text(col: Column) -> Column:
    """Visible text of an HTML column (see module docstring)."""
    out = col
    for pat, rep in _REGEX_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        out = F.replace(out, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_rep(rep: str) -> str:
    # an actual newline inside a SQL literal survives, but chr(10) is
    # unambiguous in a generated one-line expression
    return "chr(10)" if rep == "\n" else _sql_quote(rep)


def html_to_text_oracle_expr(expr: str) -> str:
    """The DuckDB expression applying the identical rule chain to
    ``expr`` (patterns quoted verbatim from the shared tables)."""
    out = expr
    for pat, rep in _REGEX_STEPS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_rep(rep)}, 'g')"
    for lit, rep in _ENTITY_STEPS:
        out = f"replace({out}, {_sql_quote(lit)}, {_sql_rep(rep)})"
    for pat, rep in _WS_STEPS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_rep(rep)}, 'g')"
    return f"trim({out})"
