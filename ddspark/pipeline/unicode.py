"""Unicode hygiene for web corpora: normalization + encoding-damage stats.

Every serious tokenizer pins a Unicode normal form (GPT-2/tiktoken and
SentencePiece default to NFC/NFKC), so normalization is the canonical
pre-tokenization pass; replacement-character and control-character counts
are the standard signals for mojibake / binary-contaminated crawl text
(the C4 and Gopher pipelines both drop on them).

Two layers, split by what Spark can express natively:

* ``unicode_stats`` — pure column expressions (JVM regex, whole-stage
  codegen, scan speed).  Both engines' ``length()`` counts code points
  (Spark strings are UTF8String, not java.lang.String — verified by
  test on astral chars), so bytes + code points are directly shared
  metrics.  The regex rule strings live in one table shared with the
  SQL-twin builder, html.py-style.
* ``normalize_text`` — NFC/NFD/NFKC/NFKD via an Arrow-batched pandas
  UDF.  Pure-ASCII strings (the overwhelming bulk of an English web
  corpus) short-circuit through C-speed ``str.isascii`` without touching
  the normalizer.  The DuckDB twin for NFC is ``nfc_normalize``
  (utf8proc) — an *independent* Unicode implementation, so the gate
  query cross-checks two normalizers, not one implementation against
  itself.  DuckDB ships no NFKC, so the compatibility forms are
  pytest-only (same policy as compression_ratio / PCA).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "normalize_text",
    "strip_accents",
    "unicode_stats",
    "unicode_stats_oracle_sql",
]

# shared regex rule table (Java-regex/RE2 common subset; \x{...} class
# endpoints are parsed identically by both engines)
_REPLACEMENT_RE = "�"
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``<text_col>_norm``) = the Unicode
    ``form`` normalization of ``text_col``.  Arrow-batched; ASCII rows
    never reach the normalizer."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    out = out_col or f"{text_col}_norm"

    @F.pandas_udf("string")
    def norm(col: pd.Series) -> pd.Series:
        def one(s):
            if s is None or s.isascii():
                return s
            return unicodedata.normalize(form, s)

        return col.map(one)

    return df.withColumn(out, norm(F.col(text_col)))


def strip_accents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``<text_col>_plain``) = ``text_col`` with
    combining marks removed: NFD-decompose, drop category-Mn codepoints.

    The accent-folding step of multilingual search/dedup normalization
    (café == cafe; matches how CCNet-style pipelines canonicalize before
    hashing).  Deliberately NO NFC recomposition afterwards — that is
    exactly DuckDB's utf8proc ``strip_accents`` semantics, so the gate
    can md5-match the two independent Unicode implementations (verified
    on accents, precomposed singletons, and double-diacritic letters;
    base letters with no combining decomposition — ø, ß, œ — pass
    through unchanged in BOTH, by design).  Arrow-batched with the same
    ASCII fast path as :func:`normalize_text`.
    """
    out = out_col or f"{text_col}_plain"

    @F.pandas_udf("string")
    def fold(col: pd.Series) -> pd.Series:
        def one(s):
            if s is None or s.isascii():
                return s
            return "".join(
                c
                for c in unicodedata.normalize("NFD", s)
                if unicodedata.category(c) != "Mn"
            )

        return col.map(one)

    return df.withColumn(out, fold(F.col(text_col)))


def unicode_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append encoding-hygiene columns (all BIGINT/BOOLEAN, all pure
    column expressions): ``n_bytes``, ``n_codepoints``, ``n_replacement``
    (U+FFFD count — the mojibake signal), ``n_control`` (C0/DEL controls
    other than tab/newline/CR), ``ascii_only``."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_bytes": F.octet_length(c).cast("long"),
            "n_codepoints": F.length(c).cast("long"),
            "n_replacement": F.regexp_count(c, F.lit(_REPLACEMENT_RE)).cast("long"),
            "n_control": F.regexp_count(c, F.lit(_CONTROL_RE)).cast("long"),
            "ascii_only": F.octet_length(c) == F.length(c),
        }
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _count_re(expr: str, pat: str) -> str:
    return f"LEN(regexp_extract_all({expr}, {_sql_quote(pat)}))"


def unicode_stats_oracle_sql(expr: str) -> dict[str, str]:
    """DuckDB expressions for each stat column over ``expr`` (DuckDB
    ``length`` already counts code points, so no astral correction)."""
    return {
        "n_bytes": f"CAST(strlen({expr}) AS BIGINT)",
        "n_codepoints": f"CAST(length({expr}) AS BIGINT)",
        "n_replacement": f"CAST({_count_re(expr, _REPLACEMENT_RE)} AS BIGINT)",
        "n_control": f"CAST({_count_re(expr, _CONTROL_RE)} AS BIGINT)",
        "ascii_only": f"(strlen({expr}) = length({expr}))",
    }
