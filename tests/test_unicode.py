"""Unicode normalization + encoding-hygiene stats (round 5)."""

import unicodedata

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddspark.pipeline.unicode import (
    normalize_text,
    unicode_stats,
    unicode_stats_oracle_sql,
)

# (raw, nfc, nfkc) — hand-written expectations, not round-tripped through
# the library under test
NORM_CASES = [
    ("café", "café", "café"),          # combining acute composes
    ("café", "café", "café"),           # already composed
    ("Å", "Å", "Å"),                    # ANGSTROM SIGN -> Å
    ("Ω", "Ω", "Ω"),                    # OHM SIGN -> omega
    ("각", "각", "각"),        # Hangul jamo compose
    ("ﬁle", "ﬁle", "file"),                  # fi ligature: NFKC only
    ("ＡＢ", "ＡＢ", "AB"),            # fullwidth: NFKC only
    ("½", "½", "1⁄2"),                  # ½ -> 1⁄2 under NFKC
    ("plain ascii", "plain ascii", "plain ascii"),
    ("", "", ""),
]


def test_normalize_forms(spark):
    df = spark.createDataFrame(
        [(i, r) for i, (r, _, _) in enumerate(NORM_CASES)], "i long, t string"
    )
    nfc = {r.i: r.t_norm for r in normalize_text(df, "t", "NFC").collect()}
    nfkc = {r.i: r.o for r in normalize_text(df, "t", "NFKC", out_col="o").collect()}
    for i, (raw, want_nfc, want_nfkc) in enumerate(NORM_CASES):
        assert nfc[i] == want_nfc, f"NFC case {i} ({raw!r})"
        assert nfkc[i] == want_nfkc, f"NFKC case {i} ({raw!r})"


def test_normalize_null_and_bad_form(spark):
    df = spark.createDataFrame([(1, None)], "i long, t string")
    assert normalize_text(df, "t").first().t_norm is None
    with pytest.raises(ValueError, match="form"):
        normalize_text(df, "t", form="NFX")


def test_nfd_roundtrip(spark):
    df = spark.createDataFrame([(0, "café 각")], "i long, t string")
    nfd = normalize_text(df, "t", "NFD", out_col="d")
    back = normalize_text(nfd, "d", "NFC", out_col="c").first()
    assert back.d == unicodedata.normalize("NFD", "café 각")
    assert back.c == "café 각"


STAT_ROWS = [
    (0, "ascii only"),
    (1, "café"),                 # 1 two-byte char
    (2, "bad �� text"),     # two replacement chars
    (3, "ctl\x01\x02\ttab"),          # 2 controls; tab is NOT control here
    (4, "astral \U0001f600!"),        # 4-byte char, 2 UTF-16 units
    (5, ""),
    (6, "각"),        # 3 jamo code points, 9 bytes
]


def test_unicode_stats_hand_computed(spark):
    df = spark.createDataFrame(STAT_ROWS, "i long, t string")
    got = {r.i: r for r in unicode_stats(df, "t").collect()}
    assert (got[0].n_bytes, got[0].n_codepoints, got[0].ascii_only) == (10, 10, True)
    assert (got[1].n_bytes, got[1].n_codepoints, got[1].ascii_only) == (5, 4, False)
    assert got[2].n_replacement == 2
    assert got[3].n_control == 2
    assert (got[4].n_bytes, got[4].n_codepoints, got[4].ascii_only) == (12, 9, False)
    assert (got[5].n_bytes, got[5].n_codepoints) == (0, 0)
    assert (got[6].n_bytes, got[6].n_codepoints) == (9, 3)
    assert all(got[i].n_replacement == 0 for i in (0, 1, 3, 4, 5, 6))
    assert all(got[i].n_control == 0 for i in (0, 1, 2, 4, 5, 6))


def test_duckdb_twin_stats_and_nfc(spark):
    rows = STAT_ROWS + [(10 + i, r) for i, (r, _, _) in enumerate(NORM_CASES)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = (
        unicode_stats(normalize_text(df, "t", "NFC"), "t")
        .select(
            "i", "n_bytes", "n_codepoints", "n_replacement", "n_control",
            "ascii_only", F.md5("t_norm").alias("nfc_md5"),
        )
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["i", "t"]))
    stats = unicode_stats_oracle_sql("t")
    cols = ", ".join(f"{sql} AS {name}" for name, sql in stats.items())
    want = con.execute(
        f"SELECT i, {cols}, md5(nfc_normalize(t)) AS nfc_md5 FROM t ORDER BY i"
    ).df()
    for col in ["n_bytes", "n_codepoints", "n_replacement", "n_control",
                "ascii_only", "nfc_md5"]:
        assert list(got[col]) == list(want[col]), col


def test_strip_accents_semantics(spark):
    from ddspark.pipeline.unicode import strip_accents

    rows = [
        (0, "café"), (1, "café"), (2, "naïve"), (3, "ḱṷṓn"),
        (4, "øre œuf Straße"),  # not accents: unchanged
        (5, "plain ascii"), (6, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {r["i"]: r["t_plain"] for r in strip_accents(df, "t").collect()}
    assert out[0] == out[1] == "cafe"  # composed and decomposed converge
    assert out[2] == "naive"
    assert out[3] == "kuon"
    assert out[4] == "øre œuf Straße"
    assert out[5] == "plain ascii"
    assert out[6] is None
