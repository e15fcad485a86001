"""Curation operators: deterministic splits/samples, decontamination,
repetition stats — plus DuckDB replay of each ANSI twin."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from ddspark.pipeline.curation import (
    decontaminate,
    decontaminate_oracle_sql,
    hash_split,
    hash_split_oracle_sql,
    repetition_stats,
    repetition_stats_oracle_sql,
    split_bucket,
    stratified_sample,
    stratified_sample_oracle_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (1, "alpha beta gamma delta epsilon nine ten eleven", "en"),
        (2, "one two three four five six seven eight", "en"),
        (3, "uno dos tres cuatro cinco seis siete ocho", "es"),
        (4, "a a a a b", "en"),
        (5, "x", "de"),
    ] + [(i, f"unique w{i} text body number {i} tail{i} pad pad{i}", "en") for i in range(6, 40)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


# ---------------------------------------------------------------- hash split


def test_hash_split_deterministic_and_total(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(7)).collect()}
    assert a == b  # parallelism-independent
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()  # every row assigned


def test_hash_split_weights_validation(docs):
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": 0.5, "b": 0.2})


def test_hash_split_proportions(spark):
    big = spark.range(20000).withColumnRenamed("id", "doc_id")
    counts = dict(
        hash_split(big).groupBy("split").count().rdd.map(tuple).collect()
    )
    assert abs(counts["train"] / 20000 - 0.90) < 0.02
    assert abs(counts.get("val", 0) / 20000 - 0.05) < 0.01
    assert abs(counts.get("test", 0) / 20000 - 0.05) < 0.01


def test_hash_split_salt_independence(spark):
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = hash_split(big, salt="s1").withColumnRenamed("split", "sa")
    b = hash_split(big, salt="s2").select("doc_id", F.col("split").alias("sb"))
    both = a.join(b, "doc_id")
    # different salts must re-roll: the two assignments disagree somewhere
    assert both.where(F.col("sa") != F.col("sb")).count() > 0


def test_hash_split_matches_duckdb(spark, docs):
    pdf = docs.toPandas()
    spark_rows = {
        r["doc_id"]: r["split"] for r in hash_split(docs).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = dict(
        con.execute(
            f"SELECT doc_id, split FROM ({hash_split_oracle_sql('documents')})"
        ).fetchall()
    )
    assert spark_rows == duck


# ---------------------------------------------------------- stratified sample


def test_stratified_sample_deterministic_subset(spark, docs):
    kept = stratified_sample(docs, {"en": 0.5, "es": 1.0}, strata_col="lang")
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(
        docs.repartition(5), {"en": 0.5, "es": 1.0}, strata_col="lang"
    ).collect()}
    assert ids1 == ids2
    assert 3 in ids1  # es kept fully
    # de has no listed fraction -> dropped entirely
    assert 5 not in ids1


def test_stratified_sample_scalar_rate(spark):
    big = spark.range(10000).withColumnRenamed("id", "doc_id")
    n = stratified_sample(big, 0.3).count()
    assert abs(n / 10000 - 0.3) < 0.02


def test_stratified_sample_requires_strata_col(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": 0.5})


def test_stratified_sample_matches_duckdb(spark, docs):
    pdf = docs.toPandas()
    kept = stratified_sample(docs, {"en": 0.5, "es": 1.0}, strata_col="lang")
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = stratified_sample_oracle_sql(
        "documents", {"en": 0.5, "es": 1.0}, strata_col="lang"
    )
    duck_ids = {r[0] for r in con.execute(
        f"SELECT doc_id FROM ({sql})").fetchall()}
    assert {r["doc_id"] for r in kept.collect()} == duck_ids


# ------------------------------------------------------------- decontaminate


def test_decontaminate_flags_overlap(spark, docs):
    corpus = docs.where(F.col("doc_id") <= 2)
    bench = docs.where(F.col("doc_id") == 1)
    out = {
        r["doc_id"]: (r["bench_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=5).collect()
    }
    # doc 0 shares the 5-gram "alpha beta gamma delta epsilon" with bench doc 1
    assert out[0][1] is True and out[0][0] >= 1
    # doc 1 IS the benchmark text: every gram hits
    assert out[1][1] is True
    # doc 2 shares nothing
    assert out[2] == (0, False)


def test_decontaminate_min_hits(spark, docs):
    corpus = docs.where(F.col("doc_id") <= 2)
    bench = docs.where(F.col("doc_id") == 1)
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, n=5, min_hits=2).collect()
    }
    assert out[1] is True  # 4 shared grams
    assert out[0] is False  # only 1 shared gram


def test_decontaminate_matches_duckdb(spark, docs):
    pdf = docs.toPandas()
    out = decontaminate(
        docs.where(F.col("doc_id") < 30),
        docs.where(F.col("doc_id") >= 30),
        n=3,
        portable=True,
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = decontaminate_oracle_sql(
        "(SELECT * FROM documents WHERE doc_id < 30)",
        "(SELECT * FROM documents WHERE doc_id >= 30)",
        n=3,
    )
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    got = {r["doc_id"]: (r["bench_hits"], r["contaminated"]) for r in out.collect()}
    assert got == duck


def test_decontaminate_plan_broadcasts_bench(spark, docs):
    out = decontaminate(docs, docs.limit(2), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


# ----------------------------------------------------------- repetition stats


def test_repetition_stats_handcrafted(spark, docs):
    out = {
        r["doc_id"]: (r["token_count"], r["dup_word_frac"], r["top_ngram_frac"])
        for r in repetition_stats(docs).collect()
    }
    # "a a a a b": 5 tokens, 2 distinct -> dup 3/5; bigrams: "a a" x3, "a b" x1
    tc, dup, top = out[4]
    assert tc == 5
    assert dup == pytest.approx(0.6)
    assert top == pytest.approx(0.75)
    # single token doc: no bigrams -> 0.0, dup 0
    assert out[5] == (1, 0.0, 0.0)


def test_repetition_stats_matches_duckdb(spark, docs):
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(repetition_stats_oracle_sql("documents")).fetchall()
    }
    got = {
        r["doc_id"]: (r["token_count"], r["dup_word_frac"], r["top_ngram_frac"])
        for r in repetition_stats(docs).collect()
    }
    assert got == duck


def test_split_bucket_range(spark):
    big = spark.range(5000).withColumnRenamed("id", "doc_id")
    mm = big.select(
        F.min(split_bucket("doc_id", "s")).alias("lo"),
        F.max(split_bucket("doc_id", "s")).alias("hi"),
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] < 1_000_000


# --------------------------------------------------------- boilerplate lines


def test_drop_boilerplate_lines_basic(spark):
    from ddspark.pipeline.textops import drop_boilerplate_lines

    rows = [(i, f"COOKIE BANNER\nbody text {i}\nfooter") for i in range(5)] + [
        (99, "unique line one\nunique line two")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in
           drop_boilerplate_lines(df, max_doc_freq=3).collect()}
    # shared lines (df=5 > 3) removed, per-doc body kept, order preserved
    assert out[0] == "body text 0"
    assert out[4] == "body text 4"
    assert out[99] == "unique line one\nunique line two"


def test_drop_boilerplate_all_boilerplate_doc(spark):
    from ddspark.pipeline.textops import drop_boilerplate_lines

    rows = [(i, "same\nsame2") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = drop_boilerplate_lines(df, max_doc_freq=2).collect()
    assert all(r["text"] == "" for r in out)
    assert len(out) == 4  # every doc survives, emptied


def test_drop_boilerplate_matches_duckdb(spark, docs):
    import duckdb

    from ddspark.pipeline.textops import (
        drop_boilerplate_lines,
        drop_boilerplate_lines_oracle_sql,
    )

    got = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(docs, sep=" ", max_doc_freq=5).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    duck = dict(
        con.execute(
            drop_boilerplate_lines_oracle_sql("documents", sep=" ", max_doc_freq=5)
        ).fetchall()
    )
    assert got == duck


# ------------------------------------------------------------------ PII


def test_redact_pii_basic(spark):
    from ddspark.pipeline.curation import redact_pii

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call +1 555 123 4567"),
        (1, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (2, "nothing sensitive here"),
        (3, "a@b.io a@b.io a@b.io"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["text"] == "contact <EMAIL> or call <PHONE>"
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert out[1]["text"] == "server at <IP> and <IP> responded"
    assert out[1]["n_ipv4"] == 2
    assert out[2]["text"] == "nothing sensitive here"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_email"] == 3


def test_redact_pii_matches_duckdb(spark):
    import duckdb

    from ddspark.pipeline.curation import redact_pii, redact_pii_oracle_sql

    rows = [
        (0, "x a.b@c.de y 1.2.3.4 z +44 20 7946 0958"),
        (1, "edge: 999.999.999.999 and user@@double.at and +1-555-000-1111"),
        (2, "email-at-end foo@bar.baz"),
        (3, ""),
        (4, "ip4-ish 12.34.56.78.90 keeps tail"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in redact_pii(df).collect()}
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    duck = {
        r[0]: tuple(r)[1:]
        for r in con.execute(redact_pii_oracle_sql("documents")).fetchall()
    }
    assert got == duck


# --------------------------------------------------------- sequence packing


def test_pack_sequences_layout(spark):
    from ddspark.pipeline.curation import pack_sequences

    # one bucket -> a single deterministic stream ordered by doc_id
    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    out = {
        r["doc_id"]: (r["pack_seq"], r["pack_offset"], r["spans"])
        for r in pack_sequences(
            df, "toks", max_tokens=256, n_buckets=1
        ).collect()
    }
    # doc0 at (0,0), doc1 at (0,100), doc2 starts at 200 and straddles
    assert out[0] == (0, 0, 1)
    assert out[1] == (0, 100, 1)
    assert out[2] == (0, 200, 2)  # 200..300 crosses the 256 boundary
    assert out[3] == (1, 44, 1)
    # total budget conserved: last doc ends at 10*100 over 256-sized packs
    assert out[9] == (3, 900 - 3 * 256, 1)


def test_pack_sequences_parallelism_invariant(spark):
    from ddspark.pipeline.curation import pack_sequences

    rows = [(i, 10 + (i * 37) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    key = lambda d: sorted(map(tuple, d.collect()))
    a = pack_sequences(df, "toks", max_tokens=512, n_buckets=8)
    b = pack_sequences(df.repartition(13), "toks", max_tokens=512, n_buckets=8)
    assert key(a) == key(b)


def test_pack_sequences_matches_duckdb(spark):
    import duckdb

    from ddspark.pipeline.curation import (
        pack_sequences,
        pack_sequences_oracle_sql,
    )

    rows = [(i, 1 + (i * 13) % 300) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    got = sorted(map(tuple, pack_sequences(df, "toks", max_tokens=777, n_buckets=4).collect()))
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = sorted(
        map(tuple, con.execute(
            pack_sequences_oracle_sql("t", "toks", max_tokens=777, n_buckets=4)
        ).fetchall())
    )
    assert got == duck


# ----------------------------------------------------------------- target mix


def test_target_mix_downsamples_to_target(spark):
    from ddspark.pipeline.curation import target_mix

    rows = (
        [(i, "en") for i in range(8000)]
        + [(i + 8000, "de") for i in range(1500)]
        + [(i + 9500, "fr") for i in range(500)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    target = {"en": 0.5, "de": 0.3, "fr": 0.2}
    kept = target_mix(df, target)
    got = dict(kept.groupBy("lang").count().rdd.map(tuple).collect())
    total = sum(got.values())
    # fr is the binding stratum (500/0.2 = 2500 feasible total)
    assert got["fr"] == pytest.approx(500, abs=60)
    for s, t in target.items():
        assert got[s] / total == pytest.approx(t, abs=0.05)


def test_target_mix_validation(spark):
    from ddspark.pipeline.curation import target_mix

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError, match="sum to 1"):
        target_mix(df, {"en": 0.5})
    with pytest.raises(ValueError, match="absent"):
        target_mix(df, {"en": 0.5, "xx": 0.5})


def test_target_mix_matches_duckdb(spark, docs):
    from ddspark.pipeline.curation import target_mix, target_mix_oracle_sql

    target = {"en": 0.6, "es": 0.2, "de": 0.2}
    kept = {r["doc_id"] for r in target_mix(docs, target).collect()}
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    duck = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({target_mix_oracle_sql('documents', target)})"
        ).fetchall()
    }
    assert kept == duck


# -------------------------------------------------------- review regressions


def test_sample_oracle_escapes_quotes_and_ints(spark):
    from ddspark.pipeline.curation import (
        stratified_sample,
        stratified_sample_oracle_sql,
    )

    rows = [(0, "l'az"), (1, "l'az"), (2, "en"), (3, "en"), (4, "de")]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    fr = {"l'az": 1.0, "en": 0.5}
    kept = {r["doc_id"] for r in stratified_sample(df, fr, strata_col="lang").collect()}
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = stratified_sample_oracle_sql("documents", fr, strata_col="lang")
    duck = {r[0] for r in con.execute(f"SELECT doc_id FROM ({sql})").fetchall()}
    assert kept == duck and {0, 1} <= kept
    # integer strata compare as integers in both engines
    idf = spark.createDataFrame([(i, i % 3) for i in range(60)], ["doc_id", "grp"])
    fr2 = {0: 1.0, 2: 0.5}
    kept2 = {r["doc_id"] for r in stratified_sample(idf, fr2, strata_col="grp").collect()}
    con.register("it", idf.toPandas())
    sql2 = stratified_sample_oracle_sql("it", fr2, strata_col="grp")
    duck2 = {r[0] for r in con.execute(f"SELECT doc_id FROM ({sql2})").fetchall()}
    assert kept2 == duck2
    assert all(i % 3 == 0 for i in kept2 if i % 3 != 2)


def test_repetition_stats_shares_gram_expression(spark, docs):
    # after the refactor the counts must be unchanged vs the known values
    from ddspark.pipeline.curation import repetition_stats

    out = {r["doc_id"]: r["top_ngram_frac"] for r in repetition_stats(docs).collect()}
    assert out[4] == pytest.approx(0.75)


def test_exact_k_sample(spark):
    from ddspark.pipeline.curation import (
        exact_k_sample,
        exact_k_sample_oracle_sql,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1000)], ["doc_id", "text"]
    )
    a = {r["doc_id"] for r in exact_k_sample(df, 37).collect()}
    b = {r["doc_id"] for r in exact_k_sample(df.repartition(11), 37).collect()}
    assert len(a) == 37 and a == b  # exact size, parallelism-invariant
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({exact_k_sample_oracle_sql('t', 37)})"
        ).fetchall()
    }
    assert a == duck
    # roughly uniform: the sample is not the first 37 ids
    assert max(a) > 500


def test_stratified_exact_k_sample_quotas(spark):
    """Exactly min(k, n_s) rows per stratum, parallelism-invariant, a
    subset of the input."""
    from ddspark.pipeline.curation import stratified_exact_k_sample

    rows = [(i, "big" if i < 200 else "tiny") for i in range(205)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_exact_k_sample(df, 10, "lang", "doc_id").toPandas()
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"big": 10, "tiny": 5}  # tiny has only 5 rows
    out2 = stratified_exact_k_sample(
        df.repartition(7), 10, "lang", "doc_id"
    ).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    assert set(out["doc_id"]).issubset({r[0] for r in rows})


# ---------------------------------------------------------------------------
# Gopher quality rules + C4 line cleaning (round 5)
# ---------------------------------------------------------------------------


def _gq(spark, rows, **kw):
    from ddspark.pipeline.curation import gopher_quality

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_quality(df, **kw).toPandas().set_index("doc_id")
    return out


def test_gopher_quality_rule_fixtures(spark):
    """Each fixture violates exactly one Gopher rule; the signal columns
    prove which rule fired."""
    good = " ".join(["the cat and dog have fun with that bird"] * 8)  # 72 words
    rows = [
        (0, good),
        (1, "the cat and dog"),  # too few words
        (2, " ".join(["a"] * 80) + " the and"),  # mean word len < 3
        (3, good + " " + " ".join(["#"] * 10)),  # symbol ratio > 0.1
        (4, "\n".join(["- " + good] * 10)),  # 100% bullet lines
        (5, "\n".join([good + " so..."] * 10)),  # 100% ellipsis lines
        (6, good + " " + " ".join(["123"] * 40)),  # alpha frac < 0.8
        (7, " ".join(["cat dog bird fish"] * 20)),  # zero stopwords
        (8, ""),  # empty
    ]
    out = _gq(spark, rows)
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1, "keep"] and out.loc[1, "word_count"] == 4
    assert not out.loc[2, "keep"] and out.loc[2, "mean_word_len"] < 3
    assert not out.loc[3, "keep"] and out.loc[3, "symbol_word_ratio"] > 0.1
    assert not out.loc[4, "keep"] and out.loc[4, "bullet_line_frac"] == 1.0
    assert not out.loc[5, "keep"] and out.loc[5, "ellipsis_line_frac"] == 1.0
    assert not out.loc[6, "keep"] and out.loc[6, "alpha_word_frac"] < 0.8
    assert not out.loc[7, "keep"] and out.loc[7, "stopword_hits"] == 0
    assert not out.loc[8, "keep"] and out.loc[8, "word_count"] == 0


def test_gopher_quality_symbol_counting(spark):
    """# / ... / … are counted per-occurrence; '...' counts once not thrice."""
    out = _gq(spark, [(0, "a # b ... c … d")])
    # 3 symbols over 7 words (symbols tokenize as words too)
    assert abs(out.loc[0, "symbol_word_ratio"] - 3 / 7) < 1e-6


def test_gopher_quality_matches_duckdb_twin(spark):
    import duckdb
    from ddspark.pipeline.curation import gopher_quality, gopher_quality_oracle_sql

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        gopher_quality(df, min_words=50, min_stopword_hits=1)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(
        gopher_quality_oracle_sql("documents", min_words=50, min_stopword_hits=1)
        + " ORDER BY doc_id"
    ).df()
    assert len(got) == len(want)
    for col in got.columns:
        assert (got[col].astype(str).values == want[col].astype(str).values).all(), col


def test_gopher_quality_is_shuffle_free(spark):
    """The filter is a map-only stage: no Exchange anywhere in the plan."""
    from ddspark.pipeline.curation import gopher_quality

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_clean_line_rules(spark):
    from ddspark.pipeline.curation import c4_clean

    page = "\n".join(
        [
            "This line has enough words and ends with a period.",  # kept
            "No terminal punctuation here at all",  # dropped: punct
            "Too short.",  # dropped: < 5 words
            "Please enable JavaScript to continue browsing this site.",  # dropped
            "Read our Privacy Policy before continuing to browse.",  # dropped
            'A quoted ending also counts as terminal punctuation."',  # kept
        ]
    )
    df = spark.createDataFrame([(0, page)], "doc_id long, text string")
    out = c4_clean(df, min_kept_lines=1).toPandas()
    assert out.loc[0, "n_lines"] == 6
    assert out.loc[0, "n_kept"] == 2
    assert bool(out.loc[0, "keep_page"])
    assert out.loc[0, "clean_text"].count("\n") == 1


def test_c4_clean_page_rules(spark):
    from ddspark.pipeline.curation import c4_clean

    good = "This line has enough words and ends with a period."
    rows = [
        (0, "\n".join([good] * 3)),
        (1, "\n".join([good] * 3) + "\nsome lorem ipsum filler"),
        (2, "\n".join([good] * 3) + "\nfunction f() { return 1; }"),
        (3, "\n".join([good] * 2)),  # below min_kept_lines=3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_clean(df).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "keep_page"])
    assert not out.loc[1, "keep_page"] and out.loc[1, "lorem_ipsum"]
    assert not out.loc[2, "keep_page"] and out.loc[2, "has_brace"]
    assert not out.loc[3, "keep_page"] and out.loc[3, "n_kept"] == 2


def test_c4_clean_is_shuffle_free(spark):
    from ddspark.pipeline.curation import c4_clean

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_funnel_stage_attribution(spark):
    """Each crafted doc is charged to exactly the first stage it fails."""
    from ddspark.pipeline.curation import quality_funnel

    good = " ".join(["the cat and dog have fun with that bird"] * 8)
    rows = [
        (0, good),
        (1, good),  # exact duplicate of 0 -> exact_dup
        (2, "zz qq xx " * 30),  # no markers -> lang_id ('und')
        (3, "the " + " ".join(f"w{i}" for i in range(20))),  # en but <50 words -> gopher
        (4, good + " " + good),  # passes gopher, heavy repetition -> repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.stage: r
        for r in quality_funnel(
            df, min_words=50, min_stopword_hits=1, max_dup_word_frac=0.5
        ).collect()
    }
    assert (out["exact_dup"].entered, out["exact_dup"].dropped) == (5, 1)
    assert (out["lang_id"].entered, out["lang_id"].dropped) == (4, 1)
    assert (out["gopher"].entered, out["gopher"].dropped) == (3, 1)
    # doc 0: dup_word_frac = (72-9)/72 = 0.875 > 0.5 -> dropped too
    assert (out["repetition"].entered, out["repetition"].dropped) == (2, 2)


def test_quality_funnel_matches_duckdb_twin(spark):
    import duckdb
    from ddspark.pipeline.curation import quality_funnel, quality_funnel_oracle_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        quality_funnel(docs, min_words=50, min_stopword_hits=1)
        .orderBy("stage_no")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(
        quality_funnel_oracle_sql(
            "documents", gopher_sql_kwargs={"min_words": 50, "min_stopword_hits": 1}
        )
        + " ORDER BY stage_no"
    ).df()
    assert (got.values.astype(str) == want.values.astype(str)).all()


def test_target_encode_shrinkage(spark):
    from ddspark.pipeline.curation import target_encode

    # category 'a': 100 rows of y=10; 'b': 2 rows of y=100; global mean
    # = (1000+200)/102; smoothing m=10 pulls the rare 'b' hard toward it
    rows = [("a", 10.0)] * 100 + [("b", 100.0)] * 2 + [("c", None)]
    df = spark.createDataFrame(rows, "k string, y double")
    out = {r["category"]: r for r in target_encode(df, "k", "y", smoothing=10).collect()}
    prior = (100 * 10 + 2 * 100) / 102
    assert out["a"]["n"] == 100
    assert out["a"]["encoding"] == pytest.approx((1000 + 10 * prior) / 110, abs=1e-6)
    assert out["b"]["encoding"] == pytest.approx((200 + 10 * prior) / 12, abs=1e-6)
    # shrinkage direction: 'b' lands between its raw mean and the prior
    assert prior < out["b"]["encoding"] < 100
    # the all-NULL-target category vanishes (no usable label)
    assert "c" not in out

    # m=0 degenerates to the plain category mean
    raw = {r["category"]: r["encoding"] for r in target_encode(df, "k", "y", smoothing=0).collect()}
    assert raw["a"] == 10.0 and raw["b"] == 100.0

    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "k", "y", smoothing=-1)


def test_dsir_ranks_target_like_docs_first(spark):
    """Corpus of 6 'cat' docs + 6 'hund' docs, target = cat text: every
    cat doc must outscore every hund doc, top-k selects only cats."""
    from ddspark.pipeline.curation import dsir_select

    cats = [(i, "the cat sat on the mat with the cat") for i in range(6)]
    dogs = [(i + 10, "der hund schlief unter dem tisch im haus") for i in range(6)]
    corpus = spark.createDataFrame(cats + dogs, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, "a cat and the mat and the cat sat")], "doc_id long, text string"
    )
    out = dsir_select(corpus, target, buckets=64, k=6).collect()
    scores = {r["doc_id"]: r["logw_micro"] for r in out}
    assert min(scores[i] for i in range(6)) > max(scores[i + 10] for i in range(6))
    assert {r["doc_id"] for r in out if r["selected"]} == set(range(6))
    # k=None -> no selection, scores unchanged
    out2 = dsir_select(corpus, target, buckets=64).collect()
    assert not any(r["selected"] for r in out2)
    assert {r["doc_id"]: r["logw_micro"] for r in out2} == scores
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dsir_select(corpus, target, buckets=1)
    with _pytest.raises(ValueError):
        dsir_select(corpus, target, k=0)


def test_dsir_bucket_weights_broadcast(spark, sf_dir):
    """The <=buckets-row weight table must reach the per-doc feature
    counts through a broadcast join — no shuffle on the corpus side for
    the weight attach."""
    from ddspark.pipeline.curation import dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("lang") == "en")
    plan = (
        dsir_select(docs, target, buckets=256, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
