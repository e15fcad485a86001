"""URL curation operators (round 5)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddspark.pipeline.urlops import (
    canonicalize_url,
    filter_blocked_domains,
    registered_domain,
    url_host,
    url_stats,
    url_stats_oracle_sql,
)

ROWS = [
    (0, "https://www.Site1.co.uk:8080/a/b/c?utm_source=x&id=7#frag"),
    (1, "http://blog.example.com/post/?id=1&utm_campaign=Y"),
    (2, "https://example.com/"),
    (3, "HTTPS://SUB.DEEP.site2.COM/x?fbclid=abc"),
    (4, "not a url at all"),
    (5, "ftp://files.archive.org/pub/data.bin"),
    (6, "https://localhost/admin"),
    (7, "http://a.b.c.d.com.au/p1/p2/p3/p4?gclid=1&q=2&utm_x=3"),
]


@pytest.fixture()
def urls(spark):
    return spark.createDataFrame(ROWS, "doc_id long, url string")


def test_url_stats_values(spark, urls):
    out = {r.doc_id: r for r in url_stats(urls, blocklist=["example.com", "site2.com"]).collect()}
    assert out[0].host == "www.site1.co.uk"
    assert out[0].domain == "site1.co.uk"  # two-level TLD keeps 3 labels
    assert out[0].path_depth == 3
    assert out[0].has_tracking
    assert out[0].canonical_url == "https://www.site1.co.uk:8080/a/b/c?id=7"
    assert not out[0].blocked
    assert out[1].domain == "example.com" and out[1].blocked
    assert out[3].host == "sub.deep.site2.com" and out[3].blocked
    assert out[3].canonical_url == "https://sub.deep.site2.com/x"
    assert out[4].host is None and not out[4].blocked
    assert out[4].canonical_url == "not a url at all"  # non-URL passthrough
    assert out[5].domain == "archive.org"
    assert out[6].domain == "localhost"  # single label passes through
    assert out[7].domain == "d.com.au" and out[7].path_depth == 4
    assert out[7].canonical_url == "http://a.b.c.d.com.au/p1/p2/p3/p4?q=2"


def test_url_stats_matches_duckdb_twin(spark, urls):
    bl = ["example.com", "site2.com"]
    got = url_stats(urls, blocklist=bl).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=["doc_id", "url"]))
    want = con.execute(url_stats_oracle_sql("t", blocklist=bl) + " ORDER BY doc_id").df()
    for c in got.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c


def test_filter_blocked_domains(spark, urls):
    kept = sorted(
        r.doc_id
        for r in filter_blocked_domains(urls, ["example.com", "site2.com"]).collect()
    )
    # drops 1/2 (example.com) and 3 (site2.com); keeps non-URLs (doc 4)
    assert kept == [0, 4, 5, 6, 7]
    assert filter_blocked_domains(urls, []).count() == len(ROWS)


def test_url_ops_stay_in_codegen(spark, urls):
    """The isin/staged-projection form must not overflow the 64 KB
    whole-stage-codegen method (the OR-chain form silently fell back to
    interpreted eval)."""
    df = url_stats(urls, blocklist=["example.com", "site2.com"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # one In expression, not one domain-tree copy per blocklist entry
    assert plan.count("IN (") <= 2


def test_url_stats_is_shuffle_free(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".com/x?id=1")).alias("url"),
    )
    out = url_stats(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_url_host_strips_userinfo(spark):
    from ddspark.pipeline.urlops import url_stats

    df = spark.createDataFrame(
        [(0, "https://user:p@ss@www.example.com:8080/a")],
        "doc_id long, url string",
    )
    r = url_stats(df).collect()[0]
    # everything up to the LAST @ is userinfo
    assert r.host == "www.example.com"
    assert r.domain == "example.com"


def test_filter_blocked_domains_table_broadcast_anti(spark, urls):
    from ddspark.pipeline.urlops import filter_blocked_domains, filter_blocked_domains_table

    bl = spark.createDataFrame(
        [("Example.com",), ("site2.com",)], "domain string"
    )
    out = filter_blocked_domains_table(urls, bl)
    kept = sorted(r.doc_id for r in out.collect())
    # identical verdicts to the literal-list form
    lit = sorted(
        r.doc_id
        for r in filter_blocked_domains(urls, ["example.com", "site2.com"]).collect()
    )
    assert kept == lit == [0, 4, 5, 6, 7]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus side never shuffles: the only exchange is the broadcast
    assert "Exchange hashpartitioning" not in plan
