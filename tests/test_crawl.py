"""Crawl-snapshot dedup (operators/crawl.py): canonicalization rule
edges the fixture corpus can't isolate, pick determinism, and direct
Spark-vs-DuckDB parity of the shared regex rules."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from refined_spark.operators.crawl import (
    canonical_url,
    canonical_url_sql,
    drop_stale_snapshots,
    latest_snapshot,
    with_canonical_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    return [r["c"] for r in
            df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_alias_collapse(spark):
    aliases = [
        "https://site.example.org/p/1",
        "HTTPS://site.example.org/p/1",
        "https://SITE.Example.ORG/p/1",
        "https://www.site.example.org/p/1",
        "https://site.example.org:443/p/1",
        "https://site.example.org/p/1/",
        "https://site.example.org/p/1#frag",
        "https://www.SITE.example.org:443/p/1/",
    ]
    got = set(_canon(spark, aliases))
    assert got == {"https://site.example.org/p/1"}


def test_rules_that_must_not_fire(spark):
    cases = {
        # mismatched default port is NOT a default port — kept
        "http://h.org:443/x": "http://h.org:443/x",
        "https://h.org:80/x": "https://h.org:80/x",
        # non-default port kept
        "https://h.org:8443/x": "https://h.org:8443/x",
        # query is identity — preserved (and its case preserved)
        "https://h.org/x?A=1&b=2": "https://h.org/x?A=1&b=2",
        # path case preserved
        "https://h.org/CamelCase": "https://h.org/CamelCase",
        # www only as a host PREFIX label
        "https://notwww.org/x": "https://notwww.org/x",
        # root slash == bare host
        "https://h.org/": "https://h.org",
        "https://h.org": "https://h.org",
        # PATH trailing slash strips; the query string — including any
        # '/' inside or at its end — is preserved byte-for-byte (rule
        # 5: the query addresses content; r5 review fixed the rule,
        # which previously stripped the QUERY's trailing slash and
        # kept the path's — backwards from the documented contract)
        "https://h.org/a/?q=1/": "https://h.org/a?q=1/",
        "https://h.org/a?next=/x/": "https://h.org/a?next=/x/",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_duckdb_parity_on_rule_matrix(spark):
    """The SQL emitted by canonical_url_sql and the Spark Column agree
    byte-for-byte on a matrix stressing every rule."""
    urls = [
        "https://www.A.B.org:443/P/q?X=1#f",
        "HTTP://H.org:80", "http://h.org:80/",
        "https://h.org:8080/x/", "ftp://Files.org/A",
        "https://notwww.org/x#y", "http://www.h.org/?z=Z/",
    ]
    spark_side = _canon(spark, urls)
    con = duckdb.connect()
    duck_side = [
        con.sql(f"select {canonical_url_sql('u')} "
                f"from (select '{u}' as u)").fetchone()[0]
        for u in urls]
    assert spark_side == duck_side


def _snap_df(spark, rows):
    return spark.createDataFrame(
        rows, "url: string, warc_ts: timestamp, text: string")


def test_latest_wins_and_tiebreak(spark):
    t0 = datetime.datetime(2025, 3, 1)
    rows = [
        ("https://a.org/x", t0, "old"),
        ("https://www.a.org/x", t0 + datetime.timedelta(days=2), "new"),
        # b.org: two snapshots at the SAME ts -> max raw url wins
        ("https://b.org/y", t0, "tie-low"),
        ("https://b.org/y#f", t0, "tie-high"),
        ("https://c.org/z", t0, "single"),
    ]
    out = {r["canonical_url"]: r
           for r in latest_snapshot(_snap_df(spark, rows)).collect()}
    assert out["https://a.org/x"]["text"] == "new"
    assert out["https://a.org/x"]["n_snapshots"] == 2
    assert out["https://b.org/y"]["text"] == "tie-high"
    assert out["https://c.org/z"]["n_snapshots"] == 1


def test_drop_stale_schema_and_idempotence(spark):
    t0 = datetime.datetime(2025, 3, 1)
    rows = [("https://a.org/x", t0, "old"),
            ("https://a.org/x/", t0 + datetime.timedelta(hours=1), "new"),
            ("https://c.org/z", t0, "single")]
    df = _snap_df(spark, rows)
    cleaned = drop_stale_snapshots(df)
    assert cleaned.columns == df.columns
    assert cleaned.count() == 2
    again = drop_stale_snapshots(cleaned)
    assert sorted(r["url"] for r in again.collect()) == \
        sorted(r["url"] for r in cleaned.collect())


def test_fixture_is_nonvacuous(spark, fx_t1):
    fixture_dir = fx_t1
    """Every canonicalization rule fires somewhere in the fixture, and
    at least one site has >= 3 snapshots (real collapse, not 1:1)."""
    import os

    snaps = spark.read.parquet(
        os.path.join(fixture_dir, "crawl_snapshots.parquet"))
    c = with_canonical_url(snaps)
    assert c.where(F.col("url") != F.col("canonical_url")).count() > 0
    multi = (c.groupBy("canonical_url").count()
             .where(F.col("count") >= 3).count())
    assert multi > 0
    urls = [r["url"] for r in snaps.select("url").collect()]
    assert any("www." in u for u in urls)
    assert any(":443" in u or ":80" in u for u in urls)
    assert any("#" in u for u in urls)
    assert any(u.rstrip().endswith("/") for u in urls)
    assert any(u[:5].isupper() for u in urls)  # scheme-case decoration


def test_collapse_composes_on_decorated_input(spark):
    """latest_snapshot over a frame that ALREADY carries canonical_url
    (its own with_canonical_url output) must not produce duplicate
    columns — the r5 review's composition crash."""
    from refined_spark.operators.crawl import (drop_stale_snapshots,
                                               with_canonical_url)

    docs = spark.createDataFrame(
        [("https://h.org/a", "2025-01-01 00:00:00", "t1"),
         ("https://www.h.org/a", "2025-01-02 00:00:00", "t2")],
        "url string, ts string, text string").withColumn(
        "warc_ts", F.col("ts").cast("timestamp")).drop("ts")
    decorated = with_canonical_url(docs)
    out = drop_stale_snapshots(decorated)
    assert out.columns == decorated.columns
    assert out.count() == 1 and out.collect()[0].text == "t2"


def test_content_tiebreak_makes_degenerate_ties_total(spark):
    """Two rows identical in (warc_ts, url) with different payloads:
    with content_tiebreak_col the pick is deterministic (max payload
    hash), independent of input order."""
    from refined_spark.operators.crawl import latest_snapshot

    rows = [("https://h.org/a", "2025-01-01 00:00:00", t)
            for t in ("payload_one", "payload_two")]
    want = None
    for perm in (rows, rows[::-1]):
        docs = spark.createDataFrame(
            perm, "url string, ts string, text string").withColumn(
            "warc_ts", F.col("ts").cast("timestamp")).drop("ts")
        got = latest_snapshot(docs, content_tiebreak_col="text")
        picked = got.collect()[0].text
        want = want or picked
        assert picked == want
