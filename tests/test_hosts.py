"""Host-level quality aggregation + filtering (operators/hosts.py)."""

import os

import pyspark.sql.functions as F
import pytest

from refined_spark.operators.hosts import (
    drop_low_quality_hosts,
    host_of,
    host_stats,
    low_quality_hosts,
)

TAU, MIN_DOCS = 0.61, 2


def test_host_of_rules(spark):
    rows = spark.createDataFrame(
        [("HTTPS://WWW.Example.ORG:443/Path?q=1#frag",),
         ("http://example.org:80/a",),
         ("http://example.org:8080/a",),   # non-default port KEPT
         ("https://notwww.example.org/",),  # 'www.' only as a prefix label
         ("http://www.example.org:443/x",)],  # 443 is not http's default
        "url string").select(host_of(F.col("url")).alias("h")).collect()
    assert [r["h"] for r in rows] == [
        "example.org", "example.org", "example.org:8080",
        "notwww.example.org", "example.org:443"]


def test_host_stats_matches_pandas_replay(spark, fx_t1):
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    got = {r["host"]: (r["n_docs"], r["avg_quality"])
           for r in host_stats(snaps).collect()}
    from refined_spark.operators.textstats import with_quality

    pdf = (with_quality(snaps).select(
        host_of(F.col("url")).alias("host"), "quality_score").toPandas())
    grouped = pdf.groupby("host")["quality_score"].agg(["count", "mean"])
    assert len(got) == len(grouped) > 0
    for host, row in grouped.iterrows():
        n, avg = got[host]
        assert n == row["count"]
        assert avg == pytest.approx(row["mean"], abs=1e-12)


def test_drop_low_quality_hosts(spark, fx_t1):
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    bad = {r["host"] for r in
           low_quality_hosts(snaps, TAU, MIN_DOCS).collect()}
    assert bad, "no condemned hosts — gate vacuous; retune tau"
    kept = drop_low_quality_hosts(snaps, TAU, MIN_DOCS)
    assert kept.columns == snaps.columns  # schema preserved
    kept_hosts = {r["h"] for r in
                  kept.select(host_of(F.col("url")).alias("h")).collect()}
    assert not (kept_hosts & bad)
    # every non-condemned host survives in full
    assert kept.count() == snaps.count() - snaps.where(
        host_of(F.col("url")).isin(list(bad))).count()
    # min_docs guard is load-bearing: strictly more hosts condemned
    # without it
    bad_all = {r["host"] for r in
               low_quality_hosts(snaps, TAU, 1).collect()}
    assert bad < bad_all
    # idempotent: whole hosts are dropped, so survivor means are
    # unchanged and a second pass drops nothing
    assert drop_low_quality_hosts(kept, TAU, MIN_DOCS).count() \
        == kept.count()


def test_non_broadcast_parity(spark, fx_t1):
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    a = sorted(r["url"] for r in
               drop_low_quality_hosts(snaps, TAU, MIN_DOCS).collect())
    b = sorted(r["url"] for r in
               drop_low_quality_hosts(snaps, TAU, MIN_DOCS,
                                      broadcast_hosts=False).collect())
    assert a == b and a


def test_drop_preserves_caller_host_column(spark, fx_t1):
    """A caller column literally named '_host' must survive untouched —
    the helper column picks an unused name (schema-preserved contract)."""
    import os

    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet")).withColumn(
        "_host", F.lit("caller-owned"))
    out = drop_low_quality_hosts(snaps, TAU, MIN_DOCS)
    assert "_host" in out.columns
    assert {r["_host"] for r in out.select("_host").collect()} \
        == {"caller-owned"}
