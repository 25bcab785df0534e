"""operators/urlfilter.py — URL/domain blocklist filtering.

Pins what the gate can't isolate: the registered-domain rule matrix
(multi-suffix, IP, single-label, ports, aliases), cross-engine parity
of the emitted SQL, subdomain inheritance, the registered-domain-only
matching contract, the audit/drop partition, broadcast/shuffle parity,
the C4 bad-word rule, and the helper-column collision guard.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from refined_spark.operators.urlfilter import (blocked_docs,
                                               drop_blocked_domains,
                                               drop_blocked_url_patterns,
                                               registered_domain,
                                               registered_domain_sql,
                                               url_badword_pattern,
                                               with_registered_domain)

RULE_MATRIX = [
    ("https://www.example.org/p", "example.org"),
    ("https://a.b.example.org/p", "example.org"),
    ("HTTP://NEWS.EXAMPLE.ORG:80/x", "example.org"),
    ("https://shop.co.uk/", "shop.co.uk"),
    ("https://www.deep.shop.co.uk/", "shop.co.uk"),
    ("https://ac.uk/", "ac.uk"),                 # suffix AS the host
    ("https://example.org:8080/p", "example.org"),  # any port strips
    ("https://localhost/x", "localhost"),
    ("https://192.168.10.1:8443/x", "192.168.10.1"),
    ("https://example.com.au/", "example.com.au"),
]


def _df(spark, urls):
    return spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                 "doc_id long, url string")


def test_registered_domain_rule_matrix(spark):
    urls = [u for u, _ in RULE_MATRIX]
    got = [r.d for r in _df(spark, urls).select(
        registered_domain(F.col("url")).alias("d"))
        .orderBy("doc_id").collect()]
    assert got == [d for _, d in RULE_MATRIX]


def test_sql_replay_parity(spark):
    """The emitted DuckDB expression returns byte-identical domains on
    the full rule matrix."""
    urls = [u for u, _ in RULE_MATRIX]
    con = duckdb.connect()
    con.execute("create table t(url varchar)")
    con.executemany("insert into t values (?)", [(u,) for u in urls])
    sql_got = [r[0] for r in con.execute(
        f"select {registered_domain_sql('url')} from t").fetchall()]
    assert sql_got == [d for _, d in RULE_MATRIX]


def _blocklist(spark):
    return spark.createDataFrame(
        [("example.org", "ads"), ("bad.co.uk", "spam"),
         ("full.host.example.net", "malware")],
        "domain string, category string")


def test_subdomain_inheritance_and_host_entries_never_match(spark):
    docs = _df(spark, [
        "https://ads.tracker.example.org/x",   # drops via example.org
        "https://www.example.org/y",           # drops
        "https://sub.bad.co.uk/z",             # drops via multi-suffix
        "https://full.host.example.net/a",     # registered=example.net
        "https://keep.example.net/b",          # kept
    ])
    kept = drop_blocked_domains(docs, _blocklist(spark))
    assert sorted(r.doc_id for r in kept.collect()) == [3, 4]
    # the full-host list row matched NOTHING — matching is
    # registered-domain-only
    audit = blocked_docs(docs, _blocklist(spark)).collect()
    assert all(r.matched_domain != "full.host.example.net"
               for r in audit)
    assert {r.category for r in audit} == {"ads", "spam"}


def test_drop_and_audit_partition_corpus(spark):
    docs = _df(spark, [u for u, _ in RULE_MATRIX])
    bl = _blocklist(spark)
    kept = {r.doc_id for r in drop_blocked_domains(docs, bl).collect()}
    blocked = {r.doc_id for r in blocked_docs(docs, bl).collect()}
    assert kept | blocked == set(range(len(RULE_MATRIX)))
    assert kept & blocked == set()


def test_broadcast_shuffle_parity(spark):
    docs = _df(spark, [u for u, _ in RULE_MATRIX])
    bl = _blocklist(spark)
    a = drop_blocked_domains(docs, bl, broadcast_list=True)
    b = drop_blocked_domains(docs, bl, broadcast_list=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_preserved_and_helper_collision(spark):
    docs = _df(spark, ["https://x.example.org/p"]).withColumn(
        "_domain", F.lit("caller-owned"))
    out = drop_blocked_domains(docs, _blocklist(spark).where(
        F.col("domain") == "nomatch.example"))
    assert out.columns == docs.columns
    assert out.collect()[0]._domain == "caller-owned"


def test_badword_url_cut(spark):
    docs = _df(spark, [
        "https://example.org/casino-games",
        "https://example.org/CASINO",         # case-insensitive
        "https://example.org/c.a.s.i.n.o",    # metachars must not match
        "https://example.org/fine",
    ])
    kept = drop_blocked_url_patterns(docs, ["casino", "a+b"])
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    with pytest.raises(ValueError, match="empty"):
        url_badword_pattern([])


def test_with_registered_domain_column(spark):
    out = with_registered_domain(
        _df(spark, ["https://www.a.example.org/"]))
    assert out.columns == ["doc_id", "url", "domain"]
    assert out.collect()[0].domain == "example.org"
