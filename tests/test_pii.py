"""PII detection + redaction (operators/pii.py)."""

import os
import re

import pyspark.sql.functions as F

from refined_spark.operators.pii import PATTERNS, redact_pii, with_pii


def _replay(text):
    """Sequential Python replay of the ordered PATTERNS contract."""
    counts, cur = {}, text
    for name, pat, token in PATTERNS:
        counts[name] = len(re.findall(pat, cur))
        cur = re.sub(pat, token, cur)
    return counts, cur


def test_matches_python_replay_on_fixture_corpus(spark, fx_t1):
    docs = spark.read.parquet(os.path.join(fx_t1, "pii_docs.parquet"))
    got = {r["doc_id"]: r for r in with_pii(docs).collect()}
    for r in docs.collect():
        counts, red = _replay(r["text"])
        g = got[r["doc_id"]]
        assert (g["n_email"], g["n_ip"], g["n_phone"]) == (
            counts["email"], counts["ip"], counts["phone"])
        assert g["redacted"] == red
        assert g["has_pii"] == (sum(counts.values()) > 0)


def test_sequential_semantics_and_edges(spark):
    rows = [
        # IP-shaped email domain: the email stage eats it, n_ip = 0
        (0, "mail admin@10.0.3.9.net now"),
        # 4-digit octet defeats the word boundary — not an IP
        (1, "version 999.999.999.9999 shipped"),
        # both phone separator shapes; IP in punctuation context
        (2, "call 555-123-4567 or 555 123 4567 from (10.0.0.1)."),
        # PII at string start and end
        (3, "a@b.io mid words 10.1.2.3"),
        (4, "no pii here"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in with_pii(df).collect()}
    assert (got[0]["n_email"], got[0]["n_ip"]) == (1, 0)
    assert got[0]["redacted"] == "mail <EMAIL> now"
    assert got[1]["n_ip"] == 0 and not got[1]["has_pii"]
    assert got[2]["n_phone"] == 2 and got[2]["n_ip"] == 1
    assert got[3]["redacted"] == "<EMAIL> mid words <IP>"
    assert not got[4]["has_pii"] and not got[5]["has_pii"]
    assert got[5]["redacted"] == ""


def test_redact_pii_preserves_schema_and_scrubs_in_place(spark, fx_t1):
    docs = spark.read.parquet(os.path.join(fx_t1, "pii_docs.parquet"))
    out = redact_pii(docs)
    assert out.columns == docs.columns
    # idempotent: a scrubbed corpus has nothing left to scrub
    again = redact_pii(out)
    assert out.exceptAll(again).count() == 0
    for _, pat, _ in PATTERNS:
        assert out.where(F.col("text").rlike(pat)).count() == 0


def test_no_exchange_in_plan(spark, fx_t1):
    docs = spark.read.parquet(os.path.join(fx_t1, "pii_docs.parquet"))
    plan = with_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
