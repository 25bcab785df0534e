"""E1 extraction — the byte-identical per-url invariant (BASELINE.json
input_hint). Golden source: fixture documents carry both html and the
ground-truth text; extractor output must equal text for EVERY row."""

import duckdb

from refined_spark.operators.extract import extract_text, with_extracted_text


def test_extract_basics():
    assert extract_text(b"<html><body><p>a b</p><p>c</p></body></html>") == "a b\nc"
    assert extract_text(b"<p>x &amp; y</p>") == "x & y"
    assert extract_text(b"<p>a <b>bold</b> c</p>") == "a bold c"
    assert extract_text(b"<p>a</p><script>var x=1;</script><p>b</p>") == "a\nb"
    assert extract_text(b"<p>  spaced   out  </p>") == "spaced out"
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_extract_byte_identical_python(fx_t1):
    rows = duckdb.sql(
        f"select url, html, text from read_parquet('{fx_t1}/documents.parquet')"
    ).fetchall()
    assert len(rows) > 0
    for url, html, text in rows:
        assert extract_text(html) == text, url


def test_extract_byte_identical_spark(spark, fx_t1):
    docs = spark.read.parquet(f"{fx_t1}/documents.parquet")
    out = with_extracted_text(docs)
    mismatches = out.filter("extracted <> text").count()
    assert mismatches == 0
    assert out.count() == docs.count()
