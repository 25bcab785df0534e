"""Deterministic hash sampling (operators/sampling.py)."""

import os

import pyspark.sql.functions as F
import pytest

from refined_spark.operators.sampling import (
    deterministic_sample,
    rate_to_hex_threshold,
    stratified_sample,
)


def test_rate_threshold_edges():
    assert rate_to_hex_threshold(0.0) == "0" * 32
    assert rate_to_hex_threshold(1.0) == "g" * 32
    assert rate_to_hex_threshold(0.5) == "8" + "0" * 31
    assert rate_to_hex_threshold(0.25) == "4" + "0" * 31
    with pytest.raises(ValueError):
        rate_to_hex_threshold(1.5)


def test_sample_reproducible_nested_and_unbiased(spark, sf001):
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    n = docs.count()
    half = deterministic_sample(docs, 0.5, "doc_id")
    ids_a = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in half.select("doc_id").collect()}
    assert ids_a == ids_b  # reproducible across actions
    # unbiased within binomial noise (n small, wide tolerance)
    assert abs(len(ids_a) / n - 0.5) < 0.2
    # nested-subsample property: rate 0.25 ⊂ rate 0.5 (same salt)
    quarter = {r["doc_id"] for r in
               deterministic_sample(docs, 0.25, "doc_id")
               .select("doc_id").collect()}
    assert quarter <= ids_a
    # independent salt draws a different (overlapping-by-chance) sample
    other = {r["doc_id"] for r in
             deterministic_sample(docs, 0.5, "doc_id", salt="s1")
             .select("doc_id").collect()}
    assert other != ids_a


def test_stratified_rates_and_default_drop(spark, sf001):
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    out = stratified_sample(docs, {"de": 1.0, "en": 0.5}, "lang",
                            "doc_id")
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("de") == totals["de"]          # full keep
    assert 0 < by_lang.get("en", 0) < totals["en"]    # fractional
    for lang in totals:
        if lang not in ("de", "en"):
            assert lang not in by_lang                # default_rate=0

    # per-stratum selection equals the single-rate sample restricted to
    # the stratum (consistency of the CASE-chain compilation)
    en_only = {r["doc_id"] for r in
               deterministic_sample(docs.where(F.col("lang") == "en"),
                                    0.5, "doc_id")
               .select("doc_id").collect()}
    got_en = {r["doc_id"] for r in
              out.where(F.col("lang") == "en").select("doc_id").collect()}
    assert got_en == en_only


def test_map_only_plan(spark, sf001):
    """The sample must stay a scan-side filter: no exchange in the plan."""
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    plan = (deterministic_sample(docs, 0.5, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_sample_sql_rejects_quoted_salt():
    """sample_sql interpolates salt into a quoted literal; a salt
    containing a quote would make the SQL replay hash a DIFFERENT
    string than Spark's raw-salt predicate, so it is rejected."""
    import pytest

    from refined_spark.operators.sampling import sample_sql

    with pytest.raises(ValueError, match="quote-free"):
        sample_sql("doc_id", 0.5, salt="o'brien")
