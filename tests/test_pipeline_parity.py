"""The correctness core: Spark pipeline vs the row-at-a-time NumPy oracle
(the 'reference rule'), per-stage and end-to-end (pairwise F1 >= 0.99)."""

import os

import pytest

from refined_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(spark, fx_t1):
    return run_pipeline(spark, fx_t1, mode="spans")


def _rows(df, cols, sort_cols=None):
    sort_cols = sort_cols or cols
    return [tuple(r[c] for c in cols)
            for r in df.orderBy(*sort_cols).collect()]


def test_candidates_match_oracle(spark, fx_t1, result):
    exp = spark.read.parquet(os.path.join(fx_t1, "expected_candidates.parquet"))
    cols = ["url", "start", "qcode", "cand_source", "cand_rank"]
    got = _rows(result["candidates"], cols)
    want = _rows(exp, cols)
    assert got == want
    # probabilities too (exact: both sides read the same pem doubles)
    gotp = _rows(result["candidates"], ["url", "start", "qcode", "prob"])
    wantp = _rows(exp, ["url", "start", "qcode", "prob"])
    assert gotp == wantp


def test_links_match_oracle(spark, fx_t1, result):
    exp = spark.read.parquet(os.path.join(fx_t1, "expected_links.parquet"))
    got = _rows(result["links"], ["url", "start", "pred_qcode"])
    want = _rows(exp, ["url", "start", "pred_qcode"])
    assert got == want
    # confidences within fp tolerance (different summation orders)
    gotc = dict(((r["url"], r["start"]), r["confidence"])
                for r in result["links"].collect())
    for r in exp.collect():
        assert abs(gotc[(r["url"], r["start"])] - r["confidence"]) < 1e-6


def test_clusters_match_oracle(spark, fx_t1, result):
    exp = spark.read.parquet(os.path.join(fx_t1, "expected_clusters.parquet"))
    got = _rows(result["clusters"], ["url", "start", "cluster_id"])
    want = _rows(exp, ["url", "start", "cluster_id"])
    assert got == want


def test_pairwise_f1_gate(spark, fx_t2):
    """THE gate: F1 >= 0.99 vs reference-rule clusters on same-block pairs,
    at the t2 (sf0.01-equivalent) tier."""
    from refined_spark.operators.metrics import pairwise_f1

    res = run_pipeline(spark, fx_t2, mode="spans")
    exp = spark.read.parquet(os.path.join(fx_t2, "expected_clusters.parquet"))
    pairs = res["tables"]["gold_pairs"]
    row = pairwise_f1(pairs, res["clusters"], exp).collect()[0]
    assert row["f1"] >= 0.99, dict(row.asDict())


def test_e2e_mode_finds_matchable_mentions(spark, fx_t1):
    res = run_pipeline(spark, fx_t1, mode="e2e")
    gold = spark.read.parquet(os.path.join(fx_t1, "gold_spans.parquet"))
    got = {(r["url"], r["start"], r["length"])
           for r in res["mentions"].collect()}
    want = {(r["url"], r["start"], r["length"])
            for r in gold.where("dict_matchable").collect()}
    assert got == want

def test_fused_detect_equals_composed_path(spark, fx_t1):
    """fused_extract_detect (one Arrow crossing) must be row-identical to
    extract -> detect_mentions -> attach_context -> normalize."""
    import pyspark.sql.functions as F

    from refined_spark.operators.extract import with_extracted_text
    from refined_spark.operators.mentions import (
        detect_mentions,
        fused_extract_detect,
    )
    from refined_spark.pipeline import load_tables, match_dictionary

    t = load_tables(spark, fx_t1)
    keys = match_dictionary(t["pem"], t["entity"])
    docs = with_extracted_text(t["documents"]).withColumn(
        "text", F.col("extracted")).drop("extracted")
    composed = {tuple(r) for r in detect_mentions(spark, docs, keys)
                .select("url", "start", "length", "mention_text", "norm_sf",
                        "ctx_word", "mention_key").collect()}
    fused = {tuple(r) for r in fused_extract_detect(
        spark, t["documents"], keys)
        .select("url", "start", "length", "mention_text", "norm_sf",
                "ctx_word", "mention_key").collect()}
    assert fused == composed
