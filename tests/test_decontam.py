"""Benchmark decontamination (operators/decontam.py)."""

import os
import re

import pyspark.sql.functions as F

from refined_spark.operators.decontam import (
    benchmark_ngrams,
    contaminated_ids,
    drop_contaminated,
)
from refined_spark.operators.lm_quality import TOKEN_RE


def _grams(text, n):
    ws = re.findall(TOKEN_RE, text.lower())
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_matches_python_replay_on_fixture_corpus(spark, fx_t1):
    n = 8
    docs = spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))
    bench = spark.read.parquet(os.path.join(fx_t1, "benchmark.parquet"))
    got = {r["url"]: r["n_hit_grams"]
           for r in contaminated_ids(docs, benchmark_ngrams(bench, n), n,
                                     id_col="url").collect()}
    bg = set()
    for r in bench.collect():
        bg |= _grams(r["text"], n)
    want = {}
    for r in docs.select("url", "text").collect():
        hits = _grams(r["text"], n) & bg
        if hits:
            want[r["url"]] = len(hits)
    assert got == want
    assert want, "fixture must contaminate at least one doc"


def test_short_docs_and_clean_bench_rows(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"),                       # < n tokens
         (1, "alpha beta gamma delta epsilon zeta"),    # contaminated
         (2, "one two three four five six")],           # clean
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(0, "Q: alpha beta gamma delta epsilon zeta A:"),
         (1, "nothing shared here at all truly")],
        "bench_id int, text string")
    ids = contaminated_ids(docs, benchmark_ngrams(bench, 6), 6).collect()
    assert [(r["doc_id"], r["n_hit_grams"]) for r in ids] == [(1, 1)]
    kept = drop_contaminated(docs, bench, 6)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]
    assert kept.columns == docs.columns


def test_normalization_is_case_and_punct_insensitive(spark):
    docs = spark.createDataFrame(
        [(0, "The QUICK (brown) fox-jumps over the lazy dog!")],
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy")],
        "bench_id int, text string")
    assert contaminated_ids(docs, benchmark_ngrams(bench, 8), 8).count() == 1


def test_bench_side_distinct_and_multi_row_hits(spark):
    # the doc shares gram G1 with BOTH bench rows and G2 with one;
    # n_hit_grams counts DISTINCT grams (2), not occurrences (3)
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i")], "doc_id int, text string")
    bench = spark.createDataFrame(
        [(0, "x a b c d e f g h y"), (1, "z a b c d e f g h i")],
        "bench_id int, text string")
    r = contaminated_ids(docs, benchmark_ngrams(bench, 8), 8).collect()
    assert [(x["doc_id"], x["n_hit_grams"]) for x in r] == [(0, 2)]


def test_broadcast_and_shuffle_paths_agree(spark, fx_t1):
    n = 8
    docs = spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))
    bench = spark.read.parquet(os.path.join(fx_t1, "benchmark.parquet"))
    bg = benchmark_ngrams(bench, n)
    a = contaminated_ids(docs, bg, n, id_col="url",
                         broadcast_bench=True)
    b = contaminated_ids(docs, bg, n, id_col="url",
                         broadcast_bench=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_corpus_side_no_exchange_before_join(spark, fx_t1):
    """Corpus text must not shuffle: with the benchmark side broadcast,
    the only Exchange in the plan is the per-doc hit aggregation (and
    the broadcast side's own distinct) — matched rows, never text."""
    n = 8
    docs = spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))
    bench = spark.read.parquet(os.path.join(fx_t1, "benchmark.parquet"))
    plan = (contaminated_ids(docs, benchmark_ngrams(bench, n), n,
                             id_col="url")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the corpus scan-to-join segment carries no 'text' past an exchange:
    # every shuffle key set in the plan is (gram) or (url)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line
