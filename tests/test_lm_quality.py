"""CCNet-style unigram LM perplexity scoring (operators/lm_quality.py)."""

import math
import os
from collections import Counter

import pyspark.sql.functions as F
import pytest

from refined_spark.operators.lm_quality import (
    TOKEN_RE,
    drop_high_perplexity,
    unigram_lm,
    with_lm_score,
)


def test_lm_score_matches_python_replay(spark, sf001):
    import re

    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    lm = unigram_lm(docs)
    got = {r["doc_id"]: (r["n_tokens"], r["lm_score"])
           for r in with_lm_score(docs, lm).collect()}

    rows = docs.select("doc_id", "text").collect()
    tok = lambda t: re.findall(TOKEN_RE, t.lower())  # noqa: E731
    counts = Counter(w for r in rows for w in tok(r["text"]))
    total = sum(counts.values())
    for r in rows:
        ws = tok(r["text"])
        if not ws:
            assert r["doc_id"] not in got
            continue
        want = -sum(math.log(counts[w] / total) for w in ws) / len(ws)
        n, score = got[r["doc_id"]]
        assert n == len(ws)
        assert score == pytest.approx(want, rel=1e-9)


def test_oov_floor_and_fluency_ordering(spark, sf001):
    """A held-out gibberish doc (all OOV) scores the −ln(1/total) floor
    exactly and above every in-domain doc; scoring corpus != training
    corpus exercises the CCNet role split."""
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    lm = unigram_lm(docs)
    total = lm.agg(F.first("total")).collect()[0][0]
    held_out = spark.createDataFrame(
        [("x1", "zq9k vvxw qqj zzzpt"), ("x2", "the of and to in")],
        "doc_id string, text string")
    got = {r["doc_id"]: r["lm_score"]
           for r in with_lm_score(held_out, lm).collect()}
    assert got["x1"] == pytest.approx(-math.log(1.0 / total), rel=1e-12)
    # stopword-only doc is strictly more fluent under the corpus LM
    assert got["x2"] < got["x1"]


def test_drop_high_perplexity(spark, sf001):
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    gibberish = spark.createDataFrame(
        [(-1, "zq9k vvxw qqj zzzpt wqx"), (-2, "")],
        "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(gibberish)
    lm = unigram_lm(docs)
    scores = with_lm_score(corpus, lm)
    tau = scores.where(F.col("doc_id") >= 0) \
        .agg(F.max("lm_score")).collect()[0][0]
    kept = drop_high_perplexity(corpus, lm, tau)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert -1 not in ids            # tail cut
    assert -2 not in ids            # token-free -> dropped
    assert len(ids) == docs.count()  # everyone else survives
    assert kept.columns == corpus.columns


def test_broadcast_and_shuffle_paths_agree(spark, sf001):
    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    lm = unigram_lm(docs)
    a = {r["doc_id"]: r["lm_score"]
         for r in with_lm_score(docs, lm, broadcast_lm=True).collect()}
    b = {r["doc_id"]: r["lm_score"]
         for r in with_lm_score(docs, lm, broadcast_lm=False).collect()}
    assert set(a) == set(b) and a
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)
