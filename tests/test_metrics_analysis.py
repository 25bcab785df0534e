"""A5 analysis instruments: per-prediction error table + PR-curve sweep
(operators/metrics.py link_errors / pr_curve — reference analogs
my_tests/error_analysis.py and my_tests/pr_curve.py)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from refined_spark.operators.metrics import link_errors, pr_curve


def _frames(spark, fx_t1):
    gold = spark.read.parquet(os.path.join(fx_t1, "gold_spans.parquet"))
    links = spark.read.parquet(
        os.path.join(fx_t1, "expected_links.parquet"))
    return gold, links


def test_link_errors_partition_and_consistency(spark, fx_t1):
    """Every KB-annotated gold span lands in exactly one of
    correct/wrong_entity/missed; counts tie out against el_metrics-style
    set arithmetic computed independently in pandas."""
    gold, links = _frames(spark, fx_t1)
    err = link_errors(gold, links).toPandas()
    g = gold.toPandas()
    g = g[g["gold_qcode"].notna() & (g["gold_qcode"] != "Q0")]
    p = links.toPandas()

    by_type = err.groupby("error_type").size().to_dict()
    # partition of the gold universe
    assert (by_type.get("correct", 0) + by_type.get("wrong_entity", 0)
            + by_type.get("missed", 0)) == len(g)
    # independent pandas replay
    m = g.merge(p, on=["url", "start"], how="left")
    assert by_type.get("correct", 0) == int(
        (m["pred_qcode"] == m["gold_qcode"]).sum())
    assert by_type.get("missed", 0) == int(m["pred_qcode"].isna().sum())
    # non-vacuous: the fixture linker is imperfect on purpose
    assert by_type.get("correct", 0) > 0
    assert by_type.get("missed", 0) + by_type.get("wrong_entity", 0) > 0


def test_pr_curve_matches_bruteforce(spark, fx_t1):
    """The bucketed cumulative curve equals a brute-force sweep done in
    pandas at every bucket threshold, and recall is monotone
    non-increasing in the threshold."""
    gold, links = _frames(spark, fx_t1)
    curve = pr_curve(gold, links).toPandas()
    assert len(curve) > 3
    g = gold.toPandas()
    g = g[g["gold_qcode"].notna() & (g["gold_qcode"] != "Q0")]
    p = links.toPandas()
    p = p[p["pred_qcode"].notna()].copy()
    p["threshold"] = p["confidence"].round(4)
    m = p.merge(g, on=["url", "start"], how="left")
    m["hit"] = (m["pred_qcode"] == m["gold_qcode"]).astype(int)
    for _, row in curve.iterrows():
        sel = m[m["threshold"] >= row["threshold"]]
        assert row["n_pred"] == len(sel)
        assert row["n_correct"] == int(sel["hit"].sum())
        assert row["precision"] == pytest.approx(
            round(sel["hit"].sum() / len(sel), 6), abs=1e-9)
        assert row["recall"] == pytest.approx(
            round(sel["hit"].sum() / max(len(g), 1), 6), abs=1e-9)
    # thresholds descending -> n_pred/recall non-decreasing down the frame
    assert (np.diff(curve["n_pred"].to_numpy()) >= 0).all()
    assert (np.diff(curve["recall"].to_numpy()) >= -1e-12).all()
