"""operators/quality_model.py — learned quality filtering.

Pins what the driver gates can't isolate: exact recovery of a planted
linear relationship through the full distributed-stats → driver-solve
path, the cross-engine featurization and scoring emitters, ridge
shrinkage direction, and the filter's schema contract.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from refined_spark.operators.quality_model import (drop_low_model_score,
                                                   feature_columns,
                                                   feature_sql,
                                                   fit_quality_model,
                                                   model_score,
                                                   model_score_sql,
                                                   solve_ridge,
                                                   sufficient_stats,
                                                   sufficient_stats_sql)

_DOCS = [
    # lengths span 9..~2600 chars: n_kchars must have real variance or
    # it is collinear with the intercept and the normal equations'
    # squared condition number turns last-bit partial-sum differences
    # into 1e-4 weight drift (observed — partition-count dependent)
    (0, "The quick brown fox jumps over the lazy dog!!"),
    (1, "pack my box with five dozen liquor jugs and the crate"),
    (2, "Sphinx of black quartz judge my vow today"),
    (3, "short one"),
    (4, "Punctuation, heavy; line: with, many, commas, and dots..."),
    (5, "a plain sentence of ordinary english words to read " * 12),
    (6, "MiXeD CaSe AnD 12345 numbers 678 to vary the alpha ratio "
        * 30),
    (7, "the the the of of to in and repeated stopword storm " * 50),
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_planted_linear_relationship_recovered_exactly(spark):
    """label = 0.7 + 2.1*alpha - 1.3*punct + 0.4*stop + 0.05*kchars
    (built from the SAME feature columns): the one-pass sufficient
    statistics + driver solve must recover the plant to numerical
    precision — the end-to-end correctness of the distributed fit."""
    feats = feature_columns()
    plant = {"one": 0.7, "n_kchars": 0.05, "alpha_ratio": 2.1,
             "punct_ratio": -1.3, "stop_ratio": 0.4}
    label = (F.lit(plant["one"])
             + F.lit(plant["n_kchars"]) * feats["n_kchars"]
             + F.lit(plant["alpha_ratio"]) * feats["alpha_ratio"]
             + F.lit(plant["punct_ratio"]) * feats["punct_ratio"]
             + F.lit(plant["stop_ratio"]) * feats["stop_ratio"])
    got = fit_quality_model(_df(spark), label, l2=0.0, round_to=None)
    # the first run of this test caught a real bug: fit_quality_model
    # swallowed its l2 argument (solver always ran at the 1e-6
    # default), shifting every weight ~1e-4
    for k, v in plant.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)
    pred = _df(spark).select(
        (model_score(got) - label).alias("err")).collect()
    assert all(abs(r.err) < 1e-9 for r in pred)


def test_sufficient_stats_matches_duckdb_replay(spark):
    sdf = sufficient_stats(_df(spark), feature_columns(),
                           F.length("text").cast("double") / 100.0)
    srow = sdf.first().asDict()
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", _DOCS)
    sql = sufficient_stats_sql("t", feature_sql(),
                               "length(text) / 100.0")
    orow = dict(zip([d[0] for d in con.execute(sql).description],
                    con.execute(sql).fetchone()))
    assert set(srow) == set(orow)
    for k in srow:
        assert srow[k] == pytest.approx(orow[k], abs=1e-9), k


def test_model_score_sql_parity_and_filter_contract(spark):
    w = {"one": 0.2, "n_kchars": 0.1, "alpha_ratio": 1.0,
         "punct_ratio": -2.0, "stop_ratio": 0.5}
    df = _df(spark).withColumn("extra", F.lit("x")).select(
        "text", "extra", "doc_id")  # id deliberately last
    scored = df.select(
        "doc_id", F.round(model_score(w), 6).alias("s")).collect()
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", _DOCS)
    osc = dict(con.execute(
        f"select doc_id, {model_score_sql(w)} from t").fetchall())
    for r in scored:
        assert r.s == pytest.approx(osc[r.doc_id], abs=1e-9)
    # midpoint between adjacent scores: a tau AT a score would make
    # the gate hang on last-bit cross-engine float agreement
    ranked = sorted(osc.values())
    tau = (ranked[3] + ranked[4]) / 2
    kept = drop_low_model_score(df, w, tau)
    assert kept.columns == df.columns
    want = sorted(i for i, s in osc.items() if s >= tau)
    assert sorted(r.doc_id for r in kept.collect()) == want


def test_solve_errors_are_diagnosable(spark):
    """Zero-row input (Spark sums → NULL) and a misspelled feature
    name must raise DISTINCT, readable errors — not float(None)."""
    empty = _df(spark).where("doc_id < 0")
    row = sufficient_stats(empty, feature_columns(),
                           F.lit(1.0), round_to=None).first().asDict()
    with pytest.raises(ValueError, match="no rows"):
        solve_ridge(row, list(feature_columns()))
    full = sufficient_stats(_df(spark), feature_columns(),
                            F.lit(1.0), round_to=None).first().asDict()
    with pytest.raises(KeyError, match="alpha_ratioo"):
        solve_ridge(full, ["alpha_ratioo"])


def test_ridge_shrinks_toward_zero():
    """Pure solver property on a hand-built stats row (2 points on
    y = x): l2=0 interpolates (slope 1), large l2 shrinks the slope."""
    row = {"s_one_one": 2.0, "s_one_f": 1.0, "s_one_label": 1.0,
           "s_f_f": 1.0, "s_f_label": 1.0, "s_label_label": 1.0}
    exact = solve_ridge(row, ["f"], l2=0.0)
    shrunk = solve_ridge(row, ["f"], l2=10.0)
    assert abs(exact["f"] - 1.0) < 1e-12
    assert 0.0 < shrunk["f"] < 0.2


def test_distillation_of_composite_quality_score(spark):
    """Fitting the textstats composite score: the learned linear model
    must correlate strongly on the training frame (the clipped terms
    make it inexact — this pins 'useful', not 'identical')."""
    from refined_spark.operators.textstats import with_quality

    docs = with_quality(_df(spark))
    w = fit_quality_model(docs, F.col("quality_score"))
    got = docs.select(
        "quality_score", model_score(w).alias("m")).collect()
    ys = [r.quality_score for r in got]
    ms = [r.m for r in got]
    my, mm = sum(ys) / len(ys), sum(ms) / len(ms)
    cov = sum((y - my) * (m - mm) for y, m in zip(ys, ms))
    vy = sum((y - my) ** 2 for y in ys) ** 0.5
    vm = sum((m - mm) ** 2 for m in ms) ** 0.5
    assert cov / (vy * vm) > 0.9
