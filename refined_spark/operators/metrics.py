"""A5 — evaluation metrics as DataFrame jobs.

Pairwise F1 over same-block mention pairs (the BASELINE.json gate):
compare OUR cluster partition against the reference-rule partition on the
labeled pair inventory, with tp/fp/fn computed exactly like the
reference's set-based Metrics monoid (/root/reference/src/refined/
evaluation/metrics.py:8-88) but over pairs:

    tp = pairs co-clustered in both; fp = ours only; fn = reference only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_flags(pairs: DataFrame, clusters: DataFrame,
                col_name: str) -> DataFrame:
    c = clusters.select(
        F.col("url"), F.col("start"), F.col("cluster_id")
    )
    a = c.select(F.col("url").alias("url_a"), F.col("start").alias("start_a"),
                 F.col("cluster_id").alias("cid_a"))
    b = c.select(F.col("url").alias("url_b"), F.col("start").alias("start_b"),
                 F.col("cluster_id").alias("cid_b"))
    # LEFT joins: a mention missing from the assignment (dropped by
    # span correction, dedup, a partial run ...) must count as
    # NOT-co-clustered for its pairs, not silently remove them from
    # the tp/fp/fn inventory — with inner joins a clustering that lost
    # half its mentions could still score F1=1.0 on the remainder
    # (r5 review; the BASELINE gate metric must see recall collapse)
    return (
        pairs.join(a, ["url_a", "start_a"], "left")
        .join(b, ["url_b", "start_b"], "left")
        .withColumn(col_name,
                    F.coalesce(F.col("cid_a") == F.col("cid_b"),
                               F.lit(False)))
        .drop("cid_a", "cid_b")
    )


def el_metrics(gold_spans: DataFrame, links: DataFrame,
               candidates: DataFrame) -> DataFrame:
    """A5/A6 — set-based gold-qcode EL metrics, the reference's primary
    correctness instrument (/root/reference/src/refined/evaluation/
    evaluation.py:19-126 + evaluation/metrics.py:38-88):

    gold set = {(url, start, gold_qcode)} for KB-annotated spans;
    pred set = {(url, start, pred_qcode)} for thresholded non-NIL links;
    tp/fp/fn over set intersection/differences; precision/recall/f1 with
    the reference's 1e-8 smoothing; accuracy = tp/num_gold; gold_recall =
    |gold qcode in span's candidate set| / num_gold.

    One full-outer join on the span key + one candidate semi-join, then a
    global single-row aggregate — all shuffles are metric-sized.
    """
    gold = (gold_spans
            .where(F.col("gold_qcode").isNotNull()
                   & (F.col("gold_qcode") != "Q0"))
            .select("url", "start", "gold_qcode"))
    pred = (links.where(F.col("pred_qcode").isNotNull())
            .select("url", "start", "pred_qcode"))
    in_cand = (gold.join(
        candidates.select("url", "start",
                          F.col("qcode").alias("gold_qcode")).distinct(),
        ["url", "start", "gold_qcode"], "left_semi")
        .agg(F.count(F.lit(1)).alias("gold_entity_in_cand")))
    flags = gold.join(pred, ["url", "start"], "full_outer").select(
        (F.col("gold_qcode") == F.col("pred_qcode")).alias("hit"),
        F.col("gold_qcode").isNotNull().alias("has_gold"),
        F.col("pred_qcode").isNotNull().alias("has_pred"),
    )
    agg = flags.agg(
        F.sum(F.col("has_gold").cast("long")).alias("num_gold_spans"),
        F.sum((F.coalesce("hit", F.lit(False))).cast("long")).alias("tp"),
        F.sum((F.col("has_pred")
               & ~F.coalesce("hit", F.lit(False))).cast("long")).alias("fp"),
        F.sum((F.col("has_gold")
               & ~F.coalesce("hit", F.lit(False))).cast("long")).alias("fn"),
    )
    eps = F.lit(1e-8)
    p = F.col("tp") / (F.col("tp") + F.col("fp") + eps)
    r = F.col("tp") / (F.col("tp") + F.col("fn") + eps)
    return agg.crossJoin(in_cand).select(
        "num_gold_spans", "tp", "fp", "fn", "gold_entity_in_cand",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(2.0 * p * r / (p + r + eps), 6).alias("f1"),
        F.round(F.col("tp") / (F.col("num_gold_spans") + eps), 6)
        .alias("accuracy"),
        F.round(F.col("gold_entity_in_cand")
                / (F.col("num_gold_spans") + eps), 6).alias("gold_recall"),
    )


def pairwise_f1(pairs: DataFrame, ours: DataFrame,
                reference: DataFrame) -> DataFrame:
    """pairs: gold_pairs (url_a, start_a, url_b, start_b, ...); ours /
    reference: (url, start, cluster_id). Returns a 1-row DataFrame:
    (tp, fp, fn, precision, recall, f1)."""
    flagged = _pair_flags(_pair_flags(pairs, ours, "pred_same"),
                          reference, "ref_same")
    # coalesce to the monoid's zeros(): sum over zero pairs is NULL,
    # and a NULL f1 poisons any >= gate comparison downstream
    agg = flagged.agg(
        F.coalesce(F.sum((F.col("pred_same") & F.col("ref_same"))
                         .cast("long")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum((F.col("pred_same") & ~F.col("ref_same"))
                         .cast("long")), F.lit(0)).alias("fp"),
        F.coalesce(F.sum((~F.col("pred_same") & F.col("ref_same"))
                         .cast("long")), F.lit(0)).alias("fn"),
    )
    return agg.select(
        "tp", "fp", "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
         ).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
         ).alias("recall"),
        (F.lit(2.0) * F.col("tp")
         / F.greatest(F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
                      F.lit(1))).alias("f1"),
    )


def link_errors(gold_spans: DataFrame, links: DataFrame) -> DataFrame:
    """Per-prediction error table — the reference's error-analysis log
    (my_tests/error_analysis.py: per-sample input / predicted QID /
    ground truth / confidence CSV) as a DataFrame job. One row per
    KB-annotated gold span:

      error_type = 'correct'       pred == gold
                   'wrong_entity'  pred non-NIL but != gold
                   'missed'        pred NIL (below threshold / NOTA),
                                   gold annotated

    plus the spurious predictions (pred non-NIL on a span with no KB
    annotation) as 'spurious' rows with NULL gold_qcode. One span-key
    full-outer join — the shuffle is mention-scale with key-width rows;
    document text never enters (join mention_text downstream if a human
    is reading the sample)."""
    gold = (gold_spans
            .where(F.col("gold_qcode").isNotNull()
                   & (F.col("gold_qcode") != "Q0"))
            .select("url", "start", "gold_qcode"))
    pred = links.select("url", "start", "pred_qcode", "confidence")
    j = gold.join(pred, ["url", "start"], "full_outer")
    error_type = (
        F.when(F.col("gold_qcode").isNull()
               & F.col("pred_qcode").isNotNull(), F.lit("spurious"))
        .when(F.col("gold_qcode").isNull(), F.lit(None))
        .when(F.col("pred_qcode").isNull(), F.lit("missed"))
        .when(F.col("pred_qcode") == F.col("gold_qcode"),
              F.lit("correct"))
        .otherwise(F.lit("wrong_entity")))
    return (j.withColumn("error_type", error_type)
            .where(F.col("error_type").isNotNull())
            .select("url", "start", "gold_qcode", "pred_qcode",
                    "confidence", "error_type"))


def pr_curve(gold_spans: DataFrame, links: DataFrame,
             bucket_decimals: int = 4) -> DataFrame:
    """Precision/recall as a function of the ED confidence threshold —
    the reference's PR-curve instrument (my_tests/pr_curve.py sweeps
    sklearn.precision_recall_curve over logged confidences). One row per
    distinct confidence bucket t (descending):

      n_pred / n_correct   cumulative predictions (conf >= t) and hits
      precision            n_correct / n_pred
      recall               n_correct / num_gold

    Scale shape: the naive form (a global sort + running sum over every
    prediction) is a single-task window at corpus scale. Instead
    predictions partial-aggregate per ROUNDED confidence bucket
    (map-side combine; <= 10^bucket_decimals+1 buckets regardless of
    corpus size), and the cumulative runs as a window over the tiny
    bucket frame — the same counts-frame shape as dense_index's offset
    pass. num_gold is one scalar broadcast into the projection."""
    from pyspark.sql import Window

    gold = (gold_spans
            .where(F.col("gold_qcode").isNotNull()
                   & (F.col("gold_qcode") != "Q0"))
            .select("url", "start", "gold_qcode"))
    pred = (links.where(F.col("pred_qcode").isNotNull())
            .select("url", "start", "pred_qcode", "confidence"))
    j = pred.join(gold, ["url", "start"], "left")
    per_bucket = (j.select(
        F.round("confidence", bucket_decimals).alias("threshold"),
        (F.col("gold_qcode").isNotNull()
         & (F.col("pred_qcode") == F.col("gold_qcode")))
        .cast("long").alias("hit"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("b_pred"),
             F.sum("hit").alias("b_correct")))
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, 0)  # tiny bucket frame (see above)
    n_gold = gold.count()
    return (per_bucket
            .withColumn("n_pred", F.sum("b_pred").over(w))
            .withColumn("n_correct", F.sum("b_correct").over(w))
            .select(
                "threshold", "n_pred", "n_correct",
                F.round(F.col("n_correct") / F.col("n_pred"), 6)
                .alias("precision"),
                F.round(F.col("n_correct") / F.lit(max(n_gold, 1)), 6)
                .alias("recall"))
            .orderBy(F.col("threshold").desc()))
