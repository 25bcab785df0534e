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
    return (
        pairs.join(a, ["url_a", "start_a"])
        .join(b, ["url_b", "start_b"])
        .withColumn(col_name, (F.col("cid_a") == F.col("cid_b")))
        .drop("cid_a", "cid_b")
    )


def pairwise_f1(pairs: DataFrame, ours: DataFrame,
                reference: DataFrame) -> DataFrame:
    """pairs: gold_pairs (url_a, start_a, url_b, start_b, ...); ours /
    reference: (url, start, cluster_id). Returns a 1-row DataFrame:
    (tp, fp, fn, precision, recall, f1)."""
    flagged = _pair_flags(_pair_flags(pairs, ours, "pred_same"),
                          reference, "ref_same")
    agg = flagged.agg(
        F.sum((F.col("pred_same") & F.col("ref_same")).cast("long")).alias("tp"),
        F.sum((F.col("pred_same") & ~F.col("ref_same")).cast("long")).alias("fp"),
        F.sum((~F.col("pred_same") & F.col("ref_same")).cast("long")).alias("fn"),
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
