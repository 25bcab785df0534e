"""S7/A6/A7/A8 — CSV table entity-linking (the fork's table-linking flow).

Re-creates the reference fork's table mode end-to-end:

- CSV scan → per-cell text (+ row context column), my_tests/datasets.py:
  122-201 (cell mode) / my_tests/utility/process_files.py:8-19 (row-concat
  mode),
- per-cell candidate generation over the broadcast PEM alias table and
  deterministic scoring (prior + context-class overlap — the no-encoder
  configuration; the transformer scorer is the pipeline's F3/F6 path),
- A8: top-k candidates per cell with match flags
  (api/app/services/job_service.py:143-179),
- A6: accuracy/P/R/F1 vs ground-truth qids incl. NIL protocol
  (my_tests/accuracy.py:17-89),
- A7: per-column coarse-type majority (job_service.py:194-229).

Spark-native notes: tables carry an EXPLICIT row key column — positional
row ids do not survive distributed scans, so the engine requires them in
the input contract (the reference enumerates pandas rows in-process).
Table files are many small CSVs: one scan, `input_file_name()` provides
the table id; everything else is broadcast-dimension joins + per-cell
windows — the cell table never shuffles more than once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.normalize import normalize_col

CELL_SCHEMA = "row INT, cell STRING, ctx STRING, noise STRING"


def read_tables(spark: SparkSession, csv_dir: str) -> DataFrame:
    """Directory of headerless CSVs -> (table_id, row, cell, ctx)."""
    df = spark.read.schema(CELL_SCHEMA).csv(os.path.join(csv_dir, "*.csv"))
    table_id = F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1)
    return df.select(table_id.alias("table_id"), "row", "cell", "ctx")


def score_table_cells(cells: DataFrame, pem: DataFrame, entity: DataFrame,
                      topic_class: DataFrame,
                      weights: dict[str, float]) -> DataFrame:
    """Candidates + deterministic score per cell:
    score = w_pem * prior + w_class_overlap * [ctx topic class in entity
    classes]. Returns one row per (cell, candidate)."""
    c = cells.withColumn("norm_sf", normalize_col(F.col("cell")))
    cand = c.join(F.broadcast(pem.withColumnRenamed("surface_form",
                                                    "norm_sf")),
                  "norm_sf", "left")
    ent = F.broadcast(entity.select("qcode", "class_idx", "is_human"))
    t = F.broadcast(topic_class.withColumnRenamed("topic", "ctx")
                    .withColumnRenamed("class_idx", "t_class_idx"))
    j = cand.join(ent, "qcode", "left").join(t, "ctx", "left")
    overlap = (
        F.when(F.col("t_class_idx").isNull() | F.col("class_idx").isNull(),
               F.lit(0.0))
        .otherwise(F.array_contains(
            "class_idx", F.col("t_class_idx").cast("smallint"))
            .cast("double"))
    )
    score = (F.lit(weights["pem"]) * F.col("prob")
             + F.lit(weights["class_overlap"]) * overlap)
    return j.select(
        "table_id", "row", "cell", "ctx", "qcode", "prob", "rank",
        "is_human", score.alias("score"),
    )


def link_table_cells(scored: DataFrame) -> DataFrame:
    """Per-cell argmax -> (table_id, row, pred_qcode, pred_is_human);
    cells with no candidates keep a NULL prediction."""
    w = Window.partitionBy("table_id", "row").orderBy(
        F.desc_nulls_last("score"), F.asc_nulls_last("rank"),
        F.asc_nulls_last("qcode"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("table_id", "row",
                F.col("qcode").alias("pred_qcode"),
                F.col("is_human").alias("pred_is_human"))
    )


def table_topk(scored: DataFrame, linked: DataFrame, k: int = 3
               ) -> DataFrame:
    """A8 — top-k candidates per cell with the API's match flag
    (job_service.py:156: candidate == predicted, else first candidate
    when nothing is predicted)."""
    w = Window.partitionBy("table_id", "row").orderBy(
        F.desc("score"), F.asc("rank"), F.asc("qcode"))
    top = (scored.where(F.col("qcode").isNotNull())
           .withColumn("cand_rank", F.row_number().over(w))
           .where(F.col("cand_rank") <= k))
    j = top.join(linked.select("table_id", "row", "pred_qcode"),
                 ["table_id", "row"], "left")
    match = F.when(F.col("pred_qcode").isNotNull(),
                   F.col("qcode") == F.col("pred_qcode")) \
        .otherwise(F.col("cand_rank") == 1)
    return j.select("table_id", "row", "cand_rank", "qcode",
                    match.alias("match"))


def table_accuracy(linked: DataFrame, gt: DataFrame) -> DataFrame:
    """A6 — the fork's accuracy metric (my_tests/accuracy.py:17-89):
    per GT cell, prediction counts as NIL when absent; match when the
    predicted qid is in the truth list (or both NIL); fp only for non-NIL
    wrong predictions. Returns one row of metrics."""
    # reference parity (accuracy.py:26 'if not truth_qids: continue'):
    # GT rows with NULL/empty truth are SKIPPED entirely — counting
    # them inflated total/fn, and a NULL qid row fell out of tp/fn
    # sums while still denominating total (r5 review)
    g = (gt.where(F.col("qid").isNotNull() & (F.trim("qid") != ""))
         .withColumn("qids", F.split("qid", " ")))
    j = g.join(linked, ["table_id", "row"], "left")
    pred = F.coalesce("pred_qcode", F.lit("NIL"))
    is_match = F.array_contains("qids", pred)
    agg = j.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(is_match.cast("long")).alias("tp"),
        F.sum((~is_match).cast("long")).alias("fn"),
        F.sum(((pred != "NIL") & ~F.array_contains("qids", pred))
              .cast("long")).alias("fp"),
    )
    eps = F.lit(1e-8)
    p = F.col("tp") / (F.col("tp") + F.col("fp") + eps)
    r = F.col("tp") / (F.col("tp") + F.col("fn") + eps)
    return agg.select(
        "total", "tp", "fp", "fn",
        F.round(F.col("tp") / (F.col("total") + eps), 6).alias("accuracy"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(2.0 * p * r / (p + r + eps), 6).alias("f1"),
    )


def column_coarse_majority(linked: DataFrame) -> DataFrame:
    """A7 — most frequent coarse type of the target column per table
    (job_service.py:194-229). Deterministic coarse stand-in: PERSON for
    human entities, OTHER otherwise, UNKNOWN for unlinked cells; majority
    ties break alphabetically (the reference's dict-max is insertion-
    order-dependent — not reproducible distributed; documented)."""
    coarse = (F.when(F.col("pred_qcode").isNull(), F.lit("UNKNOWN"))
              .when(F.col("pred_is_human"), F.lit("PERSON"))
              .otherwise(F.lit("OTHER")))
    counts = (linked.withColumn("coarse", coarse)
              .groupBy("table_id", "coarse")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("table_id").orderBy(F.desc("n"), F.asc("coarse"))
    return (counts.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("table_id", F.col("coarse").alias("majority_type"),
                    F.col("n").alias("n_cells")))
