"""End-to-end ER pipeline: extract → mentions → candidates → scoring →
links → transitive clusters.

Stage graph (per SURVEY.md §3.1's Spark restatement):

  documents ──extract(E1, map)──┐
  gold_spans ──────────────────mentions(M1) ──⋈ broadcast pem (M2/blocking)
      └─ groupBy(url) coref (M3/M4) ─ candidates
  candidates ⋈ entity ⋈ entity_emb ⋈ topic_class → scores (F3-F6, codegen)
      → window argmax + threshold (F7) → links
      → large-star/small-star CC (A9) → clusters

Shuffle census at scale (the thing that matters at 100 TB):
  1. mentions⋈documents + groupBy(url) coref: ONE hash shuffle on url.
  2. candidate scoring joins: broadcast (dims) — zero shuffle — or
     qcode_idx shuffle when the embedding table exceeds broadcast range.
  3. per-mention windows: shuffle on mention_key.
  4. CC: one groupBy per star round (log-bounded; 2-3 on ER graphs).
Filters/column pruning reach the parquet scan (only url/html/text/lang are
read; `html` only when extraction runs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import config
from .operators.candidates import (
    explode_candidate_arrays,
    mention_candidate_arrays,
    pem_surface_arrays,
)
from .operators.clustering import cluster_mentions
from .operators.extract import extracted_text_col, with_extracted_text
from .operators.mentions import detect_mention_rows, mentions_from_spans
from .operators.scoring import (
    explode_scored_arrays,
    links_from_logits,
    observed_pairs_from_mentions,
    with_candidate_logits,
)


def load_tables(spark: SparkSession, fixture_dir: str) -> dict[str, DataFrame]:
    names = ["documents", "gold_spans", "pem", "entity", "entity_emb",
             "topic_class", "ed_weights", "class_edges", "gold_pairs",
             "link_counts"]
    t = {
        n: spark.read.parquet(os.path.join(fixture_dir, f"{n}.parquet"))
        for n in names
    }
    # Parallelism comes from the SCAN, never from shuffling the raw corpus:
    # the fixture generator shards documents/gold_spans into many files
    # (real corpora are thousands of files), so map stages (extraction,
    # mention detection) run at full width with zero shuffle of html bytes.
    # Downstream stages shuffle only the small mention/candidate rows on
    # their natural keys (url, mention_key) — repartitioning the raw html
    # here would move the entire corpus through the shuffle for nothing.
    return t


def load_weights(ed_weights: DataFrame) -> dict[str, float]:
    return {r["feature"]: r["weight"] for r in ed_weights.collect()}


def match_dictionary(pem: DataFrame, entity: DataFrame) -> list[str]:
    """Matcher keys: pem surfaces + words of multi-word human surfaces
    (the global analog of the coref registration trigger)."""
    human_sfs = (
        pem.join(entity.select("qcode", "is_human"), "qcode")
        .where(F.col("is_human")
               & (F.col("prob") > config.PERSON_COREF_PEM_MIN))
        .select("surface_form")
        .where(F.instr("surface_form", " ") > 0)
        .distinct()
    )
    words = human_sfs.select(
        F.explode(F.split("surface_form", " ")).alias("w")).distinct()
    keys = [r["surface_form"] for r in
            pem.select("surface_form").distinct().collect()]
    keys += [r["w"] for r in words.collect()]
    return keys


def run_pipeline(
    spark: SparkSession,
    fixture_dir: str,
    mode: str = "spans",
    broadcast_pem: bool = True,
    broadcast_emb: bool = True,
) -> dict[str, DataFrame]:
    """Returns {'mentions','candidates','links','clusters'} DataFrames.

    mode='spans': provided-spans (the F1-gated configuration, reference
    process_text(spans=...) semantics). mode='e2e': dictionary MD.
    """
    t = load_tables(spark, fixture_dir)

    if mode == "spans":
        # extraction runs map-side on scan partitions; only (url, text)
        # reaches the spans join shuffle — html never leaves the scan
        docs = with_extracted_text(t["documents"]).select(
            "url", F.col("extracted").alias("text"))
        mentions = mentions_from_spans(docs, t["gold_spans"])
    else:
        # extraction runs JVM-side inside the scan stage (codegen regexp
        # chain, golden-checked vs the Python parser); only the dictionary
        # matcher crosses to Python — one Arrow hop, text in, mention
        # rows out
        docs = t["documents"].withColumn(
            "text", extracted_text_col("html"))
        mentions = detect_mention_rows(
            spark, docs, match_dictionary(t["pem"], t["entity"]))

    # The mentions subtree (html parse + dictionary match — the most
    # expensive map stage) is referenced by candidates, scoring AND links;
    # without persistence the final action recomputes it three times.
    # At cluster scale the equivalent is the checkpointed stage table
    # (checkpoint.py); locally an in-memory persist.
    mentions = mentions.persist()
    # Array-native candidate/scoring path: one row per mention carrying
    # its merged candidate ARRAY. Multi-word mentions never shuffle;
    # single-word mentions shuffle twice (coref join + latest-reg agg)
    # with key-width rows; scoring + linking are pure map stages over a
    # broadcast feature map. First full-table shuffle of the whole job
    # is the final cluster aggregation.
    pem_arrays = pem_surface_arrays(t["pem"], t["entity"])
    cand_arr = mention_candidate_arrays(
        mentions, pem_arrays, broadcast_pem=broadcast_pem)
    weights = load_weights(t["ed_weights"])
    # feature domain from the mentions table (not cand_arr), so the
    # candidate subtree is consumed exactly once per action and never
    # needs caching
    pairs = observed_pairs_from_mentions(mentions, pem_arrays)
    with_logits = with_candidate_logits(
        cand_arr, t["entity"], t["entity_emb"], t["topic_class"], weights,
        pairs=pairs)
    candidates = explode_candidate_arrays(cand_arr).where(
        F.col("qcode").isNotNull())
    scored = explode_scored_arrays(with_logits)
    links = links_from_logits(with_logits).persist()
    clusters = cluster_mentions(links)
    return dict(mentions=mentions, candidates=candidates, scored=scored,
                links=links, clusters=clusters, cand_arr=cand_arr,
                with_logits=with_logits, tables=t)
