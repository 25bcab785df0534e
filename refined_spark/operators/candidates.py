"""M2-M4 — candidate generation: blocking join + person-name coreference.

M2 (candidate lookup) IS the blocking step: a broadcast hash equi-join of
mentions against the normalized alias table on the blocking key
``norm_sf`` — the Spark restatement of the reference's PEM dict lookup
(/root/reference/src/refined/doc_preprocessing/candidate_generator.py:63-72).

M3 (person coreference) is the engine's single order-sensitive operator:
the reference threads a per-document dict through mentions in start order
(candidate_generator.py:56-94, reset per doc at refined_model.py:440-454 —
fragile there, exact here). ``groupBy(url).applyInPandas`` gives each doc
its own sequential pass; docs are independent, so the stage parallelizes
per-url — at 10^12 docs this is a single hash-shuffle on url, co-partitioned
with the mentions join that precedes it.

M4 (dedup keep-max-prob by qcode) happens inside the same pass, matching
the reference's stable sorted-merge + unique() (general_utils.py:61-67).

Skew: hot blocking keys ("john"-style aliases) inflate the M2 join. The
broadcast path is immune (no shuffle of the big side); for the non-broadcast
path :func:`direct_candidates` pre-salts the pem side SKEW_SALT_BUCKETS
ways, and AQE skew-join splitting backstops residual imbalance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import config

MENTION_COLS = ["url", "start", "length", "mention_text", "norm_sf",
                "ctx_word", "mention_key"]

CANDIDATE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("start", IntegerType()),
    StructField("qcode", StringType()),
    StructField("prob", DoubleType()),
    StructField("cand_source", StringType()),
    StructField("cand_rank", IntegerType()),
])


def direct_candidates(mentions: DataFrame, pem: DataFrame, entity: DataFrame,
                      broadcast_pem: bool = True) -> DataFrame:
    """Blocking join: one row per (mention, direct candidate); mentions with
    no candidates keep a single row with NULL qcode (the coref stage needs
    to see them).

    ``broadcast_pem=True`` for dictionary-sized alias tables (the reference
    ships its whole 18M-key PEM to every worker — same tradeoff). At the
    33M-entity scale with a pem too big to broadcast, pass False: the join
    becomes a shuffle hash join on the blocking key with the pem side
    pre-salted; AQE skew-join handles hot keys beyond that.
    """
    p = pem.join(F.broadcast(entity.select("qcode", "is_human")),
                 "qcode", "left").na.fill({"is_human": False})
    p = p.select(
        F.col("surface_form"), F.col("qcode"), F.col("prob"),
        F.col("rank"), F.col("is_human"),
    )
    if broadcast_pem:
        p = F.broadcast(p)
    m = mentions.select(*MENTION_COLS)
    return m.join(p, m.norm_sf == p.surface_form, "left").drop("surface_form")


def with_person_coref(direct: DataFrame) -> DataFrame:
    """Person-name coreference, fully declarative (zero Python in the path).

    The reference threads a per-doc dict sequentially
    (candidate_generator.py:56-94). That protocol is exactly expressible
    relationally, because:

    - only multi-word surfaces with a human candidate (pem > 0.05)
      REGISTER words into the dict (each word -> that mention's capped
      human candidates, overwriting previous registrations);
    - only single-word surfaces can RECEIVE (dict keys are single words);
    - a receiver sees the LATEST registration before it in start order.

    So: registrations = explode(words of registering mentions);
    receiver x registration equi-join on (url, word) with
    start_reg < start_recv; "latest wins" = max(start_reg) window; the
    reference's stable merge sort + unique-by-qcode becomes a sort key
    (-prob, source_order, origin_rank) + row_number dedup — byte-exact
    with the sequential semantics (capping preserves the descending
    order, so the sort reproduces registration order for coref-only
    mentions).

    Scale: one (url, word) equi-join + per-mention windows — shuffles
    co-partitioned with the blocking join; no per-group Python (the
    applyInPandas variant, kept as `with_person_coref_python` for
    cross-checking, spent ~40 core-ms per document on pandas overhead).
    """
    m_cols = ["url", "start", "norm_sf", "mention_key"]
    cand = direct.where(F.col("qcode").isNotNull())

    # registrations: one row per (word of registering surface, human cand)
    registering = cand.where(
        F.col("is_human")
        & (F.col("prob") > config.PERSON_COREF_PEM_MIN)
        & F.col("norm_sf").contains(" "))
    reg = (
        registering.select(
            "url",
            F.col("start").alias("start_reg"),
            F.explode(F.split("norm_sf", " ")).alias("word"),
            F.col("qcode").alias("c_qcode"),
            F.least(F.col("prob"),
                    F.lit(config.PERSON_COREF_PEM_CAP)).alias("c_prob"),
            F.col("rank").alias("c_rank"),
        )
    )

    # receivers: single-word mentions (dict keys are single words)
    recv = (
        direct.select(*m_cols).distinct()
        .where(~F.col("norm_sf").contains(" "))
    )
    joined = recv.join(
        reg,
        (recv.url == reg.url) & (recv.norm_sf == reg.word)
        & (reg.start_reg < recv.start),
    ).drop(reg.url)
    w_last = Window.partitionBy("mention_key")
    indirect = (
        joined.withColumn("max_reg", F.max("start_reg").over(w_last))
        .where(F.col("start_reg") == F.col("max_reg"))
        .select(
            "url", "start", "norm_sf", "mention_key",
            F.col("c_qcode").alias("qcode"),
            F.col("c_prob").alias("prob"),
            F.lit("coref").alias("cand_source"),
            F.lit(1).alias("src_order"),
            F.col("c_rank").alias("orig_rank"),
        )
    )
    direct_rows = cand.select(
        "url", "start", "norm_sf", "mention_key", "qcode", "prob",
        F.lit("direct").alias("cand_source"),
        F.lit(0).alias("src_order"),
        F.col("rank").alias("orig_rank"),
    )
    merged = direct_rows.unionByName(indirect)

    order = [F.desc("prob"), F.asc("src_order"), F.asc("orig_rank")]
    w_q = Window.partitionBy("mention_key", "qcode").orderBy(*order)
    w_m = Window.partitionBy("mention_key").orderBy(*order)
    return (
        merged.withColumn("dup_rn", F.row_number().over(w_q))
        .where(F.col("dup_rn") == 1)
        .withColumn("cand_rank", F.row_number().over(w_m).cast("int"))
        .where(F.col("cand_rank") <= config.MAX_CANDIDATES)
        .select("url", F.col("start").cast("int").alias("start"), "qcode",
                "prob", "cand_source", "cand_rank")
    )


def with_person_coref_python(direct: DataFrame) -> DataFrame:
    """Sequential per-document coreference (reference-shaped protocol),
    kept as the cross-check implementation for tests.

    Input: output of :func:`direct_candidates`.
    Output: CANDIDATE_SCHEMA rows (cand_source in {'direct','coref'}),
    cand_rank 1-based in the canonical order, truncated to MAX_CANDIDATES.
    """
    per_mention = (
        direct.groupBy(*MENTION_COLS)
        .agg(F.sort_array(F.collect_list(
            F.struct("rank", "qcode", "prob", "is_human"))).alias("cands"))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("start")
        person_coref: dict[str, list[tuple[str, float]]] = {}
        out = []
        for row in pdf.itertuples(index=False):
            direct_cands = [
                (c["qcode"], c["prob"], bool(c["is_human"]))
                for c in row.cands if c["qcode"] is not None
            ]
            if not direct_cands:
                if row.norm_sf in person_coref:
                    final = [
                        (q, p, "coref")
                        for q, p in person_coref[row.norm_sf]
                    ][: config.MAX_CANDIDATES]
                else:
                    final = []
            else:
                shorts = [
                    (q, min(p, config.PERSON_COREF_PEM_CAP))
                    for q, p, h in direct_cands
                    if h and p > config.PERSON_COREF_PEM_MIN
                ]
                words = row.norm_sf.split(" ")
                if shorts and len(words) > 1:
                    for w in words:
                        person_coref[w] = shorts
                if row.norm_sf in person_coref:
                    merged = sorted(
                        [(q, p, "direct") for q, p, _h in direct_cands]
                        + [(q, p, "coref")
                           for q, p in person_coref[row.norm_sf]],
                        key=lambda c: -c[1],  # stable; direct first on ties
                    )
                    seen, final = set(), []
                    for q, p, src in merged:
                        if q not in seen:
                            seen.add(q)
                            final.append((q, p, src))
                    final = final[: config.MAX_CANDIDATES]
                else:
                    final = [(q, p, "direct") for q, p, _h in direct_cands][
                        : config.MAX_CANDIDATES]
            for rank, (q, p, src) in enumerate(final, 1):
                out.append((row.url, row.start, q, p, src, rank))
        return pd.DataFrame(
            out, columns=["url", "start", "qcode", "prob", "cand_source",
                          "cand_rank"],
        )

    return per_mention.groupBy("url").applyInPandas(run, CANDIDATE_SCHEMA)


def generate_candidates(mentions: DataFrame, pem: DataFrame,
                        entity: DataFrame,
                        broadcast_pem: bool = True) -> DataFrame:
    """M2+M3+M4 composed."""
    return with_person_coref(
        direct_candidates(mentions, pem, entity, broadcast_pem=broadcast_pem)
    )
