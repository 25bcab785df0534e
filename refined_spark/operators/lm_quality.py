"""Language-model perplexity quality scoring — the CCNet-style filter.

The standard web-pipeline quality signal beyond rule heuristics
(textstats.py) is LM perplexity: score each document by a language
model trained on clean text and drop/bucket the high-perplexity tail
(CCNet, Wenzek et al. 2019 — their KenLM 5-gram is the published
instance). This module is the deterministic unigram instance with the
identical pipeline role and dataflow:

1. :func:`unigram_lm` — train: ONE map-side-combining token-count
   aggregation over the (reference) corpus → a vocabulary-scale
   ``(token, logp)`` table. The exchange carries (token, partial-count)
   pairs, never text.
2. :func:`with_lm_score` — score: tokens explode scan-locally (no
   shuffle — rows stay in their scan partition), hash-join the LM table
   (BROADCAST by default — a unigram vocab is ~10^6 rows, model-
   parameter scale, the same budget the reference spends on its PEM
   dict; ``broadcast_lm=False`` falls back to a shuffle join keyed on
   the token for larger models), then ONE map-side-combining per-doc
   aggregation of (Σ −logp, n). Corpus text crosses no exchange.

``lm_score`` = mean negative log-probability per token (log-perplexity;
perplexity = exp(score)). Out-of-vocabulary tokens score ``−ln(1 /
total_count)`` — the rank-1 floor, closed-form and replayable. Docs
with zero tokens score NULL.

Tokens are lowercase ``[a-z0-9]+`` runs — a closed regex shared with
the DuckDB replay; cross-engine float parity is the usual convention
(identical long counts → identical division doubles; ``ln`` may differ
in the last ulp between libms, so compared outputs round at 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _tokens(text_col: str) -> F.Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RE), F.lit(0))


def unigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, cnt, logp) vocabulary table; logp = ln(cnt / total)."""
    counts = (docs.select(F.explode(_tokens(text_col)).alias("token"))
              .groupBy("token")
              .agg(F.count(F.lit(1)).alias("cnt")))
    # total as a 1-row cross join: stays in the plan (no driver action),
    # broadcast-replicated — the scalar analog of a model parameter
    total = counts.agg(F.sum("cnt").alias("total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("token", "cnt",
                    F.log(F.col("cnt") / F.col("total")).alias("logp"),
                    "total"))


def with_lm_score(docs: DataFrame, lm: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_lm: bool = True) -> DataFrame:
    """(id, n_tokens, lm_score) per document; lm_score = mean −logp
    (log-perplexity, lower = more fluent under the LM). NULL for
    token-free docs."""
    toks = docs.select(F.col(id_col),
                       F.explode(_tokens(text_col)).alias("token"))
    side = lm.select("token", "logp", "total")
    if broadcast_lm:
        side = F.broadcast(side)
    scored = toks.join(side, "token", "left")
    # OOV floor: ln(1/total). total is NULL on the no-match side of the
    # left join, so pull it from a 1-row broadcast instead.
    tot = lm.agg(F.first("total").alias("_t"))
    scored = scored.crossJoin(F.broadcast(tot)).select(
        id_col,
        F.coalesce("logp", F.log(F.lit(1.0) / F.col("_t"))).alias("lp"))
    agg = (scored.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                (-F.sum("lp") / F.count(F.lit(1))).alias("lm_score")))
    # token-free docs vanish at the explode; join them back so the
    # documented per-document shape holds: (id, 0, NULL). A caller can
    # then audit or keep them under a different policy than
    # drop_high_perplexity (which drops NULL scores with the tail).
    return (docs.select(id_col).join(agg, id_col, "left")
            .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0))))


def drop_high_perplexity(docs: DataFrame, lm: DataFrame, tau: float,
                         id_col: str = "doc_id", text_col: str = "text",
                         broadcast_lm: bool = True) -> DataFrame:
    """The corpus minus documents whose lm_score exceeds ``tau`` (the
    CCNet tail cut), schema preserved; token-free docs (NULL score) are
    dropped with the tail — no text to defend them. Left-semi join on
    the id — key-width rows only. The re-select restores the input
    column ORDER (a by-name join hoists the key column to the front,
    which broke the schema-preserved contract whenever ``id_col`` was
    not already first)."""
    keep = (with_lm_score(docs, lm, id_col, text_col, broadcast_lm)
            .where(F.col("lm_score") <= tau)
            .select(id_col))
    return docs.join(keep, id_col, "left_semi").select(*docs.columns)
