"""F4 — entity typing: linear + sigmoid over the mention embedding.

Reference: ``EntityTyping.forward`` scores every mention against the full
~1.4k-class vocabulary — ``conf = sigmoid(Linear(mention_emb))`` —
(/root/reference/src/refined/model_components/entity_typing_layer.py:26-47)
and the ED layer consumes that confidence vector as ``predicted_classes``:
per candidate it takes the elementwise product with the candidate's class
indicator vector (``candidate_delta_classes``) and the full-width L2
distance between the two vectors (``candidate_dist``)
(/root/reference/src/refined/model_components/entity_disambiguation_layer.py:56-61),
concatenates them with the P(e|m) prior and the description score, and
mixes through its linear classifier.

Deterministic stand-in per SURVEY §7.1: the trained Linear's weight row
for class ``c`` is ``hash_embed("et§" + class_name)`` with zero bias, so
both Spark and the NumPy fixture oracle derive identical weights from the
class vocabulary alone — no artifact ships.

Execution shape (the scale story):

- Confidences depend ONLY on ``(ctx_word, class)`` — never on the
  individual mention — so they are computed once per DISTINCT context
  word (the same Zipf dedup the description score already exploits) in
  the SAME kind of vectorized Arrow pass that embeds context words: one
  ``sigmoid(M @ W.T)`` matrix multiply per Arrow batch, with the
  ``(n_classes × dim)`` weight matrix memoized per executor process.
  The matrix is model-parameter scale (~1.4k × 300 floats ≈ 2 MB in the
  reference) — the same budget the reference spends shipping its Linear
  to every worker.
- Everything downstream is JVM Column arithmetic. The full-width L2
  distance costs O(|candidate's classes|) per (ctx, qcode) pair, not
  O(n_classes), via the indicator-sparsity identity::

      ||ind_cand − conf||² = Σ_c conf_c² + Σ_{c ∈ cand} (1 − 2·conf_c)

  with ``Σ conf²`` precomputed per context word (``et_sq``). No
  n_classes-length loop ever runs per candidate pair.
- Both ``Σ``s the JVM evaluates (``delta``, the distance correction)
  run as sequential ``F.aggregate`` folds in class-index order, and the
  entity fixture stores class lists sorted — so the NumPy oracle's
  sorted-loop replay is order-identical and the parity is exact, not
  approximate. ``conf``/``et_sq`` themselves are produced by numpy on
  both sides through the SHARED :func:`et_conf_matrix`, so they are
  bit-identical by construction (no JVM-vs-numpy ``exp`` drift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                               StructType)

from .. import config
from ..functions.embed import hash_embed, hash_embed_batch

# salt so ET weight rows never collide with ctx/description embeddings of
# an identically-spelled key
_ET_SALT = "et§"

_W_MEMO: dict[tuple[str, ...], np.ndarray] = {}


def _et_weight_matrix(class_names: tuple[str, ...]) -> np.ndarray:
    """(n_classes, dim) float32 weight matrix, row c =
    ``hash_embed("et§" + class_names[c])``; memoized per process (the
    executor analog of the reference loading its Linear once)."""
    w = _W_MEMO.get(class_names)
    if w is None:
        w = hash_embed_batch([_ET_SALT + n for n in class_names])
        _W_MEMO[class_names] = w
    return w


def et_conf_matrix(words, class_names) -> tuple[np.ndarray, np.ndarray]:
    """``(conf, et_sq)`` for a batch of context words: conf is the
    (n_words, n_classes) float64 ``sigmoid(M @ W.T)``, et_sq its row-wise
    ``Σ conf²``. SHARED by the Spark UDF and the fixture oracle — the two
    engines run this exact numpy code, so their confidences agree
    bitwise.

    The contraction is a fixed-order fold over the embedding dims (one
    vectorized rank-1 update per dim), NOT a BLAS gemm: dgemm picks
    different kernels for different batch heights, so ``M @ W.T`` is not
    bit-stable across Arrow batch sizes (measured: full-vs-split results
    differ in the last ulp) — which would break the Spark-vs-oracle
    bitwise contract. The per-dim fold's accumulation order for every
    output element is d=0..dim-1 regardless of batch shape. Same move
    for ``et_sq`` (a fixed-order fold over classes, not ``.sum()``,
    whose pairwise summation is length-stable here but kept explicit).
    """
    names = tuple(class_names)
    m = hash_embed_batch(list(words)).astype(np.float64)
    w = _et_weight_matrix(names).astype(np.float64)
    z = np.zeros((m.shape[0], w.shape[0]))
    for d in range(m.shape[1]):
        z += m[:, d:d + 1] * w.T[d:d + 1, :]
    conf = 1.0 / (1.0 + np.exp(-z))
    sq = np.zeros(m.shape[0])
    for c in range(w.shape[0]):
        sq += conf[:, c] * conf[:, c]
    return conf, sq


def class_names_sorted(class_vocab: DataFrame) -> list[str]:
    """Class names in class_idx order. The vocab rule (idx = rank in the
    sorted distinct name list, wikidata.class_vocab_from_edges) makes
    this simply the sorted name list; the collect is model-parameter
    scale (~1.4k rows), not data scale."""
    rows = class_vocab.select("class_name", "class_idx").collect()
    ordered = sorted(rows, key=lambda r: r["class_idx"])
    if [r["class_idx"] for r in ordered] != list(range(len(ordered))):
        raise ValueError("class vocab indices are not dense 0..n-1")
    return [r["class_name"] for r in ordered]


def et_confidence_table(ctx_words: DataFrame,
                        class_names: list[str]) -> DataFrame:
    """(ctx_word, et_conf ARRAY<DOUBLE> in class_idx order, et_sq) for
    each distinct non-null context word — the F4 forward pass.

    One Arrow crossing; the per-batch work is a single (batch × dim) @
    (dim × n_classes) matmul. Same core-width repartition pin as the
    ctx-embedding build (pair_feature_table): the frame is bytes-tiny
    but CPU-bearing, and AQE would otherwise coalesce it to one task.
    """
    names = tuple(class_names)

    @pandas_udf(StructType([
        StructField("et_conf", ArrayType(DoubleType())),
        StructField("et_sq", DoubleType()),
    ]))
    def _et_udf(words: pd.Series) -> pd.DataFrame:
        conf, sq = et_conf_matrix(words.fillna("").tolist(), names)
        return pd.DataFrame({
            "et_conf": [row.tolist() for row in conf],
            "et_sq": sq,
        })

    par = ctx_words.sparkSession.sparkContext.defaultParallelism
    return (ctx_words.select("ctx_word")
            .where(F.col("ctx_word").isNotNull()).distinct()
            .repartition(par)
            .withColumn("_et", _et_udf(F.col("ctx_word")))
            .select("ctx_word", F.col("_et.et_conf").alias("et_conf"),
                    F.col("_et.et_sq").alias("et_sq")))


def et_feature_cols(conf_col: str = "et_conf", sq_col: str = "et_sq",
                    classes_col: str = "class_idx"):
    """(class_delta, class_dist) Column pair from an attached confidence
    row + the candidate's class-index array — the ED-layer class features
    in their sparse form. NULL class list or missing confidence row
    (null-context mention) → (0.0, 0.0), the neutral contribution.

    A ``class_idx`` outside the confidence vector (entity table
    referencing a class absent from the class-edge vocab) RAISES instead
    of silently propagating NULL features — the NumPy replay would
    IndexError loudly on the same input, and the two engines must fail
    the same way (a vocab/entity mismatch is a build defect, not data).
    """
    # try_element_at: NULL on out-of-bounds in BOTH ansi modes, so the
    # raise_error fallback fires identically everywhere (plain
    # element_at raises its own opaque error under ansi and silently
    # NULLs without it)
    conf_at = lambda c: F.coalesce(  # noqa: E731
        F.try_element_at(conf_col, c.cast("int") + 1),
        F.raise_error(F.concat(
            F.lit("et_feature_cols: class_idx out of range for the "
                  "class vocab: "), c.cast("string"))))
    delta = F.aggregate(
        classes_col, F.lit(0.0).cast("double"),
        lambda acc, c: acc + conf_at(c))
    corr = F.aggregate(
        classes_col, F.lit(0.0).cast("double"),
        lambda acc, c: acc + (F.lit(1.0) - F.lit(2.0) * conf_at(c)))
    missing = F.col(classes_col).isNull() | F.col(conf_col).isNull()
    class_delta = F.when(missing, F.lit(0.0)).otherwise(delta)
    class_dist = F.when(missing, F.lit(0.0)).otherwise(
        F.sqrt(F.col(sq_col) + corr))
    return class_delta, class_dist


def et_top_classes(spans: DataFrame, class_names: list[str],
                   k: int = 3) -> DataFrame:
    """Per-span top-k predicted classes — the user-facing F4 surface
    (the reference returns predicted coarse types per span). Confidences
    are computed per DISTINCT ctx_word and broadcast back; ranking is by
    (conf desc, class_idx asc) — sigmoid is monotone, so the rank order
    is the dot-product order and engine-independent.

    Returns (url, start, et_rank, class_name, conf) — ``conf`` is the
    raw sigmoid confidence (api.predicted_types relies on it); oracle
    gates must PROJECT IT AWAY from the compared surface (the
    q_et_types convention — ranks are compared, floats are
    pytest-gated, same as topk_links)."""
    # NULL ctx (a mention with no '(word)' context — the common case
    # on real text) maps to the '' sentinel so EVERY span gets a
    # prediction: the reference types every span (its ET featurizer
    # fillna('')s absent context); the inner join below otherwise
    # silently dropped those spans from the user-facing output
    # (r5 review)
    ctx = F.coalesce(F.col("ctx_word"), F.lit(""))
    et = et_confidence_table(
        spans.select(ctx.alias("ctx_word")), class_names)
    name_arr = F.array(*[F.lit(n) for n in class_names])
    ranked = (et.select(
        "ctx_word",
        F.posexplode("et_conf").alias("cpos", "conf"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ctx_word")
                .orderBy(F.col("conf").desc(), F.col("cpos").asc())))
        .where(F.col("rn") <= k)
        .select("ctx_word", F.col("rn").alias("et_rank"),
                F.element_at(name_arr, F.col("cpos") + 1)
                .alias("class_name"), "conf"))
    return (spans.select("url", "start", ctx.alias("ctx_word"))
            .join(F.broadcast(ranked), "ctx_word")
            .select("url", "start", "et_rank", "class_name", "conf"))
