"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. The dot product runs
  JVM-side (zip_with + aggregate); top-k per query is a rank window —
  no driver-side loops, fully distributed.
- LSH-bucketed ANN (random hyperplane signs): the scale path. Each vector
  gets a b-bit signature; candidates = same-bucket pairs, re-scored
  exactly. At 10^9+ vectors the cross join disappears and the shuffle is
  bounded per bucket (same banding idea as MinHash-LSH).

Embeddings stay float; norms are precomputed once per side of the join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding",
              out_col: str = "_norm") -> DataFrame:
    return df.withColumn(out_col, F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                query_id: str = "vec_id", corpus_id: str = "vec_id",
                vec_col: str = "embedding",
                broadcast_queries: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, nn_rank).

    Self-matches (same id) excluded. The query side is broadcast (queries
    are typically few); the corpus streams — no corpus shuffle at all
    until the per-query top-k window, which shuffles only (q, id, cos)
    triples, k-boundable via AQE.
    """
    q = with_norm(
        queries.select(F.col(query_id).alias("qid"),
                       F.col(vec_col).alias("qvec")), "qvec", "qn")
    c = with_norm(
        corpus.select(F.col(corpus_id).alias("nid"),
                      F.col(vec_col).alias("nvec")), "nvec", "nn")
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        c.join(q, F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            (_dot(F.col("qvec"), F.col("nvec"))
             / F.greatest(F.col("qn") * F.col("nn"), F.lit(1e-12)))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"), "cosine", "nn_rank")
    )


def hyperplane_signatures(df: DataFrame, dim: int, bits: int = 16,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """b-bit random-hyperplane signature per vector (seeded, Arrow-batched)."""
    rng = np.random.Generator(np.random.PCG64(7))
    planes = rng.standard_normal((bits, dim)).astype(np.float64)

    @pandas_udf(LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        def one(v):
            x = np.asarray(v, dtype=np.float64)
            bitsv = (planes @ x) > 0
            out = 0
            for i, b in enumerate(bitsv):
                if b:
                    out |= 1 << i
            return out

        return vecs.map(one)

    return df.select(F.col(id_col).alias("id"),
                     sig_udf(F.col(vec_col)).alias("bucket"))


def ann_topk_lsh(corpus: DataFrame, k: int, dim: int, bits: int = 12,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """All-pairs ANN: same-bucket candidates re-scored exactly.

    Returns (query_id, neighbor_id, cosine, nn_rank) with nn_rank <= k,
    computed only within LSH buckets (recall < 1 by design; the exactness
    baseline is :func:`cosine_topk`)."""
    sigs = hyperplane_signatures(corpus, dim=dim, bits=bits,
                                 id_col=id_col, vec_col=vec_col)
    c = with_norm(
        corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("vec")), "vec", "n"
    ).join(sigs, "id")
    a, b = c.alias("a"), c.alias("b")
    scored = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") != F.col("b.id")))
        .select(
            F.col("a.id").alias("qid"), F.col("b.id").alias("nid"),
            (_dot(F.col("a.vec"), F.col("b.vec"))
             / F.greatest(F.col("a.n") * F.col("b.n"), F.lit(1e-12)))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"), "cosine", "nn_rank")
    )
