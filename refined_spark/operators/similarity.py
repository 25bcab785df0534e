"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. The dot product runs
  JVM-side (zip_with + aggregate); top-k per query is a rank window —
  no driver-side loops, fully distributed.
- LSH-bucketed ANN (random hyperplane signs): the scale path. Each vector
  gets a b-bit signature; candidates = same-bucket pairs, re-scored
  exactly. At 10^9+ vectors the cross join disappears and the shuffle is
  bounded per bucket (same banding idea as MinHash-LSH).
- IVF-flat ANN: corpus vectors land in one inverted list each (nearest
  centroid of a broadcast coarse quantizer); queries probe nprobe lists
  and re-score exactly. Deterministic stride-sampled centroids for the
  cross-engine oracle gate; declarative Lloyd refinement (ivf_refine)
  as the trained upgrade. nprobe >= n_centroids degenerates to the
  exact search — the exactness property the tests pin.

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

from ..caching import track


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
    weights = (1 << np.arange(bits, dtype=np.int64))

    @pandas_udf(LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        # one BLAS matmul per Arrow batch: (n, dim) @ (dim, bits) sign
        # matrix, bits packed with a single int64 dot — no per-row Python.
        # Contract check first: a NULL or wrong-width embedding would
        # otherwise die deep in numpy with an opaque stack/asarray error
        bad = [i for i, v in enumerate(vecs)
               if v is None or len(v) != dim]
        if bad:
            raise ValueError(
                f"hyperplane_signatures: {len(bad)} embedding(s) NULL "
                f"or not dim={dim} (first at batch index {bad[0]}) — "
                "the vector column must be non-null fixed-width")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (m @ planes.T) > 0
        return pd.Series(signs.astype(np.int64) @ weights)

    return df.select(F.col(id_col).alias("id"),
                     sig_udf(F.col(vec_col)).alias("bucket"))


def ann_topk_banded(corpus: DataFrame, k: int, dim: int, bits: int = 16,
                    n_bands: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Band-OR amplified hyperplane ANN (the multi-probe scale path).

    The b-bit signature splits into ``n_bands`` bands of r = b/n_bands
    bits; a pair is a candidate if it agrees on ANY band — the OR
    amplification that turns single-bucket recall (p^b per neighbor,
    vanishing for large b) into 1-(1-p^r)^n_bands, tunable independently
    of precision. Tune (bits, n_bands) per corpus with the
    ``ann_recall`` measurement: per-bit collision p = 1 - θ/π, so e.g.
    the gaussian fixture (true-neighbor p ≈ 0.63, random-pair p ≈ 0.54 —
    deliberately low contrast) gets recall ≈ 0.75 from 8 bands of 4
    bits, while a real near-dup corpus (neighbor cosine ≥ 0.9, p ≥ 0.86)
    wants wider bands (r 8-16) where random collisions vanish and
    neighbor recall stays ≥ 0.95. Physical plan: explode to
    (band_idx, band_key) rows —
    n_bands small rows per vector, never the vector itself — self-join
    per band, distinct pairs, then ONE exact re-score per surviving pair
    (vectors re-attached by id). At 10^9 vectors each band join is
    bucket-bounded exactly like MinHash-LSH dedup; no cross join exists
    anywhere.
    """
    assert bits % n_bands == 0
    r = bits // n_bands
    mask = (1 << r) - 1
    # persist: bands feeds both self-join sides and c both re-attach
    # joins; without it the signature UDF re-executes per consumer
    # (broadcast-hash sides share no exchange)
    sigs = hyperplane_signatures(corpus, dim=dim, bits=bits,
                                 id_col=id_col, vec_col=vec_col)
    bands = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band_idx"),
                     F.shiftright("bucket", j * r).bitwiseAND(mask)
                     .alias("band_key"))
            for j in range(n_bands)])).alias("b"),
    ).select("id", "b.band_idx", "b.band_key")
    bands = track(bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") != F.col("b.id")))
        .select(F.col("a.id").alias("qid"), F.col("b.id").alias("nid"))
        .distinct()
    )
    # track, as the comment above promises: c feeds BOTH re-attach
    # joins (no shared exchange) — untracked, the full corpus scan +
    # norm recomputed per side (ivf_topk already tracked its c)
    c = track(with_norm(
        corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("vec")), "vec", "n"))
    scored = (
        cand.join(c.select(F.col("id").alias("qid"),
                           F.col("vec").alias("qvec"),
                           F.col("n").alias("qn")), "qid")
        .join(c.select(F.col("id").alias("nid"),
                       F.col("vec").alias("nvec"),
                       F.col("n").alias("nn")), "nid")
        .select("qid", "nid",
                (_dot(F.col("qvec"), F.col("nvec"))
                 / F.greatest(F.col("qn") * F.col("nn"), F.lit(1e-12)))
                .alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"), "cosine", "nn_rank")
    )


def ann_recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Single-row recall@k of an ANN result against the exact top-k:
    |approx ∩ exact| / |exact| over (query_id, neighbor_id) pairs — the
    measurement the LSH parameters (bits, bands) are tuned against."""
    hit = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], "left_semi")
    return hit.agg(F.count(F.lit(1)).alias("n_hit")).crossJoin(
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
    ).select(
        "n_hit", "n_exact",
        (F.col("n_hit").cast("double") / F.col("n_exact"))
        .alias("recall_at_k"))


def cosine_near_pairs(corpus: DataFrame, tau: float, dim: int,
                      bits: int = 32, n_bands: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs (the dedup-shaped variant of the
    ANN search): band-OR hyperplane candidates, exact cosine verify at
    ``tau``, undirected output (id_a < id_b, cosine >= tau).

    Same physics as :func:`ann_topk_banded` — bucket-bounded band
    self-join, one exact re-score per surviving pair, no cross join —
    but the output is the near-duplicate PAIR SET a dedup pipeline
    consumes (survivor picking = min id per connected component via the
    clustering operator), not per-query top-k. Recall at tau follows
    1-(1-p^r)^n_bands with p = 1 - theta/pi; at dedup-grade tau (>= 0.9,
    p >= 0.90) the default 8x4 banding sits above 0.998."""
    assert bits % n_bands == 0
    r = bits // n_bands
    mask = (1 << r) - 1
    sigs = hyperplane_signatures(corpus, dim=dim, bits=bits,
                                 id_col=id_col, vec_col=vec_col)
    bands = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band_idx"),
                     F.shiftright("bucket", j * r).bitwiseAND(mask)
                     .alias("band_key"))
            for j in range(n_bands)])).alias("b"),
    ).select("id", "b.band_idx", "b.band_key")
    bands = track(bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    c = track(with_norm(corpus.select(F.col(id_col).alias("id"),
                                      F.col(vec_col).alias("vec")),
                        "vec", "n"))
    return (
        cand.join(c.select(F.col("id").alias("id_a"),
                           F.col("vec").alias("va"),
                           F.col("n").alias("na")), "id_a")
        .join(c.select(F.col("id").alias("id_b"),
                       F.col("vec").alias("vb"),
                       F.col("n").alias("nb")), "id_b")
        .select("id_a", "id_b",
                (_dot(F.col("va"), F.col("vb"))
                 / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)))
                .alias("cosine"))
        .where(F.col("cosine") >= tau)
    )


def ivf_centroids(corpus: DataFrame, stride: int, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantizer — deterministic stride sample: every
    ``stride``-th vector id is a centroid (cid = its vector id). A
    sampled quantizer is the standard cold-start for IVF at scale (and
    the only choice whose oracle replay is byte-exact: a trained
    centroid is a float MEAN whose summation order differs between
    engines); :func:`ivf_refine` provides the Lloyd-trained upgrade for
    deployments that don't need cross-engine bit-stability."""
    return corpus.where(F.pmod(F.col(id_col), F.lit(stride)) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))


def ivf_assign(df: DataFrame, centroids: DataFrame, nprobe: int = 1,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cid, probe_rank) of each row's ``nprobe`` nearest centroids
    by cosine (ties by cid). The centroid table is a broadcast dimension
    table; the scored frame drops vectors BEFORE the rank window so the
    only shuffle carries (id, cid, cos) triples."""
    c = F.broadcast(with_norm(centroids.select("cid", "cvec"),
                              "cvec", "cn"))
    v = with_norm(df.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("vec")), "vec", "vn")
    scored = v.join(c).select(
        "id", "cid",
        (_dot(F.col("vec"), F.col("cvec"))
         / F.greatest(F.col("vn") * F.col("cn"), F.lit(1e-12)))
        .alias("ccos"))
    w = Window.partitionBy("id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (scored.withColumn("probe_rank", F.row_number().over(w))
            .where(F.col("probe_rank") <= nprobe)
            .select("id", "cid", "probe_rank"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int, stride: int,
             nprobe: int = 4, centroids: DataFrame | None = None,
             query_id: str = "vec_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-flat ANN: corpus vectors land in ONE inverted list each
    (nearest centroid); a query probes its ``nprobe`` nearest lists and
    re-scores those candidates exactly. Returns (query_id, neighbor_id,
    cosine, nn_rank <= k).

    Scale shape: the centroid table is broadcast (dimension-sized); the
    inverted-list assignment is one map pass over the corpus; the
    probe→list join is an equi-join on cid whose fan-in per task is one
    list — no cross join anywhere. Recall is tuned by nprobe;
    ``nprobe >= n_centroids`` probes every list and is EXACTLY
    :func:`cosine_topk` (the property the pytest gate checks)."""
    cents = centroids if centroids is not None else ivf_centroids(
        corpus, stride, id_col=corpus_id, vec_col=vec_col)
    # one normed corpus pass persisted: it feeds the inverted-list
    # assignment AND both exact re-score attaches — unpersisted, the
    # corpus would be scanned (and norms recomputed) once per subtree,
    # which at 10^9 vectors is 3 full-table reads instead of 1
    c = with_norm(corpus.select(F.col(corpus_id).alias("id"),
                                F.col(vec_col).alias("vec")),
                  "vec", "n")
    c = track(c)
    inv = ivf_assign(c, cents, nprobe=1, id_col="id",
                     vec_col="vec").select(
        F.col("id").alias("nid"), "cid")
    probes = ivf_assign(queries, cents, nprobe=nprobe, id_col=query_id,
                        vec_col=vec_col).select(
        F.col("id").alias("qid"), "cid")
    cand = (probes.join(inv, "cid")
            .where(F.col("qid") != F.col("nid"))
            .select("qid", "nid").distinct())
    scored = (
        cand.join(c.select(F.col("id").alias("qid"),
                           F.col("vec").alias("qvec"),
                           F.col("n").alias("qn")), "qid")
        .join(c.select(F.col("id").alias("nid"),
                       F.col("vec").alias("nvec"),
                       F.col("n").alias("nn")), "nid")
        .select("qid", "nid",
                (_dot(F.col("qvec"), F.col("nvec"))
                 / F.greatest(F.col("qn") * F.col("nn"), F.lit(1e-12)))
                .alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"), "cosine", "nn_rank")
    )


def ivf_refine(corpus: DataFrame, centroids: DataFrame, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Lloyd refinement of the coarse quantizer, fully declarative: each
    iteration assigns every vector to its nearest centroid (broadcast
    join) and recomputes each centroid as the elementwise mean of its
    members — posexplode to (cid, pos, component), groupBy(cid, pos)
    avg (centroid-count x dim rows: tiny), re-assemble arrays. No MLlib,
    no driver-side vectors; per iteration one corpus map pass + one
    dimension-sized aggregation."""
    cents = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, nprobe=1, id_col=id_col,
                              vec_col=vec_col)
        members = assigned.join(
            corpus.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec")), "id")
        comp = members.select(
            "cid", F.posexplode("vec").alias("pos", "x"))
        means = comp.groupBy("cid", "pos").agg(
            F.avg(F.col("x").cast("double")).alias("m"))
        cents = means.groupBy("cid").agg(
            F.expr("transform(array_sort(collect_list(struct(pos, m))),"
                   " s -> s.m)").alias("cvec"))
    return cents


def ivf_inertia(corpus: DataFrame, centroids: DataFrame,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> float:
    """Mean cosine DISTANCE (1 - cos) to the assigned centroid — the
    objective the Lloyd gate checks is non-increasing."""
    c = F.broadcast(with_norm(centroids.select("cid", "cvec"),
                              "cvec", "cn"))
    v = with_norm(corpus.select(F.col(id_col).alias("id"),
                                F.col(vec_col).alias("vec")), "vec", "vn")
    best = v.join(c).select(
        "id",
        (_dot(F.col("vec"), F.col("cvec"))
         / F.greatest(F.col("vn") * F.col("cn"), F.lit(1e-12)))
        .alias("ccos")).groupBy("id").agg(F.max("ccos").alias("best"))
    return float(best.agg(F.avg(1 - F.col("best"))).collect()[0][0])


def ann_topk_lsh(corpus: DataFrame, k: int, dim: int, bits: int = 12,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """All-pairs ANN: same-bucket candidates re-scored exactly.

    Returns (query_id, neighbor_id, cosine, nn_rank) with nn_rank <= k,
    computed only within LSH buckets (recall < 1 by design; the exactness
    baseline is :func:`cosine_topk`)."""
    # persist the (id, bucket) signatures: both self-join sides consume
    # them and broadcast-hash sides share no exchange — unpersisted, the
    # signature UDF runs once per side
    sigs = hyperplane_signatures(corpus, dim=dim, bits=bits,
                                 id_col=id_col, vec_col=vec_col)
    sigs = track(sigs)
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
