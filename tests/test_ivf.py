"""IVF-flat ANN: exactness degeneracy, recall floor, and declarative
Lloyd refinement (inertia non-increasing)."""

import pytest

from refined_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_centroids,
    ivf_inertia,
    ivf_refine,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf01):
    import os

    df = spark.read.parquet(os.path.join(sf01, "embeddings.parquet"))
    df = df.cache()
    df.count()
    return df


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"], r["nn_rank"])
            for r in df.collect()}


def test_full_probe_is_exact(spark, emb):
    """nprobe >= n_centroids probes every inverted list => candidate set
    is the whole corpus => ivf_topk IS cosine_topk."""
    queries = emb.where("vec_id < 8")
    cents = ivf_centroids(emb, stride=31)
    n_cents = cents.count()
    approx = ivf_topk(queries, emb, k=3, stride=31, nprobe=n_cents)
    exact = cosine_topk(queries, emb, k=3)
    assert _pairs(approx) == _pairs(exact)


def test_partial_probe_recall_floor(spark, emb):
    """nprobe=4 of 17 lists keeps recall@3 above a fixture floor (the
    gaussian fixture is deliberately low-contrast; exact-dup style
    corpora sit far higher)."""
    from refined_spark.operators.similarity import ann_recall_at_k

    queries = emb.where("vec_id < 8")
    approx = ivf_topk(queries, emb, k=3, stride=31, nprobe=4)
    exact = cosine_topk(queries, emb, k=3)
    row = ann_recall_at_k(approx, exact).collect()[0]
    assert row["recall_at_k"] >= 0.5, row


def test_assignment_is_total_and_unique(spark, emb):
    cents = ivf_centroids(emb, stride=31)
    inv = ivf_assign(emb, cents, nprobe=1)
    assert inv.count() == emb.count()
    assert inv.select("id").distinct().count() == emb.count()


def test_lloyd_refinement_inertia_non_increasing(spark, emb):
    cents0 = ivf_centroids(emb, stride=31)
    i0 = ivf_inertia(emb, cents0)
    cents1 = ivf_refine(emb, cents0, iters=1)
    i1 = ivf_inertia(emb, cents1)
    cents2 = ivf_refine(emb, cents1, iters=1)
    i2 = ivf_inertia(emb, cents2)
    assert i1 <= i0 + 1e-9 and i2 <= i1 + 1e-9, (i0, i1, i2)
    # and the refinement actually moved something on iteration 1
    assert i1 < i0


def test_refined_centroids_search_end_to_end(spark, emb):
    """ivf_topk accepts trained centroids; output stays rank-valid."""
    cents = ivf_refine(emb, ivf_centroids(emb, stride=31), iters=1)
    queries = emb.where("vec_id < 8")
    out = ivf_topk(queries, emb, k=3, stride=31, nprobe=4,
                   centroids=cents)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 1 <= r["nn_rank"] <= 3 and r["query_id"] != r["neighbor_id"]
