"""Dedup + similarity: brute-force ground truth at small n."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from refined_spark.operators.dedup import (
    _minhash_sig,
    _shingles,
    exact_dedup_groups,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_signatures,
)
from refined_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.Generator(np.random.PCG64(5))
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(40):
        words = [vocab[int(x)] for x in rng.integers(0, 50, size=60)]
        rows.append((i, " ".join(words)))
    # exact dups
    rows.append((100, rows[0][1]))
    rows.append((101, rows[0][1]))
    # near dup (one word appended to a long doc)
    rows.append((102, rows[1][1] + " w0"))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dedup(spark, docs):
    out = exact_dedup_groups(docs).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 3
    assert out[0]["keep_id"] == 0


def test_lsh_finds_all_brute_force_pairs(spark, docs):
    """LSH-verified near-dup pairs == brute-force jaccard pairs at tau=0.9."""
    rows = docs.collect()
    sh = {r["doc_id"]: _shingles(r["text"], 3) for r in rows}
    truth = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            uni = len(sh[a] | sh[b])
            if uni and inter / uni >= 0.9:
                truth.add((a, b))
    assert truth  # fixture must contain near-dups
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    got = {(r["id_a"], r["id_b"])
           for r in jaccard_verify(pairs, docs, threshold=0.9).collect()}
    assert got == truth


def test_minhash_exact_dup_recall_is_one():
    a = _minhash_sig("identical text body here", 32, 3)
    b = _minhash_sig("identical text body here", 32, 3)
    assert a == b


def test_simhash_identical_and_different(spark, docs):
    sigs = {r["id"]: (r["sim_hi"], r["sim_lo"])
            for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[100] == sigs[101]
    for hi, lo in sigs.values():
        assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)

    def ham(a, b):
        return (bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1"))

    # near-dup: small hamming distance; unrelated: large
    assert ham(sigs[1], sigs[102]) <= 8
    assert ham(sigs[2], sigs[3]) > 8


def test_simhash_near_pairs_banded_equals_brute(spark, docs):
    """Banded hamming search finds exactly the brute-force <=3 pairs."""
    from refined_spark.operators.dedup import simhash_near_pairs

    sigs = simhash_signatures(docs)
    rows = {r["id"]: (r["sim_hi"], r["sim_lo"]) for r in sigs.collect()}

    def ham(a, b):
        return (bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1"))

    ids = sorted(rows)
    truth = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if ham(rows[a], rows[b]) <= 3}
    assert truth  # the exact-dup copies guarantee at least one pair
    got = {(r["id_a"], r["id_b"])
           for r in simhash_near_pairs(sigs, max_hamming=3).collect()}
    assert got == truth


def test_simhash_near_pairs_refuses_radius_beyond_banding(spark, docs):
    """max_hamming=4 can defeat 4-band pigeonhole (one differing bit per
    band, zero agreeing bands) — the operator must refuse, not silently
    return an incomplete pair set."""
    import pytest

    from refined_spark.operators.dedup import simhash_near_pairs

    sigs = simhash_signatures(docs)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(sigs, max_hamming=4)


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.Generator(np.random.PCG64(11))
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id: long, embedding: array<float>")
    got = cosine_topk(df.where("vec_id < 3"), df, k=4).collect()
    # numpy ground truth
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for q in range(3):
        cos = (v @ v[q]) / (norms * norms[q])
        cos[q] = -np.inf
        want = list(np.argsort(-cos)[:4])
        rows = sorted((r for r in got if r["query_id"] == q),
                      key=lambda r: r["nn_rank"])
        assert [r["neighbor_id"] for r in rows] == want


def test_ann_banded_vs_numpy(spark):
    from refined_spark.operators.similarity import (
        ann_recall_at_k,
        ann_topk_banded,
        cosine_topk,
    )

    rng = np.random.Generator(np.random.PCG64(13))
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id: long, embedding: array<float>")
    got = ann_topk_banded(df, k=3, dim=8, bits=16, n_bands=4).collect()

    # numpy replay: same seed-7 planes as hyperplane_signatures
    planes = np.random.Generator(np.random.PCG64(7)).standard_normal(
        (16, 8))
    v = vecs.astype(np.float64)
    sigs = (v @ planes.T) > 0
    keys = [tuple(
        int((sigs[i, 4 * j:4 * j + 4]
             * (1 << np.arange(4))).sum()) for j in range(4))
        for i in range(40)]
    norms = np.linalg.norm(v, axis=1)
    want = {}
    for q in range(40):
        cand = [n for n in range(40) if n != q
                and any(keys[q][j] == keys[n][j] for j in range(4))]
        cos = [(float(v[q] @ v[n] / max(norms[q] * norms[n], 1e-12)), n)
               for n in cand]
        cos.sort(key=lambda t: (-t[0], t[1]))
        want[q] = [n for _, n in cos[:3]]
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["nn_rank"], r["neighbor_id"]))
    assert {q: [n for _, n in sorted(v_)] for q, v_ in by_q.items()} == \
        {q: w for q, w in want.items() if w}

    # recall@k: banded candidates are a superset of any single band, and
    # the measurement query must agree with a direct set computation
    exact = cosine_topk(df, df, k=3)
    rec = ann_recall_at_k(
        ann_topk_banded(df, k=3, dim=8, bits=16, n_bands=4),
        exact).collect()[0]
    assert rec["n_exact"] == 40 * 3
    assert 0.0 <= rec["recall_at_k"] <= 1.0
    assert rec["n_hit"] == round(rec["recall_at_k"] * rec["n_exact"])


def test_cosine_near_pairs_sound_and_bounded(spark, sf01):
    """Every returned pair is truly >= tau (exact verify), undirected,
    and a subset of the brute-force >= tau pair set."""
    import os

    import pyspark.sql.functions as F

    from refined_spark.operators.similarity import (
        cosine_near_pairs,
        cosine_topk,
    )

    emb = spark.read.parquet(os.path.join(sf01, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    got = cosine_near_pairs(emb, tau=0.35, dim=dim).collect()
    for r in got:
        assert r["id_a"] < r["id_b"] and r["cosine"] >= 0.35
    # brute-force truth: all-pairs via cosine_topk with k = corpus size
    n = emb.count()
    exact = cosine_topk(emb, emb, k=n).where(
        (F.col("cosine") >= 0.35) & (F.col("query_id") < F.col("neighbor_id")))
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs <= truth and pairs  # non-vacuous on the fixture


# ---------------------------------------------------------------------------
# near-dup survivor selection
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def surv_docs(spark):
    # quality: doc 2 longest in cluster {0,1,2,3}; tie between 10/11
    # (min id wins); 20/21 both NULL quality (all-NULL cluster -> min id);
    # 30 NULL vs 31 scored (scored must win); 40 is a singleton
    rows = [
        (0, 5.0), (1, 9.0), (2, 12.0), (3, 9.0),
        (10, 7.0), (11, 7.0),
        (20, None), (21, None),
        (30, None), (31, 1.0),
        (40, 3.0),
    ]
    return spark.createDataFrame(rows, "doc_id: long, q: double")


@pytest.fixture(scope="module")
def surv_pairs(spark):
    # chain 0-1-2-3 (transitivity), plus direct pairs
    rows = [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    return spark.createDataFrame(rows, "id_a: long, id_b: long")


def test_survivors_pick_and_singletons(spark, surv_docs, surv_pairs):
    from refined_spark.operators.dedup import near_dup_survivors

    out = {r["doc_id"]: r for r in near_dup_survivors(
        surv_docs, surv_pairs, quality_col="q").collect()}
    assert len(out) == 11
    # chain cluster: max quality wins across the FULL transitive cluster
    assert [out[i]["cluster_id"] for i in (0, 1, 2, 3)] == [0, 0, 0, 0]
    assert [out[i]["is_survivor"] for i in (0, 1, 2, 3)] == [
        False, False, True, False]
    # quality tie -> min id
    assert out[10]["is_survivor"] and not out[11]["is_survivor"]
    # all-NULL cluster -> min id
    assert out[20]["is_survivor"] and not out[21]["is_survivor"]
    # NULL never beats a scored doc
    assert not out[30]["is_survivor"] and out[31]["is_survivor"]
    # singleton: own cluster, survives
    assert out[40]["cluster_id"] == 40 and out[40]["is_survivor"]
    # exactly one survivor per cluster
    per_cluster = {}
    for r in out.values():
        per_cluster.setdefault(r["cluster_id"], 0)
        per_cluster[r["cluster_id"]] += int(r["is_survivor"])
    assert set(per_cluster.values()) == {1}


def test_drop_near_dups_idempotent(spark, surv_docs, surv_pairs):
    from refined_spark.operators.dedup import (
        drop_near_dups,
        near_dup_survivors,
    )

    kept = drop_near_dups(surv_docs, surv_pairs, quality_col="q")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {2, 10, 20, 31, 40}
    # schema preserved
    assert kept.columns == surv_docs.columns
    # idempotence: re-running on the cleaned corpus (pairs restricted to
    # surviving endpoints) keeps everything
    surviving_pairs = (surv_pairs
                       .join(kept.select(F.col("doc_id").alias("id_a")),
                             "id_a", "left_semi")
                       .join(kept.select(F.col("doc_id").alias("id_b")),
                             "id_b", "left_semi"))
    again = near_dup_survivors(kept, surviving_pairs, quality_col="q")
    assert all(r["is_survivor"] for r in again.collect())


def test_survivors_end_to_end_lsh(spark, docs):
    """Composition over a REAL pair source: LSH candidates -> jaccard
    verify -> survivors. Docs 0/100/101 are byte-identical (longest-tie
    -> min id 0 survives); 1 vs 102 near-dup where 102 is one word
    longer -> 102 survives."""
    from refined_spark.operators.dedup import near_dup_survivors

    corpus = docs.withColumn("n_chars", F.length("text"))
    pairs = jaccard_verify(
        lsh_candidate_pairs(minhash_signatures(corpus)),
        corpus, threshold=0.5)
    out = {r["doc_id"]: r for r in near_dup_survivors(
        corpus, pairs.select("id_a", "id_b")).collect()}
    assert out[0]["is_survivor"]
    assert not out[100]["is_survivor"] and not out[101]["is_survivor"]
    assert out[102]["is_survivor"] and not out[1]["is_survivor"]
    assert out[1]["cluster_id"] == out[102]["cluster_id"] == 1


def test_lsh_empty_doc_flood_stays_bounded(spark, docs):
    """10k empty/whitespace docs (the boilerplate-stripped-crawl shape)
    all share the zero MinHash signature — before the banding exclusion
    they formed ONE mega-bucket per band (~50M pairs in one reducer).
    The pair set must stay exactly the non-empty corpus's pair set, and
    survivor selection over the real-doc chain must be unchanged."""
    from refined_spark.operators.dedup import near_dup_survivors

    empties = spark.range(10_000, 20_000).select(
        F.col("id").alias("doc_id"),
        # alternate '' / whitespace: both normalize to the zero signature
        F.when(F.col("id") % 2 == 0, F.lit("")).otherwise(F.lit("  \t "))
        .alias("text"))
    flooded = docs.unionByName(empties)

    base = {(r["id_a"], r["id_b"]) for r in
            lsh_candidate_pairs(minhash_signatures(docs)).collect()}
    got = {(r["id_a"], r["id_b"]) for r in
           lsh_candidate_pairs(minhash_signatures(flooded)).collect()}
    assert got == base          # bounded: no empty-doc pair ever emitted
    assert all(a < 10_000 and b < 10_000 for a, b in got)

    # survivors over the flooded corpus == survivors over the clean one
    for corpus in (docs, flooded):
        c = corpus.withColumn("n_chars", F.length("text"))
        pairs = jaccard_verify(
            lsh_candidate_pairs(minhash_signatures(c)), c, threshold=0.5)
        out = {r["doc_id"]: r["is_survivor"] for r in near_dup_survivors(
            c, pairs.select("id_a", "id_b")).collect()
            if r["doc_id"] < 10_000}
        assert out[0] and not out[100] and not out[101]
        assert out[102] and not out[1]


def test_lsh_bucket_cap_drops_degenerate_buckets(spark, caplog):
    """A bucket larger than max_bucket is dropped (count pre-pass, the
    lsh_mention_pairs pattern) and the drop is LOGGED, never silent."""
    import logging

    clones = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.lit("same exact duplicated body of words here").alias("text"))
    sigs = minhash_signatures(clones)
    with caplog.at_level(logging.WARNING,
                         logger="refined_spark.operators.dedup"):
        capped = lsh_candidate_pairs(sigs, max_bucket=10).count()
    assert capped == 0
    assert any("dropped" in r.message for r in caplog.records)
    # escape hatch: cap disabled -> the full 30*29/2 clone pair set
    assert lsh_candidate_pairs(sigs, max_bucket=None).count() == 435
