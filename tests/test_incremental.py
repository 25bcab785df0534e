"""operators/incremental.py — cross-snapshot (manifest) dedup.

Pins what the driver gate can't isolate: the NULL-fingerprint
pass-through, within-increment keep-first, column-order preservation,
broadcast/shuffle parity, manifest roll-forward idempotence, the
near-dup estimator, tau monotonicity, the empty-doc zero-signature
guard, and the manifest-side bucket-cap census.
"""

import pytest
from pyspark.sql import functions as F

from refined_spark.operators.incremental import (advance_manifest,
                                                 content_fingerprint,
                                                 corpus_manifest,
                                                 dedup_increment,
                                                 dedup_increment_near,
                                                 estimated_jaccard,
                                                 signature_manifest)

_HIST = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "sphinx of black quartz judge my vow"),
]
_INCR = [
    # exact copy of history 0 (whitespace-canonicalized) -> drops
    (10, "  the quick  brown fox jumps over the lazy dog "),
    # brand new -> kept
    (11, "jackdaws love my big sphinx of quartz"),
    # within-increment copies of each other (not in history):
    # keep-first elects 12
    (12, "how vexingly quick daft zebras jump"),
    (13, "how vexingly  quick daft zebras jump"),
    # NULL text -> NULL fingerprint -> always kept
    (14, None),
    (15, None),
]


def _frames(spark):
    hist = spark.createDataFrame(_HIST, "doc_id long, text string")
    incr = spark.createDataFrame(_INCR, "doc_id long, text string")
    return hist, incr


def test_exact_increment_cut_and_keep_first(spark):
    hist, incr = _frames(spark)
    kept = dedup_increment(incr, corpus_manifest(hist))
    assert sorted(r.doc_id for r in kept.collect()) == [11, 12, 14, 15]


def test_null_fingerprint_is_null_and_empty_is_a_key(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "x")],
        "doc_id long, text string")
    got = {r.doc_id: r.fp for r in df.select(
        "doc_id", content_fingerprint().alias("fp")).collect()}
    assert got[0] is None
    # empty and whitespace-only canonicalize to "" — a VALID shared key
    # (byte-identical empties are true duplicates), unlike NULL
    assert got[1] == got[2] and got[1] is not None
    assert got[3] not in (None, got[1])


def test_column_order_preserved_and_broadcast_parity(spark):
    hist, _ = _frames(spark)
    # id column deliberately NOT first — the r5 schema-preservation bar
    incr = spark.createDataFrame(
        [("u10", _HIST[0][1], 10), ("u11", "totally new page", 11)],
        "url string, text string, doc_id long")
    a = dedup_increment(incr, corpus_manifest(hist),
                        broadcast_manifest=True)
    b = dedup_increment(incr, corpus_manifest(hist),
                        broadcast_manifest=False)
    assert a.columns == incr.columns == b.columns
    assert [r.doc_id for r in a.collect()] == [11]
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_advance_manifest_makes_rerun_empty(spark):
    """Rolling the manifest forward then replaying the SAME increment
    drops everything with a non-null fingerprint — the resume/idempotence
    contract a snapshot-by-snapshot ingest needs."""
    hist, incr = _frames(spark)
    m0 = corpus_manifest(hist)
    kept = dedup_increment(incr, m0)
    m1 = advance_manifest(m0, kept)
    again = dedup_increment(incr, m1)
    assert sorted(r.doc_id for r in again.collect()) == [14, 15]
    # manifest grew by exactly the kept distinct fingerprints (11, 12)
    assert m1.count() == m0.count() + 2


def test_estimated_jaccard_bounds(spark):
    df = spark.createDataFrame(
        [(list(range(8)), list(range(8)), 1.0),
         ([1, 2, 3, 4], [1, 2, 0, 0], 0.5),
         ([1, 2], [3, 4], 0.0)],
        "a array<long>, b array<long>, want double")
    got = df.select(estimated_jaccard(F.col("a"), F.col("b"))
                    .alias("j"), "want").collect()
    assert all(abs(r.j - r.want) < 1e-12 for r in got)


def test_estimated_jaccard_length_mismatch_fails_loudly(spark):
    """num_perm drift between a long-lived manifest and a later
    increment must ERROR, not silently deflate every estimate
    (zip_with null-pads: an exact copy at 32-vs-64 perms would score
    0.5 and be re-admitted)."""
    df = spark.createDataFrame([([1, 2, 3, 4], [1, 2])],
                               "a array<long>, b array<long>")
    with pytest.raises(Exception, match="num_perm"):
        df.select(estimated_jaccard(F.col("a"), F.col("b"))).collect()


def test_near_persist_flag_parity(spark):
    """persist_manifest=False (the parquet-backed corpus-manifest
    setting) returns the identical cut."""
    hist, _ = _frames(spark)
    incr = spark.createDataFrame(
        [(20, _HIST[1][1]), (21, "jackdaws love my big sphinx")],
        "doc_id long, text string")
    man = signature_manifest(hist)
    a = dedup_increment_near(incr, man, tau=0.999999)
    b = dedup_increment_near(incr, man, tau=0.999999,
                             persist_manifest=False)
    assert sorted(r.doc_id for r in a.collect()) == \
        sorted(r.doc_id for r in b.collect()) == [21]


def test_near_increment_condemns_copies_keeps_fresh(spark):
    hist, _ = _frames(spark)
    incr = spark.createDataFrame([
        (20, _HIST[1][1]),                       # exact copy -> drop
        (21, "jackdaws love my big sphinx of quartz"),   # fresh -> keep
        (22, ""),                                # zero-sig: NEVER banded
    ], "doc_id long, text string")
    man = signature_manifest(hist)
    kept = dedup_increment_near(incr, man, tau=0.999999)
    assert sorted(r.doc_id for r in kept.collect()) == [21, 22]
    assert kept.columns == incr.columns


def test_near_tau_monotone_on_edited_doc(spark):
    """One word changed: condemned at a loose tau, kept at tau~1 —
    the estimator actually discriminates, the gate isn't exact-only."""
    hist, _ = _frames(spark)
    edited = _HIST[0][1].replace("lazy", "sleepy")
    incr = spark.createDataFrame([(30, edited)],
                                 "doc_id long, text string")
    man = signature_manifest(hist)
    loose = dedup_increment_near(incr, man, tau=0.2)
    strict = dedup_increment_near(incr, man, tau=0.999999)
    assert loose.count() == 0 and strict.count() == 1


def test_manifest_bucket_cap_census(spark, caplog):
    """A degenerate manifest bucket (many identical corpus docs) is
    dropped by the count pre-pass with an eager WARNING — the increment
    doc that only matches there survives; cap=None restores the match."""
    hist = spark.createDataFrame(
        [(i, "same boilerplate page body here") for i in range(12)],
        "doc_id long, text string")
    incr = spark.createDataFrame(
        [(50, "same boilerplate page body here")],
        "doc_id long, text string")
    man = signature_manifest(hist)
    import logging
    with caplog.at_level(logging.WARNING,
                         logger="refined_spark.operators.incremental"):
        capped = dedup_increment_near(incr, man, tau=0.9, max_bucket=5)
    assert capped.count() == 1
    assert any("dropped" in r.message for r in caplog.records)
    uncapped = dedup_increment_near(incr, man, tau=0.9, max_bucket=None)
    assert uncapped.count() == 0


def test_streaming_increment_against_manifest(spark, tmp_path_factory):
    """The stream-static variant drops manifest-known docs per
    micro-batch with NO state store, keeps NULL-text rows, and agrees
    with the batch manifest cut on the same increment."""
    from refined_spark.operators.incremental import corpus_manifest
    from refined_spark.streaming.events import (
        run_stream_to_batch, streaming_dedup_against_manifest)

    hist, incr = _frames(spark)
    src = str(tmp_path_factory.mktemp("incr_src"))
    incr.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(incr.schema)
              .format("parquet").option("maxFilesPerTrigger", 1)
              .load(src))
    out = run_stream_to_batch(
        streaming_dedup_against_manifest(stream, corpus_manifest(hist)))
    got = sorted(r.doc_id for r in out.collect())
    # no within-stream election here (that is streaming_dedup_first_seen's
    # job): both copies of the fresh pair and both NULL rows pass
    assert got == [11, 12, 13, 14, 15]
    assert out.columns == incr.columns


def test_bucketed_manifest_join_shuffles_increment_only(spark, tmp_path):
    """save_manifest/load_manifest: the persisted-bucketed manifest
    side of the anti join reads EXCHANGE-FREE (its bucketing satisfies
    the join's required distribution) — only the increment shuffles.
    This is the property that makes the cut affordable at 10^12-doc
    manifests; pinned on the physical plan with broadcast disabled so
    the sort-merge path (the at-scale strategy) is what's audited."""
    from refined_spark.operators.incremental import (corpus_manifest,
                                                     load_manifest,
                                                     save_manifest)

    hist, incr = _frames(spark)
    save_manifest(corpus_manifest(hist), "t_incr_manifest",
                  n_buckets=4, path=str(tmp_path / "manifest"))
    try:
        man = load_manifest(spark, "t_incr_manifest")
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # shuffle partitions must equal the bucket count or Spark
        # re-shuffles the BUCKETED side up to the larger number — the
        # at-scale sizing rule the save_manifest docstring states
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            kept = dedup_increment(incr, man)
            assert sorted(r.doc_id for r in kept.collect()) == \
                [11, 12, 14, 15]
            plan = kept._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        # AQE's toString carries BOTH the final and the initial plan —
        # audit the final one only
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final and "Bucketed: true" in final
        # exactly ONE hash-partitioning exchange: the increment side
        # (the window election reuses the join's output partitioning,
        # and the bucketed manifest side never exchanges)
        assert final.count("Exchange hashpartitioning") == 1
    finally:
        spark.sql("drop table if exists t_incr_manifest")


def test_helper_column_collision(spark):
    hist, _ = _frames(spark)
    incr = spark.createDataFrame(
        [(60, "brand new text", "caller-owned")],
        "doc_id long, text string, _fp string")
    out = dedup_increment(incr, corpus_manifest(hist))
    assert out.columns == incr.columns
    assert out.collect()[0]._fp == "caller-owned"
