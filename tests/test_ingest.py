"""Multipart/resumable ingest (reference refined_api.py:55-167 analog):
idempotent parts, durable resume state, finalize validation, and the
finalized corpus feeding the pipeline unchanged."""

import os

import pyspark.sql.functions as F
import pytest

from refined_spark.ingest import IngestError, MultipartIngest


@pytest.fixture()
def ing(spark, tmp_path):
    return MultipartIngest(spark, str(tmp_path / "ingest"))


def _docs(spark, fx_t1):
    return spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))


def _parts(spark, fx_t1, n=3):
    d = _docs(spark, fx_t1)
    return [d.where(F.expr(f"pmod(xxhash64(url), {n}) = {i}"))
            for i in range(n)]


def test_round_trip_and_counts(spark, fx_t1, ing):
    parts = _parts(spark, fx_t1)
    total = sum(p.count() for p in parts)
    job = ing.begin(expected_parts=3, expected_rows=total)
    for i, p in enumerate(parts):
        m = ing.add_part(job, i, p)
        assert not m.get("skipped")
    final = ing.finalize(job)
    assert final["n_parts"] == 3 and final["n_rows"] == total
    got = {r["url"] for r in ing.read(job).select("url").collect()}
    want = {r["url"] for r in _docs(spark, fx_t1).select("url").collect()}
    assert got == want


def test_retry_is_idempotent(spark, fx_t1, ing):
    parts = _parts(spark, fx_t1)
    job = ing.begin(expected_parts=3)
    ing.add_part(job, 0, parts[0])
    again = ing.add_part(job, 0, parts[0])  # uploader retry
    assert again["skipped"]
    ing.add_part(job, 1, parts[1])
    ing.add_part(job, 2, parts[2])
    ing.finalize(job)
    # no duplicated rows from the retry
    assert ing.read(job).count() == sum(p.count() for p in parts)


def test_resume_reports_missing_parts(spark, fx_t1, ing):
    parts = _parts(spark, fx_t1)
    job = ing.begin(expected_parts=3)
    ing.add_part(job, 0, parts[0])
    ing.add_part(job, 2, parts[2])
    assert sorted(ing.received(job)) == [0, 2]  # resume query
    with pytest.raises(IngestError, match=r"missing part numbers \[1\]"):
        ing.finalize(job)
    ing.add_part(job, 1, parts[1])
    assert ing.finalize(job)["n_parts"] == 3


def test_torn_write_is_redone(spark, fx_t1, ing):
    parts = _parts(spark, fx_t1)
    job = ing.begin()
    # simulate a crash: part directory exists but its manifest does not
    pd_ = os.path.join(ing.ingest_dir, job, "parts")
    os.makedirs(os.path.join(pd_, "part-00000"))
    with open(os.path.join(pd_, "part-00000", "garbage"), "w") as f:
        f.write("torn")
    m = ing.add_part(job, 0, parts[0])
    assert not m.get("skipped") and m["rows"] == parts[0].count()


def test_finalized_job_refuses_late_parts_and_schema_drift(
        spark, fx_t1, ing):
    parts = _parts(spark, fx_t1)
    job = ing.begin()
    ing.add_part(job, 0, parts[0])
    with pytest.raises(IngestError, match="schema"):
        ing.add_part(job, 1, parts[1].select("url"))  # dropped columns
    ing.add_part(job, 1, parts[1])
    ing.finalize(job)
    with pytest.raises(IngestError, match="finalized"):
        ing.add_part(job, 2, parts[2])
    # the retry contract SURVIVES finalize: re-submitting an
    # already-committed part (lost-response retry after a coordinator
    # finalized) is still a no-op, never an error
    again = ing.add_part(job, 1, parts[1])
    assert again["skipped"] is True


def test_finalize_validates_part_number_set(spark, fx_t1, ing):
    """The right NUMBER of wrong parts must not finalize: expected
    parts {0,1,2} with {0,1,3} received names both the missing and the
    unexpected numbers."""
    parts = _parts(spark, fx_t1)
    job = ing.begin(expected_parts=3)
    ing.add_part(job, 0, parts[0])
    ing.add_part(job, 1, parts[1])
    ing.add_part(job, 3, parts[2])
    with pytest.raises(IngestError, match=r"missing.*\[2\].*\[3\]"):
        ing.finalize(job)


def test_finalized_corpus_feeds_pipeline_unchanged(spark, fx_t1, ing):
    """The ingested corpus must link identically to the straight read —
    the multipart path is transport, not transformation."""
    from refined_spark.pipeline import run_pipeline

    parts = _parts(spark, fx_t1)
    job = ing.begin(expected_parts=3)
    for i, p in enumerate(parts):
        ing.add_part(job, i, p)
    ing.finalize(job)
    via_ingest = run_pipeline(spark, fx_t1, mode="spans",
                              documents=ing.read(job))
    straight = run_pipeline(spark, fx_t1, mode="spans")
    cols = ["url", "start", "pred_qcode"]
    a = {tuple(r) for r in via_ingest["links"].select(cols).collect()}
    b = {tuple(r) for r in straight["links"].select(cols).collect()}
    assert a == b and a
    via_ingest["unpersist"]()
    straight["unpersist"]()
