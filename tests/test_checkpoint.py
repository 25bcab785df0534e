"""A10 — resumable checkpointed pipeline: manifests, lineage, resume."""

import json
import os
import shutil

from refined_spark.checkpoint import run_pipeline_checkpointed


def test_checkpoint_run_and_resume(spark, fx_t1, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("ckpt"))

    res1 = run_pipeline_checkpointed(spark, fx_t1, run_dir, mode="spans")
    assert res1["runner"].stages_run == [
        "mentions", "candidates", "links", "clusters"]
    assert res1["runner"].stages_resumed == []
    n_clusters = res1["clusters"].count()
    assert n_clusters > 0

    # manifests carry per-partition lineage + metrics
    with open(os.path.join(run_dir, "links", "manifest.json")) as f:
        man = json.load(f)
    assert man["status"] == "ok"
    assert man["rows"] == res1["links"].count()
    assert sum(p["rows"] for p in man["partitions"]) == man["rows"]
    assert man["wall_sec"] > 0

    # full resume: nothing recomputes
    res2 = run_pipeline_checkpointed(spark, fx_t1, run_dir, mode="spans")
    assert res2["runner"].stages_run == []
    assert res2["runner"].stages_resumed == [
        "mentions", "candidates", "links", "clusters"]
    assert res2["clusters"].count() == n_clusters

    # mid-pipeline resume: invalidate 'links' -> only links recomputes;
    # clusters stays valid because the rebuilt links stage reproduces the
    # same content fingerprint (content-addressed chaining)
    shutil.rmtree(os.path.join(run_dir, "links"))
    res3 = run_pipeline_checkpointed(spark, fx_t1, run_dir, mode="spans")
    assert res3["runner"].stages_run == ["links"]
    assert res3["runner"].stages_resumed == [
        "mentions", "candidates", "clusters"]
    assert res3["clusters"].count() == n_clusters

    # results identical to the uncached pipeline
    from refined_spark.pipeline import run_pipeline

    ref = run_pipeline(spark, fx_t1, mode="spans")["clusters"]
    got = {(r["url"], r["start"], r["cluster_id"])
           for r in res3["clusters"].collect()}
    want = {(r["url"], r["start"], r["cluster_id"])
            for r in ref.collect()}
    assert got == want


def test_checkpoint_invalidation_on_input_change(spark, fx_t1, fx_t2,
                                                 tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("ckpt2"))
    run_pipeline_checkpointed(spark, fx_t1, run_dir, mode="spans")
    # different inputs -> fingerprint mismatch -> full recompute
    res = run_pipeline_checkpointed(spark, fx_t1, run_dir, mode="e2e")
    assert res["runner"].stages_resumed == []
    assert len(res["runner"].stages_run) == 4
