"""Structured Streaming: windowed aggregation + incremental mention
detection, driven deterministically with Trigger.AvailableNow."""

import os

import pyspark.sql.functions as F

from refined_spark.streaming.events import (
    streaming_mentions,
    windowed_event_counts,
)


def _stream_dir(tmp_path_factory, file_path):
    """Streaming file source needs a directory; driver testdata are single
    parquet files — symlink into a fresh dir."""
    if os.path.isdir(file_path):
        return file_path
    d = tmp_path_factory.mktemp("stream_src")
    os.symlink(file_path, os.path.join(d, os.path.basename(file_path)))
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, sf001, tmp_path_factory):
    events_path = _stream_dir(tmp_path_factory,
                              os.path.join(sf001, "events.parquet"))
    batch = spark.read.parquet(events_path)
    want = {tuple(r) for r in windowed_event_counts(batch).collect()}

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .load(events_path)
    )
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    # append mode with watermark emits only windows closed by the watermark;
    # with availableNow over a finite file set the final watermark closes
    # all but the last window(s) — so got ⊆ want and covers almost all.
    assert got
    assert got <= want
    assert len(got) >= len(want) - 10


def test_streaming_mentions_incremental(spark, fx_t1, tmp_path_factory):
    from refined_spark.pipeline import load_tables, match_dictionary

    t = load_tables(spark, fx_t1)
    keys = match_dictionary(t["pem"], t["entity"])
    schema = t["documents"].schema
    out_dir = str(tmp_path_factory.mktemp("m_out"))
    ckpt = str(tmp_path_factory.mktemp("m_ckpt"))
    docs_dir = _stream_dir(tmp_path_factory,
                           os.path.join(fx_t1, "documents.parquet"))
    m = streaming_mentions(spark, docs_dir, keys, schema)
    q = (
        m.writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r["url"], r["start"], r["length"])
           for r in spark.read.parquet(out_dir).collect()}
    gold = spark.read.parquet(os.path.join(fx_t1, "gold_spans.parquet"))
    want = {(r["url"], r["start"], r["length"])
            for r in gold.where("dict_matchable").collect()}
    assert got == want


def test_streaming_dedup_first_seen(spark, tmp_path_factory):
    from refined_spark.streaming.events import (
        run_stream_to_batch,
        streaming_dedup_first_seen,
    )

    src = str(tmp_path_factory.mktemp("dedup_src"))
    rows = [(i, f"text {i % 7}", "2026-01-01 00:%02d:00" % (i % 60))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(
        spark.read.parquet(src).schema).format("parquet").load(src))
    out = run_stream_to_batch(streaming_dedup_first_seen(stream))
    got = sorted(r["content_hash"] for r in out.collect())
    want = sorted(r["h"] for r in spark.read.parquet(src)
                  .select(F.md5(F.col("text").cast("binary")).alias("h"))
                  .distinct().collect())
    assert got == want and len(got) == 7


def test_running_totals_state_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState: totals must accumulate across MICRO-BATCHES
    (one file per trigger), not just within one."""
    from refined_spark.streaming.events import (
        run_stream_to_batch,
        running_type_totals,
    )

    src = str(tmp_path_factory.mktemp("totals_src"))
    df = spark.createDataFrame(
        [(f"e{i % 3}", float(i)) for i in range(60)],
        "event_type string, value double")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    df.repartition(4).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(df.schema).format("parquet")
              .option("maxFilesPerTrigger", "1").load(src))
    out = run_stream_to_batch(running_type_totals(stream), mode="update")
    # update mode appends one emission per key per batch; the final state
    # is the row with the max n_events per key
    final = {r["event_type"]: (r["n_events"], r["value_sum"])
             for r in out.orderBy("n_events").collect()}
    want = {r["event_type"]: (r["n"], round(r["s"], 4))
            for r in df.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()}
    assert final == want
    # and state really spanned batches: more emissions than keys
    assert out.count() > len(want)


def test_streaming_links_equals_batch(spark, fx_t1, tmp_path_factory):
    """Streamed corpus (3 micro-batches) produces byte-identical links
    to the one-shot batch pipeline — the batch-boundary-invariance
    contract streaming_links' module docstring claims."""
    from refined_spark.pipeline import run_pipeline
    from refined_spark.streaming.linking import (
        split_documents,
        streaming_links,
    )

    res = run_pipeline(spark, fx_t1, mode="spans")
    want = {tuple(r) for r in res["links"].select(
        "url", "start", "pred_qcode").collect()}
    res["unpersist"]()

    split = split_documents(
        spark, os.path.join(fx_t1, "documents.parquet"), 3,
        dest=str(tmp_path_factory.mktemp("stream_docs")))
    got_df = streaming_links(
        spark, fx_t1, split, mode="spans", max_files_per_trigger=1,
        out_dir=str(tmp_path_factory.mktemp("stream_links_out")))
    got = {tuple(r) for r in got_df.select(
        "url", "start", "pred_qcode").collect()}
    assert got == want
    # non-vacuous: the stream really ran as multiple micro-batches
    n_parts = len([f for f in os.listdir(split) if f.endswith(".parquet")])
    assert n_parts == 3


def test_streaming_links_e2e_mode_matches_batch_e2e(spark, fx_t1,
                                                    tmp_path_factory):
    """Dictionary-MD mode streams too (no gold spans needed — the pure
    per-document production shape)."""
    from refined_spark.pipeline import run_pipeline
    from refined_spark.streaming.linking import (
        split_documents,
        streaming_links,
    )

    res = run_pipeline(spark, fx_t1, mode="e2e")
    want = {tuple(r) for r in res["links"].select(
        "url", "start", "pred_qcode").collect()}
    res["unpersist"]()

    split = split_documents(
        spark, os.path.join(fx_t1, "documents.parquet"), 2,
        dest=str(tmp_path_factory.mktemp("stream_docs_e2e")))
    got_df = streaming_links(
        spark, fx_t1, split, mode="e2e", max_files_per_trigger=1,
        out_dir=str(tmp_path_factory.mktemp("stream_links_e2e_out")))
    got = {tuple(r) for r in got_df.select(
        "url", "start", "pred_qcode").collect()}
    assert got == want


def test_periodic_clusters_over_stream_sink(spark, fx_t1, tmp_path_factory):
    """Continuous-ER composition: stream the corpus (2 micro-batches),
    then run the periodic batch cluster job over the accumulated link
    sink — clusters equal the one-shot batch pipeline's."""
    from refined_spark.pipeline import run_pipeline
    from refined_spark.streaming.linking import (
        periodic_clusters,
        split_documents,
        streaming_links,
    )

    res = run_pipeline(spark, fx_t1, mode="spans")
    want = {tuple(r) for r in res["clusters"].collect()}
    res["unpersist"]()

    split = split_documents(
        spark, os.path.join(fx_t1, "documents.parquet"), 2,
        dest=str(tmp_path_factory.mktemp("stream_docs_cl")))
    sink = str(tmp_path_factory.mktemp("stream_links_cl_out"))
    streaming_links(spark, fx_t1, split, mode="spans",
                    max_files_per_trigger=1, out_dir=sink)
    got = {tuple(r) for r in
           periodic_clusters(spark, sink)["clusters"].collect()}
    assert got == want


def test_streaming_links_et_mode_equals_batch_et(spark, fx_t1,
                                                 tmp_path_factory):
    """Batch-boundary invariance holds under typing_mode='et' too: the
    confidence row is a pure function of (ctx_word, class vocab), so a
    per-batch typing frame carries exactly the full-corpus values for
    the ctx words present. 2-batch ET stream == one-shot ET pipeline ==
    the independently generated expected_links_et golden."""
    import pandas as pd

    from refined_spark.streaming.linking import (
        split_documents,
        streaming_links,
    )

    split = split_documents(
        spark, os.path.join(fx_t1, "documents.parquet"), 2,
        dest=str(tmp_path_factory.mktemp("stream_docs_et")))
    got_df = streaming_links(
        spark, fx_t1, split, mode="spans", typing_mode="et",
        max_files_per_trigger=1,
        out_dir=str(tmp_path_factory.mktemp("stream_links_et_out")))
    got = {(r["url"], r["start"]): r["pred_qcode"]
           for r in got_df.select("url", "start", "pred_qcode").collect()}
    exp = pd.read_parquet(os.path.join(fx_t1, "expected_links_et.parquet"))
    want = {(r["url"], r["start"]):
            (r["pred_qcode"] if pd.notna(r["pred_qcode"]) else None)
            for _, r in exp.iterrows()}
    assert got == want and got


def test_streaming_links_refuses_foreign_sink(spark, fx_t1,
                                              tmp_path_factory):
    """A FRESH checkpoint must not adopt a sink holding another run's
    batch dirs: new batch ids restart at 0 and any higher stale batch
    would silently merge into read_link_sink's result. The guard fires
    before any resource build."""
    import pytest

    from refined_spark.streaming.linking import (split_documents,
                                                 streaming_links)

    split = split_documents(
        spark, os.path.join(fx_t1, "documents.parquet"), 2,
        dest=str(tmp_path_factory.mktemp("guard_docs")))
    out = str(tmp_path_factory.mktemp("guard_out"))
    os.makedirs(os.path.join(out, "batch-00000007"))
    with pytest.raises(ValueError, match="batch dir"):
        streaming_links(spark, fx_t1, split, mode="spans", out_dir=out,
                        checkpoint_dir=str(
                            tmp_path_factory.mktemp("guard_ckpt")))
