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
