"""Structured Streaming surface — incremental ingest of the web-page /
events stream.

The reference is strictly batch; its closest analog is the API's multipart
ingest + background job (/root/reference/api/app/endpoints/refined_api.py:55-167,
noted in SURVEY.md §2.6). We expose the genuine Spark streaming model:

- windowed aggregation with watermarks (late-data-tolerant counts)
- incremental ER front-end: the extraction + mention stages are stateless
  maps, so the same operators run under ``readStream`` unchanged.

Tests drive these with the file source + ``Trigger.AvailableNow`` so they
are deterministic (no wall-clock dependence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """events(ts TIMESTAMP, event_type STRING, value DOUBLE) →
    per-(window, event_type) count + value sum. Works identically on a
    batch or streaming DataFrame (same logical plan; the streaming planner
    adds state + watermark eviction)."""
    # parquet written by pandas/arrow can carry TIMESTAMP_NTZ; watermarks
    # require TIMESTAMP (with local tz), so normalize first
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "value_sum")
    )


def streaming_mentions(spark, documents_path: str, match_keys: list[str],
                       schema) -> DataFrame:
    """Incremental mention detection over a parquet-file stream of
    input_hint-shaped documents. Stateless → no watermark needed."""
    from ..operators.extract import with_extracted_text
    from ..operators.mentions import detect_mentions

    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16")
        .load(documents_path)
    )
    docs = with_extracted_text(stream).withColumn(
        "text", F.col("extracted")).drop("extracted")
    return detect_mentions(spark, docs, match_keys)
