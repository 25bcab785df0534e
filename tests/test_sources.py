"""Corpus source layer (sources/iceberg.py): the north-rule Iceberg
contract — catalog wiring gated on the runtime jar, and the identical
partition-pruning physics proven in-container on the hive-layout
date-partitioned parquet analog."""

import os

import pytest
from pyspark.sql import functions as F

from refined_spark.sources.iceberg import (
    create_documents_table,
    iceberg_available,
    iceberg_session_conf,
    read_documents,
    read_documents_partitioned,
    scan_partition_filters,
    write_documents_partitioned,
)


@pytest.fixture(scope="module")
def part_corpus(spark, fx_t1, tmp_path_factory):
    # the t1 fixture stamps every page with one crawl instant; spread it
    # over a week of crawl days (deterministic per url) so the layout has
    # partitions to prune — the real corpus contract is a rolling crawl
    docs = (spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))
            .withColumn("warc_ts", F.timestamp_add(
                "DAY", F.pmod(F.xxhash64("url"), F.lit(7)).cast("int"),
                F.col("warc_ts"))))
    path = str(tmp_path_factory.mktemp("iceberg_analog") / "documents")
    write_documents_partitioned(docs, path)
    return docs, path


def test_partitioned_write_layout(part_corpus):
    _docs, path = part_corpus
    days = [d for d in os.listdir(path) if d.startswith("warc_date=")]
    assert len(days) > 1, "corpus must span multiple day partitions"


def test_date_bounded_read_prunes_partitions(spark, part_corpus):
    docs, path = part_corpus
    days = sorted(r["d"] for r in docs.select(
        F.to_date("warc_ts").alias("d")).distinct().collect())
    bound = str(days[len(days) // 2])
    bounded = read_documents_partitioned(spark, path, start_date=bound)

    plan = scan_partition_filters(bounded)
    assert "PartitionFilters" in plan and "warc_date" in plan

    want = docs.where(F.to_date("warc_ts") >= F.lit(bound)).count()
    assert bounded.count() == want and 0 < want < docs.count()

    # pruning is physical, not just logical: the bounded scan touches
    # strictly fewer files than the full table (inputFiles() resolves
    # pre-pruning, so count the files rows actually came from)
    full_files = len(spark.read.parquet(path).inputFiles())
    read_files = bounded.select(
        F.input_file_name().alias("f")).distinct().count()
    assert read_files < full_files


def test_pipeline_runs_off_partitioned_source(spark, fx_t1, part_corpus):
    """The ER pipeline consumes the partitioned (Iceberg-shaped) source
    directly and produces the same links as the plain-parquet fixture
    read — the source layer is a drop-in."""
    from refined_spark.pipeline import run_pipeline

    _docs, path = part_corpus
    src = read_documents(spark, path).drop("warc_date")
    res = run_pipeline(spark, fx_t1, mode="spans", documents=src)
    want_res = run_pipeline(spark, fx_t1, mode="spans")
    got = {(r["url"], r["start"]): r["pred_qcode"]
           for r in res["links"].collect()}
    want = {(r["url"], r["start"]): r["pred_qcode"]
            for r in want_res["links"].collect()}
    assert got == want and got
    res["unpersist"]()
    want_res["unpersist"]()


def test_iceberg_conf_shape():
    conf = iceberg_session_conf("/tmp/wh", catalog="local")
    assert conf["spark.sql.catalog.local"] == \
        "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.local.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in \
        conf["spark.sql.extensions"]


def test_iceberg_round_trip_when_available(spark, fx_t1):
    """Full catalog round-trip (DDL with days(warc_ts) spec, append,
    time-bounded read) — runs verbatim on a cluster with the runtime
    jar; skips here (container ships no Iceberg jar, no network)."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on classpath")
    create_documents_table(spark)
    docs = spark.read.parquet(os.path.join(fx_t1, "documents.parquet"))
    from refined_spark.sources.iceberg import append_documents

    append_documents(docs)
    got = read_documents(spark, "iceberg:local.db.documents",
                         start_ts="1970-01-01")
    assert got.count() == docs.count()
