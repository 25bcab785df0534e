"""spark-submit job entry: checkpointed ER pipeline over a corpus dir.

Usage (via tools/submit.sh):
    spark-submit --py-files refined_spark.zip tools/run_job.py \
        <corpus_dir> <run_dir>

The corpus dir must contain the input_hint-shaped ``documents.parquet``
plus the dimension tables (pem/entity/entity_emb/topic_class/ed_weights);
``run_dir`` receives stage checkpoints + manifests and the final
``clusters`` table.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main(corpus_dir: str, run_dir: str) -> None:
    spark = SparkSession.builder.appName("refined_spark_job").getOrCreate()
    from refined_spark.checkpoint import run_pipeline_checkpointed
    from refined_spark.operators.extract import assert_extraction_contract

    t0 = time.time()
    # guard: sampled JVM-extractor vs parser-spec cross-check — a corpus
    # violating the extraction HTML contract fails loudly here instead of
    # silently shifting span offsets downstream
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n_checked = assert_extraction_contract(docs, mod=64)
    res = run_pipeline_checkpointed(spark, corpus_dir, run_dir, mode="spans")
    n_docs = res["tables"]["documents"].count()
    n_clusters = res["clusters"].select("cluster_id").distinct().count()
    dt = time.time() - t0
    print(json.dumps(dict(
        n_docs=n_docs,
        n_clusters=n_clusters,
        wall_sec=round(dt, 2),
        docs_per_sec=round(n_docs / dt, 1),
        extraction_contract_sampled=n_checked,
        stages_run=res["runner"].stages_run,
        stages_resumed=res["runner"].stages_resumed,
    )))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
