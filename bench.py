"""Bench harness (driver-run per round; BENCH_r{N}.json).

Measures, on the sf0.1-equivalent corpus:

1. headline relational queries at $SPARK_GRAFT_SF_DIR on
   local[$SPARK_GRAFT_CPUS]
2. the full ER pipeline (extract → block → coref → score → link →
   transitive clusters) over the bench fixture corpus (100k docs,
   FIXTURES.md) — docs/sec
3. the north_rule scaling evidence: the SAME pipeline on the SAME input at
   local[8] vs local[32]; efficiency = (throughput_32 / throughput_8) / 4.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS_ENV = "SPARK_GRAFT_BENCH_TIER"


def run_er_pipeline(master: str, shuffle_partitions: int,
                    fixture_dir: str) -> tuple[float, int, int]:
    """Run the full pipeline; returns (seconds, n_docs, n_mentions)."""
    from refined_spark.pipeline import run_pipeline
    from refined_spark.session import get_spark

    spark = get_spark(f"bench_{master}", master=master,
                      shuffle_partitions=shuffle_partitions)
    try:
        n_docs = spark.read.parquet(
            os.path.join(fixture_dir, "documents.parquet")).count()
        t0 = time.time()
        res = run_pipeline(spark, fixture_dir, mode="spans")
        n_clusters = res["clusters"].count()  # materializes the whole DAG
        dt = time.time() - t0
        n_mentions = res["mentions"].count()
        assert n_clusters > 0
        return dt, n_docs, n_mentions
    finally:
        spark.stop()


def run_headline_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    names = ["lineitem_agg", "join_agg", "window_topk", "date_agg",
             "dedup_exact", "dedup_minhash", "ann_cosine_topk",
             "quality", "token_count", "lang_id"]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    from refined_spark.fixtures.gen import ensure_fixtures
    from refined_spark.session import get_spark

    tier = os.environ.get(BENCH_DOCS_ENV, "bench")
    fx = ensure_fixtures(tier)

    # 1. relational headline queries on local[CPUS]
    spark = get_spark("bench_queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    try:
        queries = run_headline_queries(spark)
    finally:
        spark.stop()

    # 2+3. ER pipeline at two parallelism levels (north_rule scaling proof)
    t8, n_docs, n_mentions = run_er_pipeline("local[8]", 8, fx)
    t32, _, _ = run_er_pipeline(f"local[{CPUS}]", CPUS, fx)
    thr8 = n_docs / t8
    thr32 = n_docs / t32
    eff = (thr32 / thr8) / (CPUS / 8)

    result = {
        "metric": "er_pipeline_sec_local32",
        "value": round(t32, 3),
        "unit": "sec",
        "queries": {**queries,
                    "er_pipeline_local8": round(t8, 3),
                    "er_pipeline_local32": round(t32, 3)},
        "sf": 0.1,
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "docs_per_sec_local8": round(thr8, 1),
        "docs_per_sec_local32": round(thr32, 1),
        "mentions_per_sec_local32": round(n_mentions / t32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
