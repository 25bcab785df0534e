"""Bench harness (driver-run per round; BENCH_r{N}.json).

Measures:

1. headline relational + training-data queries at $SPARK_GRAFT_SF_DIR on
   local[$SPARK_GRAFT_CPUS]
2. the full ER pipeline in its production configuration (mode="e2e":
   raw HTML -> extraction -> dictionary MD -> blocking -> coref -> scoring
   -> linking -> transitive clusters) over the bench fixture corpus —
   docs/sec
3. the north_rule scaling evidence: the SAME job on the SAME input at
   local[8] vs local[32]; efficiency = (throughput_32 / throughput_8) / 4.

Each scaling measurement runs in its own subprocess (fresh JVM — Spark's
PythonAccumulator does not survive session recreation in one process)
with an in-session warmup run (JIT + python workers + page cache), so the
timed run measures steady-state compute, which is what a 1000-executor
job runs in ~100% of the time.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MODE = os.environ.get("SPARK_GRAFT_BENCH_MODE", "e2e")


def run_worker(master: str, parts: int, fixture_dir: str,
               warmup_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_worker.py"),
         master, str(parts), fixture_dir, MODE, warmup_dir],
        capture_output=True, text=True, timeout=2400, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_headline_queries() -> dict[str, float]:
    import __spark_entry__ as entrymod
    from refined_spark.session import get_spark

    names = ["lineitem_agg", "join_agg", "window_topk", "date_agg",
             "dedup_exact", "dedup_minhash", "ann_cosine_topk",
             "quality", "token_count", "lang_id"]
    qs = entrymod.queries()
    out = {}
    spark = get_spark("bench_queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    try:
        for name in names:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return out


def main() -> None:
    from refined_spark.fixtures.gen import ensure_fixtures

    fx = ensure_fixtures(os.environ.get("SPARK_GRAFT_BENCH_TIER", "bench"))
    warm = ensure_fixtures("t2")

    queries = run_headline_queries()

    r8 = run_worker("local[8]", 8, fx, warm)
    r32 = run_worker(f"local[{CPUS}]", CPUS, fx, warm)
    thr8 = r8["n_docs"] / r8["seconds"]
    thr32 = r32["n_docs"] / r32["seconds"]
    eff = (thr32 / thr8) / (CPUS / 8)

    result = {
        "metric": "er_pipeline_sec_local32",
        "value": r32["seconds"],
        "unit": "sec",
        "queries": {**queries,
                    "er_pipeline_local8": r8["seconds"],
                    "er_pipeline_local32": r32["seconds"]},
        "sf": 0.1,
        "pipeline_mode": MODE,
        "n_docs": r32["n_docs"],
        "n_mentions": r32["n_mentions"],
        "docs_per_sec_local8": round(thr8, 1),
        "docs_per_sec_local32": round(thr32, 1),
        "mentions_per_sec_local32": round(r32["n_mentions"]
                                          / r32["seconds"], 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
