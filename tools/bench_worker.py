"""One bench measurement in a clean process (fresh JVM).

Usage: python tools/bench_worker.py <master> <shuffle_partitions> \
           <fixture_dir> <mode> <warmup_fixture_dir> [typing_mode]

Runs a warmup pipeline (small tier, same session: JIT + python workers +
page cache warm), then the timed run. Prints one JSON line on stdout.
typing_mode defaults to 'prior' (the class-prior stand-in); 'et' runs
the reference's real F4 linear+sigmoid entity-typing path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, parts, fixture_dir, mode, warmup_dir = sys.argv[1:6]
    typing_mode = sys.argv[6] if len(sys.argv) > 6 else "prior"
    from refined_spark.pipeline import run_pipeline
    from refined_spark.session import get_spark

    spark = get_spark(f"bench_{master}", master=master,
                      shuffle_partitions=int(parts))
    try:
        run_pipeline(spark, warmup_dir, mode=mode,
                     typing_mode=typing_mode)["clusters"].count()
        n_docs = spark.read.parquet(
            os.path.join(fixture_dir, "documents.parquet")).count()
        t0 = time.time()
        res = run_pipeline(spark, fixture_dir, mode=mode,
                           typing_mode=typing_mode)
        n_rows = res["clusters"].count()
        dt = time.time() - t0
        n_mentions = res["mentions"].count()
        print(json.dumps(dict(master=master, seconds=round(dt, 3),
                              n_docs=n_docs, n_mentions=n_mentions,
                              n_rows=n_rows)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
