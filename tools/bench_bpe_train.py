"""Measure the BPE trainer's two merge-loop strategies (r4 verdict
"What's wrong #3" → r5 item 3): per-merge cost of the distributed loop
(one pair-count agg + 1-row collect + fold rewrite per round — i.e. one
scheduled Spark job round-trip per merge) vs the driver fast path (the
collected Zipf word-frequency table through the sequential loop).

Prints one JSON line; numbers land in BASELINE.md.

Usage: python tools/bench_bpe_train.py [n_driver_merges] [n_dist_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from refined_spark.operators.bpe import (  # noqa: E402
    train_bpe_spark, word_frequencies)
from refined_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_DRIVER = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
N_DIST = int(sys.argv[2]) if len(sys.argv) > 2 else 48


def main() -> None:
    spark = get_spark("bench_bpe_train", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    n_words = word_frequencies(docs).count()

    t0 = time.time()
    m_driver = train_bpe_spark(docs, N_DRIVER)
    t_driver = time.time() - t0

    t0 = time.time()
    m_dist = train_bpe_spark(docs, N_DIST, driver_vocab_limit=0)
    t_dist = time.time() - t0

    assert m_driver[:len(m_dist)] == m_dist, "paths disagree"
    print(json.dumps({
        "sf_dir": SF_DIR, "distinct_words": n_words,
        "driver_path": {"n_merges": len(m_driver),
                        "wall_sec": round(t_driver, 2),
                        "sec_per_merge": round(
                            t_driver / max(len(m_driver), 1), 4)},
        "distributed_path": {"n_merges": len(m_dist),
                             "wall_sec": round(t_dist, 2),
                             "sec_per_merge": round(
                                 t_dist / max(len(m_dist), 1), 4)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
