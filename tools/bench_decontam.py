"""Sizing study for benchmark decontamination (r4 verdict item 4 —
the most expensive headline query at 5.4s): measure

1. n-gram explode volume vs n (the irreducible cost driver of the
   GPT-3 rule) with and without the scan-side array_distinct pre-agg,
2. wall time of drop_contaminated under broadcast vs shuffle join for
   the benchmark gram set (the ``broadcast_bench`` hatch crossover).

Prints one JSON line; numbers land in BASELINE.md.

Usage: python tools/bench_decontam.py [n ...]   (default 4 8 13)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from refined_spark.operators.decontam import (  # noqa: E402
    _ngrams, benchmark_ngrams, drop_contaminated)
from refined_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NS = [int(a) for a in sys.argv[1:]] or [4, 8, 13]


def main() -> None:
    spark = get_spark("bench_decontam", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # benchmark side: a deterministic slice of the corpus itself so
    # contamination is guaranteed non-vacuous at every n
    bench = (docs.where("doc_id % 97 = 0")
             .select(F.col("doc_id").alias("bench_id"), "text"))
    n_docs = docs.count()
    out: dict = {"sf_dir": SF_DIR, "n_docs": n_docs, "by_n": {}}

    for n in NS:
        row = {}
        t0 = time.time()
        row["grams_raw"] = docs.select(
            F.explode(_ngrams("text", n)).alias("g")).count()
        row["explode_count_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        row["grams_distinct_per_doc"] = docs.select(
            F.explode(F.array_distinct(_ngrams("text", n)))
            .alias("g")).count()
        row["explode_distinct_sec"] = round(time.time() - t0, 2)
        row["bench_grams"] = benchmark_ngrams(bench, n).count()
        for label, bcast in (("broadcast", True), ("shuffle", False)):
            t0 = time.time()
            kept = drop_contaminated(docs, bench, n,
                                     broadcast_bench=bcast).count()
            row[f"{label}_sec"] = round(time.time() - t0, 2)
            row[f"{label}_kept"] = kept
        out["by_n"][str(n)] = row

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
