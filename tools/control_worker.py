"""CPU-bound scaling CONTROL: a pure-JVM, shuffle-free, Python-free job
(sum of xxhash64 over a range) timed at one master.

Usage: python tools/control_worker.py <master> <parts> <rows>

Purpose: the sandbox host's throughput drifts ~2x on a minutes timescale
(shared hypervisor). The control job has no engine overhead to hide — on
a healthy exclusive host its N->4N efficiency is ~1.0 by construction, so
a depressed control efficiency measured back-to-back with the e2e pairs
quantifies how much of the e2e efficiency number is host state rather
than engine scaling. Printed into BENCH json as `control_*`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, parts, rows = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from refined_spark.session import get_spark

    spark = get_spark(f"control_{master}", master=master,
                      shuffle_partitions=parts)
    try:
        expr = "sum(cast(xxhash64(id, id + 1, id + 2) as decimal(38, 0))) as h"
        # warmup (JIT)
        spark.range(rows // 8, numPartitions=parts).selectExpr(
            expr).collect()
        t0 = time.time()
        spark.range(rows, numPartitions=parts * 4).selectExpr(
            expr).collect()
        dt = time.time() - t0
        print(json.dumps(dict(master=master, seconds=round(dt, 3),
                              rows=rows)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
