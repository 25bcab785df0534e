"""Diagnose scaling loss: run the e2e pipeline once at a given master with
the Spark event log enabled, then print per-stage (wall, task-time sum,
GC sum, task count, name) so the non-scaling stages are identifiable.

Usage: python tools/scaling_diag.py local[8] 8 <fixture_dir> <warmup_dir> <evlog_dir>
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, parts, fixture_dir, warmup_dir, evdir = sys.argv[1:6]
    os.makedirs(evdir, exist_ok=True)
    from refined_spark.pipeline import run_pipeline
    from refined_spark.session import get_spark

    spark = get_spark(f"diag_{master}", master=master,
                      shuffle_partitions=int(parts),
                      extra_conf={"spark.eventLog.enabled": "true",
                                  "spark.eventLog.dir": evdir,
                                  "spark.eventLog.compress": "false",
                                  "spark.eventLog.rolling.enabled":
                                      "false"})
    try:
        run_pipeline(spark, warmup_dir, mode="e2e")["clusters"].count()
        t0_ms = time.time() * 1000
        t0 = time.time()
        res = run_pipeline(spark, fixture_dir, mode="e2e")
        res["clusters"].count()
        dt = time.time() - t0
        app_id = spark.sparkContext.applicationId
    finally:
        spark.stop()

    # parse event log
    stages = {}
    t_first = None
    paths = []
    for root in glob.glob(os.path.join(evdir, "*" + app_id + "*")):
        if os.path.isdir(root):  # rolling event-log dir
            paths.extend(p for p in glob.glob(os.path.join(root, "*"))
                         if os.path.basename(p).startswith("events"))
        else:
            paths.append(root)
    for path in paths:
        # rolling dirs may hold zstd-compressed segments / status files
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[sid] = dict(
                        name=si["Stage Name"].split("\n")[0][:60],
                        wall=(comp - sub) / 1000.0 if sub and comp else None,
                        sub=sub,
                        ntasks=si["Number of Tasks"],
                        task_s=0.0, gc_s=0.0, cpu_s=0.0,
                        shuffle_write_mb=0.0, input_mb=0.0)
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, dict(
                        name="?", wall=None, sub=None, ntasks=0, task_s=0.0,
                        gc_s=0.0, cpu_s=0.0, shuffle_write_mb=0.0,
                        input_mb=0.0))
                    st["task_s"] += (ti.get("Finish Time", 0)
                                     - ti.get("Launch Time", 0)) / 1000.0
                    st["gc_s"] += tm.get("JVM GC Time", 0) / 1000.0
                    st["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                    st["shuffle_write_mb"] += tm.get(
                        "Shuffle Write Metrics", {}).get(
                        "Shuffle Bytes Written", 0) / 1e6
                    st["input_mb"] += tm.get("Input Metrics", {}).get(
                        "Bytes Read", 0) / 1e6

    # timed-run stages only: keep stages submitted after warmup ended.
    # crude split: find the largest gap-free tail whose first stage reads
    # the bench fixture; simpler: report all, sorted by submission, with
    # wall times — the warmup prefix is recognizable by size.
    rows = [dict(sid=k, **v) for k, v in sorted(stages.items())
            if v.get("sub") and v["sub"] >= t0_ms]
    print(json.dumps(dict(master=master, e2e_seconds=round(dt, 2),
                          stages=rows)))


if __name__ == "__main__":
    main()
