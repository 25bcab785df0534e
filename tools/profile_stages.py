"""Stage-by-stage wall-time profile of the e2e pipeline at one master.

Usage: python tools/profile_stages.py local[8] 8 <fixture_dir> <warmup_dir>
Prints one JSON line with per-stage seconds (each stage materialized with
a noop write so downstream stages are NOT re-timed — uses persist()).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, parts, fixture_dir, warmup_dir = sys.argv[1:5]
    from pyspark.sql import functions as F

    from refined_spark.operators.candidates import generate_candidates
    from refined_spark.operators.clustering import cluster_mentions
    from refined_spark.operators.extract import with_extracted_text
    from refined_spark.operators.mentions import detect_mentions
    from refined_spark.operators.scoring import extract_links, score_candidates
    from refined_spark.pipeline import (load_tables, load_weights,
                                        match_dictionary, run_pipeline)
    from refined_spark.session import get_spark

    spark = get_spark(f"profile_{master}", master=master,
                      shuffle_partitions=int(parts))
    times = {}

    def step(name, f):
        t0 = time.time()
        out = f()
        times[name] = round(time.time() - t0, 2)
        print(f"  {name}: {times[name]}s", file=sys.stderr)
        return out

    def mat(df):
        df.persist()
        df.count()
        return df

    try:
        # warmup
        run_pipeline(spark, warmup_dir, mode="e2e")["clusters"].count()

        t = step("load_tables", lambda: load_tables(spark, fixture_dir))
        keys = step("match_dictionary",
                    lambda: match_dictionary(t["pem"], t["entity"]))
        from refined_spark.operators.mentions import fused_extract_detect
        mentions = step("fused_extract_detect",
                        lambda: mat(fused_extract_detect(
                            spark, t["documents"], keys)))
        cands = step("candidates",
                     lambda: mat(generate_candidates(
                         mentions, t["pem"], t["entity"])))
        weights = load_weights(t["ed_weights"])
        scored = step("scoring",
                      lambda: mat(score_candidates(
                          cands, mentions, t["entity"], t["entity_emb"],
                          t["topic_class"], weights)))
        links = step("links", lambda: mat(extract_links(scored, mentions)))
        step("clusters", lambda: cluster_mentions(links).count())
        times["total"] = round(sum(times.values()), 2)
        print(json.dumps(dict(master=master, **times)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
