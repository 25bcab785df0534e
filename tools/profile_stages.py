"""Stage-by-stage wall-time profile of the PRODUCTION (array-native) e2e
pipeline at one master — the same stage composition run_pipeline executes:

    dict artifact -> fused extract+detect (mapInPandas) ->
    mention_candidate_arrays -> observed pairs -> with_candidate_logits ->
    links_from_logits -> cluster_mentions

Usage: python tools/profile_stages.py local[8] 8 <fixture_dir> <warmup_dir> \
           [typing_mode]
Each stage is materialized (persist + count) so downstream stages are not
re-timed. Prints one JSON line.

``typing_mode`` (default ``prior``) selects the ET protocol exactly as
run_pipeline does: ``et`` adds a timed ``et_table`` stage (the F4
linear+sigmoid pass over the distinct context vocabulary) and threads
the typing frame into the scoring stage — so an A/B of the two modes
attributes the e2e delta per stage: identical stages up to
candidate_arrays, the feature build cost in et_table + logits_links,
and the downstream link-set-shape effect in clusters (r4 verdict
Missing #5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master, parts, fixture_dir, warmup_dir = sys.argv[1:5]
    typing_mode = sys.argv[5] if len(sys.argv) > 5 else "prior"
    from refined_spark.operators.candidates import (
        mention_candidate_arrays,
        pem_surface_arrays,
    )
    from refined_spark.operators.clustering import cluster_mentions
    from refined_spark.operators.extract import extracted_text_col
    from refined_spark.operators.mentions import detect_mention_rows
    from refined_spark.operators.scoring import (
        links_from_logits,
        observed_pairs_from_mentions,
        with_candidate_logits,
    )
    from refined_spark.pipeline import (
        _default_dict_dir,
        load_tables,
        load_weights,
        run_pipeline,
        write_match_dictionary,
    )
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
        run_pipeline(spark, warmup_dir, mode="e2e")["clusters"].count()

        t = step("load_tables", lambda: load_tables(spark, fixture_dir))
        dict_path = step("dict_artifact", lambda: write_match_dictionary(
            t["pem"], t["entity"], _default_dict_dir(fixture_dir),
            reuse=False))
        docs = t["documents"].withColumn("text", extracted_text_col("html"))
        mentions = step("extract_detect", lambda: mat(
            detect_mention_rows(spark, docs, dict_path=dict_path)))
        pem_arrays = step("pem_arrays", lambda: mat(
            pem_surface_arrays(t["pem"], t["entity"])))
        cand_arr = step("candidate_arrays", lambda: mat(
            mention_candidate_arrays(mentions, pem_arrays)))
        pairs = step("observed_pairs", lambda: mat(
            observed_pairs_from_mentions(mentions, pem_arrays)))
        weights = load_weights(t["ed_weights"])
        typing_frame = None
        if typing_mode == "et":
            from refined_spark.operators.entity_typing import (
                class_names_sorted, et_confidence_table)
            from refined_spark.operators.wikidata import (
                class_vocab_from_edges)

            names = class_names_sorted(
                class_vocab_from_edges(t["class_edges"]))
            typing_frame = step("et_table", lambda: mat(
                et_confidence_table(
                    mentions.select("ctx_word").distinct(), names)))
        elif typing_mode != "prior":
            raise ValueError(f"typing_mode must be prior|et, "
                             f"got {typing_mode!r}")
        links = step("logits_links", lambda: mat(links_from_logits(
            with_candidate_logits(cand_arr, t["entity"], t["entity_emb"],
                                  t["topic_class"], weights, pairs=pairs,
                                  typing_frame=typing_frame))))
        step("clusters", lambda: cluster_mentions(links).count())
        times["total"] = round(sum(times.values()), 2)
        print(json.dumps(dict(master=master, typing_mode=typing_mode,
                              n_links=links.count(), **times)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
