"""A/B/C benchmark: the r3 dedup_minhash regression (2.34s r2 -> 3.03s r3
driver bench at sf0.1) — isolate the signature persist cost and the
round-4 max_bucket pre-pass cost from host noise, alternating variants
in ONE session (the bench protocol's drift trick).

Variants (full q_dedup_minhash pipeline: signatures -> LSH pairs ->
jaccard verify -> ordered collect):

  A  production        — signature persist ON, max_bucket cap ON
  B  no_sig_persist    — track() monkeypatched to identity inside
                         lsh_candidate_pairs (jaccard_verify keeps its
                         caches — they fixed a different defect)
  C  no_bucket_cap     — persist ON, max_bucket=None (r3's exact shape,
                         before this round's cap pre-pass)

All variants must return the same pair count (asserted).

Usage: python tools/bench_dedup_persist.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refined_spark import caching  # noqa: E402
from refined_spark.operators import dedup  # noqa: E402
from refined_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_dedup_persist", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entry  # noqa: E402 — the bench corpus builder

    corpus = entry._docs_with_copies(spark, SF_DIR).persist()
    corpus.count()

    real_track = dedup.track

    def run(variant: str) -> tuple[float, int]:
        if variant == "no_sig_persist":
            dedup.track = lambda df: df
        else:
            dedup.track = real_track
        max_bucket = None if variant == "no_bucket_cap" \
            else dedup.config.LSH_MAX_BUCKET
        t0 = time.time()
        pairs = dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(corpus), max_bucket=max_bucket)
        # track registration is eager (function-call time), so restoring
        # it HERE keeps jaccard_verify's persists in every variant — they
        # fixed a different defect (the r3 corpus-scan asymptotics) and
        # are not under test.
        dedup.track = real_track
        got = (dedup.jaccard_verify(pairs, corpus, threshold=0.999999)
               .select("id_a", "id_b").count())
        dt = time.time() - t0
        dedup.track = real_track
        caching.release_caches()
        return dt, got

    variants = ["production", "no_sig_persist", "no_bucket_cap"]
    counts = set()
    times: dict[str, list[float]] = {v: [] for v in variants}
    for v in variants:  # one warmup each
        _, n = run(v)
        counts.add(n)
    assert len(counts) == 1, counts
    for _ in range(n_rounds):
        for v in variants:
            dt, n = run(v)
            assert n in counts, (v, n, counts)
            times[v].append(dt)
    out = {v: dict(median=round(statistics.median(ts), 2),
                   runs=[round(t, 2) for t in ts])
           for v, ts in times.items()}
    out["pairs"] = counts.pop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
