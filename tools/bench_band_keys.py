"""A/B benchmark: M6 band-key generation — Python memo UDF (production,
operators/blocking.py:band_keys_udf) vs a JVM distinct-surface variant
(char-shingle minhash in codegen per DISTINCT surface + broadcast join
back — the JVM analog of the UDF's Zipf memo).

Round-3 verdict watch item: the memo rationale (dict lookup beats
codegen on Zipf-repeated short surfaces) was plausible but unmeasured.
Alternating A/B/A/B in ONE session (the bench protocol's drift trick);
the action is count(exploded keys) — both variants must produce
bands × n_nonempty rows, asserted.

Usage: python tools/bench_band_keys.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from refined_spark import config  # noqa: E402
from refined_spark.operators.blocking import with_block_keys  # noqa: E402
from refined_spark.session import get_spark  # noqa: E402

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".fixtures", "bench")


def jvm_band_keys(mentions, sf_col: str = "norm_sf",
                  num_perm: int = config.MINHASH_PERMS,
                  bands: int = config.MINHASH_BANDS,
                  k: int = config.SHINGLE_K):
    """JVM variant: one codegen minhash per DISTINCT surface (explode
    char shingles -> xxhash64 -> partial-min groupBy, the
    minhash_signatures shape) + a broadcast join back to the mention
    frame — surfaces are Zipfian, so the distinct frame is
    vocabulary-scale."""
    nonempty = mentions.where(
        F.col(sf_col).isNotNull() & (F.length(sf_col) > 0))
    surfaces = nonempty.select(sf_col).distinct()
    lower = f"lower({sf_col})"
    sh = (f"CASE WHEN length({lower}) < {k} THEN array(xxhash64({lower})) "
          f"ELSE transform(sequence(1, length({lower}) - {k - 1}),"
          f" i -> xxhash64(substring({lower}, i, {k}))) END")
    hashed = surfaces.select(sf_col, F.explode(F.expr(sh)).alias("h"))
    mins = hashed.groupBy(sf_col).agg(
        *[F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}")
          for i in range(num_perm)])
    rows = num_perm // bands
    band_cols = [
        F.xxhash64(
            F.concat_ws(",", *[F.col(f"m{b * rows + j}").cast("string")
                               for j in range(rows)]),
            F.lit(b)).alias(f"b{b}")
        for b in range(bands)]
    keys = mins.select(sf_col, F.array(*band_cols).alias("band_keys"))
    return (nonempty.join(F.broadcast(keys), sf_col)
            .withColumn("block_key", F.explode("band_keys"))
            .drop("band_keys"))


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_band_keys", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    mentions = (spark.read.parquet(
        os.path.join(BENCH_DIR, "gold_spans.parquet"))
        .select("url", "start", "norm_sf"))
    mentions = mentions.withColumn(
        "mention_key", F.concat_ws(":", "url", "start")).persist()
    n = mentions.where(F.col("norm_sf").isNotNull()
                       & (F.length("norm_sf") > 0)).count()
    expect = n * config.MINHASH_BANDS
    print(f"mentions={n} expected_keys={expect}", file=sys.stderr)

    def run(variant: str) -> float:
        t0 = time.time()
        if variant == "python_memo":
            out = with_block_keys(mentions.select("mention_key", "norm_sf"))
        else:
            out = jvm_band_keys(mentions.select("mention_key", "norm_sf"))
        got = out.count()
        dt = time.time() - t0
        assert got == expect, (variant, got, expect)
        return dt

    times: dict[str, list[float]] = {"python_memo": [], "jvm_distinct": []}
    for _ in range(2):  # warm both paths once (JIT + memo fill)
        for v in times:
            run(v)
    for _ in range(n_rounds):
        for v in times:  # alternate within each round
            times[v].append(run(v))
    out = {v: dict(median=round(statistics.median(ts), 2),
                   runs=[round(t, 2) for t in ts],
                   rows_per_sec=int(n / statistics.median(ts)))
           for v, ts in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
