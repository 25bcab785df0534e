"""Paired A/B: typing_mode='prior' vs 'et' e2e cost at local[32].

The r4 protocol session's single back-to-back pair measured the ET leg
FASTER (70.2 s) than the prior leg (101.1 s) — physically impossible
for a strict superset of work, i.e. pure host drift landing on the
prior leg. This tool produces the defensible number: N alternating
pairs (P,E / E,P order flipped per pair so slow windows don't land on
one mode systematically), each leg a fresh pinned JVM via
tools/bench_worker.py (the protocol's own isolation), reporting the
per-mode MIN (one-sided-drift logic from bench.py) and the min-based
delta.

Usage: python tools/bench_et_ab.py [n_pairs]   (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def leg(typing_mode: str, fx: str, warm: str) -> float:
    cmd = [sys.executable, os.path.join(REPO, "tools", "bench_worker.py"),
           f"local[{CPUS}]", str(CPUS), fx, "e2e", warm, typing_mode]
    import shutil
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{CPUS - 1}", *cmd]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=2400, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])["seconds"]


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from refined_spark.fixtures.gen import ensure_fixtures
    fx = ensure_fixtures(os.environ.get("SPARK_GRAFT_BENCH_TIER", "bench"))
    warm = ensure_fixtures("t2")

    pairs = []
    for i in range(n_pairs):
        order = ["prior", "et"] if i % 2 == 0 else ["et", "prior"]
        res = {m: leg(m, fx, warm) for m in order}
        pairs.append(res)
        print(json.dumps({"pair": i, **res}), flush=True)

    best = {m: min(p[m] for p in pairs) for m in ("prior", "et")}
    print(json.dumps({
        "pairs": pairs,
        "min_prior_sec": best["prior"],
        "min_et_sec": best["et"],
        "et_over_prior_min_ratio": round(best["et"] / best["prior"], 3),
    }))


if __name__ == "__main__":
    main()
