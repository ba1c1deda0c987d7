"""Full-suite timing sweep (VERDICT r5 #5): wall-time EVERY registry
query once per round, so no gate can grow silently expensive while the
headline bench looks fine (q96 reached 2.9 s before anyone timed it).

Method: bench.py's discipline at reduced cost — one warmup pass at the
smallest SF (Python-worker import storm + JVM codegen amortized), then
min-of-N (default 2) measured reps at $SPARK_GRAFT_SF_DIR, forced
through the noop sink. Writes BENCH/full_suite.json:
{"sf", "cpus", "reps", "total_sec", "queries": {name: sec},
 "over_threshold": [names > $PDA_SUITE_THRESHOLD (default 3 s)]} —
anything in over_threshold owes a plan audit before the next round.

Usage: python scripts/bench_full_suite.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PDA_SUITE_REPS", "2"))
    threshold = float(os.environ.get("PDA_SUITE_THRESHOLD", "3.0"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    os.environ.setdefault("PDA_DRIVER_MEM", "32g")

    from pda_spark.plans import registry
    from pda_spark.session import get_spark

    spark = get_spark("pda-full-suite", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    names = list(registry.QUERIES)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        t0 = time.time()
        force(registry.QUERIES[name][0](spark, warm_dir))
        print(f"warm {name} {time.time() - t0:.2f}s", file=sys.stderr, flush=True)

    times: dict[str, float] = {}
    for rep in range(reps):
        for name in names:
            t0 = time.time()
            force(registry.QUERIES[name][0](spark, sf_dir))
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            print(f"rep{rep} {name} {dt:.2f}s", file=sys.stderr, flush=True)

    result = {
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "n_queries": len(names),
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
        "over_threshold": sorted(
            [n for n, t in times.items() if t > threshold],
            key=lambda n: -times[n],
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "full_suite.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
