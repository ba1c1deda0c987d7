"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times individual registry queries through the noop sink at an arbitrary
SF dir, with warmup at sf0.001 and min-of-N reps, and can dump
explain('formatted') plans. bench.py stays frozen; numbers from this
file are cited in OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain OUTDIR] q124_dbscan q34_lsh_neardup ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write <q>.txt explain('formatted')")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("PDA_DRIVER_MEM", "32g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pda_spark.plans import registry
    from pda_spark.session import get_spark

    spark = get_spark("pda-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    times: dict[str, float] = {}
    for name in args.queries:
        fn = registry.QUERIES[name][0]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            force(fn(spark, warm_dir))
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            force(fn(spark, args.sf))
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            print(f"  {name} rep{rep}: {dt}s", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
