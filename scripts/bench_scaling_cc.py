"""Scaling-efficiency evidence for the iterative connected-components
star rounds (the q51/q124 CC shape, round-6 session 3): min-neighbor
contraction pre-pass + alternating large/small-star rounds, each round
one symmetrize + one map-side-combinable groupBy(min) + one equi-join
+ a fingerprint action. This probes the engine's ITERATIVE-shuffle
scaling — per-round fixed driver cost (the fingerprint) is the
non-scaling term, so the graph is sized so per-round compute
dominates.

Job: N nodes in chains of 64 (edges i -> i+1 within each chain, plus a
mid-chain shortcut i -> i+32) — chains survive the contraction
pre-pass (unlike cliques, which collapse instantly), so the star
rounds do real work for ~5-6 rounds over ~1.5N edges.

Cores axis: 1x2 vs 1x8 executor JVMs (JVM-only legs use 2 -> 8 busy
cores; see BENCH/BASELINE.md §2). Methodology: identical deterministic
input, warmup pass, alternated levels, per-level minimum over reps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_NODES = int(os.environ.get("PDA_SCALE_ROWS", str(12_000_000)))
REPS = int(os.environ.get("PDA_SCALE_REPS", "2"))
ALTERNATIONS = int(os.environ.get("PDA_SCALE_ALTERNATIONS", "3"))
EXECUTOR_MEM_MB = 8192

JOB = r"""
import os, sys, time, json
sys.path.insert(0, __REPO__)
os.environ.setdefault("SPARK_HOME", "/opt/spark")
pkg = __REPO__
pp = os.environ.get("PYTHONPATH", "")
os.environ["PYTHONPATH"] = pkg + os.pathsep + pp if pp else pkg
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

n_exec = int(os.environ["PDA_EXECUTORS"])
cpe = int(os.environ["PDA_CORES_PER_EXEC"])
mem_mb = int(os.environ["PDA_EXEC_MEM_MB"])
n_nodes = int(os.environ["PDA_N_ROWS"])
spark = (
    SparkSession.builder.master(f"local-cluster[{n_exec},{cpe},{mem_mb}]")
    .appName(f"pda-scaling-cc-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.functions.graph import connected_components

def run(n):
    base = spark.range(n, numPartitions=4 * n_exec * cpe)
    chain = base.filter(F.pmod("id", F.lit(64)) != 63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    shortcut = base.filter(F.pmod("id", F.lit(64)) < 32).select(
        F.col("id").alias("src"), (F.col("id") + 32).alias("dst")
    )
    cc = connected_components(chain.unionAll(shortcut))
    cc.write.format("noop").mode("overwrite").save()

run(n_nodes // 50)  # warmup: codegen + executor spin-up

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "2"))):
    t0 = time.time()
    run(n_nodes)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_nodes": n_nodes,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_mrows_s": round(n_nodes / elapsed / 1e6, 2)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(n_executors: int, cores_per_executor: int) -> dict:
    env = dict(
        os.environ,
        PDA_EXECUTORS=str(n_executors),
        PDA_CORES_PER_EXEC=str(cores_per_executor),
        PDA_EXEC_MEM_MB=str(EXECUTOR_MEM_MB),
        PDA_N_ROWS=str(N_NODES),
        PDA_SCALE_REPS=str(REPS),
    )
    out = subprocess.run(
        [sys.executable, "-c", JOB], env=env, capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no result from executors={n_executors}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    levels = os.environ.get("PDA_SCALE_LEVELS", "1x2,1x8")
    (lo_e, lo_c), (hi_e, hi_c) = [
        tuple(int(v) for v in part.split("x")) for part in levels.split(",")
    ]
    samples = {"lo": [], "hi": []}
    for _ in range(ALTERNATIONS):
        samples["lo"].append(run_level(lo_e, lo_c))
        samples["hi"].append(run_level(hi_e, hi_c))
    lo = min(samples["lo"], key=lambda r: r["elapsed_sec"])
    hi = min(samples["hi"], key=lambda r: r["elapsed_sec"])
    ratio = (hi_e * hi_c) / (lo_e * lo_c)
    efficiency = round(lo["elapsed_sec"] / (ratio * hi["elapsed_sec"]), 4)
    result = {
        "job": "connected components (q51/q124 CC shape): min-neighbor contraction pre-pass + iterative large/small-star rounds over 64-node chains (~1.5N edges, ~6 rounds)",
        "mode": f"local-cluster executor JVMs: {lo_e}x{lo_c} vs {hi_e}x{hi_c} (total cores {lo_e*lo_c} -> {hi_e*hi_c})",
        "n_nodes": N_NODES,
        "levels": [lo, hi],
        "all_samples": samples,
        "speedup_lo_to_hi": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_cc.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
