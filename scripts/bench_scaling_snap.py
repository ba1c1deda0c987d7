"""Scaling-efficiency evidence for the nearest-segment snap join
(q136 shape, round-6c): cell-blocked broadcast candidate join +
clamped-projection point-to-segment distance + per-point struct-min
argmin — ALL whole-stage codegen (zero Python stages), one shuffle
(the map-side-combinable argmin). This probes the engine's broadcast-
join + partial-aggregate scaling, complementing the pure-expression
Hilbert leg (BENCH/scaling_hilbert.json) and the Arrow-UDF legs
(scaling_wkb/buffer.json).

Job: spark.range(N) -> derive lon/lat by multiplicative hashing over
the river extent (codegen) -> snap_to_segments against the 100-segment
broadcast dimension (radius 0.5 deg, res 6) -> force through the noop
sink. The argmin shuffle moves only matched candidates.

Cores axis: 1x2 vs 1x8 (JVM-only legs use 2 -> 8 cores, one busy proc
per task slot; see BENCH/BASELINE.md §2). Methodology: identical
deterministic input, warmup pass, alternated levels, per-level minimum
over reps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 96M rows / 1x1->1x4 are the VALIDATED defaults (BENCH/BASELINE.md §2):
# 48M finished the lo level in ~6.5 s (fixed costs ate the denominator)
# and the 1x8 level brushes the host's ~10-busy-thread throttle — that
# configuration measured a misleading 0.50.
N_ROWS = int(os.environ.get("PDA_SCALE_ROWS", str(96_000_000)))
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
n_rows = int(os.environ["PDA_N_ROWS"])
spark = (
    SparkSession.builder.master(f"local-cluster[{n_exec},{cpe},{mem_mb}]")
    .appName(f"pda-scaling-snap-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.operators import spatial_join

# the q136 river-segment dimension (nation keys 0..24, 4 arms each)
segs_rows = []
for k in range(25):
    ax = ((k * 19) % 3600) / 100.0 - 19.0
    ay = ((k * 23) % 2000) / 100.0 + 38.0
    w = (k % 5) / 10.0 + 0.4
    h = ((k * 3) % 7) / 10.0 - 0.35
    for seg, (x0, y0, x1, y1) in enumerate(
        [(ax, ay, ax + w, ay), (ax + w, ay, ax + w, ay + h),
         (ax + w, ay + h, ax + 2 * w, ay + h), (ax + 2 * w, ay + h, ax + 3 * w, ay + 2 * h)]
    ):
        segs_rows.append((k, seg, x0, y0, x1, y1))
segs = spark.createDataFrame(
    segs_rows, "river_id int, seg int, x0 double, y0 double, x1 double, y1 double"
)

def run(n):
    pts = spark.range(n, numPartitions=4 * n_exec * cpe).select(
        F.col("id").alias("point_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(4000)) / 100.0 - 20.0).alias("lon"),
        (F.pmod(F.col("id") * 40503 + 7919, F.lit(2500)) / 100.0 + 36.0).alias("lat"),
    )
    out = spatial_join.snap_to_segments(
        pts, segs, radius=0.5, res=6,
        seg_id_cols=("river_id", "seg"), seg_cols=("x0", "y0", "x1", "y1"),
    )
    out.write.format("noop").mode("overwrite").save()

run(n_rows // 50)  # warmup: codegen compile + executor spin-up + broadcast

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "2"))):
    t0 = time.time()
    run(n_rows)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_rows": n_rows,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_mrows_s": round(n_rows / elapsed / 1e6, 2)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(n_executors: int, cores_per_executor: int) -> dict:
    env = dict(
        os.environ,
        PDA_EXECUTORS=str(n_executors),
        PDA_CORES_PER_EXEC=str(cores_per_executor),
        PDA_EXEC_MEM_MB=str(EXECUTOR_MEM_MB),
        PDA_N_ROWS=str(N_ROWS),
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
    levels = os.environ.get("PDA_SCALE_LEVELS", "1x1,1x4")
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
        "job": "nearest-segment snap join (q136 shape): broadcast 100-segment dim, cell-blocked candidates, clamped-projection distance, struct-min argmin; whole-stage codegen, one shuffle",
        "mode": f"local-cluster executor JVMs: {lo_e}x{lo_c} vs {hi_e}x{hi_c} (total cores {lo_e*lo_c} -> {hi_e*hi_c})",
        "n_rows": N_ROWS,
        "levels": [lo, hi],
        "all_samples": samples,
        "speedup_lo_to_hi": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_snap.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
