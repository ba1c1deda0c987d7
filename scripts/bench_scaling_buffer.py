"""Scaling-efficiency evidence for the round-5 buffer/erosion kernel leg
(VERDICT r5 #6 — the q79/q82 shape had no entry in BENCH/scaling*.json).

Measured job: ST_Buffer(negative) area — ``erosion_area`` through the
``buffer_area_planar(-d)`` Arrow UDF — over a materialized parquet table
of WKB polygons (rectangles, 1/4 with a hole, so the generic capsule-
union scanline path runs on every row; the convex fast path never
applies to erosion). Per-geometry kernel cost dominates (~15 ms/geom),
which makes this the purest Python-kernel leg we scale: embarrassingly
parallel, no shuffle, one Arrow stage.

Methodology is bench_scaling.py's, with the cores axis the host
sanctions for Arrow-UDF legs (BENCH/BASELINE.md §2: Arrow stages run
TWO busy procs per task slot, so 1x8 would trip the ~10-core throttle):
local-cluster 1x1 vs 1x4, identical input files, full-spread warmup,
alternated levels, per-level minimum over reps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_POLYS = int(os.environ.get("PDA_SCALE_POLYS", "2400"))
REPS = int(os.environ.get("PDA_SCALE_REPS", "2"))
ALTERNATIONS = int(os.environ.get("PDA_SCALE_ALTERNATIONS", "3"))
INPUT_DIR = os.environ.get("PDA_SCALE_INPUT", "/tmp/pda_scaling_polys")
EXECUTOR_MEM_MB = 8192

GEN = r"""
import os, sys
sys.path.insert(0, __REPO__)
import numpy as np
import pandas as pd
from pda_spark.session import get_spark
from pda_spark.geo import wkb as W

n = int(os.environ["PDA_N_POLYS"])
spark = get_spark("pda-scaling-buffer-gen", cores=8)
spark.sparkContext.setLogLevel("ERROR")

def poly_wkb(i):
    w, h = 2.0 + (i % 7) * 0.6, 1.5 + (i % 5) * 0.5
    off = (i % 13) * 0.1
    outer = np.array([[0,0],[w,0],[w,h],[0,h],[0,0]], dtype=np.float64) + off
    rings = [outer]
    if i % 4 == 0:
        rings.append(np.array(
            [[w*0.4,h*0.4],[w*0.6,h*0.4],[w*0.6,h*0.6],[w*0.4,h*0.6],[w*0.4,h*0.4]]
        ) + off)
    return bytearray(W.polygon(rings))

pdf = pd.DataFrame({"poly_id": range(n), "geom": [poly_wkb(i) for i in range(n)]})
# 16 files so the scan parallelizes at every measured level
spark.createDataFrame(pdf).repartition(16).write.mode("overwrite").parquet(
    os.environ["PDA_INPUT_DIR"])
print("GENERATED")
spark.stop()
""".replace("__REPO__", repr(REPO))

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
spark = (
    SparkSession.builder.master(f"local-cluster[{n_exec},{cpe},{mem_mb}]")
    .appName(f"pda-scaling-buffer-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.functions import geo_udfs

polys = spark.read.parquet(os.environ["PDA_INPUT_DIR"])
n = polys.count()
area = geo_udfs.buffer_area_planar(-0.35)

def run(df):
    out = df.select("poly_id", area(F.col("geom")).alias("ero_area"))
    out.agg(F.sum("ero_area")).write.format("noop").mode("overwrite").save()

run(polys.filter(F.pmod(F.col("poly_id"), F.lit(20)) == 0))  # warmup, full spread

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "2"))):
    t0 = time.time()
    run(polys)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_polys": n,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_gps": round(n / elapsed, 2)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(n_executors: int, cores_per_executor: int) -> dict:
    env = dict(
        os.environ,
        PDA_EXECUTORS=str(n_executors),
        PDA_CORES_PER_EXEC=str(cores_per_executor),
        PDA_EXEC_MEM_MB=str(EXECUTOR_MEM_MB),
        PDA_INPUT_DIR=INPUT_DIR,
        PDA_SCALE_REPS=str(REPS),
    )
    out = subprocess.run([sys.executable, "-c", JOB], env=env, capture_output=True, text=True, timeout=1800)
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
    if not os.environ.get("PDA_SCALE_REUSE_INPUT"):
        env = dict(os.environ, PDA_N_POLYS=str(N_POLYS), PDA_INPUT_DIR=INPUT_DIR)
        gen = subprocess.run([sys.executable, "-c", GEN], env=env, capture_output=True, text=True, timeout=1800)
        if "GENERATED" not in gen.stdout:
            raise RuntimeError(f"input generation failed:\n{gen.stdout[-2000:]}\n{gen.stderr[-2000:]}")
    samples = {"lo": [], "hi": []}
    for _ in range(ALTERNATIONS):
        samples["lo"].append(run_level(lo_e, lo_c))
        samples["hi"].append(run_level(hi_e, hi_c))
    lo = min(samples["lo"], key=lambda r: r["elapsed_sec"])
    hi = min(samples["hi"], key=lambda r: r["elapsed_sec"])
    ratio = (hi_e * hi_c) / (lo_e * lo_c)
    efficiency = round(lo["elapsed_sec"] / (ratio * hi["elapsed_sec"]), 4)
    result = {
        "job": "negative-buffer (erosion) area via the capsule-union scanline kernel, one Arrow UDF stage over materialized WKB polygons (1/4 with holes)",
        "mode": f"local-cluster executor JVMs: {lo_e}x{lo_c} vs {hi_e}x{hi_c} (total cores {lo_e*lo_c} -> {hi_e*hi_c})",
        "n_polys": N_POLYS,
        "levels": [lo, hi],
        "all_samples": samples,
        "speedup_lo_to_hi": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_buffer.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
