"""Scaling-efficiency evidence (BASELINE north_rule).

The rule demands >=0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so — per the driver
instruction — the SAME job runs at two parallelism levels (local[8] vs
local[32]) on the SAME input, and we report throughput at both plus
efficiency = T_N / (4 * T_4N) into BENCH/scaling.json + BENCH/BASELINE.md.

Methodology (each point was verified to matter):
- the input is a materialized parquet point table written once before
  either level runs — both levels read the identical files, and input
  synthesis (a Python UDF) stays out of the measurement;
- each level runs in its own subprocess pinned with ``taskset`` to
  exactly N cores — an unpinned local[8] JVM plus its Python workers
  would borrow the machine's idle 24 cores and fake the baseline;
- a full-spread warmup precedes measurement (the first execution of each
  Arrow UDF pays a per-worker import storm) and the reported time is the
  min of REPS runs (GC pauses excluded);
- the measured job is the engine's signature operator: point-in-polygon
  spatial join via the int64 cell index, JVM-side cell assignment + bbox
  prefilter, exact ray-cast refine as the single Arrow UDF stage, and a
  grouped count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_POINTS = int(os.environ.get("PDA_SCALE_POINTS", "16000000"))
REPS = int(os.environ.get("PDA_SCALE_REPS", "3"))
INPUT_DIR = os.environ.get("PDA_SCALE_INPUT", "/tmp/pda_scaling_points")

GEN = r"""
import os, sys
sys.path.insert(0, __REPO__)
from pda_spark.session import get_spark
import pyspark.sql.functions as F
n = int(os.environ["PDA_N_POINTS"])
spark = get_spark("pda-scaling-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from pda_spark.plans.registry import _mk_point
pts = (
    spark.range(0, n, numPartitions=128)
    .withColumn("lon", F.pmod(F.col("id") * 7919 + 13, F.lit(4000)) / 100.0 - 20.0)
    .withColumn("lat", F.pmod(F.col("id") * 104729 + 7, F.lit(2500)) / 100.0 + 36.0)
    .withColumn("geom", _mk_point(F.col("lon"), F.col("lat")))
    .select(F.col("id").alias("event_id"), "geom", "lon", "lat")
)
pts.write.mode("overwrite").parquet(os.environ["PDA_INPUT_DIR"])
print("GENERATED")
spark.stop()
""".replace("__REPO__", repr(REPO))

JOB = r"""
import os, sys, time, json
sys.path.insert(0, __REPO__)
from pda_spark.session import get_spark
import pyspark.sql.functions as F

cores = int(os.environ["PDA_CORES"])
spark = get_spark("pda-scaling", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.plans.registry import BOXES
from pda_spark.operators import spatial_join
from pda_spark.geo import wkb as W

pts = spark.read.parquet(os.environ["PDA_INPUT_DIR"]).repartition(128)
n = pts.count()
boxes = spark.createDataFrame(
    [(b[0], bytearray(W.box(b[1], b[2], b[3], b[4]))) for b in BOXES],
    "box_id int, box_geom binary",
)

def run(df):
    out = spatial_join.points_in_polygons_join(
        df, boxes, res=7, poly_geom="box_geom", lonlat_cols=("lon", "lat")
    )
    out.groupBy("box_id").agg(F.count(F.lit(1)).alias("n_points")).write.format(
        "noop"
    ).mode("overwrite").save()

run(pts.filter(F.pmod(F.col("event_id"), F.lit(20)) == 0))  # full-spread warmup

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "3"))):
    t0 = time.time()
    run(pts)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"cores": cores, "n_points": n, "elapsed_sec": round(elapsed, 3),
                  "throughput_mps": round(n / elapsed / 1e6, 4)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(cores: int) -> dict:
    env = dict(
        os.environ,
        PDA_CORES=str(cores),
        PDA_INPUT_DIR=INPUT_DIR,
        # identical heap for both levels; undersizing it (16g) throttled
        # the 32-core level with GC churn from 4x concurrent Arrow
        # allocation and produced bogus anti-scaling
        PDA_DRIVER_MEM=os.environ.get("PDA_SCALE_MEM", "48g"),
        PDA_SCALE_REPS=str(REPS),
    )
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", JOB]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    env = dict(os.environ, PDA_N_POINTS=str(N_POINTS), PDA_INPUT_DIR=INPUT_DIR)
    gen = subprocess.run([sys.executable, "-c", GEN], env=env, capture_output=True, text=True, timeout=1800)
    if "GENERATED" not in gen.stdout:
        raise RuntimeError(f"input generation failed:\n{gen.stdout[-2000:]}\n{gen.stderr[-2000:]}")
    lo = run_level(8)
    hi = run_level(32)
    efficiency = round(lo["elapsed_sec"] / (4.0 * hi["elapsed_sec"]), 4)
    result = {
        "job": "PIP spatial join (cell index + JVM bbox prefilter + Arrow ray-cast refine) over materialized parquet points",
        "n_points": N_POINTS,
        "levels": [lo, hi],
        "speedup_8_to_32": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
