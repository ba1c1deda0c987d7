"""Scaling-efficiency evidence (BASELINE north_rule).

The rule demands >=0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so — per the driver
instruction — the SAME job runs at two parallelism levels (local[8] vs
local[32]) on the SAME input, and we report throughput at both plus
efficiency = T_8 / (4 * T_32) into BENCH/scaling.json + BENCH/BASELINE.md.

The job is the engine's signature workload at a size that dwarfs fixed
overheads: N_POINTS synthetic points (generated distributively from
spark.range — no I/O skew), WKB-encoded, PIP-joined against the 5 test
boxes via the cell index, plus zonal tile assignment. Each level runs in
its own subprocess (fresh JVM) so executor-thread configs don't bleed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_POINTS = int(os.environ.get("PDA_SCALE_POINTS", "4000000"))

JOB = r"""
import os, sys, time, json
sys.path.insert(0, __REPO__)
from pda_spark.session import get_spark
import pyspark.sql.functions as F

cores = int(os.environ["PDA_CORES"])
n = int(os.environ["PDA_N_POINTS"])
spark = get_spark("pda-scaling", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.plans.registry import BOXES, _mk_point
from pda_spark.operators import spatial_join
from pda_spark.geo import wkb as W

base = spark.range(0, n, numPartitions=128)
pts = (
    base.withColumn("lon", F.pmod(F.col("id") * 7919 + 13, F.lit(4000)) / 100.0 - 20.0)
    .withColumn("lat", F.pmod(F.col("id") * 104729 + 7, F.lit(2500)) / 100.0 + 36.0)
    .withColumn("geom", _mk_point(F.col("lon"), F.col("lat")))
    .select(F.col("id").alias("event_id"), "geom")
)
boxes = spark.createDataFrame(
    [(b[0], bytearray(W.box(b[1], b[2], b[3], b[4]))) for b in BOXES],
    "box_id int, box_geom binary",
)
# warmup: the same job on n/20 points SPREAD OVER ALL PARTITIONS —
# a .limit() warmup runs on few tasks and leaves most of the Python
# worker pool cold, which then bills its import storm to the
# measurement (one worker per core x pandas/numpy imports).
warm = (
    base.filter(F.pmod(F.col("id"), F.lit(20)) == 0)
    .withColumn("lon", F.pmod(F.col("id") * 7919 + 13, F.lit(4000)) / 100.0 - 20.0)
    .withColumn("lat", F.pmod(F.col("id") * 104729 + 7, F.lit(2500)) / 100.0 + 36.0)
    .withColumn("geom", _mk_point(F.col("lon"), F.col("lat")))
    .select(F.col("id").alias("event_id"), "geom")
)
spatial_join.points_in_polygons_join(
    warm, boxes, res=7, poly_geom="box_geom"
).groupBy("box_id").count().write.format("noop").mode("overwrite").save()

elapsed = None
for _rep in range(2):  # min of two: steady-state, GC excluded
    t0 = time.time()
    out = spatial_join.points_in_polygons_join(pts, boxes, res=7, poly_geom="box_geom")
    out.groupBy("box_id").agg(F.count(F.lit(1)).alias("n_points")).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"cores": cores, "n_points": n, "elapsed_sec": round(elapsed, 3),
                  "throughput_mps": round(n / elapsed / 1e6, 4)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(cores: int) -> dict:
    """Run one parallelism level pinned to exactly ``cores`` physical CPUs.

    Without the taskset pin, a local[8] JVM plus its 8 Python workers
    spread over all 32 machine cores — hidden parallelism that makes the
    small level look faster than an 8-core cluster node ever could, and
    the comparison meaningless. Pinning makes each level a faithful proxy
    for a cluster of that size (JVM and Python workers compete for the
    same N cores, as they would on real executors)."""
    env = dict(os.environ, PDA_CORES=str(cores), PDA_N_POINTS=str(N_POINTS))
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", JOB]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    efficiency = round(lo["elapsed_sec"] / (4.0 * hi["elapsed_sec"]), 4)
    result = {
        "job": "PIP spatial join (cell index + Arrow refine) over synthetic points",
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
