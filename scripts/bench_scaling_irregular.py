"""Scaling evidence #2 (round 3): the IRREGULAR-polygon intersects join
(general staged refine, kernels.polys_intersect_batch) at two
parallelism levels — same methodology as bench_scaling.py (materialized
input read by both levels, full-spread warmup, alternated levels, min
per level, local-cluster 1x2 vs 1x8 on this host's honest cores axis;
see bench_scaling.py docstring for why 1xC rather than Nx2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FOOT = int(os.environ.get("PDA_IRR_FOOT", "2000000"))
N_LC = int(os.environ.get("PDA_IRR_LC", "2400"))
REPS = int(os.environ.get("PDA_SCALE_REPS", "2"))
ALTERNATIONS = int(os.environ.get("PDA_SCALE_ALTERNATIONS", "2"))
FOOT_DIR = os.environ.get("PDA_IRR_FOOT_DIR", "/tmp/pda_irr_foot")
LC_DIR = os.environ.get("PDA_IRR_LC_DIR", "/tmp/pda_irr_lc")
EXECUTOR_MEM_MB = 12288

GEN = r"""
import os, sys
sys.path.insert(0, __REPO__)
import numpy as np
import pandas as pd
from pda_spark.session import get_spark
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql.functions import pandas_udf
from pda_spark.geo import wkb as W

spark = get_spark("pda-irr-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")

@pandas_udf(T.BinaryType())
def mk_irr(cx: pd.Series, cy: pd.Series, r: pd.Series, seed: pd.Series) -> pd.Series:
    out = []
    for x, y, rr, s in zip(cx, cy, r, seed):
        rng = np.random.default_rng(int(s))
        nv = 5 + int(s) % 5
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rr * rng.uniform(0.5, 1.0, nv)
        ring = np.column_stack([x + rad * np.cos(ang), y + rad * np.sin(ang)])
        out.append(W.polygon([np.vstack([ring, ring[:1]])]))
    return pd.Series(out)

nf, nl = int(os.environ["PDA_IRR_FOOT"]), int(os.environ["PDA_IRR_LC"])
foot = (
    spark.range(0, nf, numPartitions=128)
    .select(
        F.col("id").alias("img_id"),
        (F.pmod(F.col("id") * 7919, F.lit(40000)) / 1000.0 - 20.0).alias("cx"),
        (F.pmod(F.col("id") * 104729, F.lit(22000)) / 1000.0 + 37.0).alias("cy"),
        (F.pmod(F.col("id"), F.lit(80)) / 1000.0 + 0.02).alias("r"),
        F.pmod(F.col("id"), F.lit(9973)).alias("seed"),
    )
    .withColumn("fgeom", mk_irr("cx", "cy", "r", "seed"))
    .select("img_id", "fgeom")
)
foot.write.mode("overwrite").parquet(os.environ["PDA_IRR_FOOT_DIR"])
lc = (
    spark.range(nl)
    .select(
        F.col("id").alias("lc_id"),
        (F.pmod(F.col("id") * 31, F.lit(40000)) / 1000.0 - 20.0).alias("cx"),
        (F.pmod(F.col("id") * 57, F.lit(22000)) / 1000.0 + 37.0).alias("cy"),
        (F.pmod(F.col("id"), F.lit(200)) / 500.0 + 0.1).alias("r"),
        F.pmod(F.col("id"), F.lit(997)).alias("seed"),
    )
    .withColumn("lgeom", mk_irr("cx", "cy", "r", "seed"))
    .select("lc_id", "lgeom")
)
lc.write.mode("overwrite").parquet(os.environ["PDA_IRR_LC_DIR"])
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
    .appName(f"pda-irr-scaling-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.operators import spatial_join

foot = spark.read.parquet(os.environ["PDA_IRR_FOOT_DIR"])
lc = spark.read.parquet(os.environ["PDA_IRR_LC_DIR"])
n = foot.count()

def run(df):
    pairs = spatial_join.intersects_join(
        df, lc, res=7, left_geom="fgeom", right_geom="lgeom"
    )
    pairs.groupBy("lc_id").agg(F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()

run(foot.filter(F.pmod(F.col("img_id"), F.lit(20)) == 0))  # full-spread warmup

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "2"))):
    t0 = time.time()
    run(foot)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_footprints": n,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_kfps": round(n / elapsed / 1e3, 2)}))
spark.stop()
""".replace("__REPO__", repr(REPO))


def run_level(cores_per_executor: int) -> dict:
    env = dict(
        os.environ,
        PDA_EXECUTORS="1",
        PDA_CORES_PER_EXEC=str(cores_per_executor),
        PDA_EXEC_MEM_MB=str(EXECUTOR_MEM_MB),
        PDA_IRR_FOOT_DIR=FOOT_DIR,
        PDA_IRR_LC_DIR=LC_DIR,
        PDA_SCALE_REPS=str(REPS),
    )
    out = subprocess.run(
        [sys.executable, "-c", JOB], env=env, capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if not os.path.isdir(FOOT_DIR):
        env = dict(os.environ, PDA_IRR_FOOT=str(N_FOOT), PDA_IRR_LC=str(N_LC),
                   PDA_IRR_FOOT_DIR=FOOT_DIR, PDA_IRR_LC_DIR=LC_DIR)
        subprocess.run([sys.executable, "-c", GEN], env=env, check=True)

    samples: list[dict] = []
    for _alt in range(ALTERNATIONS):
        for cpe in (2, 8):
            r = run_level(cpe)
            r["alternation"] = _alt
            samples.append(r)
            print(json.dumps(r), flush=True)

    best = {}
    for s in samples:
        key = s["cores_per_executor"]
        if key not in best or s["elapsed_sec"] < best[key]["elapsed_sec"]:
            best[key] = s
    t_small, t_big = best[2]["throughput_kfps"], best[8]["throughput_kfps"]
    eff = (t_big / t_small) / 4.0
    result = {"levels": best, "samples": samples,
              "scaling_efficiency_1x2_to_1x8": round(eff, 3)}
    with open(os.path.join(REPO, "BENCH", "scaling_irregular.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "t_1x2_kfps": t_small, "t_1x8_kfps": t_big}))


if __name__ == "__main__":
    main()
