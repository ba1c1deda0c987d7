"""Scaling-efficiency datapoint #8 — the IMAGE DECODE/POOL Arrow leg
(VERDICT r06 #5: the only round-6 kernel family with no BENCH/scaling
entry). Measures the q98/q101 shape end-to-end: real PPM/BMP byte decode
(dependency-free codec, numpy) + block-mean pooling in ONE fused
mapInPandas stage over materialized encoded payloads.

Methodology identical to bench_scaling_buffer.py (the Arrow-stage
sibling): local-cluster executor JVMs, 1x1 vs 1x4 cores (the honest
axis for Arrow stages on this host — each Arrow task runs ~2 busy
procs, so wider single-executor levels trip the host throttle and
measure the machine, not the code), materialized parquet input read by
both levels, full warmup, alternated levels, per-level minima.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IMAGES = int(os.environ.get("PDA_SCALE_IMAGES", "24000"))
REPS = int(os.environ.get("PDA_SCALE_REPS", "3"))
ALTERNATIONS = int(os.environ.get("PDA_SCALE_ALTERNATIONS", "3"))
INPUT_DIR = os.environ.get("PDA_SCALE_INPUT", "/tmp/pda_scaling_media")
EXECUTOR_MEM_MB = 12288

GEN = r"""
import os, sys
sys.path.insert(0, __REPO__)
from pda_spark.session import get_spark
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import types as T
n = int(os.environ["PDA_N_IMAGES"])
spark = get_spark("pda-scaling-media-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")

def make_media(batches):
    import numpy as np
    from pda_spark.functions import multimodal
    for pdf in batches:
        rows = []
        for did in pdf["id"]:
            did = int(did)
            # 60..123 x 48..87 px — decode work dominates per row, and
            # BMP stride padding varies with width
            w, h = 60 + did % 64, 48 + did % 40
            i = np.arange(w * h * 3, dtype=np.int64)
            px = ((did * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
            enc = multimodal.encode_bmp if did % 2 else multimodal.encode_ppm
            rows.append({"media_id": f"{did:08d}", "payload": enc(px)})
        yield pd.DataFrame(rows, columns=["media_id", "payload"])

schema = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])
(spark.range(0, n, numPartitions=64).mapInPandas(make_media, schema)
 .write.mode("overwrite").parquet(os.environ["PDA_INPUT_DIR"]))
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
    .appName(f"pda-scaling-media-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.functions import multimodal

media = spark.read.parquet(os.environ["PDA_INPUT_DIR"]).repartition(4 * n_exec * cpe)
n = media.count()

def run(df):
    multimodal.downsample_block_mean(df, out_w=4, out_h=4).write.format(
        "noop"
    ).mode("overwrite").save()

run(media.limit(500))  # warmup: python workers + codegen

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "3"))):
    t0 = time.time()
    run(media)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_images": n,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_kimg": round(n / elapsed / 1e3, 2)}))
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
        env = dict(os.environ, PDA_N_IMAGES=str(N_IMAGES), PDA_INPUT_DIR=INPUT_DIR)
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
        "job": "image decode (PPM/BMP dependency-free codec) + 4x4 block-mean pool, one fused mapInPandas stage over materialized encoded payloads (the q98/q101 family)",
        "mode": f"local-cluster executor JVMs: {lo_e}x{lo_c} vs {hi_e}x{hi_c} (total cores {lo_e*lo_c} -> {hi_e*hi_c})",
        "n_images": N_IMAGES,
        "levels": [lo, hi],
        "all_samples": samples,
        "speedup_lo_to_hi": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_media.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
