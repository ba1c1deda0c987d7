"""Scaling-efficiency datapoint #4 — the WEBTEXT pipeline leg.

The three recorded datapoints (BENCH/scaling*.json) all exercise the
geospatial side (PIP join, irregular refine, WKB decode). This one
measures the text-dedup pipeline shape the 100 TB web corpus actually
spends its time in: per-doc shingling (regexp normalize + rolling
substring + array_distinct + md5 fold — all JVM whole-stage codegen,
zero Python) feeding the map-side-combinable shingle-frequency
aggregate, i.e. the leading stages of near-dup dedup (L2-L4) and
decontamination (L27).

Methodology identical to bench_scaling.py (see its docstring for why
the cores axis inside one executor is this host's honest N->4N proxy):
materialized parquet input read by both levels, full warmup, alternated
levels, per-level minima, local-cluster executor JVMs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("PDA_SCALE_DOCS", "400000"))
REPS = int(os.environ.get("PDA_SCALE_REPS", "3"))
ALTERNATIONS = int(os.environ.get("PDA_SCALE_ALTERNATIONS", "3"))
INPUT_DIR = os.environ.get("PDA_SCALE_INPUT", "/tmp/pda_scaling_docs")
EXECUTOR_MEM_MB = 12288

GEN = r"""
import os, sys
sys.path.insert(0, __REPO__)
from pda_spark.session import get_spark
import pyspark.sql.functions as F
n = int(os.environ["PDA_N_DOCS"])
spark = get_spark("pda-scaling-text-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
# synthetic web-page text: ~60 tokens/doc from a zipf-ish vocabulary,
# deterministic, built JVM-side (concat of hashed token picks)
vocab = (
    "the a of to and in page data news spark join table row scan fast "
    "slow merge batch value line query filter hash vector stream big "
    "small window order customer part group key column agg"
).split()
words = F.array(*[F.lit(w) for w in vocab])
n_vocab = len(vocab)  # pmod bound MUST match: element_at is 1-based and
                      # ANSI mode (Spark 4 default) throws on overflow
docs = (
    spark.range(0, n, numPartitions=128)
    .withColumn(
        "text",
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.element_at(
                words, (F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(n_vocab)) + 1).cast("int")
            ),
        )),
    )
    .select(F.col("id").alias("doc_id"), "text")
)
docs.write.mode("overwrite").parquet(os.environ["PDA_INPUT_DIR"])
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
    .appName(f"pda-scaling-text-{n_exec}x{cpe}")
    .config("spark.executor.memory", f"{mem_mb - 2048}m")
    .config("spark.sql.shuffle.partitions", str(2 * n_exec * cpe))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pda_spark.functions import dedup as D

docs = spark.read.parquet(os.environ["PDA_INPUT_DIR"])
n = docs.count()

def run(df):
    sh = D.doc_shingle_hashes(df, "doc_id")
    # shingle document frequency: the map-side-combinable aggregate every
    # near-dup pipeline starts with; count-only sink
    sh.groupBy("h").agg(F.count(F.lit(1)).alias("df")).write.format(
        "noop"
    ).mode("overwrite").save()

run(docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0))  # warmup

elapsed = None
for _rep in range(int(os.environ.get("PDA_SCALE_REPS", "3"))):
    t0 = time.time()
    run(docs)
    dt = time.time() - t0
    elapsed = dt if elapsed is None else min(elapsed, dt)
print(json.dumps({"executors": n_exec, "cores_per_executor": cpe, "n_docs": n,
                  "elapsed_sec": round(elapsed, 3),
                  "throughput_kdocs": round(n / elapsed / 1e3, 2)}))
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
    levels = os.environ.get("PDA_SCALE_LEVELS", "1x2,1x8")
    (lo_e, lo_c), (hi_e, hi_c) = [
        tuple(int(v) for v in part.split("x")) for part in levels.split(",")
    ]
    if not os.environ.get("PDA_SCALE_REUSE_INPUT"):
        env = dict(os.environ, PDA_N_DOCS=str(N_DOCS), PDA_INPUT_DIR=INPUT_DIR)
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
        "job": "web-corpus shingle pipeline (normalize + k-gram + md5 fold, JVM codegen) -> shingle document-frequency aggregate over materialized parquet docs",
        "mode": f"local-cluster executor JVMs: {lo_e}x{lo_c} vs {hi_e}x{hi_c} (total cores {lo_e*lo_c} -> {hi_e*hi_c})",
        "n_docs": N_DOCS,
        "levels": [lo, hi],
        "all_samples": samples,
        "speedup_lo_to_hi": round(lo["elapsed_sec"] / hi["elapsed_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_text.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
