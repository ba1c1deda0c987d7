"""spark-submit entry point (north rule: the engine is "launched via
spark-submit --py-files on multi-executor clusters").

Build the dependency archive once, then submit any registry query:

    python scripts/submit_job.py --make-pyfiles            # -> dist/pda_spark.zip
    spark-submit --master spark://... \
        --py-files dist/pda_spark.zip \
        scripts/submit_job.py --query q41_pip_join \
        --sf-dir hdfs:///data/sf100 --output hdfs:///out/q41

Single-machine smoke (what tests/test_submit.py runs): master
``local-cluster[2,2,2048]`` — two real executor JVMs that only see the
code shipped via --py-files, proving the archive is self-contained.

The script deliberately builds NO master/memory config of its own: in a
spark-submit launch those come from the submit command / cluster
defaults, so the same file works on local-cluster and a 1000-executor
deployment unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def make_pyfiles(repo_root: str) -> str:
    """Zip the pda_spark package for --py-files distribution."""
    dist = os.path.join(repo_root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "pda_spark.zip")
    pkg = os.path.join(repo_root, "pda_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                # .json: packaged data (pinned IVF centroid fit) read
                # via importlib.resources, so it must ride in the zip
                if fn.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, repo_root))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-pyfiles", action="store_true")
    ap.add_argument("--query", help="registry query name, e.g. q41_pip_join")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", default="", help="parquet output path; empty = show+count")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.make_pyfiles:
        print(make_pyfiles(repo_root))
        return
    if not args.query:
        ap.error("--query is required (or --make-pyfiles)")

    from pyspark.sql import SparkSession

    # config comes from spark-submit; we only require Arrow for the
    # engine's pandas-UDF kernels
    spark = (
        SparkSession.builder.appName(f"pda-{args.query}")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from pda_spark.plans import registry

    fn, _sql = registry.QUERIES[args.query]
    df = fn(spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        df.show(10, truncate=False)
        n = df.count()
    print(f"RESULT_ROWS={n}")
    spark.stop()


if __name__ == "__main__":
    main()
