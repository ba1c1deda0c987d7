"""Fit + pin the IVF coarse quantizer (VERDICT r5 #7).

Runs the distributed spherical Lloyd fit (similarity.kmeans_fit) on the
fixed sf0.01 embeddings snapshot and pins the result to
pda_spark/plans/ivf_centroids_sf001.json — the committed literal list
both the Spark plan (q33) and its DuckDB oracle load, standing in for
the offline centroid-training batch job a 100 TB deployment would run.
The fit is bit-deterministic under any partitioning (integer-scaled
partial sums), so re-running this script must reproduce the pinned file
exactly — tests/test_pipeline_ops.py asserts that.

Usage:  python scripts/fit_ivf_centroids.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SNAPSHOT = "/root/testdata/sf0.01/embeddings.parquet"
OUT = ROOT / "pda_spark" / "plans" / "ivf_centroids_sf001.json"
N_CENTROIDS = 16
N_ITER = 4


def main() -> int:
    from pda_spark.functions import similarity
    from pda_spark.session import get_spark

    spark = get_spark(cores=4, shuffle_partitions=8)
    emb = spark.read.parquet(SNAPSHOT)
    cents, history = similarity.kmeans_fit(
        emb, n_centroids=N_CENTROIDS, n_iter=N_ITER
    )
    payload = {
        "snapshot": SNAPSHOT,
        "n_centroids": N_CENTROIDS,
        "n_iter": N_ITER,
        "objective_history": history,
        "centroids": cents,
    }
    OUT.write_text(json.dumps(payload, indent=1) + "\n")
    print(f"pinned {N_CENTROIDS} centroids to {OUT}")
    print("objective history:", [round(h, 6) for h in history])
    return 0


if __name__ == "__main__":
    sys.exit(main())
