"""A/B evidence for the struct-UDF single-evaluation barrier
(VERDICT r3 perf item): Catalyst inlines a *deterministic* struct UDF
once per struct-field access, so the WKB point decode
(point_cell_lonlat: geom -> struct(cell, lon, lat)) executed 3x per row
on the fact leg. The production UDF is asNondeterministic; this script
measures the SAME decode projection with a deterministic clone (the
pre-fix plan, 3 ArrowEvalPython nodes) vs the production UDF (1 node)
over materialized WKB points, min-of-N, and writes
BENCH/struct_eval.json.

Usage: python scripts/bench_struct_eval.py [n_points] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def point_cell_lonlat_dup(res: int):
    """Deterministic clone of geo_udfs.point_cell_lonlat — same body,
    NO asNondeterministic: reproduces the duplicated-evaluation plan."""
    from pda_spark.functions.geo_udfs import _decode_points
    from pda_spark.geo import cells

    @pandas_udf(T.StructType([
        T.StructField("cell", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]))
    def _cell(geom: pd.Series) -> pd.DataFrame:
        lon, lat = _decode_points(geom)
        return pd.DataFrame({"cell": cells.cell_of(lon, lat, res), "lon": lon, "lat": lat})

    return _cell


def n_arrow_nodes(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    import re

    return len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("PDA_DRIVER_MEM", "32g")

    from pda_spark.functions import geo_udfs
    from pda_spark.plans.registry import _mk_point
    from pda_spark.session import get_spark

    spark = get_spark("struct-eval-ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    # n in the path: a stale cache from a different n would otherwise be
    # measured while the JSON records the requested n
    path = f"/tmp/pda_struct_eval_pts_{n}.parquet"
    if not os.path.isdir(path):
        pts = (
            spark.range(n)
            .select(
                F.col("id"),
                (F.pmod(F.col("id") * 97, F.lit(4000)) / 100.0 - 20.0).alias("lon"),
                (F.pmod(F.col("id") * 57, F.lit(2500)) / 100.0 + 36.0).alias("lat"),
            )
            .withColumn("geom", _mk_point(F.col("lon"), F.col("lat")))
            .select("id", "geom")
        )
        pts.write.mode("overwrite").parquet(path)

    src = spark.read.parquet(path)

    # The duplication is triggered by the JOIN shape, not a bare
    # projection: the bbox `between` prefilter infers
    # isnotnull(struct.field) predicates that Catalyst pushes below the
    # struct projection, splitting a deterministic UDF into one
    # evaluation per consumer (the old q41 plan held TWO ArrowEvalPython
    # for the same _bc call). So measure the real WKB-input PIP join
    # (q64 shape), swapping the production nondeterministic UDF for a
    # deterministic clone via monkeypatch.
    from pda_spark.geo import wkb as Wk
    from pda_spark.operators import spatial_join
    from pda_spark.plans.registry import BOXES

    boxes = spark.createDataFrame(
        [(b[0], bytearray(Wk.box(b[1], b[2], b[3], b[4]))) for b in BOXES],
        "box_id int, box_geom binary",
    )

    def pip_join():
        j = spatial_join.points_in_polygons_join(
            src, boxes, res=7, point_geom="geom", poly_geom="box_geom"
        )
        return j.groupBy("box_id").agg(F.count(F.lit(1)).alias("n_points"))

    production = geo_udfs.point_cell_lonlat

    def with_dup():
        geo_udfs.point_cell_lonlat = point_cell_lonlat_dup
        try:
            return pip_join()
        finally:
            geo_udfs.point_cell_lonlat = production

    variants = {
        "deterministic_duplicated": with_dup,
        "nondeterministic_single": pip_join,
    }
    out: dict[str, dict] = {}
    # warm both paths once, then alternate variants per rep (host noise
    # hits both levels equally — BENCH/BASELINE.md methodology)
    for name, mk in variants.items():
        mk().write.format("noop").mode("overwrite").save()
    for name, mk in variants.items():
        out[name] = {"arrow_eval_nodes": n_arrow_nodes(mk()), "sec": None}
    for _ in range(reps):
        for name, mk in variants.items():
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            cur = out[name]["sec"]
            out[name]["sec"] = dt if cur is None else min(cur, dt)

    result = {
        "n_points": n,
        "reps": reps,
        "variants": out,
        "speedup": round(
            out["deterministic_duplicated"]["sec"] / out["nondeterministic_single"]["sec"], 3
        ),
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "struct_eval.json"
    )
    with open(dest, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
