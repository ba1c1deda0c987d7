"""Dump explain('formatted') plans for the headline queries into
BENCH/plans/ — the plan-inspection artifacts behind the scale claims:
broadcast joins where expected, pushed filters, codegen spans around the
cell/bbox expressions, single Arrow stage per spatial join.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q01_pricing_summary",
    "q25_ngram_jaccard",
    "q30_cosine_topk",
    "q40_cell_assign",
    "q41_pip_join",
    "q42_knn",
    "q44_tile_zonal",
    "q45_rect_intersects",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)

    from pda_spark.plans import registry
    from pda_spark.session import get_spark

    spark = get_spark("explain-audit", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in AUDITED:
        fn, _sql = registry.QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
