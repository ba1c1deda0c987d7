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
    # round-6 session-3 over-threshold additions (>3 s at sf0.1 in
    # BENCH/full_suite.json owe a plan audit — CLAUDE.md rule)
    "q114_density_clusters",
    "q124_dbscan",
    "q127_triangles",
    "q147_jaccard_prefix",
    "q160_bloom_pruned_join",
    "q165_robust_outliers",
    "q169_interpolate",
    "q173_tree_root",
    "q01_pricing_summary",
    "q25_ngram_jaccard",
    "q30_cosine_topk",
    "q40_cell_assign",
    "q41_pip_join",
    "q42_knn",
    "q44_tile_zonal",
    "q45_rect_intersects",
    "q13_heat_weekly",
    "q31_lsh_ann",
    "q32_cosine_neardup",
    "q34_lsh_neardup",
    "q46_dissolve_area",
    "q48_river_intersects",
    "q49_river_length",
    "q50_river_crossings",
    "q52_repetition_quality",
    "q53_train_split",
    "q54_url_normalize",
    "q55_sessionize",
    "q56_curation_pipeline",
    "q57_asof_join",
    "q58_interval_join",
    "q59_stratified_sample",
    "q60_vocabulary",
    "q64_pip_wkb",
    "q65_pip_right_outer",
    "q66_pip_left_outer",
    "q67_percentiles",
    "q68_analytic_windows",
    "q69_distance_join",
    "q70_pip_multires",
    "q71_decontaminate",
    "q72_corpus_quality",
    "q73_quota_sample",
    "q74_pii_scrub",
    "q75_boilerplate_lines",
    "q76_intersects_right_outer",
    "q77_heavy_hitters",
    "q78_knn_geodesic",
    "q79_buffer_area",
    "q80_set_ops",
    "q81_bm25",
    "q82_erosion_area",
    "q83_zonal_stats",
    "q84_range_window",
    "q85_convex_hull",
    "q86_pivot",
    "q87_focal_stats",
    "q88_geodesic_length",
    "q89_anti_join",
    "q90_union_by_name",
    "q91_grouping_sets",
    "q92_date_arith",
    "q93_sequence_packing",
    "q94_zorder",
    "q95_contains_join",
    "q96_intersects_multires",
    "q97_correlated_subquery",
    "q98_image_decode",
    "q99_udtf_shingles",
    "q100_substring_containment",
    "q101_image_downsample",
    "q102_tfidf",
    "q103_winnowing",
    "q104_tile_pyramid",
    "q105_geohash",
    "q106_areal_interp",
    "q107_edit_distance",
    "q108_focal_gradient",
    "q109_morans_i",
    "q110_paragraph_dedup",
    "q111_hilbert",
    "q112_inverted_index",
    "q113_staypoints",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)

    from pda_spark.plans import registry
    from pda_spark.session import get_spark

    spark = get_spark("explain-audit", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def q42_candidates(spark, sf_dir):
        # q42 with exact=True localCheckpoints the candidate result, so
        # its explain shows only the checkpoint scan; audit the real
        # ring-join DAG via the exact=False plan (identical up to the
        # guard loop).
        from pyspark.sql import functions as F

        from pda_spark.geo import wkb as W
        from pda_spark.operators import spatial_join

        pts = registry._event_points(spark, sf_dir).select("event_id", "lon", "lat")
        queries = spark.createDataFrame(
            [(q[0], bytearray(W.point(q[1], q[2]))) for q in registry.KNN_QUERIES],
            "query_id int, qgeom binary",
        )
        return spatial_join.knn_join(
            pts, queries, k=5, res=6, max_ring=2, metric="degrees",
            tiebreak="event_id", lonlat_cols=("lon", "lat"), exact=False,
        )

    extra = {"q42_knn_candidates": q42_candidates}
    for name in AUDITED + list(extra):
        fn = extra.get(name) or registry.QUERIES[name][0]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
