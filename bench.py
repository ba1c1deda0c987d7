"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries" (per-query
sec), "sf"}.

Each query is forced through the noop sink so column pruning cannot skip
UDF work. A tiny warmup amortizes JVM codegen + Python worker startup out
of the first measured query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",   # scan-heavy hash agg (600k lineitem @ sf0.1)
    "q03_join_agg",          # broadcast FK join
    "q05_topk_window",       # window top-k
    "q20_token_stats",       # text quality (JVM-side regex)
    "q24_dedup_counts",      # exact dedup fingerprints
    "q25_ngram_jaccard",     # shingle self-join near-dup
    "q27_simhash",           # simhash signatures
    "q30_cosine_topk",       # brute-force ANN baseline
    "q31_lsh_ann",           # LSH ANN (multi-probe)
    "q33_ivf_ann",           # IVF ANN (centroid lists)
    "q34_lsh_neardup",       # LSH-bucketed near-dup pairs (scale path)
    "q51_dedup_clusters",    # LSH pairs -> connected-components clustering
    "q52_repetition_quality",  # Gopher-style repetition filters (one-pass)
    "q55_sessionize",        # gaps-and-islands sessions (events)
    "q57_asof_join",         # as-of join (union + window fill)
    "q58_interval_join",     # range join via time buckets
    "q60_vocabulary",        # corpus vocab top-k (explode-agg)
    "q71_decontaminate",     # train-test overlap (broadcast eval shingles)
    "q72_corpus_quality",    # corpus-frequency quality signals
    "q75_boilerplate_lines", # line-frequency boilerplate removal
    "q13_heat_weekly",       # period bucketing + gap fill heat series
    "q28_media_features",    # multimodal mapInPandas feature extraction
    "q40_cell_assign",       # cell index (pure Catalyst)
    "q41_pip_join",          # point-in-polygon spatial join (headline)
    "q64_pip_wkb",           # same join, WKB-input decode leg (1 Arrow eval)
    "q70_pip_multires",      # per-geometry resolution join (mixed extents)
    "q42_knn",               # kNN ring expansion
    "q78_knn_geodesic",      # kNN, great-circle metric (haversine refine)
    "q44_tile_zonal",        # raster<->vector zonal tiles
    "q45_rect_intersects",   # polygon x polygon intersects join
    "q46_dissolve_area",     # geometric dissolve (scanline union kernel)
    "q48_river_intersects",  # LineString x polygon intersects join (rivers)
    "q79_buffer_area",       # Minkowski buffer (capsule union, Arrow UDF)
    "q81_bm25",              # BM25 retrieval scoring (two explode legs)
    "q83_zonal_stats",       # zonal sum/mean stats (exact integer cents)
    "q85_convex_hull",       # convex hull UDAF (monotone chain)
    "q87_focal_stats",       # focal raster smoothing (scatter-gather)
    "q93_sequence_packing",  # concat-and-chunk packing (two-level cumsum)
    "q94_zorder",            # Morton layout key (pure Catalyst bit math)
    "q99_udtf_shingles",     # native Python UDTF leg (Arrow table function)
    "q100_substring_containment",  # rare-shingle inverted index + instr verify
    "q101_image_downsample", # real decode + block-mean pool (one Arrow stage)
    "q102_tfidf",            # full-vocabulary tf-idf (two keyed shuffles)
    "q103_winnowing",        # window-min fingerprint selection
    "q104_tile_pyramid",     # multi-zoom tile rollup (bit-shift ancestors)
    "q111_hilbert",          # Hilbert layout key (branchless xor-mask)
    "q135_simhash_pairs",    # banded SimHash Hamming<=3 near-dup join
    "q136_snap_points",      # nearest-segment snap (map matching, pure JVM)
    "q137_d8_flow",          # D8 flow direction (scatter + struct argmax)
    "q124_dbscan",           # exact DBSCAN (eps-grid + contracted CC)
    "q147_jaccard_prefix",   # AllPairs/PPJoin exact set-similarity join
    "q155_sorted_neighborhood",  # distributed global rank + sliding window
    "q163_bpe_tokenize",     # ranked-merge BPE (codegen replace chain)
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # size the heap to the thread count: an undersized heap GC-throttles
    # high-core local runs (measured: 16g at 32 cores inverted scaling)
    os.environ.setdefault("PDA_DRIVER_MEM", "32g")

    from pda_spark.functions import extract
    from pda_spark.plans import registry
    from pda_spark.session import get_spark
    from pda_spark.sources import web_pages

    spark = get_spark("pda-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # every benchmarked leg — registry queries PLUS the web-extraction
    # pipeline — goes through the same warmup + min-of-N machinery.
    # (VERDICT r4 #2: web_extract used to be a single unwarmed sample at
    # the end of a long run, so artifact noise read as a 2.9x regression.)
    def _entry(name):
        if name == "web_extract_2k_pages":
            return lambda _sf_dir: extract.parse_footprints(
                web_pages.corpus(spark, 2000, partitions=cpus)
            )
        fn, _sql = registry.QUERIES[name]
        return lambda sdir: fn(spark, sdir)

    suite = [(n, _entry(n)) for n in HEADLINE + ["web_extract_2k_pages"]]

    # warmup: run the whole suite once at the smallest SF. This warms the
    # Python worker pool for EVERY UDF path (the first execution of each
    # Arrow UDF pays a one-off worker import storm: 32 workers x
    # pandas/numpy imports), plus JVM codegen. Measured numbers below are
    # steady-state — the regime that matters at 100 TB.
    warm_dir = "/root/testdata/sf0.001"
    for _name, thunk in suite:
        _force(thunk(warm_dir if os.path.isdir(warm_dir) else sf_dir))

    # five measured repetitions per query, report the min — GC pauses,
    # worker-pool growth from neighbouring queries, and this host's
    # external noise episodes otherwise leak into single samples (r03's
    # committed artifact caught a noise episode that a same-suite re-run
    # measured 25% faster; more reps stretch the sampling window).
    times: dict[str, float] = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "720"))
    t_start = time.time()
    for _rep in range(reps):
        # wall-budget guard: never let extra reps (noise insurance) push
        # the whole run past the driver's patience — after 2 full reps
        # the min is already steady-state
        if _rep >= 2 and time.time() - t_start > budget:
            break
        for name, thunk in suite:
            t0 = time.time()
            _force(thunk(sf_dir))
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall-time (spatial join + tiling + dedup + ANN + extract)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
