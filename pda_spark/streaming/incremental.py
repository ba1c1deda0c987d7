"""Structured Streaming surface for incremental ingest + time-series aggs.

The reference is batch-only (SURVEY §2.9): its importer runs daily with
TOI yesterday->today (/root/reference/api_importer/arg_parser.py:18-33),
i.e. incremental append. The idiomatic Spark mapping is
``Trigger.AvailableNow`` file-stream ingest — each run drains newly
arrived page files exactly once (offsets in the stream checkpoint), runs
the same extraction UDFs, and appends footprint facts; plus a watermarked
tumbling-window aggregation for the dashboard's heat-bucket time series
(/root/reference/app/maps.py:56-76, F13/A11).

Scale notes: file-stream listing is the only driver-side cost; the plan
is identical to the batch DAG, so throughput properties carry over. The
streaming checkpoint complements (not replaces) the stage manifests in
sources/checkpoint.py — exactly-once file consumption there, lineage &
resume of derived stages here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pda_spark import schemas
from pda_spark.functions import extract


def stream_ingest_footprints(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain new page parquet files from pages_dir -> append footprint
    facts to out_dir. Exactly-once per input file via the stream
    checkpoint; returns after the AvailableNow batch completes."""
    pages = spark.readStream.schema(schemas.WEB_PAGES).parquet(pages_dir)
    facts = extract.parse_footprints(pages)
    q = (
        facts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> None:
    """Watermarked tumbling-window counts (the heatmap time series as a
    stream): late rows beyond the watermark are dropped, windows finalize
    incrementally. AvailableNow so each invocation drains pending files."""
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(events_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
