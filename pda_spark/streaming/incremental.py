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


def stream_dedup_first_seen(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Custom stateful streaming operator (applyInPandasWithState):
    cross-micro-batch exact dedup — the first document carrying a given
    normalized-text fingerprint is emitted, every later duplicate (in the
    same batch or any later batch) is dropped. State is one boolean per
    fingerprint in the state store, checkpointed with the stream.

    This is the streaming twin of functions.dedup.exact_dedup for a
    continuously-arriving corpus: grouping shuffles on the fingerprint
    (hash-partitioned state), per-group state is O(1), and emission is
    deterministic (min id within the group's first batch wins).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    from pda_spark.functions.text import fingerprint

    docs = spark.readStream.schema(
        "doc_id long, url string, lang string, text string"
    ).parquet(docs_dir)
    keyed = docs.withColumn("fp", fingerprint(F.col(text_col)))

    out_schema = T.StructType(
        [
            T.StructField("fp", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def first_seen(key, pdfs, state: GroupState):
        if state.exists:
            # fingerprint already emitted in an earlier batch: drain input
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf[id_col].idxmin()]
            if best is None or row[id_col] < best[id_col]:
                best = row
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"fp": [key[0]], "doc_id": [int(best[id_col])], "url": [best["url"]]})

    deduped = keyed.groupBy("fp").applyInPandasWithState(
        first_seen, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    q = (
        deduped.writeStream.format("parquet")
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


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    """Session windows as a STREAM (F.session_window + watermark): the
    incremental counterpart of the batch gaps-and-islands q55 — Spark
    merges overlapping per-event windows into sessions and finalizes a
    session once the watermark passes its close. With no timestamp gap
    exactly equal to ``gap`` the finalized sessions are identical to the
    batch operator's (tested); AvailableNow drains pending files per
    invocation."""
    ev = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).parquet(events_dir)
    agg = (
        ev.withColumn("ets", F.col("ts").cast("timestamp"))
        .withWatermark("ets", watermark)
        .groupBy(F.session_window("ets", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("sess_start_us"),
            "n_events",
        )
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
