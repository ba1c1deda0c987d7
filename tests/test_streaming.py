"""Structured Streaming incremental ingest: exactly-once file drains,
append-only windowed aggregation with watermark."""

import os

import pytest
from pyspark.sql import functions as F

from pda_spark.sources import web_pages
from pda_spark.streaming import incremental


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    d = {
        "pages": str(base / "pages"),
        "facts": str(base / "facts"),
        "ck1": str(base / "ck1"),
        "events": str(base / "events"),
        "hourly": str(base / "hourly"),
        "ck2": str(base / "ck2"),
    }
    os.makedirs(d["pages"], exist_ok=True)
    return d


def test_stream_ingest_incremental(spark, dirs):
    # batch 1: 40 pages
    web_pages.corpus(spark, 40).write.mode("append").parquet(dirs["pages"])
    incremental.stream_ingest_footprints(spark, dirs["pages"], dirs["facts"], dirs["ck1"])
    facts = spark.read.parquet(dirs["facts"])
    assert facts.count() == 40

    # batch 2: 20 more pages arrive; only the new files are drained
    more = web_pages.corpus(spark, 60).filter(F.col("url") > web_pages.page_for_index(39)[0])
    more.write.mode("append").parquet(dirs["pages"])
    incremental.stream_ingest_footprints(spark, dirs["pages"], dirs["facts"], dirs["ck1"])
    facts = spark.read.parquet(dirs["facts"])
    assert facts.count() == 60
    assert facts.select("id").distinct().count() == 60

    # re-run with nothing new: no growth (exactly-once)
    incremental.stream_ingest_footprints(spark, dirs["pages"], dirs["facts"], dirs["ck1"])
    assert spark.read.parquet(dirs["facts"]).count() == 60


def test_stream_hourly_counts(spark, dirs):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(dirs["events"])
    incremental.stream_hourly_counts(spark, dirs["events"], dirs["hourly"], dirs["ck2"])
    out = spark.read.parquet(dirs["hourly"])
    # watermark finalizes all but the trailing window(s) of a static file
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    assert 0 < out.count() <= batch
    # every emitted bucket matches the batch count for that bucket
    joined = (
        out.alias("s")
        .join(
            ev.groupBy(F.window("ts", "1 hour")["start"].alias("bucket"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_batch"))
            .alias("b"),
            on=["bucket", "event_type"],
        )
        .filter(F.col("n_events") != F.col("n_batch"))
    )
    assert joined.count() == 0
