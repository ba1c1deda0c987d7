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


def test_stream_dedup_first_seen_stateful(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a fingerprint emitted in
    batch 1 is suppressed in batch 2 (state store survives via the
    checkpoint); first-seen winner is the min doc_id."""
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(docs_dir, exist_ok=True)

    rows1 = [
        (3, "u3", "en", "alpha text"),
        (1, "u1", "en", "alpha text"),   # same fp as doc 3 -> min id 1 wins
        (2, "u2", "en", "beta text"),
    ]
    spark.createDataFrame(rows1, "doc_id long, url string, lang string, text string") \
        .write.mode("append").parquet(docs_dir)
    incremental.stream_dedup_first_seen(spark, docs_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    got = {(r["doc_id"], r["url"]) for r in out.collect()}
    assert got == {(1, "u1"), (2, "u2")}

    rows2 = [
        (4, "u4", "en", "alpha text"),   # dup of batch-1 fp -> suppressed
        (5, "u5", "en", "gamma text"),   # new -> emitted
    ]
    spark.createDataFrame(rows2, "doc_id long, url string, lang string, text string") \
        .write.mode("append").parquet(docs_dir)
    incremental.stream_dedup_first_seen(spark, docs_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    got = {(r["doc_id"], r["url"]) for r in out.collect()}
    assert got == {(1, "u1"), (2, "u2"), (5, "u5")}


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Streaming session_window sessions (those finalized before the
    terminal watermark) must EXACTLY match the batch gaps-and-islands
    operator (q55 semantics) on (user, session start, event count)."""
    from pda_spark.plans import registry

    sf = "/root/testdata/sf0.001"
    ev_dir, out_dir, ck = str(tmp_path / "ev"), str(tmp_path / "sess"), str(tmp_path / "ck")
    spark.read.parquet(f"{sf}/events.parquet").write.mode("overwrite").parquet(ev_dir)

    incremental.stream_sessionize(spark, ev_dir, out_dir, ck)
    streamed = {
        (r["user_id"], r["sess_start_us"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed, "terminal watermark closed no sessions — widen the fixture"

    batch = {
        (r["user_id"], r["sess_start_us"]): r["n_events"]
        for r in registry.QUERIES["q55_sessionize"][0](spark, sf).collect()
    }
    # every finalized streaming session is identical to its batch twin
    for key, n in streamed.items():
        assert batch.get(key) == n, (key, n, batch.get(key))
    # and the un-emitted remainder is only the watermark tail
    max_us = max(k[1] for k in batch)
    tail = 2 * 3600 * 1_000_000
    for key in set(batch) - set(streamed):
        assert key[1] >= max_us - tail - 30 * 60 * 1_000_000, key
