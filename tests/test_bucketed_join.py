"""Bucketed-write co-located join: the 100 TB fact-fact join story.

SURVEY §2/§4 and geo/cells scale notes claim the fact table "can be
written sorted/bucketed by cell so the join carries no Exchange" — this
test proves the claim end-to-end on this Spark build: two tables
bucketed by the same key into the same bucket count join WITHOUT any
shuffle (no Exchange node anywhere in the physical plan), and the
result matches the plain-join oracle.
"""

import pytest
from conftest import formatted_plan as _formatted_plan
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the Exchange-free plan can only
    come from bucketing (both fixture tables are tiny and would
    otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_carries_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(20_000).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 20_000, 2).select(
        F.col("id").alias("cell"), (F.col("id") * 3).alias("b")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    (left.write.bucketBy(8, "cell").sortBy("cell")
         .option("path", str(tmp_path / "bkt_left")).saveAsTable("bkt_left"))
    (right.write.bucketBy(8, "cell").sortBy("cell")
          .option("path", str(tmp_path / "bkt_right")).saveAsTable("bkt_right"))
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "cell")
        plan = _formatted_plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
        got = j.agg(F.sum(F.col("a") + F.col("b")).alias("s")).first()["s"]
        want = sum(2 * k + 3 * k for k in range(0, 20_000, 2))
        assert got == want
        # the unbucketed twin of the same join DOES shuffle — the
        # Exchange-free plan above is the bucketing, not a planner quirk
        plain = left.join(right, "cell")
        assert "Exchange" in _formatted_plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_checkpoint_cluster_by_exchange_free_rejoin(spark, tmp_path, no_broadcast):
    """VERDICT r4 #8: cell-bucketed layout as the CHECKPOINT default,
    not a demo — two stages written with cluster_by=('cell', 8) re-join
    on cell with no Exchange, and the plan survives a catalog wipe
    (simulated resume: drop the session tables, read() re-registers
    from the manifest's recorded bucket spec over the existing files)."""
    from pda_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"))
    left = spark.range(10_000).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("cell"), (F.col("id") * 3).alias("b")
    )
    lo = mgr.write_stage(left, "facts_left", cluster_by=("cell", 8))
    ro = mgr.write_stage(right, "facts_right", cluster_by=("cell", 8))
    j = lo.join(ro, "cell")
    plan = _formatted_plan(j)
    assert "Exchange" not in plan, plan
    assert j.count() == 5_000
    # manifest carries the layout + lineage metrics contract
    m = mgr.manifest("facts_left")
    assert m["cluster_by"] == {"col": "cell", "buckets": 8}
    assert m["rows"] == 10_000 and m["bytes"] > 0 and m["partitions"]
    # simulated resume: wipe the catalog, read() must re-register the
    # bucket spec via DDL over the existing parquet files
    for t in spark.catalog.listTables():
        if t.name.startswith("ckpt_facts_"):
            spark.sql(f"DROP TABLE {t.name}")
    lo2, ro2 = mgr.read("facts_left"), mgr.read("facts_right")
    j2 = lo2.join(ro2, "cell")
    plan2 = _formatted_plan(j2)
    assert "Exchange" not in plan2, plan2
    assert j2.count() == 5_000
    got = j2.agg(F.sum(F.col("a") + F.col("b")).alias("s")).first()["s"]
    assert got == sum(2 * k + 3 * k for k in range(0, 10_000, 2))
