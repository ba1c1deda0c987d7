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
