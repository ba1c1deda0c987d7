"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over pda_spark.plans.registry — one entry per implemented
operator family from SURVEY.md §2 (relational, text/training-data, dedup,
similarity, geo/spatial, time series, multimodal, dissolve/coverage).
Every query has a DuckDB oracle (approximate-ANN included: the seeded
hyperplanes / centroid literals are replayed in SQL; recall properties
are additionally pytest-pinned against the exact baselines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-polygon spatial join (WKB + cell index + refine)
    over the events table at sf0.001."""
    from pda_spark.plans.registry import q41_pip_join

    return q41_pip_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pda_spark.plans.registry import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pda_spark.plans.registry import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
