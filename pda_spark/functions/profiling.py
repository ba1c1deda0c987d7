"""Table profiling: per-column data-quality summaries, exact and
engine-portable (cross-checked by the q132 DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Data-profiling summary — one row per column: (column, n_rows,
    n_null, n_distinct). The schema-drift / data-quality primitive a
    pipeline runs on every ingested partition before trusting it.

    Values are compared through a CAST to string, which is injective
    per engine (Spark and DuckDB may format a double differently, but
    each maps distinct values to distinct strings — and only the COUNT
    crosses engines), so exact n_distinct is engine-portable without
    normalizing representations. NULLs stay NULL through the cast and
    are excluded by count(DISTINCT) in both engines.

    Shape: the table melts to (column, value) — n_cols x rows, one
    projection, no join — and one grouped aggregate; distinct counts
    shuffle on (column, value), so a wide hot column spreads over the
    value space rather than one task. At 100 TB swap count_distinct
    for the q121 HLL registers per column (documented alternative, not
    a code path — the gate needs the exact integer)."""
    cols = columns or df.columns
    melted = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("column"), F.col(c).cast("string").alias("_v")
        )
        melted = part if melted is None else melted.unionAll(part)
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.count_distinct(F.col("_v")).cast("long").alias("n_distinct"),
    )
