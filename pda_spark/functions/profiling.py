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

    Shape: the table melts to (column, value) via ONE projection — an
    explode over an array of (lit(column), cast value) structs, so the
    source is scanned exactly once regardless of column count (a
    unionAll-per-column melt would re-scan the table n_cols times) —
    then one grouped aggregate; distinct counts shuffle on
    (column, value), so a wide hot column spreads over the value space
    rather than one task. A broadcast join back to the literal column
    list guarantees one output row per requested column even for an
    EMPTY table (n_rows=0 — "this partition is empty" is exactly the
    report a quality check must not stay silent about). At 100 TB swap
    count_distinct for the q121 HLL registers per column (documented
    alternative, not a code path — the gate needs the exact integer).
    """
    cols = columns or df.columns
    if not cols:
        raise ValueError("profile_table needs at least one column")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_p")
    ).select("_p.column", "_p._v")
    agg = melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.count_distinct(F.col("_v")).cast("long").alias("n_distinct"),
    )
    spine = df.sparkSession.createDataFrame([(c,) for c in cols], "column string")
    # right-outer with the aggregate as the (broadcast) build side: the
    # spine is the preserved side, so an outer-join build hint on it
    # would be ignored; agg is at most n_cols rows — always tiny.
    return F.broadcast(agg).join(spine, "column", "right").select(
        "column",
        F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce("n_null", F.lit(0)).cast("long").alias("n_null"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization (percentile clipping) — the outlier-robustness
    primitive of feature cleaning: clip ``value_col`` to its per-group
    [lower, upper] exact percentiles. Exact ``percentile`` interpolates
    at p*(n-1) identically to DuckDB's quantile_cont (the q67
    bit-exactness), so the clip boundaries — and therefore every
    clipped value — replay across engines.

    Shape: one grouped percentile aggregate (tiny: one row per group)
    joined back onto the fact table — AQE broadcasts it — then a pure
    Catalyst least/greatest. The fact table is scanned twice (agg +
    clip): at 100 TB feed a pre-aggregated percentile dim instead, or
    accept the two scans (both pushdown-pruned to one column)."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f"need 0 <= lower <= upper <= 1, got {lower}, {upper}")
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    agg = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        F.percentile(v, F.lit(lower)).alias("_wlo"),
        F.percentile(v, F.lit(upper)).alias("_whi"),
    )
    if gcols:
        # null-SAFE equi-join: groupBy keeps a NULL-key group, and a
        # plain inner join would silently DROP every NULL-key fact row
        # (the q132 no-silent-row-loss lesson)
        cond = None
        for g in gcols:
            c = df[g].eqNullSafe(agg[g])
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(agg), cond).drop(*[agg[g] for g in gcols])
    else:
        joined = df.crossJoin(F.broadcast(agg))
    # NULL in -> NULL out: greatest/least SKIP null arguments, so an
    # unguarded clip would invent a p05 measurement from a missing value
    clipped = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.greatest(v, F.col("_wlo")), F.col("_whi")))
    return joined.withColumn(out_col or f"{value_col}_wins", clipped).drop("_wlo", "_whi")
